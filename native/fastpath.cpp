// fastpath.cpp — native host-side kernels for deeprank_gnn_tpu.
//
// The reference delegated its host/compute floor to compiled
// extensions (torch-scatter/torch-sparse C++/CUDA, freesasa C). The
// TPU build's device math runs under XLA/Pallas; this library covers
// the remaining *host* hot paths:
//
//   - Shrake-Rupley SASA with a uniform spatial grid (the featurizer's
//     dominant cost; replaces the freesasa C dependency),
//   - residue contact-pair search (interface + internal edges),
//   - sort-based edge coalescing (the batcher's pooled-edge plan).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in the image).
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Shrake-Rupley SASA
//
// xyz:   [n, 3] float64 atom coordinates
// radii: [n] float64 (vdW + probe)
// n_points: sphere sample count
// out:   [n] float64 per-atom SASA
int sasa_compute(int64_t n, const double* xyz, const double* radii,
                 int64_t n_points, double* out) {
  if (n <= 0) return 0;
  // Fibonacci sphere (matches featurize/sasa.py `_fibonacci_sphere`)
  std::vector<double> sx(n_points), sy(n_points), sz(n_points);
  const double phi = M_PI * (3.0 - std::sqrt(5.0));
  for (int64_t i = 0; i < n_points; ++i) {
    double y = 1.0 - 2.0 * (i + 0.5) / (double)n_points;
    double r = std::sqrt(std::max(0.0, 1.0 - y * y));
    double th = phi * (double)i;
    sx[i] = r * std::cos(th);
    sy[i] = y;
    sz[i] = r * std::sin(th);
  }

  double max_r = 0.0;
  for (int64_t i = 0; i < n; ++i) max_r = std::max(max_r, radii[i]);
  const double cell = 2.0 * max_r;  // neighbor reach: r_i + r_j <= 2*max_r

  // uniform grid over the bounding box
  double mn[3] = {1e30, 1e30, 1e30}, mx[3] = {-1e30, -1e30, -1e30};
  for (int64_t i = 0; i < n; ++i)
    for (int k = 0; k < 3; ++k) {
      mn[k] = std::min(mn[k], xyz[3 * i + k]);
      mx[k] = std::max(mx[k], xyz[3 * i + k]);
    }
  int64_t dims[3];
  for (int k = 0; k < 3; ++k)
    dims[k] = std::max<int64_t>(1, (int64_t)((mx[k] - mn[k]) / cell) + 1);

  auto cell_of = [&](const double* p) -> int64_t {
    int64_t c[3];
    for (int k = 0; k < 3; ++k) {
      int64_t v = (int64_t)((p[k] - mn[k]) / cell);
      c[k] = std::min(std::max<int64_t>(v, 0), dims[k] - 1);
    }
    return (c[0] * dims[1] + c[1]) * dims[2] + c[2];
  };

  std::unordered_map<int64_t, std::vector<int32_t>> grid;
  grid.reserve(n * 2);
  for (int64_t i = 0; i < n; ++i) grid[cell_of(xyz + 3 * i)].push_back(i);

  std::vector<int32_t> nbrs;
  for (int64_t i = 0; i < n; ++i) {
    const double* pi = xyz + 3 * i;
    const double ri = radii[i];
    // gather neighbors from the 27 surrounding cells
    nbrs.clear();
    int64_t ci[3];
    for (int k = 0; k < 3; ++k) {
      int64_t v = (int64_t)((pi[k] - mn[k]) / cell);
      ci[k] = std::min(std::max<int64_t>(v, 0), dims[k] - 1);
    }
    for (int64_t dx = -1; dx <= 1; ++dx)
      for (int64_t dy = -1; dy <= 1; ++dy)
        for (int64_t dz = -1; dz <= 1; ++dz) {
          int64_t cx = ci[0] + dx, cy = ci[1] + dy, cz = ci[2] + dz;
          if (cx < 0 || cy < 0 || cz < 0 || cx >= dims[0] || cy >= dims[1] ||
              cz >= dims[2])
            continue;
          auto it = grid.find((cx * dims[1] + cy) * dims[2] + cz);
          if (it == grid.end()) continue;
          for (int32_t j : it->second) {
            if ((int64_t)j == i) continue;
            const double* pj = xyz + 3 * j;
            double rr = ri + radii[j];
            double d2 = 0.0;
            for (int k = 0; k < 3; ++k) {
              double d = pi[k] - pj[k];
              d2 += d * d;
            }
            if (d2 < rr * rr) nbrs.push_back(j);
          }
        }
    int64_t accessible = 0;
    for (int64_t p = 0; p < n_points; ++p) {
      double px = pi[0] + ri * sx[p];
      double py = pi[1] + ri * sy[p];
      double pz = pi[2] + ri * sz[p];
      bool buried = false;
      for (int32_t j : nbrs) {
        const double* pj = xyz + 3 * j;
        double dxp = px - pj[0], dyp = py - pj[1], dzp = pz - pj[2];
        double d2 = dxp * dxp + dyp * dyp + dzp * dzp;
        if (d2 < radii[j] * radii[j]) {
          buried = true;
          break;
        }
      }
      if (!buried) ++accessible;
    }
    out[i] = 4.0 * M_PI * ri * ri * (double)accessible / (double)n_points;
  }
  return 0;
}

// ---------------------------------------------------------------------------
// Residue contact pairs: minimum atom-atom distance per residue pair
// within `cutoff` between two atom sets.
//
// Inputs: set A (na atoms, xyz_a, rid_a residue ids) and set B.
// Output arrays (caller-allocated, capacity `cap`): res_a, res_b, dist.
// Returns the number of contact pairs found (or -1 if cap exceeded).
int64_t contact_pairs(int64_t na, const double* xyz_a, const int64_t* rid_a,
                      int64_t nb, const double* xyz_b, const int64_t* rid_b,
                      double cutoff, int64_t cap, int64_t* res_a,
                      int64_t* res_b, double* dist) {
  if (na == 0 || nb == 0) return 0;
  const double c2 = cutoff * cutoff;
  const double cell = cutoff;
  double mn[3] = {1e30, 1e30, 1e30};
  for (int64_t i = 0; i < nb; ++i)
    for (int k = 0; k < 3; ++k) mn[k] = std::min(mn[k], xyz_b[3 * i + k]);
  double mx[3] = {-1e30, -1e30, -1e30};
  for (int64_t i = 0; i < nb; ++i)
    for (int k = 0; k < 3; ++k) mx[k] = std::max(mx[k], xyz_b[3 * i + k]);
  int64_t dims[3];
  for (int k = 0; k < 3; ++k)
    dims[k] = std::max<int64_t>(1, (int64_t)((mx[k] - mn[k]) / cell) + 1);
  auto cell_idx = [&](const double* p, int64_t* c) {
    for (int k = 0; k < 3; ++k) {
      int64_t v = (int64_t)std::floor((p[k] - mn[k]) / cell);
      c[k] = std::min(std::max<int64_t>(v, 0), dims[k] - 1);
    }
  };
  std::unordered_map<int64_t, std::vector<int32_t>> grid;
  for (int64_t i = 0; i < nb; ++i) {
    int64_t c[3];
    cell_idx(xyz_b + 3 * i, c);
    grid[(c[0] * dims[1] + c[1]) * dims[2] + c[2]].push_back(i);
  }
  std::unordered_map<int64_t, double> best;  // key: rid_a * 2^32 + rid_b
  for (int64_t i = 0; i < na; ++i) {
    const double* pa = xyz_a + 3 * i;
    int64_t c[3];
    // skip atoms far outside B's box
    bool out_of_reach = false;
    for (int k = 0; k < 3; ++k)
      if (pa[k] < mn[k] - cutoff || pa[k] > mx[k] + cutoff) out_of_reach = true;
    if (out_of_reach) continue;
    cell_idx(pa, c);
    for (int64_t dx = -1; dx <= 1; ++dx)
      for (int64_t dy = -1; dy <= 1; ++dy)
        for (int64_t dz = -1; dz <= 1; ++dz) {
          int64_t cx = c[0] + dx, cy = c[1] + dy, cz = c[2] + dz;
          if (cx < 0 || cy < 0 || cz < 0 || cx >= dims[0] || cy >= dims[1] ||
              cz >= dims[2])
            continue;
          auto it = grid.find((cx * dims[1] + cy) * dims[2] + cz);
          if (it == grid.end()) continue;
          for (int32_t j : it->second) {
            const double* pb = xyz_b + 3 * j;
            double d2 = 0.0;
            for (int k = 0; k < 3; ++k) {
              double d = pa[k] - pb[k];
              d2 += d * d;
            }
            if (d2 <= c2) {
              int64_t key = (rid_a[i] << 32) | (rid_b[j] & 0xffffffffLL);
              auto f = best.find(key);
              if (f == best.end() || d2 < f->second) best[key] = d2;
            }
          }
        }
  }
  // deterministic order: sort keys
  std::vector<std::pair<int64_t, double>> items(best.begin(), best.end());
  std::sort(items.begin(), items.end());
  if ((int64_t)items.size() > cap) return -1;
  int64_t m = 0;
  for (auto& kv : items) {
    res_a[m] = kv.first >> 32;
    res_b[m] = kv.first & 0xffffffffLL;
    dist[m] = std::sqrt(kv.second);
    ++m;
  }
  return m;
}

// ---------------------------------------------------------------------------
// Sort-based edge coalescing: unique (src, dst) pairs in sorted order +
// inverse map (torch-sparse `coalesce` host equivalent used by the
// batcher's pooled-edge plan).
//
// Returns number of unique pairs; inverse[e] in [0, n_unique).
int64_t coalesce_pairs(int64_t e, const int32_t* src, const int32_t* dst,
                       int32_t* uniq_src, int32_t* uniq_dst,
                       int32_t* inverse) {
  if (e == 0) return 0;
  std::vector<int64_t> keys(e);
  for (int64_t i = 0; i < e; ++i)
    keys[i] = ((int64_t)src[i] << 32) | (uint32_t)dst[i];
  std::vector<int64_t> sorted(keys);
  std::sort(sorted.begin(), sorted.end());
  sorted.erase(std::unique(sorted.begin(), sorted.end()), sorted.end());
  int64_t m = (int64_t)sorted.size();
  for (int64_t u = 0; u < m; ++u) {
    uniq_src[u] = (int32_t)(sorted[u] >> 32);
    uniq_dst[u] = (int32_t)(sorted[u] & 0xffffffffLL);
  }
  for (int64_t i = 0; i < e; ++i) {
    int64_t lo = std::lower_bound(sorted.begin(), sorted.end(), keys[i]) -
                 sorted.begin();
    inverse[i] = (int32_t)lo;
  }
  return m;
}

}  // extern "C"
