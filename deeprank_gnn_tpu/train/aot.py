"""AOT executable cache: serialize compiled XLA train/eval steps.

Through the remote-TPU tunnel a cold jit compile costs 1-10 minutes,
and jax's persistent compilation cache does not carry across processes
on every backend plugin. This module snapshots the *compiled
executable* itself (`jax.experimental.serialize_executable`) keyed by
the lowered program's HLO hash, so a second process at the same shapes
skips XLA entirely: lower (cheap, host-side tracing) -> hash -> load.

The reference has no analog (torch eager recompiles nothing but also
caches nothing; SURVEY §5 lists no compile-latency machinery).

Usage: wrap any jitted function whose call shapes repeat:

    step = AotCachedFunction(jax.jit(step_fn), cache_dir, name="train")

First call per shape signature lowers, then loads the executable from
``cache_dir`` if present (else compiles and saves). Falls back to
plain jit on any serialization failure — the cache is an optimization,
never a correctness dependency.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Callable, Optional

import jax


def _cache_key(lowered) -> str:
    """Hash the lowered StableHLO + compile environment. Same program
    + same jax/backend/device => same executable."""
    dev = jax.devices()[0]
    env = (
        f"jax={jax.__version__};platform={dev.platform};"
        f"kind={getattr(dev, 'device_kind', '?')};n={jax.device_count()}"
    )
    h = hashlib.sha256()
    h.update(env.encode())
    h.update(lowered.as_text().encode())
    return h.hexdigest()[:24]


class AotCachedFunction:
    """Lazy AOT wrapper around a jitted callable.

    On the first call (per wrapper) the function is lowered with the
    actual arguments; the compiled executable is then loaded from the
    on-disk cache or compiled and serialized into it. Subsequent calls
    dispatch straight to the compiled executable. Shape changes fall
    back to the underlying jit (which retraces as usual).
    """

    def __init__(
        self, jitted: Callable, cache_dir: str, name: str = "fn"
    ):
        self._jitted = jitted
        self._cache_dir = cache_dir
        self._name = name
        # one compiled executable per call-shape signature (bucketed
        # loaders legitimately produce several static shapes)
        self._compiled: dict = {}
        self.loaded_from_cache: Optional[bool] = None  # set per materialize
        os.makedirs(cache_dir, exist_ok=True)

    def _sig(self, args) -> str:
        leaves = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map(
                lambda a: (
                    str(getattr(a, "shape", None)),
                    str(getattr(a, "dtype", None)),
                ),
                args,
            )
        )
        return hashlib.sha256(";".join(leaves).encode()).hexdigest()[:16]

    @staticmethod
    def _exec_devices(compiled) -> int:
        """Number of devices the executable was built over."""
        shardings = compiled.input_shardings[0]
        devs = set()
        for s in shardings:
            devs |= set(getattr(s, "device_set", ()))
        return len(devs)

    def _materialize(self, args):
        from jax.experimental import serialize_executable

        lowered = self._jitted.lower(*args)
        key = _cache_key(lowered)
        path = os.path.join(self._cache_dir, f"{self._name}-{key}.jaxexec")
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    n_exec, payload, in_tree, out_tree = pickle.load(f)
                # jax's executable unpickler binds ALL local devices:
                # a snapshot of a program spanning fewer devices (e.g.
                # single-device jit in a multi-device process) loads
                # but mis-executes — treat as a miss. The deployment
                # targets (1-chip TPU; full-mesh sharded steps) always
                # span every local device.
                if n_exec != jax.device_count():
                    raise ValueError(
                        f"executable spans {n_exec} of "
                        f"{jax.device_count()} local devices"
                    )
                compiled = serialize_executable.deserialize_and_load(
                    payload, in_tree, out_tree
                )
                self.loaded_from_cache = True
                return compiled
            except Exception as exc:  # stale/incompatible snapshot
                print(f"aot: not loading executable snapshot: {exc}")
        compiled = lowered.compile()
        self.loaded_from_cache = False
        try:
            blob = serialize_executable.serialize(compiled)
            tmp = path + f".tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                pickle.dump((self._exec_devices(compiled),) + tuple(blob), f)
            os.replace(tmp, path)  # atomic vs concurrent writers
        except Exception as exc:
            print(f"aot: executable not serializable on this backend: {exc}")
        return compiled

    def __call__(self, *args):
        sig = self._sig(args)
        compiled = self._compiled.get(sig)
        if compiled is None:
            try:
                compiled = self._materialize(args)
            except Exception as exc:
                print(f"aot: falling back to jit: {exc}")
                compiled = False  # sentinel: use plain jit for this sig
            self._compiled[sig] = compiled
        if compiled is False:
            return self._jitted(*args)
        return compiled(*args)
