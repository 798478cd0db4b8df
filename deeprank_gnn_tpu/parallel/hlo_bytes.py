"""Collective-traffic accounting from compiled HLO.

The halo layout's reason to exist is a BYTES claim: per conv layer it
exchanges only boundary-node rows (`parallel/halo.py` send_idx
[D, D, H]) where the GSPMD-sharded sparse layout re-materializes
node-sized arrays across the mesh. That claim is checkable without
hardware: compile both train steps, walk the optimized HLO, and sum
the bytes entering every collective. This module is that walker; the
numbers live in SCALING.md and are pinned by
`tests/test_halo.py::test_halo_collective_bytes_vs_gspmd`.

The reference has no analog (single-device ceiling,
`NeuralNet.py:207-208` of /root/reference/deeprank_gnn) — this is
infrastructure for the framework's own multi-chip layouts.
"""

from __future__ import annotations

import re
from collections import defaultdict
from typing import Dict, List, Tuple

# HLO opcodes that move data between devices. `-start` forms are the
# async halves (their `-done` twins carry no new operands).
COLLECTIVE_OPS = (
    "all-reduce",
    "all-gather",
    "all-to-all",
    "collective-permute",
    "reduce-scatter",
    "collective-broadcast",
)

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1,
    "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4,
    "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}

_SHAPE_RE = re.compile(r"\b(pred|bf16|[sufc]\d+)\[([\d,]*)\]")
# `%name = <result shapes> opcode(<operands>), attrs...`
_INSTR_RE = re.compile(
    r"^\s*(?:ROOT\s+)?(%[\w.\-]+)\s*=\s*([^=]*?)\s*([\w\-]+)\((.*)$"
)


def _shape_bytes(dtype: str, dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dtype]


def _shapes_bytes(text: str) -> int:
    return sum(_shape_bytes(d, s) for d, s in _SHAPE_RE.findall(text))


def _parse(hlo_text: str) -> List[Tuple[str, int, str, List[str]]]:
    """(name, result_bytes, opcode, operand_names) per instruction.
    Optimized HLO puts shapes only on results; operands are %name
    references, so callers resolve them through the name map."""
    out = []
    for line in hlo_text.splitlines():
        # tuple shapes embed /*index=N*/ comments whose '=' would stop
        # the result-part match
        line = re.sub(r"/\*.*?\*/", "", line)
        m = _INSTR_RE.match(line)
        if m is None:
            continue
        name, result_part, opcode, rest = m.groups()
        operands = re.findall(r"%[\w.\-]+", rest.split(")")[0])
        out.append((name, _shapes_bytes(result_part), opcode, operands))
    return out


def collective_bytes(hlo_text: str) -> Dict[str, dict]:
    """Per-opcode collective traffic of an optimized HLO module.

    Returns ``{opcode: {"count", "operand_bytes", "result_bytes"}}``
    plus a ``"total"`` row. ``operand_bytes`` is what enters the
    collective (the wire-relevant quantity for all-to-all/all-reduce/
    collective-permute; all-gather results are D× their operands),
    resolved through the instruction name map since optimized HLO
    annotates shapes on results only. Async ``-start`` forms count
    once; their ``-done`` twins are skipped.
    """
    instrs = _parse(hlo_text)
    size_of = {name: rb for name, rb, _op, _ops in instrs}
    out: Dict[str, dict] = defaultdict(
        lambda: {"count": 0, "operand_bytes": 0, "result_bytes": 0}
    )
    for name, rb, opcode, operands in instrs:
        base = opcode[:-6] if opcode.endswith("-start") else opcode
        if base not in COLLECTIVE_OPS or opcode.endswith("-done"):
            continue
        row = out[base]
        row["count"] += 1
        row["operand_bytes"] += sum(size_of.get(o, 0) for o in operands)
        row["result_bytes"] += rb
    total = {
        "count": sum(r["count"] for r in out.values()),
        "operand_bytes": sum(r["operand_bytes"] for r in out.values()),
        "result_bytes": sum(r["result_bytes"] for r in out.values()),
    }
    result = dict(out)
    result["total"] = total
    return result


def activation_collective_bytes(hlo_text: str, param_bytes: int = 0) -> int:
    """Operand bytes of the collectives that move BATCH data (the
    layout-dependent traffic): everything except all-reduces whose
    operands are parameter/gradient-sized or smaller (the data-parallel
    gradient reduction both layouts pay identically, plus scalar loss
    reductions). ``param_bytes`` is the total parameter byte size; each
    all-reduce call site at or under that size is excluded."""
    instrs = _parse(hlo_text)
    size_of = {name: rb for name, rb, _op, _ops in instrs}
    out = 0
    for _name, _rb, opcode, operands in instrs:
        base = opcode[:-6] if opcode.endswith("-start") else opcode
        if base not in COLLECTIVE_OPS or opcode.endswith("-done"):
            continue
        ob = sum(size_of.get(o, 0) for o in operands)
        if base == "all-reduce" and ob <= max(param_bytes, 4):
            continue
        out += ob
    return out
