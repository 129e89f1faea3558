"""Collective-communication audit of compiled (optimized) HLO.

Catches silent GSPMD resharding: a partitioned program whose shardings
don't line up still compiles and produces finite losses — GSPMD just
inserts all-gathers and rematerializes the global tensors, defeating the
parallelism (observed in this repo: ring_mamba_vim on a ('data','seq')
mesh without `batch_axis` all-gathered the full batch at every shard_map
boundary, f32[B,l_shard,d] × 2). Count/measure the collectives in the
compiled module and assert they match the communication budget the
parallelism design implies.

The reference has no analogue (NCCL calls are implicit in DDP); this is
the TPU-native replacement for "watch nvidia-smi / nccl logs": XLA's
collectives are all visible in the optimized HLO text.

Usage:
    compiled = jax.jit(step).lower(*args).compile()
    stats = collective_stats(compiled.as_text())
    audit_collectives(stats, max_all_gather_bytes=0,
                      max_all_reduce_bytes=3 * param_bytes,
                      expect_collective_permutes=(8, 40))
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

_DTYPE_BYTES = {
    "pred": 1, "s4": 1, "u4": 1, "s8": 1, "u8": 1,
    "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4,
    "s64": 8, "u64": 8, "f64": 8, "c64": 8, "c128": 16,
    "f8e4m3fn": 1, "f8e5m2": 1, "f8e4m3b11fnuz": 1,
}

COLLECTIVE_OPS = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all", "collective-broadcast", "ragged-all-to-all",
)

# one HLO instruction: `%name = <result type(s)> <op>(...)`; async pairs
# appear as `<op>-start` + `<op>-done` — count only the starts.
_INSTR_RE = re.compile(
    r"=\s*((?:\([^)]*\))|(?:\S+))\s+("
    + "|".join(COLLECTIVE_OPS)
    + r")(-start)?\("
)
_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def _shape_bytes(type_text: str) -> int:
    """Total bytes of one result type string, e.g. 'f32[8,16]{1,0}' or a
    tuple '(f32[4]{0}, f32[4,8]{1,0})'."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(type_text):
        if dtype not in _DTYPE_BYTES:
            continue  # e.g. the 'u32' token inside layout annotations
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


@dataclass
class CollectiveStats:
    """Per-op-kind counts and result bytes of a compiled HLO module."""

    counts: Dict[str, int] = field(default_factory=dict)
    bytes: Dict[str, int] = field(default_factory=dict)
    instrs: List[Tuple[str, int]] = field(default_factory=list)

    def count(self, op: str) -> int:
        return self.counts.get(op, 0)

    def nbytes(self, op: str) -> int:
        return self.bytes.get(op, 0)

    def __repr__(self) -> str:  # compact, log-friendly
        parts = [
            f"{op}:{self.counts[op]}({self.bytes[op]}B)"
            for op in sorted(self.counts)
        ]
        return "CollectiveStats(" + ", ".join(parts) + ")"


def collective_stats(hlo_text: str) -> CollectiveStats:
    """Parse optimized-HLO text (compiled.as_text()) for collectives."""
    stats = CollectiveStats()
    for m in _INSTR_RE.finditer(hlo_text):
        type_text, op = m.group(1), m.group(2)
        nbytes = _shape_bytes(type_text)
        stats.counts[op] = stats.counts.get(op, 0) + 1
        stats.bytes[op] = stats.bytes.get(op, 0) + nbytes
        stats.instrs.append((op, nbytes))
    return stats


def audit_collectives(
    stats: CollectiveStats,
    *,
    max_all_gather_bytes: Optional[int] = None,
    max_all_reduce_bytes: Optional[int] = None,
    expect_collective_permutes: Optional[Tuple[int, int]] = None,
    max_total_bytes: Optional[int] = None,
    strict_permutes: bool = False,
    min_all_to_all: Optional[int] = None,
) -> None:
    """Assert the compiled program's communication matches the budget.

    * max_all_gather_bytes — bound on all-gather result bytes; 0 means the
      program must not regather anything (the silent-resharding detector).
    * max_all_reduce_bytes — bound on all-reduce bytes; for a DP train step
      this is ~the gradient pytree (≈ param bytes) + a few scalars.
    * expect_collective_permutes — (lo, hi) inclusive count range for the
      ppermute rings (halo exchanges + log-step prefix + their transposes).
    * max_total_bytes — overall communication volume cap.
    * min_all_to_all — expert dispatch must actually ride a2a collectives
      (count floor), not get silently rewritten into gather/reduce traffic.
    """
    if min_all_to_all is not None:
        got = (stats.count("all-to-all") + stats.count("ragged-all-to-all"))
        assert got >= min_all_to_all, (
            f"all-to-all count {got} < expected {min_all_to_all} — expert "
            f"dispatch is not riding a2a ({stats})")
    if max_all_gather_bytes is not None:
        got = stats.nbytes("all-gather")
        assert got <= max_all_gather_bytes, (
            f"all-gather bytes {got} > budget {max_all_gather_bytes} — "
            f"GSPMD is rematerializing a sharded tensor ({stats})")
    if max_all_reduce_bytes is not None:
        got = stats.nbytes("all-reduce")
        assert got <= max_all_reduce_bytes, (
            f"all-reduce bytes {got} > budget {max_all_reduce_bytes} "
            f"({stats})")
    if expect_collective_permutes is not None:
        lo, hi = expect_collective_permutes
        got = stats.count("collective-permute")
        if not lo <= got <= hi:
            # The count bounds are heuristics over XLA's ppermute
            # merging/DCE behavior (ring_permute_budget docstring) —
            # version-sensitive, so by default WARN rather than fail the
            # entry-point dryrun; the byte budgets above stay hard.
            msg = (f"collective-permute count {got} outside [{lo}, {hi}] "
                   f"({stats})")
            if strict_permutes:
                raise AssertionError(msg)
            import sys

            print(f"[hlo_audit] WARNING: {msg}", file=sys.stderr)
    if max_total_bytes is not None:
        got = sum(stats.bytes.values())
        assert got <= max_total_bytes, (
            f"total collective bytes {got} > budget {max_total_bytes} "
            f"({stats})")


def ring_permute_budget(seq_devices: int, n_rings: int,
                        with_grad: bool = True) -> Tuple[int, int]:
    """Expected collective-permute count range for `n_rings` prefix rings
    over a seq axis of `seq_devices` devices.

    Each ring (ring_scan._device_prefix + conv halo): 1 halo ppermute +
    2·ceil(log2(ndev)) doubling ppermutes (a and s) + 1 exclusive shift.
    The backward pass transposes each ppermute into another ppermute
    (2×), and when the fwd runs inside a remat/scan region the bwd also
    RECOMPUTES the fwd ring (3×) — with_grad budgets for that. XLA may
    DCE/merge a few (lo bound is halved); anything far above hi means
    the partitioner inserted extra resharding.
    """
    import math

    log = max(1, math.ceil(math.log2(max(seq_devices, 2))))
    per_ring = 1 + 2 * log + 1
    total = per_ring * n_rings * (3 if with_grad else 1)
    return (per_ring * n_rings // 2, total + 2 * n_rings)
