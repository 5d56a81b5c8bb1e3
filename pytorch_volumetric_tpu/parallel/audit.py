"""Static scaling proof: count cross-device collectives in optimized HLO.

Multi-chip hardware is not reachable in this environment, so the north-star
scaling claim (>= 90% linear queries/s from 1 to N chips — BASELINE.md; the
reference itself is single-device, reference sdf.py:125-132) is proven
STATICALLY instead: the sharded forward query is pure data parallelism over
(configs x points) with replicated tables, so its compiled program must
contain ZERO cross-device collectives — every chip computes its output block
from local inputs, and wall-clock per chip is independent of chip count
(linear scaling by construction, up to host-side input skew).  The
collision-TRAINING step is the one program that must communicate: the joint
gradient and the scalar loss are partial sums over the point axis, so its
backward carries all-reduces (psum) and nothing else.

``audit_sharded_callable`` AOT-compiles a sharded callable built by
``parallel.sharding`` (which exposes its jit object as ``fn.jitted``) and
counts collective opcodes in the optimized HLO; tests/test_parallel.py pins
the zero-collective forward / all-reduce-only backward properties against
regressions, and scripts/hlo_audit.py writes the committed artifact.
"""

from __future__ import annotations

import re
from typing import Dict, Sequence

# every cross-device collective opcode XLA can emit (sync + async -start
# forms; -done carries no traffic of its own and would double-count)
COLLECTIVE_OPS = (
    "all-reduce",
    "all-gather",
    "all-to-all",
    "collective-broadcast",
    "collective-permute",
    "reduce-scatter",
    "ragged-all-to-all",
)

_OPCODE_RE = re.compile(
    r"=\s*(?:\([^)]*\)|\S+)\s+("
    + "|".join(re.escape(op) for op in COLLECTIVE_OPS)
    + r")(?:-start)?[.\w]*\(")


def count_collectives(hlo_text: str) -> Dict[str, int]:
    """Histogram of collective opcodes in an (optimized) HLO module text.

    Matches instruction definitions (``%x = shape all-reduce(...)`` and the
    async ``all-reduce-start`` form), not operand references, so each
    collective is counted once.
    """
    counts: Dict[str, int] = {}
    for match in _OPCODE_RE.finditer(hlo_text):
        op = match.group(1)
        counts[op] = counts.get(op, 0) + 1
    return counts


def optimized_hlo(fn, *example_args) -> str:
    """Optimized (post-SPMD-partitioning) HLO text of a sharded callable
    built by ``parallel.sharding`` (uses the ``fn.jitted`` /
    ``fn.extra_args`` attributes those constructors attach), or of a plain
    ``jax.jit`` object."""
    jitted = getattr(fn, "jitted", fn)
    extra = tuple(getattr(fn, "extra_args", ()))
    return jitted.lower(*example_args, *extra).compile().as_text()


def audit_sharded_callable(fn, *example_args) -> Dict[str, int]:
    """Collective histogram of a sharded callable's optimized HLO."""
    return count_collectives(optimized_hlo(fn, *example_args))


def assert_collectives(counts: Dict[str, int],
                       allowed: Sequence[str] = (),
                       require: Sequence[str] = ()) -> None:
    """Raise AssertionError unless ``counts`` only contains ``allowed``
    opcodes and contains every ``require`` opcode at least once."""
    extra = {op: n for op, n in counts.items() if op not in allowed}
    assert not extra, (
        f"unexpected cross-device collectives in compiled program: {extra} "
        f"(allowed: {list(allowed)}) — a scaling regression: the sharded "
        f"forward must stay communication-free")
    missing = [op for op in require if counts.get(op, 0) == 0]
    assert not missing, (
        f"expected collectives missing from compiled program: {missing} "
        f"(found only {counts}) — the gradient all-reduce disappeared")
