"""Physical-plan introspection helpers.

Correctness tests prove WHAT a query computes; these helpers let tests
prove HOW — which side of a join broadcasts, whether a top-k compiles
to TakeOrderedAndProject, whether a filter reached the parquet scan.
A plan regression is a 100×-at-scale bug even when results stay right,
so the shape assertions live next to the plans they protect.

The string-parsing here relies on Spark's stable tree-rendering
conventions: every operator line carries a ``+-``/``:-`` branch marker
whose column position encodes tree depth (3 columns per level), and
``FileScan parquet`` lines embed the file path in their ``Location:``
clause.
"""

from __future__ import annotations

import re
from contextlib import contextmanager

__all__ = [
    "plan_of",
    "subtree_of",
    "broadcast_subtrees",
    "broadcast_scanned_tables",
    "broadcast_scan_tables",
    "scanned_tables",
    "no_auto_broadcast",
    "operator_order",
    "partitionless_windows",
    "OPAQUE_SCAN",
]

# Sentinel returned by :func:`broadcast_scan_tables` when a broadcast
# subtree bottoms out in a lineage-opaque leaf (``Scan ExistingRDD``,
# i.e. a localCheckpoint'd frame). The plan text cannot name the source
# table, so the guard cannot prove the payload bounded — callers must
# treat the sentinel as a violation unless explicitly allowlisted.
OPAQUE_SCAN = "<ExistingRDD>"

_MARKER = re.compile(r"[+:]- ")


def plan_of(df) -> str:
    """The executed physical plan as text (pre-execution; with AQE on
    this is the initial plan, which is exactly what we want to assert
    hints against — AQE runtime promotions are its own business)."""
    return df._jdf.queryExecution().executedPlan().toString()


def _depth(line: str) -> int:
    """Tree depth of a plan line; -1 for non-operator lines (header,
    ReadSchema continuations, subquery banners)."""
    m = _MARKER.search(line)
    if m:
        return m.start()
    # root operators have no branch marker and start at column 0,
    # possibly behind a WholeStageCodegen `*(n) ` prefix
    if line and not line.startswith(" "):
        return -3  # shallower than any marker position
    return -1


def subtree_of(plan: str, needle: str) -> list[str]:
    """Lines of the subtree rooted at the first operator line that
    contains ``needle`` (the root line included)."""
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if needle in line and _depth(line) != -1:
            root_depth = _depth(line)
            out = [line]
            for nxt in lines[i + 1 :]:
                d = _depth(nxt)
                if d == -1:  # continuation / metadata line
                    out.append(nxt)
                    continue
                if d <= root_depth:
                    break
                out.append(nxt)
            return out
    return []


def broadcast_subtrees(plan: str) -> list[list[str]]:
    """One subtree per BroadcastExchange in the plan — i.e. exactly the
    frames that are shipped to every executor."""
    lines = plan.splitlines()
    found = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" in line and _depth(line) != -1:
            root_depth = _depth(line)
            sub = [line]
            for nxt in lines[i + 1 :]:
                d = _depth(nxt)
                if d == -1:
                    sub.append(nxt)
                    continue
                if d <= root_depth:
                    break
                sub.append(nxt)
            found.append(sub)
    return found


def scanned_tables(lines: list[str]) -> set[str]:
    """Parquet table names (file stem) scanned inside the given plan
    lines, parsed from FileScan Location clauses."""
    tables = set()
    for line in lines:
        if "FileScan" not in line:
            continue
        for m in re.finditer(r"([A-Za-z0-9_]+)\.parquet", line):
            tables.add(m.group(1))
    return tables


def broadcast_scanned_tables(plan: str) -> set[str]:
    """All tables whose scan feeds a BroadcastExchange — the build
    sides that a 100× scale-up must be able to fit in executor RAM."""
    out: set[str] = set()
    for sub in broadcast_subtrees(plan):
        out |= scanned_tables(sub)
    return out


# Operators whose output size is bounded by something other than their
# input size: an aggregate's output is bounded by group cardinality, a
# limit/top-k by k. A scan BELOW one of these feeding a BroadcastExchange
# is fine — the broadcast payload is the reduced frame, not the scan.
_SIZE_BARRIERS = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "TakeOrderedAndProject",
    "CollectLimit",
    "GlobalLimit",
    "LocalLimit",
)


def broadcast_scan_tables(plan: str) -> set[str]:
    """Tables whose RAW (un-reduced) scan feeds a BroadcastExchange —
    i.e. the broadcast payload scales with the table itself. Unlike
    :func:`broadcast_scanned_tables`, descent stops at size barriers
    (aggregates / limits): ``BroadcastExchange ← HashAggregate ← scan``
    broadcasts grouped rows, which stay small no matter the SF, while
    ``BroadcastExchange ← Filter ← scan`` broadcasts a constant
    FRACTION of the table and OOMs at 100×.

    Cached frames are transparent: an ``InMemoryTableScan`` prints its
    ``InMemoryRelation``'s full child plan inline, so a hinted broadcast
    of a cached sf-scaled scan IS named here (and barriers inside the
    cached plan apply as usual). Checkpointed frames are NOT — a
    ``Scan ExistingRDD`` leaf has no child plan — so any un-barriered
    opaque leaf under a BroadcastExchange yields the :data:`OPAQUE_SCAN`
    sentinel instead of silently vanishing (VERDICT r3 item 3)."""
    out: set[str] = set()
    for sub in broadcast_subtrees(plan):
        barrier_depth = None
        kept: list[str] = []
        for line in sub:
            d = _depth(line)
            if d == -1:
                # metadata/continuation line: belongs to the operator
                # above it, so it shares that operator's barrier state
                if barrier_depth is None:
                    kept.append(line)
                continue
            if barrier_depth is not None and d > barrier_depth:
                continue  # still under the barrier subtree
            barrier_depth = None
            if any(b in line for b in _SIZE_BARRIERS):
                barrier_depth = d
                continue
            kept.append(line)
        out |= scanned_tables(kept)
        if any("Scan ExistingRDD" in line for line in kept):
            out.add(OPAQUE_SCAN)
    return out


@contextmanager
def no_auto_broadcast(spark):
    """Disable size-based broadcast selection so the only
    BroadcastExchange nodes left in a plan are hint-driven. At tiny
    test SF every table sits under the 10 MB auto threshold, which
    would make hint assertions vacuous without this."""
    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ]
    old = {k: spark.conf.get(k, None) for k in keys}
    try:
        for k in keys:
            spark.conf.set(k, "-1")
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def partitionless_windows(plan: str) -> list[str]:
    """The ``Window`` operator lines that have NO partition spec — the
    every-row-through-one-task shape ("No Partition Defined for Window
    operation"). A Window exec node prints its argument lists as
    top-level bracket groups after ``Window ``: (functions, partition
    spec, order spec) when both specs exist, two groups when only one
    does. A partitioned-but-unordered window (e.g. a per-group min over
    the whole partition) also prints two groups, so the second group is
    classified by content: an ORDER spec carries ``ASC``/``DESC``
    direction tokens, a partition spec never does. Flagged lines are
    harmless only when the input is already bounded (e.g. above a
    TakeOrderedAndProject); callers allowlist those."""
    out = []
    for line in plan.splitlines():
        m = re.search(r"\bWindow \[", line)
        if not m:
            continue
        depth = 0
        groups: list[str] = []
        for ch in line[m.end() - 1 :]:
            if ch == "[":
                if depth == 0:
                    groups.append("")
                depth += 1
            elif ch == "]":
                depth -= 1
            if depth > 0 and len(groups) <= 3:
                groups[-1] += ch
        if len(groups) >= 3:
            continue  # functions + partition + order → partitioned
        second = groups[1] if len(groups) > 1 else ""
        if re.search(r"\b(ASC|DESC)\b", second) or not second.strip("["):
            # ordered-but-unpartitioned, or no spec at all → one task
            out.append(line)
    return out


def operator_order(plan: str, *needles: str) -> bool:
    """True if every needle appears in the plan and in the given
    top-down order (parents print before children, so ``Window``
    before ``TakeOrderedAndProject`` means the window runs over the
    already-limited rows)."""
    pos = -1
    for n in needles:
        nxt = plan.find(n, pos + 1)
        if nxt == -1:
            return False
        pos = nxt
    return True
