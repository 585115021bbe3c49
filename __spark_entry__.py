"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual workload lives in
``common_survey_data_pipeline_spark/workload.py`` — every operator from
SURVEY.md §2 plus the dedup/similarity/text/multimodal/streaming
extension surface, with each DuckDB oracle defined next to its Spark
plan.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from common_survey_data_pipeline_spark.workload import REGISTRY, flagship  # noqa: E402

# The correctness harness records queries in dict order and caps how many
# it covers per round. Order the registry so queries WITHOUT a green
# driver row in any committed CORRECTNESS_r*.json come first; queries the
# driver has already verified green go last. (The r1/r2-era pin for the
# two ANN queries retired in round 6: CORRECTNESS_r05 recorded both
# green, so the green-row scan now orders them correctly by itself.)
_PINNED_FIRST: list[str] = []


def _green_driver_rounds() -> dict[str, int]:
    """Per query name, the LATEST round number with a green
    (hash-matched, error-free) row in the committed driver correctness
    records. Absence from the dict = never verified green."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    last_green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            # well-formed but wrong-shaped JSON (e.g. a list) must be
            # skipped, not crash the driver entry point
            continue
        for name, row in rows.items():
            if (
                isinstance(row, dict)
                and row.get("hash_match")
                and row.get("err") is None
            ):
                last_green[name] = max(last_green.get(name, 0), rnd)
    return last_green


def _driver_order(last_green: dict[str, int] | None = None) -> list[str]:
    """Registry order for the driver's capped correctness run: pinned
    first, then never-green queries (in registry order), then the green
    tail ORDERED OLDEST-GREEN-ROUND FIRST (LRU) — so with a ~50-row
    driver cap every query's driver row is refreshed at worst every
    ⌈registry/cap⌉ rounds instead of the same early-registry names
    re-verifying forever (VERDICT r6 watch item 2). Ties (same round)
    keep registry order, which is what rotates: this round's freshly
    re-verified block records the CURRENT round and moves to the back
    of the queue next round."""
    if last_green is None:
        last_green = _green_driver_rounds()
    pinned = [n for n in _PINNED_FIRST if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in pinned]
    fresh = [n for n in rest if n not in last_green]
    reg_pos = {n: i for i, n in enumerate(REGISTRY)}
    done = sorted(
        (n for n in rest if n in last_green),
        key=lambda n: (last_green[n], reg_pos[n]),
    )
    return pinned + fresh + done


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extension
    surface). Each callable takes (spark, sf_dir) and returns a
    DataFrame; column names/dtypes are aligned with ``oracle_sql``."""
    return {name: REGISTRY[name].fn for name in _driver_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (tables pre-registered as
    views). Every registry query has one: operators whose internals SQL
    can't mirror (sign-LSH / IVF hyperplanes, HLL sketches) are oracled
    through engine-independent contracts instead — recall-vs-exact and
    error-tolerance booleans both engines compute identically.
    """
    return {
        name: REGISTRY[name].oracle
        for name in _driver_order()
        if REGISTRY[name].oracle is not None
    }
