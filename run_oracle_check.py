"""Run the full driver-style oracle comparison at a given sf (dev tool).

Usage: python run_oracle_check.py [sf_dir] [query ...]

``CSDP_DRIVER_MEM`` (e.g. ``16g``) sizes the local JVM heap — required
for sf1-scale checks, where the default 1g driver dies in GC.

Quadratic ORACLES (exact all-pairs: dedup_minhash/prefix/ngram, the
CC-cluster pair, j10) run 15-84 min EACH in single-threaded DuckDB at
sf0.1 — for big-sf sweeps run the fast queries first (ascending by a
prior sweep's recorded times) and the quadratic tail as parallel
single-query invocations.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from common_survey_data_pipeline_spark import get_spark
from common_survey_data_pipeline_spark.workload import REGISTRY
from tests.oracle_harness import compare, duck_connection


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(REGISTRY)
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}; see REGISTRY", file=sys.stderr)
        return 2
    mem = os.environ.get("CSDP_DRIVER_MEM")
    spark = get_spark(
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": mem} if mem else None,
    )
    con = duck_connection(sf_dir)
    failures = []
    for name in names:
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            if spec.oracle is None:
                n = sdf.count()
                print(f"ROWS-ONLY {name}: {n} rows  ({time.time()-t0:.1f}s)")
                continue
            res = compare(sdf, con, spec.oracle)
            status = "OK " if res["match"] else "FAIL"
            print(
                f"{status} {name}: rows={res['rows']}  ({time.time()-t0:.1f}s)"
                + ("" if res["match"] else f"\n  {res['detail'][:1500]}")
            )
            if not res["match"]:
                failures.append(name)
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:600]}")
            failures.append(name)
    print("\nFAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
