"""Isolated per-query timing with the bench's methodology (dev tool).

Times a subset of registry queries at one or more SF dirs using exactly
bench.py's protocol (noop sink, sf0.001 codegen warmup, variance-adaptive
best-of-2/3, clearCache + GC between samples) so numbers are comparable
to BENCH_LOCAL.json without paying for the full 95-query batch.

Usage:
    python tools_minibench.py q1 q2 ...            # sf0.1 only
    python tools_minibench.py --sf1 q1 q2 ...      # sf0.1 + sf1
    python tools_minibench.py --sf1-only q1 ...    # sf1 only
    python tools_minibench.py --samples 5 q1 ...   # force N samples
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from common_survey_data_pipeline_spark import get_spark
from common_survey_data_pipeline_spark.workload import REGISTRY


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf1", action="store_true")
    ap.add_argument("--sf1-only", action="store_true")
    ap.add_argument("--samples", type=int, default=0)
    args = ap.parse_args()

    unknown = [n for n in args.queries if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        raise SystemExit(2)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="csdp-minibench",
        extra_conf={"spark.driver.memory": "16g"},
    )
    spark.range(1000).selectExpr("sum(id)").collect()
    warm_dir = "/root/testdata/sf0.001"
    for name in args.queries:
        REGISTRY[name].fn(spark, warm_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    def timed_best(fn, d: str, force_samples: int = 0) -> float:
        samples = []
        while True:
            t0 = time.time()
            fn(spark, d).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            if force_samples:
                if len(samples) >= force_samples:
                    return min(samples)
                continue
            if len(samples) >= 3 or (
                len(samples) == 2
                and abs(samples[0] - samples[1]) <= 0.3 * min(samples)
            ):
                return min(samples)

    out: dict = {}
    if not args.sf1_only:
        out["sf0.1"] = {
            n: round(timed_best(REGISTRY[n].fn, sf_dir, args.samples), 3)
            for n in args.queries
        }
    if args.sf1 or args.sf1_only:
        from tools_gen_sf1 import ensure_sf1

        sf1_dir = ensure_sf1(spark, src_dir=sf_dir)
        out["sf1"] = {
            n: round(timed_best(REGISTRY[n].fn, sf1_dir, args.samples), 3)
            for n in args.queries
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
