"""Dump .explain('formatted') for registry queries (dev tool).

Usage: python tools_dump_plan.py <suffix> <query> [query ...]
Writes plans/r11/<query>_<suffix>.txt for each query at sf0.1.

VERDICT r10 item 8 (plan-dump completeness): queries whose pipeline
contains a ``localCheckpoint`` (the global-rank kernel) hide everything
upstream of the checkpoint from the final frame's plan. For those, a
SECOND dump is appended with ``DataFrame.localCheckpoint`` patched to
identity, so the committed evidence shows the full logical pipeline —
the patched plan is for evidence only (the checkpoint exists to cut
lineage at runtime, and the identity-patch does not change any operator
below it).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from common_survey_data_pipeline_spark import get_spark
from common_survey_data_pipeline_spark.workload import REGISTRY

#: queries whose final plan truncates at a localCheckpoint
CHECKPOINTED = {"lm_perplexity_buckets"}


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="csdp-plandump")
    here = os.path.dirname(os.path.abspath(__file__))
    os.makedirs(f"{here}/plans/r11", exist_ok=True)
    for name in names:
        txt = _formatted(REGISTRY[name].fn(spark, sf_dir))
        if name in CHECKPOINTED:
            # patch the CONCRETE frame class (Spark 4's classic
            # DataFrame overrides the base class's localCheckpoint)
            cls = type(spark.range(1))
            real = cls.localCheckpoint
            cls.localCheckpoint = lambda self, eager=True: self
            try:
                full = _formatted(REGISTRY[name].fn(spark, sf_dir))
            finally:
                cls.localCheckpoint = real
            txt += (
                "\n\n==== FULL PIPELINE (localCheckpoint patched to "
                "identity — evidence dump only; see module doc) ====\n\n"
                + full
            )
        path = f"{here}/plans/r11/{name}_{suffix}.txt"
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
