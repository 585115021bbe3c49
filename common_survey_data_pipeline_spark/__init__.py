"""common_survey_data_pipeline_spark — a PySpark-native survey/metadata
analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference R pipeline ``madelinearnold/common-survey-data-pipeline``
(``varinfo-update.R``), re-expressed Spark-first:

* lazy, columnar DataFrame plans (Catalyst optimizes; zero row-at-a-time
  Python UDFs on the core path),
* scalable versions of the reference's flagship tricks — string-similarity
  (Levenshtein) joins with length-band blocking, coalescing left joins,
  anti-join reporting, recency ranking over dynamic wide schemas,
* plus large-scale training-data-pipeline operators: exact/MinHash-LSH/
  SimHash deduplication, embedding similarity search, text analysis, and
  multimodal column plumbing.

Package layout::

    session.py    SparkSession builder tuned for the engine
    config.py     dynamic column-name configuration (survey year etc.)
    sources/      readr-profile CSV, Parquet, test-table loaders
    operators/    relational + similarity + dedup + text operators
    pipeline.py   the end-to-end two-phase varinfo pipeline
    streaming/    Structured Streaming surface over event streams
"""

from common_survey_data_pipeline_spark.config import PipelineConfig, generate_dynamic_columns
from common_survey_data_pipeline_spark.session import get_spark

__version__ = "0.1.0"

__all__ = [
    "PipelineConfig",
    "generate_dynamic_columns",
    "get_spark",
    "__version__",
]
