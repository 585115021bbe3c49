"""Custom connector via the Python Data Source API (Spark 4.x).

The engine's example of the connector SDK: a deterministic synthetic
document generator registered as a real ``spark.read.format(...)``
source. The point is the mechanics a production connector needs —
declared schema, option handling, PARTITIONED reads (each partition
generates only its slice, so a 1000-executor cluster produces the
corpus in parallel with zero driver involvement) and bit-reproducible
output from an explicit seed.

Usage::

    from common_survey_data_pipeline_spark.sources.pydatasource import (
        SyntheticCorpusDataSource,
    )
    spark.dataSource.register(SyntheticCorpusDataSource)
    df = (spark.read.format("synthetic_corpus")
          .option("n_docs", 10_000).option("n_partitions", 64)
          .option("seed", 7).load())
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_WORDS = (
    "the a and of to in is it you that spark table row scan fast slow "
    "key value part hash merge sort window batch line agg"
).split()

SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), False),
        StructField("n_words", IntegerType(), False),
    ]
)


def _doc(doc_id: int, seed: int) -> tuple[int, str, int]:
    # splitmix64-style mix — deterministic per (seed, doc_id), no RNG
    # object state to serialize
    x = (doc_id * 0x9E3779B97F4A7C15 + seed * 0xBF58476D1CE4E5B9) & (2**64 - 1)
    words = []
    n = 5 + (x >> 48) % 60
    for _ in range(int(n)):
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & (2**64 - 1)
        words.append(_WORDS[x % len(_WORDS)])
    return doc_id, " ".join(words), len(words)


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _Reader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        per = -(-self.n_docs // self.n_partitions)
        return [
            _Slice(i * per, min((i + 1) * per, self.n_docs))
            for i in range(self.n_partitions)
            if i * per < self.n_docs
        ]

    def read(self, partition: _Slice):
        for doc_id in range(partition.start, partition.end):
            yield _doc(doc_id, self.seed)


class SyntheticCorpusDataSource(DataSource):
    """``format("synthetic_corpus")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_corpus"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return _Reader(self.options)
