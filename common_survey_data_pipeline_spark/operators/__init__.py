from common_survey_data_pipeline_spark.operators.coalesce_join import coalesce_left_join
from common_survey_data_pipeline_spark.operators.fuzzy_join import (
    keep_best_match,
    stringdist_left_join,
    with_row_id,
)
from common_survey_data_pipeline_spark.operators.dedup import (
    exact_dedup,
    exact_dedup_groups,
    minhash_dedup_pairs,
    neardup_clusters,
    ngram_jaccard_pairs,
    simhash_dedup_pairs,
)
from common_survey_data_pipeline_spark.operators.joins import anti_join, semi_join
from common_survey_data_pipeline_spark.operators.recency import (
    discover_recency_columns,
    recency_digit_key,
    sort_varinfo,
)
from common_survey_data_pipeline_spark.operators.reshape import (
    codebook_to_long,
    codebook_to_wide,
)
from common_survey_data_pipeline_spark.operators.similarity import (
    cosine_topk,
    embedding_neardup_pairs,
    ivf_topk,
    signlsh_topk,
)
from common_survey_data_pipeline_spark.operators.stats import fuzzy_match_stats
from common_survey_data_pipeline_spark.operators.timeseries import locf_fill
from common_survey_data_pipeline_spark.operators.temporal_joins import (
    asof_join,
    interval_join,
    salted_join,
)

__all__ = [
    "coalesce_left_join",
    "keep_best_match",
    "stringdist_left_join",
    "with_row_id",
    "anti_join",
    "semi_join",
    "asof_join",
    "interval_join",
    "salted_join",
    "discover_recency_columns",
    "recency_digit_key",
    "sort_varinfo",
    "codebook_to_long",
    "codebook_to_wide",
    "fuzzy_match_stats",
    "exact_dedup",
    "exact_dedup_groups",
    "minhash_dedup_pairs",
    "neardup_clusters",
    "ngram_jaccard_pairs",
    "simhash_dedup_pairs",
    "cosine_topk",
    "ivf_topk",
    "signlsh_topk",
    "embedding_neardup_pairs",
    "locf_fill",
]
