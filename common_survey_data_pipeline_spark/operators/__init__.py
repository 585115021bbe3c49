from common_survey_data_pipeline_spark.operators.coalesce_join import coalesce_left_join
from common_survey_data_pipeline_spark.operators.fuzzy_join import (
    keep_best_match,
    stringdist_left_join,
    with_row_id,
)
from common_survey_data_pipeline_spark.operators.joins import anti_join, semi_join
from common_survey_data_pipeline_spark.operators.recency import (
    discover_recency_columns,
    recency_digit_key,
    sort_varinfo,
)
from common_survey_data_pipeline_spark.operators.stats import fuzzy_match_stats

__all__ = [
    "coalesce_left_join",
    "keep_best_match",
    "stringdist_left_join",
    "with_row_id",
    "anti_join",
    "semi_join",
    "discover_recency_columns",
    "recency_digit_key",
    "sort_varinfo",
    "fuzzy_match_stats",
]
