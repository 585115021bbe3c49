from common_survey_data_pipeline_spark.sources.csv import (
    read_csv_readr,
    repair_duplicate_names,
    write_csv_single_file,
)
from common_survey_data_pipeline_spark.sources.tables import TPCH_TABLES, load_table, load_tables

__all__ = [
    "read_csv_readr",
    "repair_duplicate_names",
    "write_csv_single_file",
    "TPCH_TABLES",
    "load_table",
    "load_tables",
]
