"""Anti / semi join wrappers (SURVEY.md §2.3 J4).

``anti_join(column_info, joined, by=qualtrics_col_name)`` at
``/root/reference/varinfo-update.R:142-145`` reports new-survey
variables absent from the joined codebook. Spark's ``left_anti`` /
``left_semi`` are the natively-scalable forms (broadcastable, null-aware
when needed); these wrappers add dplyr-style differing key names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _keyed(left: DataFrame, right: DataFrame, left_on: str, right_on: str | None, how: str,
           broadcast_right: bool, null_matches_null: bool) -> DataFrame:
    if right_on is None:
        right_on = left_on
    rk = right.select(F.col(f"`{right_on}`").alias("__csdp_key"))
    if broadcast_right:
        rk = F.broadcast(rk)
    lk = F.col(f"`{left_on}`")
    cond = lk.eqNullSafe(rk["__csdp_key"]) if null_matches_null else lk == rk["__csdp_key"]
    return left.join(rk, cond, how)


def anti_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str | None = None,
    broadcast_right: bool = False,
    null_matches_null: bool = True,
) -> DataFrame:
    """Rows of ``left`` with no key match in ``right``.

    ``null_matches_null=True`` (default) reproduces dplyr's
    ``na_matches="na"``: a NULL left key is considered matched by a NULL
    right key and therefore EXCLUDED — this is what drops the sentinel
    row from the reference's unmatched-variables report
    (varinfo-update.R:142-145). Set False for SQL ``NOT EXISTS``
    semantics (NULL keys always kept).
    """
    return _keyed(left, right, left_on, right_on, "left_anti", broadcast_right,
                  null_matches_null)


def semi_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str | None = None,
    broadcast_right: bool = False,
    null_matches_null: bool = True,
) -> DataFrame:
    """Rows of ``left`` with at least one key match in ``right``."""
    return _keyed(left, right, left_on, right_on, "left_semi", broadcast_right,
                  null_matches_null)
