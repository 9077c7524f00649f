"""Argmax operators with the reference's tie semantics.

The reference's "most popular candidate" table keeps *all* candidates tied at
max frequency (create_databases.py:103-122), while its final entity pick
breaks ties deterministically by sorted id with names preferred over aliases
(prefix_trie_linker.py:247-260). Spark's ``max_by`` would silently drop ties
non-deterministically, so:

* :func:`argmax_with_ties` — ``rank() == 1`` window (ties preserved, A2);
* :func:`top1_deterministic` — ``row_number() == 1`` over a **total** order
  ``(score desc, tiebreak asc)`` (J3/W2).

Both are pure window plans — one shuffle on the partition key, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def argmax_with_ties(
    df: DataFrame, key_cols: list[str], score_col: str
) -> DataFrame:
    """All rows per key whose score equals the key's max (ties preserved)."""
    w = Window.partitionBy(*key_cols).orderBy(F.col(score_col).desc())
    return (
        df.withColumn("__rk", F.rank().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )


def top1_deterministic(
    df: DataFrame,
    key_cols: list[str],
    order: list[Column] | None = None,
    score_col: str | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Single winner per key under a total order (deterministic re-runs).

    Pass either explicit ``order`` columns or ``(score_col desc,
    tiebreak_col asc)``.
    """
    if order is None:
        assert score_col and tiebreak_col
        order = [F.col(score_col).desc(), F.col(tiebreak_col).asc()]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
