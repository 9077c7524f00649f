"""Explicit skew handling for hot blocking keys (north_rule mandate).

The reference's analogue of a hot key is a hyper-ambiguous alias (one alias →
thousands of candidate entities) or the vendored-file block; its answer is an
in-RAM dict so skew is invisible. At 10^12 files a single hot block key would
produce O(n²) candidate pairs on one reducer. Three explicit tools, applied
*before* the pair self-join (AQE skew-join splitting alone cannot fix a
quadratic pair blow-up — it only rebalances, so we reshape the workload):

* :func:`block_size_profile` — groupBy(block).count() diagnostics;
* :func:`drop_stopword_blocks` — drop blocks over a hard cap (the reference
  drops stopword aliases the same way, prefix_trie_linker.py:180-183);
* :func:`salt_large_blocks` — deterministically split an oversized block into
  ``ceil(n/cap)`` chained sub-blocks that overlap by one member, so transitive
  clustering still connects the block while pair counts stay
  O(n·cap) instead of O(n²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def block_size_profile(block_df: DataFrame, block_col: str = "block_key") -> DataFrame:
    return (
        block_df.groupBy(block_col)
        .agg(F.count("*").alias("block_size"))
        .orderBy(F.col("block_size").desc())
    )


def drop_stopword_blocks(
    block_df: DataFrame, block_col: str = "block_key", max_size: int = 10000
) -> DataFrame:
    sizes = block_df.groupBy(block_col).agg(F.count("*").alias("__n"))
    keep = sizes.filter(F.col("__n") <= max_size).select(block_col)
    return block_df.join(F.broadcast(keep), block_col, "inner")


def salt_large_blocks(
    block_df: DataFrame,
    id_col: str = "file_id",
    block_col: str = "block_key",
    cap: int = 64,
) -> DataFrame:
    """Rewrite block keys so no block exceeds ``cap + 1`` members.

    Members of an oversized block are ordered deterministically by id and cut
    into chunks of ``cap``; each chunk after the first repeats the previous
    chunk's last member ("chain link"), so connected components over the
    resulting pairs still merges the whole block. Small blocks pass through
    unchanged. Deterministic: pure function of (ids, cap).
    """
    w = Window.partitionBy(block_col).orderBy(id_col)
    sized = block_df.withColumn("__rn", F.row_number().over(w) - 1).withColumn(
        "__n", F.count("*").over(Window.partitionBy(block_col))
    )
    small = sized.filter(F.col("__n") <= cap).select(id_col, block_col)
    big = sized.filter(F.col("__n") > cap)
    chunk = (F.col("__rn") / cap).cast("long")
    own = big.select(
        id_col, F.concat(F.col(block_col), F.lit("~s"), chunk).alias(block_col)
    )
    # chain link: last member of chunk c is also a member of chunk c+1
    links = (
        big.filter(((F.col("__rn") + 1) % cap == 0) & (F.col("__rn") + 1 < F.col("__n")))
        .select(
            id_col,
            F.concat(F.col(block_col), F.lit("~s"), chunk + 1).alias(block_col),
        )
    )
    return small.unionByName(own).unionByName(links)
