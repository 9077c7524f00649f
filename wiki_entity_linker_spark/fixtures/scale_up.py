"""Deterministic scale-up of the driver testdata for the bench's sf1 leg.

The driver generates parquet at sf0.001/0.01/0.1 only; at sf0.1 half the
headline queries finish in <2 s where shared-host scheduling noise is ~20%,
so a plan regression can hide inside the jitter (VERDICT r3 #6).  This
module replicates the sf0.1 tables ``factor``× with remapped keys into a
cached directory, giving the expensive queries a measurement floor an
order of magnitude above the noise.

Determinism: every derived row is a pure function of (source row, replica
index) — no randomness, no timestamps — so the scaled tables are
byte-stable across rounds and the bench numbers stay comparable.

Replica semantics: ids are remapped as ``id * factor + replica`` so keys
stay dense and disjoint; document text gets a per-replica suffix token so
near-dup structure is preserved within a replica while the replicas of one
document form a small exact-family (bounded: ``factor`` copies each), the
shape a deduplicated-crawl corpus actually has.
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SCALED_TABLES = ("documents", "events", "orders", "embeddings")

_ID_COLS = {
    "documents": "doc_id",
    "events": "event_id",
    "orders": "o_orderkey",
    "embeddings": "vec_id",
}


def _replicate(df: DataFrame, table: str, factor: int) -> DataFrame:
    rep = df.withColumn(
        "__r", F.explode(F.sequence(F.lit(0), F.lit(factor - 1)))
    )
    id_col = _ID_COLS[table]
    rep = rep.withColumn(
        id_col, (F.col(id_col) * factor + F.col("__r")).cast("long")
    )
    if table == "documents":
        rep = rep.withColumn(
            "text", F.concat_ws(" ", F.col("text"),
                                F.concat(F.lit("rep"), F.col("__r"))))
    if table == "orders":
        # keep the customer FK space unchanged so joins stay meaningful
        pass
    return rep.drop("__r")


def ensure_scaled_sf(
    spark: SparkSession,
    src_dir: str = "/root/testdata/sf0.1",
    dst_dir: str = "/tmp/sf1_synth",
    factor: int = 10,
    tables: tuple = SCALED_TABLES,
) -> str:
    """Create (once) and return a directory of ``factor``×-scaled tables."""
    marker = os.path.join(dst_dir, f"_SCALED_x{factor}")
    if os.path.exists(marker):
        return dst_dir
    os.makedirs(dst_dir, exist_ok=True)
    for table in tables:
        src = os.path.join(src_dir, f"{table}.parquet")
        if not os.path.exists(src):
            continue
        out = os.path.join(dst_dir, f"{table}.parquet")
        (_replicate(spark.read.parquet(src), table, factor)
         .repartition(max(8, spark.sparkContext.defaultParallelism))
         .write.mode("overwrite").parquet(out))
    # non-scaled dims are linked through so every query keeps its inputs
    for name in ("region", "nation", "customer", "supplier", "part",
                 "lineitem"):
        src = os.path.join(src_dir, f"{name}.parquet")
        dst = os.path.join(dst_dir, f"{name}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)
    with open(marker, "w") as f:
        f.write(f"source={src_dir} factor={factor}\n")
    return dst_dir
