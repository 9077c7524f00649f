"""Sources & sinks (SURVEY.md §2.1).

The reference reads bz2-XML dumps, JSONL article files, TSV SPARQL exports and
writes TSV/JSONL/LMDB (extract_redirects.py:28-51, link_text.py:59-70,
Makefile:280-295, create_databases.py:135-153). The rebuild standardizes on
columnar parquet for tables and keeps explicit-schema JSONL/TSV readers for
the reference's interchange formats (schema inference is banned in the hot
path — it double-scans the input).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SF_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# The reference's Article record (benchmarks/*.benchmark.jsonl:1,
# WikiExtractor.py:593-608) as an explicit Spark schema — spans are
# half-open [start, end) char intervals.
SPAN = T.ArrayType(T.LongType())
ARTICLE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField(
            "hyperlinks",
            T.ArrayType(
                T.StructType(
                    [T.StructField("span", SPAN), T.StructField("target", T.StringType())]
                )
            ),
        ),
        T.StructField("title_synonyms", T.ArrayType(SPAN)),
        T.StructField("evaluation_span", SPAN),
        T.StructField(
            "labels",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.LongType()),
                        T.StructField("span", SPAN),
                        T.StructField("entity_id", T.StringType()),
                        T.StructField("name", T.StringType()),
                        T.StructField("type", T.StringType()),
                        T.StructField("parent", T.LongType()),
                        T.StructField("children", T.ArrayType(T.LongType())),
                        T.StructField("coref", T.BooleanType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "entity_mentions",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("span", SPAN),
                        T.StructField("id", T.StringType()),
                        T.StructField("recognized_by", T.StringType()),
                        T.StructField("linked_by", T.StringType()),
                        T.StructField("candidates", T.ArrayType(T.StringType())),
                    ]
                )
            ),
        ),
    ]
)


def load_sf_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every driver testdata table present in ``sf_dir``."""
    out = {}
    for name in SF_TABLES:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            out[name] = spark.read.parquet(p)
    return out


def read_articles_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL article source with the explicit Article schema (S3/S4)."""
    return spark.read.schema(ARTICLE_SCHEMA).json(path)


def write_tsv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """TSV sink (S8). ``single_file`` mirrors the reference's sorted
    one-file outputs — only for small dimension tables; large tables keep
    one file per partition."""
    w = df.coalesce(1) if single_file else df
    w.write.mode("overwrite").option("sep", "\t").option("header", "true").csv(path)
