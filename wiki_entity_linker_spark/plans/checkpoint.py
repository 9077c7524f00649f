"""Checkpointed stage tables with per-partition lineage + counters.

The reference's resumability is Make's skip-if-output-exists
(Makefile:178-198) plus ``--start_line`` resume knobs
(create_entity_word_vectors.py:31). The graft requires the same contract as
first-class dataflow: every pipeline stage writes a parquet table (the
Iceberg-shaped fallback — swap ``_write``/``_read`` for
``writeTo(...).createOrReplace()`` when the iceberg-spark-runtime jar is on
the classpath) together with a manifest recording ``params_hash``, total and
per-partition row counts. Re-running with identical params skips straight to
the stored table; changing any upstream param invalidates every downstream
stage (hash chaining).
"""

from __future__ import annotations

import hashlib
import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def params_hash(params: dict) -> str:
    return hashlib.sha256(
        json.dumps(params, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


def partition_lineage(df: DataFrame) -> list[dict]:
    """Per-partition row counters (X4 telemetry analogue, link_text.py:100-107)."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count("*").alias("rows"))
        .collect()
    )
    return [{"partition_id": r["partition_id"], "rows": r["rows"]} for r in rows]


class StageManager:
    """Skip-if-complete stage runner.

    >>> mgr = StageManager(spark, "/tmp/er_run", {"threshold": 0.4})
    >>> edges = mgr.stage("edges", lambda: build_edges(...))
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        params: dict | None = None,
        enabled: bool = True,
    ):
        """``enabled=False`` turns the manager into a passthrough (each stage
        is ``localCheckpoint``-ed to cut lineage but nothing hits disk and no
        counters are collected) — used by throughput benchmarks where the
        durability contract isn't under test."""
        self.spark = spark
        self.root = root
        self.enabled = enabled
        self.chain_hash = params_hash(params or {})
        self.counters: dict[str, dict] = {}
        if enabled:
            os.makedirs(root, exist_ok=True)

    def _meta_path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.meta.json")

    def _data_path(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.parquet")

    def stage(
        self,
        name: str,
        build: Callable[[], DataFrame],
        collect_lineage: bool = True,
    ) -> DataFrame:
        """Run (or resume) one stage; chain the params hash downstream."""
        if not self.enabled:
            # persist (lazy): computed once on first action, REUSED by every
            # downstream stage — a lazy localCheckpoint here caused repeated
            # recomputation of shared stages (features was rebuilt by both
            # the blocking and scoring stages: 2x shingle+hash cost)
            return build().persist()
        meta_path = self._meta_path(name)
        data_path = self._data_path(name)
        # every stage's identity folds in upstream identities
        self.chain_hash = params_hash({"prev": self.chain_hash, "stage": name})
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            if meta.get("params_hash") == self.chain_hash:
                self.counters[name] = meta | {"resumed": True}
                return self.spark.read.parquet(data_path)
        df = build()
        df.write.mode("overwrite").parquet(data_path)
        out = self.spark.read.parquet(data_path)
        meta = {
            "stage": name,
            "params_hash": self.chain_hash,
            "rows_out": out.count(),
            "partitions": partition_lineage(out) if collect_lineage else [],
        }
        with open(meta_path, "w") as f:
            json.dump(meta, f)
        self.counters[name] = meta | {"resumed": False}
        return out
