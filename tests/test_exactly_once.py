"""Exactly-once across restart: replayable source + checkpoint + idempotent
sink (reference protocol: docs/contents/introduction/message-delivery.md:8-13
— checkpointed state at the global min clock, sources replay from it;
FIXTURES.md §B.7)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from gearpump_spark.streaming import replay_parquet_stream


def _write_chunk(spark, path, lo, hi):
    spark.range(lo, hi).select(
        F.col("id"), F.timestamp_seconds(F.col("id")).alias("ts")
    ).coalesce(1).write.mode("append").parquet(path)
    time.sleep(0.05)


def test_exactly_once_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "id bigint, ts timestamp"

    # phase 1: two files arrive, query drains them and "crashes" (stops)
    _write_chunk(spark, src, 0, 100)
    _write_chunk(spark, src, 100, 250)
    stream = replay_parquet_stream(spark, src, schema, max_files_per_trigger=1)
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.read.parquet(out).count() == 250

    # phase 2: more data lands; a NEW query restarts from the same
    # checkpoint — replay must not duplicate the already-committed rows
    _write_chunk(spark, src, 250, 400)
    stream2 = replay_parquet_stream(spark, src, schema, max_files_per_trigger=1)
    q2 = (
        stream2.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()

    result = spark.read.parquet(out)
    assert result.count() == 400, "no loss"
    assert result.select("id").distinct().count() == 400, "no duplication"


def test_replace_operator_mid_stream_no_loss_no_dup(spark, tmp_path):
    """Dynamic-DAG ReplaceProcessor analog (reference DagManager.scala:
    103-160): swap a transformation mid-stream via replace_and_restart.
    Rows drained before the swap keep the OLD operator's output; rows after
    get the NEW one; nothing is lost or duplicated across the swap."""
    from gearpump_spark.streaming import replace_and_restart

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "id bigint, ts timestamp"

    def start_with(transform):
        stream = replay_parquet_stream(spark, src, schema, max_files_per_trigger=1)
        return (
            transform(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    # phase 1: old operator (v = id + 1) drains the first two files
    _write_chunk(spark, src, 0, 100)
    _write_chunk(spark, src, 100, 250)
    q1 = start_with(lambda s: s.select("id", (F.col("id") + 1).alias("v")))
    q1.awaitTermination()

    # swap: new data lands, the replacement operator computes v = id * 10
    _write_chunk(spark, src, 250, 400)
    q2 = replace_and_restart(
        q1, lambda: start_with(lambda s: s.select("id", (F.col("id") * 10).alias("v")))
    )
    q2.awaitTermination()

    result = spark.read.parquet(out)
    assert result.count() == 400, "no loss across the swap"
    assert result.select("id").distinct().count() == 400, "no duplication"
    # pre-swap rows carry the old operator's output, post-swap rows the new
    pre = result.filter(F.col("id") < 250).filter(F.col("v") != F.col("id") + 1).count()
    post = result.filter(F.col("id") >= 250).filter(F.col("v") != F.col("id") * 10).count()
    assert pre == 0 and post == 0


def test_stateful_running_count_across_batches(spark, tmp_path):
    """PersistentTask analog: state recovered per micro-batch and folded
    (reference: state/api/PersistentTask.scala:36-98). Two files → two
    micro-batches; the update-mode output's final row per key must carry
    the cumulative count."""
    from gearpump_spark.streaming import stateful_running_count

    src = str(tmp_path / "ssrc")
    rows1 = [("a",), ("a",), ("b",)]
    rows2 = [("a",), ("b",), ("b",), ("b",)]
    spark.createDataFrame(rows1, "k string").coalesce(1).write.mode("append").parquet(src)
    time.sleep(0.05)
    spark.createDataFrame(rows2, "k string").coalesce(1).write.mode("append").parquet(src)

    stream = replay_parquet_stream(spark, src, "k string", max_files_per_trigger=1)
    counts = stateful_running_count(stream, "k")
    q = (
        counts.writeStream.format("memory")
        .queryName("state_counts")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode emits one row per key per batch; the max is the final state
    final = {
        r.key: r.cnt
        for r in spark.sql(
            "SELECT key, MAX(running_count) AS cnt FROM state_counts GROUP BY key"
        ).collect()
    }
    assert final == {"a": 3, "b": 4}
