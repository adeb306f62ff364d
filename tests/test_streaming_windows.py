"""Native streaming ops: watermarked tumbling windows and the
applyInPandasWithState running-state operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from kahi_spark.gen import write_event_batches
from kahi_spark.schema import EVENT_SCHEMA
from kahi_spark.sources.events import stream_event_log
from kahi_spark.streaming.windows import (
    conversation_progress,
    run_stream_to_memory,
    windowed_event_counts,
)


def test_windowed_counts_with_watermark(spark, tmp_path):
    event_dir = str(tmp_path / "ev")
    write_event_batches(event_dir, 1000, 4, seed=17)
    stream = stream_event_log(spark, event_dir, max_files_per_trigger=1)
    # events span ~17 min; a 2-min watermark closes early windows
    # while the stream is still draining (append emits closed only)
    counts = windowed_event_counts(stream, window="5 minutes", watermark="2 minutes")
    out = run_stream_to_memory(spark, counts, "win_counts", "append")
    # append mode emits only watermark-closed windows; batch recompute
    # over the same closed windows must agree
    batch = spark.read.schema(EVENT_SCHEMA).parquet(event_dir)
    expected = (
        batch.groupBy(F.window("ts", "5 minutes").alias("w"), "op")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "op", "n_events")
    )
    got = {(r.window_start, r.op): r.n_events for r in out.collect()}
    assert got, "watermark should have closed at least one window"
    exp = {(r.window_start, r.op): r.n_events for r in expected.collect()}
    # the generator emits events up to ±5 min out of order; a 2-min
    # watermark DROPS the ones arriving later than that, so a closed
    # window's count is ≤ the full-batch recount — never more, and
    # equal where no event was late (late-data policy working)
    assert all(v <= exp[k] for k, v in got.items())
    assert any(v == exp[k] for k, v in got.items())


def test_conversation_progress_state_accumulates(spark, tmp_path):
    event_dir = str(tmp_path / "ev2")
    write_event_batches(event_dir, 600, 3, seed=19)
    stream = stream_event_log(spark, event_dir, max_files_per_trigger=1)
    prog = conversation_progress(stream)
    out = run_stream_to_memory(spark, prog, "conv_progress", "update")
    # the LAST emission per conv must equal the batch totals
    from pyspark.sql import Window

    batch = spark.read.schema(EVENT_SCHEMA).parquet(event_dir)
    totals = {
        (r.conv_id): (r.n, r.mt)
        for r in batch.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("turn_idx").alias("mt"))
        .collect()
    }
    w = Window.partitionBy("conv_id").orderBy(F.desc("events_seen"))
    last = (
        out.withColumn("rn", F.row_number().over(w)).filter("rn = 1").collect()
    )
    assert len(last) == len(totals)
    for r in last:
        assert (r.events_seen, r.max_turn) == totals[r.conv_id]
    # state persisted across micro-batches: some conv must have been
    # updated in more than one batch (3 files → 3 batches)
    multi = out.groupBy("conv_id").count().filter("count > 1").count()
    assert multi > 0


def test_conversation_progress_idle_timeout_evicts(spark, tmp_path):
    """Round-5 hardening: ``idle_timeout_ms`` bounds the state store —
    a conversation with no events for that long is evicted (and
    restarts its counters if it reappears), instead of state growing
    forever with ever-new conv_ids. One availableNow run at
    maxFilesPerTrigger=1 → one micro-batch per file; each batch takes
    far longer than the 50 ms timeout, so a key skipping a batch is
    guaranteed expired by the next one."""
    import os
    from datetime import datetime

    import pandas as pd

    event_dir = str(tmp_path / "ev3")
    os.makedirs(event_dir)

    def emit(name, seq0, rows):
        n = len(rows)
        pd.DataFrame(
            {
                "seq": pd.array(range(seq0, seq0 + n), dtype="int64"),
                "op": pd.array(["insert"] * n, dtype="string"),
                "conv_id": pd.array([c for c, _ in rows], dtype="string"),
                "turn_idx": pd.array([t for _, t in rows], dtype="int32"),
                "role": pd.array(["user"] * n, dtype="string"),
                "text": pd.array(["x"] * n, dtype="string"),
                "tool": pd.array([None] * n, dtype="string"),
                "ts": pd.Series([datetime(2024, 1, 1)] * n, dtype="datetime64[us]"),
                "source": pd.array(["s"] * n, dtype="string"),
            }
        ).to_parquet(f"{event_dir}/{name}.parquet", index=False)

    emit("b0", 0, [("A", 0), ("A", 1), ("A", 2), ("B", 0)])
    emit("b1", 4, [("B", 1)])  # A idle this batch -> timer fires, evicted
    emit("b2", 5, [("A", 7)])  # A reappears -> counters restart

    by_epoch: dict[int, dict] = {}

    def sink(df, epoch):
        by_epoch[int(epoch)] = {
            r.conv_id: (r.events_seen, r.max_turn) for r in df.collect()
        }

    stream = stream_event_log(spark, event_dir, max_files_per_trigger=1)
    prog = conversation_progress(stream, idle_timeout_ms=50)
    q = (
        prog.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    if q.isActive:
        q.stop()

    assert by_epoch[0] == {"A": (3, 2), "B": (1, 0)}
    # epoch 1: A had no data and its 50 ms timer expired -> evicted,
    # emitting nothing; B (which HAS data) is never the timeout call
    assert by_epoch[1] == {"B": (2, 1)}
    # epoch 2: the evicted key restarts from scratch
    assert by_epoch[2].get("A") == (1, 7)
