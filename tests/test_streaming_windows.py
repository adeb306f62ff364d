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
