"""Native Structured Streaming operators (SURVEY.md §2.8): watermarked
event-time windows and custom stateful processing.

The CDC MERGE path runs through ``foreachBatch`` (keyed upserts don't
need stream state — the sink IS the state). These operators cover the
complementary cases: engine-internal throughput/QA metrics over event
time, and per-key running state that must live INSIDE the stream.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling event-time window counts with a watermark: late events
    inside the watermark still update their window; older ones are
    dropped and the window state is evicted (bounded memory at
    10^10 events — without the watermark, window state grows
    forever)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("op"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "op",
            "n_events",
        )
    )


CONV_PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("events_seen", T.LongType()),
        T.StructField("max_turn", T.IntegerType()),
        T.StructField("batch_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("events_seen", T.LongType()),
        T.StructField("max_turn", T.IntegerType()),
    ]
)


def conversation_progress(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-conversation running counters (events seen so far, max turn
    index) maintained across micro-batches — the shape Kahi's
    shrinking in-memory candidate lists had (``Kahi.py:195-199``),
    held in managed stream state instead of driver RAM.

    ``idle_timeout_ms``: evict a conversation's state after that much
    processing time without new events (the key re-starts its
    counters if it later reappears). Default None keeps state forever
    — fine for bounded key sets; at 10^10 events with ever-new
    conv_ids the state store grows without bound, so long-running
    deployments SHOULD set a timeout (round-5 review finding)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if idle_timeout_ms is not None and state.hasTimedOut:
            state.remove()  # idle conversation: evict, emit nothing
            return
        seen, max_turn = state.get if state.exists else (0, -1)
        batch = 0
        for pdf in pdfs:
            batch += len(pdf)
            if len(pdf):
                max_turn = max(max_turn, int(pdf["turn_idx"].max()))
        seen += batch
        state.update((seen, max_turn))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "conv_id": [conv_id],
                "events_seen": [seen],
                "max_turn": [max_turn],
                "batch_events": [batch],
            }
        )

    return events.groupBy("conv_id").applyInPandasWithState(
        update,
        outputStructType=CONV_PROGRESS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            "ProcessingTimeTimeout" if idle_timeout_ms is not None else "NoTimeout"
        ),
    )


def run_stream_to_memory(
    spark, stream_df: DataFrame, query_name: str, output_mode: str, timeout_s: float = 120.0
) -> DataFrame:
    """Drain a streaming DataFrame into an in-memory sink (tests)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    if q.isActive:
        q.stop()
    return spark.table(query_name)


__all__: list[Any] = [
    "windowed_event_counts",
    "conversation_progress",
    "run_stream_to_memory",
]
