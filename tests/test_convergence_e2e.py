"""BASELINE.json mandated test, end-to-end through the streaming
pipeline: the SAME conversation arriving from multiple raw source
feeds (complementary/conflicting completeness) converges to ONE
canonical record per (conv_id, turn_idx)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kahi_spark.gen import make_multisource_events
from kahi_spark.sinks.snapshot import SnapshotTable
from kahi_spark.streaming.pipeline import CdcPipeline


def test_multisource_pipeline_convergence(spark, tmp_path):
    pdf = make_multisource_events(n_convs=10)
    event_dir = str(tmp_path / "feeds")
    os.makedirs(event_dir)
    # the three feeds arrive interleaved across two binlog files
    half = len(pdf) // 2
    pdf.iloc[:half].to_parquet(f"{event_dir}/b0.parquet", index=False)
    pdf.iloc[half:].to_parquet(f"{event_dir}/b1.parquet", index=False)

    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4, mode="cow")
    pipe = CdcPipeline(
        spark,
        event_dir,
        table,
        str(tmp_path / "ck"),
        converge_sources=("scopus", "wos", "lens"),
        policies={"tool": "fill_empty"},
    )
    pipe.run_until_idle()
    out = table.read()

    # ONE canonical record per key (the BASELINE.json:6 mandate)
    n_keys = spark.createDataFrame(pdf)[["conv_id", "turn_idx"]].distinct().count()
    assert out.count() == n_keys
    assert out.groupBy("conv_id", "turn_idx").count().filter("count > 1").count() == 0

    # field-level composition: scopus (priority 1) provided UPPERCASE
    # text on even turns; wos provided the tool on turns %3==0; lens
    # filled the rest — the canonical record carries all of them
    even = out.filter((F.col("turn_idx") % 2 == 0))
    assert even.filter(F.col("text") != F.upper(F.col("text"))).count() == 0
    tool_turns = out.filter(F.col("turn_idx") % 3 == 0)
    assert tool_turns.filter(F.col("tool") == "search").count() == tool_turns.count()
    # roles canonicalized from raw variants (USER/human/ai/Assistant)
    assert set(r.role for r in out.select("role").distinct().collect()) <= {
        "user", "assistant",
    }
