"""Bucketed-layout evidence: two tables bucketed on conv_id join
WITHOUT a shuffle (the local stand-in for Iceberg's
bucket(N, conv_id) storage-partitioned join the north rule names —
at 10^10 events this is what keeps MERGE from re-shuffling the big
state side every epoch)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    import uuid

    ev = spark.createDataFrame(
        [(f"c{i % 7}", i, f"t{i}") for i in range(200)],
        ["conv_id", "turn_idx", "text"],
    )
    # unique names: the in-memory catalog forgets tables across
    # sessions but their warehouse directories persist
    suffix = uuid.uuid4().hex[:8]
    names = (f"state_a_{suffix}", f"state_b_{suffix}")
    for name in names:
        (
            ev.write.format("parquet")
            .bucketBy(4, "conv_id")
            .sortBy("conv_id")
            .mode("overwrite")
            .saveAsTable(name)
        )
    a = spark.table(names[0])
    b = spark.table(names[1]).groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"))
    joined = a.join(b, on="conv_id")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # both sides pre-bucketed on the join key: no Exchange for the join
    assert "Exchange hashpartitioning(conv_id" not in plan, plan
    assert joined.count() == 200
