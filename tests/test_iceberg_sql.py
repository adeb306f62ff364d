"""The emitted Iceberg MERGE INTO must be valid Spark SQL (parse-only
validation — executing needs an Iceberg catalog, absent here) and
carry the documented versioned-CDC clauses."""

from __future__ import annotations

import pytest

from kahi_spark.sinks.iceberg_sql import merge_into_sql


def _parse(spark, sql: str) -> None:
    # Spark's own parser: raises ParseException on invalid SQL
    spark._jsparkSession.sessionState().sqlParser().parsePlan(sql)


def test_merge_into_parses_and_carries_cdc_clauses(spark):
    sql = merge_into_sql(
        "catalog.db.transcripts",
        "changes_v",
        key_cols=["conv_id", "turn_idx"],
        value_cols=["role", "text", "tool", "ts", "tags"],
        policies={"tool": "fill_empty", "tags": "union", "ts": "greatest"},
    )
    _parse(spark, sql)
    # versioned delete: late deletes can't resurrect older rows
    assert "s.op = 'delete' AND (s.ts > t.ts" in sql
    # policy translation (A9)
    assert "t.tool = coalesce(t.tool, s.tool)" in sql
    assert "array_union" in sql and "t.tags =" in sql
    assert "t.ts = greatest(t.ts, s.ts)" in sql
    assert "t.text = s.text" in sql  # default lww
    # unmatched rows insert with tombstone flag derived from op
    assert "WHEN NOT MATCHED THEN" in sql and "(s.op = 'delete')" in sql


def test_merge_into_rejects_unknown_policy(spark):
    with pytest.raises(ValueError):
        merge_into_sql("t", "s", ["k"], ["v"], policies={"v": "nope"})
