"""Sinks: lakehouse transcript table with MERGE upserts (SURVEY.md
S8), the incremental LSH dedup index, and the Iceberg MERGE INTO
statement emitter."""

from kahi_spark.sinks.dedup_index import LshDedupIndex
from kahi_spark.sinks.iceberg_sql import merge_into_sql
from kahi_spark.sinks.snapshot import SnapshotTable

__all__ = ["LshDedupIndex", "SnapshotTable", "merge_into_sql"]
