"""Sinks: lakehouse transcript table with MERGE upserts (SURVEY.md S8)."""

from kahi_spark.sinks.snapshot import SnapshotTable

__all__ = ["SnapshotTable"]
