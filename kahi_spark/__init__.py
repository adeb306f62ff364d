"""kahi_spark — a PySpark-native CDC / incremental-ingest engine.

A brand-new engine (NOT a port) with the query/data-processing
capabilities of grupocolav/Kahi, re-expressed Spark-first:

* Structured Streaming tails an ordered change log of
  insert/update/delete events keyed on ``(conv_id, turn_idx)``
  (the CDC reframing of Kahi's stage-collection iteration,
  reference ``KahiDb.py:476,517,530``).
* Normalization (role canonicalization, text cleaning, tool-field
  extraction) runs as native column expressions or vectorized
  pandas/Arrow UDFs — never per-row Python (reference parsers:
  ``KahiParser.py:136-206`` and per-source files).
* Key-partitioned MERGE upserts land in a bucketed lakehouse table
  (Iceberg when the runtime is present; a versioned-Parquet
  snapshot table with identical MERGE semantics otherwise), with
  snapshot-isolated exactly-once commits keyed by epoch id and
  automatic schema evolution (reference upsert:
  ``KahiDb.py:864-909``; lineage: ``source_checked`` arrays).
"""

from kahi_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
