"""CSV work-list source (SURVEY.md S5 — the reference's
``extract_from_csv``, ``KahiDb.py:353-381``: read a CSV, take one
column as the keyed work-list, lowercase it, anti-join against
already-loaded records)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_worklist_csv(
    spark: SparkSession, path: str, key_col: str, alias: str = "key"
) -> DataFrame:
    """CSV → distinct lowercased key list (J2 normalization)."""
    df = spark.read.option("header", "true").csv(path)
    return (
        df.select(F.lower(F.trim(F.col(key_col))).alias(alias))
        .filter(F.col(alias).isNotNull() & (F.col(alias) != ""))
        .distinct()
    )


def pending_worklist(
    worklist: DataFrame, done: DataFrame, key: str
) -> DataFrame:
    """S9 anti-join: drop keys already present in the sink
    (``KahiDb.py:531-533``)."""
    return worklist.join(done.select(key).distinct(), on=key, how="left_anti")
