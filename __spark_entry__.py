"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC replay on sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2
(plus training-data ops); ``oracle_sql()`` gives DuckDB-equivalent
ANSI SQL with byte-identical aliasing for the driver's side-by-side
correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full change-log
    replay → final transcript state (driver checks rows>0)."""
    from kahi_spark.queries import q_cdc_apply_lww

    return q_cdc_apply_lww(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kahi_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from kahi_spark.queries import ORACLES
    from kahi_spark.queries_ext import ensure_oracle_fixtures

    # some oracles read filesystem fixtures (worklist CSV, expected-
    # assets parquet); materialize them now so the driver may run the
    # DuckDB side first (the Spark side also ensures them lazily)
    ensure_oracle_fixtures()
    return dict(ORACLES)
