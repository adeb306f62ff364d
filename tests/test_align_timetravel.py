"""A7 positional alignment operator + snapshot time travel."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kahi_spark.operators.align import align_positional_lists


def test_align_positional_lists(spark):
    el = T.ArrayType(
        T.StructType(
            [
                T.StructField("name", T.StringType()),
                T.StructField("affiliation", T.StringType()),
                T.StructField("orcid", T.StringType()),
            ]
        )
    )
    schema = T.StructType(
        [
            T.StructField("doc", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("authors", el),
        ]
    )
    df = spark.createDataFrame(
        [
            # lens (driver): names + affiliations, no orcid
            ("d1", "lens", [("Ada L", "Cambridge", None), ("Chas B", None, None)]),
            # wos: same order, orcids + an affiliation lens lacked
            ("d1", "wos", [("A. Lovelace", None, "0000-1"), ("C. Babbage", "London", "0000-2")]),
            # scopus-only doc: becomes the driver by default
            ("d2", "scopus", [("Solo A", "X", None)]),
        ],
        schema,
    )
    out = align_positional_lists(
        df,
        key_cols=["doc"],
        source_col="source",
        list_col="authors",
        element_fields=["name", "affiliation", "orcid"],
        priority=("lens", "wos", "scielo", "scopus"),
    )
    got = {r.doc: [tuple(a) for a in r.authors] for r in out.collect()}
    # driver (lens) order + names kept; orcid/affiliation complemented from wos
    assert got["d1"] == [
        ("Ada L", "Cambridge", "0000-1"),
        ("Chas B", "London", "0000-2"),
    ]
    assert got["d2"] == [("Solo A", "X", None)]


def test_align_tied_rank_picks_one_deterministic_driver(spark):
    """Two sources absent from `priority` share the fallback rank:
    exactly ONE (first by source name) must drive — a tie must not
    posexplode both lists and double every position (round-5
    review). The loser still complements."""
    el = T.ArrayType(
        T.StructType(
            [
                T.StructField("name", T.StringType()),
                T.StructField("orcid", T.StringType()),
            ]
        )
    )
    schema = T.StructType(
        [
            T.StructField("doc", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("authors", el),
        ]
    )
    df = spark.createDataFrame(
        [
            ("d1", "zeta", [("Z One", None), ("Z Two", "0-2")]),
            ("d1", "alpha", [("A One", "0-1"), ("A Two", None)]),
        ],
        schema,
    )
    out = align_positional_lists(
        df,
        key_cols=["doc"],
        source_col="source",
        list_col="authors",
        element_fields=["name", "orcid"],
        priority=("lens", "wos"),  # neither present source is listed
    )
    got = {r.doc: [tuple(a) for a in r.authors] for r in out.collect()}
    # alpha (first by name at the tied rank) drives; zeta complements
    assert got["d1"] == [("A One", "0-1"), ("A Two", "0-2")]


def test_snapshot_time_travel(spark, tmp_path):
    from kahi_spark.schema import EVENT_SCHEMA
    from kahi_spark.sinks.snapshot import SnapshotTable

    def ts(i):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)

    t = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=2)
    t.merge(
        spark.createDataFrame(
            [(0, "insert", "c1", 0, "user", "v1", None, ts(0), "lens")], EVENT_SCHEMA
        ),
        epoch_id=0,
    )
    v1 = t._read_manifest()["version"]
    t.merge(
        spark.createDataFrame(
            [(1, "update", "c1", 0, "user", "v2", None, ts(9), "lens")], EVENT_SCHEMA
        ),
        epoch_id=1,
    )
    assert t.read().collect()[0].text == "v2"
    assert t.read(version=v1).collect()[0].text == "v1"  # time travel
    import pytest

    with pytest.raises(FileNotFoundError):
        t.read(version=999)
