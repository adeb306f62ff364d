"""Per-source raw-feed normalizers (SURVEY.md P4/P5 — the Spark
re-expression of Kahi's per-source parsers, ``KahiParser.py:136-206``
dispatching to ``Lens.py``/``WebOfScience.py``/``Scopus.py``/…).

Each upstream feed delivers change records as JSON payloads in its
own incompatible shape (FIXTURES.md §5). One ``from_json`` + select
per source maps it to the canonical EVENT schema; the dispatcher is
``unionByName`` over the per-source frames — Catalyst sees one plan,
no per-record Python (the reference's ``if "lens" in data`` chains
become DataFrame branches).

Feed shapes (transcript-flavored analogues of the reference's raw
databases):

* ``lens``-like  — nested JSON (reference Lens: nested dicts)
* ``wos``-like   — flat 2-letter tag fields (reference WoS: TI/AB/PY…)
* ``scopus``-like — human-readable CSV-export headers with spaces
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

LENS_PAYLOAD = T.StructType(
    [
        T.StructField("conversation", T.StructType([
            T.StructField("id", T.StringType()),
            T.StructField("turn", T.IntegerType()),
        ])),
        T.StructField("speaker", T.StructType([T.StructField("role", T.StringType())])),
        T.StructField("body", T.StringType()),
        T.StructField("tool", T.StructType([T.StructField("name", T.StringType())])),
        T.StructField("sent_at", T.StringType()),  # ISO-8601
        T.StructField("operation", T.StringType()),
    ]
)

WOS_PAYLOAD = T.StructType(
    [
        T.StructField("CI", T.StringType()),   # conv id, composite "WOS:<id>"
        T.StructField("TI", T.IntegerType()),  # turn index
        T.StructField("RO", T.StringType()),   # role tag
        T.StructField("TX", T.StringType()),   # text
        T.StructField("TL", T.StringType()),   # tool
        T.StructField("TS", T.LongType()),     # epoch seconds
        T.StructField("OP", T.StringType()),   # I/U/D single-letter op
    ]
)

SCOPUS_PAYLOAD = T.StructType(
    [
        T.StructField("Conv Id", T.StringType()),
        T.StructField("Turn", T.StringType()),      # stringly-typed int
        T.StructField("Role", T.StringType()),
        T.StructField("Text", T.StringType()),
        T.StructField("Tool", T.StringType()),
        T.StructField("Timestamp", T.StringType()), # ISO-8601
        T.StructField("Op", T.StringType()),
    ]
)


def normalize_lens(feed: DataFrame) -> DataFrame:
    """Nested-JSON feed → canonical events (``Lens.py:13-143``)."""
    p = F.from_json(F.col("payload"), LENS_PAYLOAD).alias("p")
    return feed.select("seq", p).select(
        "seq",
        F.coalesce(F.col("p.operation"), F.lit("insert")).alias("op"),
        F.col("p.conversation.id").alias("conv_id"),
        F.col("p.conversation.turn").alias("turn_idx"),
        F.col("p.speaker.role").alias("role"),
        F.col("p.body").alias("text"),
        F.col("p.tool.name").alias("tool"),
        F.to_timestamp("p.sent_at").alias("ts"),
        F.lit("lens").alias("source"),
    )


def normalize_wos(feed: DataFrame) -> DataFrame:
    """Flat-tag feed → canonical events (``WebOfScience.py:23-182``;
    composite id split per F15, ``WebOfScience.py:163``)."""
    p = F.from_json(F.col("payload"), WOS_PAYLOAD).alias("p")
    op = (
        F.when(F.col("p.OP") == "D", "delete")
        .when(F.col("p.OP") == "U", "update")
        .otherwise("insert")
    )
    return feed.select("seq", p).select(
        "seq",
        op.alias("op"),
        F.element_at(F.split(F.col("p.CI"), ":"), -1).alias("conv_id"),
        F.col("p.TI").alias("turn_idx"),
        F.col("p.RO").alias("role"),
        F.col("p.TX").alias("text"),
        F.col("p.TL").alias("tool"),
        F.timestamp_seconds(F.col("p.TS")).alias("ts"),
        F.lit("wos").alias("source"),
    )


def normalize_scopus(feed: DataFrame) -> DataFrame:
    """CSV-export-header feed → canonical events
    (``Scopus.py:17-157``; stringly ints use the F8 safe cast)."""
    from kahi_spark.functions.scalars import safe_int_expr

    p = F.from_json(F.col("payload"), SCOPUS_PAYLOAD).alias("p")
    return feed.select("seq", p).select(
        "seq",
        F.lower(F.coalesce(F.col("p.Op"), F.lit("insert"))).alias("op"),
        F.col("p.`Conv Id`").alias("conv_id"),
        safe_int_expr(F.col("p.Turn")).alias("turn_idx"),
        F.col("p.Role").alias("role"),
        F.col("p.Text").alias("text"),
        F.col("p.Tool").alias("tool"),
        F.to_timestamp("p.Timestamp").alias("ts"),
        F.lit("scopus").alias("source"),
    )


NORMALIZERS = {
    "lens": normalize_lens,
    "wos": normalize_wos,
    "scopus": normalize_scopus,
}


def normalize_feeds(feed: DataFrame) -> DataFrame:
    """P5 dispatch: route each record to its source's normalizer and
    union the canonical outputs. ``feed`` has (seq, source, payload).
    """
    parts = [
        fn(feed.filter(F.col("source") == src)) for src, fn in NORMALIZERS.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
