"""The emitted Iceberg MERGE INTO must (a) be valid Spark SQL —
parse-only via Spark's own parser, executing needs an Iceberg
catalog — and (b) implement EXACTLY ``merge_changes_into_state``'s
semantics: a generic MERGE interpreter (full-outer join, first
matching WHEN clause wins, unmatched rows insert) executes the
structured clauses from ``merge_clauses`` over a multi-batch change
log and the resulting table state is compared row-for-row against
the DataFrame path, tombstones and system columns included."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kahi_spark.operators.merge import (
    merge_changes_into_state,
    state_from_reduced,
)
from kahi_spark.sinks.iceberg_sql import merge_clauses, merge_into_sql


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
    # versioned comparison at the NULL-coalesced epoch floor
    assert "coalesce(s.ts, TIMESTAMP '1970-01-01 00:00:00')" in sql
    # a winning delete stamps its own version and flips the tombstone
    assert "t._deleted = (s.op = 'delete')" in sql
    assert "t._seq = s.seq" in sql
    # policy translation (A9)
    assert "t.tool = coalesce(t.tool, s.tool)" in sql
    assert "array_union" in sql and "t.tags =" in sql
    assert "t.ts = greatest(t.ts, s.ts)" in sql
    assert "t.text = s.text" in sql  # default lww
    # non-lww policies also apply for an OLDER change (DataFrame
    # path gates them on change-present, not on winning)
    assert "WHEN MATCHED AND NOT (" in sql
    # unmatched rows insert with tombstone flag derived from op
    assert "WHEN NOT MATCHED THEN" in sql and "(s.op = 'delete')" in sql


def test_merge_into_all_lww_has_single_matched_clause(spark):
    sql = merge_into_sql("t", "s", ["k"], ["v", "ts"])
    _parse(spark, sql)
    assert sql.count("WHEN MATCHED") == 1


def test_merge_into_rejects_unknown_policy(spark):
    with pytest.raises(ValueError):
        merge_into_sql("t", "s", ["k"], ["v", "ts"], policies={"v": "nope"})


def test_merge_into_rejects_unmanaged_ts(spark):
    """Versioning on a ts that is not a managed value column would
    diverge from merge_changes_into_state (which compares a change's
    ts as the epoch floor when absent) — refused loudly."""
    with pytest.raises(ValueError, match="ts_col"):
        merge_into_sql("t", "s", ["k"], ["v"])


# ---------------------------------------------------------------- executed


def _apply_merge_clauses(target, source, clauses):
    """Generic MERGE-semantics interpreter: apply the structured
    clauses exactly as an Iceberg engine would — matched rows take
    the first WHEN clause whose condition holds (columns absent from
    its SET keep their target value), unmatched source rows INSERT,
    unmatched target rows carry over."""
    out_cols = target.columns
    joined = target.alias("t").join(
        source.alias("s"), F.expr(clauses["on"]), "full_outer"
    )
    t_present = F.col("t._seq").isNotNull()  # state _seq is never NULL
    s_present = F.col("s.op").isNotNull()
    cols = []
    for c in out_cols:
        base = F.col(f"t.{c}")
        matched_val = base  # no clause condition holds → keep target
        for cond, sets in reversed(clauses["matched"]):
            val = F.expr(sets[c]) if c in sets else base
            matched_val = F.when(F.expr(cond), val).otherwise(matched_val)
        cols.append(
            F.when(~t_present, F.expr(clauses["insert"][c]))
            .when(~s_present, base)
            .otherwise(matched_val)
            .alias(c)
        )
    return joined.select(*cols)


_CH_SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("role", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("ts", T.TimestampType()),
        T.StructField("op", T.StringType()),
        T.StructField("seq", T.LongType()),
    ]
)


def _t(s):
    return datetime.datetime.fromisoformat(s) if s else None


#: three reduced batches (≤1 row per key each) planting every edge:
#: out-of-order delete then older update (must stay tombstoned),
#: NULL ts (compares at the epoch floor), equal-ts seq tie-breaks,
#: non-lww policies applying on OLDER changes, unsorted/dup arrays,
#: a delete inserting as a tombstone, and a resurrecting NEWER
#: update after a delete.
_BATCHES = [
    [
        ("k1", "user", None, ["b", "a", "b"], _t("2026-01-01T00:00:10"), "insert", 1),
        ("k2", "asst", "grep", ["x"], _t("2026-01-01T00:00:10"), "insert", 2),
        ("k3", "user", "sed", None, None, "insert", 3),
        ("k4", "sys", None, [], _t("2026-01-01T00:00:05"), "insert", 4),
        ("k5", None, None, None, _t("2026-01-01T00:00:30"), "delete", 5),
    ],
    [
        ("k1", None, None, None, _t("2026-01-01T00:00:20"), "delete", 10),
        # older than k2's stored (ts equal, seq lower): lww keeps,
        # fill_empty/union still apply
        ("k2", "late", "awk", ["y"], _t("2026-01-01T00:00:10"), "update", 1),
        # NULL ts vs NULL ts: seq decides (4 > 3 → wins)
        ("k3", "asst", None, ["z"], None, "update", 4),
        ("k6", "user", None, ["n"], _t("2026-01-01T00:00:01"), "insert", 11),
        # older than k5's tombstone: must NOT resurrect
        ("k5", "ghost", "rm", ["g"], _t("2026-01-01T00:00:25"), "update", 12),
    ],
    [
        # older than k1's delete (ts 15 < 20): stays tombstoned
        ("k1", "back", None, ["c"], _t("2026-01-01T00:00:15"), "update", 20),
        # equal ts, higher seq than stored _seq=2 → wins
        ("k2", "tied", None, None, _t("2026-01-01T00:00:10"), "update", 21),
        # NEWER than k5's tombstone → legitimately resurrects
        ("k5", "alive", None, ["r"], _t("2026-01-01T00:00:40"), "update", 22),
        ("k4", None, None, None, None, "delete", 23),  # NULL-ts delete loses
    ],
]

_POLICIES = {"tool": "fill_empty", "tags": "union", "role": "lww"}
_VALS = ["role", "tool", "tags", "ts"]


def test_merge_sql_clauses_execute_identically_to_dataframe_path(spark):
    batches = [
        spark.createDataFrame(rows, schema=_CH_SCHEMA) for rows in _BATCHES
    ]
    clauses = merge_clauses(["k"], _VALS, policies=_POLICIES)

    df_state = state_from_reduced(batches[0], key_cols=["k"])
    sql_state = df_state
    for b in batches[1:]:
        df_state = merge_changes_into_state(
            df_state, b, key_cols=["k"], value_cols=_VALS, policies=_POLICIES
        )
        sql_state = _apply_merge_clauses(sql_state, b, clauses)

    a = sorted(df_state.collect(), key=lambda r: r["k"])
    b = sorted(sql_state.collect(), key=lambda r: r["k"])
    assert [r.asDict() for r in a] == [r.asDict() for r in b]

    by_k = {r["k"]: r for r in a}
    # the delete stamped its own ts: the ts=15 update could not win
    assert by_k["k1"]["_deleted"] is True and by_k["k1"]["_seq"] == 10
    # ...but its union policy still applied on the older change
    assert by_k["k1"]["tags"] == ["a", "b", "c"]
    assert by_k["k5"]["_deleted"] is False and by_k["k5"]["role"] == "alive"
    assert by_k["k2"]["role"] == "tied" and by_k["k2"]["tool"] == "grep"
    assert by_k["k4"]["_deleted"] is False  # NULL-ts delete lost
    assert by_k["k3"]["role"] == "asst"  # NULL-ts seq tie-break


def test_merge_sql_bootstrap_insert_normalizes_union_arrays(spark):
    """First-seen keys through the interpreter's INSERT branch match
    state_from_reduced + the DataFrame path's union normalization on
    the next merge touching them."""
    empty = spark.createDataFrame([], schema=_CH_SCHEMA)
    clauses = merge_clauses(["k"], _VALS, policies=_POLICIES)
    sql_state = _apply_merge_clauses(
        state_from_reduced(empty, key_cols=["k"]),
        spark.createDataFrame(_BATCHES[0], schema=_CH_SCHEMA),
        clauses,
    )
    rows = {r["k"]: r for r in sql_state.collect()}
    assert rows["k1"]["tags"] == ["a", "b"]  # sorted, deduped at insert
    assert rows["k5"]["_deleted"] is True  # delete inserts a tombstone
    assert set(rows) == {"k1", "k2", "k3", "k4", "k5"}


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    seed=st.integers(0, 10_000),
    cuts=st.lists(st.integers(1, 199), min_size=1, max_size=3, unique=True),
    pol_role=st.sampled_from(["lww", "fill_empty"]),
    pol_tool=st.sampled_from(["lww", "fill_empty"]),
    pol_ts=st.sampled_from(["lww", "greatest"]),
)
def test_merge_sql_property_parity(spark, seed, cuts, pol_role, pol_tool, pol_ts):
    """Fuzzed: ANY generated change log, ANY batch boundaries, ANY
    policy assignment — chaining the emitted MERGE clauses through
    the interpreter must reproduce merge_changes_into_state's final
    state exactly (tombstones and system columns included)."""
    from kahi_spark.gen import make_events
    from kahi_spark.operators.merge import latest_change_per_key

    pdf = make_events(200, n_convs=6, seed=seed)
    keys = ["conv_id", "turn_idx"]
    vals = ["role", "text", "tool", "ts"]
    policies = {"role": pol_role, "tool": pol_tool, "ts": pol_ts}

    bounds, prev, chunks = sorted(set(cuts)) + [len(pdf)], 0, []
    for b in bounds:
        if b > prev:
            chunks.append(pdf.iloc[prev:b])
        prev = b
    reduced = [
        latest_change_per_key(spark.createDataFrame(c), key_cols=keys)
        for c in chunks
    ]

    df_state = state_from_reduced(reduced[0], key_cols=keys).select(
        *keys, *vals, "_seq", "_deleted"
    )
    sql_state = df_state
    clauses = merge_clauses(keys, vals, policies=policies)
    for r in reduced[1:]:
        df_state = merge_changes_into_state(
            df_state, r, key_cols=keys, value_cols=vals, policies=policies
        )
        sql_state = _apply_merge_clauses(sql_state, r, clauses)

    a = sorted(map(tuple, df_state.collect()))
    b = sorted(map(tuple, sql_state.collect()))
    assert a == b
