"""A9 mod-patch merge policies: fill_empty / union / greatest are
commutative; lww respects (ts, seq)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kahi_spark.operators.merge import (
    SYS_DELETED,
    SYS_SEQ,
    latest_change_per_key,
    merge_changes_into_state,
)


def ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)


STATE_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("ts", T.TimestampType()),
        T.StructField(SYS_SEQ, T.LongType()),
        T.StructField(SYS_DELETED, T.BooleanType()),
    ]
)

CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("ts", T.TimestampType()),
    ]
)


def test_policies(spark):
    state = spark.createDataFrame(
        [
            ("c1", 0, "have", ["a"], ts(50), 10, False),
            ("c1", 1, None, ["x"], ts(50), 11, False),
        ],
        STATE_SCHEMA,
    )
    # OLDER change (ts=5 < 50): lww loses, but fill/union/greatest apply
    changes = spark.createDataFrame(
        [
            (20, "update", "c1", 0, "older-text", ["b", "a"], ts(5)),
            (21, "update", "c1", 1, "fills-null", ["y"], ts(5)),
        ],
        CHANGE_SCHEMA,
    )
    out = merge_changes_into_state(
        state,
        latest_change_per_key(changes),
        value_cols=["text", "tags", "ts"],
        policies={"text": "fill_empty", "tags": "union", "ts": "greatest"},
    ).orderBy("turn_idx")
    rows = out.collect()
    assert rows[0].text == "have"  # fill_empty keeps non-null target
    assert rows[1].text == "fills-null"  # fill_empty fills NULL
    assert rows[0].tags == ["a", "b"]  # union, sorted/dedup'd
    assert rows[1].tags == ["x", "y"]
    assert rows[0].ts == ts(50)  # greatest keeps newer


def test_union_policy_commutative(spark):
    """Applying two change batches in either order yields the same
    final state for commutative policies (SURVEY.md §5.7)."""
    state = spark.createDataFrame([("c1", 0, None, ["s"], ts(0), 0, False)], STATE_SCHEMA)
    b1 = spark.createDataFrame([(1, "update", "c1", 0, "t1", ["p"], ts(10))], CHANGE_SCHEMA)
    b2 = spark.createDataFrame([(2, "update", "c1", 0, "t2", ["q"], ts(20))], CHANGE_SCHEMA)
    pol = {"tags": "union", "ts": "greatest", "text": "fill_empty"}

    def apply(s, batches):
        for b in batches:
            s = merge_changes_into_state(
                s, latest_change_per_key(b), value_cols=["text", "tags", "ts"], policies=pol
            )
        return s

    r12 = apply(state, [b1, b2]).collect()[0]
    r21 = apply(state, [b2, b1]).collect()[0]
    assert r12.tags == r21.tags == ["p", "q", "s"]
    assert r12.ts == r21.ts == ts(20)
    # fill_empty is idempotent but order-dependent when two batches
    # race to fill the same NULL (first writer sticks) — exactly the
    # reference's behavior (fill-if-empty against current state)
    assert (r12.text, r21.text) == ("t1", "t2")


# --- property-based: policy algebra under epoch reordering -----------------


def _apply_epochs(spark, order, batches, policies):
    """Fold batches into state via merge_changes_into_state in the
    given epoch order."""
    from kahi_spark.operators.merge import (
        latest_change_per_key,
        merge_changes_into_state,
        state_from_reduced,
    )

    state = None
    for i in order:
        ch = latest_change_per_key(spark.createDataFrame(batches[i], _EV_SCHEMA))
        if state is None:
            state = state_from_reduced(ch)
        else:
            state = merge_changes_into_state(state, ch, policies=policies)
    return state


_EV_SCHEMA = (
    "seq long, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp, tags array<string>"
)


def test_union_and_greatest_policies_commute_across_epochs(spark):
    """union/greatest are COMMUTATIVE (merge.py docstring): epoch
    arrival order cannot change those columns. lww columns converge
    too because ordering is by (ts, seq), not arrival. fill_empty is
    deliberately NOT asserted order-independent (it is only
    idempotent)."""
    import datetime as dt
    import itertools

    def t(i):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)

    batches = [
        [(1, "insert", "c1", 0, "user", "a1", None, t(10), ["x"])],
        [(2, "update", "c1", 0, "user", "b2", "sql", t(5), ["y"])],
        [(3, "update", "c1", 0, "user", "c3", None, t(10), ["x", "z"])],
    ]
    policies = {"text": "lww", "tags": "union", "ts": "greatest"}
    outs = []
    for order in itertools.permutations(range(3)):
        st_df = _apply_epochs(spark, order, batches, policies)
        row = st_df.collect()[0]
        outs.append(
            (row.conv_id, row.turn_idx, row.text, tuple(sorted(row.tags)), str(row.ts))
        )
    assert len(set(outs)) == 1, outs
    # and the winners are the (ts, seq)-max text, union of all tags, max ts
    assert outs[0][2] == "c3" and outs[0][3] == ("x", "y", "z")


def test_fill_empty_is_idempotent_same_epoch(spark):
    """Replaying the SAME batch leaves fill_empty columns unchanged
    (the exactly-once story for non-LWW columns: ledger dedups whole
    epochs; within one epoch fill_empty is a fixed point)."""
    import datetime as dt

    def t(i):
        return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)

    from kahi_spark.operators.merge import (
        latest_change_per_key,
        merge_changes_into_state,
        state_from_reduced,
    )

    base = [(1, "insert", "c1", 0, "user", "a", None, t(1), ["x"])]
    patch = [(2, "update", "c1", 0, "user", "a", "sql", t(2), ["x"])]
    policies = {"tool": "fill_empty"}
    state = state_from_reduced(
        latest_change_per_key(spark.createDataFrame(base, _EV_SCHEMA))
    )
    ch = latest_change_per_key(spark.createDataFrame(patch, _EV_SCHEMA))
    once = merge_changes_into_state(state, ch, policies=policies)
    twice = merge_changes_into_state(once, ch, policies=policies)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    assert once.collect()[0].tool == "sql"
