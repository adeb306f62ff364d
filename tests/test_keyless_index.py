"""Persistent keyless feature index: feature parity with direct
state featurization, incremental update/delete/replay semantics, and
pipeline end-to-end equivalence with the recompute-per-batch path."""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
from pyspark.sql import functions as F

from kahi_spark.operators.keyless import N_SLOTS, _with_features, resolve_keyless_events
from kahi_spark.sinks.keyless_index import KeylessFeatureIndex

from tests.test_keyless import NULLABLE_EVENTS


def ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)


def _events(spark, rows):
    return spark.createDataFrame(rows, NULLABLE_EVENTS)


def _batches(spark):
    b0 = _events(spark, [
        (0, "insert", "c1", 0, "user", "alpha beta gamma delta epsilon zeta", None, ts(0), "lens"),
        (1, "insert", "c2", 0, "user", "completely different words entirely here now", None, ts(1), "lens"),
        (2, "insert", "c1", 1, "assistant", "spark merges streams of change events", None, ts(2), "lens"),
    ])
    b1 = _events(spark, [
        # update rewrites c1/0's text (the index must serve the NEW text)
        (3, "update", "c1", 0, "user", "rewritten opening line with fresh words", None, ts(10), "wos"),
        # delete tombstones c2/0 (the index must stop offering it)
        (4, "delete", "c2", 0, "user", "", None, ts(11), "wos"),
    ])
    return b0, b1


def test_index_features_match_direct_featurization(spark, tmp_path):
    idx = KeylessFeatureIndex(spark, str(tmp_path / "kidx"))
    b0, b1 = _batches(spark)
    idx.update(b0, epoch_id=0)
    idx.update(b1, epoch_id=1)

    # live state after both batches (LWW): c1/0 rewritten, c2/0 gone
    live = _events(spark, [
        (3, "update", "c1", 0, "user", "rewritten opening line with fresh words", None, ts(10), "wos"),
        (2, "insert", "c1", 1, "assistant", "spark merges streams of change events", None, ts(2), "lens"),
    ]).select("conv_id", "turn_idx", "role", "text")
    direct = _with_features(live).select(
        "conv_id", "turn_idx", "role", "_lb", *[f"_m{i}" for i in range(N_SLOTS)]
    )
    got = idx.features().select(
        "conv_id", "turn_idx", "role", "_lb", *[f"_m{i}" for i in range(N_SLOTS)]
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, direct.collect()))

    # idempotent replay: re-delivering epoch 1 changes nothing
    # (fresh features() frame — the swap invalidates older lazy plans,
    # which is exactly why the pipeline checkpoints before updating)
    idx.update(b1, epoch_id=1)
    assert idx.features().count() == 2

    # compaction folds the deltas without changing the resolved view
    before = sorted(map(tuple, idx.features().collect()))
    idx.compact()
    assert idx.table._read_manifest()["deltas"] == []
    assert sorted(map(tuple, idx.features().collect())) == before


def test_resolver_with_index_equals_recompute(spark, tmp_path):
    idx = KeylessFeatureIndex(spark, str(tmp_path / "kidx2"))
    b0, b1 = _batches(spark)
    idx.update(b0, epoch_id=0)
    idx.update(b1, epoch_id=1)
    state = _events(spark, [
        (3, "update", "c1", 0, "user", "rewritten opening line with fresh words", None, ts(10), "wos"),
        (2, "insert", "c1", 1, "assistant", "spark merges streams of change events", None, ts(2), "lens"),
    ]).select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    probes = _events(spark, [
        # near-dup of the REWRITTEN c1/0 → c1 via the index's updated row
        (10, "update", None, 0, "user", "rewritten opening line with fresh word", None, ts(20), "wos"),
        # near-dup of the DELETED c2/0 original → must mint (tombstoned)
        (11, "insert", None, 0, "user", "completely different words entirely here now", None, ts(21), "wos"),
    ])
    via_index = {
        r.seq: r.conv_id
        for r in resolve_keyless_events(probes, state, state_features=idx.features()).collect()
    }
    recompute = {
        r.seq: r.conv_id for r in resolve_keyless_events(probes, state).collect()
    }
    assert via_index == recompute == {10: "c1", 11: "u11"}


def test_pipeline_with_keyless_index_end_to_end(spark, tmp_path):
    """Same final table as the recompute-per-batch resolver, with the
    index maintained incrementally across micro-batches."""
    from kahi_spark.sinks.snapshot import SnapshotTable
    from kahi_spark.streaming.pipeline import CdcPipeline

    def write_batch(d, name, rows):
        df = pd.DataFrame(
            rows,
            columns=["seq", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts", "source"],
        )
        df["conv_id"] = pd.array(df["conv_id"], dtype="string")
        df["turn_idx"] = df["turn_idx"].astype("int32")
        df["tool"] = pd.array(df["tool"], dtype="string")
        df["ts"] = pd.to_datetime(df["ts"], unit="s").astype("datetime64[us]")
        df.to_parquet(os.path.join(d, name), index=False)

    t0 = 1_704_067_200
    batch0 = [
        (0, "insert", "c1", 0, "USER", "alpha beta gamma delta epsilon zeta", None, t0, "lens"),
        (1, "insert", "c1", 1, "ai", "eta theta iota kappa lambda mu", None, t0 + 10, "lens"),
    ]
    batch1 = [
        # keyless near-dup of c1/0 → adopts c1 via the index
        (2, "update", None, 0, "human", "alpha beta gamma delta epsilon zetas", None, t0 + 100, "wos"),
        # keyless brand-new turn → mints u3
        (3, "insert", None, 7, "USER", "totally new content words", None, t0 + 110, "wos"),
    ]

    results = {}
    for variant in ("recompute", "indexed"):
        d = str(tmp_path / f"ev-{variant}")
        os.makedirs(d)
        table = SnapshotTable(spark, str(tmp_path / f"t-{variant}"), n_buckets=2)
        kidx = (
            KeylessFeatureIndex(spark, str(tmp_path / f"kidx-{variant}"))
            if variant == "indexed"
            else None
        )
        write_batch(d, "b0.parquet", batch0)
        CdcPipeline(
            spark, d, table, str(tmp_path / f"ck-{variant}"),
            schema=NULLABLE_EVENTS, resolve_keyless=True, keyless_index=kidx,
        ).run_until_idle()
        write_batch(d, "b1.parquet", batch1)
        CdcPipeline(
            spark, d, table, str(tmp_path / f"ck-{variant}"),
            schema=NULLABLE_EVENTS, resolve_keyless=True, keyless_index=kidx,
        ).run_until_idle()
        results[variant] = {
            (r.conv_id, r.turn_idx): r.text for r in table.read().collect()
        }
        if kidx is not None:
            # the index tracked both epochs incrementally
            assert kidx.features().count() == 3  # c1/0, c1/1, u3/7

    assert results["indexed"] == results["recompute"]
    assert results["indexed"][("c1", 0)] == "alpha beta gamma delta epsilon zetas"
    assert results["indexed"][("u3", 7)] == "totally new content words"


def test_pipeline_keyless_index_with_policies_rebuilds_features(spark, tmp_path):
    """VERDICT r4 #6: keyless_index + per-column policies no longer
    rejected. A fill_empty(text) policy keeps OLD state text over a
    NULL update — the index must track the post-merge state (rebuilt
    per epoch for affected keys), so a later keyless probe matching
    the KEPT text still resolves to the right conversation; and the
    index features must equal re-featurizing the live table."""
    from kahi_spark.sinks.snapshot import SnapshotTable
    from kahi_spark.streaming.pipeline import CdcPipeline

    def write_batch(d, name, rows):
        df = pd.DataFrame(
            rows,
            columns=["seq", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts", "source"],
        )
        df["conv_id"] = pd.array(df["conv_id"], dtype="string")
        df["text"] = pd.array(df["text"], dtype="string")
        df["turn_idx"] = df["turn_idx"].astype("int32")
        df["tool"] = pd.array(df["tool"], dtype="string")
        df["ts"] = pd.to_datetime(df["ts"], unit="s").astype("datetime64[us]")
        df.to_parquet(os.path.join(d, name), index=False)

    t0 = 1_704_067_200
    d = str(tmp_path / "ev")
    os.makedirs(d)
    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=2)
    kidx = KeylessFeatureIndex(spark, str(tmp_path / "kidx"))
    write_batch(d, "b0.parquet", [
        (0, "insert", "c1", 0, "USER", "alpha beta gamma delta epsilon zeta", None, t0, "lens"),
        (1, "insert", "c2", 0, "ai", "eta theta iota kappa lambda mu", None, t0 + 10, "lens"),
    ])
    pipe = CdcPipeline(
        spark, d, table, str(tmp_path / "ck"),
        resolve_keyless=True, keyless_index=kidx,
        policies={"text": "fill_empty"},
    )
    pipe.run_until_idle(timeout_s=120)
    # NULL-text update: fill_empty keeps the old text in STATE
    write_batch(d, "b1.parquet", [
        (2, "update", "c1", 0, "USER", None, None, t0 + 100, "wos"),
    ])
    pipe.run_until_idle(timeout_s=120)
    assert table.read().filter(
        (F.col("conv_id") == "c1") & (F.col("turn_idx") == 0)
    ).collect()[0].text.startswith("alpha beta")
    # keyless near-dup of the KEPT text must adopt c1 (an LWW-naive
    # index would have indexed the NULL text and minted a surrogate)
    write_batch(d, "b2.parquet", [
        (3, "update", None, 0, "human", "alpha beta gamma delta epsilon zetas", None, t0 + 200, "wos"),
    ])
    pipe.run_until_idle(timeout_s=120)
    # adoption is visible structurally: the probe UPDATEs (c1, 0) —
    # whose text fill_empty keeps — so NO new surrogate row may
    # appear. (An LWW-naive index would have featurized the NULL
    # text, failed the match, and minted a u* key whose inserted row
    # WOULD carry the zetas text.)
    rows0 = table.read().filter(F.col("turn_idx") == 0).collect()
    assert sorted(r.conv_id for r in rows0) == ["c1", "c2"], rows0
    assert not any("zetas" in (r.text or "") for r in rows0), rows0
    # index features == re-featurized live state, bit for bit
    state = table.read().select("conv_id", "turn_idx", "role", "text", "ts")
    src = state.withColumn("op", F.lit("insert")).withColumn(
        "seq", F.lit(0).cast("long")
    )
    cols = ["conv_id", "turn_idx", "role", "_ft", *[f"_m{i}" for i in range(N_SLOTS)], "_lb"]
    want = sorted(
        tuple(r) for r in _with_features(
            src.select("conv_id", "turn_idx", "op", "seq", "role", "text", "ts")
        ).select(*cols).collect()
    )
    have = sorted(tuple(r) for r in kidx.features().select(*cols).collect())
    assert have == want


def test_pipeline_keyless_index_with_nonfeature_policy_is_free(spark, tmp_path):
    """A policy on a NON-feature column (tool) takes the zero-cost
    path: no rebuild, features still exact."""
    from kahi_spark.streaming.pipeline import CdcPipeline

    pipe = CdcPipeline.__new__(CdcPipeline)  # only checking the flag logic
    CdcPipeline.__init__(
        pipe, spark, "/tmp/none", None, "/tmp/none-ck",
        resolve_keyless=True,
        keyless_index=KeylessFeatureIndex(spark, str(tmp_path / "k")),
        policies={"tool": "fill_empty"},
    )
    assert pipe._keyless_rebuild is False
    pipe2 = CdcPipeline.__new__(CdcPipeline)
    CdcPipeline.__init__(
        pipe2, spark, "/tmp/none", None, "/tmp/none-ck",
        resolve_keyless=True,
        keyless_index=KeylessFeatureIndex(spark, str(tmp_path / "k2")),
        policies={"text": "fill_empty"},
    )
    assert pipe2._keyless_rebuild is True


def test_rebuild_source_keeps_live_null_feature_rows(spark, tmp_path):
    """Code-review r5: a LIVE state row whose text AND role are both
    NULL must not be classified as a tombstone by the post-merge
    feature rebuild — only keys ABSENT from state become deletes."""
    import datetime as _dt

    from kahi_spark.sinks.snapshot import SnapshotTable
    from kahi_spark.streaming.pipeline import CdcPipeline

    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=2)
    base = spark.createDataFrame(
        [
            (0, "insert", "cA", 0, None, None, None, _dt.datetime(2024, 1, 1), "lens"),
            (1, "insert", "cB", 0, "user", "hello world", None, _dt.datetime(2024, 1, 1, 0, 1), "lens"),
        ],
        "seq long, op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp, source string",
    )
    table.merge(base, epoch_id=0)
    # a tombstone for cB so the rebuild sees one genuinely absent key
    table.merge(
        spark.createDataFrame(
            [(2, "delete", "cB", 0, "user", None, None, _dt.datetime(2024, 1, 2), "lens")],
            base.schema,
        ),
        epoch_id=1,
    )
    pipe = CdcPipeline.__new__(CdcPipeline)
    pipe.table = table
    batch = spark.createDataFrame(
        [
            (3, "update", "cA", 0, None, None, None, _dt.datetime(2024, 1, 3), "wos"),
            (4, "update", "cB", 0, "user", "zzz", None, _dt.datetime(2024, 1, 3, 0, 1), "wos"),
        ],
        base.schema,
    )
    src = {r.conv_id: r.op for r in pipe._post_merge_feature_source(batch).collect()}
    # cA is LIVE with NULL text+role -> must keep its op; cB was
    # tombstoned before this batch's (older-merge-order) update ->
    # absent from state -> delete
    assert src["cA"] == "update"
    assert src["cB"] == "delete"
