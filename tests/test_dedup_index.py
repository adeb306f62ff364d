"""Incremental MinHash-LSH dedup index: cross-epoch near-dup drops,
in-batch lowest-key-survives, resurrect prevention via the dropped
ledger, idempotent epoch re-delivery, and pipeline integration."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kahi_spark.sinks.dedup_index import LshDedupIndex

_EV = (
    "seq long, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp, source string"
)


def _t(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)


def _ev(seq, op, conv, turn, text):
    return (seq, op, conv, turn, "user", text, None, _t(seq), "src0")


_BASE = (
    "the quick brown fox jumps over the lazy dog while the spark engine "
    "reduces the change log into one canonical snapshot per key every epoch "
    "and the compaction job folds delta files back into bucketed base files "
    "so that readers always observe a consistent table state"
)
# one-word edit in a ~45-word doc → shingle jaccard ≈ (43-3)/(43+3) ≈ 0.87
_NEARDUP = _BASE.replace("lazy dog", "lazy cat")
_OTHER = (
    "completely different content about vector indexes bucket joins and "
    "minhash signatures growing incrementally as batches of documents arrive"
)


def test_cross_epoch_and_in_batch_dedup(spark, tmp_path):
    idx = LshDedupIndex(spark, str(tmp_path / "idx"), threshold=0.8)

    # epoch 0: two distinct docs; c2 is an in-batch near-dup of c1
    b0 = spark.createDataFrame(
        [
            _ev(0, "insert", "c1", 0, _BASE),
            _ev(1, "insert", "c2", 0, _NEARDUP),  # higher key → dropped
            _ev(2, "insert", "c3", 0, _OTHER),
        ],
        _EV,
    )
    kept0, n0 = idx.dedup_batch(b0, epoch_id=0)
    keys0 = sorted(r.conv_id for r in kept0.collect())
    assert keys0 == ["c1", "c3"] and n0 == 1

    # epoch 1: a near-dup of an epoch-0 doc arrives under a new key →
    # dropped against the INDEX (no re-shingling of epoch 0); a later
    # update to the previously dropped c2 is silenced by the ledger
    b1 = spark.createDataFrame(
        [
            _ev(10, "insert", "c9", 0, _BASE),
            _ev(11, "update", "c2", 0, "resurrection attempt"),
            _ev(12, "insert", "c4", 1, "fresh unique text with its own words entirely"),
        ],
        _EV,
    )
    kept1, n1 = idx.dedup_batch(b1, epoch_id=1)
    keys1 = sorted(r.conv_id for r in kept1.collect())
    assert keys1 == ["c4"] and n1 == 2

    # re-delivered epoch 1 (crash retry): identical outcome, index
    # content unchanged (epoch subdir overwritten deterministically)
    kept1b, n1b = idx.dedup_batch(b1, epoch_id=1)
    assert sorted(r.conv_id for r in kept1b.collect()) == keys1 and n1b == n1
    sigs = idx.existing_sigs().collect()
    assert sorted(r.key for r in sigs) == ["c1:0", "c3:0", "c4:1"]


def test_pipeline_with_dedup_index(spark, tmp_path):
    import os

    from kahi_spark.sinks.snapshot import SnapshotTable
    from kahi_spark.streaming.pipeline import CdcPipeline

    event_dir = str(tmp_path / "binlog")
    os.makedirs(event_dir)
    import pandas as pd

    def pdf(rows):
        df = pd.DataFrame(
            rows,
            columns=["seq", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts", "source"],
        )
        df["turn_idx"] = df["turn_idx"].astype("int32")
        df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
        df["tool"] = pd.array(df["tool"], dtype="string")
        return df

    pdf([_ev(0, "insert", "c1", 0, _BASE), _ev(1, "insert", "c3", 0, _OTHER)]).to_parquet(
        f"{event_dir}/b0.parquet", index=False
    )
    pdf([_ev(10, "insert", "c9", 0, _NEARDUP)]).to_parquet(
        f"{event_dir}/b1.parquet", index=False
    )

    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=2)
    idx = LshDedupIndex(spark, str(tmp_path / "idx"), threshold=0.8)
    pipe = CdcPipeline(
        spark, event_dir, table, str(tmp_path / "ck"), dedup_index=idx
    )
    metrics = pipe.run_until_idle()
    out = sorted(r.conv_id for r in table.read().collect())
    # c9's text near-dups c1's (ingested one epoch earlier) → dropped
    assert out == ["c1", "c3"]
    assert sum(m["n_deduped"] for m in metrics) == 1


def test_pipeline_all_hooks_together(spark, tmp_path):
    """keyless resolve → incremental dedup → multi-source convergence
    in ONE pipeline run: the hooks compose in that order without
    interfering (resolution keys events so dedup sees real keys;
    dedup drops before convergence so duplicates can't contribute
    fields)."""
    import os

    import pandas as pd

    from kahi_spark.sinks.snapshot import SnapshotTable
    from kahi_spark.streaming.pipeline import CdcPipeline

    event_dir = str(tmp_path / "binlog")
    os.makedirs(event_dir)

    def pdf(rows):
        df = pd.DataFrame(
            rows,
            columns=["seq", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts", "source"],
        )
        df["turn_idx"] = df["turn_idx"].astype("int32")
        df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
        for c in ("conv_id", "tool"):
            df[c] = pd.array(df[c], dtype="string")
        return df

    # epoch 0: two sources describe (a1, 0) — lens has text, wos has
    # the tool; plus an unrelated doc
    pdf([
        (0, "insert", "a1", 0, "USER", _BASE, None, _t(0), "lens"),
        (1, "insert", "a1", 0, "human", _BASE, "search", _t(1), "wos"),
        (2, "insert", "a2", 5, "ai", _OTHER, None, _t(2), "lens"),
    ]).to_parquet(f"{event_dir}/b0.parquet", index=False)
    # epoch 1: a KEYLESS update whose text matches (a2, 5)'s — must
    # adopt a2; and a near-dup insert under a new key — must be dropped
    pdf([
        (10, "update", None, 5, "ai", _OTHER, "sql", _t(10), "lens"),
        (11, "insert", "zz", 3, "ai", _NEARDUP, None, _t(11), "lens"),
    ]).to_parquet(f"{event_dir}/b1.parquet", index=False)

    from kahi_spark.sinks.dedup_index import LshDedupIndex

    table = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=2)
    idx = LshDedupIndex(spark, str(tmp_path / "idx"), threshold=0.8)
    pipe = CdcPipeline(
        spark,
        event_dir,
        table,
        str(tmp_path / "ck"),
        resolve_keyless=True,
        dedup_index=idx,
        converge_sources=("lens", "wos"),
        policies={"tool": "fill_empty"},
    )
    metrics = pipe.run_until_idle()
    rows = {(r.conv_id, r.turn_idx): r for r in table.read().collect()}

    # convergence: one canonical (a1, 0) with lens text AND wos tool
    assert set(rows) == {("a1", 0), ("a2", 5)}
    assert rows[("a1", 0)].tool == "search"
    assert rows[("a1", 0)].role == "user"  # canonicalized from USER/human
    # keyless event adopted a2 and its update landed (tool filled)
    assert rows[("a2", 5)].tool == "sql"
    # near-dup 'zz' was dropped by the index
    assert sum(m["n_deduped"] for m in metrics) >= 1


def test_short_text_does_not_crash_ingest(spark, tmp_path):
    """Round-5 review: a sub-3-word text made sequence() descend and
    element_at throw under ANSI, killing the whole epoch. Short texts
    now produce no shingles (can't near-dup via 3-grams) and pass
    through unharmed."""
    idx = LshDedupIndex(spark, str(tmp_path / "ix"))
    batch = spark.createDataFrame(
        [_ev(0, "insert", "c1", 0, "ok"), _ev(1, "insert", "c2", 0, _BASE)], _EV
    )
    kept, n_deduped = idx.dedup_batch(batch, 0, n_events=2)
    assert kept.count() == 2 and n_deduped == 0


def test_no_ghost_signature_for_previously_dropped_key(spark, tmp_path):
    """Round-5 review: a key dropped in an earlier epoch, re-inserted
    later with NOVEL text, has all its events suppressed — its new
    signature must NOT be indexed (it would advertise text that never
    entered the corpus and silently swallow future near-dups)."""
    idx = LshDedupIndex(spark, str(tmp_path / "ix"))
    b0 = spark.createDataFrame(
        [_ev(0, "insert", "c1", 0, _BASE), _ev(1, "insert", "c2", 0, _NEARDUP)], _EV
    )
    kept0, nd0 = idx.dedup_batch(b0, 0, n_events=2)
    assert nd0 == 1  # c2 dropped as near-dup of c1
    # epoch 1: dropped key c2 re-inserts with completely new text
    b1 = spark.createDataFrame([_ev(2, "insert", "c2", 0, _OTHER)], _EV)
    kept1, nd1 = idx.dedup_batch(b1, 1, n_events=1)
    assert nd1 == 1  # still suppressed by the dropped ledger
    assert "c2:0" not in {r.key for r in idx.existing_sigs().collect()}
    # epoch 2: a FRESH key with text near-dupping the ghost must be
    # KEPT (nothing real to dedup against)
    b2 = spark.createDataFrame([_ev(3, "insert", "c9", 0, _OTHER + " now")], _EV)
    kept2, nd2 = idx.dedup_batch(b2, 2, n_events=1)
    assert nd2 == 0 and kept2.count() == 1


def test_index_signs_the_lww_text_per_key(spark, tmp_path):
    """Round-5 review: two same-key inserts in one batch — the index
    must sign the (ts, seq)-LATEST text (what the merge keeps), not
    an arbitrary partition-order row."""
    idx = LshDedupIndex(spark, str(tmp_path / "ix"))
    b0 = spark.createDataFrame(
        [_ev(0, "insert", "c1", 0, _OTHER), _ev(1, "insert", "c1", 0, _BASE)], _EV
    )
    idx.dedup_batch(b0, 0, n_events=2)
    # near-dup of the LWW text (_BASE) → deduped
    b1 = spark.createDataFrame([_ev(2, "insert", "c3", 0, _NEARDUP)], _EV)
    _, nd1 = idx.dedup_batch(b1, 1, n_events=1)
    assert nd1 == 1
    # near-dup of the LOSING text → kept (it is not in the corpus)
    b2 = spark.createDataFrame([_ev(3, "insert", "c4", 0, _OTHER + " today")], _EV)
    _, nd2 = idx.dedup_batch(b2, 2, n_events=1)
    assert nd2 == 0


def test_crashed_add_tmp_dirs_invisible_to_reads(spark, tmp_path):
    """An add() that crashed between write and swap leaves
    ``epoch_N.tmp-<uuid>`` dirs; the next dedup_batch probes the
    index BEFORE add()'s sweep runs, so reads must serve only
    committed ``epoch_*`` dirs (round-5 review)."""
    import os
    import shutil

    idx = LshDedupIndex(spark, str(tmp_path / "idx"), threshold=0.8)
    b0 = spark.createDataFrame(
        [_ev(0, "insert", "c1", 0, _BASE), _ev(1, "insert", "c3", 0, _OTHER)], _EV
    )
    idx.dedup_batch(b0, epoch_id=0)
    committed = sorted(r.key for r in idx.existing_sigs().collect())

    # simulate the crash: copy epoch_0 as an uncommitted tmp dir in
    # each subindex (same shape a mid-swap kill leaves behind)
    for sub in ("sigs", "bands", "dropped"):
        src = os.path.join(str(tmp_path / "idx"), sub, "epoch_0")
        if os.path.isdir(src):
            shutil.copytree(src, src + ".tmp-deadbeef")

    # reads see only the committed rows — no doubled signatures
    assert sorted(r.key for r in idx.existing_sigs().collect()) == committed
    bands = idx.existing_bands().groupBy("key", "band_idx").count().collect()
    assert all(r["count"] == 1 for r in bands)

    # the next batch still dedups correctly against the clean view,
    # and its add() sweeps the leftovers
    b1 = spark.createDataFrame([_ev(10, "insert", "c9", 0, _BASE)], _EV)
    kept1, n1 = idx.dedup_batch(b1, epoch_id=1)
    assert kept1.count() == 0 and n1 == 1
    leftovers = [
        e.name
        for sub in ("sigs", "bands", "dropped")
        if os.path.isdir(os.path.join(str(tmp_path / "idx"), sub))
        for e in os.scandir(os.path.join(str(tmp_path / "idx"), sub))
        if ".tmp-" in e.name
    ]
    assert leftovers == []


def test_bucketed_bands_partition_pruning(spark, tmp_path):
    """VERDICT r5 #2: the bands table is directory-bucketed on
    pmod(band_sig, n_buckets) and the candidate join's index-side
    scan carries a bucket PartitionFilter — the index is pruned
    before any file opens, and only the (broadcast) batch side ever
    moves. Also pins the layout: one bucket=k/ dir per epoch, one
    file per bucket."""
    import os
    import re

    idx = LshDedupIndex(spark, str(tmp_path / "idx"), threshold=0.8, n_buckets=8)
    b0 = spark.createDataFrame(
        [_ev(0, "insert", "c1", 0, _BASE), _ev(1, "insert", "c3", 0, _OTHER)], _EV
    )
    idx.dedup_batch(b0, epoch_id=0)

    # on-disk layout: epoch dir contains only bucket=k subdirs, each
    # holding exactly one parquet part file
    epoch_dir = os.path.join(str(tmp_path / "idx"), "bands", "epoch_0")
    buckets = [e for e in os.scandir(epoch_dir) if e.is_dir()]
    assert buckets and all(re.fullmatch(r"bucket=\d+", e.name) for e in buckets)
    for e in buckets:
        parts = [f for f in os.listdir(e.path) if f.endswith(".parquet")]
        assert len(parts) == 1, parts

    # the candidate join plan: index-side scan is partition-pruned to
    # the batch's bucket set and there is NO exchange on the index side
    probe = idx._signatures(
        spark.createDataFrame([("p1", _BASE)], "k string, text string"), "k", "text"
    )
    dups = idx.find_neardups(probe)
    plan = dups._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[bucket#\d+ IN? ?\(", plan)
    assert m, plan[:4000]
    # correctness through the pruned path: the probe near-dups c1
    got = {(r.key, r.match_key) for r in dups.collect()}
    assert ("p1", "c1:0") in got


def test_reopen_with_different_n_buckets_keeps_candidates(spark, tmp_path):
    """Round-7 ADVICE fix (modulus drift): bucket=k/ partition values
    written under one ``n_buckets`` must not be trusted by a handle
    opened with another — each bands epoch carries a ``_modulus-<n>``
    marker, and mismatched epochs read through the derived-bucket
    DataFilter path. Pins: (a) every band row stays visible with the
    bucket recomputed under the READER's modulus (the old code served
    stored mod-8 values to a mod-4 handle, silently pruning true
    matches), (b) a cross-epoch near-dup still drops after reopen."""
    idx8 = LshDedupIndex(spark, str(tmp_path / "idx"), threshold=0.8, n_buckets=8)
    b0 = spark.createDataFrame(
        [_ev(0, "insert", "c1", 0, _BASE), _ev(1, "insert", "c3", 0, _OTHER)], _EV
    )
    idx8.dedup_batch(b0, epoch_id=0)

    idx4 = LshDedupIndex(spark, str(tmp_path / "idx"), threshold=0.8, n_buckets=4)
    rows = idx4.existing_bands().collect()
    assert len(rows) == 2 * 16  # both docs' bands fully visible
    assert all(r.bucket == r.band_sig % 4 for r in rows)

    b1 = spark.createDataFrame([_ev(10, "insert", "c9", 0, _NEARDUP)], _EV)
    kept, n = idx4.dedup_batch(b1, epoch_id=1)
    assert n == 1 and kept.count() == 0

    # the matched-modulus handle still statically prunes (partition
    # values trusted when the marker agrees)
    rows8 = LshDedupIndex(
        spark, str(tmp_path / "idx"), threshold=0.8, n_buckets=8
    ).existing_bands().collect()
    assert all(r.bucket == r.band_sig % 8 for r in rows8 if r.band_sig is not None)
