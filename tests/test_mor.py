"""Merge-on-read mode: parity with copy-on-write, compaction,
exactly-once, out-of-order safety (SURVEY.md §4.2 scale features)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kahi_spark.gen import make_events
from kahi_spark.schema import EVENT_SCHEMA
from kahi_spark.sinks.snapshot import SnapshotTable


def ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)


def ev(seq, op, conv, turn, text, t):
    return (seq, op, conv, turn, "user", text, None, ts(t), "lens")


def sorted_state(t):
    return [
        (r.conv_id, r.turn_idx, r.text)
        for r in t.read().orderBy("conv_id", "turn_idx").collect()
    ]


def test_mor_matches_cow_over_many_epochs(spark, tmp_path):
    pdf = make_events(3000, n_convs=20, seed=21)
    df = spark.createDataFrame(pdf)
    cow = SnapshotTable(spark, str(tmp_path / "cow"), n_buckets=4, mode="cow")
    mor = SnapshotTable(spark, str(tmp_path / "mor"), n_buckets=4, mode="mor", compact_every=3)
    per = 500
    for e in range(6):
        batch = df.filter((F.col("seq") >= e * per) & (F.col("seq") < (e + 1) * per))
        cow.merge(batch, epoch_id=e)
        mor.merge(batch, epoch_id=e)
    assert sorted_state(cow) == sorted_state(mor)
    # compaction actually happened (6 epochs / compact_every=3 → ≥2 compacts)
    ops = [c["op"] for c in mor.history()]
    assert ops.count("compact") >= 2


def test_mor_exactly_once_and_out_of_order(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=2, mode="mor", compact_every=100)
    b1 = spark.createDataFrame([ev(0, "insert", "c1", 0, "new", 100)], EVENT_SCHEMA)
    assert t.merge(b1, epoch_id=0) is True
    assert t.merge(b1, epoch_id=0) is False  # ledger no-op
    # later epoch, OLDER event: must lose against delta from epoch 0
    b2 = spark.createDataFrame([ev(1, "update", "c1", 0, "stale", 5)], EVENT_SCHEMA)
    t.merge(b2, epoch_id=1)
    assert sorted_state(t) == [("c1", 0, "new")]
    # delete tombstone wins over older zombie insert delivered later
    b3 = spark.createDataFrame([ev(2, "delete", "c1", 0, None, 200)], EVENT_SCHEMA)
    t.merge(b3, epoch_id=2)
    b4 = spark.createDataFrame([ev(3, "insert", "c1", 0, "zombie", 150)], EVENT_SCHEMA)
    t.merge(b4, epoch_id=3)
    assert sorted_state(t) == []
    # compaction preserves the tombstone semantics
    t.compact()
    assert sorted_state(t) == []


def test_mor_schema_evolution_via_union(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t2"), n_buckets=2, mode="mor", compact_every=100)
    t.merge(spark.createDataFrame([ev(0, "insert", "c1", 0, "a", 1)], EVENT_SCHEMA), epoch_id=0)
    evolved = spark.createDataFrame([ev(1, "insert", "c2", 0, "b", 2)], EVENT_SCHEMA).withColumn(
        "meta", F.lit("m")
    )
    t.merge(evolved, epoch_id=1)
    out = t.read()
    assert "meta" in out.columns
    got = {r.conv_id: r.meta for r in out.collect()}
    assert got == {"c1": None, "c2": "m"}
    t.compact()
    got2 = {r.conv_id: r.meta for r in t.read().collect()}
    assert got2 == got


def test_bucketed_compaction_parity_with_global(spark, tmp_path):
    """The incremental (bucket-zipped, Arrow) fold must produce the
    same table as the global window fold — same live rows, same
    tombstone handling, same evolved columns — and must never
    reshuffle the base (asserted indirectly: part-file count stays
    n_buckets-bounded and a second incremental fold on top of the
    first base still agrees)."""
    pdf = make_events(4000, n_convs=30, seed=33)
    df = spark.createDataFrame(pdf)
    a = SnapshotTable(spark, str(tmp_path / "ga"), n_buckets=4, mode="mor", compact_every=100)
    b = SnapshotTable(spark, str(tmp_path / "gb"), n_buckets=4, mode="mor", compact_every=100)
    per = 1000
    for e in range(4):
        batch = df.filter((F.col("seq") >= e * per) & (F.col("seq") < (e + 1) * per))
        if e == 3:  # evolution inside the folded deltas
            batch = batch.withColumn("meta", F.lit(f"m{e}"))
        a.merge(batch, epoch_id=e)
        b.merge(batch, epoch_id=e)
        if e == 1:  # two-stage fold: second compact folds ONTO a base
            a.compact(strategy="global")
            b.compact(strategy="bucketed")
    a.compact(strategy="global")
    b.compact(strategy="bucketed")
    rows_a = [
        tuple(r) for r in a.read().orderBy("conv_id", "turn_idx").collect()
    ]
    rows_b = [
        tuple(r) for r in b.read().orderBy("conv_id", "turn_idx").collect()
    ]
    assert sorted(a.read().columns) == sorted(b.read().columns)
    assert rows_a == rows_b
    strategies = [c.get("strategy") for c in b.history() if c["op"] == "compact"]
    assert strategies == ["bucketed", "bucketed"]


def test_bucketed_compaction_tombstones_and_replay(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tb"), n_buckets=2, mode="mor", compact_every=100)
    t.merge(spark.createDataFrame([ev(0, "insert", "c1", 0, "x", 10)], EVENT_SCHEMA), epoch_id=0)
    t.merge(spark.createDataFrame([ev(1, "delete", "c1", 0, None, 20)], EVENT_SCHEMA), epoch_id=1)
    t.merge(spark.createDataFrame([ev(2, "insert", "c2", 0, "y", 30)], EVENT_SCHEMA), epoch_id=2)
    t.compact(strategy="bucketed")
    assert sorted_state(t) == [("c2", 0, "y")]
    # tombstone must still block an older zombie AFTER the fold
    t.merge(spark.createDataFrame([ev(3, "insert", "c1", 0, "zombie", 15)], EVENT_SCHEMA), epoch_id=3)
    assert sorted_state(t) == [("c2", 0, "y")]
    t.compact(strategy="bucketed")
    assert sorted_state(t) == [("c2", 0, "y")]


def test_compact_sweeps_orphaned_winners_dirs(spark, tmp_path):
    """A crash between the winners write and its cleanup leaves an
    unreferenced _compact_winners_* dir; the next compact sweeps it."""
    import os

    pdf = make_events(600, n_convs=6, seed=3)
    df = spark.createDataFrame(pdf)
    t = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=2, mode="mor", compact_every=100)
    t.merge(df, epoch_id=0)
    orphan = str(tmp_path / "t" / "_compact_winners_99999999")
    os.makedirs(orphan)
    # a crash between the fold's temp-output write and the rename
    # leaves a _compact_out_* dir — swept by the same pass
    orphan_out = str(tmp_path / "t" / "_compact_out_deadbeef")
    os.makedirs(orphan_out)
    before = sorted(t.read().orderBy("conv_id", "turn_idx").collect())
    t.compact(strategy="bucketed")
    assert not os.path.exists(orphan)
    assert not os.path.exists(orphan_out)
    assert sorted(t.read().orderBy("conv_id", "turn_idx").collect()) == before


def test_bucketed_fold_preserves_big_int64_with_nulls(spark, tmp_path):
    """ADVICE r4: the pandas fold converted int64-with-null columns
    to float64, silently corrupting values above 2^53. The Arrow
    fold must keep them bit-exact — exercised through schema
    evolution (epoch-0 rows read the added bigint column as NULL)."""
    big = (1 << 60) + 7  # not representable in float64
    t = SnapshotTable(spark, str(tmp_path / "bi"), n_buckets=2, mode="mor", compact_every=100)
    t.merge(spark.createDataFrame([ev(0, "insert", "c1", 0, "x", 10)], EVENT_SCHEMA), epoch_id=0)
    evolved = spark.createDataFrame(
        [ev(1, "insert", "c2", 0, "y", 20)], EVENT_SCHEMA
    ).withColumn("fp", F.lit(big).cast("long"))
    t.merge(evolved, epoch_id=1)
    t.compact(strategy="bucketed")
    got = {r.conv_id: r.fp for r in t.read().collect()}
    assert got == {"c1": None, "c2": big}
    # and through a SECOND fold (base now carries the nullable bigint)
    t.merge(spark.createDataFrame([ev(2, "insert", "c3", 0, "z", 30)], EVENT_SCHEMA), epoch_id=2)
    t.compact(strategy="bucketed")
    got = {r.conv_id: r.fp for r in t.read().collect()}
    assert got == {"c1": None, "c2": big, "c3": None}


def test_async_compaction_parity_and_overlap(spark, tmp_path):
    """compact_async=True: the fold runs in a background thread while
    later epochs append (VERDICT r4 #2). Final state must equal the
    synchronous table's; folded dirs are trash-deferred one cycle so
    in-flight reader plans never lose files."""
    pdf = make_events(6000, n_convs=30, seed=44)
    df = spark.createDataFrame(pdf)
    sync = SnapshotTable(spark, str(tmp_path / "sy"), n_buckets=4, mode="mor", compact_every=3)
    asyn = SnapshotTable(
        spark, str(tmp_path / "as"), n_buckets=4, mode="mor", compact_every=3,
        compact_async=True,
    )
    per = 500
    for e in range(12):
        batch = df.filter((F.col("seq") >= e * per) & (F.col("seq") < (e + 1) * per))
        sync.merge(batch, epoch_id=e)
        asyn.merge(batch, epoch_id=e)
    asyn.wait_for_compaction()
    assert sorted_state(sync) == sorted_state(asyn)
    # folds actually ran in the async table
    assert any(c["op"] == "compact" for c in asyn.history())
    # deltas stay bounded (folded sets leave the manifest)
    assert len(asyn._read_manifest()["deltas"]) < 12
    # replay exactly-once still holds after background folds
    assert asyn.merge(df.limit(1), epoch_id=3) is False


def test_async_compaction_failure_surfaces(spark, tmp_path):
    t = SnapshotTable(
        spark, str(tmp_path / "fx"), n_buckets=2, mode="mor", compact_every=1,
        compact_async=True,
    )

    def boom(strategy="auto"):
        raise RuntimeError("fold exploded")

    t._compact_once = boom
    t.merge(spark.createDataFrame([ev(0, "insert", "c1", 0, "a", 0)], EVENT_SCHEMA), epoch_id=0)
    t._compact_thread.join()
    import pytest

    with pytest.raises(RuntimeError, match="background compaction failed"):
        t.merge(
            spark.createDataFrame([ev(1, "insert", "c1", 1, "b", 1)], EVENT_SCHEMA),
            epoch_id=1,
        )


def test_fold_io_helpers_accept_uris(spark, tmp_path):
    """VERDICT r4 #4: every byte the bucketed fold reads goes through
    pyarrow.fs URIs — file:// locally, s3:// etc. on a cluster. The
    parity/fuzz tests exercise the full fold; this pins the helper
    contract directly."""
    from kahi_spark.sinks.snapshot import _bucket_parquet_files, _to_uri

    assert _to_uri("s3://bucket/t") == "s3://bucket/t"  # scheme passthrough
    assert _to_uri(str(tmp_path)).startswith("file://")
    t = SnapshotTable(spark, str(tmp_path / "u"), n_buckets=2, mode="mor", compact_every=100)
    t.merge(spark.createDataFrame([ev(i, "insert", f"c{i}", 0, "x", i) for i in range(8)], EVENT_SCHEMA), epoch_id=0)
    t.compact(strategy="bucketed")
    snap = t._read_manifest()["snapshot"]
    files = _bucket_parquet_files(_to_uri(str(tmp_path / "u" / snap)))
    assert files and all(isinstance(k, int) for k in files)
    assert sum(len(v) for v in files.values()) >= 1
    # empty / missing URIs are harmless
    assert _bucket_parquet_files(None) == {}
    assert _bucket_parquet_files(_to_uri(str(tmp_path / "nope"))) == {}


def test_compact_overwrites_crash_leftover_version_dir(spark, tmp_path):
    """A crash AFTER the fold's rename but BEFORE the manifest commit
    leaves an unreferenced v-dir at the version the next fold will
    claim — the swap must replace it, not fail."""
    import os

    t = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=2, mode="mor", compact_every=100)
    t.merge(spark.createDataFrame([ev(0, "insert", "c1", 0, "a", 0)], EVENT_SCHEMA), epoch_id=0)
    v = t._read_manifest()["version"]
    leftover = str(tmp_path / "t" / f"v{v + 1:08d}")
    os.makedirs(os.path.join(leftover, "_bucket=0"))
    with open(os.path.join(leftover, "_bucket=0", "junk.parquet"), "w") as f:
        f.write("not parquet")
    t.compact(strategy="global")
    assert sorted_state(t) == [("c1", 0, "a")]
    assert t._read_manifest()["snapshot"] == f"v{v + 1:08d}"


def test_lookup_skips_pruning_when_modulus_unrecorded(spark, tmp_path):
    """Code-review r5: a legacy manifest (no base_n_buckets) with
    bucket dirs must NOT prune with the handle's n_buckets guess —
    skip pruning (correct, unpruned) until a fold records the
    modulus."""
    import json
    import os

    pdf = make_events(800, n_convs=8, seed=12)
    t = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=4, mode="mor", compact_every=100)
    t.merge(spark.createDataFrame(pdf), epoch_id=0)
    t.compact(strategy="bucketed")
    key_row = t.read().limit(1).collect()[0]
    # simulate a pre-round-5 manifest: erase the recorded modulus
    mp = os.path.join(str(tmp_path / "t"), "_manifest.json")
    with open(mp) as f:
        m = json.load(f)
    m["base_n_buckets"] = None
    with open(mp, "w") as f:
        json.dump(m, f)
    # reopen with a DIFFERENT n_buckets: a modulus guess would prune
    # the wrong _bucket dir and return empty
    t2 = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=16, mode="mor", compact_every=100)
    got = t2.lookup(key_row.conv_id, key_row.turn_idx).collect()
    assert len(got) == 1 and got[0].text == key_row.text


def test_time_travel_rejects_uncommitted_version_dir(spark, tmp_path):
    """Code-review r5: a fold that crashed between rename and
    manifest commit leaves a v-dir the commit log never recorded —
    read(version=...) must refuse it, and the next fold sweeps it."""
    import os

    import pytest

    t = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=2, mode="mor", compact_every=100)
    t.merge(spark.createDataFrame([ev(0, "insert", "c1", 0, "a", 0)], EVENT_SCHEMA), epoch_id=0)
    v = t._read_manifest()["version"]
    ghost = v + 1
    ghost_dir = str(tmp_path / "t" / f"v{ghost:08d}")
    os.makedirs(os.path.join(ghost_dir, "_bucket=0"))
    with pytest.raises(FileNotFoundError, match="never committed"):
        t.read(version=ghost)
    # delta appends bump the version past the ghost; the next fold
    # must sweep the never-committed dir rather than serve or trip on it
    t.merge(spark.createDataFrame([ev(1, "insert", "c2", 0, "b", 1)], EVENT_SCHEMA), epoch_id=1)
    t.compact(strategy="global")
    assert not os.path.exists(ghost_dir)
    assert sorted_state(t) == [("c1", 0, "a"), ("c2", 0, "b")]


def test_crashed_delta_write_self_heals_on_replay(spark, tmp_path):
    """Code-review r5: a delta write that crashed pre-commit leaves a
    partial dir under a DETERMINISTIC label; the epoch's re-delivery
    recomputes the same label and overwrites it (no orphan leak)."""
    import os

    t = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=2, mode="mor", compact_every=100)
    v = t._read_manifest()["version"]
    stale = str(tmp_path / "t" / f"d{v + 1:08d}")
    os.makedirs(stale)
    with open(os.path.join(stale, "part-junk.parquet"), "w") as f:
        f.write("partial")
    t.merge(spark.createDataFrame([ev(0, "insert", "c1", 0, "a", 0)], EVENT_SCHEMA), epoch_id=0)
    assert sorted_state(t) == [("c1", 0, "a")]
    assert not os.path.exists(os.path.join(stale, "part-junk.parquet"))


def test_fold_sweeps_orphaned_delta_dirs_but_not_live_ones(spark, tmp_path):
    """Code-review r5 (2nd pass): a delta dir whose label was
    overtaken by later commits and that the manifest never references
    is a crash orphan — the fold sweeps it; manifest-referenced
    deltas and labels at/above the fold-start version are never
    touched."""
    import os

    t = SnapshotTable(spark, str(tmp_path / "t"), n_buckets=2, mode="mor", compact_every=100)
    t.merge(spark.createDataFrame([ev(0, "insert", "c1", 0, "a", 0)], EVENT_SCHEMA), epoch_id=0)
    t.merge(spark.createDataFrame([ev(1, "insert", "c2", 0, "b", 1)], EVENT_SCHEMA), epoch_id=1)
    # orphan with an overtaken label (version is now ≥ 2)
    orphan = str(tmp_path / "t" / "d00000001-deadbe")
    os.makedirs(orphan)
    # same-or-higher label: could be an in-flight write — must survive
    inflight = str(tmp_path / "t" / f"d{t._read_manifest()['version'] + 1:08d}")
    os.makedirs(inflight)
    t.compact(strategy="global")
    assert not os.path.exists(orphan)
    assert os.path.exists(inflight)
    assert sorted_state(t) == [("c1", 0, "a"), ("c2", 0, "b")]


def test_concurrent_reads_and_sync_compacts_during_async_merges(spark, tmp_path):
    """Live-concurrency stress for the round-5 locking: while one
    thread merges epochs into a compact_async table (spawning
    background folds), another thread hammers read()/lookup() and
    explicit sync compact() calls. No torn manifests, no
    mid-plan-deleted files, and the final state equals the
    single-threaded reference."""
    import threading

    pdf = make_events(8000, n_convs=40, seed=55)
    df = spark.createDataFrame(pdf).localCheckpoint(eager=True)
    t = SnapshotTable(
        spark, str(tmp_path / "st"), n_buckets=4, mode="mor",
        compact_every=2, compact_async=True,
    )
    errs: list[BaseException] = []
    done = threading.Event()

    def reader():
        while not done.is_set():
            try:
                t.read().count()
                t.compact()  # sync fold racing the spawned ones
                t.lookup("c1", 0).collect()
                t.history()
            except FileNotFoundError:
                pass  # table may not exist yet at loop start
            except BaseException as e:  # noqa: BLE001
                errs.append(e)
                return

    th = threading.Thread(target=reader, daemon=True)
    th.start()
    per = 800
    for e in range(10):
        batch = df.filter((F.col("seq") >= e * per) & (F.col("seq") < (e + 1) * per))
        t.merge(batch, epoch_id=e)
    done.set()
    th.join(timeout=120)
    t.wait_for_compaction()
    assert not errs, errs[0]
    ref = SnapshotTable(spark, str(tmp_path / "ref"), n_buckets=4, mode="mor", compact_every=100)
    for e in range(10):
        batch = df.filter((F.col("seq") >= e * per) & (F.col("seq") < (e + 1) * per))
        ref.merge(batch, epoch_id=e)
    assert sorted_state(t) == sorted_state(ref)


def test_concurrent_same_epoch_delivery_applies_once(spark, tmp_path):
    """Two threads delivering the SAME epoch concurrently: exactly
    one applies. Without merge-level serialization both pass the
    ledger check, race overwrites of the same deterministic delta
    dir and double-commit the epoch (round-5 review)."""
    import threading

    for mode in ("mor", "cow"):
        t = SnapshotTable(
            spark, str(tmp_path / f"race_{mode}"), n_buckets=2, mode=mode
        )
        t.merge(
            spark.createDataFrame([ev(0, "insert", "c1", 0, "v0", 0)], EVENT_SCHEMA),
            epoch_id=0,
        )
        batch = spark.createDataFrame(
            [ev(1, "update", "c1", 0, "v1", 5), ev(2, "insert", "c2", 0, "w", 6)],
            EVENT_SCHEMA,
        )
        results = []
        threads = [
            threading.Thread(target=lambda: results.append(t.merge(batch, epoch_id=1)))
            for _ in range(4)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert sorted(results) == [False, False, False, True], mode
        # the epoch maps to exactly one version; state is the
        # single-application result
        assert sorted_state(t) == [("c1", 0, "v1"), ("c2", 0, "w")]
        assert sum(1 for c in t.history() if c["epoch_id"] == 1) == 1


def test_ratio_triggered_compaction_geometric_schedule(spark, tmp_path):
    """compact_ratio (round 6): folds fire when accumulated delta rows
    reach ratio x base rows — a geometric schedule that bounds total
    rewrite work over long replays (the fixed interval rewrote the
    growing base every K epochs; 240M-soak folds grew 34→117 s).
    Pins: (a) fewer folds than the fixed interval on the same stream,
    (b) folds spaced further apart as the base grows, (c) state parity
    with a fixed-interval twin, (d) compact commits record file rows
    (the trigger's metadata source)."""
    pdf = make_events(6000, n_convs=400, seed=33)
    df = spark.createDataFrame(pdf)
    fixed = SnapshotTable(
        spark, str(tmp_path / "fx"), n_buckets=4, mode="mor", compact_every=2
    )
    ratio = SnapshotTable(
        spark, str(tmp_path / "rt"), n_buckets=4, mode="mor",
        compact_every=2, compact_ratio=0.5,
    )
    per = 500
    for e in range(12):
        batch = df.filter((F.col("seq") >= e * per) & (F.col("seq") < (e + 1) * per))
        fixed.merge(batch, epoch_id=e)
        ratio.merge(batch, epoch_id=e)
    assert sorted_state(fixed) == sorted_state(ratio)

    def fold_epoch_gaps(t):
        vs = [c["version"] for c in t.history() if c["op"] == "compact"]
        return vs

    fx_folds = [c for c in fixed.history() if c["op"] == "compact"]
    rt_folds = [c for c in ratio.history() if c["op"] == "compact"]
    assert len(rt_folds) < len(fx_folds), (len(rt_folds), len(fx_folds))
    # commit lineage carries per-file rows for the new base
    assert all(
        f.get("rows") is not None for c in rt_folds for f in c["files"]
    )
    # geometric spacing: deltas folded per compact grow as the base
    # grows (each fold waits for ratio x a LARGER base). Fold 0 is
    # the compact_every bootstrap (no base yet) — excluded.
    folded = [c["folded"] for c in rt_folds[1:]]
    assert folded == sorted(folded), folded
    assert folded[-1] > folded[0]


def test_minor_compaction_parity_and_fanin(spark, tmp_path):
    """Two-tier compaction (round 6): minor (delta-tier) merges fire
    when the major isn't due, LWW-merging the live deltas into ONE
    dir without touching the base. Pins: (a) state parity with a
    minor-free twin under updates AND deletes (tombstones must
    survive a minor merge — they may still need to beat a base row),
    (b) read fan-in actually bounded (live delta count collapses),
    (c) majors still fire on the ratio, (d) exactly-once replay
    unaffected."""
    pdf = make_events(6000, n_convs=300, seed=44, delete_rate=0.15)
    df = spark.createDataFrame(pdf)
    plain = SnapshotTable(
        spark, str(tmp_path / "pl"), n_buckets=4, mode="mor", compact_every=100
    )
    tiered = SnapshotTable(
        spark, str(tmp_path / "ti"), n_buckets=4, mode="mor",
        compact_every=3, compact_ratio=1.0, compact_minor_every=3,
    )
    per = 500
    for e in range(12):
        batch = df.filter((F.col("seq") >= e * per) & (F.col("seq") < (e + 1) * per))
        plain.merge(batch, epoch_id=e)
        tiered.merge(batch, epoch_id=e)
        # live delta fan-in stays bounded by the minor threshold plus
        # the appends since the last fold
        import json as _json
        import os as _os

        man = _json.loads(
            open(_os.path.join(str(tmp_path / "ti"), "_manifest.json")).read()
        )
        assert len(man["deltas"]) <= 4, (e, man["deltas"])
    assert sorted_state(plain) == sorted_state(tiered)
    ops = [c["op"] for c in tiered.history()]
    assert "compact-minor" in ops
    # replaying a committed epoch is still a no-op
    assert tiered.merge(df.filter("seq < 500"), epoch_id=0) is False
    assert sorted_state(plain) == sorted_state(tiered)


def test_minor_crash_leftovers_swept_and_harmless(spark, tmp_path):
    """A minor merge that crashes mid-flight leaves either a
    _minor_out_* temp dir or a renamed-but-never-committed dm* dir.
    Neither is referenced by the manifest, so reads ignore them; the
    next major fold's sweep removes both (the dm orphan only once its
    version label has been overtaken — same rule as epoch deltas)."""
    import os

    pdf = make_events(1200, n_convs=30, seed=7)
    df = spark.createDataFrame(pdf)
    t = SnapshotTable(
        spark, str(tmp_path / "t"), n_buckets=2, mode="mor",
        compact_every=100, compact_ratio=1.0, compact_minor_every=100,
    )
    t.merge(df.filter("seq < 600"), epoch_id=0)
    t.merge(df.filter("seq >= 600"), epoch_id=1)
    before = sorted_state(t)

    # crash artifacts: temp output + an uncommitted dm dir whose
    # version label is already stale (0 < current manifest version)
    os.makedirs(str(tmp_path / "t" / "_minor_out_deadbeef"))
    os.makedirs(str(tmp_path / "t" / "dm00000000"))
    assert sorted_state(t) == before  # reads never see orphans

    t.compact(strategy="global")
    assert not os.path.exists(str(tmp_path / "t" / "_minor_out_deadbeef"))
    assert not os.path.exists(str(tmp_path / "t" / "dm00000000"))
    assert sorted_state(t) == before


def test_minor_tier_live_in_fixed_interval_mode(spark, tmp_path):
    """Round-7 ADVICE fix: ``compact_minor_every`` fires in the
    ratio-LESS (fixed-interval) configuration too — it used to be
    silently inert without ``compact_ratio``, leaving unbounded delta
    fan-in between the ``compact_every`` majors. Pins: minors fire,
    fan-in stays bounded, and state matches a compaction-free twin."""
    pdf = make_events(3000, n_convs=200, seed=45, delete_rate=0.1)
    df = spark.createDataFrame(pdf)
    plain = SnapshotTable(
        spark, str(tmp_path / "pl"), n_buckets=4, mode="mor", compact_every=100
    )
    tiered = SnapshotTable(
        spark, str(tmp_path / "ti"), n_buckets=4, mode="mor",
        compact_every=100, compact_minor_every=2,  # NO compact_ratio
    )
    per = 500
    for e in range(6):
        batch = df.filter((F.col("seq") >= e * per) & (F.col("seq") < (e + 1) * per))
        plain.merge(batch, epoch_id=e)
        tiered.merge(batch, epoch_id=e)
        import json as _json
        import os as _os

        man = _json.loads(
            open(_os.path.join(str(tmp_path / "ti"), "_manifest.json")).read()
        )
        assert len(man["deltas"]) <= 2, (e, man["deltas"])
    ops = [c["op"] for c in tiered.history()]
    assert "compact-minor" in ops and "compact" not in ops
    assert sorted_state(plain) == sorted_state(tiered)
