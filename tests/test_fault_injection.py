"""Fault injection: a crash between the snapshot/delta write and the
atomic manifest swap must leave the table readable at the OLD version
and the retried epoch must apply exactly once (SURVEY.md §7 "What's
hard" #1)."""

from __future__ import annotations

import datetime as dt

import pytest

from kahi_spark.schema import EVENT_SCHEMA
from kahi_spark.sinks.snapshot import SnapshotTable


def ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)


def ev(seq, op, conv, turn, text, t):
    return (seq, op, conv, turn, "user", text, None, ts(t), "lens")


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_crash_before_manifest_swap_then_retry(spark, tmp_path, mode, monkeypatch):
    t = SnapshotTable(spark, str(tmp_path / f"t-{mode}"), n_buckets=2, mode=mode)
    t.merge(spark.createDataFrame([ev(0, "insert", "c1", 0, "v1", 0)], EVENT_SCHEMA), epoch_id=0)

    # crash AFTER data files land but BEFORE the manifest pointer swap
    real_commit = SnapshotTable._commit_manifest
    calls = {"n": 0}

    def crashing(self, manifest):
        calls["n"] += 1
        raise OSError("simulated crash before manifest swap")

    monkeypatch.setattr(SnapshotTable, "_commit_manifest", crashing)
    batch = spark.createDataFrame([ev(1, "update", "c1", 0, "v2", 10)], EVENT_SCHEMA)
    with pytest.raises(OSError):
        t.merge(batch, epoch_id=1)
    assert calls["n"] == 1

    # table still reads the OLD committed state (snapshot isolation);
    # the orphaned data directory is invisible
    monkeypatch.setattr(SnapshotTable, "_commit_manifest", real_commit)
    assert [r.text for r in t.read().collect()] == ["v1"]
    assert t.committed_epochs() == {0}

    # the streaming layer retries the epoch: applies exactly once
    assert t.merge(batch, epoch_id=1) is True
    assert [r.text for r in t.read().collect()] == ["v2"]
    # a second retry is the ledger no-op
    assert t.merge(batch, epoch_id=1) is False


def test_process_kill_mid_async_fold_then_restart(spark, tmp_path):
    """Kill the WHOLE process while a background (compact_async) fold
    is in flight, then reopen the table from another process: every
    committed epoch must read back, replay must no-op, and the next
    fold must sweep whatever the dead fold left behind."""
    import json
    import os
    import subprocess
    import sys
    import textwrap

    from pyspark.sql import functions as F

    from kahi_spark.gen import make_events

    path = str(tmp_path / "t")
    child = textwrap.dedent(f"""
        import os, sys
        sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath("tests")))!r})
        sys.path.insert(0, "/root/repo")
        from kahi_spark import get_spark
        from kahi_spark.gen import make_events
        from kahi_spark.sinks.snapshot import SnapshotTable
        spark = get_spark(master="local[4]", shuffle_partitions=4)
        pdf = make_events(60000, n_convs=400, seed=77)
        df = spark.createDataFrame(pdf)
        t = SnapshotTable(spark, {path!r}, n_buckets=4, mode="mor",
                          compact_every=2, compact_async=True)
        t.merge(df.filter(df.seq < 30000), epoch_id=0)
        t.merge(df.filter(df.seq >= 30000), epoch_id=1)  # triggers async fold
        # die while the fold is (very likely) mid-flight — a hard
        # process exit, no cleanup, no thread join
        print("CHILD_COMMITTED")
        sys.stdout.flush()
        os._exit(1)
    """)
    res = subprocess.run([sys.executable, "-c", child], capture_output=True, text=True)
    assert "CHILD_COMMITTED" in res.stdout, res.stderr[-2000:]

    # reopen in THIS process: both epochs committed and readable
    t = SnapshotTable(spark, path, n_buckets=4, mode="mor", compact_every=2)
    assert t.committed_epochs() == {0, 1}
    pdf = make_events(60000, n_convs=400, seed=77)
    expect = (
        pdf.sort_values(["ts", "seq"])
        .groupby(["conv_id", "turn_idx"])
        .tail(1)
    )
    expect = expect[expect.op != "delete"]
    assert t.read().count() == len(expect)
    # replay of a committed epoch no-ops
    df = spark.createDataFrame(pdf)
    assert t.merge(df.filter(F.col("seq") < 30000), epoch_id=0) is False
    # a fresh merge + fold works and sweeps any dead-fold leftovers
    extra = spark.createDataFrame(
        [(200000, "insert", "zz", 0, "user", "post-crash", None,
          pdf["ts"].max().to_pydatetime(), "lens")],
        df.schema,
    )
    assert t.merge(extra, epoch_id=2) is True
    t.compact()
    leftovers = [
        e.name for e in os.scandir(path)
        if e.name.startswith("_compact_winners_") or e.name.startswith("_compact_out_")
    ]
    assert leftovers == []
    assert t.read().filter(F.col("conv_id") == "zz").count() == 1
