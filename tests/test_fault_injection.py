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
