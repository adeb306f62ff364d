"""Multi-table epoch commit: ordered upserts across entity tables,
crash-retry completes only the missing members (insert_one parity)."""

from __future__ import annotations

import datetime as dt

import pytest

from kahi_spark.schema import EVENT_SCHEMA
from kahi_spark.sinks.multi import MultiTableTxn
from kahi_spark.sinks.snapshot import SnapshotTable


def ts(i):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)


def ev(seq, op, conv, turn, text, t):
    return (seq, op, conv, turn, "user", text, None, ts(t), "lens")


def test_multi_table_commit_and_partial_crash_retry(spark, tmp_path, monkeypatch):
    transcripts = SnapshotTable(spark, str(tmp_path / "transcripts"), n_buckets=2)
    speakers = SnapshotTable(
        spark, str(tmp_path / "speakers"), key_cols=["conv_id", "turn_idx"], n_buckets=2
    )
    txn = MultiTableTxn(
        {"speakers": speakers, "transcripts": transcripts},
        str(tmp_path / "txn" / "ledger.json"),
    )
    b_t = spark.createDataFrame([ev(0, "insert", "c1", 0, "hello", 0)], EVENT_SCHEMA)
    b_s = spark.createDataFrame([ev(0, "insert", "c1", 0, "alice", 0)], EVENT_SCHEMA)

    out = txn.merge_all({"speakers": b_s, "transcripts": b_t}, epoch_id=0)
    assert out == {"speakers": True, "transcripts": True}
    assert txn.committed_epochs() == {0}

    # epoch 1: crash AFTER speakers commits, BEFORE transcripts
    b_t2 = spark.createDataFrame([ev(1, "update", "c1", 0, "hello2", 9)], EVENT_SCHEMA)
    b_s2 = spark.createDataFrame([ev(1, "update", "c1", 0, "alice2", 9)], EVENT_SCHEMA)
    real_merge = SnapshotTable.merge
    state = {"calls": 0}

    def crashy(self, *a, **kw):
        state["calls"] += 1
        if state["calls"] == 2:  # second table in the sequence
            raise OSError("crash mid-transaction")
        return real_merge(self, *a, **kw)

    monkeypatch.setattr(SnapshotTable, "merge", crashy)
    with pytest.raises(OSError):
        txn.merge_all({"speakers": b_s2, "transcripts": b_t2}, epoch_id=1)
    monkeypatch.setattr(SnapshotTable, "merge", real_merge)

    # epoch not in the txn ledger; speakers DID commit (own ledger)
    assert txn.committed_epochs() == {0}
    assert speakers.read().collect()[0].text == "alice2"
    assert transcripts.read().collect()[0].text == "hello"

    # retry: speakers skips (per-table ledger), transcripts applies
    out = txn.merge_all({"speakers": b_s2, "transcripts": b_t2}, epoch_id=1)
    assert out == {"speakers": False, "transcripts": True}
    assert transcripts.read().collect()[0].text == "hello2"
    assert txn.committed_epochs() == {0, 1}

    # replay of the whole epoch: full no-op
    out = txn.merge_all({"speakers": b_s2, "transcripts": b_t2}, epoch_id=1)
    assert out == {"speakers": False, "transcripts": False}
