"""Multi-table epoch commit (SURVEY.md S8 — the reference's
``insert_one`` upserts FOUR linked entity collections in sequence:
sources → institutions → authors → documents, ``KahiDb.py:864-909``,
shrinking nested entities to id references).

The CDC engine's analogue: one epoch may carry changes for several
entity tables (e.g. transcripts + a speakers dimension). Exactly-once
across the set comes from composing idempotent parts:

* each ``SnapshotTable.merge`` is individually idempotent (its own
  epoch ledger), so a crash mid-sequence and a retry re-applies ONLY
  the tables that hadn't committed;
* the transaction ledger records the epoch once every member table
  committed — readers wanting cross-table consistency check it
  (the reference has no such guard; Mongo's per-document atomicity
  was its only story).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame

from kahi_spark.sinks.snapshot import SnapshotTable


class MultiTableTxn:
    def __init__(self, tables: dict[str, SnapshotTable], ledger_path: str) -> None:
        self.tables = tables
        # canonical apply order = construction order of ``tables``
        # (callers list dimensions before facts, mirroring the
        # reference's sources→institutions→authors→documents sequence,
        # KahiDb.py:864-909); merge_all enforces it regardless of the
        # batches dict's insertion order.
        self.table_order = list(tables)
        self.ledger_path = ledger_path
        os.makedirs(os.path.dirname(ledger_path) or ".", exist_ok=True)

    def _read_ledger(self) -> dict:
        if not os.path.exists(self.ledger_path):
            return {"epochs": {}}
        with open(self.ledger_path) as f:
            return json.load(f)

    def committed_epochs(self) -> set[int]:
        return {int(e) for e in self._read_ledger()["epochs"]}

    def merge_all(self, batches: dict[str, DataFrame], epoch_id: int) -> dict[str, bool]:
        """Apply one epoch's changes to every named table, in the
        transaction's CANONICAL order (dimensions before facts —
        ``self.table_order``), not the caller's batches-dict order.
        Idempotent at both levels: retried epochs skip tables that
        already committed; a fully-committed epoch is a no-op."""
        for name in batches:
            if name not in self.tables:
                raise KeyError(f"unknown table {name!r}")
        ledger = self._read_ledger()
        if str(epoch_id) in ledger["epochs"]:
            return {name: False for name in batches}
        applied = {}
        for name in self.table_order:
            if name not in batches:
                continue
            applied[name] = self.tables[name].merge(batches[name], epoch_id=epoch_id)
        ledger["epochs"][str(epoch_id)] = sorted(batches)
        tmp = self.ledger_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(ledger, f)
        os.replace(tmp, self.ledger_path)
        return applied
