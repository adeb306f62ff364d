"""Persistent block-feature index for the keyless resolver's STATE
side (the pattern ``operators/keyless.py`` names for 10^10 rows).

``resolve_keyless_events`` featurizes the current table state —
shingles/bigrams, one md5 per feature, MinHash slots, size bucket —
which at 100k rows is already ~half the resolve wall, and at 10^10
rows per batch would be absurd: state text must be featurized ONCE
per version, not once per micro-batch. This index keeps an
epoch-keyed parquet table of exactly the resolver's candidate
columns:

    (conv_id, turn_idx, role, _ft, _m0.., _lb, ts, _seq, _deleted)

* ``update(batch, epoch)`` LWW-reduces the normalized batch and
  featurizes ≤1 row per touched key — O(batch), the same cost shape
  as the MOR delta write. Epoch-keyed subdirectories make replays
  idempotent (byte-identical overwrite of the epoch's own dir, the
  ``LshDedupIndex.add`` swap discipline).
* ``features()`` resolves latest-per-key across epochs (the same
  (ts, seq) order the snapshot sink uses) and drops tombstones —
  exactly ``keyless._with_features`` of the live table state, built
  incrementally.
* ``compact()`` folds the epoch dirs into one base (call it on the
  sink's compaction cadence); reads stay correct without it, just
  over more files.

Crash model: merge commit and index update are separate writes. The
pipeline calls ``update`` AFTER the merge and ALSO on ledger-skipped
replays (update is idempotent), so a crash between the two heals on
re-delivery.

On a real cluster the index is an Iceberg table bucketed on
``conv_id`` — the same layout as the transcript table, so the
feature lookup after blocking is a storage-partitioned join.

Reference analogue: Kahi preloads the candidate similarity lists
once and consumes them across the run (``KahiDb.py:161-242``) —
here the preload is a distributed, persistent, incrementally
maintained feature table.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kahi_spark.operators.keyless import N_SLOTS, _with_features

_KEYS = ["conv_id", "turn_idx"]
_FEATURE_COLS = ["role", "_ft", *[f"_m{i}" for i in range(N_SLOTS)], "_lb"]
_SCHEMA = (
    "conv_id string, turn_idx int, role string, _ft array<bigint>, "
    + ", ".join(f"_m{i} long" for i in range(N_SLOTS))
    + ", _lb int, ts timestamp, _seq long, _deleted boolean"
)


class KeylessFeatureIndex:
    def __init__(self, spark: SparkSession, path: str, compact_every: int = 8) -> None:
        """``compact_every``: fold the epoch dirs into one base once
        more than this many accumulate — bounds the read-side
        latest-per-key window's input (same cadence contract as the
        MOR sink's ``compact_every``)."""
        self.spark = spark
        self.path = path
        self.compact_every = compact_every

    # -- storage ------------------------------------------------------------

    def _epoch_dirs(self) -> list[str]:
        if not os.path.isdir(self.path):
            return []
        return sorted(
            e.path for e in os.scandir(self.path)
            if e.is_dir() and (e.name.startswith("epoch_") or e.name.startswith("base_"))
        )

    def _read_all(self) -> DataFrame:
        dirs = self._epoch_dirs()
        if not dirs:
            return self.spark.createDataFrame([], _SCHEMA)
        return self.spark.read.schema(_SCHEMA).parquet(*dirs)  # type: ignore[arg-type]

    def _swap_in(self, df: DataFrame, name: str) -> None:
        """Write to a temp dir, then atomically replace ``name`` —
        a re-delivered epoch's plan may lazily read the previous
        delivery's files, so the write completes before the swap."""
        final = os.path.join(self.path, name)
        tmp = f"{final}.tmp-{uuid.uuid4().hex}"
        df.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)

    # -- maintenance --------------------------------------------------------

    def update(self, normalized_batch: DataFrame, epoch_id: int) -> None:
        """Featurize the batch's final change per key and persist it
        under this epoch (idempotent). Deletes are kept as tombstone
        rows so ``features()`` can drop the key.

        ASSUMES plain LWW table semantics: the features are computed
        from the batch's LWW-winning text, so a sink configured with
        per-column merge policies (fill_empty / source-priority)
        could hold final text that differs from what was indexed —
        feature drift. ``CdcPipeline.__init__`` rejects that
        combination."""
        from kahi_spark.operators.merge import latest_change_per_key

        reduced = latest_change_per_key(normalized_batch)
        feats = _with_features(
            reduced.select(
                "conv_id", "turn_idx", "role", "text", "ts",
                F.col("seq").alias("_seq"),
                (F.col("op") == "delete").alias("_deleted"),
            )
        ).select(*_KEYS, *_FEATURE_COLS, "ts", "_seq", "_deleted")
        self._swap_in(feats, f"epoch_{epoch_id}")
        if len(self._epoch_dirs()) > self.compact_every:
            self.compact()

    def compact(self) -> None:
        """Fold all epoch dirs into one resolved base (bounded file
        count; same fold the MOR sink's compaction does).

        Scale note: this is the GLOBAL fold (one window over the full
        index). At 10^10 keys the right shape is the snapshot sink's
        bucket-zipped incremental fold (`SnapshotTable._compact_bucketed`
        — shuffle only the new epochs, zip bucket dirs task-locally);
        the index is itself a keyed table, so the planned refactor is
        to back it with a SnapshotTable rather than duplicate that
        machinery here."""
        dirs = self._epoch_dirs()
        if len(dirs) <= 1:
            return
        resolved = self._resolve(self._read_all()).localCheckpoint(eager=True)
        self._swap_in(resolved, f"base_{uuid.uuid4().hex[:8]}")
        for d in dirs:
            shutil.rmtree(d, ignore_errors=True)

    # -- reads --------------------------------------------------------------

    def _resolve(self, df: DataFrame) -> DataFrame:
        order = [
            F.coalesce(F.col("ts"), F.to_timestamp(F.lit("1970-01-01"))).desc(),
            F.col("_seq").desc(),
        ]
        w = Window.partitionBy(*_KEYS).orderBy(*order)
        return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")

    def features(self) -> DataFrame:
        """Live-state candidate features — the drop-in
        ``state_features`` frame for ``resolve_keyless_events``."""
        return (
            self._resolve(self._read_all())
            .filter(~F.col("_deleted"))
            .select(*_KEYS, *_FEATURE_COLS)
        )
