"""Persistent block-feature index for the keyless resolver's STATE
side (the pattern ``operators/keyless.py`` names for 10^10 rows).

``resolve_keyless_events`` featurizes the current table state —
shingles/bigrams, one md5 per feature, MinHash slots, size bucket —
which at 100k rows is already ~half the resolve wall, and at 10^10
rows per batch would be absurd: state text must be featurized ONCE
per version, not once per micro-batch.

The index IS a keyed table — (conv_id, turn_idx) → the resolver's
candidate columns

    (role, _ft, _m0.., _lb, ts)

so since round 4 it is BACKED BY ``SnapshotTable`` in MOR mode
instead of bespoke epoch-dir storage. That buys, for free and under
the same test battery as the main table:

* **exactly-once updates** — the epoch ledger no-ops a re-delivered
  epoch id (the old implementation relied on byte-identical dir
  swaps);
* **O(batch) writes** — each update lands as a MOR delta; reads
  resolve latest-per-key;
* **bucket-zipped incremental compaction** — the
  ``_compact_bucketed`` fold, so maintaining the index at 10^10 keys
  never reshuffles the whole index;
* **lineage + per-file watermarks** in the manifest.

Crash model: main-table merge commit and index update are separate
commits with separate ledgers. The pipeline calls ``update`` AFTER
the merge and ALSO on ledger-skipped replays, so a crash between the
two heals on re-delivery (the index's own ledger then skips the
second application).

On a real cluster both tables are Iceberg tables bucketed on
``conv_id`` — the same layout as the transcript table, so the
feature lookup after blocking is a storage-partitioned join.

Reference analogue: Kahi preloads the candidate similarity lists
once and consumes them across the run (``KahiDb.py:161-242``) —
here the preload is a distributed, persistent, incrementally
maintained feature table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kahi_spark.operators.keyless import N_SLOTS, _with_features

_KEYS = ["conv_id", "turn_idx"]
_FEATURE_COLS = ["role", "_ft", *[f"_m{i}" for i in range(N_SLOTS)], "_lb"]


class KeylessFeatureIndex:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        compact_every: int = 8,
        n_buckets: int = 16,
        compact_async: bool = False,
    ) -> None:
        """``compact_every``: fold the MOR deltas into a base once
        this many accumulate — bounds the read-side latest-per-key
        window's input (the backing table's own cadence contract).
        ``compact_async``: run that fold in the backing table's
        background thread (same machinery, tests and guarantees as
        the main table's overlapped compaction) so index maintenance
        stops blocking the triggering epoch."""
        from kahi_spark.sinks.snapshot import SnapshotTable

        self.spark = spark
        self.path = path
        self.table = SnapshotTable(
            spark,
            path,
            key_cols=list(_KEYS),
            n_buckets=n_buckets,
            mode="mor",
            compact_every=compact_every,
            compact_async=compact_async,
        )

    # -- maintenance --------------------------------------------------------

    def update(
        self, normalized_batch: DataFrame, epoch_id: int, watermark=None
    ) -> bool:
        """Featurize the batch's final change per key and MERGE it
        under this epoch id. Exactly-once: a re-delivered epoch is a
        ledger no-op (returns False). Deletes flow through as
        tombstones so ``features()`` drops the key.

        ``watermark``: the batch's max event ts (or a thunk), passed
        through to the backing table's manifest. Callers that already
        measured it (``CdcPipeline``'s metrics pre-pass) MUST pass it
        — the fallback is an extra per-epoch Spark job re-scanning
        the batch just for ``max(ts)``.

        ASSUMES the supplied batch's LWW-winning text IS the table's
        final text per key. That holds for plain LWW tables and for
        per-column policies on NON-feature columns; when a policy
        touches text/role, ``CdcPipeline`` feeds this method the
        post-merge state of the affected keys instead
        (``_post_merge_feature_source``) so the features never
        drift."""
        from kahi_spark.operators.merge import latest_change_per_key

        reduced = latest_change_per_key(normalized_batch)
        feats = _with_features(
            reduced.select("conv_id", "turn_idx", "op", "seq", "role", "text", "ts")
        ).select("conv_id", "turn_idx", "op", "seq", "ts", *_FEATURE_COLS)
        return self.table.merge(
            feats, epoch_id=epoch_id, pre_reduced=True, watermark=watermark
        )

    def compact(self) -> None:
        """Fold the deltas into a base (the backing table's
        compaction — `auto` picks the bucket-zipped incremental fold
        once the base dwarfs the deltas, the 10^10-key steady
        state)."""
        self.table.compact()

    def exists(self) -> bool:
        return self.table.exists()

    # -- reads --------------------------------------------------------------

    def features(self) -> DataFrame:
        """Live-state candidate features — the drop-in
        ``state_features`` frame for ``resolve_keyless_events``.
        Empty (correct schema) before the first committed update —
        the pipeline reads it on epoch 0, before anything landed."""
        if not self.table.exists():
            schema = (
                "conv_id string, turn_idx int, role string, _ft array<bigint>, "
                + ", ".join(f"_m{i} long" for i in range(N_SLOTS))
                + ", _lb int"
            )
            return self.spark.createDataFrame([], schema)
        return self.table.read().select(*_KEYS, *_FEATURE_COLS)
