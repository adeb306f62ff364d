"""Oracle-gated entries for the PERSISTENT incremental indexes — the
100-TB story of dedup-at-ingest and keyless resolution (SURVEY §2.8b
applied to state other than the snapshot table itself):

* ``incremental_dedup`` — ``DedupIndex`` built over epochs 0-1 of the
  document stream, then epoch 2 deduped against it (cross-epoch
  near-dup drop without re-shingling the corpus).  Oracle =
  closed-form SQL over the whole log (a document in epoch 2 is
  dropped iff an EARLIER-epoch document shares a MinHash band).
  Reference analogue: Kahi's already-in-db skip
  (``KahiDb.py:161-242``).
* ``keyless_incremental`` — ``KeylessFeatureIndex`` featurized over
  state epochs 0-1, then a batch of keyless probes from epoch 2
  resolved against the index.  Oracle = the same blocking + scoring
  cascade in closed-form SQL over the union of epochs 0-1.
  Reference analogue: ``Kahi.py:195-199`` resume-from-checkpoint.

Both run against throwaway /tmp dirs (a few MB at gate scale) and
are deterministic: epoch split is ``hash(key) % 3``-style arithmetic
on stable ids, never timestamps-of-run.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES_INDEX: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

ORACLES_INDEX: dict[str, str] = {}
