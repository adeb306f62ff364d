"""Driver-table reader with layout repair.

Every driver-provided parquet table is ONE file containing ONE row
group — which caps the scan stage, and everything map-side of the
first shuffle, at a single task no matter the core count (row groups
are the unit of parquet splitting). That silently single-threads the
expensive per-row work of whole operator families: shingle/bigram
extraction for the dedup ops runs before the first shuffle, the CDC
derive+normalize expressions fuse into the scan, lineitem aggregates
do their map-side combine in the scan stage.

``read_table`` reads heavy tables through a content-identical N-file
copy (rows hash-assigned by the table's key — deterministic),
materialized ONCE per scale factor under /tmp with the same
atomic-rename discipline as the feed cache. DuckDB oracles keep
reading the originals, so gated results are unchanged by
construction. Small dimension tables (nation/region/…) are read
directly — they broadcast anyway.

(On a real cluster this is ingest-layout hygiene, not a bench trick:
write tables as many files / bounded row groups, or any per-row
compute caps at #row-groups-wide parallelism.)
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: bump when the reshard layout changes
SHARD_VER = 1

#: grace window (s) before a superseded shard dir is actually
#: deleted — long enough for another process's in-flight query over
#: the old copy to finish (see the mark-then-sweep in table_path)
STALE_GRACE_S = 900

#: tables worth resharding → their deterministic hash key.
#: lineitem/orders are deliberately ABSENT: they feed rounded-DOUBLE
#: aggregates (pricing_summary, revenue sums), and with >1 input
#: split the partial-sum merge order is scheduling-dependent — a sum
#: landing on a x.xxxx5 rounding boundary then flips run-to-run and
#: flakes the oracle value hash (single-split input ⇒ one partial per
#: reducer stream ⇒ deterministic order).  `events` IS sharded — its
#: heavy consumers (the CDC derive/normalize family) emit only text
#: and integers — but the two queries that round-sum `events.value`
#: (q_sessionize_events, q_tumbling_hourly) therefore read the
#: ORIGINAL single-file table directly, bypassing read_table.
#: Every other sharded consumer is order-independent math: integer
#: counts/mins/maxes, per-row ratios, set intersections, per-pair
#: dot products.
SHARD_KEYS = {
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
    "customer": "c_custkey",
}

N_SHARDS = 32


def _src_fingerprint(src: str) -> str:
    """Identity of the SOURCE file baked into the shard-cache key:
    (size, mtime_ns) — metadata-only. Without it a regenerated
    source parquet (or two sf_dirs sharing a basename) would silently
    serve stale/foreign rows while the DuckDB oracles read the fresh
    originals — every gated query would hash-mismatch with no error
    (round-5 review finding)."""
    st = os.stat(src)
    return f"{st.st_size}-{st.st_mtime_ns}"


def table_path(spark: SparkSession, sf_dir: str, name: str) -> str:
    src = f"{sf_dir}/{name}.parquet"
    key = SHARD_KEYS.get(name)
    if key is None:
        return src
    sf_tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    path = (
        f"/tmp/kahi_table_shards_v{SHARD_VER}/{sf_tag}/"
        f"{name}-{_src_fingerprint(src)}"
    )
    if not os.path.exists(path):
        parent = os.path.dirname(path)
        os.makedirs(parent, exist_ok=True)
        # sweep stale fingerprints of THIS table (complete, renamed
        # dirs — a regenerated source cannot be mid-build under an old
        # fingerprint) so /tmp holds at most one live copy per
        # (sf, table). Deliberately does NOT sweep .build-* temp dirs:
        # a CONCURRENT process may be mid-write there (each build is
        # uniquely named and self-cleans on rename failure).
        # Mark-then-sweep: a stale dir is first tagged with a .stale
        # marker and deleted only once the marker has aged past the
        # grace window — another process's in-flight Spark job may
        # still be scanning the superseded dir (its executors open
        # listed files lazily; an immediate rmtree turns that scan
        # into FileNotFoundException mid-query — round-5 review).
        for e in os.scandir(parent):
            if not e.name.startswith(f"{name}-"):
                continue
            if e.is_file() and e.name.endswith(".stale"):
                if not os.path.isdir(e.path[: -len(".stale")]):
                    try:
                        os.unlink(e.path)  # orphan marker, dir gone
                    except OSError:
                        pass
                continue
            if e.is_dir() and ".build-" not in e.name:
                marker = e.path + ".stale"
                try:
                    marker_age = time.time() - os.stat(marker).st_mtime
                except OSError:
                    with open(marker, "w"):
                        pass  # mark now; a later call sweeps it
                    continue
                if marker_age > STALE_GRACE_S:
                    shutil.rmtree(e.path, ignore_errors=True)
                    try:
                        os.unlink(marker)
                    except OSError:
                        pass
        tmp = f"{path}.build-{uuid.uuid4().hex}"
        (
            spark.read.parquet(src)
            .repartition(N_SHARDS, F.col(key))
            .write.mode("overwrite")
            .parquet(tmp)
        )
        try:
            os.rename(tmp, path)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    # a CURRENT dir must never carry a stale marker: two processes
    # racing the same rebuild can leave one (B marks the dir A just
    # renamed into place, then B's own rename fails) — and a marker
    # that survives onto the live dir would age past the grace window
    # while current, so the NEXT regeneration's sweep would delete the
    # just-superseded copy with zero grace (round-5 review)
    try:
        os.unlink(path + ".stale")
    except OSError:
        pass
    return path


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(table_path(spark, sf_dir, name))


def read_query_table(
    spark: SparkSession, sf_dir: str, name: str, reshard: bool = True
) -> DataFrame:
    """The query registries' table reader (aliased as ``_read`` in
    queries.py / queries_ext.py — single implementation).

    ``reshard=True``: heavy tables route through the once-per-sf
    resharded copy (a single-file/single-row-group table caps the
    scan stage at ONE task — see module docstring); oracles read the
    originals. ``reshard=False``: queries whose map-side work is
    CHEAP (one hash/regex per row, no shingle/bigram/pandas stage)
    read the original single file — the 32-file listing+scheduling
    overhead (~0.05-0.15 s measured at sf0.1) exceeds the
    parallelism win there, and at 100 TB such queries are shuffle-
    not scan-bound."""
    if not reshard:
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return read_table(spark, sf_dir, name)
