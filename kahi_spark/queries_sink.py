"""Oracle-gated entries that drive the REAL sink machinery end to end
(SURVEY.md S8 / §2.8b / §2.8e) — not just the algebra around it.

Round 2 verified exactly-once and schema evolution by pytest only;
these entries put the actual ``SnapshotTable`` (epoch ledger, MOR
deltas + compaction, versioned MERGE, ADD COLUMN evolution) behind
the driver's DuckDB value-hash gate:

* ``cdc_resume_replay`` — the change log split into three epochs,
  with two epochs RE-DELIVERED as poison batches under their already
  committed epoch_ids (the crash-after-commit-before-checkpoint
  re-delivery of ``streaming/pipeline.py``). The ledger must no-op
  both, or the poison text lands in the final state and the value
  hash catches it. Reference analogue: Kahi's ``source_checked``
  processed-set filter (``KahiDb.py:180,313-315``; checkpoint append
  ``Kahi.py:191-200``).
* ``cdc_schema_evolution`` — the LAST epoch arrives with a brand-new
  column; ``SnapshotTable.merge`` must ADD COLUMN (old rows read
  NULL) and only keys whose LWW-winning event carries the column get
  a value. Reference analogue: Scopus' ad-hoc field addition
  (``Scopus.py:92-100``) formalized as Iceberg-style evolution
  (``schema.py:47-68``).

Each run materializes a throwaway table under a fresh tmp directory
(the returned DataFrame lazily reads those files, so the directory
must outlive the query; a few MB at gate scale, /tmp-lifetime).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kahi_spark.operators.merge import normalize_events
from kahi_spark.sources.events import derive_transcript_events, norm_events_cte

_OUT_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _epochs(spark: SparkSession, sf_dir: str) -> list[DataFrame]:
    """The derived+normalized change log split into 3 epochs by
    ``seq % 3``. Deliberately NOT time-ordered slices: the sink's
    MERGE is versioned against state (``_newer_than`` on (ts, seq)),
    so epoch arrival order must not change the final table — the
    oracle is plain whole-log LWW SQL either way."""
    ev = normalize_events(derive_transcript_events(spark, sf_dir))
    return [ev.filter(F.pmod(F.col("seq"), F.lit(3)) == e) for e in range(3)]


def q_cdc_resume_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 + §2.8b through the real sink in MOR mode (delta appends,
    mid-run compaction, read-side LWW resolve): epochs 0,1,2 merge,
    then epochs 1 and 0 are re-delivered as POISON batches under
    their committed epoch_ids. If the ledger failed to skip them the
    poison text would win LWW and the value hash would mismatch."""
    from kahi_spark.sinks.snapshot import SnapshotTable

    e = _epochs(spark, sf_dir)
    table = SnapshotTable(
        spark,
        tempfile.mkdtemp(prefix="kahi_gate_resume_"),
        n_buckets=4,
        mode="mor",
        compact_every=2,
    )
    applied = [table.merge(e[0], epoch_id=0), table.merge(e[1], epoch_id=1)]
    poison1 = e[1].withColumn("text", F.lit("POISON")).withColumn("ts", F.col("ts") + F.expr("INTERVAL 1000 DAYS"))
    replayed = [table.merge(poison1, epoch_id=1)]  # duplicate delivery
    applied.append(table.merge(e[2], epoch_id=2))
    poison0 = e[0].withColumn("text", F.lit("POISON")).withColumn("ts", F.col("ts") + F.expr("INTERVAL 1000 DAYS"))
    replayed.append(table.merge(poison0, epoch_id=0))  # late re-delivery
    assert all(applied) and not any(replayed), (applied, replayed)
    return table.read().select(*_OUT_COLS)


# idempotent replay ⇒ the final table IS the whole-log LWW state
ORACLE_CDC_RESUME_REPLAY = (
    norm_events_cte()
    + """
, latest AS (
    SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) AS rn
    FROM norm
)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM latest WHERE rn = 1 AND op <> 'delete'
"""
)

#: the evolved column's value, shared spelling (ANSI, both engines);
#: computed from the NORMALIZED text of the carrying event
_SENTIMENT_SQL = "CASE WHEN length({x}) % 2 = 0 THEN 'even' ELSE 'odd' END"


def q_cdc_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8e through the real sink in COW mode: epochs 0 and 1 carry
    the original schema; epoch 2 arrives with a new ``sentiment``
    column. ``merge`` ADD-COLUMNs the state (pre-evolution rows read
    NULL), so the final value is epoch 2's only where epoch 2's
    change WINS the versioned LWW — i.e. exactly where the whole-log
    winner has ``seq % 3 = 2``. (A batch missing a known column is
    no-change for that column; delivering the evolved epoch last
    keeps the oracle closed-form.)"""
    from kahi_spark.sinks.snapshot import SnapshotTable

    e = _epochs(spark, sf_dir)
    table = SnapshotTable(
        spark, tempfile.mkdtemp(prefix="kahi_gate_evolve_"), n_buckets=4, mode="cow"
    )
    e2 = e[2].withColumn("sentiment", F.expr(_SENTIMENT_SQL.format(x="text")))
    applied = [
        table.merge(e[0], epoch_id=0),
        table.merge(e[1], epoch_id=1),
        table.merge(e2, epoch_id=2),
    ]
    assert all(applied), applied
    evolved = [c["added_columns"] for c in table.history() if c.get("added_columns")]
    assert evolved == [["sentiment"]], evolved
    return table.read().select(*_OUT_COLS, "sentiment")


ORACLE_CDC_SCHEMA_EVOLUTION = (
    norm_events_cte()
    + f"""
, latest AS (
    SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) AS rn
    FROM norm
)
SELECT conv_id, turn_idx, role, text, tool, ts,
       CASE WHEN seq % 3 = 2
            THEN {_SENTIMENT_SQL.format(x="text")}
       END AS sentiment
FROM latest WHERE rn = 1 AND op <> 'delete'
"""
)


def q_cdc_bucketed_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-4 scale-path compaction under the value hash: MOR
    merges fold through the BUCKETED (bucket-dir zipped, Arrow
    task-local) compaction — forced, since ``auto`` picks global at
    gate scale. Two folds: the first builds the base from winners
    alone; the second zips that base's ``_bucket=k`` dirs with an
    EVOLVED delta (epoch 2 carries ``sentiment``), so ADD COLUMN,
    tombstones and the LWW order all flow through the pandas fold.
    Oracle = the same closed-form whole-log LWW + evolution SQL as
    the COW variant — the fold strategy must be invisible in the
    result."""
    from kahi_spark.sinks.snapshot import SnapshotTable

    e = _epochs(spark, sf_dir)
    table = SnapshotTable(
        spark,
        tempfile.mkdtemp(prefix="kahi_gate_bktfold_"),
        n_buckets=4,
        mode="mor",
        compact_every=100,  # manual folds only
    )
    table.merge(e[0], epoch_id=0)
    table.merge(e[1], epoch_id=1)
    table.compact(strategy="bucketed")
    e2 = e[2].withColumn("sentiment", F.expr(_SENTIMENT_SQL.format(x="text")))
    table.merge(e2, epoch_id=2)
    table.compact(strategy="bucketed")
    folds = [c.get("strategy") for c in table.history() if c["op"] == "compact"]
    assert folds == ["bucketed", "bucketed"], folds
    return table.read().select(*_OUT_COLS, "sentiment")


QUERIES_SINK = {
    "cdc_resume_replay": q_cdc_resume_replay,
    "cdc_schema_evolution": q_cdc_schema_evolution,
    "cdc_bucketed_compaction": q_cdc_bucketed_compaction,
}

ORACLES_SINK = {
    "cdc_resume_replay": ORACLE_CDC_RESUME_REPLAY,
    "cdc_schema_evolution": ORACLE_CDC_SCHEMA_EVOLUTION,
    # fold strategy must not change the result: same closed form
    "cdc_bucketed_compaction": ORACLE_CDC_SCHEMA_EVOLUTION,
}
