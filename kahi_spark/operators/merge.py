"""Change-event reduction and MERGE semantics (SURVEY.md §2.4).

This is the heart of the engine — the Spark re-expression of Kahi's
merge machinery:

* ``normalize_events``   — raw change events → canonical columns
  (reference per-source parsers, ``KahiParser.py:136-206``).
* ``latest_change_per_key`` — last-writer-wins reduction per
  ``(conv_id, turn_idx)`` ordered by ``(ts, seq)``; the window-W4
  "stable turn ordering" rule from BASELINE.json. Optionally salted
  for hot conv_ids (north_rule skew handling).
* ``priority_merge``     — Kahi's per-field source-priority
  coalesce (``join_document``, ``KahiParser.py:334-666``): multiple
  raw feeds describing the same turn converge to ONE canonical
  record, each field taken from the highest-priority source that
  has it.
* ``merge_changes_into_state`` — pure-DataFrame MERGE INTO
  semantics (upsert + delete) used by the snapshot sink; the
  reference analogue is ``insert_one``'s insert-or-``$set`` upsert
  (``KahiDb.py:864-909``).

Everything here is native DataFrame ops — shuffles happen exactly
once per reduction (one hash partition by key), aggregations are
map-side-combinable, and no Python touches the hot path.
"""

from __future__ import annotations

import functools as _functools

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kahi_spark.functions.roles import canonical_role_expr
from kahi_spark.functions.text import clean_text_expr
from kahi_spark.functions.tools import extract_tool_expr
from kahi_spark.schema import KEY_COLS

#: default source priority, highest first. The reference's
#: publication_type merge (``KahiParser.py:366-376``) is an OVERWRITE
#: chain — scielo written first, then scopus/wos/lens each overwrite
#: if present — so the LAST writer (lens) is the effective
#: highest-priority source; this tuple lists that effective priority
#: highest-first. Kept configurable per SURVEY.md §7 "non-standard
#: merge semantics" (other fields use other chains, e.g. abstract
#: ``KahiParser.py:413-425``).
DEFAULT_SOURCE_PRIORITY = ("lens", "wos", "scopus", "scielo", "scholar", "oadoi")


#: columns (re)written by ``normalize_events`` — the reduce-fusion
#: check below must know the normalize NEVER touches the reduction
#: keys or the (ts, seq) replay ordering
_NORMALIZED_COLS = frozenset({"role", "tool", "text"})


def normalize_events(events: DataFrame, use_pandas_cleaner: bool = False) -> DataFrame:
    """Raw change events → canonical event columns.

    Role canonicalization (F11), text cleaning (F7), tool-field
    extraction (J4 analogue) — all JVM-side by default; set
    ``use_pandas_cleaner`` to route text through the Arrow-batched
    pandas UDF instead (same semantics, used to benchmark the two
    paths against each other).

    The returned frame carries a fusion tag: when it flows DIRECTLY
    into ``latest_change_per_key`` (the replay composition
    ``reduce(normalize(ev))``), the reduce rewrites itself to
    reduce-first / normalize-the-winners — see the fusion note there.
    Any intermediate transformation drops the tag and the composition
    runs exactly as written.
    """
    from kahi_spark.functions.text import clean_text_pandas
    from kahi_spark.functions.tools import strip_tool_marker_expr

    stripped = strip_tool_marker_expr("text")
    cleaner: Column = (
        clean_text_pandas(stripped) if use_pandas_cleaner else clean_text_expr(stripped)
    )
    out = events.withColumns(
        {
            "role": canonical_role_expr("role"),
            # tool first (extracted from raw text), then text loses the marker
            "tool": extract_tool_expr("text", "tool"),
            "text": cleaner,
        }
    )
    # fusion tag: the raw parent + the cleaner flavor, consumed (and
    # validated) by latest_change_per_key. A plain instance attribute:
    # every DataFrame transformation returns a NEW object, so the tag
    # cannot leak past `out` itself.
    out._kahi_deferred_normalize = (events, use_pandas_cleaner)
    return out


def _ordering(desc: bool = True) -> list[Column]:
    """Stable replay order: event time, then log position (W4)."""
    cols = [F.col("ts"), F.col("seq")]
    return [c.desc() for c in cols] if desc else [c.asc() for c in cols]


#: hot-key share above which the bounded-at-any-skew ``agg`` shape
#: beats the plain window (measured band: window wins at ≤10% hot,
#: agg wins at 50% hot — scripts/skew_probe.py / BASELINE.md skew
#: table; 0.25 splits the measured regimes)
AUTO_HOT_SHARE = 0.25
#: sample fraction for the auto decision's key-histogram pre-pass —
#: the scan is column-pruned to the key columns and the shuffle is
#: 100× smaller than a full groupBy; a hot key owning ≥25% of a
#: batch is unmissable in a 1% sample of any realistically-sized one
AUTO_SAMPLE_FRACTION = 0.01


def pick_reduce_strategy(
    events: DataFrame,
    key_cols: list[str] | None = None,
    sample_fraction: float = AUTO_SAMPLE_FRACTION,
    hot_share_threshold: float = AUTO_HOT_SHARE,
) -> str:
    """Cheap per-batch window-vs-agg decision (VERDICT r5 #4): sample
    the key histogram and pick ``agg`` when one key holds more than
    ``hot_share_threshold`` of the sampled rows, else ``window``.

    The caller no longer needs to know its skew: at 10^10 events a
    conversation holding 25%+ of a batch makes the window path's hot
    task sort billions of rows, while the agg path bounds per-task
    work by construction; on uniform batches the window path is
    ~1.4× faster (skew_probe measurements). One tiny extra job per
    batch: key-column-pruned scan of a ``sample_fraction`` sample,
    map-side-combined groupBy, two-scalar collect."""
    keys = key_cols or KEY_COLS
    row = (
        events.sample(fraction=sample_fraction, seed=7)
        .select(*keys)
        .groupBy(*keys)
        .count()
        .agg(F.max("count").alias("mx"), F.sum("count").alias("tot"))
        .collect()[0]
    )
    if not row.tot:
        # sample came back empty — a batch this small can't have a
        # wall-dominating hot task; window is the measured default
        return "window"
    return "agg" if row.mx / row.tot >= hot_share_threshold else "window"


def latest_change_per_key(
    events: DataFrame,
    key_cols: list[str] | None = None,
    salt_buckets: int = 0,
    strategy: str = "window",
) -> DataFrame:
    """Reduce a change batch to its final change per key (LWW).

    Within one batch only the LAST change (by ``ts, seq``) per
    ``(conv_id, turn_idx)`` matters for the final state — a delete
    followed by a re-insert survives as the insert, an insert
    followed by updates survives as the last update.

    ``strategy``:

    * ``"window"`` (default) — ``row_number() over (partition by key
      order by ts desc, seq desc) = 1``: one shuffle on the key, one
      per-partition sort. Fastest at moderate skew (measured: a
      single key holding 10% — even 50% — of a 24M-event log costs
      the window path nothing visible at local[32]; the tail task's
      in-memory sort is cheap next to the shuffle).
    * ``"agg"`` — ``max_by(struct(values), struct(ts, seq))`` with
      map-side PARTIAL aggregation: a hot key collapses to ONE row
      per map partition BEFORE the shuffle, so per-task work is
      bounded by construction at ANY skew — at 10^10 events with
      10% on one conversation, the window path's hot task sorts
      10^9 rows (spilling, wall-dominating) while this path shuffles
      ≤ n_map_partitions rows for that key. Measured at 24M/local[32]:
      fastest under extreme skew (3.5 s vs 4.2 s window at a 50%-hot
      key), ~1.4× slower than window on uniform input (high
      distinct-key cardinality pays the aggregation-merge overhead).
      The production default for genuinely skewed logs; ties on
      (ts, seq) pick an arbitrary winner exactly like row_number.
    * ``"auto"`` — decide per batch via ``pick_reduce_strategy``
      (sampled key histogram: hot share ≥ 0.25 → agg, else window);
      matches the best manual choice at uniform / 10% / 50% hot in
      scripts/skew_probe.py.

    ``salt_buckets > 0`` (window strategy only) splits hot keys into
    N sub-partitions first (pre-reduce per salt, then re-reduce
    unsalted) — the classic two-phase salted reduction. MEASURED
    HONESTLY (scripts/skew_probe.py, 24M events, local[32]): the
    extra full shuffle costs MORE than the skewed sort saves at this
    scale — 0.5× at a 10%-hot key, 0.7× at a 50%-hot key — so it
    stays opt-in; prefer ``strategy="agg"`` for bounded-task skew
    handling (same boundedness, no second shuffle). The salted path
    remains correct (parity-tested) for regimes where a single
    partition cannot even hold the hot key's rows.
    """
    keys = key_cols or KEY_COLS
    # reduce↔normalize fusion (round 7, guide §2.2 "shuffle fewer
    # bytes / do less work before the shuffle"): when the input is the
    # DIRECT output of normalize_events, rewrite reduce(normalize(ev))
    # → normalize(reduce(ev)). Result-identical because the winner per
    # key depends ONLY on (key_cols, ts, seq) — none of which
    # normalize touches (checked below, not assumed) — and the
    # normalize columns are row-wise functions of the winning row.
    # Catalyst has no rule to defer expensive projections past a
    # Window/aggregate, so at 24M events the regex cleaner ran on
    # every raw event (measured: normalize was >50% of the n32 replay
    # wall) instead of on the ~half that survive LWW.
    defer = getattr(events, "_kahi_deferred_normalize", None)
    if defer is not None and not ({*keys, "ts", "seq"} & _NORMALIZED_COLS):
        raw, use_pandas = defer
        reduced = latest_change_per_key(
            raw, key_cols=keys, salt_buckets=salt_buckets, strategy=strategy
        )
        return normalize_events(reduced, use_pandas_cleaner=use_pandas)
    if strategy == "auto":
        strategy = pick_reduce_strategy(events, keys)
    if strategy == "agg":
        vals = [c for c in events.columns if c not in keys]
        ordk = F.struct(
            F.coalesce(F.col("ts"), F.to_timestamp(F.lit(_TS_FLOOR))).alias("t"),
            F.col("seq").alias("s"),
        )
        won = events.groupBy(*keys).agg(
            F.max_by(F.struct(*[F.col(c) for c in vals]), ordk).alias("_w")
        )
        # restore the original column order (callers and checksums
        # are column-order sensitive)
        out = won.select(
            *[
                F.col(f"_w.{c}").alias(c) if c in vals else F.col(c)
                for c in events.columns
            ]
        )
        return out
    if strategy != "window":
        raise ValueError(f"unknown reduce strategy {strategy!r}")
    if salt_buckets > 0:
        salted = events.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("seq")), F.lit(salt_buckets))
        )
        w1 = Window.partitionBy(*keys, "_salt").orderBy(*_ordering(desc=True))
        survivors = (
            salted.withColumn("_rn", F.row_number().over(w1))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_salt")
        )
        events = survivors
    w = Window.partitionBy(*keys).orderBy(*_ordering(desc=True))
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def priority_merge(
    events: DataFrame,
    value_cols: list[str],
    priority: tuple[str, ...] = DEFAULT_SOURCE_PRIORITY,
    key_cols: list[str] | None = None,
    pre_reduced: bool = False,
    reduce_strategy: str = "window",
) -> DataFrame:
    """Multi-source convergence: one canonical record per key, each
    field from the highest-priority source that provides it.

    Spark re-expression of ``join_document`` (``KahiParser.py:
    334-666``): instead of per-field Python overwrite chains, a
    single ``groupBy(key)`` with, per field,
    ``coalesce(max(when(source=p0, v)), max(when(source=p1, v)), …)``
    — one shuffle, map-side partial aggregation, fully
    Catalyst-optimized. Sources not in ``priority`` rank last (by
    name, deterministic); within one source the latest ``(ts, seq)``
    wins first (A1 + W4 composed).

    ``pre_reduced``: the caller already reduced ``events`` to ≤1 row
    per (key, source) — skip the internal per-source LWW pass. Lets
    callers reduce RAW events first and normalize only the winners
    (the reduce-before-normalize transform: the per-source winner
    depends only on (ts, seq), so reducing first is result-identical
    while per-row value work shrinks to key-cardinality).
    """
    keys = key_cols or KEY_COLS
    # Within each (key, source), keep the latest version first.
    per_source = (
        events
        if pre_reduced
        else latest_change_per_key(
            events, key_cols=keys + ["source"], strategy=reduce_strategy
        )
    )
    aggs = list(_priority_pick_aggs(tuple(value_cols), tuple(priority)))
    return per_source.groupBy(*keys).agg(*aggs)


@_functools.lru_cache(maxsize=32)
def _priority_pick_aggs(value_cols: tuple[str, ...], priority: tuple[str, ...]) -> tuple:
    """The fixed per-field aggregate Columns of ``priority_merge``,
    built once per (value_cols, priority) per process (round 7: the
    trees reference only constant column names, and rebuilding ~30
    aggregate chains cost ~0.2 s of py4j round-trips per call)."""

    def pick(col: str) -> Column:
        tiers = [
            F.max(F.when(F.col("source") == p, F.col(col))) for p in priority
        ]
        # unknown sources: deterministic fallback — the value from the
        # lexicographically-smallest unknown source that HAS the field
        # (struct min is lexicographic: source name first, then value
        # for same-source ties).
        known = F.lit(False)
        for p in priority:
            known = known | (F.col("source") == p)
        unknown_pick = F.min(
            F.when(~known & F.col(col).isNotNull(), F.struct(F.col("source"), F.col(col).alias("v")))
        ).getField("v")
        tiers.append(unknown_pick)
        return F.coalesce(*tiers).alias(col)

    aggs = [pick(c) for c in value_cols]
    # lineage: which feeds contributed (Kahi's source_checked,
    # json_schema.txt:10-13) and the latest event time.
    aggs.append(F.array_sort(F.collect_set("source")).alias("sources"))
    aggs.append(F.max("ts").alias("ts"))
    return tuple(aggs)


#: system columns carried inside the stored state (never exposed by
#: SnapshotTable.read()): the last writer's log position and a
#: delete tombstone. Tombstones make out-of-order CDC correct: a
#: delete in epoch N must not be resurrected by an older insert
#: arriving in epoch N+1 (events are late/out-of-order by design —
#: the reference tolerates this because Mongo upserts are keyed,
#: SURVEY.md §2.8; we tolerate it by versioned conditional MERGE).
SYS_SEQ = "_seq"
SYS_DELETED = "_deleted"
_TS_FLOOR = "1970-01-01 00:00:00"


def _newer_than(new_ts: Column, new_seq: Column, old_ts: Column, old_seq: Column) -> Column:
    """LWW ordering: (ts, seq) lexicographic, NULL ts = epoch floor."""
    nts = F.coalesce(new_ts, F.to_timestamp(F.lit(_TS_FLOOR)))
    ots = F.coalesce(old_ts, F.to_timestamp(F.lit(_TS_FLOOR)))
    return (nts > ots) | ((nts == ots) & (new_seq > old_seq))


#: Field-level merge policies (A9 — the reference's "mod" patch
#: computation, KahiDb.py:571-622 (authors), :650-732 (institutions),
#: :760-860 (sources)):
#:   lww        — newer (ts, seq) wins wholesale (default; $set)
#:   fill_empty — target keeps its value, change fills NULLs only
#:                (Kahi: "if reg[k] and not stored[k]")
#:   union      — array set-union, order-normalized
#:                (Kahi: aliases/keywords/ids/serials dedup append)
#:   greatest   — max of both (Kahi: max source_checked date,
#:                KahiDb.py:850-858)
#: union/greatest are COMMUTATIVE (replay order can't change the
#: result); fill_empty is only IDEMPOTENT — first-non-null-wins
#: depends on batch arrival order across batches, so replaying the
#: SAME epoch is safe (the ledger guarantees that) but reordering
#: different epochs can change which batch filled a NULL first.
MERGE_POLICIES = ("lww", "fill_empty", "union", "greatest")


def merge_changes_into_state(
    state: DataFrame,
    changes: DataFrame,
    key_cols: list[str] | None = None,
    value_cols: list[str] | None = None,
    policies: dict[str, str] | None = None,
) -> DataFrame:
    """Versioned MERGE INTO semantics over plain DataFrames.

    ``state`` carries system columns ``_seq`` / ``_deleted``;
    ``changes`` must already be reduced to ≤1 row per key (use
    ``latest_change_per_key``) and carry ``op``/``seq``/``ts``.

    WHEN MATCHED AND change is newer AND op='delete' → tombstone
    WHEN MATCHED AND change is newer                 → UPDATE SET *
    WHEN MATCHED AND change is older                 → keep target
    WHEN NOT MATCHED                                 → INSERT *
                                (deletes insert as tombstones)

    Implemented as one full-outer join on the key — the plan an
    Iceberg copy-on-write MERGE produces. With both sides bucketed
    on ``conv_id`` this is a storage-partitioned join on a real
    cluster; locally it's sort-merge with AQE skew splitting.
    """
    keys = key_cols or KEY_COLS
    vals = value_cols or [
        c for c in state.columns if c not in keys + [SYS_SEQ, SYS_DELETED]
    ]
    ch = changes.select(
        *keys,
        F.col("op").alias("_op"),
        F.col("seq").alias("_new_seq"),
        *[F.col(c).alias(f"_new_{c}") for c in vals if c in changes.columns],
    )
    joined = state.join(ch, on=keys, how="full_outer")
    has_change = F.col("_op").isNotNull()
    is_new_row = F.col(SYS_SEQ).isNull()
    new_ts = F.col("_new_ts") if "_new_ts" in ch.columns else F.lit(None).cast("timestamp")
    wins = has_change & (
        is_new_row | _newer_than(new_ts, F.col("_new_seq"), F.col("ts"), F.col(SYS_SEQ))
    )
    pol = policies or {}
    out_cols: list[Column] = [F.col(k) for k in keys]
    for c in vals:
        new_c = f"_new_{c}"
        if new_c not in joined.columns:
            out_cols.append(F.col(c))
            continue
        p = pol.get(c, "lww")
        if p == "lww":
            merged = F.when(wins, F.col(new_c)).otherwise(F.col(c))
        elif p == "fill_empty":
            merged = F.when(has_change, F.coalesce(F.col(c), F.col(new_c))).otherwise(
                F.col(c)
            )
        elif p == "union":
            merged = F.when(
                has_change,
                F.array_sort(
                    F.array_distinct(
                        F.array_union(
                            F.coalesce(F.col(c), F.array()),
                            F.coalesce(F.col(new_c), F.array()),
                        )
                    )
                ),
            ).otherwise(F.col(c))
        elif p == "greatest":
            merged = F.when(has_change, F.greatest(F.col(c), F.col(new_c))).otherwise(
                F.col(c)
            )
        else:
            raise ValueError(f"unknown merge policy {p!r} for column {c!r}")
        out_cols.append(merged.alias(c))
    out_cols.append(
        F.when(wins, F.col("_new_seq")).otherwise(F.col(SYS_SEQ)).alias(SYS_SEQ)
    )
    out_cols.append(
        F.when(wins, F.col("_op") == F.lit("delete"))
        .otherwise(F.coalesce(F.col(SYS_DELETED), F.lit(False)))
        .alias(SYS_DELETED)
    )
    return joined.select(*out_cols)


def state_from_reduced(reduced: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """Bootstrap internal state (with system columns) from a reduced
    change batch — deletes become tombstones."""
    keys = key_cols or KEY_COLS
    vals = [c for c in reduced.columns if c not in keys + ["op", "seq", "source"]]
    return reduced.select(
        *keys,
        *vals,
        F.col("seq").alias(SYS_SEQ),
        (F.col("op") == "delete").alias(SYS_DELETED),
    )


def reduce_events_to_state(
    events: DataFrame,
    key_cols: list[str] | None = None,
    value_cols: list[str] | None = None,
    salt_buckets: int = 0,
    strategy: str = "window",
) -> DataFrame:
    """Full replay: change log → final table state in one pass.

    LWW per key, then drop keys whose final op is delete. This is
    the batch "reference reducer" used for parity checks and the
    fast path for initial table bootstrap (one shuffle total).
    """
    keys = key_cols or KEY_COLS
    last = latest_change_per_key(
        events, key_cols=keys, salt_buckets=salt_buckets, strategy=strategy
    )
    live = last.filter(F.col("op") != "delete")
    vals = value_cols or [
        c for c in live.columns if c not in keys and c not in ("op", "seq", "source")
    ]
    return live.select(*keys, *vals)
