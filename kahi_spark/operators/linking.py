"""Entity-linking lookup joins (SURVEY.md J8-J10 — the reference's
probe-by-external-id-then-fallback-by-alias chains:
authors ``KahiDb.py:554-567``, institutions ``:626-646``,
sources/serials ``:753-758``).

``staged_lookup`` generalizes the pattern: an ordered list of key
stages; each stage resolves only the probes every earlier stage
missed (anti-join), via a broadcast-hash join against the dimension's
key projection; within a stage the first hit wins (lowest dim id —
the reference's ``find_one`` takes Mongo natural order; ours is
deterministic). One broadcast join + one anti-join per stage, no
shuffles of the probe side beyond the final union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def staged_lookup(
    stages: list[tuple[DataFrame, DataFrame]],
    probe_id: str = "probe_id",
    dim_id: str = "dim_id",
    key: str = "key",
    single_pass: bool = True,
) -> DataFrame:
    """``stages``: ordered [(probe_keys, dim_keys)] where probe_keys
    has (probe_id, key) — one row per candidate key (explode array
    keys upstream) — and dim_keys has (key, dim_id).

    Returns (probe_id, dim_id, stage): each probe resolved by the
    FIRST stage with a hit, first hit within the stage (lowest
    dim_id, then key).

    ``single_pass`` (default): all stages union into ONE broadcast
    join keyed on (stage, key) and ONE window picks min (stage,
    dim_id, key) per probe — the probe side is scanned once and
    shuffled once regardless of stage count. The anti-join cascade
    (``single_pass=False``) scans/filters the probe side per stage —
    at K stages over a 100-TB probe set that is K extra passes; it
    remains available for stages whose probe keys are expensive to
    compute up front (the reference's fallback-only semantics,
    ``KahiDb.py:554-567``). Both shapes produce identical output
    (first stage with a hit ≡ min stage over the unioned hits).
    """
    assert stages, "staged_lookup needs at least one stage"
    if single_pass:
        probes_all: DataFrame | None = None
        dims_all: DataFrame | None = None
        for i, (probe_keys, dim_keys) in enumerate(stages):
            p = probe_keys.select(probe_id, key, F.lit(i).alias("stage"))
            d = dim_keys.select(key, dim_id, F.lit(i).alias("stage"))
            probes_all = p if probes_all is None else probes_all.unionByName(p)
            dims_all = d if dims_all is None else dims_all.unionByName(d)
        hits = probes_all.join(F.broadcast(dims_all), on=["stage", key], how="inner")
        w = Window.partitionBy(probe_id).orderBy(
            F.asc("stage"), F.asc(dim_id), F.asc(key)
        )
        return (
            hits.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(probe_id, dim_id, "stage")
        )
    resolved: DataFrame | None = None
    for i, (probe_keys, dim_keys) in enumerate(stages):
        probes = probe_keys
        if resolved is not None:
            probes = probes.join(
                resolved.select(probe_id), on=probe_id, how="left_anti"
            )
        hits = probes.join(F.broadcast(dim_keys), on=key, how="inner")
        w = Window.partitionBy(probe_id).orderBy(F.asc(dim_id), F.asc(key))
        first = (
            hits.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(probe_id, dim_id, F.lit(i).alias("stage"))
        )
        resolved = first if resolved is None else resolved.unionByName(first)
    return resolved


def explode_keys(
    df: DataFrame, id_col: str, array_col: str, probe_id: str = "probe_id", key: str = "key"
) -> DataFrame:
    """(id, array<key>) → one row per (id, key), nulls/blanks dropped."""
    return (
        df.select(F.col(id_col).alias(probe_id), F.explode(F.col(array_col)).alias(key))
        .filter(F.col(key).isNotNull() & (F.trim(F.col(key)) != ""))
        .distinct()
    )
