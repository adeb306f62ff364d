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
) -> DataFrame:
    """``stages``: ordered [(probe_keys, dim_keys)] where probe_keys
    has (probe_id, key) — one row per candidate key (explode array
    keys upstream) — and dim_keys has (key, dim_id).

    Returns (probe_id, dim_id, stage): each probe resolved by the
    FIRST stage with a hit, first hit within the stage.
    """
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
    assert resolved is not None, "staged_lookup needs at least one stage"
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
