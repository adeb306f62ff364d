"""Positional list alignment + complement (SURVEY.md A7/W2 — the
reference's author-list merge ``join_authors_institutions``,
``KahiParser.py:740-905``: pick a driver source by priority, iterate
its list positionally — "join authors assumes authors are reported in
the same order", ``KahiParser.py:27`` — and complement each element
from the other sources' lists at the same position).

Spark shape: ``posexplode`` the driver source's array, left-join the
other sources' exploded arrays on ``(key, pos)``, coalesce per field,
re-assemble ordered with ``array_agg`` over a sorted struct. Two
shuffles total (the join and the re-collect), both on the record key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def align_positional_lists(
    df: DataFrame,
    key_cols: list[str],
    source_col: str,
    list_col: str,
    element_fields: list[str],
    priority: tuple[str, ...],
) -> DataFrame:
    """``df``: one row per (key, source) with ``list_col`` an
    array<struct<element_fields…>>. Returns one row per key with a
    single merged ordered list: the highest-priority source present
    drives length and order; each element's NULL fields fill from the
    same position in lower-priority sources.
    """
    rank = F.coalesce(
        *[
            F.when(F.col(source_col) == s, F.lit(i))
            for i, s in enumerate(priority)
        ],
        F.lit(len(priority)),
    )
    ranked = df.withColumn("_rank", rank)
    # the driver source per key = lowest rank present, ties broken
    # deterministically by source name — two sources sharing a rank
    # (e.g. both absent from `priority`) must yield ONE driver, not
    # two posexploded copies of every position (round-5 review)
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy(F.asc("_rank"), F.asc(source_col))
    ranked = ranked.withColumn("_drn", F.row_number().over(w))
    driver = ranked.filter(F.col("_drn") == 1)
    others = ranked.filter(F.col("_drn") > 1)

    d = driver.select(
        *key_cols, F.posexplode(F.col(list_col)).alias("pos", "_el")
    ).select(*key_cols, "pos", *[F.col(f"_el.{f}").alias(f) for f in element_fields])
    o = others.select(
        *key_cols, "_rank", source_col, F.posexplode(F.col(list_col)).alias("pos", "_el")
    ).select(
        *key_cols,
        "_rank",
        source_col,
        "pos",
        *[F.col(f"_el.{f}").alias(f"_o_{f}") for f in element_fields],
    )
    # best complement per (key, pos): priority order among the
    # others, same-rank ties again broken by source name
    from pyspark.sql import Window as W2

    w2 = W2.partitionBy(*key_cols, "pos").orderBy(F.asc("_rank"), F.asc(source_col))
    best_o = (
        o.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_rank", source_col)
    )
    joined = d.join(best_o, on=[*key_cols, "pos"], how="left")
    merged_el = F.struct(
        *[F.coalesce(F.col(f), F.col(f"_o_{f}")).alias(f) for f in element_fields]
    )
    per_pos = joined.select(*key_cols, "pos", merged_el.alias("el"))
    return (
        per_pos.groupBy(*key_cols)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "el"))),
                lambda x: x["el"],
            ).alias(list_col)
        )
    )
