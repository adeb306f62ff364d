"""Similarity search over embedding columns (array<float>).

* ``knn_bruteforce`` — exact cosine top-k: probes broadcast against
  the corpus, dot products via ``zip_with``/``aggregate`` (JVM
  higher-order functions — whole-stage codegen, no UDF, no Python).
  The baseline and the verifier for approximate variants.
* ``knn_lsh`` — random-hyperplane LSH bucketing: corpus hashed once,
  probes join only their bucket (multi-probe over ``n_tables``
  tables). The scale path: at 10^9 vectors the bucket join touches
  a tiny corpus slice per probe instead of all of it.
* ``cosine_pairs`` — all-pairs cosine ≥ threshold over a bounded set
  (embedding near-dup dedup).

Scores are computed in double and rounded to 6 places so results are
engine-portable; ties break by neighbor id (deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _with_norm(df: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    v = _as_double(F.col(vec_col))
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        v.alias(f"{prefix}_v"),
        F.sqrt(_dot(v, v)).alias(f"{prefix}_nrm"),
    )


def knn_bruteforce(
    probes: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of each probe against the corpus
    (excluding self). Probes are broadcast — the corpus never
    shuffles; ranking is a per-probe window."""
    p = _with_norm(probes, id_col, vec_col, "probe")
    c = _with_norm(corpus, id_col, vec_col, "neighbor")
    scored = c.join(F.broadcast(p), F.col("probe_id") != F.col("neighbor_id")).select(
        "probe_id",
        "neighbor_id",
        F.round(
            _dot(F.col("probe_v"), F.col("neighbor_v"))
            / (F.col("probe_nrm") * F.col("neighbor_nrm")),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "rank", "score")
    )


def knn_lsh(
    probes: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH.

    Each table hashes a vector to an ``n_planes``-bit bucket (sign of
    dot with a random hyperplane). A probe only scores corpus vectors
    sharing a bucket in ANY table. Recall grows with ``n_tables``;
    cost per probe shrinks ~2^n_planes-fold vs brute force.
    """
    import random

    rnd = random.Random(seed)
    # deterministic hyperplanes as array literals (broadcast by value)
    tables = [
        [[rnd.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]
        for _ in range(n_tables)
    ]

    def bucket_expr(vcol, t: int):
        bits = [
            F.when(
                _dot(
                    vcol,
                    F.array(*[F.lit(x) for x in tables[t][pl]]),
                )
                > 0,
                F.lit(1 << pl),
            ).otherwise(F.lit(0))
            for pl in range(n_planes)
        ]
        out = F.lit(0)
        for b in bits:
            out = out + b
        return out

    def bucketed(df: DataFrame, prefix: str) -> DataFrame:
        base = _with_norm(df, id_col, vec_col, prefix)
        return base.select(
            "*",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("table_idx"),
                            bucket_expr(F.col(f"{prefix}_v"), t).alias("bucket"),
                        )
                        for t in range(n_tables)
                    ]
                )
            ).alias("b"),
        ).select("*", "b.table_idx", "b.bucket").drop("b")

    p = bucketed(probes, "probe")
    c = bucketed(corpus, "neighbor")
    cand = (
        c.join(
            F.broadcast(p),
            (F.col("probe_id") != F.col("neighbor_id"))
            & (p.table_idx == c.table_idx)
            & (p.bucket == c.bucket),
        )
        .select("probe_id", "probe_v", "probe_nrm", "neighbor_id", "neighbor_v", "neighbor_nrm")
        .dropDuplicates(["probe_id", "neighbor_id"])
    )
    scored = cand.select(
        "probe_id",
        "neighbor_id",
        F.round(
            _dot(F.col("probe_v"), F.col("neighbor_v"))
            / (F.col("probe_nrm") * F.col("neighbor_nrm")),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "rank", "score")
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine ≥ threshold (id_a < id_b). Quadratic — callers
    bound the input or pre-block with ``knn_lsh`` buckets."""
    a = _with_norm(df, id_col, vec_col, "l").withColumnRenamed("l_id", "id_a")
    b = _with_norm(df, id_col, vec_col, "r").withColumnRenamed("r_id", "id_b")
    score = F.round(
        _dot(F.col("l_v"), F.col("r_v")) / (F.col("l_nrm") * F.col("r_nrm")), 6
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", score.alias("score"))
        .filter(F.col("score") >= threshold)
    )
