"""Blocked fuzzy join + complement merge (SURVEY.md J3-J7, A9):
adversarial near-duplicates per FIXTURES.md §4."""

from __future__ import annotations

from pyspark.sql import functions as F

from kahi_spark.operators.fuzzy import (
    bigram_jaccard_expr,
    char_bigrams_expr,
    complement_merge,
    fuzzy_join,
    token_set_ratio_pandas,
)


def _fixture(spark):
    # candidate corpus (FIXTURES.md §4: accents/case/markup variants)
    cands = spark.createDataFrame(
        [
            (100, "statistical learning with sparsity", "jstat", 2015),
            (101, "deep residual learning for image recognition", "cvpr", 2016),
            (102, "a completely different unrelated title", "jstat", 2015),
        ],
        ["cand_id", "title", "journal", "year"],
    )
    probes = spark.createDataFrame(
        [
            # near-dup: case + markup variant, same block
            (1, "Statistical Learning with  Sparsity", "jstat", 2015),
            # true negative: same block, different title
            (2, "graphical models and inference", "jstat", 2015),
            # block mismatch: same title, wrong year → must NOT match
            (3, "statistical learning with sparsity", "jstat", 2016),
        ],
        ["probe_id", "title", "journal", "year"],
    )
    return probes, cands


def test_blocked_fuzzy_join_first_match(spark):
    probes, cands = _fixture(spark)
    p = probes.select(
        "probe_id", "journal", "year", char_bigrams_expr(F.col("title")).alias("bg_p")
    )
    c = cands.select(
        "cand_id", "journal", "year", char_bigrams_expr(F.col("title")).alias("bg_c")
    )
    out = fuzzy_join(
        p, c, ["journal", "year"], "probe_id", "cand_id",
        bigram_jaccard_expr(F.col("bg_p"), F.col("bg_c")), threshold=0.8,
    )
    got = {r.probe_id: r.cand_id for r in out.collect()}
    assert got == {1: 100}  # near-dup matched; negative + block-miss absent


def test_token_set_ratio_pandas(spark):
    df = spark.createDataFrame(
        [
            ("the quick brown fox", "quick brown fox the"),  # same token set
            ("alpha beta", "gamma delta"),
            ("alpha beta gamma", "alpha beta"),
        ],
        ["a", "b"],
    )
    got = [r[0] for r in df.select(token_set_ratio_pandas("a", "b")).collect()]
    assert got[0] == 1.0  # order-insensitive
    assert got[1] < 0.5
    assert 0.5 < got[2] < 1.0


def test_complement_merge_fill_and_union(spark):
    merged = spark.createDataFrame(
        [("d1", None, ["a"]), ("d2", "keep", ["x"])],
        ["id", "abstract", "keywords"],
    )
    fill = spark.createDataFrame(
        [("d1", "from-match", ["a", "b"]), ("d2", "ignored", ["y"])],
        ["id", "abstract", "keywords"],
    )
    out = complement_merge(
        merged, fill, key=["id"], fill_cols=["abstract"], union_cols=["keywords"]
    )
    got = {r.id: (r.abstract, sorted(r.keywords)) for r in out.collect()}
    assert got == {"d1": ("from-match", ["a", "b"]), "d2": ("keep", ["x", "y"])}
