"""Keyless-event resolution (SURVEY.md EP3 / §7.8 — the reference's
similarity-driven ingest: records with no DOI are matched against the
preloaded candidate lists by fuzzy title+journal+year scoring,
``KahiDb.py:161-242, 385-450``).

CDC reframing: change events sometimes arrive with a NULL ``conv_id``
(a feed that lost the key). Instead of the reference's O(N·M) driver-
side loop, the resolver is a blocked fuzzy join against the CURRENT
TABLE STATE:

1. block CONJUNCTIVELY on ``turn_idx`` (the reference blocks on exact
   year, ``KahiDb.py:84-86``) AND a text-length bucket — ``turn_idx``
   alone is a ~25-value key, so at 10^10 rows each probe would compare
   against ~4% of the table (O(N·M), the flaw the reference has);
   the length bucket multiplies key cardinality by ~|len|/W while
   keeping recall: a probe explodes to buckets {b-1, b, b+1}, so any
   candidate within ``W`` chars of the probe's length still collides,
   and a bigram-Jaccard ≥ mid match implies near-equal bigram-set
   sizes (hence lengths within ~W for the thresholds used);
2. score cleaned text by char-bigram Jaccard (JVM expression);
3. staged cascade: a high bare-text threshold OR a medium threshold
   AND matching role (the reference's title≥90 OR (title≥80 AND
   journal>90 AND year equal) cascade, ``KahiDb.py:49-87``);
4. W1 pick-first per event (best score, lowest conv_id);
5. matched events adopt the matched ``conv_id``; unmatched events
   mint a deterministic surrogate key (``u<seq>``) so they remain
   addressable (and can be re-linked later — same shape as Kahi
   inserting a brand-new record when no candidate matches).

Consumption-marking falls out of MERGE, as SURVEY.md §3 EP3 notes:
once a keyless event lands under a conv_id, the next batch sees it
in state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kahi_spark.operators.fuzzy import bigram_jaccard_expr, char_bigrams_expr


#: length-bucket width for the conjunctive block key. A probe joins
#: buckets {b-1, b, b+1}, so matches with |len(p)-len(c)| ≤ W always
#: collide; wider gaps can't score ≥ the cascade thresholds anyway
#: (bigram Jaccard ≥ 0.65 bounds the bigram-set size ratio ≥ 0.65,
#: and cleaned near-dup texts have near-equal lengths).
LEN_BUCKET_W = 16


def resolve_keyless_events(
    events: DataFrame,
    state: DataFrame,
    high: float = 0.85,
    mid: float = 0.65,
) -> DataFrame:
    """``events``: normalized change events, possibly with NULL
    conv_id. ``state``: current table rows (conv_id, turn_idx, role,
    text, …). Returns events with conv_id resolved everywhere."""
    keyed = events.filter(F.col("conv_id").isNotNull())
    keyless = events.filter(F.col("conv_id").isNull())

    lb = (F.length(F.col("text")) / LEN_BUCKET_W).cast("int")
    probes = keyless.select(
        F.col("seq").alias("_p_seq"),
        F.col("turn_idx"),
        F.col("role").alias("_p_role"),
        char_bigrams_expr(F.col("text")).alias("_p_bg"),
        # explode to adjacent buckets so the equi-join (hash-keyed on
        # BOTH block columns) keeps recall across bucket boundaries
        F.explode(F.array(lb - 1, lb, lb + 1)).alias("_lb"),
    )
    cands = state.select(
        F.col("conv_id").alias("_c_conv"),
        F.col("turn_idx"),
        F.col("role").alias("_c_role"),
        char_bigrams_expr(F.col("text")).alias("_c_bg"),
        lb.alias("_lb"),
    )
    score = bigram_jaccard_expr(F.col("_p_bg"), F.col("_c_bg"))
    scored = (
        probes.join(cands, on=["turn_idx", "_lb"], how="inner")  # conjunctive block
        .withColumn("_score", score)
        .filter(
            (F.col("_score") >= high)
            | ((F.col("_score") >= mid) & (F.col("_p_role") == F.col("_c_role")))
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("_p_seq").orderBy(F.desc("_score"), F.asc("_c_conv"))
    best = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col("_p_seq").alias("seq"), F.col("_c_conv").alias("_resolved"))
    )
    resolved = (
        keyless.join(best, on="seq", how="left")
        .withColumn(
            "conv_id",
            F.coalesce(F.col("_resolved"), F.concat(F.lit("u"), F.col("seq"))),
        )
        .drop("_resolved")
    )
    return keyed.unionByName(resolved.select(*keyed.columns))
