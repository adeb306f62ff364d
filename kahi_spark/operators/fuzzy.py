"""Blocked fuzzy joins (SURVEY.md J3-J7 — the reference's similarity
machinery: ``colav_similarity`` KahiDb.py:23-102, candidate loops
KahiDb.py:385-450, author complement KahiParser.py:668-738).

The reference scores one record against an in-memory candidate list
with thread/process fanout — O(N·M) and single-node. The Spark
re-expression:

1. **Blocking** — an equi-join on cheap block keys (year, language,
   soundex of the first token, …) so the cross product never
   materializes. This is the plan-shape optimization Catalyst can't
   invent (SURVEY.md §4 "custom work").
2. **Scoring** — either the JVM-side character-bigram Jaccard
   (``bigram_jaccard_expr``, pure higher-order functions, exactly
   reproducible in SQL oracles), or an Arrow-batched pandas UDF
   (``token_set_ratio_pandas``) when Python-only scoring is needed.
3. **Pick-first** — W1 first-match-wins: ``row_number() over
   (partition by probe order by score desc, candidate id)`` = 1,
   replacing the reference's ``results.index(True)``
   (KahiDb.py:389-390).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


#: DuckDB mirror of ``char_bigrams_expr`` (``{x}`` = text expr) —
#: the ONE template every oracle formats (round-5 review: one copy
#: repo-wide, like ``dedup.SHINGLES_SQL``)
#: strings shorter than a bigram (incl. '' / NULL) yield the EMPTY
#: set on both engines — see ``char_bigrams_expr``
BIGRAMS_SQL = (
    "CASE WHEN length({x}) >= 2 THEN "
    "list_distinct([substr(lower({x}), i, 2) "
    "for i in range(1, length({x}))]) "
    "ELSE []::VARCHAR[] END"
)


def char_bigrams_expr(col: Column | str) -> Column:
    """Distinct character bigrams of the lowercased string (JVM).

    The lowered string is bound ONCE as a lambda variable (via a
    1-element ``transform``) before the per-index inner transform —
    referencing ``lower(col)`` directly inside the inner lambda would
    re-lowercase the whole string per bigram, the O(len²)-per-doc
    CollapseProject pitfall (CLAUDE.md; measured 2-4× extraction cost
    at 100k docs in ``operators/keyless.py``).

    Strings shorter than a bigram (incl. '' / NULL) yield the EMPTY
    set — the old floor gave them [''] / [NULL] phantom features
    that scored jaccard 1.0 against each other (round-5 review;
    ``BIGRAMS_SQL`` mirrors the guard)."""
    s = F.lower(F.col(col) if isinstance(col, str) else col)

    def bigrams(lc: Column) -> Column:
        idx = F.sequence(F.lit(1), F.greatest(F.length(lc) - 1, F.lit(1)))
        grams = F.array_distinct(F.transform(idx, lambda i: lc.substr(i, F.lit(2))))
        return F.when(F.length(lc) >= 2, grams).otherwise(
            F.array().cast("array<string>")
        )

    return F.transform(F.array(s), bigrams).getItem(0)


def bigram_jaccard_expr(a: Column, b: Column) -> Column:
    """Jaccard over distinct char bigrams — integer set sizes and one
    double division, so bit-identical across engines (used by the
    DuckDB oracles). Rounded to 6. Two EMPTY sets score NULL (no
    match; DuckDB's x/0 is NULL, ANSI Spark would throw)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.when(union > 0, F.round(inter.cast("double") / union, 6))


def _partial_ratio_py(x: str | None, y: str | None) -> float | None:
    """fuzz.partial_ratio analogue (reference ``KahiDb.py:49-78``,
    ``Scopus.py:268-287``): best SequenceMatcher ratio of the SHORTER
    string against same-length windows of the longer, windows chosen
    from the matching-block alignments (the classic fuzzywuzzy
    algorithm). Substring-alignment scoring matters exactly for
    short-vs-long comparisons (corresponding-author J6: a lone name
    probed against a 'Correspondence Address' blob)."""
    from difflib import SequenceMatcher

    if x is None or y is None:
        return None
    s, longer = (x, y) if len(x) <= len(y) else (y, x)
    s, longer = s.lower(), longer.lower()
    if not s:
        return 0.0
    if s == longer:
        return 1.0
    best = 0.0
    m = SequenceMatcher(None, s, longer, autojunk=False)
    for i, j, _n in m.get_matching_blocks():
        start = max(0, j - i)
        window = longer[start : start + len(s)]
        r = SequenceMatcher(None, s, window, autojunk=False).ratio()
        if r > best:
            best = r
    return best


@pandas_udf(T.DoubleType())
def partial_ratio_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched substring-alignment scorer in [0, 1]."""
    return pd.Series(
        [_partial_ratio_py(x, y) for x, y in zip(a, b)], dtype="float64"
    )


@pandas_udf(T.DoubleType())
def partial_token_set_ratio_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """fuzz.partial_token_set_ratio analogue: partial_ratio over the
    sorted-distinct-token renderings (tolerates both word reorder AND
    one side being a fragment of the other — the loosest stage of the
    reference's cascade, ``Scopus.py:268-287``)."""

    def norm(s):
        return " ".join(sorted(set(str(s).lower().split())))

    def score(x, y):
        if x is None or y is None:
            return None
        return _partial_ratio_py(norm(x), norm(y))

    return pd.Series([score(x, y) for x, y in zip(a, b)], dtype="float64")


@pandas_udf(T.DoubleType())
def token_set_ratio_pandas(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched token-set similarity (difflib-based stand-in for
    the reference's fuzz.token_set_ratio, KahiDb.py:49-78): ratio of
    the sorted-distinct-token renderings, in [0, 1]."""
    from difflib import SequenceMatcher

    def norm(s):
        return " ".join(sorted(set(str(s).lower().split())))

    def score(x, y):
        if x is None or y is None:
            return None
        # autojunk=False like every other scorer here: the default
        # heuristic silently degrades ratios for strings > ~200 chars
        # (popular chars become junk), diverging from the reference's
        # fuzz semantics on long titles (round-5 review finding)
        return SequenceMatcher(None, norm(x), norm(y), autojunk=False).ratio()

    return pd.Series([score(x, y) for x, y in zip(a, b)], dtype="float64")


def _ratio_py(x: str, y: str) -> float:
    from difflib import SequenceMatcher

    return SequenceMatcher(None, x, y, autojunk=False).ratio()


def _fold_parse(s: str) -> str:
    """The reference's ``parse_string`` (``KahiDb.py:18-21``):
    lowercase, accent fold (unidecode ≈ NFKD combining-mark strip),
    TeX-command strip, ``$ _ ^`` removal."""
    import re
    import unicodedata

    s = "".join(
        ch for ch in unicodedata.normalize("NFKD", s.lower()) if not unicodedata.combining(ch)
    )
    return re.sub(r"[\$_\^]", "", re.sub(r"\\\w+", "", s))


def colav_similarity_py(
    t1: str | None,
    t2: str | None,
    j1: str | None,
    j2: str | None,
    y1: int | None,
    y2: int | None,
    ratio_t: float = 0.90,
    partial_t: float = 0.95,
    low_t: float = 0.80,
) -> bool:
    """Faithful re-expression of the reference's FULL similarity
    decision cascade (``colav_similarity``/``__colav_similarity``,
    ``KahiDb.py:23-110``), thresholds in [0, 1]:

    1. journal check: partial_ratio(journals) > ratio_t;
       year check: equality; length check: both titles > 3 words;
    2. short titles with no journal+year corroboration → reject;
    3. direct ratio > ratio_t (long titles) → match;
    4. multi-language bracket variants: split titles on '[', and if
       every variant is non-trivial (>10 chars), any variant pair
       with ratio > ratio_t matches; else any with partial_ratio >
       partial_t, or > low_t when journal AND year corroborate;
    5. fallback: whole-title partial_ratio > partial_t (long titles),
       or > low_t with journal+year corroboration.
    """
    if not t1 or not t2:
        return False
    t1, t2 = _fold_parse(t1), _fold_parse(t2)
    journal_check = bool(
        j1 and j2 and _partial_ratio_py(j1.lower(), j2.lower()) > ratio_t
    )
    year_check = y1 is not None and y2 is not None and int(y1) == int(y2)
    length_check = len(t1.split()) > 3 and len(t2.split()) > 3
    if not length_check and (not journal_check or not year_check):
        return False
    if length_check and _ratio_py(t1, t2) > ratio_t:
        return True
    l1, l2 = t1.split("["), t2.split("[")
    if min(len(v) for v in l1) > 10 and min(len(v) for v in l2) > 10:
        for v in l1:
            if max(_ratio_py(v, w) for w in l2) > ratio_t:
                return True
        best = max(_partial_ratio_py(v, w) for v in l1 for w in l2)
        if best > partial_t:
            return True
        if best > low_t and journal_check and year_check:
            return True
    pr = _partial_ratio_py(t1, t2)
    if pr > partial_t and length_check:
        return True
    return bool(pr > low_t and journal_check and year_check)


@pandas_udf(T.BooleanType())
def colav_similarity_pandas(
    t1: pd.Series, t2: pd.Series, j1: pd.Series, j2: pd.Series, y1: pd.Series, y2: pd.Series
) -> pd.Series:
    """Arrow-batched full-cascade similarity decision (J3)."""
    out = [
        colav_similarity_py(
            a,
            b,
            c,
            d,
            None if pd.isna(e) else int(e),
            None if pd.isna(f) else int(f),
        )
        for a, b, c, d, e, f in zip(t1, t2, j1, j2, y1, y2)
    ]
    return pd.Series(out, dtype="bool")


def fuzzy_join(
    probes: DataFrame,
    candidates: DataFrame,
    block_cols: list[str],
    probe_id: str,
    cand_id: str,
    score: Column,
    threshold: float,
    pick_first: bool = True,
) -> DataFrame:
    """Blocked fuzzy join. ``probes``/``candidates`` columns must be
    pre-aliased disjointly apart from ``block_cols``; ``score`` is a
    Column over the joined row (e.g. ``bigram_jaccard_expr(...)`` or
    ``token_set_ratio_pandas(col_a, col_b)``).

    Returns matches ≥ threshold; with ``pick_first``, exactly the
    best candidate per probe (ties → lowest candidate id) — the
    reference's first-match-wins. DELIBERATE adaptation: the
    reference compares strictly (``ratio > 90``,
    ``WebOfScience.py:262``); this engine standardizes inclusive ≥
    across every cascade AND every oracle mirror (thresholds are
    caller-supplied floats, so a caller wanting strict semantics
    passes the next representable value) — one convention, engine
    and oracles agreeing bit-for-bit, beats mirroring the
    reference's per-call-site mix."""
    joined = probes.join(candidates, on=block_cols, how="inner").filter(
        F.col(probe_id) != F.col(cand_id)
    )
    scored = joined.withColumn("score", score).filter(F.col("score") >= threshold)
    if not pick_first:
        return scored
    w = Window.partitionBy(probe_id).orderBy(F.desc("score"), F.asc(cand_id))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def staged_fuzzy_cascade(
    probes: DataFrame,
    candidates: DataFrame,
    block_cols: list[str],
    probe_id: str,
    cand_id: str,
    stages: list[tuple[Column, float]],
) -> DataFrame:
    """The reference's STAGED fuzzy cascade (J6/J7: ``partial_ratio >
    t1 → token_set_ratio > t2 → partial_token_set_ratio > t3``,
    ``Scopus.py:268-287``, ``KahiParser.py:668-685``): each stage
    resolves only the probes every earlier stage missed (anti-join),
    using its own scorer Column and threshold; within a stage the
    best candidate wins (W1). Returns (probe_id, cand_id, score,
    stage). Cheap/strict scorers go first so expensive loose ones see
    few probes — the Spark shape of the reference's short-circuit
    ``or`` chain."""
    resolved: DataFrame | None = None
    remaining = probes
    for i, (score, threshold) in enumerate(stages):
        hits = fuzzy_join(
            remaining, candidates, block_cols, probe_id, cand_id, score, threshold
        ).select(probe_id, cand_id, "score", F.lit(i).alias("stage"))
        resolved = hits if resolved is None else resolved.unionByName(hits)
        remaining = remaining.join(hits.select(probe_id), on=probe_id, how="left_anti")
    assert resolved is not None, "staged_fuzzy_cascade needs at least one stage"
    return resolved


def complement_merge(
    merged: DataFrame,
    fill_from: DataFrame,
    key: list[str],
    fill_cols: list[str],
    union_cols: list[str] | None = None,
) -> DataFrame:
    """J5 'find_complement' analogue (KahiParser.py:668-738): after a
    fuzzy match, fill empty fields from the matched record
    (``coalesce``) and set-union list fields
    (``array_distinct(array_union(...))``)."""
    right = fill_from.select(
        *key,
        *[F.col(c).alias(f"_fill_{c}") for c in fill_cols],
        *[F.col(c).alias(f"_union_{c}") for c in (union_cols or [])],
    )
    out = merged.join(right, on=key, how="left")
    for c in fill_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"_fill_{c}"))).drop(f"_fill_{c}")
    for c in union_cols or []:
        out = out.withColumn(
            c,
            F.array_distinct(
                F.array_union(
                    F.coalesce(F.col(c), F.array()),
                    F.coalesce(F.col(f"_union_{c}"), F.array()),
                )
            ),
        ).drop(f"_union_{c}")
    return out
