"""Relational / custom operators (SURVEY.md §2)."""

from kahi_spark.operators.align import align_positional_lists
from kahi_spark.operators.custom import conversation_stats
from kahi_spark.operators.dedup import (
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    shingle_df,
    simhash_neardup_pairs,
    verify_jaccard,
    with_simhash,
)
from kahi_spark.operators.fuzzy import (
    bigram_jaccard_expr,
    char_bigrams_expr,
    complement_merge,
    fuzzy_join,
    token_set_ratio_pandas,
)
from kahi_spark.operators.keyless import resolve_keyless_events
from kahi_spark.operators.linking import explode_keys, staged_lookup
from kahi_spark.operators.merge import (
    latest_change_per_key,
    merge_changes_into_state,
    normalize_events,
    priority_merge,
    reduce_events_to_state,
)
from kahi_spark.operators.similarity import cosine_pairs, knn_bruteforce, knn_lsh

__all__ = [
    "align_positional_lists",
    "conversation_stats",
    "jaccard_pairs",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "shingle_df",
    "simhash_neardup_pairs",
    "verify_jaccard",
    "with_simhash",
    "bigram_jaccard_expr",
    "char_bigrams_expr",
    "complement_merge",
    "fuzzy_join",
    "token_set_ratio_pandas",
    "resolve_keyless_events",
    "explode_keys",
    "staged_lookup",
    "latest_change_per_key",
    "merge_changes_into_state",
    "normalize_events",
    "priority_merge",
    "reduce_events_to_state",
    "cosine_pairs",
    "knn_bruteforce",
    "knn_lsh",
]
