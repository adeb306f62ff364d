"""Custom grouped operators via applyInPandas (SURVEY.md §2.9.6:
the UDAF-analogue fallback when the merge logic outgrows expression
trees — prefer native coalesce/when where possible).

``conversation_stats`` is the demonstration operator: per-conversation
session statistics that mix ordered iteration (turn gaps) with set
aggregation — natural in pandas, awkward as expressions. Arrow-batched,
one shuffle on the group key, Python touched once per group batch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

STATS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_turns", T.IntegerType()),
        T.StructField("n_roles", T.IntegerType()),
        T.StructField("n_tool_calls", T.IntegerType()),
        T.StructField("mean_gap_s", T.DoubleType()),
        T.StructField("max_gap_s", T.DoubleType()),
    ]
)


def conversation_stats(transcripts: DataFrame) -> DataFrame:
    """Per-conversation stats over (conv_id, turn_idx, role, tool, ts)."""

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["turn_idx", "ts"])
        gaps = pdf["ts"].diff().dt.total_seconds().dropna()
        return pd.DataFrame(
            {
                "conv_id": [pdf["conv_id"].iloc[0]],
                "n_turns": [len(pdf)],
                "n_roles": [pdf["role"].nunique(dropna=True)],
                "n_tool_calls": [int(pdf["tool"].notna().sum())],
                "mean_gap_s": [float(gaps.mean()) if len(gaps) else None],
                "max_gap_s": [float(gaps.max()) if len(gaps) else None],
            }
        )

    return transcripts.groupBy("conv_id").applyInPandas(stats, schema=STATS_SCHEMA)


STATS_EXACT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_turns", T.IntegerType()),
        T.StructField("n_roles", T.IntegerType()),
        T.StructField("n_tool_calls", T.IntegerType()),
        T.StructField("sum_gap_us", T.LongType()),
        T.StructField("max_gap_us", T.LongType()),
    ]
)


def conversation_stats_exact(transcripts: DataFrame) -> DataFrame:
    """Cross-engine-exact variant: gap statistics as INTEGER
    microseconds (sum + max instead of a float mean) — float-boundary
    rounding differs between engines' round() algorithms, integers
    never do. This is the oracle-gated form; ``conversation_stats``
    keeps the human-friendly float seconds."""

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["turn_idx", "ts"])
        # NaT-safe integer view: astype('int64') silently turns NaT
        # into int64-min (pandas 2.x), which would wrap the diffs
        # into ~1e18 garbage — mask NULL ts to NA first so gaps
        # touching them drop out, exactly like the DuckDB oracle's
        # `epoch_us(ts) - lag(epoch_us(ts))` yielding NULL
        ns = pd.Series(pdf["ts"].astype("int64"), index=pdf.index).astype("Int64")
        ns[pdf["ts"].isna()] = pd.NA
        gaps_us = (ns.diff() // 1000).dropna().astype("int64")
        return pd.DataFrame(
            {
                "conv_id": [pdf["conv_id"].iloc[0]],
                "n_turns": [len(pdf)],
                "n_roles": [pdf["role"].nunique(dropna=True)],
                "n_tool_calls": [int(pdf["tool"].notna().sum())],
                "sum_gap_us": [int(gaps_us.sum()) if len(gaps_us) else None],
                "max_gap_us": [int(gaps_us.max()) if len(gaps_us) else None],
            }
        )

    return transcripts.groupBy("conv_id").applyInPandas(stats, schema=STATS_EXACT_SCHEMA)
