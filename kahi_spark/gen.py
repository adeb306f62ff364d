"""Deterministic synthetic change-event generator (FIXTURES.md §2-3).

Seeded numpy/pandas; writes Parquet batches via pyarrow (no Spark
needed so bench harnesses can pre-generate input off the clock).
Properties (FIXTURES.md §2): geometric turn counts per conversation,
configurable delete/update rates, one hot conv_id holding ~10% of
all events (salting/skew test), multi-source duplicate feeds with
complementary completeness (Kahi-style merge test, reference
``KahiParser.py:334-666``), raw-role/raw-text noise that the
normalizer must clean, and out-of-order event times.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

RAW_ROLES = np.array(
    ["USER", "Assistant", "ai", "human", "SYSTEM", "function", "tool_result", "bot"]
)
TOOLS = np.array(["search", "calculator", "browser", "python", "sql"])
SOURCES = np.array(["lens", "wos", "scopus", "scielo"])
WORDS = np.array(
    "the quick brown fox jumps over lazy dog spark merge stream table turn "
    "agent tool call answer question result data model batch epoch".split()
)


def make_events(
    n_events: int,
    n_convs: int | None = None,
    seed: int = 42,
    delete_rate: float = 0.03,
    update_rate: float = 0.15,
    hot_fraction: float = 0.10,
    hot_turns: int | None = None,
    start_epoch: int = 1_704_067_200,  # 2024-01-01 UTC
) -> pd.DataFrame:
    """One ordered change-event frame with the EVENT_SCHEMA columns.

    ``hot_turns``: by default the hot conversation's events DISPERSE
    over many turn_idx values, so the actual window key
    ``(conv_id, turn_idx)`` is barely skewed (VERDICT r4 #1). Set a
    small int to concentrate the hot conversation on that many turn
    keys — ``hot_turns=1`` puts ~``hot_fraction`` of ALL events on
    the single key ``(c0, 0)``, the north-rule's "one conversation
    holding a large share of 10^10 events" skew scenario."""
    rng = np.random.default_rng(seed)
    n_convs = n_convs or max(4, n_events // 50)

    # conversation assignment: hot key c0 gets ~hot_fraction of events
    hot = rng.random(n_events) < hot_fraction
    conv = np.where(hot, 0, rng.integers(1, n_convs, n_events))
    # geometric-ish turn counts: hot conv has many turns, others few
    turn = np.where(
        hot,
        rng.integers(0, hot_turns or max(8, n_events // 20), n_events),
        rng.integers(0, 1 + rng.integers(4, 40), n_events),
    ).astype(np.int32)

    r = rng.random(n_events)
    op = np.where(
        r < delete_rate, "delete", np.where(r < delete_rate + update_rate, "update", "insert")
    )

    role = RAW_ROLES[rng.integers(0, len(RAW_ROLES), n_events)]
    tool_present = rng.random(n_events) < 0.2
    tool = np.where(tool_present, TOOLS[rng.integers(0, len(TOOLS), n_events)], None)

    # raw text with TeX-ish noise + embedded tool markers + extra whitespace
    w = WORDS[rng.integers(0, len(WORDS), (n_events, 6))]
    base = [" ".join(row) for row in w]
    noise_kind = rng.integers(0, 4, n_events)
    embedded = rng.random(n_events) < 0.1
    text = []
    for i, b in enumerate(base):
        t = b
        if noise_kind[i] == 0:
            t = f"\\emph {t}  "
        elif noise_kind[i] == 1:
            t = f"  {t} $x_i^2$"
        elif noise_kind[i] == 2:
            t = t.replace(" ", "   ", 1)
        if embedded[i]:
            t = f"<tool:{TOOLS[i % len(TOOLS)]}> {t}"
        text.append(t)

    # event time: mostly increasing with seq but with late arrivals
    ts = start_epoch + np.arange(n_events) + rng.integers(-300, 300, n_events)

    df = pd.DataFrame(
        {
            "seq": np.arange(n_events, dtype=np.int64),
            "op": op,
            "conv_id": np.char.add("c", conv.astype(str)),
            "turn_idx": turn,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": pd.to_datetime(ts, unit="s").astype("datetime64[us]"),
            "source": SOURCES[rng.integers(0, len(SOURCES), n_events)],
        }
    )
    return df


def make_multisource_events(n_convs: int = 20, seed: int = 7) -> pd.DataFrame:
    """FIXTURES.md §3: the SAME turns emitted by multiple feeds with
    complementary/conflicting completeness — must converge to one
    canonical record per (conv_id, turn_idx)."""
    rng = np.random.default_rng(seed)
    rows = []
    seq = 0
    for c in range(n_convs):
        n_turns = int(rng.integers(2, 8))
        for t in range(n_turns):
            base_text = " ".join(WORDS[rng.integers(0, len(WORDS), 5)])
            ts0 = 1_704_067_200 + c * 1000 + t * 10
            # lens feed: clean text, raw role, no tool
            rows.append((seq, "insert", f"m{c}", t, "USER" if t % 2 == 0 else "ai",
                         base_text, None, ts0, "lens")); seq += 1
            # wos feed: noisy text, has tool, different raw role casing
            rows.append((seq, "insert", f"m{c}", t, "human" if t % 2 == 0 else "Assistant",
                         f"\\emph  {base_text} ", "search" if t % 3 == 0 else None,
                         ts0 + 1, "wos")); seq += 1
            # scopus feed (lowest default priority): sparse — only some turns
            if t % 2 == 0:
                rows.append((seq, "insert", f"m{c}", t, "user",
                             base_text.upper(), None, ts0 + 2, "scopus")); seq += 1
    df = pd.DataFrame(
        rows, columns=["seq", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts", "source"]
    )
    df["turn_idx"] = df["turn_idx"].astype(np.int32)
    df["ts"] = pd.to_datetime(df["ts"], unit="s").astype("datetime64[us]")
    return df


#: bump when generate_events_spark's OUTPUT changes for the same
#: parameters — bench.py folds this into its cross-run /tmp cache key
#: so a generator edit can never silently reuse stale cached inputs
#: (same contract as queries_ext._FEED_CACHE_VER)
GEN_EVENTS_VER = 1


def generate_events_spark(
    spark,
    n_events: int,
    out_path: str,
    n_files: int = 64,
    seed: int = 42,
    n_convs: int | None = None,
    hot_fraction: float = 0.10,
    hot_turns: int | None = None,
    delete_rate: float = 0.03,
    update_rate: float = 0.15,
    start_epoch: int = 1_704_067_200,
):
    """Distributed deterministic event generation (bench-scale input).

    Same statistical shape as ``make_events`` but built from
    ``spark.range`` + xxhash64-derived pseudo-randomness — fully
    parallel and deterministic, so 10^7-10^8-event bench inputs
    materialize in seconds instead of minutes of driver-side pandas.
    This is also the 100 TB story: test data is generated BY the
    cluster, never funneled through one node.
    """
    from pyspark.sql import functions as F

    n_convs = n_convs or max(4, n_events // 50)

    def h(salt: int):
        return F.abs(F.xxhash64(F.col("seq"), F.lit(seed), F.lit(salt)))

    def unit(salt: int):  # uniform [0,1) with 4 digits
        return (h(salt) % 10000) / 10000.0

    roles = F.array(*[F.lit(r) for r in RAW_ROLES.tolist()])
    tools = F.array(*[F.lit(t) for t in TOOLS.tolist()])
    sources = F.array(*[F.lit(s) for s in SOURCES.tolist()])
    words = F.array(*[F.lit(w) for w in WORDS.tolist()])

    hot = unit(1) < hot_fraction
    conv = F.when(hot, F.lit(0)).otherwise(h(2) % F.lit(max(1, n_convs - 1)) + 1)
    # hot_turns concentrates the hot conversation on that many window
    # keys (see make_events) — the genuinely-skewed reduction fixture
    turn = F.when(
        hot, h(3) % F.lit(hot_turns or max(8, n_events // 20))
    ).otherwise(h(3) % 30)
    r_op = unit(4)
    op = (
        F.when(r_op < delete_rate, F.lit("delete"))
        .when(r_op < delete_rate + update_rate, F.lit("update"))
        .otherwise(F.lit("insert"))
    )
    base_text = F.concat_ws(
        " ", *[F.element_at(words, (h(10 + k) % len(WORDS) + 1).cast("int")) for k in range(6)]
    )
    noise = h(20) % 4
    text = (
        F.when(noise == 0, F.concat(F.lit("\\emph "), base_text, F.lit("  ")))
        .when(noise == 1, F.concat(F.lit("  "), base_text, F.lit(" $x_i^2$")))
        .when(
            noise == 2,
            F.concat(
                F.lit("<tool:"),
                F.element_at(tools, (h(21) % len(TOOLS) + 1).cast("int")),
                F.lit("> "),
                base_text,
            ),
        )
        .otherwise(base_text)
    )
    tool = F.when(
        unit(5) < 0.2, F.element_at(tools, (h(22) % len(TOOLS) + 1).cast("int"))
    )
    ts = F.timestamp_seconds(
        F.lit(start_epoch) + F.col("seq") + (h(6) % 600) - 300
    )
    df = (
        spark.range(0, n_events, 1, n_files)
        .select(F.col("id").alias("seq"))
        .select(
            "seq",
            op.alias("op"),
            F.concat(F.lit("c"), conv.cast("string")).alias("conv_id"),
            turn.cast("int").alias("turn_idx"),
            F.element_at(roles, (h(7) % len(RAW_ROLES) + 1).cast("int")).alias("role"),
            text.alias("text"),
            tool.alias("tool"),
            ts.alias("ts"),
            F.element_at(sources, (h(8) % len(SOURCES) + 1).cast("int")).alias("source"),
        )
    )
    df.write.mode("overwrite").parquet(out_path)
    return out_path


def write_event_batches(
    out_dir: str,
    n_events: int,
    n_batches: int,
    seed: int = 42,
    duplicate_epochs: list[int] | None = None,
    evolve_at_batch: int | None = None,
    **kwargs,
) -> list[str]:
    """Write the change log as N Parquet batch files (the file-based
    binlog a Structured Streaming file source tails). Options:

    * ``duplicate_epochs`` — re-deliver whole batches (exactly-once
      test: the sink ledger must no-op them);
    * ``evolve_at_batch`` — from that batch on, events carry a new
      ``meta`` column (schema-evolution test).
    """
    os.makedirs(out_dir, exist_ok=True)
    df = make_events(n_events, seed=seed, **kwargs)
    paths = []
    per = (len(df) + n_batches - 1) // n_batches
    for b in range(n_batches):
        chunk = df.iloc[b * per : (b + 1) * per].copy()
        if evolve_at_batch is not None and b >= evolve_at_batch:
            chunk["meta"] = "m" + chunk["seq"].astype(str)
        p = os.path.join(out_dir, f"batch-{b:05d}.parquet")
        chunk.to_parquet(p, index=False)
        paths.append(p)
    for e in duplicate_epochs or []:
        src = os.path.join(out_dir, f"batch-{e:05d}.parquet")
        dup = os.path.join(out_dir, f"batch-{e:05d}-redelivered.parquet")
        if os.path.exists(src):
            import shutil

            shutil.copy(src, dup)
            paths.append(dup)
    return paths
