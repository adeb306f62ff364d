"""Property-based replay invariance (SURVEY.md §5.7): any
batch-boundary placement and any delivery order of the same event
set yields the identical final table — because the MERGE is keyed
and ordered by (ts, seq), not by arrival."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kahi_spark.gen import make_events
from kahi_spark.sinks.snapshot import SnapshotTable

N_EVENTS = 240


def final_state(spark, tmpdir, pdf_batches, mode):
    t = SnapshotTable(spark, tmpdir, n_buckets=2, mode=mode, compact_every=3)
    for i, chunk in enumerate(pdf_batches):
        if len(chunk):
            t.merge(spark.createDataFrame(chunk), epoch_id=i)
    return sorted(
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool, str(r.ts))
        for r in t.read().collect()
    )


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    perm_seed=st.integers(0, 10_000),
    cuts=st.lists(st.integers(1, N_EVENTS - 1), min_size=1, max_size=4, unique=True),
    mode=st.sampled_from(["cow", "mor"]),
)
def test_any_order_any_batching_same_state(spark, tmp_path_factory, perm_seed, cuts, mode):
    import numpy as np

    pdf = make_events(N_EVENTS, n_convs=8, seed=13)
    # canonical: one batch, natural order
    base_dir = str(tmp_path_factory.mktemp("base"))
    canonical = final_state(spark, base_dir, [pdf], mode)

    # permuted delivery order + arbitrary batch boundaries
    rng = np.random.default_rng(perm_seed)
    shuffled = pdf.iloc[rng.permutation(len(pdf))].reset_index(drop=True)
    bounds = sorted(set(cuts)) + [len(shuffled)]
    batches, prev = [], 0
    for b in bounds:
        batches.append(shuffled.iloc[prev:b])
        prev = b
    perm_dir = str(tmp_path_factory.mktemp("perm"))
    permuted = final_state(spark, perm_dir, batches, mode)

    assert canonical == permuted


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    perm_seed=st.integers(0, 10_000),
    cuts=st.lists(st.integers(1, N_EVENTS - 1), min_size=1, max_size=3, unique=True),
    fold_after=st.lists(st.integers(0, 3), min_size=1, max_size=3, unique=True),
)
def test_bucketed_fold_replay_invariance(
    spark, tmp_path_factory, perm_seed, cuts, fold_after
):
    """Same invariance, with the BUCKETED (Arrow bucket-zip) fold
    forced at arbitrary epoch boundaries — `auto` never picks it at
    this scale, so it needs its own fuzz: any delivery order + any
    fold placement must reproduce the canonical single-batch state."""
    import numpy as np

    pdf = make_events(N_EVENTS, n_convs=8, seed=17)
    base_dir = str(tmp_path_factory.mktemp("base"))
    canonical = final_state(spark, base_dir, [pdf], "mor")

    rng = np.random.default_rng(perm_seed)
    shuffled = pdf.iloc[rng.permutation(len(pdf))].reset_index(drop=True)
    bounds = sorted(set(cuts)) + [len(shuffled)]
    t = SnapshotTable(
        spark, str(tmp_path_factory.mktemp("bkt")), n_buckets=3, mode="mor",
        compact_every=100,
    )
    prev = 0
    for i, b in enumerate(bounds):
        chunk = shuffled.iloc[prev:b]
        prev = b
        if len(chunk):
            t.merge(spark.createDataFrame(chunk), epoch_id=i)
        if i in fold_after:
            t.compact(strategy="bucketed")
    t.compact(strategy="bucketed")
    got = sorted(
        (r.conv_id, r.turn_idx, r.role, r.text, r.tool, str(r.ts))
        for r in t.read().collect()
    )
    assert got == canonical
