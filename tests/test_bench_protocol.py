"""Steal-robust bench protocol (VERDICT r5 #1) — the pure logic, no
Spark: clean-sample selection and the steal-window bracketing helper.
The end-to-end scaling phase is exercised by bench.py itself (driver
runs it every round); these pin the decision rules so a refactor
can't silently revert to min-wall-over-all."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from bench import _StealSampler, pick_clean_sample


def s(wall, steal):
    return {"wall_s": wall, "steal_pct": steal}


def test_pick_prefers_clean_min_wall_over_global_min_wall():
    # the r5 failure mode: a lucky ultra-fast sample taken under heavy
    # steal must NOT be picked over a slightly slower clean one
    samples = [s(10.0, 18.2), s(12.0, 1.1), s(11.5, 4.9), s(30.0, 22.0)]
    best, had_clean = pick_clean_sample(samples, 5.0)
    assert had_clean and best == s(11.5, 4.9)


def test_pick_falls_back_when_no_clean_window():
    samples = [s(14.0, 9.0), s(12.5, 7.2)]
    best, had_clean = pick_clean_sample(samples, 5.0)
    assert not had_clean and best == s(12.5, 7.2)


def test_pick_handles_unmeasurable_steal():
    # no /proc/stat → steal None on every sample: min-wall over all,
    # reported as no-clean (the retry loop must NOT spin on it)
    samples = [s(14.0, None), s(12.5, None)]
    best, had_clean = pick_clean_sample(samples, 5.0)
    assert not had_clean and best == s(12.5, None)


def test_steal_sampler_safe_in_any_call_order():
    # ADVICE r5: mark()/report() on a never-started sampler must not
    # raise (previously _marks was created inside start())
    sm = _StealSampler()
    sm.mark("phase")
    assert sm.report() == {}


def test_default_local_dir_selection(monkeypatch, tmp_path):
    """Scratch-dir policy (round 7): env override wins (empty string =
    Spark default), tmpfs auto-pick requires existence+writability+
    headroom — a missing /dev/shm must fall back to None, never throw."""
    from kahi_spark import session as S

    monkeypatch.setenv("KAHI_SPARK_LOCAL_DIR", str(tmp_path))
    assert S._default_local_dir() == str(tmp_path)
    monkeypatch.setenv("KAHI_SPARK_LOCAL_DIR", "")
    assert S._default_local_dir() is None
    monkeypatch.delenv("KAHI_SPARK_LOCAL_DIR")
    # force the probe down the no-tmpfs path
    monkeypatch.setattr(S.os, "statvfs", lambda p: (_ for _ in ()).throw(OSError()))
    assert S._default_local_dir() is None
