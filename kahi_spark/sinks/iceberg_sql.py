"""Iceberg ``MERGE INTO`` statement emitter (SURVEY.md §1.3 / S8).

The sandbox ships no Iceberg runtime jar, so ``SnapshotTable``
executes the MERGE semantics as a full-outer join + snapshot rewrite
over Parquet. On a real cluster the SAME semantics run as one
``MERGE INTO`` against the Iceberg catalog — this module emits that
statement from the same (key_cols, value_cols, policies) vocabulary
``merge_changes_into_state`` uses, so the two paths stay pluggable
(reference analogue: ``insert_one``'s insert-or-``$set`` upsert,
``KahiDb.py:864-909``; mod-patch policies ``KahiDb.py:571-622,
650-732, 760-860``).

The emitted SQL is validated by Spark's own parser in
``tests/test_iceberg_sql.py`` (parse-only — execution needs an
Iceberg catalog).
"""

from __future__ import annotations


def _policy_set(col: str, policy: str) -> str:
    """One SET clause under a field-level merge policy (A9)."""
    if policy == "lww":
        return f"t.{col} = s.{col}"
    if policy == "fill_empty":
        return f"t.{col} = coalesce(t.{col}, s.{col})"
    if policy == "union":
        return (
            f"t.{col} = array_sort(array_distinct(array_union("
            f"coalesce(t.{col}, array()), coalesce(s.{col}, array()))))"
        )
    if policy == "greatest":
        return f"t.{col} = greatest(t.{col}, s.{col})"
    raise ValueError(f"unknown merge policy {policy!r} for column {col!r}")


def merge_into_sql(
    target: str,
    source: str,
    key_cols: list[str],
    value_cols: list[str],
    policies: dict[str, str] | None = None,
    seq_col: str = "seq",
    ts_col: str = "ts",
) -> str:
    """Versioned CDC upsert as one Iceberg MERGE:

    * delete events tombstone only if NEWER than the stored row
      (out-of-order late deletes can't resurrect, mirrors
      ``merge_changes_into_state``'s ``_newer_than``);
    * updates apply per-column policies when newer;
    * unmatched non-deletes insert.

    ``source`` must be a view/table of reduced changes (≤1 row per
    key, columns: keys + values + op/seq/ts — the output of
    ``latest_change_per_key``).
    """
    pol = policies or {}
    on = " AND ".join(f"t.{k} = s.{k}" for k in key_cols)
    newer = (
        f"(s.{ts_col} > t.{ts_col} OR "
        f"(s.{ts_col} = t.{ts_col} AND s.{seq_col} > t._seq))"
    )
    sets = ",\n        ".join(
        [_policy_set(c, pol.get(c, "lww")) for c in value_cols]
        + [f"t._seq = s.{seq_col}", "t._deleted = false"]
    )
    insert_cols = ", ".join(key_cols + value_cols + ["_seq", "_deleted"])
    insert_vals = ", ".join(
        [f"s.{c}" for c in key_cols + value_cols]
        + [f"s.{seq_col}", "(s.op = 'delete')"]
    )
    return f"""MERGE INTO {target} t
USING {source} s
ON {on}
WHEN MATCHED AND s.op = 'delete' AND {newer} THEN
    UPDATE SET t._deleted = true, t._seq = s.{seq_col}
WHEN MATCHED AND s.op <> 'delete' AND {newer} THEN
    UPDATE SET {sets}
WHEN NOT MATCHED THEN
    INSERT ({insert_cols}) VALUES ({insert_vals})"""
