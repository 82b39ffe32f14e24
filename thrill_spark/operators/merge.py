"""MERGE INTO / upsert semantics as a pure DataFrame transform.

No reference analogue (Thrill has no table maintenance); this is the
lakehouse upsert every CDC ingestion pipeline runs: updates replace
matched base rows, unmatched updates insert, unmatched base rows
carry through. One full-outer equi-join on the key — the same shuffle
a MERGE INTO executes under Delta/Iceberg, minus the transaction log.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
) -> DataFrame:
    """Upsert `updates` into `base` on `key_cols`.

    Output schema = base schema (+ an `_action` audit column:
    'update' | 'insert' | 'keep'). Non-key columns must exist in both
    inputs; update values win on match.
    """
    keys = list(key_cols)
    value_cols = [c for c in base.columns if c not in keys]
    missing = [c for c in value_cols if c not in updates.columns]
    if missing:
        raise ValueError(f"updates missing columns: {missing}")
    u = updates.select(
        *[F.col(k).alias(f"_u_{k}") for k in keys],
        *[F.col(c).alias(f"_u_{c}") for c in value_cols],
        F.lit(True).alias("_has_u"),
    )
    cond = [base[k] == u[f"_u_{k}"] for k in keys]
    joined = base.join(u, cond, "full_outer")
    matched = F.coalesce(F.col("_has_u"), F.lit(False))
    in_base = F.col(keys[0]).isNotNull()
    out_keys = [F.coalesce(base[k], F.col(f"_u_{k}")).alias(k) for k in keys]
    out_vals = [
        F.when(matched, F.col(f"_u_{c}")).otherwise(base[c]).alias(c)
        for c in value_cols
    ]
    action = (
        F.when(matched & in_base, F.lit("update"))
        .when(matched, F.lit("insert"))
        .otherwise(F.lit("keep"))
    )
    return joined.select(*out_keys, *out_vals, action.alias("_action"))


SCD2_OPEN_US = 1 << 62  # sentinel: row currently valid


def scd2_apply(
    base: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    at_us: int,
    from_col: str = "valid_from_us",
    to_col: str = "valid_to_us",
) -> DataFrame:
    """Slowly-Changing-Dimension type 2: apply a batch of updates at
    time `at_us`, CLOSING the currently-open version of each matched
    key (valid_to = at_us) and INSERTING a new open version — closed
    history rows pass through untouched, so the table keeps every
    version ever seen.

    updates carries key_cols + the value columns; one left join of the
    open slice against the (usually much smaller) update batch, plus a
    union — the standard warehouse-dimension maintenance plan.
    """
    keys = list(key_cols)
    value_cols = [
        c for c in base.columns if c not in keys and c not in (from_col, to_col)
    ]
    closed = base.filter(F.col(to_col) != SCD2_OPEN_US)
    open_rows = base.filter(F.col(to_col) == SCD2_OPEN_US)
    u_keys = updates.select(*keys).distinct()
    matched = open_rows.join(u_keys, keys, "leftsemi").select(
        *keys, *value_cols, F.col(from_col), F.lit(at_us).cast("long").alias(to_col)
    )
    unmatched = open_rows.join(u_keys, keys, "left_anti")
    fresh = updates.select(
        *keys,
        *value_cols,
        F.lit(at_us).cast("long").alias(from_col),
        F.lit(SCD2_OPEN_US).cast("long").alias(to_col),
    )
    return (
        closed.select(*keys, *value_cols, from_col, to_col)
        .unionByName(matched)
        .unionByName(unmatched.select(*keys, *value_cols, from_col, to_col))
        .unionByName(fresh)
    )
