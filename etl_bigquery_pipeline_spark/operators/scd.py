"""Slowly-changing-dimension type 2 (dimension history) as one plan.

The reference's warehouse loads are truncate-reload
(/root/reference/dags/etl_pipeline.py:202-218) — it keeps no history.
SCD2 is the standard upgrade every warehouse team eventually asks for:
instead of overwriting a changed dimension row, close the old version
(valid_to = effective date, is_current = false) and append the new one.

Scale shape: ONE equi-join of the current dimension against the update
batch on the business key (update batches are CDC-sized — small against
the dimension — so Spark broadcasts them), then a union of three
branch projections off that join. No window functions, no shuffles
beyond the join; the dimension body flows through exactly once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCD_COLS = ("valid_from", "valid_to", "is_current")


def scd2_init(
    dim: DataFrame, *, valid_from: str | Column
) -> DataFrame:
    """Wrap a plain dimension snapshot in SCD2 bookkeeping columns."""
    vf = F.lit(valid_from) if isinstance(valid_from, str) else valid_from
    return dim.select(
        "*",
        vf.cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
    *,
    effective_date: str | Column,
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension; returns the new state.

    - a CURRENT row whose key appears in ``updates`` with any tracked
      attribute changed is CLOSED (valid_to = effective date,
      is_current = false) and a new version row opens at the effective
      date;
    - an update equal to the current version (no tracked change) is a
      no-op — no spurious version churn;
    - unmatched current rows and already-closed history pass through;
    - keys new to the dimension insert as open versions.

    ``compare_cols`` limits change detection to the listed attributes
    (default: every non-key, non-bookkeeping column both sides share).
    Null-safe comparison via ``eqNullSafe``.
    """
    eff = (
        F.lit(effective_date)
        if isinstance(effective_date, str)
        else effective_date
    ).cast("date")
    attrs = [
        c
        for c in current.columns
        if c not in keys and c not in _SCD_COLS
    ]
    if compare_cols is None:
        compare_cols = [c for c in attrs if c in updates.columns]
    missing = [c for c in [*keys, *attrs] if c not in updates.columns]
    if missing:
        raise ValueError(f"updates frame lacks dimension columns {missing}")

    upd = updates.select(
        *[F.col(c).alias(f"__u_{c}") for c in [*keys, *attrs]]
    )
    changed = ~F.lit(True)
    for c in compare_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.col(f"__u_{c}"))

    join_cond = [
        F.col(k) == F.col(f"__u_{k}") for k in keys
    ]
    # the update batch is CDC-sized: broadcast it so the dimension —
    # the big side — never shuffles
    joined = current.join(
        F.broadcast(upd), join_cond, "left"
    ).withColumn(
        "__versioned",
        F.col("is_current") & F.col(f"__u_{keys[0]}").isNotNull() & changed,
    )

    untouched = joined.filter(~F.col("__versioned")).select(current.columns)
    closed = joined.filter(F.col("__versioned")).select(
        *[F.col(c) for c in [*keys, *attrs]],
        "valid_from",
        eff.alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = joined.filter(F.col("__versioned")).select(
        *[F.col(f"__u_{c}").alias(c) for c in [*keys, *attrs]],
        eff.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    # brand-new keys: anti join is against current keys only (tiny
    # projection); the update batch is already driver-small
    inserts = (
        upd.join(
            current.select(
                *[F.col(k).alias(f"__u_{k}") for k in keys]
            ).distinct(),
            [f"__u_{k}" for k in keys],
            "left_anti",
        )
        .select(
            *[F.col(f"__u_{c}").alias(c) for c in [*keys, *attrs]],
            eff.alias("valid_from"),
            F.lit(None).cast("date").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    return untouched.unionByName(closed).unionByName(opened).unionByName(
        inserts
    )
