"""Skew-handling utilities for 100 TB joins (SURVEY.md §7.4).

AQE's skew-join splitting (on by default in session.py) handles most skew
at runtime. These explicit tools cover the cases AQE can't: a *broadcast
disabled* dimension too big to broadcast joined on a power-law key (user_id
with bot traffic, hot product ids).

Salted join: replicate the small side R times, salt the big side's key with
hash(row) % R — the hot key's rows spread over R reducer partitions instead
of one. Trade: R× duplication of the small side; choose R ~ (hot-key rows /
target-partition rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def with_salt(df: DataFrame, buckets: int, *, deterministic_by: str | None = None) -> DataFrame:
    """Add a salt column in [0, buckets). ``deterministic_by`` salts by a
    hash of that column (reproducible); default salts by uniform random —
    fine for joins, not for tests."""
    if deterministic_by is not None:
        salt = F.pmod(F.hash(F.col(deterministic_by)), F.lit(buckets))
    else:
        salt = (F.rand() * buckets).cast("int")
    return df.withColumn(SALT_COL, salt)


def explode_salt(df: DataFrame, buckets: int) -> DataFrame:
    """Replicate every row once per salt value (the small/broadcast-unable
    side of a salted join)."""
    return df.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    *,
    buckets: int = 8,
    how: str = "inner",
    deterministic: bool = False,
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side, explode the small side,
    join on (keys + salt). Result equals big.join(small, on, how) for
    inner/left joins; the shuffle spreads each hot key over ``buckets``
    partitions.

    Only inner/left are accepted: right/full/outer would emit each
    unmatched SMALL-side row once per salt value (explode_salt replicates
    it ``buckets`` times), silently diverging from the unsalted join.
    """
    if how not in {"inner", "left", "left_outer", "leftouter"}:
        raise ValueError(
            f"salted_join supports how in inner/left only, got {how!r}: "
            "outer variants duplicate unmatched small-side rows per salt"
        )
    key0 = on[0]
    b = with_salt(big, buckets, deterministic_by=key0 if deterministic else None)
    s = explode_salt(small, buckets)
    return b.join(s, on + [SALT_COL], how).drop(SALT_COL)


def heavy_hitters(
    df: DataFrame, key_cols: list[str], *, k: int = 20
) -> DataFrame:
    """Exact top-k heavy hitters for a (join/groupBy) key, with share and
    cumulative share of total rows — the skew diagnosis that decides
    whether a join needs salting or AQE skew-split.

    One groupBy shuffle produces the per-key counts; top-k is
    orderBy+limit (TakeOrdered: each partition keeps k rows, the driver
    merges k*partitions — never a global sort). Total row count joins in
    as a broadcast 1-row aggregate, and the cumulative-share window runs
    over the k surviving rows only. Ties break on the key ascending, so
    the result is deterministic. For streaming/sketched alternatives see
    the frequent-items sketch gate (plans/catalog.sketch_gates).
    """
    keys = [F.col(c) for c in key_cols]
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    return heavy_hitters_from_counts(counts, key_cols, "n", k=k)


def heavy_hitters_from_counts(
    counts: DataFrame, key_cols: list[str], n_col: str = "n", *, k: int = 20
) -> DataFrame:
    """Heavy hitters from an already-aggregated (key, count) frame — the
    serving path for maintained count tables (streaming top-k views,
    incremental rollups). Same contract as ``heavy_hitters``; the total
    comes from summing the counts, so no second scan of the raw data."""
    from pyspark.sql import Window

    order = [F.col(n_col).desc(), *[F.col(c).asc() for c in key_cols]]
    topk = counts.orderBy(*order).limit(k)
    total = counts.agg(F.sum(n_col).alias("__total"))
    w = (
        Window.orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        topk.crossJoin(F.broadcast(total))
        .select(
            *key_cols,
            F.col(n_col).cast("bigint").alias("n"),
            F.row_number().over(w).cast("bigint").alias("rnk"),
            F.round(F.col(n_col) / F.col("__total"), 6).alias("share"),
            F.round(
                F.sum(n_col).over(w) / F.col("__total"), 6
            ).alias("cum_share"),
        )
    )
