"""Coerce-to-null cast semantics (SURVEY.md §2.2 P5-P7).

The reference parses with pandas errors="coerce" — unparseable values become
null instead of raising (/root/reference/dags/etl_pipeline.py:137-139,
:174). Spark 4 runs ANSI mode by default (casts *raise*), so the engine
exposes explicit try_* wrappers rather than flipping ANSI off globally:
the coercion is visible in the plan, and everything else keeps strict
ANSI checking. All of these are built-in JVM expressions — no Python UDFs —
so they stay inside whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_timestamp_or_null(col: Column | str, fmt: str | None = None) -> Column:
    """pd.to_datetime(errors='coerce') equivalent (P5): invalid -> null."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c, F.lit(fmt)) if fmt else F.try_to_timestamp(c)


def to_date_or_null(col: Column | str, fmt: str | None = None) -> Column:
    """Date-granularity variant of P5."""
    return to_timestamp_or_null(col, fmt).cast("date")


def to_long_or_null(col: Column | str) -> Column:
    """pd.to_numeric(errors='coerce').astype(int64) equivalent (P6).

    Mirrors pandas' two-step parse: accept numeric strings with a decimal
    part, then truncate to integer ("3.7" -> 3, "abc" -> null).
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double").try_cast("bigint")


def to_double_or_null(col: Column | str) -> Column:
    """float64 coercion (P7): invalid -> null."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double")


def exact_sum(col: Column | str, scale: int = 4) -> Column:
    """Engine-order-independent SUM for doubles.

    Double addition is non-associative, so a distributed partial-aggregate
    sum differs from a sequential one in the low bits. Summing as
    DECIMAL(18, scale) is exact and deterministic regardless of partitioning
    or engine; the final cast back to double is a single deterministic
    conversion. Used by every oracle-checked monetary aggregate.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")
