"""Schema imposition operators (SURVEY.md §2.2 P1-P4).

The reference sniffs whether an Excel extract arrived as one comma-packed
column by sampling 5 values (/root/reference/dags/etl_pipeline.py:121-125),
splits it positionally (:126-129), and force-renames the first N columns to
canonical names (:131-133). Same semantics here, but the sniff samples via
``limit`` (no full scan) and the split is one lazy projection that Catalyst
collapses into the scan stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def looks_packed(df: DataFrame, sample: int = 5, sep: str = ",") -> bool:
    """P1+P2: do the first ``sample`` non-null values of column 0 contain
    the separator? Driver-side probe on a bounded sample — O(sample), not
    O(table)."""
    first = df.columns[0]
    rows = (
        df.select(F.col(first).cast("string").alias("v"))
        .na.drop()
        .limit(sample)
        .collect()
    )
    return any(sep in r.v for r in rows)


def split_packed_column(
    df: DataFrame, names: list[str], sep: str = ","
) -> DataFrame:
    """P3: split a single packed string column into len(names) typed-string
    fields, positionally. One narrow projection, no shuffle."""
    first = F.col(df.columns[0]).cast("string")
    parts = F.split(first, sep)
    return df.select(
        *[parts.getItem(i).alias(name) for i, name in enumerate(names)]
    )


def rename_positional(df: DataFrame, names: list[str]) -> DataFrame:
    """P4: impose canonical names on the first len(names) columns, keeping
    any extra columns under their original names."""
    mapping = dict(zip(df.columns, names))
    return df.withColumnsRenamed(mapping)


def impose_schema(df: DataFrame, names: list[str], sep: str = ",") -> DataFrame:
    """The reference's full normalize step: sniff packed vs columnar, then
    split or rename (/root/reference/dags/etl_pipeline.py:121-133)."""
    if len(df.columns) == 1 or (
        len(df.columns) < len(names) and looks_packed(df, sep=sep)
    ):
        return split_packed_column(df, names, sep)
    return rename_positional(df, names)
