"""Single-partition literal DataFrames built JVM-side.

``spark.createDataFrame(rows)`` routes tiny literal results through a
pickled Python RDD spread over ``defaultParallelism`` slices. That has
two costs measured in r12 on local[32] (and the same shape on a
cluster, where the slices become scheduler-visible tasks):

- every action over the frame schedules one micro-task per slice, and a
  downstream ``coalesce(1)`` is far worse: the single coalesced task
  walks ALL parent slices sequentially, each a Python-worker
  round-trip — measured ~5s per action on an OTHERWISE-EMPTY one-row
  frame (32 slices x ~150ms), which dominated every gate query that
  returned such a frame;
- a crossJoin of two such frames becomes an n*m-task cartesian stage
  (the r10 incident that introduced the ``coalesce(1)`` this module
  replaces).

``literal_frame`` instead builds the rows as a Catalyst literal:
``spark.range(0, 1, 1, 1)`` (ONE partition, JVM-native) projected
through ``inline(array(struct(...), ...))``. No Python worker is ever
consulted, the plan is a 1-partition local scan, and both hazards above
disappear. Use it for small frames of plain literals (bool/int/float/
str/None). For rows carrying exotic types (Decimal, nested arrays) keep
``spark.createDataFrame`` but pass ``sc.parallelize(rows, 1)`` so the
frame is at least single-sliced.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def literal_frame(
    spark: SparkSession, rows: Iterable[Sequence], schema: str
) -> DataFrame:
    """A single-partition DataFrame of literal ``rows`` with the DDL
    ``schema`` — JVM-side (no Python-RDD slices; see module docstring).

    Values must be expressible as column literals (``F.lit``): None,
    bool, int, float, str. Each value is cast to its schema type, so
    e.g. Python ints land as the declared bigint/int."""
    st = T.StructType.fromDDL(schema)
    structs = [
        F.struct(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for v, f in zip(row, st.fields)
            ]
        )
        for row in rows
    ]
    if not structs:
        return spark.createDataFrame([], st)
    return spark.range(0, 1, 1, 1).select(F.inline(F.array(*structs)))
