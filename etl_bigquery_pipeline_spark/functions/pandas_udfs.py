"""Pandas-UDF (Arrow-vectorized) surface — the sanctioned Python escape
hatch (SURVEY.md §2.8 lists UDF/UDAF as absent from the reference).

Policy: every hot-path operator in this engine is JVM-side; a Pandas UDF is
for logic that genuinely needs Python (model inference, codec libraries,
numpy-heavy math). These implementations mirror JVM operators bit-for-bit
so tests can assert the two paths agree — the contract a real model UDF
would slot into.

Row-at-a-time Python UDFs (``F.udf``) are deliberately not exported: at
100 TB the serialization tax is 10-100× vs Arrow batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


# return types as DataType objects: DDL strings would need an active
# SparkSession at import time
@pandas_udf(T.DoubleType())
def cosine_to_query_udf(emb: pd.Series, query: pd.Series) -> pd.Series:
    """Vectorized cosine between an embedding column and a (constant)
    query vector column. numpy does the batch math — one Arrow transfer
    per batch, no per-row Python."""
    mat = np.stack(emb.to_numpy())
    qv = np.stack(query.to_numpy())
    dots = np.einsum("ij,ij->i", mat, qv)
    norms = np.linalg.norm(mat, axis=1) * np.linalg.norm(qv, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(norms == 0, np.nan, dots / norms)
    return pd.Series(out)


@pandas_udf(T.IntegerType())
def token_count_udf(text: pd.Series) -> pd.Series:
    """Whitespace token count — pandas str ops, batch-at-a-time."""
    return text.str.split().map(len).astype("int32")


def with_udf_cosine(
    df: DataFrame, query_vec: list[float], *, vec_col: str = "embedding"
) -> DataFrame:
    """Score a corpus against one query vector via the Pandas UDF path.

    The JVM path (functions.vectors.cosine) is preferred; this exists to
    (a) prove the Arrow contract and (b) host numpy/model scoring when the
    math outgrows SQL expressions.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return df.withColumn(
        "sim_udf",
        cosine_to_query_udf(
            F.col(vec_col).cast("array<double>"), q
        ),
    )


def trimmed_mean_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    trim_frac: float = 0.1,
) -> DataFrame:
    """Custom grouped aggregate (UDAF shape) via applyInPandas: per-group
    trimmed mean — drop the top/bottom ``trim_frac`` before averaging.

    Not expressible as a single built-in aggregate; the group's rows
    arrive as one Arrow-backed pandas frame. Scale note: a group must fit
    in executor memory — use only on bounded-cardinality groups, and
    pre-aggregate or sample upstream when a group can be huge.
    """
    import math

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].sort_values().to_numpy()
        k = math.floor(len(v) * trim_frac)
        kept = v[k : len(v) - k] if len(v) > 2 * k else v
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "trimmed_mean": [float(kept.mean())],
                "n_used": [len(kept)],
                "n_total": [len(v)],
            }
        )

    # derive the group column's type from the input schema — hardcoding
    # `string` broke grouping by numeric columns with a schema mismatch
    group_type = df.schema[group_col].dataType.simpleString()
    return df.select(group_col, value_col).groupBy(group_col).applyInPandas(
        agg,
        f"{group_col} {group_type}, trimmed_mean double, n_used long, n_total long",
    )


@pandas_udf(T.DoubleType())
def compression_ratio_udf(text: pd.Series) -> pd.Series:
    """Per-document zlib compression ratio (compressed/raw bytes, level 6)
    — the classic low-information-content detector (highly repetitive or
    template text compresses far below ~0.4; random text stays near 1).
    Genuinely needs Python (a codec), so it is the sanctioned Arrow-batch
    escape hatch: one zlib call per row inside a batch, no per-row
    serialization. Empty documents surface as SQL NULL (NaN crosses Arrow as null)."""
    import zlib

    def ratio(s):
        if s is None:
            return float("nan")
        raw = s.encode("utf-8")
        if not raw:
            return float("nan")
        return len(zlib.compress(raw, 6)) / len(raw)

    return text.map(ratio).astype("float64")


@pandas_udf(T.DoubleType())
def geomean_udf(v: pd.Series) -> float:
    """GROUPED_AGG pandas UDAF (series -> scalar, Arrow-batched): exact
    geometric mean via mean-of-logs — the aggregate shape Python UDAFs
    take in Spark (grouped-agg pandas_udf; there is no row-at-a-time
    Python UDAF surface, by design). Positive inputs only; rounds to 6
    so the result is engine-comparable against the SQL replay
    exp(avg(ln(x)))."""
    return round(float(np.exp(np.log(v.to_numpy(dtype="float64")).mean())), 6)
