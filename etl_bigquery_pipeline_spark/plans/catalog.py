"""Oracle-checked query catalog — the driver contract behind
__spark_entry__.py.

Every operator from SURVEY.md §2 (and the north-star tier) appears here as
a named query: a PySpark implementation (spark, sf_dir) -> DataFrame plus a
dialect-equivalent DuckDB SQL oracle over the same parquet tables. Naming
rule: every computed column is aliased identically on both sides (the
driver sorts columns by name before hashing).

Cross-engine determinism rules used throughout:
- SUM over doubles goes through DECIMAL(18,4) (exact, order-independent),
  then one cast to double — see functions.coercion.exact_sum.
- AVG and similarity scores are rounded (4 / 6 decimals): the residual
  engine difference is ~1e-12 relative, orders of magnitude below the
  rounding granularity.
- Ranks use row_number over a total order (rounded score desc, id asc).
- All hashes are md5-derived; MinHash minima compare fixed-width lowercase
  hex strings, never engine-specific integers.
- Timestamps stay at native microsecond precision; session gap logic uses
  interval comparisons (no second-truncation).

The dedup/near-dup queries plant mutated copies of real rows in-query
(UNION ALL with shifted ids) because the synthetic corpus has no natural
duplicates — detection is then visible in the result, and the oracle plants
the identical rows.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_bigquery_pipeline_spark.operators.caching import scoped_cache

from etl_bigquery_pipeline_spark.functions import text as TX
from etl_bigquery_pipeline_spark.functions.vectors import norm
from etl_bigquery_pipeline_spark.functions.coercion import (
    exact_sum,
    to_double_or_null,
)
from etl_bigquery_pipeline_spark.operators import (
    cleaning,
    dedup,
    layout,
    pq,
    quality_model,
    scd,
    schema_ops,
    sessionize,
    similarity,
    windows,
)
from etl_bigquery_pipeline_spark.operators.partitioning import widen_if_narrow
from etl_bigquery_pipeline_spark.plans import dq
from etl_bigquery_pipeline_spark.sources.readers import read_table

QueryFn = Callable[[SparkSession, str], DataFrame]
QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# ===================================================================
# Tier 1 — reference parity (SURVEY.md §2)
# ===================================================================

# ---- flagship: scan + group-agg + exact sums (A1/A3/A4 shapes) ----

_FLAGSHIP_ORACLE = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       MIN(l_shipdate) AS min_shipdate,
       MAX(l_shipdate) AS max_shipdate
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


@query("flagship_sales_rollup", _FLAGSHIP_ORACLE)
def flagship_sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped rollup: the reference's multi-aggregate single-scan
    pattern (/root/reference/dags/etl_pipeline.py:327-334, :414-421) over
    the fact table. One scan, map-side partial aggs, 6-group shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        exact_sum("l_quantity").alias("sum_qty"),
        exact_sum("l_extendedprice").alias("sum_base_price"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        )
        .cast("double")
        .alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.min("l_shipdate").alias("min_shipdate"),
        F.max("l_shipdate").alias("max_shipdate"),
    )


# ---- A1/B4: row counts ----

_ROW_COUNTS_SQL = """
SELECT (SELECT COUNT(*) FROM region)    AS region_rows,
       (SELECT COUNT(*) FROM nation)    AS nation_rows,
       (SELECT COUNT(*) FROM customer)  AS customer_rows,
       (SELECT COUNT(*) FROM supplier)  AS supplier_rows,
       (SELECT COUNT(*) FROM part)      AS part_rows,
       (SELECT COUNT(*) FROM orders)    AS orders_rows,
       (SELECT COUNT(*) FROM lineitem)  AS lineitem_rows,
       (SELECT COUNT(*) FROM events)    AS events_rows,
       (SELECT COUNT(*) FROM documents) AS documents_rows,
       (SELECT COUNT(*) FROM embeddings) AS embeddings_rows
"""


@query("table_row_counts", _ROW_COUNTS_SQL)
def table_row_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/B4: emptiness probes for every table; parquet row-group metadata
    answers these without reading data pages."""
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        _t(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_ROW_COUNTS_SQL)


# ---- A2: COUNTIF null scans ----

_NULL_COUNTS_ORACLE = """
SELECT COUNT(*) AS n_rows,
       COUNT(*) FILTER (WHERE o_custkey IS NULL)       AS nulls_o_custkey,
       COUNT(*) FILTER (WHERE o_totalprice IS NULL)    AS nulls_o_totalprice,
       COUNT(*) FILTER (WHERE o_orderdate IS NULL)     AS nulls_o_orderdate,
       COUNT(*) FILTER (WHERE o_orderpriority IS NULL) AS nulls_o_orderpriority
FROM orders
"""


@query("null_counts_orders", _NULL_COUNTS_ORACLE)
def null_counts_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: the reference's per-column COUNTIF(IS NULL) validation
    (/root/reference/dags/etl_pipeline.py:327-350) — all columns in ONE
    scan via a single .agg()."""
    o = _t(spark, sf_dir, "orders")
    cols = ["o_custkey", "o_totalprice", "o_orderdate", "o_orderpriority"]
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.count_if(F.col(c).isNull()).alias(f"nulls_{c}") for c in cols],
    )


# ---- D2/D3 + A3: duplicate-key groups ----

_DUP_PK_ORACLE = """
SELECT COUNT(*) AS dup_groups,
       CAST(COALESCE(MAX(c), 0) AS BIGINT) AS max_group_size
FROM (SELECT COUNT(*) AS c FROM lineitem
      GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)
"""


@query("dup_groups_lineitem_pk", _DUP_PK_ORACLE)
def dup_groups_lineitem_pk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2: uniqueness of the fact's natural key — GROUP BY/HAVING>1 probe
    (/root/reference/dags/etl_pipeline.py:364-369). Expect zero groups."""
    li = _t(spark, sf_dir, "lineitem")
    groups = dedup.duplicate_key_groups(li, ["l_orderkey", "l_linenumber"])
    return groups.agg(
        F.count(F.lit(1)).alias("dup_groups"),
        F.coalesce(F.max("duplicate_count"), F.lit(0).cast("bigint")).alias(
            "max_group_size"
        ),
    )


_MULTI_LINE_ORACLE = """
SELECT COUNT(*) AS dup_groups,
       CAST(COALESCE(MAX(c), 0) AS BIGINT) AS max_group_size
FROM (SELECT COUNT(*) AS c FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) > 1)
"""


@query("dup_groups_orderkey", _MULTI_LINE_ORACLE)
def dup_groups_orderkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same duplicate-group detector on a key that IS duplicated
    (multi-line orders) — proves the probe counts groups, not rows
    (SURVEY.md §7.5 semantics note)."""
    li = _t(spark, sf_dir, "lineitem")
    groups = dedup.duplicate_key_groups(li, ["l_orderkey"])
    return groups.agg(
        F.count(F.lit(1)).alias("dup_groups"),
        F.coalesce(F.max("duplicate_count"), F.lit(0).cast("bigint")).alias(
            "max_group_size"
        ),
    )


# ---- J1: referential integrity via anti join ----

_ORPHAN_LI_ORACLE = """
SELECT COUNT(*) AS n_orphans
FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_partkey IS NULL
"""


@query("orphan_lineitem_part", _ORPHAN_LI_ORACLE)
def orphan_lineitem_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: the reference's LEFT JOIN ... IS NULL orphan probe
    (/root/reference/dags/etl_pipeline.py:396-402) as a broadcast LEFT ANTI
    join — the dimension never shuffles the fact table."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey")
    )
    orphans = li.join(F.broadcast(part), "l_partkey", "left_anti")
    return orphans.agg(F.count(F.lit(1)).alias("n_orphans"))


_NO_ORDER_ORACLE = """
SELECT COUNT(*) AS n_customers_no_orders
FROM customer c LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
  ON c.c_custkey = o.o_custkey
WHERE o.o_custkey IS NULL
"""


@query("customers_without_orders", _NO_ORDER_ORACLE)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join with a non-empty result — customers absent from orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return c.join(o, "c_custkey", "left_anti").agg(
        F.count(F.lit(1)).alias("n_customers_no_orders")
    )


# ---- A4/A5 + B1-B3: range checks ----

_RANGE_LI_ORACLE = """
SELECT MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
       MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
       MIN(l_discount) AS min_disc, MAX(l_discount) AS max_disc,
       COUNT(*) FILTER (WHERE l_quantity < 0) AS negative_qty_rows
FROM lineitem
"""


@query("range_lineitem", _RANGE_LI_ORACLE)
def range_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 + B1/B2: all MIN/MAX bounds and the violation count in one scan
    (/root/reference/dags/etl_pipeline.py:414-435)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_discount").alias("min_disc"),
        F.max("l_discount").alias("max_disc"),
        F.count_if(F.col("l_quantity") < 0).alias("negative_qty_rows"),
    )


_RANGE_PART_ORACLE = """
SELECT MIN(p_retailprice) AS min_price, MAX(p_retailprice) AS max_price,
       COUNT(*) FILTER (WHERE p_retailprice <= 0) AS non_positive_rows
FROM part
"""


@query("range_part_price", _RANGE_PART_ORACLE)
def range_part_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 + B3: dimension price range; strictly-positive rule uses <=
    (/root/reference/dags/etl_pipeline.py:445-449)."""
    p = _t(spark, sf_dir, "part")
    return p.agg(
        F.min("p_retailprice").alias("min_price"),
        F.max("p_retailprice").alias("max_price"),
        F.count_if(F.col("p_retailprice") <= 0).alias("non_positive_rows"),
    )


# ---- D1: full-row distinct ----

_DISTINCT_PART_ORACLE = """
SELECT (SELECT COUNT(*) FROM part) AS n_rows,
       (SELECT COUNT(*) FROM (SELECT DISTINCT * FROM part)) AS n_distinct
"""


@query("distinct_part_rows", _DISTINCT_PART_ORACLE)
def distinct_part_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: drop_duplicates row parity
    (/root/reference/dags/etl_pipeline.py:176-182)."""
    p = _t(spark, sf_dir, "part")
    total = p.agg(F.count(F.lit(1)).alias("n_rows"))
    distinct = cleaning.drop_exact_duplicates(p).agg(
        F.count(F.lit(1)).alias("n_distinct")
    )
    return total.crossJoin(distinct)


# ---- P5-P7: coerce-to-null casts (roundtrip evidence) ----

_COERCE_ORACLE = """
SELECT COUNT(*) AS n_rows,
       COUNT(*) FILTER (WHERE try_strptime(strftime(l_shipdate, '%Y-%m-%d'), '%Y-%m-%d') IS NULL) AS n_date_null,
       CAST(SUM(CAST(TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS DECIMAL(18,4))) AS DOUBLE) AS qty_roundtrip_sum,
       COUNT(*) FILTER (WHERE TRY_CAST(l_returnflag AS DOUBLE) IS NULL) AS n_flag_unparseable
FROM lineitem
"""


@query("coercion_roundtrip", _COERCE_ORACLE)
def coercion_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5-P7: pandas errors='coerce' semantics
    (/root/reference/dags/etl_pipeline.py:137-139) — valid strings parse
    back losslessly, garbage coerces to null instead of raising (ANSI mode
    stays on; try_* expressions carry the semantics)."""
    li = _t(spark, sf_dir, "lineitem")
    date_str = F.date_format("l_shipdate", "yyyy-MM-dd")
    reparsed = F.try_to_timestamp(date_str, F.lit("yyyy-MM-dd"))
    qty_str = F.col("l_quantity").cast("string")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(reparsed.isNull()).alias("n_date_null"),
        F.sum(to_double_or_null(qty_str).cast("decimal(18,4)"))
        .cast("double")
        .alias("qty_roundtrip_sum"),
        F.count_if(to_double_or_null(F.col("l_returnflag")).isNull()).alias(
            "n_flag_unparseable"
        ),
    )


# ---- P1-P4: packed-column split / positional schema ----

_SPLIT_ORACLE = """
WITH packed AS (
  SELECT p_partkey, p_brand || '|' || p_type || '|' || CAST(p_size AS VARCHAR) AS packed
  FROM part)
SELECT p_partkey,
       split_part(packed, '|', 1) AS brand,
       split_part(packed, '|', 2) AS type,
       CAST(split_part(packed, '|', 3) AS BIGINT) AS size
FROM packed
"""


@query("split_packed_column", _SPLIT_ORACLE)
def split_packed_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: the comma-packed-column repair
    (/root/reference/dags/etl_pipeline.py:126-129) — pack part attributes
    into one delimited string, then split positionally back into typed
    columns. Pure projection; collapses into the scan."""
    p = _t(spark, sf_dir, "part")
    packed = p.select(
        "p_partkey",
        F.concat_ws(
            "|", "p_brand", "p_type", F.col("p_size").cast("string")
        ).alias("packed"),
    )
    return packed.select(
        "p_partkey",
        F.split_part(F.col("packed"), F.lit("|"), F.lit(1)).alias("brand"),
        F.split_part(F.col("packed"), F.lit("|"), F.lit(2)).alias("type"),
        F.split_part(F.col("packed"), F.lit("|"), F.lit(3))
        .cast("bigint")
        .alias("size"),
    )


# ---- P8: dropna ----

_DROPNA_ORACLE = """
SELECT COUNT(*) AS n_kept
FROM part
WHERE (CASE WHEN p_size % 3 = 0 THEN NULL ELSE p_name END) IS NOT NULL
"""


@query("clean_dropna", _DROPNA_ORACLE)
def clean_dropna(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: df.dropna() row-drop semantics
    (/root/reference/dags/etl_pipeline.py:142-144) over a synthetically
    dirtied column (testdata has no natural nulls)."""
    p = _t(spark, sf_dir, "part").withColumn(
        "dirty",
        F.when(F.col("p_size") % 3 == 0, F.lit(None)).otherwise(
            F.col("p_name")
        ),
    )
    kept = cleaning.drop_null_rows(p)
    return kept.agg(F.count(F.lit(1)).alias("n_kept"))


# ===================================================================
# Tier 1.5 — relational breadth beyond the reference (sorts, windows,
# set ops, multi-joins, rollup) — SURVEY.md §2.8 gap list
# ===================================================================

_TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
"""


@query("topk_orders", _TOPK_ORACLE)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k with a total order (tie-break on key): Spark plans this as
    TakeOrderedAndProject — no global sort materializes."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


_WINDOW_RANK_ORACLE = """
SELECT p_brand, p_partkey, p_retailprice, rnk FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
              ORDER BY p_retailprice DESC, p_partkey ASC) AS BIGINT) AS rnk
  FROM part)
WHERE rnk <= 3
"""


@query("window_rank_parts", _WINDOW_RANK_ORACLE)
def window_rank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function: per-brand top-3 by price, total-ordered."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return (
        p.select(
            "p_brand",
            "p_partkey",
            "p_retailprice",
            F.row_number().over(w).cast("bigint").alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


_EXCEPT_ORACLE = """
SELECT COUNT(*) AS n FROM (
  SELECT c_custkey FROM customer
  EXCEPT
  SELECT o_custkey FROM orders)
"""


@query("set_except_customers", _EXCEPT_ORACLE)
def set_except_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation (EXCEPT distinct): customer keys never seen in
    orders."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return c.subtract(o).agg(F.count(F.lit(1)).alias("n"))


_SEGMENT_ORACLE = """
SELECT c_mktsegment,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(DISTINCT o_orderkey) AS n_orders,
       COUNT(*) AS n_rows
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_mktsegment
"""


@query("revenue_by_segment", _SEGMENT_ORACLE)
def revenue_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped multi-join: customer ⋈ orders ⋈ lineitem. customer
    broadcasts (small dim); orders⋈lineitem co-shuffle on orderkey."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
    )
    return joined.groupBy("c_mktsegment").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        )
        .cast("double")
        .alias("revenue"),
        F.countDistinct("o_orderkey").alias("n_orders"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_ROLLUP_ORACLE = """
SELECT r_name, n_name,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS acctbal_sum
FROM region
JOIN nation   ON r_regionkey = n_regionkey
JOIN customer ON n_nationkey = c_nationkey
GROUP BY ROLLUP (r_name, n_name)
"""


@query("rollup_region_nation", _ROLLUP_ORACLE)
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical aggregate (ROLLUP): region -> nation -> grand total."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    joined = r.join(n, r.r_regionkey == n.n_regionkey).join(
        c, n.n_nationkey == c.c_nationkey
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        exact_sum("c_acctbal").alias("acctbal_sum"),
    )


# ===================================================================
# Tier 2 — LLM training-data pipeline operators (north star)
# ===================================================================

# ---- exact dedup over documents (planted duplicates) ----

_DEDUP_EXACT_ORACLE = """
WITH docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 25)
SELECT MIN(doc_id) AS doc_id
FROM docs
GROUP BY md5(trim(regexp_replace(text, '\\s+', ' ', 'g')))
"""


@query("dedup_exact_documents", _DEDUP_EXACT_ORACLE)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (whitespace-insensitive) dedup: plant 25 duplicate docs with
    shifted ids, dedup by content hash keeping the lowest id. Output is the
    surviving ids — exactly the original corpus. Shuffle key = 32-char md5."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    corpus = d.unionAll(planted)
    return dedup.dedup_exact_text(corpus, "doc_id", "text").select("doc_id")


# ---- MinHash + LSH near-dup (planted near-duplicates) ----

_MINHASH_ORACLE = """
WITH docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text || ' zzz extra' FROM documents WHERE doc_id < 25),
toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM docs),
sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(t[i:i+2], ' ')
                        for i in generate_series(1, greatest(len(t) - 2, 1))]) AS s
  FROM toks),
sig AS (
  -- four 8-hex (32-bit) minhash lanes per md5 digest (seed k uses digest
  -- k//4, offset (k%4)*8) — mirrors _signatures_from_shingles
  SELECT doc_id, s,
         [list_min([substring(md5(CAST(k // 4 AS VARCHAR) || ':' || x),
                              (k % 4) * 8 + 1, 8) for x in s])
          for k in generate_series(0, 15)] AS sg
  FROM sh),
bands AS (
  SELECT doc_id, gs.b AS band,
         md5(CAST(gs.b AS VARCHAR) || '|' || array_to_string(sg[gs.b*4+1 : gs.b*4+4], ',')) AS band_key
  FROM sig CROSS JOIN generate_series(0, 3) AS gs(b)),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM bands l JOIN bands r
    ON l.band_key = r.band_key AND l.band = r.band AND l.doc_id < r.doc_id),
scored AS (
  SELECT id_a, id_b,
         round(len(list_intersect(a.s, b.s)) /
               (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard_sim
  FROM cand JOIN sh a ON cand.id_a = a.doc_id JOIN sh b ON cand.id_b = b.doc_id)
SELECT id_a, id_b, jaccard_sim FROM scored WHERE jaccard_sim >= 0.6
"""


@query("minhash_near_dup_pairs", _MINHASH_ORACLE)
def minhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16)+LSH(4 bands) near-dup pairs, exact-Jaccard verified at
    >=0.6, over the corpus plus 25 planted near-duplicates (same text with
    a 2-token suffix). The oracle replays the identical md5-based pipeline
    in SQL — signatures match hash-for-hash."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz extra")).alias("text"),
    )
    corpus = d.unionAll(planted)
    return dedup.minhash_near_dup_pairs(
        corpus, "doc_id", "text",
        num_hashes=16, bands=4, shingle_n=3, threshold=0.6,
        # exact-recall parity with the SQL replay: no hot-bucket cap here.
        # Production callers keep the default (1000) — documented opt-out.
        max_band_bucket=None,
    )


# ---- blocked exact n-gram Jaccard ----

_NGRAM_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(t[i:i+2], ' ')
                        for i in generate_series(1, greatest(len(t) - 2, 1))]) AS s
  FROM toks),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         round(len(list_intersect(a.s, b.s)) /
               (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard_sim
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id AND b.doc_id - a.doc_id <= 100)
SELECT id_a, id_b, jaccard_sim FROM pairs WHERE jaccard_sim >= 0.2
"""


@query("ngram_jaccard_pairs", _NGRAM_ORACLE)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard over id-distance-blocked pairs — the
    verification/oracle path for LSH (all-pairs is deliberately not
    offered; see operators.dedup)."""
    d = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(
        d, "doc_id", "text", shingle_n=3, threshold=0.2, block_width=100
    )


# ---- SimHash fingerprints ----


def _simhash_oracle(nibbles: int = 15) -> str:
    hexs = "0123456789abcdef"
    nib_exprs = []
    for p in range(nibbles):
        bits = []
        for j in (3, 2, 1, 0):
            ones = (
                f"len(list_filter(th, h -> "
                f"(((strpos('{hexs}', substring(h, {p + 1}, 1)) - 1) >> {j}) & 1) = 1))"
            )
            bits.append(f"(CASE WHEN 2 * {ones} > nt THEN 1 ELSE 0 END)")
        nib = f"({bits[0]}*8 + {bits[1]}*4 + {bits[2]}*2 + {bits[3]})"
        nib_exprs.append(f"substring('{hexs}', {nib} + 1, 1)")
    concat = " || ".join(nib_exprs)
    return f"""
WITH t AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
  FROM documents),
h AS (
  SELECT doc_id, [substring(md5(x), 1, {nibbles}) for x in toks] AS th,
         len(toks) AS nt
  FROM t)
SELECT doc_id, {concat} AS simhash FROM h
"""


@query("simhash_fingerprints", _simhash_oracle())
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per document as a 15-nibble hex string; md5 bit-table
    formulation is engine-reproducible (oracle generated from the same
    loop). JVM higher-order functions only — no shuffle, no UDF."""
    d = _t(spark, sf_dir, "documents")
    return dedup.with_simhash(d, "text", nibbles=15).select("doc_id", "simhash")


# ---- similarity search: brute-force cosine top-k ----

_DIM = 64


def _cosine_sql(a: str, b: str) -> str:
    dot = (
        f"list_sum([CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) "
        f"for i in generate_series(1, {_DIM})])"
    )
    na = (
        f"sqrt(list_sum([CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE) "
        f"for i in generate_series(1, {_DIM})]))"
    )
    nb = (
        f"sqrt(list_sum([CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) "
        f"for i in generate_series(1, {_DIM})]))"
    )
    return f"round({dot} / ({na} * {nb}), 6)"


# ANN/recall/eval query panels are FIXED-SIZE, not corpus-proportional:
# every Nth vector UP TO AN ID CAP. A recall/top-k gate gets no more
# statistically useful with a proportional panel, but its exact arm pays
# |panel| x |corpus| — proportional panels make every such gate QUADRATIC
# in scale. Measured at the sf10 (100x bench) rehearsal before the cap:
# lsh_recall_vs_exact cost 298x for 100x data (1.5s -> 448s). The cap
# binds only above ~sf5 (vec_id < 102400 covers every vector at driver
# and bench scales, embeddings Nv = 20k x sf), so oracle results are
# bit-identical where the driver compares; at 100x it pins the panels at
# 4096/2048/1024 queries (moduli 25/50/100) and the exact arms go linear.
_ANN_PANEL_MAX_ID = 102400


def _ann_panel(emb: DataFrame, modulus: int) -> DataFrame:
    return emb.filter(
        (F.col("vec_id") % modulus == 0)
        & (F.col("vec_id") < _ANN_PANEL_MAX_ID)
    )


_TOPK_SIM_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id % 50 = 0 AND vec_id < {_ANN_PANEL_MAX_ID}),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
s AS (
  SELECT query_id, neighbor_id, {_cosine_sql("qv", "cv")} AS sim
  FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
r AS (
  SELECT query_id, neighbor_id, sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY sim DESC, neighbor_id ASC) AS BIGINT) AS rnk
  FROM s)
SELECT query_id, neighbor_id, sim, rnk FROM r WHERE rnk <= 5
"""


@query("similarity_topk", _TOPK_SIM_ORACLE)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 over the fixed query panel: broadcast
    queries x one corpus scan, JVM-side double accumulation, window rank
    over (rounded sim desc, id asc)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = _ann_panel(emb, 50)
    out = similarity.cosine_topk(
        emb, queries, k=5, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id",
    )
    return out.select(
        "query_id", "neighbor_id", "sim", F.col("rank").cast("bigint").alias("rnk")
    )


# ---- embedding near-dup via hyperplane LSH (planted dups) ----


def _lsh_bucket_sql(vec: str, *, bits: int = 4, seed: int = 42) -> str:
    from etl_bigquery_pipeline_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(_DIM, bits=bits, seed=seed)
    out = []
    for plane in planes:
        arr = "[" + ", ".join(f"{x!r}" for x in plane) + "]"
        dot = (
            f"list_sum([CAST({vec}[i] AS DOUBLE) * ({arr})[i] "
            f"for i in generate_series(1, {_DIM})])"
        )
        out.append(f"(CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END)")
    return " || ".join(out)


# Banded hyperplane LSH parameters shared by the Spark query, the sf0.01
# oracle below, and the sf10 materialized-panel override
# (scripts/oracle_overrides.py) — keep all three in lockstep.
_EMB_ND_BANDS = 4
_EMB_ND_BAND_BITS = 12
_EMB_ND_THRESHOLD = 0.99


def _emb_near_dup_oracle_sql() -> str:
    """Banded near-dup oracle: per-band equi-joins UNION'd (dedup), then
    one exact rounded cosine per candidate. The per-coordinate prefilter
    uses the slacked conservative bound (similarity.near_dup_cbound), so
    it cannot drop a pair the rounded-cosine filter would keep — it only
    thins the candidate set DuckDB has to score."""
    from etl_bigquery_pipeline_spark.operators.similarity import near_dup_cbound

    cb = near_dup_cbound(_EMB_ND_THRESHOLD)
    band_cols = ",\n        ".join(
        f"{_lsh_bucket_sql('embedding', bits=_EMB_ND_BAND_BITS, seed=42 + i)} AS b{i}"
        for i in range(_EMB_ND_BANDS)
    )
    nrm = (
        f"sqrt(list_sum([CAST(embedding[i] AS DOUBLE)"
        f" * CAST(embedding[i] AS DOUBLE)"
        f" for i in generate_series(1, {_DIM})]))"
    )
    arms = "\n  UNION\n".join(
        f"""  SELECT l.vec_id AS id_a, r.vec_id AS id_b
  FROM b l JOIN b r ON l.b{i} = r.b{i} AND l.vec_id < r.vec_id
    AND abs(l.nv1 - r.nv1) <= {cb!r} AND abs(l.nv2 - r.nv2) <= {cb!r}"""
        for i in range(_EMB_ND_BANDS)
    )
    return f"""
WITH vecs AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000,
         list_concat([CAST(embedding[1] + 0.01 AS FLOAT)], embedding[2:{_DIM}])
  FROM embeddings WHERE vec_id < 10),
b AS (SELECT vec_id, embedding,
        {band_cols},
        {nrm} AS nrm,
        CAST(embedding[1] AS DOUBLE) / nrm AS nv1,
        CAST(embedding[2] AS DOUBLE) / nrm AS nv2
      FROM vecs),
cand AS (
{arms}),
p AS (
  SELECT c.id_a, c.id_b,
         round(list_sum([CAST(va.embedding[i] AS DOUBLE)
                         * CAST(vb.embedding[i] AS DOUBLE)
                         for i in generate_series(1, {_DIM})])
               / (va.nrm * vb.nrm), 6) AS cosine_sim
  FROM cand c
  JOIN b va ON va.vec_id = c.id_a
  JOIN b vb ON vb.vec_id = c.id_b)
SELECT id_a, id_b, cosine_sim FROM p WHERE cosine_sim >= {_EMB_ND_THRESHOLD}
"""


_EMB_NEAR_DUP_ORACLE = _emb_near_dup_oracle_sql()


@query("embedding_near_dup_pairs", _EMB_NEAR_DUP_ORACLE)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup via BANDED random-hyperplane LSH self-join
    (4 independent 12-bit codes, union of band collisions, exact-dot
    verify), over the corpus plus 10 planted near-identical vectors
    (first component +0.01). Seeded hyperplanes are shipped to the
    oracle as literals, so banding matches bit-for-bit."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    mutated = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.concat(
            F.array((F.col("embedding").getItem(0) + F.lit(0.01)).cast("float")),
            F.slice("embedding", 2, _DIM - 1),
        ).alias("embedding"),
    )
    corpus = emb.unionAll(mutated)
    return similarity.embedding_near_dup_pairs(
        corpus, id_col="vec_id", vec_col="embedding",
        threshold=_EMB_ND_THRESHOLD, dim=_DIM,
        bands=_EMB_ND_BANDS, band_bits=_EMB_ND_BAND_BITS, seed=42,
    )


# ---- text analysis ----

_TOKEN_STATS_ORACLE = r"""
WITH t AS (
  SELECT lang,
         len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS n_tok,
         len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS n_bpe,
         length(text) AS n_chars
  FROM documents)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       ROUND(AVG(n_tok), 4) AS avg_tokens,
       ROUND(AVG(n_bpe), 4) AS avg_bpe_tokens,
       ROUND(AVG(n_chars), 4) AS avg_chars
FROM t GROUP BY lang
"""


@query("token_stats_by_lang", _TOKEN_STATS_ORACLE)
def token_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex) rolled up per language."""
    d = _t(spark, sf_dir, "documents")
    stats = d.select(
        "lang",
        TX.token_count("text").alias("n_tok"),
        TX.word_token_count("text").alias("n_bpe"),
        F.length("text").alias("n_chars"),
    )
    return stats.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
        F.round(F.avg("n_bpe"), 4).alias("avg_bpe_tokens"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


_QUALITY_ORACLE = r"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
  FROM documents),
s AS (
  SELECT doc_id,
         CASE WHEN length(text) BETWEEN 50 AND 20000 THEN 0.4 ELSE 0.0 END AS len_ok,
         least(len(list_filter(toks, x -> list_contains(['the','a','of','and','to'], lower(x))))
               / greatest(len(toks), 1) * 4.0, 1.0) * 0.4 AS sw,
         least((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))
               / greatest(length(text), 1) * 2.0, 0.2) AS pp
  FROM t)
SELECT doc_id, round(len_ok + sw + 0.2 - pp, 4) AS quality FROM s
"""


@query("quality_scores", _QUALITY_ORACLE)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality score per document (length band + stopword ratio
    - punctuation noise), fully SQL-expressible so the oracle replays the
    identical arithmetic."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", TX.quality_score("text", "en").alias("quality"))


_FINGERPRINT_ORACLE = r"""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(
           list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> ''))), ' ')) AS fp
FROM documents
"""


@query("doc_fingerprints", _FINGERPRINT_ORACLE)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-invariant bag-of-words fingerprint (md5 of sorted distinct
    lowercase tokens)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", TX.fingerprint("text").alias("fp"))


# ---- events: JSON column ops ----

_JSON_ORACLE = """
WITH e AS (
  SELECT event_type, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(k) AS BIGINT) AS k_sum,
       ROUND(AVG(k), 4) AS k_avg,
       COUNT(*) FILTER (WHERE k IS NULL) AS k_nulls
FROM e GROUP BY event_type
"""


@query("json_extract_events", _JSON_ORACLE)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column extraction (props is a JSON string column) with
    coerce-to-null numeric cast, aggregated per event type."""
    e = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("k_sum"),
            F.round(F.avg("k"), 4).alias("k_avg"),
            F.count_if(F.col("k").isNull()).alias("k_nulls"),
        )
    )


# ---- events: tumbling / sliding windows ----

_TUMBLING_ORACLE = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS value_sum,
       MIN(value) AS value_min, MAX(value) AS value_max
FROM events GROUP BY 1, 2
"""


@query("events_tumbling_hourly", _TUMBLING_ORACLE)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h window x event_type (batch form; streaming twin in
    streaming/events.py)."""
    e = _t(spark, sf_dir, "events")
    return windows.tumbling_agg(e, ts_col="ts", unit="hour")


_SLIDING_ORACLE = """
WITH w AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, event_type, value FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', event_type, value FROM events)
SELECT window_start, event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS value_sum
FROM w GROUP BY 1, 2
"""


@query("events_sliding_1h_30m", _SLIDING_ORACLE)
def events_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1h window / 30m slide): every event lands in 2
    windows; oracle models the same via a 2-way offset union."""
    e = _t(spark, sf_dir, "events")
    return windows.sliding_agg(
        e, ts_col="ts", window="1 hour", slide="30 minutes"
    )


# ---- events: sessionization ----

_SESSION_ORACLE = """
WITH e AS (
  SELECT user_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events),
f AS (
  SELECT *, CASE WHEN prev IS NULL OR ts - prev > INTERVAL '30 minutes'
                 THEN 1 ELSE 0 END AS brk
  FROM e),
g AS (
  SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM f)
SELECT user_id, session_seq, COUNT(*) AS n_events,
       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS span_us,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS value_sum
FROM g GROUP BY user_id, session_seq
"""


@query("sessionization", _SESSION_ORACLE)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands sessionization (30-min inactivity gap) + per-session
    rollup — the oracle-checked batch twin of the streaming session_window."""
    e = _t(spark, sf_dir, "events")
    return sessionize.session_stats(
        e, user_col="user_id", ts_col="ts", gap_minutes=30,
        value_col="value", order_cols=("event_id",),
    )


# ---- DQ report as a query ----

_DQ_REPORT_ORACLE = """
SELECT 'row_count' AS check_name, 'lineitem' AS tbl,
       CASE WHEN (SELECT COUNT(*) FROM lineitem) >= 1 THEN 'PASS' ELSE 'FAIL' END AS status,
       'critical' AS severity
UNION ALL
SELECT 'null_check', 'lineitem',
       CASE WHEN (SELECT COUNT(*) FILTER (WHERE l_orderkey IS NULL OR l_quantity IS NULL
                  OR l_extendedprice IS NULL) FROM lineitem) = 0 THEN 'PASS' ELSE 'FAIL' END,
       'critical'
UNION ALL
SELECT 'range_l_quantity', 'lineitem',
       CASE WHEN (SELECT MIN(l_quantity) >= 0 FROM lineitem) THEN 'PASS' ELSE 'FAIL' END,
       'critical'
UNION ALL
SELECT 'range_l_discount', 'lineitem',
       CASE WHEN (SELECT MIN(l_discount) >= 0 AND MAX(l_discount) <= 1 FROM lineitem)
            THEN 'PASS' ELSE 'FAIL' END,
       'critical'
UNION ALL
SELECT 'dup_l_orderkey_l_linenumber', 'lineitem',
       CASE WHEN (SELECT COUNT(*) FROM (SELECT 1 AS x FROM lineitem
                  GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)) = 0
            THEN 'PASS' ELSE 'FAIL' END,
       'warning'
UNION ALL
SELECT 'ref_integrity_l_partkey', 'lineitem',
       CASE WHEN (SELECT COUNT(*) FROM lineitem l LEFT JOIN part p
                  ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL) = 0
            THEN 'PASS' ELSE 'FAIL' END,
       'warning'
"""


@query("dq_report_lineitem", _DQ_REPORT_ORACLE)
def dq_report_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full DQ framework (B1-B6) run against lineitem: scalar checks
    fused into one scan, dup-key probe, broadcast-anti-join FK check —
    emitted as the reference's validation report
    (/root/reference/dags/etl_pipeline.py:453-469)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    results = dq.TableChecks(
        table="lineitem",
        df=li,
        scalar=[
            dq.row_count_check(),
            dq.null_check(["l_orderkey", "l_quantity", "l_extendedprice"]),
            dq.range_check("l_quantity", min_allowed=0),
            dq.range_check("l_discount", min_allowed=0, max_allowed=1),
        ],
        duplicate_keys=[["l_orderkey", "l_linenumber"]],
    ).run()
    results.append(
        dq.referential_integrity_check(
            li,
            part.select(F.col("p_partkey").alias("l_partkey")),
            "l_partkey",
            fact_name="lineitem",
        )
    )
    return dq.report_df(spark, results).select(
        F.col("check").alias("check_name"),
        F.col("table").alias("tbl"),
        "status",
        "severity",
    )


# ===================================================================
# Tier 1.6 — further relational breadth (set ops, cube, windows,
# pivot/unpivot, semi joins, scalar subqueries)
# ===================================================================

_INTERSECT_ORACLE = """
SELECT
  (SELECT COUNT(*) FROM ((SELECT DISTINCT c_nationkey FROM customer)
                         INTERSECT
                         (SELECT DISTINCT s_nationkey FROM supplier))) AS nations_both,
  (SELECT COUNT(*) FROM ((SELECT DISTINCT c_nationkey FROM customer)
                         UNION
                         (SELECT DISTINCT s_nationkey FROM supplier))) AS nations_either
"""


@query("set_intersect_union_nations", _INTERSECT_ORACLE)
def set_intersect_union_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: INTERSECT / UNION (distinct) over nation keys."""
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk")
    )
    both = c.intersect(s).agg(F.count(F.lit(1)).alias("nations_both"))
    either = c.union(s).distinct().agg(
        F.count(F.lit(1)).alias("nations_either")
    )
    return both.crossJoin(either)


_CUBE_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


@query("cube_orders", _CUBE_ORACLE)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregate: all 4 grouping-set combinations in one pass."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        exact_sum("o_totalprice").alias("total"),
    )


_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@query("grouping_sets_orders", _GROUPING_SETS_SQL)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (identical SQL runs on both engines)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_GROUPING_SETS_SQL)


_SEMI_ORACLE = """
SELECT COUNT(*) AS n_customers_with_orders
FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
"""


@query("semi_join_customers", _SEMI_ORACLE)
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS/IN): the complement of the orphan anti-join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return c.join(o, "c_custkey", "left_semi").agg(
        F.count(F.lit(1)).alias("n_customers_with_orders")
    )


_SCALAR_SUBQ_ORACLE = """
SELECT COUNT(*) AS n_above_avg
FROM orders WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
"""


@query("scalar_subquery_filter", _SCALAR_SUBQ_ORACLE)
def scalar_subquery_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery predicate: orders above the mean price."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SCALAR_SUBQ_ORACLE)


_LAG_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice,
       LAG(o_totalprice)  OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@query("window_lag_running_orders", _LAG_ORACLE)
def window_lag_running_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead + running (exact decimal) sum per customer order history."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("running_total"),
    )


_PIVOT_ORACLE = """
SELECT user_id % 10 AS user_bucket,
       COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
       COUNT(*) FILTER (WHERE event_type = 'view')     AS view,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
       COUNT(*) FILTER (WHERE event_type = 'error')    AS error
FROM events GROUP BY 1
"""


@query("pivot_event_counts", _PIVOT_ORACLE)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: event-type counts per user bucket (explicit value list keeps
    the plan one-pass; Spark otherwise scans once to discover values)."""
    e = _t(spark, sf_dir, "events")
    out = (
        e.withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves null for empty cells; the oracle FILTER yields 0
    return out.na.fill(0, ["click", "view", "purchase", "signup", "error"])


_UNPIVOT_ORACLE = """
SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS val FROM part
UNION ALL
SELECT p_partkey, 'p_retailprice', p_retailprice FROM part
"""


@query("unpivot_part_measures", _UNPIVOT_ORACLE)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide measures to long (id, measure, val) form."""
    p = _t(spark, sf_dir, "part").withColumn(
        "p_size_d", F.col("p_size").cast("double")
    )
    out = p.unpivot(
        ["p_partkey"],
        ["p_size_d", "p_retailprice"],
        "measure",
        "val",
    )
    return out.withColumn(
        "measure",
        F.when(F.col("measure") == "p_size_d", F.lit("p_size")).otherwise(
            F.col("measure")
        ),
    )


# ---- as-of (point-in-time) join & range join over events ----

_ASOF_ORACLE = """
WITH se AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN event_type = 'signup' THEN ts END AS sig_ts
  FROM events WHERE event_type IN ('signup', 'error')),
w AS (
  SELECT *, MAX(sig_ts) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS last_signup_ts
  FROM se)
SELECT event_id, user_id, ts, last_signup_ts
FROM w WHERE event_type = 'error'
"""


@query("asof_join_error_signup", _ASOF_ORACLE)
def asof_join_error_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no native one): for each error event, the most
    recent signup of the same user at-or-before it. Union-the-streams +
    running MAX over (ts, id) — one shuffle on user_id, linear scan; the
    scalable point-in-time-join formulation (no per-row range probe)."""
    e = _t(spark, sf_dir, "events")
    se = e.filter(F.col("event_type").isin("signup", "error")).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "signup", F.col("ts")).alias("sig_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        se.withColumn("last_signup_ts", F.max("sig_ts").over(w))
        .filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "ts", "last_signup_ts")
    )


_RANGE_JOIN_ORACLE = """
WITH s AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup')
SELECT s.event_id, s.user_id,
       COUNT(e.event_id) AS n_following_events
FROM s LEFT JOIN events e
  ON e.user_id = s.user_id
 AND e.ts > s.ts AND e.ts <= s.ts + INTERVAL '1 hour'
GROUP BY s.event_id, s.user_id
"""


@query("range_join_signup_followups", _RANGE_JOIN_ORACLE)
def range_join_signup_followups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: events within 1h after each signup, per user.
    Planned as an equi hash join on user_id with the time band as residual
    filter — never a nested-loop over time."""
    e = _t(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("s_event_id"),
            F.col("user_id").alias("s_user_id"),
            F.col("ts").alias("s_ts"),
        )
        .alias("s")
    )
    r = e.select(
        F.col("event_id").alias("r_event_id"),
        F.col("user_id").alias("r_user_id"),
        F.col("ts").alias("r_ts"),
    ).alias("r")
    joined = s.join(
        r,
        (F.col("r.r_user_id") == F.col("s.s_user_id"))
        & (F.col("r.r_ts") > F.col("s.s_ts"))
        & (F.col("r.r_ts") <= F.col("s.s_ts") + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return (
        joined.groupBy("s_event_id", "s_user_id")
        .agg(F.count(F.col("r.r_event_id")).alias("n_following_events"))
        .select(
            F.col("s_event_id").alias("event_id"),
            F.col("s_user_id").alias("user_id"),
            "n_following_events",
        )
    )


# ---- scalar-function breadth (string / date / math) ----

_STRING_FN_ORACLE = """
SELECT p_partkey,
       upper(p_name)                         AS up,
       lower(p_brand)                        AS lo,
       substring(p_name, 1, 5)               AS sub5,
       replace(p_name, ' ', '_')             AS underscored,
       lpad(p_brand, 12, '*')                AS padded,
       CAST(length(p_name) AS BIGINT)        AS name_len,
       reverse(p_type)                       AS rev,
       concat_ws('/', p_brand, p_type)       AS joined,
       CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END AS has_a,
       split_part(p_type, ' ', 1)            AS first_word
FROM part
"""


@query("string_functions_part", _STRING_FN_ORACLE)
def string_functions_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar-function surface (P2/P3 family + the common library)."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.substring("p_name", 1, 5).alias("sub5"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("underscored"),
        F.lpad("p_brand", 12, "*").alias("padded"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.reverse("p_type").alias("rev"),
        F.concat_ws("/", "p_brand", "p_type").alias("joined"),
        F.when(F.col("p_name").like("%a%"), F.lit(1)).otherwise(F.lit(0)).alias("has_a"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("first_word"),
    )


_DATE_FN_ORACLE = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT)    AS yr,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       CAST(month(o_orderdate) AS BIGINT)   AS mo,
       CAST(day(o_orderdate) AS BIGINT)     AS dom,
       CAST(o_orderdate + INTERVAL '30 days' AS DATE) AS plus30,
       last_day(CAST(o_orderdate AS DATE))  AS month_end,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98
FROM orders
"""


@query("date_functions_orders", _DATE_FN_ORACLE)
def date_functions_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date scalar-function surface (P5 family + arithmetic)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.quarter("o_orderdate").cast("bigint").alias("qtr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("dom"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("plus30"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.datediff(
            F.lit("1998-01-01").cast("date"), F.col("o_orderdate").cast("date")
        ).cast("bigint").alias("days_to_98"),
    )


_MATH_FN_ORACLE = """
SELECT l_orderkey, l_linenumber,
       abs(l_extendedprice - 50000.0)         AS dev,
       CAST(ceil(l_quantity) AS BIGINT)       AS qty_ceil,
       CAST(floor(l_discount * 100) AS BIGINT) AS disc_pct,
       round(sqrt(l_extendedprice), 6)        AS price_sqrt,
       round(ln(l_extendedprice), 6)          AS price_ln,
       round(pow(l_discount, 2), 6)           AS disc_sq,
       CAST(sign(l_extendedprice - 50000.0) AS BIGINT) AS above_mid,
       CAST(l_orderkey % 7 AS BIGINT)         AS key_mod
FROM lineitem
"""


@query("math_functions_lineitem", _MATH_FN_ORACLE)
def math_functions_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar-function surface; transcendentals rounded to 6 (libm vs
    JVM may differ in the last ulp)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000.0).alias("dev"),
        F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
        F.floor(F.col("l_discount") * 100).cast("bigint").alias("disc_pct"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        F.round(F.pow(F.col("l_discount"), 2), 6).alias("disc_sq"),
        F.signum(F.col("l_extendedprice") - 50000.0).cast("bigint").alias("above_mid"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod"),
    )


# ---- language-ID heuristic as a query (confusion matrix) ----


def _lang_guess_oracle() -> str:
    from etl_bigquery_pipeline_spark.functions.text import STOPWORDS

    langs = sorted(STOPWORDS)
    score_cols = []
    for lang in langs:
        markers = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        score_cols.append(
            f"len(list_filter(toks, x -> list_contains([{markers}], x))) AS s_{lang}"
        )
    # replicate the Spark-side sequential fold: start with the first
    # language, replace only on strictly-greater score
    first, rest = langs[0], langs[1:]
    guess_expr = f"'{first}'"
    best_expr = f"s_{first}"
    for lang in rest:
        guess_expr = (
            f"CASE WHEN s_{lang} > {best_expr} THEN '{lang}' ELSE {guess_expr} END"
        )
        best_expr = f"greatest({best_expr}, s_{lang})"
    return f"""
WITH t AS (
  SELECT lang,
         list_transform(list_filter(regexp_split_to_array(text, '\\s+'),
                                    x -> x <> ''), x -> lower(x)) AS toks
  FROM documents),
s AS (SELECT lang, {", ".join(score_cols)} FROM t)
SELECT lang, {guess_expr} AS lang_guess, COUNT(*) AS n_docs
FROM s GROUP BY 1, 2
"""


@query("lang_id_confusion", _lang_guess_oracle())
def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (stopword-marker argmax) vs the labeled lang —
    a confusion matrix. The oracle replays the identical sequential fold,
    so ties resolve identically."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("lang", TX.lang_guess("text").alias("lang_guess"))
        .groupBy("lang", "lang_guess")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ===================================================================
# Approximate operators — no SQL oracle by design (driver records a
# rows-only check); exact-vs-approx bounds are asserted in pytest
# ===================================================================


@query("approx_distinct_orders")
def approx_distinct_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counts next to exact ones. Approx sketches
    are the 100 TB path (mergeable, single pass, no giant hash table);
    engine-specific sketch values can't be oracle-matched, so this is a
    rows-only entry with bounds asserted in tests/test_approx.py."""
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.approx_count_distinct("o_custkey", 0.02).alias("approx_custkeys"),
        F.countDistinct("o_custkey").alias("exact_custkeys"),
        F.approx_count_distinct("o_orderkey", 0.02).alias("approx_orderkeys"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query("lsh_cosine_topk")
def lsh_cosine_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbors via random-hyperplane LSH buckets —
    the scale path next to the exact similarity_topk (recall measured in
    tests/test_approx.py)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = _ann_panel(emb, 50)
    out = similarity.lsh_cosine_topk(
        emb, queries, k=5, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id", dim=64, bits=4, seed=42,
    )
    return out.select(
        "query_id", "neighbor_id", "sim",
        F.col("rank").cast("bigint").alias("rnk"),
    )


# ---- array & map column functions over embeddings/events ----

_ARRAY_FN_ORACLE = f"""
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       round(list_sum([CAST(embedding[i] AS DOUBLE) for i in generate_series(1, 8)]), 6) AS head8_sum,
       round(CAST(list_max(embedding) AS DOUBLE), 6) AS max_elem,
       round(CAST(list_min(embedding) AS DOUBLE), 6) AS min_elem,
       CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive,
       round(CAST(embedding[1] AS DOUBLE) + CAST(embedding[{_DIM}] AS DOUBLE), 6) AS ends_sum
FROM embeddings
"""


@query("array_functions_embeddings", _ARRAY_FN_ORACLE)
def array_functions_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-column surface: size/slice/min/max/filter/element_at over the
    embedding vectors — all JVM higher-order functions."""
    e = _t(spark, sf_dir, "embeddings")
    head8 = F.aggregate(
        F.slice("embedding", 1, 8),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double"),
    )
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(head8, 6).alias("head8_sum"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_elem"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("min_elem"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("bigint").alias("n_positive"),
        F.round(
            F.element_at("embedding", 1).cast("double")
            + F.element_at("embedding", _DIM).cast("double"),
            6,
        ).alias("ends_sum"),
    )


_MAP_FN_ORACLE = """
WITH m AS (
  SELECT event_id, CAST(props AS JSON) AS j FROM events)
SELECT event_id,
       CAST(len(json_keys(j)) AS BIGINT) AS n_keys,
       array_to_string(list_sort(json_keys(j)), ',') AS keys_sorted,
       TRY_CAST(json_extract_string(j, '$.k') AS BIGINT) AS k_value
FROM m
"""


@query("map_functions_events", _MAP_FN_ORACLE)
def map_functions_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-column surface: parse the JSON props into map<string,string>,
    then map_keys/element_at (maps themselves can't be hash-compared
    across engines, so outputs are scalars/sorted keys)."""
    e = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return e.select(
        "event_id",
        F.size(F.map_keys(m)).cast("bigint").alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.element_at(m, "k").try_cast("bigint").alias("k_value"),
    )


@query("ivf_cosine_topk")
def ivf_cosine_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (trained-centroid) approximate nearest neighbors — the
    data-adaptive scale path next to hyperplane LSH (recall compared in
    tests/test_approx.py). Rows-only: k-means cells are not
    SQL-replicable."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = _ann_panel(emb, 50)
    out = similarity.ivf_cosine_topk(
        emb, queries, k=5, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id", nlist=16, nprobe=4, seed=42,
    )
    return out.select(
        "query_id", "neighbor_id", "sim",
        F.col("rank").cast("bigint").alias("rnk"),
    )


# ---- approx-quality gates: recall/error bounds as driver-checkable rows ----
#
# The approx operators above are rows-only (engine-specific sketch values /
# candidate sets can't be value-matched). These companion queries make the
# QUALITY driver-enforceable: each computes its bound entirely in Spark and
# emits a single row of booleans, with a trivial `SELECT true` oracle — a
# regression in recall or sketch error now fails the driver sweep, not just
# the local pytest bounds (tests/test_approx.py keeps the measured values).


def _recall_ok(exact: DataFrame, approx: DataFrame, floor: float) -> DataFrame:
    """(recall >= floor) over (query_id, neighbor_id) pair sets, one row."""
    ex = exact.select("query_id", "neighbor_id")
    ap = approx.select("query_id", "neighbor_id").withColumn("__hit", F.lit(1))
    return (
        ex.join(ap, ["query_id", "neighbor_id"], "left")
        .agg(
            (
                F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
                / F.count(F.lit(1))
            ).alias("__recall")
        )
        .select((F.col("__recall") >= floor).alias("recall_ok"))
    )


@query("lsh_recall_vs_exact", "SELECT true AS recall_ok")
def lsh_recall_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-enforceable LSH quality gate: recall of the multi-probe LSH
    top-5 against the exact top-5 must hold its floor (0.2 for 4-bit
    hyperplanes on weakly-clustered 64-dim data; measured values live in
    tests/test_approx.py). Emits one boolean row so the oracle is trivial
    while the bound itself is computed in Spark."""
    exact = QUERIES["similarity_topk"](spark, sf_dir)
    approx = QUERIES["lsh_cosine_topk"](spark, sf_dir)
    return _recall_ok(exact, approx, 0.2)


@query("ivf_recall_vs_exact", "SELECT true AS recall_ok")
def ivf_recall_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-enforceable IVF quality gate: trained-centroid cells follow
    the data distribution, so nprobe/nlist = 1/4 of the corpus must
    recover >= 0.3 of the exact top-5 (comfortably above the scanned
    fraction on clustered data)."""
    exact = QUERIES["similarity_topk"](spark, sf_dir)
    approx = QUERIES["ivf_cosine_topk"](spark, sf_dir)
    return _recall_ok(exact, approx, 0.3)


@query("lsh_index_probe_matches", "SELECT true AS probe_matches")
def lsh_index_probe_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-ANN-index gate: build the bucketed LSH index table once
    (operators/ann_index.py), probe it, and require the probe to match the
    in-memory lsh_cosine_topk value-for-value (same candidates, same
    scoring — the persisted path just bucket-prunes the scan and never
    shuffles the corpus; plan asserted in tests/test_ann_index.py).
    Emits one boolean row with a trivial oracle."""
    from etl_bigquery_pipeline_spark.operators import ann_index

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = _ann_panel(emb, 50)
    ann_index.build_lsh_index(
        emb, "ann_lsh_catalog", dim=_DIM, bits=4, seed=42
    )
    got = ann_index.probe_lsh_index(spark, "ann_lsh_catalog", queries_df, k=5)
    want = similarity.lsh_cosine_topk(
        emb, queries_df, k=5, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id", dim=_DIM, bits=4, seed=42,
    )
    diff = got.exceptAll(want).unionAll(want.exceptAll(got))
    return diff.agg((F.count(F.lit(1)) == 0).alias("probe_matches"))


@query("approx_distinct_error", "SELECT true AS error_ok")
def approx_distinct_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-enforceable HLL++ error gate: |approx - exact| must stay
    within a 3-sigma-ish bound of the configured rsd (0.02 -> 6%)."""
    row = QUERIES["approx_distinct_orders"](spark, sf_dir)
    return row.select(
        (
            F.abs(F.col("approx_custkeys") - F.col("exact_custkeys"))
            <= 0.06 * F.col("exact_custkeys")
        ).alias("error_ok")
    )


# ---- corpus statistics: TF-IDF keywords, top n-grams, canonical docs ----

_TFIDF_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS t
  FROM documents),
n_docs AS (SELECT COUNT(*) AS n FROM toks),
tf AS (
  SELECT doc_id, unnest(t) AS term FROM toks),
tf_counts AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tf GROUP BY doc_id, term),
df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf_counts.doc_id, tf_counts.term,
         round(tf_counts.tf * ln((SELECT n FROM n_docs) / df.df), 6) AS tfidf
  FROM tf_counts JOIN df ON tf_counts.term = df.term),
ranked AS (
  SELECT doc_id, term, tfidf,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY tfidf DESC, term ASC) AS BIGINT) AS rnk
  FROM scored)
SELECT doc_id, term, tfidf, rnk FROM ranked WHERE rnk <= 3
"""


@query("tfidf_keywords", _TFIDF_ORACLE)
def tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document. Explode -> tf counts -> df counts
    (broadcast back) -> score -> per-doc window rank. The df table is
    vocabulary-sized, so the join is a broadcast at any corpus scale."""
    d = _t(spark, sf_dir, "documents")
    # widen the one-split scan before tokenizing (tf and df paths both
    # re-run the projection; tokenization is cheap enough that width, not
    # caching, is what matters here). No-op on wide inputs — the body
    # never shuffles at scale.
    toks = widen_if_narrow(d, "doc_id").select(
        "doc_id", TX.tokens(F.lower(F.col("text"))).alias("t")
    )
    # n_docs as a 1-row aggregate cross-joined into scoring (the
    # sanctioned scalar pattern) — no separate count() action, so the
    # whole query is one job and the corpus is tokenized one less time.
    # The count scans only doc_id, not text.
    n_docs = d.agg(F.count(F.lit(1)).cast("double").alias("__n_docs"))
    tf = (
        toks.select("doc_id", F.explode("t").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_counts = tf.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    scored = (
        tf.join(F.broadcast(df_counts), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("__n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tfidf", "rnk")
    )


_TOP_NGRAMS_ORACLE = """
WITH toks AS (
  SELECT lang, list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '') AS t
  FROM documents),
grams AS (
  SELECT lang,
         unnest([array_to_string(t[i:i+1], ' ')
                 for i in generate_series(1, greatest(len(t) - 1, 1))]) AS gram
  FROM toks),
counts AS (
  SELECT lang, gram, COUNT(*) AS n FROM grams GROUP BY lang, gram),
ranked AS (
  SELECT lang, gram, n,
         CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, gram ASC) AS BIGINT) AS rnk
  FROM counts)
SELECT lang, gram, n, rnk FROM ranked WHERE rnk <= 5
"""


@query("top_bigrams_by_lang", _TOP_NGRAMS_ORACLE)
def top_bigrams_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 word bigrams per language: shingle -> explode -> count ->
    window rank. The heavy groupBy key is (lang, gram) — partial
    aggregation absorbs the explosion map-side."""
    d = _t(spark, sf_dir, "documents")
    # widen the one-split scan before the ngram projection (no-op at
    # scale); tokens materialize first — see decontamination's note
    grams = (
        widen_if_narrow(d, "doc_id")
        .select("lang", TX.tokens(F.lower(F.col("text"))).alias("__toks"))
        .select("lang", F.explode(TX.ngrams_of(F.col("__toks"), 2)).alias("gram"))
    )
    counts = grams.groupBy("lang", "gram").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("gram").asc())
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 5)
    )


_CANONICAL_ORACLE = """
WITH toks AS (
  SELECT doc_id, text, lang,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS tk
  FROM documents),
q AS (
  SELECT doc_id, lang,
         md5(array_to_string(list_sort(list_distinct(
             list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> ''))), ' ')) AS fp,
         round(
           (CASE WHEN length(text) BETWEEN 50 AND 20000 THEN 0.4 ELSE 0.0 END)
           + least(len(list_filter(tk, x -> list_contains(['the','a','of','and','to'], lower(x))))
                   / greatest(len(tk), 1) * 4.0, 1.0) * 0.4
           + 0.2
           - least((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                   / greatest(length(text), 1) * 2.0, 0.2), 4) AS quality
  FROM toks),
ranked AS (
  SELECT doc_id, lang, fp, quality,
         ROW_NUMBER() OVER (PARTITION BY fp ORDER BY quality DESC, doc_id ASC) AS rn
  FROM q)
SELECT doc_id, lang, fp, quality FROM ranked WHERE rn = 1
"""


@query("canonical_docs_by_fingerprint", _CANONICAL_ORACLE)
def canonical_docs_by_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-best dedup: one canonical document per bag-of-words
    fingerprint, chosen by quality score (ties -> lowest id) — the
    composition of fingerprinting + quality scoring a real training-data
    pipeline runs."""
    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        TX.fingerprint("text").alias("fp"),
        TX.quality_score("text", "en").alias("quality"),
    )
    w = Window.partitionBy("fp").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "fp", "quality")
    )


# ---- DQ catching seeded violations (statuses must flip to FAIL) ----

_DQ_DIRTY_ORACLE = """
WITH dirty AS (
  SELECT CASE WHEN l_orderkey % 97 = 0 THEN NULL ELSE l_orderkey END AS l_orderkey,
         l_linenumber,
         CASE WHEN l_orderkey % 101 = 0 THEN -l_quantity ELSE l_quantity END AS l_quantity,
         l_extendedprice
  FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
  FROM lineitem WHERE l_orderkey % 103 = 0)
SELECT 'null_check' AS check_name,
       CASE WHEN (SELECT COUNT(*) FILTER (WHERE l_orderkey IS NULL) FROM dirty) = 0
            THEN 'PASS' ELSE 'FAIL' END AS status
UNION ALL
SELECT 'range_l_quantity',
       CASE WHEN (SELECT MIN(l_quantity) >= 0 FROM dirty) THEN 'PASS' ELSE 'FAIL' END
UNION ALL
SELECT 'dup_l_orderkey_l_linenumber',
       CASE WHEN (SELECT COUNT(*) FROM (SELECT 1 AS x FROM dirty
                  WHERE l_orderkey IS NOT NULL
                  GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)) = 0
            THEN 'PASS' ELSE 'FAIL' END
UNION ALL
SELECT 'row_count',
       CASE WHEN (SELECT COUNT(*) FROM dirty) >= 1 THEN 'PASS' ELSE 'FAIL' END
"""


@query("dq_catches_seeded_violations", _DQ_DIRTY_ORACLE)
def dq_catches_seeded_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DQ framework against a deterministically-dirtied fact table
    (seeded nulls, negative amounts, duplicated keys): null/range/dup
    checks must flip to FAIL, proving detection rather than
    trivially-green data."""
    li = _t(spark, sf_dir, "lineitem")
    dirty = li.select(
        F.when(F.col("l_orderkey") % 97 == 0, F.lit(None))
        .otherwise(F.col("l_orderkey"))
        .alias("l_orderkey"),
        "l_linenumber",
        F.when(F.col("l_orderkey") % 101 == 0, -F.col("l_quantity"))
        .otherwise(F.col("l_quantity"))
        .alias("l_quantity"),
        "l_extendedprice",
    ).unionAll(
        li.filter(F.col("l_orderkey") % 103 == 0).select(
            "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
        )
    )
    results = dq.TableChecks(
        table="dirty",
        df=dirty,
        scalar=[
            dq.row_count_check(),
            dq.null_check(["l_orderkey"]),
            dq.range_check("l_quantity", min_allowed=0),
        ],
        duplicate_keys=[],
    ).run()
    # dup probe on non-null keys (the seeded nulls are a different check)
    n_dup = (
        dedup.duplicate_key_groups(
            dirty.filter(F.col("l_orderkey").isNotNull()),
            ["l_orderkey", "l_linenumber"],
        ).count()
    )
    results.append(
        dq.CheckResult(
            "dup_l_orderkey_l_linenumber",
            "dirty",
            n_dup == 0,
            dq.Severity.WARNING,
            n_dup,
            f"duplicate groups: {n_dup}",
        )
    )
    return dq.report_df(spark, results).select(
        F.col("check").alias("check_name"), "status"
    )


# ---- distinct aggregates & null-handling expression breadth ----

_DISTINCT_AGG_ORACLE = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS uniq_parts,
       COUNT(DISTINCT l_suppkey) AS uniq_supps,
       CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_distinct_qty,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


@query("distinct_aggregates", _DISTINCT_AGG_ORACLE)
def distinct_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple DISTINCT aggregates in one grouped pass (expand-based
    plan); SUM(DISTINCT) over decimal for exactness."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("uniq_parts"),
        F.countDistinct("l_suppkey").alias("uniq_supps"),
        F.sum_distinct(F.col("l_quantity").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_distinct_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_COND_ORACLE = """
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 200000 THEN 'high'
            WHEN o_totalprice >= 100000 THEN 'mid'
            ELSE 'low' END AS price_band,
       COALESCE(NULLIF(o_orderpriority, '1-URGENT'), 'URGENT!') AS priority_remap,
       greatest(o_totalprice, 150000.0) AS floor_price,
       least(o_totalprice, 150000.0)    AS cap_price,
       CASE WHEN o_orderstatus = 'F' THEN NULL ELSE o_totalprice END AS open_price,
       CAST(o_totalprice IS NULL AS INT) + CAST(o_custkey IS NULL AS INT) AS null_flags
FROM orders
"""


@query("conditional_expressions", _COND_ORACLE)
def conditional_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/COALESCE/NULLIF/greatest/least/null-flag expression surface."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 200000, F.lit("high"))
        .when(F.col("o_totalprice") >= 100000, F.lit("mid"))
        .otherwise(F.lit("low"))
        .alias("price_band"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")),
            F.lit("URGENT!"),
        ).alias("priority_remap"),
        F.greatest("o_totalprice", F.lit(150000.0)).alias("floor_price"),
        F.least("o_totalprice", F.lit(150000.0)).alias("cap_price"),
        F.when(F.col("o_orderstatus") == "F", F.lit(None))
        .otherwise(F.col("o_totalprice"))
        .alias("open_price"),
        (
            F.col("o_totalprice").isNull().cast("int")
            + F.col("o_custkey").isNull().cast("int")
        ).alias("null_flags"),
    )


_NTILE_ORACLE = """
SELECT o_orderkey, o_custkey,
       CAST(NTILE(4) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS price_quartile,
       FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate, o_orderkey) AS first_order,
       CAST(floor(CUME_DIST() OVER (ORDER BY o_totalprice, o_orderkey) * 10000) AS BIGINT) AS cume_bps
FROM orders
"""


@query("window_ntile_firstvalue", _NTILE_ORACLE)
def window_ntile_firstvalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / first_value / cume_dist window breadth (cume_dist scaled to
    integer basis points to avoid float-representation drift).

    The two *global* windows (ntile over price desc, cume_dist over price
    asc) are NOT expressed as bare ``Window.orderBy`` — that plans a
    single-partition WindowExec. Instead each becomes a distributed global
    row number (``windows.with_global_row_number``: range shuffle +
    per-partition offsets) and the window function is recovered in closed
    form: the orderings are made unique by the ``o_orderkey`` tie-break,
    so ``cume_dist == rn / N`` exactly and NTILE(4) is pure arithmetic on
    ``(rn, N)``. One range shuffle serves BOTH orderings: the descending
    rank over (price desc, key asc) follows from the ascending one via a
    price-partitioned window — for a row in price tie-group g,
    ``rn_desc = N - max(rn_asc in g) + (rn_asc - min(rn_asc in g)) + 1``
    (rows pricier than g, then position within g by key asc). The naive
    alternative (a second range shuffle on the desc order) is wrong to
    pay for: the tie-group window shuffles the same columns once and
    reuses the first pass. ``first_value`` stays an ordinary partitioned
    window.
    """
    o = _t(spark, sf_dir, "orders")
    w_cust = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    base = o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.first("o_orderkey").over(w_cust).alias("first_order"),
    )
    with_asc, n_rows = windows.with_global_row_number(
        base,
        ["o_totalprice", "o_orderkey"],
        rn_col="__rn_cume",
    )
    w_tie = Window.partitionBy("o_totalprice")
    with_both = with_asc.withColumn(
        "__rn_price",
        F.lit(n_rows)
        - F.max("__rn_cume").over(w_tie)
        + F.col("__rn_cume")
        - F.min("__rn_cume").over(w_tie)
        + 1,
    )
    return with_both.select(
        "o_orderkey",
        "o_custkey",
        windows.ntile_from_row_number(
            F.col("__rn_price"), n_rows, 4
        ).alias("price_quartile"),
        "first_order",
        # same double arithmetic as the oracle's CUME_DIST()*10000 (both
        # engines compute rn/N in IEEE doubles, so floor() agrees at
        # boundaries); explicit floor because DuckDB's double->BIGINT
        # cast rounds while Spark's truncates
        F.floor(
            (F.col("__rn_cume").cast("double") / F.lit(float(n_rows))) * 10000
        )
        .cast("bigint")
        .alias("cume_bps"),
    )


# ---- theta join against a tiny literal dimension ----

_THETA_ORACLE = """
WITH bands(band, lo, hi) AS (
  VALUES ('low', 0.0, 100000.0),
         ('mid', 100000.0, 200000.0),
         ('high', 200000.0, 1e12))
SELECT band, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band
"""


@query("theta_join_price_bands", _THETA_ORACLE)
def theta_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (non-equi) join done right: the only sound plan for an
    arbitrary inequality join is nested-loop — which is exactly correct
    when one side is a literal handful of rows broadcast everywhere."""
    o = _t(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("low", 0.0, 100000.0), ("mid", 100000.0, 200000.0), ("high", 200000.0, 1e12)],
        "band string, lo double, hi double",
    )
    joined = o.join(
        F.broadcast(bands),
        (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_orders"),
        exact_sum("o_totalprice").alias("total"),
    )


# ---- statistical aggregates: exact percentiles + second moments ----

_STATS_ORACLE = """
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       quantile_cont(l_extendedprice, 0.5)  AS p50,
       quantile_cont(l_extendedprice, 0.25) AS p25,
       quantile_cont(l_extendedprice, 0.75) AS p75,
       median(l_quantity) AS qty_median,
       round(corr(l_quantity, l_extendedprice), 6)       AS qty_price_corr,
       round(covar_samp(l_quantity, l_extendedprice), 6) AS qty_price_covar,
       round(stddev_samp(l_extendedprice), 6)            AS price_stddev,
       round(var_samp(l_extendedprice), 4)               AS price_var
FROM lineitem GROUP BY l_returnflag
"""


def _hist_exact_percentiles(
    df: DataFrame, gcol: str | None, vcol: str, ps: list, names: list
) -> DataFrame:
    """Exact interpolated (type-7 / quantile_cont) percentiles computed
    over the VALUE-FREQUENCY HISTOGRAM instead of Spark's percentile()
    buffer.

    percentile()/median() hold a per-group value->count map inside each
    partial-aggregation task — at sf10 (20M+ rows per l_returnflag
    group, 4 exact percentiles at once) that buffer OOMed a 16 GiB
    driver JVM (r8 sweep finding; BufferHolder.grow). The histogram
    form is the scale-correct plan: groupBy(group, value) with map-side
    combine (state bounded by DISTINCT values, not rows), a cumulative
    count over the per-group sorted distinct values (window input is
    the histogram, not the data), then each target order statistic
    located by its cumulative range and interpolated:
    target = (n-1)*p, value = x_lo + (x_hi - x_lo) * frac — exactly
    DuckDB's quantile_cont.

    ``gcol=None`` = UNGROUPED percentiles. The cumulative count then
    runs through ``windows.with_global_running_sums`` (range-partition
    + exact per-partition offsets; integer counts merge exactly, so
    the result is bit-identical) instead of an ordered
    ``partitionBy(lit)`` global window: the histogram of a
    near-continuous column (o_totalprice ~15M distinct at sf10) is
    corpus-proportional, and funnelling it through ONE window task is
    the scale-killer class the plan lint exists to block (r8 verdict
    What's-wrong #1).

    NULLs in ``vcol`` are dropped first, matching percentile() /
    quantile_cont's null-ignoring semantics — a NULL histogram bucket
    would otherwise be counted in ``__n`` yet sort first in the
    cumulative order, silently shifting every percentile (r8 ADVICE).
    """
    df = df.filter(F.col(vcol).isNotNull())
    if gcol is None:
        hist = df.groupBy(F.col(vcol).alias("__v")).agg(
            F.count(F.lit(1)).alias("__c")
        )
        hist = windows.with_global_running_sums(
            hist, ["__v"], ["__c"]
        ).withColumnRenamed("cum___c", "__cum")
        total = hist.agg(F.sum("__c").alias("__n"))
        hist = hist.crossJoin(F.broadcast(total))
        key: list = []
    else:
        # grouped: the same hazard one partitionBy removed — a
        # per-group histogram of a near-continuous column is
        # corpus-proportional, so Window.partitionBy(group) would run
        # each group's millions of histogram rows through ONE task
        # (3 tasks total for l_returnflag at sf10). The grouped
        # range-partitioned running sum spans each group across
        # partitions with exact integer offsets; per-group totals are
        # a tiny aggregate broadcast back.
        hist = df.groupBy(F.col(gcol), F.col(vcol).alias("__v")).agg(
            F.count(F.lit(1)).alias("__c")
        )
        hist = windows.with_grouped_running_sums(
            hist, [gcol], ["__v"], ["__c"]
        ).withColumnRenamed("cum___c", "__cum")
        totals = hist.groupBy(gcol).agg(F.sum("__c").alias("__n"))
        # null-safe: groupBy keeps NULL as its own group, so the totals
        # join must not drop it (plain `=` would silently lose every
        # NULL-group row vs percentile()'s semantics)
        hist = hist.join(
            F.broadcast(totals.withColumnRenamed(gcol, "__g")),
            F.col(gcol).eqNullSafe(F.col("__g")),
        ).drop("__g")
        key = [gcol]
    aggs = []
    for p, nm in zip(ps, names):
        tgt = (F.col("__n") - 1) * F.lit(float(p))
        lo, hi = F.floor(tgt), F.ceil(tgt)
        at = lambda k: F.max(  # noqa: E731 — value holding index k
            F.when(
                ((F.col("__cum") - F.col("__c")) <= k) & (k < F.col("__cum")),
                F.col("__v"),
            )
        )
        aggs += [
            at(lo).alias(f"__{nm}_lo"),
            at(hi).alias(f"__{nm}_hi"),
            F.max(tgt - lo).alias(f"__{nm}_fr"),  # constant per group
        ]
    out = hist.groupBy(*key).agg(*aggs)
    return out.select(
        *key,
        *[
            (
                F.col(f"__{nm}_lo")
                + (F.col(f"__{nm}_hi") - F.col(f"__{nm}_lo"))
                * F.col(f"__{nm}_fr")
            ).alias(nm)
            for nm in names
        ],
    )


@query("stats_aggregates", _STATS_ORACLE)
def stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles/median + second-moment aggregates
    (corr/covar/stddev/var, rounded — moment sums are order-sensitive in
    the last bits). Percentiles are exact quantile_cont values computed
    via `_hist_exact_percentiles` (value-frequency histogram): Spark's
    percentile()/median() buffer a per-group value map inside each
    task, which the r8 sf10 sweep measured dying at 20M+ rows per group
    (Java heap OOM even at 16g) — the histogram plan keeps state
    bounded by distinct values and is identical across engines with no
    rounding. Moments stream (Welford-style) and are unaffected."""
    li = _t(spark, sf_dir, "lineitem")
    moments = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_covar"
        ),
        F.round(F.stddev_samp("l_extendedprice"), 6).alias("price_stddev"),
        F.round(F.var_samp("l_extendedprice"), 4).alias("price_var"),
    )
    price_p = _hist_exact_percentiles(
        li, "l_returnflag", "l_extendedprice", [0.5, 0.25, 0.75],
        ["p50", "p25", "p75"],
    )
    qty_m = _hist_exact_percentiles(
        li, "l_returnflag", "l_quantity", [0.5], ["qty_median"]
    )
    return (
        moments.join(price_p, "l_returnflag")
        .join(qty_m, "l_returnflag")
        .select(
            "l_returnflag", "n_rows", "p50", "p25", "p75", "qty_median",
            "qty_price_corr", "qty_price_covar", "price_stddev", "price_var",
        )
    )


# ---- regex functions, multiset set-ops, posexplode ----

_REGEX_ORACLE = r"""
SELECT p_partkey,
       regexp_extract(p_type, '^(\w+)', 1) AS first_word,
       regexp_extract(p_type, '(\w+)$', 1) AS last_word,
       CASE WHEN regexp_matches(p_type, 'BRASS|COPPER') THEN 1 ELSE 0 END AS is_metal,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
FROM part
"""


@query("regex_functions_part", _REGEX_ORACLE)
def regex_functions_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex surface: group extraction, match predicate, global replace."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_type", r"^(\w+)", 1).alias("first_word"),
        F.regexp_extract("p_type", r"(\w+)$", 1).alias("last_word"),
        F.col("p_type").rlike("BRASS|COPPER").cast("int").alias("is_metal"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
    )


_EXCEPT_ALL_ORACLE = """
SELECT
  (SELECT COUNT(*) FROM (SELECT l_partkey FROM lineitem
                         EXCEPT ALL SELECT p_partkey FROM part)) AS except_all_rows,
  (SELECT COUNT(*) FROM (SELECT l_partkey FROM lineitem
                         INTERSECT ALL SELECT p_partkey FROM part)) AS intersect_all_rows
"""


@query("multiset_set_ops", _EXCEPT_ALL_ORACLE)
def multiset_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL / INTERSECT ALL (bag semantics: occurrence
    counts subtract/min instead of collapsing to distinct)."""
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("k"))
    p = _t(spark, sf_dir, "part").select(F.col("p_partkey").alias("k"))
    ex = li.exceptAll(p).agg(F.count(F.lit(1)).alias("except_all_rows"))
    inter = li.intersectAll(p).agg(
        F.count(F.lit(1)).alias("intersect_all_rows")
    )
    return ex.crossJoin(inter)


_POSEXPLODE_ORACLE = r"""
WITH d AS (SELECT doc_id,
             list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
           FROM documents WHERE doc_id < 50),
e AS (SELECT doc_id,
             unnest([{'pos': i - 1, 'tok': toks[i]}
                     for i in generate_series(1, len(toks))]) AS u
      FROM d)
SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, u.tok AS tok FROM e
"""


@query("posexplode_tokens", _POSEXPLODE_ORACLE)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator/table-function surface: posexplode tokens with ordinal."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id", F.posexplode(TX.tokens("text")).alias("pos", "tok")
    ).select("doc_id", F.col("pos").cast("bigint").alias("pos"), "tok")


# ---- SimHash near-dup pairs (banded + Hamming-verified), oracled ----


def _simhash_pairs_oracle(nibbles: int = 15, band_nibbles: int = 4, max_h: int = 8) -> str:
    hexs = "0123456789abcdef"
    # simhash expression over CTE columns th (token-hash list) / nt (count)
    nib_exprs = []
    for p in range(nibbles):
        bits = []
        for j in (3, 2, 1, 0):
            ones = (
                f"len(list_filter(th, h -> "
                f"(((strpos('{hexs}', substring(h, {p + 1}, 1)) - 1) >> {j}) & 1) = 1))"
            )
            bits.append(f"(CASE WHEN 2 * {ones} > nt THEN 1 ELSE 0 END)")
        nib = f"({bits[0]}*8 + {bits[1]}*4 + {bits[2]}*2 + {bits[3]})"
        nib_exprs.append(f"substring('{hexs}', {nib} + 1, 1)")
    sh_expr = " || ".join(nib_exprs)
    n_bands = nibbles // band_nibbles
    hamming = " + ".join(
        f"bit_count(xor(strpos('{hexs}', substring(sha, {p + 1}, 1)) - 1, "
        f"strpos('{hexs}', substring(shb, {p + 1}, 1)) - 1))"
        for p in range(nibbles)
    )
    return f"""
WITH docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text || ' zzz extra' FROM documents WHERE doc_id < 25),
t AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
  FROM docs),
h AS (
  SELECT doc_id, [substring(md5(x), 1, {nibbles}) for x in toks] AS th,
         len(toks) AS nt
  FROM t),
s AS (SELECT doc_id, {sh_expr} AS sh FROM h),
bands AS (
  SELECT doc_id, sh, gs.b AS band, substring(sh, gs.b * {band_nibbles} + 1, {band_nibbles}) AS bk
  FROM s CROSS JOIN generate_series(0, {n_bands - 1}) AS gs(b)),
cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b, l.sh AS sha, r.sh AS shb
  FROM bands l JOIN bands r
    ON l.band = r.band AND l.bk = r.bk AND l.doc_id < r.doc_id),
scored AS (
  SELECT id_a, id_b, CAST({hamming} AS BIGINT) AS hamming FROM cand)
SELECT id_a, id_b, hamming FROM scored WHERE hamming <= {max_h}
"""


@query("simhash_near_dup_pairs", _simhash_pairs_oracle())
def simhash_near_dup_pairs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs over the corpus + 25 planted near-dups:
    banded hex-prefix blocking, full Hamming verification <= 8 bits. The
    oracle replays the identical bit table in SQL."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz extra")).alias("text"),
    )
    corpus = d.unionAll(planted)
    out = dedup.simhash_near_dup_pairs(
        corpus, "doc_id", "text", max_hamming=8, nibbles=15, band_nibbles=4,
        # exact-recall parity with the SQL replay — see minhash note
        max_band_bucket=None,
    )
    return out.select("id_a", "id_b", F.col("hamming").cast("bigint").alias("hamming"))


# ---- pipeline summary: the whole reference shape in one statement ----

_PIPELINE_SUMMARY_ORACLE = """
SELECT
  (SELECT COUNT(*) FROM lineitem) AS fact_rows,
  (SELECT COUNT(*) FROM part)     AS dim_rows,
  (SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
   FROM lineitem) AS net_revenue,
  (SELECT COUNT(*) FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
   WHERE p.p_partkey IS NULL) AS orphan_rows,
  (SELECT COUNT(*) FILTER (WHERE l_quantity IS NULL OR l_extendedprice IS NULL)
   FROM lineitem) AS null_violations,
  (SELECT COUNT(*) FROM (SELECT 1 AS x FROM lineitem
   GROUP BY l_orderkey, l_linenumber HAVING COUNT(*) > 1)) AS dup_key_groups,
  (SELECT COUNT(*) FILTER (WHERE l_quantity < 0 OR l_extendedprice < 0)
   FROM lineitem) AS range_violations
"""


@query("pipeline_summary", _PIPELINE_SUMMARY_ORACLE)
def pipeline_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference pipeline's full shape as one summary row: load
    counts, revenue rollup, and every DQ dimension (nulls, dup keys,
    orphans, ranges) — the statement a scheduler would alert on."""
    for name in ("lineitem", "part"):
        _t(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_PIPELINE_SUMMARY_ORACLE)


# ---- correlated subqueries (EXISTS / NOT EXISTS / IN) ----

_CORRELATED_SQL = """
SELECT
  (SELECT COUNT(*) FROM orders o
   WHERE EXISTS (SELECT 1 FROM lineitem l
                 WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45))
      AS orders_with_bulk_line,
  (SELECT COUNT(*) FROM orders o
   WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                     WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45))
      AS orders_without_bulk_line,
  (SELECT COUNT(*) FROM part
   WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_discount > 0.09))
      AS parts_sold_at_deep_discount
"""


@query("correlated_subqueries", _CORRELATED_SQL)
def correlated_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS / IN predicates — Catalyst rewrites
    them to semi/anti joins (identical SQL text runs on the oracle)."""
    for name in ("orders", "lineitem", "part"):
        _t(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_CORRELATED_SQL)


# ---- reproducible train/val/test split (md5-bucketed, oracled) ----


def _split_oracle() -> str:
    # hex -> int arithmetically (DuckDB has no conv()): sum of nibble*16^k
    hexs = "0123456789abcdef"
    terms = " + ".join(
        f"(strpos('{hexs}', substring(h, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"""
WITH b AS (
  SELECT doc_id,
         substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) AS h
  FROM documents),
v AS (SELECT doc_id, ({terms}) % 10000 AS bucket FROM b),
s AS (
  SELECT doc_id,
         CASE WHEN bucket < 8000 THEN 'train'
              WHEN bucket < 9000 THEN 'val'
              ELSE 'test' END AS split
  FROM v)
SELECT split, COUNT(*) AS n_docs FROM s GROUP BY split
"""


@query("train_val_test_split", _split_oracle())
def train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 80/10/10 split via md5 key-bucketing
    (operators/sampling.hash_split): membership is a pure function of
    doc_id — stable under any partitioning, any cluster size, any engine
    (the oracle recomputes the same buckets)."""
    from etl_bigquery_pipeline_spark.operators import sampling

    d = _t(spark, sf_dir, "documents")
    out = sampling.hash_split(
        d, "doc_id", weights={"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return out.groupBy("split").agg(F.count(F.lit(1)).alias("n_docs"))


# ---- sequence packing into token budgets (oracled, global order) ----

_PACKING_ORACLE = """
WITH t AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS n_tok
  FROM documents),
c AS (
  SELECT doc_id, n_tok,
         SUM(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM t),
p AS (
  SELECT doc_id, n_tok,
         CAST(FLOOR((cum - n_tok) / 2048) AS BIGINT) AS pack_id
  FROM c)
SELECT pack_id, COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS pack_tokens
FROM p GROUP BY pack_id
"""


@query("token_budget_packing", _PACKING_ORACLE)
def token_budget_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into 2048-token training sequences (streaming
    packing over doc_id order) and report per-pack fill. Runs the
    range-partitioned two-stage form (pack_global_distributed — exact
    row-for-row twin of the serial pack_global reference, integer
    running sums so merge order cannot drift); the relaxed
    maximum-parallelism variant is operators/packing.packed."""
    from etl_bigquery_pipeline_spark.operators import packing
    from etl_bigquery_pipeline_spark.functions.text import token_count

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").alias("n_tok")
    )
    out = packing.pack_global_distributed(
        d, size_col="n_tok", order_by=["doc_id"], budget=2048
    )
    return out.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("pack_tokens"),
    )


# ---- document chunking (fixed token windows with overlap), oracled ----

_CHUNK_ORACLE = """
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
  FROM documents),
n AS (
  SELECT doc_id, toks, len(toks) AS nt,
         greatest(CAST(ceil((len(toks) - 16) / 48.0) AS INT), 1) AS n_chunks
  FROM t),
c AS (
  SELECT doc_id,
         unnest([{'chunk_idx': i,
                  'chunk': array_to_string(toks[i*48 + 1 : i*48 + 64], ' '),
                  'n_tokens': least(nt - i*48, 64)}
                 for i in generate_series(0, n_chunks - 1)]) AS u
  FROM n)
SELECT doc_id, CAST(u.chunk_idx AS INT) AS chunk_idx, u.chunk AS chunk,
       CAST(u.n_tokens AS INT) AS n_tokens
FROM c
"""


@query("document_chunks", _CHUNK_ORACLE)
def document_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk documents into 64-token windows with 16-token overlap
    (stride 48) — one output row per chunk. The pre-tokenization step of
    a training/RAG pipeline; pure projection + explode, no shuffle."""
    d = _t(spark, sf_dir, "documents")
    chunks = TX.token_chunks_of(F.col("__toks"), chunk_tokens=64, overlap=16)
    return d.select(
        "doc_id", TX.tokens("text").alias("__toks")
    ).select("doc_id", F.explode(chunks).alias("c")).select(
        "doc_id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.chunk").alias("chunk"),
        F.col("c.n_tokens").alias("n_tokens"),
    )


# ---- PII redaction & repetition (quality-filter) statistics ----

_PII_ORACLE = r"""
WITH d AS (
  SELECT doc_id,
         text || ' contact bob@example.com or +1-555-123-4567 via https://ex.com/x' AS text
  FROM documents WHERE doc_id < 100),
r AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             'https?://[^\s]+', '<URL>', 'g'),
           '\+?[0-9][0-9()\-\s]{7,}[0-9]', '<PHONE>', 'g') AS redacted
  FROM d)
SELECT doc_id,
       CAST(length(redacted) - length(replace(redacted, '<EMAIL>', substring('<EMAIL>', 2))) AS BIGINT) AS n_emails,
       CAST(length(redacted) - length(replace(redacted, '<URL>', substring('<URL>', 2))) AS BIGINT) AS n_urls,
       CAST(length(redacted) - length(replace(redacted, '<PHONE>', substring('<PHONE>', 2))) AS BIGINT) AS n_phones,
       md5(redacted) AS redacted_hash
FROM r
"""


@query("pii_redaction", _PII_ORACLE)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: emails/URLs/phones replaced with typed placeholders
    (planted PII, since the corpus has none). Counts derive from the
    length delta per placeholder; the md5 of the redacted text pins the
    exact output. Chained regexp_replace — one codegen'd pass."""
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.lit(" contact bob@example.com or +1-555-123-4567 via https://ex.com/x"),
            ).alias("text"),
        )
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.col("text"),
                r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
                "<EMAIL>",
            ),
            r"https?://[^\s]+",
            "<URL>",
        ),
        r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
        "<PHONE>",
    )

    def count_marker(marker: str) -> Column:
        # occurrences = length delta when dropping one char per marker
        return (
            F.length(F.col("redacted"))
            - F.length(F.replace(F.col("redacted"), F.lit(marker), F.lit(marker[1:])))
        ).cast("bigint")

    return d.withColumn("redacted", redacted).select(
        "doc_id",
        count_marker("<EMAIL>").alias("n_emails"),
        count_marker("<URL>").alias("n_urls"),
        count_marker("<PHONE>").alias("n_phones"),
        F.md5("redacted").alias("redacted_hash"),
    )


_REPETITION_ORACLE = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
  FROM documents),
g AS (
  SELECT doc_id, len(toks) AS n_tok,
         CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
         [array_to_string(toks[i:i+1], ' ')
          for i in generate_series(1, greatest(len(toks) - 1, 1))] AS bigrams
  FROM t),
m AS (
  SELECT doc_id, n_tok, n_distinct, len(bigrams) AS n_bigrams,
         (SELECT max(cnt) FROM (
            SELECT COUNT(*) AS cnt FROM unnest(g.bigrams) AS u(b) GROUP BY u.b)) AS max_bigram
  FROM g)
SELECT doc_id,
       round(n_distinct / greatest(n_tok, 1), 6) AS distinct_token_ratio,
       round(max_bigram / greatest(n_bigrams, 1), 6) AS top_bigram_frac
FROM m
"""


@query("repetition_stats", _REPETITION_ORACLE)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: distinct-token ratio and the
    fraction held by the most frequent bigram — the standard
    boilerplate/spam signals for corpus filtering."""
    d = _t(spark, sf_dir, "documents")
    toks = F.col("__toks")
    # widen the one-split scan before the token/bigram projection (no-op
    # on wide at-scale inputs); tokens materialize in their own projection
    # (a tokens() subtree inside the bigram lambda re-evaluates per gram);
    # cache — the max-bigram branch and the final join both consume it
    base = (
        widen_if_narrow(d, "doc_id")
        .select("doc_id", TX.tokens(F.lower(F.col("text"))).alias("__toks"))
        .select(
            "doc_id",
            F.size(toks).alias("n_tok"),
            F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
            TX.ngrams_of(toks, 2).alias("__bg"),
        )
        .transform(scoped_cache)
    )
    # linear formulation: explode -> per-(doc,bigram) counts -> per-doc max
    # (an in-array nested count would be quadratic in document length)
    max_bigram = (
        base.select("doc_id", F.explode("__bg").alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_bigram"))
    )
    return base.join(max_bigram, "doc_id").select(
        "doc_id",
        F.round(
            F.col("n_distinct") / F.greatest(F.col("n_tok"), F.lit(1)), 6
        ).alias("distinct_token_ratio"),
        F.round(
            F.col("max_bigram") / F.greatest(F.size("__bg"), F.lit(1)), 6
        ).alias("top_bigram_frac"),
    )


# ---- composite curation decision (C4/Gopher-style keep/drop) ----

_CURATION_ORACLE = r"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS rtoks,
         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
  FROM documents),
q AS (
  SELECT doc_id,
         round(CASE WHEN length(text) BETWEEN 50 AND 20000 THEN 0.4 ELSE 0.0 END
               + least(len(list_filter(rtoks, x -> list_contains(['the','a','of','and','to'], lower(x))))
                       / greatest(len(rtoks), 1) * 4.0, 1.0) * 0.4
               + 0.2
               - least((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))
                       / greatest(length(text), 1) * 2.0, 0.2), 4) AS quality,
         md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS fp,
         len(toks) AS n_tok,
         round(len(list_distinct(toks)) / greatest(len(toks), 1), 6) AS dtr,
         [array_to_string(toks[i:i+1], ' ')
          for i in generate_series(1, greatest(len(toks) - 1, 1))] AS bigrams
  FROM t),
m AS (
  SELECT *, round((SELECT max(cnt) FROM (
           SELECT COUNT(*) AS cnt FROM unnest(q.bigrams) AS u(b) GROUP BY u.b))
         / greatest(len(bigrams), 1), 6) AS tbf,
         row_number() OVER (PARTITION BY fp ORDER BY quality DESC, doc_id ASC) AS rn
  FROM q),
d AS (
  SELECT doc_id,
         CASE WHEN rn > 1 THEN 'exact_dup'
              WHEN n_tok < 15 THEN 'too_short'
              WHEN quality < 0.55 THEN 'low_quality'
              WHEN dtr < 0.35 OR tbf > 0.2 THEN 'repetitive'
         END AS drop_reason
  FROM m)
SELECT doc_id, drop_reason IS NULL AS keep, drop_reason FROM d
"""


@query("curation_decisions", _CURATION_ORACLE)
def curation_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone curation filter a training-data pipeline runs per
    document: keep/drop plus the FIRST matching drop reason, composed from
    exact-dup canonicalization (bag-of-words fingerprint, keep-best by
    quality), minimum length, heuristic quality, and Gopher-style
    repetition signals. Rule order is fixed (dup > short > quality >
    repetition) so the reason column is deterministic; all thresholds
    apply to the same rounded values the oracle computes.

    Scale shape: one shuffle for the per-(doc,bigram) counts, one for the
    fingerprint window — both on keys that partition evenly (doc_id, fp).
    """
    d = _t(spark, sf_dir, "documents")
    toks = F.col("__toks")
    bigrams = TX.ngrams_of(toks, 2)
    # Widen before the heavy projection (one-split small inputs would run
    # it single-task; wide at-scale inputs pass through untouched);
    # lowercased tokens materialize first so the bigram lambda reads a
    # bound array instead of re-tokenizing per gram; cache: the
    # bigram-count branch and the scored branch both consume it.
    base = (
        widen_if_narrow(d, "doc_id")
        .select(
            "doc_id",
            F.col("text"),
            TX.tokens(F.lower(F.col("text"))).alias("__toks"),
        )
        .select(
            "doc_id",
            TX.quality_score("text", "en").alias("quality"),
            TX.fingerprint("text").alias("fp"),
            F.size(toks).alias("n_tok"),
            F.round(
                F.size(F.array_distinct(toks))
                / F.greatest(F.size(toks), F.lit(1)),
                6,
            ).alias("dtr"),
            F.size(bigrams).alias("n_bigrams"),
            bigrams.alias("__bg"),
        )
        .transform(scoped_cache)
    )
    max_bigram = (
        base.select("doc_id", F.explode("__bg").alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_bigram"))
    )
    scored = base.drop("__bg").join(max_bigram, "doc_id").withColumn(
        "tbf",
        F.round(
            F.col("max_bigram") / F.greatest(F.col("n_bigrams"), F.lit(1)), 6
        ),
    )
    w = Window.partitionBy("fp").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    reason = (
        F.when(F.row_number().over(w) > 1, F.lit("exact_dup"))
        .when(F.col("n_tok") < 15, F.lit("too_short"))
        .when(F.col("quality") < 0.55, F.lit("low_quality"))
        .when(
            (F.col("dtr") < 0.35) | (F.col("tbf") > 0.2), F.lit("repetitive")
        )
    )
    return scored.select(
        "doc_id", reason.alias("drop_reason")
    ).select(
        "doc_id",
        F.col("drop_reason").isNull().alias("keep"),
        "drop_reason",
    )


# ---- benchmark decontamination (n-gram overlap vs held-out eval set) ----

_DECONTAM_ORACLE = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
  FROM documents),
g AS (
  SELECT doc_id,
         list_distinct([array_to_string(toks[i:i+3], ' ')
                        for i in generate_series(1, greatest(len(toks) - 3, 1))]) AS grams
  FROM t),
ev AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 100 = 0),
corp AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 100 <> 0),
sh AS (
  SELECT corp.doc_id, COUNT(*) AS n_shared
  FROM corp JOIN ev USING (gram) GROUP BY corp.doc_id)
SELECT d.doc_id,
       CAST(coalesce(sh.n_shared, 0) AS BIGINT) AS n_shared,
       coalesce(sh.n_shared, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM g WHERE doc_id % 100 <> 0) d
LEFT JOIN sh USING (doc_id)
"""


@query("decontamination", _DECONTAM_ORACLE)
def decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents that share any
    4-gram with a held-out eval set (stand-in: doc_id % 100 == 0), with
    the shared-distinct-gram count. The standard pre-training step that
    keeps eval data out of the training corpus; production widths are
    8-13 grams — 4 here because the synthetic docs are ~50 tokens and
    longer grams never collide (a vacuous check).

    Scale shape: the eval side reduces to a distinct-gram set that is tiny
    relative to the corpus (broadcast-able; at 100 TB you'd md5 the grams
    to a fixed-width join key and still broadcast), so the corpus is
    scanned once with no corpus-side shuffle except the per-doc count.
    """
    d = _t(spark, sf_dir, "documents")
    # tokens in their own projection: a tokens() subtree inside the n-gram
    # lambda re-evaluates per gram (interpreted HOFs) — O(len²)/doc
    grams = d.select(
        "doc_id", TX.tokens(F.lower(F.col("text"))).alias("__toks")
    ).select(
        "doc_id",
        F.array_distinct(TX.ngrams_of(F.col("__toks"), 4)).alias("__grams"),
    )
    ev = (
        grams.filter(F.col("doc_id") % 100 == 0)
        .select(F.explode("__grams").alias("gram"))
        .distinct()
    )
    corp = grams.filter(F.col("doc_id") % 100 != 0)
    shared = (
        corp.select("doc_id", F.explode("__grams").alias("gram"))
        .join(F.broadcast(ev), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return (
        corp.select("doc_id")
        .join(shared, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("__n"), F.lit(0)).alias("n_shared"),
            (F.coalesce(F.col("__n"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


# ===================================================================
# Round-2 breadth: embedding centroids, Pandas-UDF aggregate parity,
# exact percentiles, salted-join equivalence gate
# ===================================================================

_CENTROID_ORACLE = f"""
WITH u AS (
  SELECT label, i AS pos, CAST(embedding[i] AS DOUBLE) AS v
  FROM embeddings, generate_series(1, {_DIM}) AS g(i))
SELECT label, CAST(pos AS BIGINT) AS pos,
       round(avg(v), 6) AS centroid_val,
       CAST(COUNT(*) AS BIGINT) AS n_vectors
FROM u GROUP BY label, pos
"""


@query("embedding_centroids", _CENTROID_ORACLE)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid (elementwise mean) — the building
    block for IVF training at full-corpus scale, class prototypes, and
    drift monitoring. posexplode -> groupBy (label, position) mean: the
    shuffle key is (label, pos) — DIM×labels cells, perfectly even, with
    map-side partial aggregation absorbing the explosion. Emitted as one
    row per (label, pos) scalar; reassemble with
    transform(array_sort(collect_list(struct(pos, val)))) when an array
    column is needed downstream."""
    e = _t(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos0", "v"))
        .groupBy("label", (F.col("pos0") + 1).cast("bigint").alias("pos"))
        .agg(
            F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid_val"),
            F.count(F.lit(1)).alias("n_vectors"),
        )
    )


_TRIMMED_MEAN_ORACLE = """
WITH s AS (
  SELECT c_mktsegment,
         list(c_acctbal ORDER BY c_acctbal) AS l,
         COUNT(*) AS n,
         CAST(floor(COUNT(*) * 0.1) AS BIGINT) AS k
  FROM customer GROUP BY c_mktsegment),
t AS (
  SELECT c_mktsegment,
         CASE WHEN n > 2 * k THEN l[k + 1 : n - k] ELSE l END AS kept,
         n
  FROM s)
SELECT c_mktsegment,
       round(list_avg(kept), 4) AS trimmed_mean,
       CAST(len(kept) AS BIGINT) AS n_used,
       CAST(n AS BIGINT) AS n_total
FROM t
"""


@query("trimmed_mean_acctbal", _TRIMMED_MEAN_ORACLE)
def trimmed_mean_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pandas-UDF (applyInPandas) aggregate path, oracle-checked:
    10%-trimmed mean of customer balance per market segment. Proves the
    Arrow UDAF contract end-to-end against an engine-independent
    definition — the slot a model-scoring UDF drops into. Groups are
    segment-sized (bounded cardinality), the documented applyInPandas
    regime."""
    from etl_bigquery_pipeline_spark.functions.pandas_udfs import (
        trimmed_mean_by_group,
    )

    c = _t(spark, sf_dir, "customer")
    out = trimmed_mean_by_group(
        c, "c_mktsegment", "c_acctbal", trim_frac=0.1
    )
    return out.select(
        "c_mktsegment",
        F.round("trimmed_mean", 4).alias("trimmed_mean"),
        "n_used",
        "n_total",
    )


_PERCENTILE_ORACLE = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
FROM lineitem GROUP BY l_returnflag
"""


@query("percentile_lineitem", _PERCENTILE_ORACLE)
def percentile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per return flag (identical to
    DuckDB `quantile_cont`, linear interpolation), computed via the
    value-frequency histogram (`_hist_exact_percentiles`): Spark's
    percentile() holds a per-group value->count map inside every
    partial-aggregation task — the exact plan that OOMed
    stats_aggregates at sf10 (r8 sweep; this query survived at 77s,
    one decade from the same wall — r8 verdict ask #2). The histogram
    plan bounds task state by distinct values with map-side combine.
    At 100 TB swap in approx_percentile (t-digest sketch, mergeable,
    one pass) and gate it like approx_distinct_error."""
    li = _t(spark, sf_dir, "lineitem")
    names = ["p25", "p50", "p75", "p99"]
    g = _hist_exact_percentiles(
        li, "l_returnflag", "l_extendedprice", [0.25, 0.5, 0.75, 0.99], names
    )
    return g.select(
        "l_returnflag", *[F.round(n, 4).alias(n) for n in names]
    )


@query("salted_join_parity", "SELECT true AS salted_matches")
def salted_join_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate for the skew tooling: salted_join(orders, customer)
    must equal the plain join row-for-row (inner, 8 salt buckets). Emits
    one boolean with a trivial oracle; the skew-spread behavior itself is
    asserted in tests/test_skew.py."""
    from etl_bigquery_pipeline_spark.operators.skew import salted_join

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    plain = o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_mktsegment"
    )
    salted = salted_join(
        o.withColumnRenamed("o_custkey", "k"),
        c.withColumnRenamed("c_custkey", "k"),
        ["k"],
        buckets=8,
    ).select("o_orderkey", "c_mktsegment")
    diff = salted.exceptAll(plain).unionAll(plain.exceptAll(salted))
    return diff.agg((F.count(F.lit(1)) == 0).alias("salted_matches"))


_ROLLING_ORACLE = """
SELECT event_id, user_id,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_trailing_1h,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_trailing_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


@query("events_rolling_1h", _ROLLING_ORACLE)
def events_rolling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-1-hour per-user rolling window (RANGE frame over event
    time): count + exact decimal sum of value — the feature-engineering
    shape (trailing activity counts) that tumbling/sliding windows can't
    express because every event anchors its own frame. One shuffle on
    user_id, then a linear per-user scan; the frame is bounded by the
    time range, not row count, so hot users stay O(events-in-window)."""
    e = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
        F.sum(F.col("value").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("sum_trailing_1h"),
    )


_HISTOGRAM_ORACLE = """
SELECT CAST(floor(p_retailprice / 10) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       round(MIN(p_retailprice), 2) AS lo,
       round(MAX(p_retailprice), 2) AS hi
FROM part GROUP BY 1
"""


@query("price_histogram", _HISTOGRAM_ORACLE)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of part prices (10-unit buckets): the
    single-shuffle distribution profile used before choosing join
    strategies and skew thresholds. Bucket count is bounded by the value
    range — the groupBy key space stays tiny at any data scale."""
    p = _t(spark, sf_dir, "part")
    return (
        p.groupBy(
            F.floor(F.col("p_retailprice") / 10).cast("bigint").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("p_retailprice"), 2).alias("lo"),
            F.round(F.max("p_retailprice"), 2).alias("hi"),
        )
    )


_GAPFILL_ORACLE = """
WITH daily AS (
  SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev,
         COUNT(*) AS n
  FROM orders GROUP BY 1, 2),
b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
spine AS (
  SELECT p.prio, CAST(u.day AS DATE) AS day
  FROM (SELECT DISTINCT prio FROM daily) p
  CROSS JOIN (
    SELECT unnest(generate_series((SELECT lo FROM b), (SELECT hi FROM b),
                                  INTERVAL 1 DAY)) AS day) u)
SELECT s.prio, s.day,
       round(CAST(last_value(d.rev IGNORE NULLS) OVER (
           PARTITION BY s.prio ORDER BY s.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4)
         AS revenue_filled,
       CAST(coalesce(d.n, 0) AS BIGINT) AS n_orders,
       d.rev IS NULL AS gap_filled
FROM spine s LEFT JOIN daily d ON s.prio = d.prio AND s.day = d.day
"""


@query("daily_revenue_gapfilled", _GAPFILL_ORACLE)
def daily_revenue_gapfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine gap filling with forward fill: daily revenue per order
    priority on a dense calendar, missing days carrying the last observed
    value — the reporting/feature-store shape (sequence + explode builds
    the spine; last(ignorenulls) over an ordered window fills).

    Scale shape: the daily aggregate is (priorities x days) rows — tiny at
    any corpus scale — so the spine cross join and the fill window both
    run on aggregated data; the only full-data pass is the first groupBy."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("prio"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("__rev"),
        F.count(F.lit(1)).alias("__n"),
    )
    bounds = daily.agg(
        F.min("day").alias("__lo"), F.max("day").alias("__hi")
    )
    spine = (
        daily.select("prio")
        .distinct()
        .crossJoin(bounds)  # 1-row bounds: sanctioned scalar cross join
        .select(
            "prio",
            F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("day"),
        )
    )
    joined = spine.join(daily, ["prio", "day"], "left")
    w = (
        Window.partitionBy("prio")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "prio",
        "day",
        F.round(
            F.last("__rev", ignorenulls=True).over(w).cast("double"), 4
        ).alias("revenue_filled"),
        F.coalesce(F.col("__n"), F.lit(0)).alias("n_orders"),
        F.col("__rev").isNull().alias("gap_filled"),
    )


@query("approx_percentile_error", "SELECT true AS error_ok")
def approx_percentile_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-enforceable t-digest gate: approx_percentile (the mergeable
    one-pass sketch that replaces exact per-group sorts at 100 TB) must
    land within 1% of the exact interpolated median. Completes the
    approx-family gates next to approx_distinct_error and the ANN recall
    checks."""
    li = _t(spark, sf_dir, "lineitem")
    # the exact arm uses the histogram plan (state bounded by distinct
    # values) — percentile()'s per-task buffer is the r8 sf10 OOM class;
    # gcol=None routes the cumulative count through
    # with_global_running_sums (no single-partition window)
    exact = _hist_exact_percentiles(
        li, None, "l_extendedprice", [0.5], ["__exact"]
    )
    approx = li.agg(
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias(
            "__approx"
        )
    )
    return approx.crossJoin(F.broadcast(exact)).select(
        (
            F.abs(F.col("__approx") - F.col("__exact"))
            <= 0.01 * F.abs(F.col("__exact"))
        ).alias("error_ok")
    )


_FUNNEL_ORACLE = """
WITH clicks AS (
  SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'),
purchases AS (
  SELECT user_id, ts AS buy_ts FROM events WHERE event_type = 'purchase'),
conv AS (
  SELECT c.user_id, c.click_ts, min(p.buy_ts) AS first_buy_ts
  FROM clicks c JOIN purchases p
    ON c.user_id = p.user_id
   AND p.buy_ts > c.click_ts
   AND p.buy_ts <= c.click_ts + INTERVAL 1 HOUR
  GROUP BY c.user_id, c.click_ts)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_converting_clicks,
       ((2 * CAST(SUM(epoch_us(first_buy_ts - click_ts)) AS BIGINT)
         + 100 * COUNT(*)) // (200 * COUNT(*))) / 10000.0
         AS avg_secs_to_buy
FROM conv GROUP BY user_id
"""


@query("funnel_click_to_purchase", _FUNNEL_ORACLE)
def funnel_click_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence funnel: per user, clicks that convert to a purchase
    within 1 hour, with the mean time-to-convert. The range join plans as
    an equi join on user_id plus a time-band residual filter — never a
    product — and the min-per-click aggregate absorbs multiple purchases
    in the window. The standard behavioral-analytics shape (A-then-B
    within T) that windowed aggregates can't express."""
    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("__bu"), F.col("ts").alias("buy_ts")
    )
    conv = (
        clicks.join(
            buys,
            (F.col("user_id") == F.col("__bu"))
            & (F.col("buy_ts") > F.col("click_ts"))
            & (
                F.col("buy_ts")
                <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")
            ),
        )
        .groupBy("user_id", "click_ts")
        .agg(F.min("buy_ts").alias("first_buy_ts"))
    )
    # Exact-integer mean, rounded to 4 decimals in INTEGER arithmetic:
    # the generator's microsecond gaps routinely end in ...50, i.e.
    # exact HALF-ties at the 4th decimal, and round(double, 4) is
    # engine-defined on ties (Spark HALF_UPs the shortest decimal
    # repr, DuckDB rounds the binary value) — five users disagreed at
    # sf1.0 (round-6 sweep). (2*sum_us + 100*n) div (200*n) is
    # half-up in 1e-4-second units with no float in sight; the final
    # /10000.0 is one correctly-rounded IEEE op on identical integers,
    # so both engines emit the identical double. Non-tie values are
    # unchanged vs round(avg, 4).
    agg = conv.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_converting_clicks"),
        F.sum(
            F.unix_micros("first_buy_ts") - F.unix_micros("click_ts")
        ).alias("__us"),
    )
    return agg.select(
        "user_id",
        "n_converting_clicks",
        (
            F.expr(
                "(2 * __us + 100 * n_converting_clicks)"
                " div (200 * n_converting_clicks)"
            )
            / F.lit(10000.0)
        ).alias("avg_secs_to_buy"),
    )


@query("sketch_gates", "SELECT true AS bloom_ok, true AS freq_ok")
def sketch_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gates for the two remaining sketch primitives.

    Bloom filter (df.stat.bloomFilter — the structure behind runtime
    bloom-filter join pruning at scale): must show ZERO false negatives
    over known keys and a false-positive rate within ~5x the configured
    fpp over guaranteed-absent keys. Frequent items (df.stat.freqItems,
    Misra-Gries family): the true modal value must appear in the sketch's
    candidate set at a support below its actual frequency. Both are
    verified with bounded driver-side probes (the sketches themselves are
    driver objects, like any trained model artifact) and emitted as one
    boolean row with a trivial oracle.
    """
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    n_keys = c.count()
    # PySpark doesn't surface Dataset.stat.bloomFilter — reach the JVM
    # implementation (the same structure runtime bloom joins build)
    jbf = c._jdf.stat().bloomFilter(
        "c_custkey", int(max(n_keys, 1000)), 0.01
    )
    probe = [r.c_custkey for r in c.select("c_custkey").limit(2000).collect()]
    max_key = c.agg(F.max("c_custkey")).first()[0]
    absent = [max_key + i for i in range(1, 2001)]
    false_neg = sum(0 if jbf.mightContainLong(k) else 1 for k in probe)
    false_pos = sum(1 if jbf.mightContainLong(k) else 0 for k in absent)
    bloom_ok = false_neg == 0 and false_pos <= 0.05 * len(absent)

    freq = o.stat.freqItems(["o_orderpriority"], support=0.15).first()[0]
    top = (
        o.groupBy("o_orderpriority")
        .count()
        .orderBy(F.desc("count"), "o_orderpriority")
        .first()[0]
    )
    return spark.createDataFrame(
        [(bool(bloom_ok), bool(top in freq))],
        "bloom_ok boolean, freq_ok boolean",
    )


# ---- near-dup cluster closure: pairs -> components -> canonicals ----

# The oracle reuses the minhash pair replay verbatim and closes it
# transitively with a recursive CTE: reach(node, label) holds every label
# reachable from node over the (symmetric) edge set, so MIN(label) per
# node is the component minimum — exactly near_dup_clusters' output.
_CLUSTERS_ORACLE = (
    _MINHASH_ORACLE.replace("WITH docs AS", "WITH RECURSIVE docs AS").replace(
        "SELECT id_a, id_b, jaccard_sim FROM scored WHERE jaccard_sim >= 0.6",
        """pairs AS (
  SELECT id_a, id_b FROM scored WHERE jaccard_sim >= 0.6),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs),
reach(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node)
SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY node""",
    ).replace("FROM cand JOIN sh a ON cand.id_a = a.doc_id JOIN sh b ON cand.id_b = b.doc_id)",
              "FROM cand JOIN sh a ON cand.id_a = a.doc_id JOIN sh b ON cand.id_b = b.doc_id),")
)


@query("minhash_cluster_canonicals", _CLUSTERS_ORACLE)
def minhash_cluster_canonicals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS, not just pairs: minhash LSH pairs closed into
    connected components (iterative min-label propagation —
    dedup.near_dup_clusters), the decision layer a production dedup
    pipeline needs because pairwise matches chain (A~B~C must keep ONE
    document, even though A and C never matched directly)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz extra")).alias("text"),
    )
    corpus = d.unionAll(planted)
    pairs = dedup.minhash_near_dup_pairs(
        corpus, "doc_id", "text",
        num_hashes=16, bands=4, shingle_n=3, threshold=0.6,
        max_band_bucket=None,  # exact-recall parity with the SQL replay
    )
    return dedup.near_dup_clusters(pairs).select(
        F.col("node").alias("doc_id"), "cluster_id"
    )


# ---- SCD2 dimension history over the customer dimension ----

_SCD2_ORACLE = """
WITH dim AS (
  SELECT *, DATE '2024-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to,
         true AS is_current
  FROM customer),
upd AS (
  SELECT c_custkey, c_name, c_nationkey,
         CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100 ELSE c_acctbal END AS c_acctbal,
         c_mktsegment
  FROM customer WHERE c_custkey % 7 = 0 OR c_custkey % 11 = 0
  UNION ALL
  SELECT c_custkey + 1000000000000, c_name || ' (new)', c_nationkey,
         c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey < 10),
versioned AS (SELECT c_custkey FROM customer WHERE c_custkey % 7 = 0)
SELECT c_custkey, c_name, c_acctbal, valid_from, valid_to, is_current FROM (
  SELECT c_custkey, c_name, c_acctbal, valid_from, valid_to, is_current
  FROM dim WHERE c_custkey NOT IN (SELECT c_custkey FROM versioned)
  UNION ALL
  SELECT c_custkey, c_name, c_acctbal, valid_from,
         DATE '2024-06-01' AS valid_to, false AS is_current
  FROM dim WHERE c_custkey IN (SELECT c_custkey FROM versioned)
  UNION ALL
  SELECT c_custkey, c_name, c_acctbal, DATE '2024-06-01', CAST(NULL AS DATE), true
  FROM upd WHERE c_custkey IN (SELECT c_custkey FROM versioned)
  UNION ALL
  SELECT c_custkey, c_name, c_acctbal, DATE '2024-06-01', CAST(NULL AS DATE), true
  FROM upd WHERE c_custkey >= 1000000000000)
"""


@query("scd2_customer_history", _SCD2_ORACLE)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 merge (operators/scd.py) on the customer dimension: a CDC
    batch that changes acctbal for keys %7 (old version closed at the
    effective date + new version opened), repeats current values for keys
    %11 (must be a NO-OP — no version churn), and inserts 10 brand-new
    keys. The reference only truncate-reloads its warehouse
    (/root/reference/dags/etl_pipeline.py:202-218); this is the history-
    keeping upgrade of that load path."""
    c = _t(spark, sf_dir, "customer")
    dim = scd.scd2_init(c, valid_from="2024-01-01")
    changed = c.withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 7 == 0, F.col("c_acctbal") + 100
        ).otherwise(F.col("c_acctbal")),
    ).filter((F.col("c_custkey") % 7 == 0) | (F.col("c_custkey") % 11 == 0))
    # planted-key offset must exceed the keyspace at ANY sf (custkey hit
    # 1.5M at sf10 and the old +1e6 collided: the synthetic inserts
    # became updates of real rows and 552k spurious versions appeared in
    # the oracle — caught by the r7 sf10 sweep as a 3.7% row-count drift
    # in scd2_point_in_time_join). 1e12 is out of keyspace forever.
    inserts = c.filter(F.col("c_custkey") < 10).select(
        (F.col("c_custkey") + 1_000_000_000_000).alias("c_custkey"),
        F.concat(F.col("c_name"), F.lit(" (new)")).alias("c_name"),
        *[F.col(x) for x in ("c_nationkey", "c_acctbal", "c_mktsegment")],
    )
    updates = changed.unionByName(inserts)
    merged = scd.scd2_apply(
        dim, updates, ["c_custkey"], effective_date="2024-06-01"
    )
    return merged.select(
        "c_custkey", "c_name", "c_acctbal", "valid_from", "valid_to", "is_current"
    )


# ---- Z-order layout key over the fact table ----

_ZORDER_ORACLE = """
WITH base AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         CAST(l_partkey AS BIGINT) & 65535 AS a0,
         CAST(l_suppkey AS BIGINT) & 65535 AS b0
  FROM lineitem),
r1 AS (SELECT *, (a0 | (a0 << 8)) & 16711935 AS a1,
                 (b0 | (b0 << 8)) & 16711935 AS b1 FROM base),
r2 AS (SELECT *, (a1 | (a1 << 4)) & 252645135 AS a2,
                 (b1 | (b1 << 4)) & 252645135 AS b2 FROM r1),
r3 AS (SELECT *, (a2 | (a2 << 2)) & 858993459 AS a3,
                 (b2 | (b2 << 2)) & 858993459 AS b3 FROM r2),
r4 AS (SELECT *, (a3 | (a3 << 1)) & 1431655765 AS a4,
                 (b3 | (b3 << 1)) & 1431655765 AS b4 FROM r3)
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       a4 | (b4 << 1) AS zkey
FROM r4
"""


@query("zorder_lineitem_keys", _ZORDER_ORACLE)
def zorder_lineitem_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) layout key over (l_partkey, l_suppkey) — the
    clustering device that makes parquet min-max statistics prune on BOTH
    columns at once (operators/layout.py; what Delta/Iceberg OPTIMIZE
    ZORDER BY computes). Pure JVM bit arithmetic, replayed bit-for-bit by
    the oracle's magic-number CTE chain; the pruning effect itself is
    asserted on real parquet footers in tests/test_operators.py."""
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        layout.zorder_key("l_partkey", "l_suppkey"),
    )


# ---- product quantization: compressed-code ANN + recall gate ----


@query("pq_cosine_topk")
def pq_cosine_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/pq.py): vectors compressed to
    8 four-bit codes, ADC scan over the codes, exact-cosine rerank of the
    top-50 approximate candidates. The memory-bandwidth member of the ANN
    family (LSH prunes by bucket, IVF by trained cell, PQ shrinks the
    bytes every scanned row costs ~30x). Rows-only: k-means codebooks are
    not SQL-replicable; recall is gated by pq_recall_vs_exact."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = _ann_panel(emb, 50)
    # Constant-FRACTION rerank (top 10% of the ADC scan, floor 50), not a
    # constant count: 8x4-bit codes hold ~the same neighbors-per-code
    # density as the corpus grows, so a fixed 50-candidate rerank covers
    # a shrinking fraction and recall decays with scale (measured 0.78 ->
    # 0.50 at 4x corpus, sf0.1 sweep round 6; 10% restores 0.815). The
    # count() is a cheap single-column scan; at the driver's sf0.001/0.01
    # scales the floor keeps results bit-identical to the old rerank=50.
    rerank = max(50, -(-emb.count() // 10))
    out = pq.pq_topk(
        emb, queries_df, k=5, rerank=rerank, id_col="vec_id",
        vec_col="embedding", query_id_col="query_id", m=8, codebook_k=16,
        seed=42,
    )
    return out.select(
        "query_id", "neighbor_id", "sim", F.col("rank").cast("bigint").alias("rnk")
    )


@query("pq_recall_vs_exact", "SELECT true AS recall_ok")
def pq_recall_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ quality gate: with a 50-candidate exact rerank, the compressed
    scan must recover >= 0.7 of the exact top-5 (ADC over 16-centroid
    nibbles is a much finer approximation than cell/bucket pruning, so
    the bar sits above the IVF gate's 0.3)."""
    exact = QUERIES["similarity_topk"](spark, sf_dir)
    approx = QUERIES["pq_cosine_topk"](spark, sf_dir)
    return _recall_ok(
        exact,
        approx.select("query_id", "neighbor_id"),
        0.7,
    )


# ===================================================================
# Tier — incremental curation: cross-corpus dedup, mixture resampling,
# boilerplate profiling, skew diagnosis, anomaly detection
# ===================================================================


def _hex8_to_int(h: str) -> str:
    """DuckDB SQL turning an 8-hex-char column ``h`` into its integer
    value (DuckDB has no conv()): sum of nibble * 16^position."""
    hexs = "0123456789abcdef"
    return " + ".join(
        f"(strpos('{hexs}', substring({h}, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )


_MIXTURE_ORACLE = f"""
WITH b AS (
  SELECT source,
         substring(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8) AS h
  FROM documents),
v AS (SELECT source, ({_hex8_to_int('h')}) % 10000 AS bucket FROM b),
s AS (
  SELECT source FROM v
  WHERE bucket < CASE WHEN CAST(substring(source, 4, 10) AS INT) % 2 = 0
                      THEN 10000 ELSE 2500 END)
SELECT source, COUNT(*) AS n_docs FROM s GROUP BY source
"""


@query("mixture_resample_counts", _MIXTURE_ORACLE)
def mixture_resample_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture resampling: even-numbered sources keep 100%, odd
    keep 25%, membership decided by md5(doc_id) (operators/
    sampling.resample_to_mixture) so the sample is identical on any
    cluster/partitioning and the oracle replays it exactly. The fraction
    table is config-sized (distinct sources — a production pipeline
    passes it in; here it is derived from the dimension itself)."""
    from etl_bigquery_pipeline_spark.operators import sampling

    d = _t(spark, sf_dir, "documents")
    srcs = [r["source"] for r in d.select("source").distinct().collect()]
    fractions = {s: (1.0 if int(s[3:]) % 2 == 0 else 0.25) for s in srcs}
    out = sampling.resample_to_mixture(
        d, "source", fractions, "doc_id", salt="mix"
    )
    return out.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))


_TOKJOIN_SQL = (
    "md5(array_to_string(list_filter(regexp_split_to_array(text, '\\s+'),"
    " x -> x <> ''), ' '))"
)

_INC_EXACT_ORACLE = f"""
WITH docs AS (SELECT doc_id, text FROM documents),
batch AS (
  SELECT doc_id, text FROM docs WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 2000000, text FROM docs WHERE doc_id % 5 = 1 AND doc_id < 125),
corpus AS (SELECT doc_id, text FROM docs WHERE doc_id % 5 <> 0),
bh AS (SELECT doc_id, {_TOKJOIN_SQL} AS h FROM batch),
ch AS (SELECT DISTINCT {_TOKJOIN_SQL} AS h FROM corpus)
SELECT MIN(bh.doc_id) AS doc_id
FROM bh LEFT JOIN ch ON bh.h = ch.h
WHERE ch.h IS NULL
GROUP BY bh.h
"""


@query("incremental_exact_dedup", _INC_EXACT_ORACLE)
def incremental_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time exact dedup: a new batch (every 5th doc, plus 25
    planted copies of existing corpus documents) deduped against the
    already-accepted corpus and within itself
    (operators/dedup.dedup_exact_against_corpus). The planted copies must
    all be dropped; survivors are the batch's genuinely novel hashes."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.filter((F.col("doc_id") % 5 == 1) & (F.col("doc_id") < 125)).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "text"
    )
    batch = d.filter(F.col("doc_id") % 5 == 0).unionAll(planted)
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    return dedup.dedup_exact_against_corpus(batch, corpus, "doc_id", "text")


_INC_MINHASH_ORACLE = """
WITH docs AS (SELECT doc_id, text FROM documents),
sides AS (
  SELECT 'b' AS side, doc_id, text FROM docs WHERE doc_id % 5 = 0
  UNION ALL
  SELECT 'b', doc_id + 3000000, text || ' qqq tail'
  FROM docs WHERE doc_id % 5 = 1 AND doc_id < 125
  UNION ALL
  SELECT 'c', doc_id, text FROM docs WHERE doc_id % 5 <> 0),
toks AS (
  SELECT side, doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM sides),
sh AS (
  SELECT side, doc_id,
         list_distinct([array_to_string(t[i:i+2], ' ')
                        for i in generate_series(1, greatest(len(t) - 2, 1))]) AS s
  FROM toks),
sig AS (
  SELECT side, doc_id, s,
         [list_min([substring(md5(CAST(k // 4 AS VARCHAR) || ':' || x),
                              (k % 4) * 8 + 1, 8) for x in s])
          for k in generate_series(0, 15)] AS sg
  FROM sh),
bands AS (
  SELECT side, doc_id, gs.b AS band,
         md5(CAST(gs.b AS VARCHAR) || '|' || array_to_string(sg[gs.b*4+1 : gs.b*4+4], ',')) AS band_key
  FROM sig CROSS JOIN generate_series(0, 3) AS gs(b)),
cand AS (
  SELECT DISTINCT l.doc_id AS batch_id, r.doc_id AS corpus_id
  FROM bands l JOIN bands r
    ON l.band_key = r.band_key AND l.band = r.band
  WHERE l.side = 'b' AND r.side = 'c'),
scored AS (
  SELECT batch_id, corpus_id,
         round(len(list_intersect(a.s, b.s)) /
               (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard_sim
  FROM cand
  JOIN sh a ON cand.batch_id = a.doc_id AND a.side = 'b'
  JOIN sh b ON cand.corpus_id = b.doc_id AND b.side = 'c')
SELECT batch_id, corpus_id, jaccard_sim FROM scored WHERE jaccard_sim >= 0.6
"""


@query("incremental_minhash_dedup", _INC_MINHASH_ORACLE)
def incremental_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time near-dup: the new batch (every 5th doc, plus 25
    planted near-copies of corpus documents with a 2-token suffix) LSH-
    joined against the existing corpus only — batch x corpus band-bucket
    collisions, exact-Jaccard verified at >= 0.6
    (operators/dedup.near_dup_against_corpus). The oracle replays the
    identical md5 minhash pipeline on both sides."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.filter((F.col("doc_id") % 5 == 1) & (F.col("doc_id") < 125)).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" qqq tail")).alias("text"),
    )
    batch = d.filter(F.col("doc_id") % 5 == 0).unionAll(planted)
    corpus = d.filter(F.col("doc_id") % 5 != 0)
    return dedup.near_dup_against_corpus(
        batch, corpus, "doc_id", "text",
        num_hashes=16, bands=4, shingle_n=3, threshold=0.6,
        # exact-recall parity with the SQL replay (production default: 1000)
        max_band_bucket=None,
    )


_BOILER_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(t[i:i+1], ' ')
                        for i in generate_series(1, greatest(len(t) - 1, 1))]) AS s
  FROM toks),
ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
nd AS (SELECT COUNT(*) AS n_docs FROM sh),
dfq AS (SELECT sg, COUNT(*) AS dfc FROM ex GROUP BY sg),
boiler AS (SELECT sg FROM dfq, nd WHERE dfc >= n_docs * 0.05),
pb AS (
  SELECT doc_id, COUNT(*) AS n_boiler FROM ex
  WHERE sg IN (SELECT sg FROM boiler)
  GROUP BY doc_id),
base AS (SELECT doc_id, CAST(len(s) AS BIGINT) AS n_shingles FROM sh)
SELECT base.doc_id, n_shingles,
       CAST(COALESCE(n_boiler, 0) AS BIGINT) AS n_boiler,
       round(COALESCE(n_boiler, 0) / CAST(n_shingles AS DOUBLE), 6) AS boiler_ratio,
       COALESCE(n_boiler, 0) / CAST(n_shingles AS DOUBLE) <= 0.5 AS keep
FROM base LEFT JOIN pb ON base.doc_id = pb.doc_id
"""


@query("boilerplate_shingle_ratio", _BOILER_ORACLE)
def boilerplate_shingle_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate profile: per-document fraction of word-2-gram
    shingles whose corpus document-frequency is >= 5% of all documents
    (operators/dedup.boilerplate_shingle_stats). The boilerplate set is
    bounded by shingles-per-doc / df_frac — a constant — so it broadcasts
    at any corpus size; n_docs is a 1-row aggregate, never a driver
    count."""
    d = _t(spark, sf_dir, "documents")
    return dedup.boilerplate_shingle_stats(
        d, "doc_id", "text", shingle_n=2, df_frac=0.05, max_ratio=0.5
    )


_HEAVY_ORACLE = """
WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
t AS (SELECT COUNT(*) AS total FROM events),
k AS (SELECT user_id, n FROM c ORDER BY n DESC, user_id LIMIT 20)
SELECT user_id, CAST(n AS BIGINT) AS n,
       CAST(ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS BIGINT) AS rnk,
       round(n / CAST(total AS DOUBLE), 6) AS share,
       round(SUM(n) OVER (ORDER BY n DESC, user_id ROWS UNBOUNDED PRECEDING)
             / CAST(total AS DOUBLE), 6) AS cum_share
FROM k, t
"""


@query("heavy_hitter_users", _HEAVY_ORACLE)
def heavy_hitter_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnosis: exact top-20 users by event count with share and
    cumulative share (operators/skew.heavy_hitters). Top-k is
    orderBy+limit (TakeOrdered — per-partition k, no global sort); the
    window runs over the 20 survivors only. This is the profile that
    decides salting/broadcast strategy before a user_id join."""
    from etl_bigquery_pipeline_spark.operators import skew

    e = _t(spark, sf_dir, "events")
    return skew.heavy_hitters(e, ["user_id"], k=20)


_ANOMALY_ORACLE = """
WITH d AS (
  SELECT o_orderdate AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
  FROM orders GROUP BY 1),
w AS (
  SELECT day, rev,
         AVG(rev) OVER (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS mu,
         STDDEV_SAMP(rev) OVER (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS sd
  FROM d)
SELECT day, round(rev, 2) AS revenue,
       round((rev - mu) / NULLIF(sd, 0), 4) AS zscore,
       COALESCE(abs((rev - mu) / NULLIF(sd, 0)) > 2.5, false) AS is_anomaly
FROM w
"""


@query("daily_revenue_anomalies", _ANOMALY_ORACLE)
def daily_revenue_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection: each day's revenue z-scored
    against the mean/stddev of the prior 7 days. The window is global but
    runs over the DAILY AGGREGATE — one row per distinct date, a few
    thousand rows for any business horizon regardless of raw-event scale,
    so the single-partition frame is bounded by the calendar, not the
    data. The raw-table groupBy before it is the only real shuffle."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("rev")
    )
    w = Window.orderBy("day").rowsBetween(-7, -1)
    mu = F.avg("rev").over(w)
    sd = F.stddev_samp("rev").over(w)
    z = F.try_divide(F.col("rev") - mu, F.nullif(sd, F.lit(0.0)))
    return daily.select(
        "day",
        F.round("rev", 2).alias("revenue"),
        F.round(z, 4).alias("zscore"),
        F.coalesce(F.abs(z) > 2.5, F.lit(False)).alias("is_anomaly"),
    )


# ===================================================================
# Tier — grouped robust statistics & ordered aggregation
# ===================================================================

_MEDIAN_MODE_ORACLE = """
WITH c AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
  FROM orders GROUP BY 1, 2),
m AS (
  SELECT o_orderstatus, o_orderpriority,
         ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                            ORDER BY n DESC, o_orderpriority) AS rn
  FROM c),
md AS (
  SELECT o_orderstatus, round(median(o_totalprice), 2) AS median_price,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1)
SELECT md.o_orderstatus, md.median_price, md.n_orders,
       m.o_orderpriority AS mode_priority
FROM md JOIN m ON md.o_orderstatus = m.o_orderstatus AND m.rn = 1
"""


@query("median_mode_by_status", _MEDIAN_MODE_ORACLE)
def median_mode_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped robust statistics: exact interpolated median price and the
    modal order priority per status. Spark's mode() breaks frequency ties
    arbitrarily, so the mode is computed deterministically instead: count
    per (status, priority) — a tiny key space — then rank by (count desc,
    value asc). Two narrow shuffles over low-cardinality keys. The
    median runs the value-frequency histogram plan
    (`_hist_exact_percentiles`), not F.median's per-task value buffer:
    o_totalprice is near-continuous over a raw fact table — the r8
    sf10 OOM class (r8 verdict ask #2)."""
    o = _t(spark, sf_dir, "orders")
    med = _hist_exact_percentiles(
        o, "o_orderstatus", "o_totalprice", [0.5], ["__med"]
    )
    md = (
        o.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .join(F.broadcast(med), "o_orderstatus")
        .select(
            "o_orderstatus",
            F.round("__med", 2).alias("median_price"),
            "n_orders",
        )
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority").asc()
    )
    mode = (
        o.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderstatus", F.col("o_orderpriority").alias("mode_priority"))
    )
    return md.join(mode, "o_orderstatus")


_LISTAGG_ORACLE = """
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       CAST(COUNT(*) AS BIGINT) AS n_nations
FROM region JOIN nation ON r_regionkey = n_regionkey
GROUP BY r_name
"""


@query("region_nations_listagg", _LISTAGG_ORACLE)
def region_nations_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/STRING_AGG): nations per
    region, comma-joined in name order. collect_list has no intra-group
    order guarantee, so the order is imposed with array_sort before the
    join — deterministic under any partitioning. Group count is
    dimension-sized; the payload per group is bounded."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    return (
        r.join(n, r["r_regionkey"] == n["n_regionkey"])
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias(
                "nations"
            ),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


_WCD_ORACLE = """
WITH o AS (
  SELECT event_id, user_id, ts, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS occ
  FROM events)
SELECT event_id, user_id,
       CAST(SUM(CASE WHEN occ = 1 THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS distinct_types_so_far
FROM o
"""


@query("windowed_count_distinct", _WCD_ORACLE)
def windowed_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over a window — which no engine supports
    directly — via the first-occurrence trick: row_number marks each
    (user, type)'s first event, and a running sum of those markers is the
    distinct count so far. Two windows, both partitioned by user_id (one
    sub-partitioned by type): shuffles on the user key only, per-user
    linear scans."""
    e = _t(spark, sf_dir, "events")
    occ = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        e.withColumn("occ", F.row_number().over(occ))
        .select(
            "event_id",
            "user_id",
            F.sum(F.when(F.col("occ") == 1, 1).otherwise(0))
            .over(run)
            .cast("bigint")
            .alias("distinct_types_so_far"),
        )
    )


_SHARE_ORACLE = """
WITH rev AS (
  SELECT r_name,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
              AS DOUBLE) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name)
SELECT r_name, round(revenue, 2) AS revenue,
       round(revenue / SUM(revenue) OVER (), 6) AS share_of_total
FROM rev
"""


@query("revenue_share_by_region", _SHARE_ORACLE)
def revenue_share_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-total: regional revenue share via an unpartitioned
    window over the AGGREGATED frame (one row per region — bounded by the
    dimension, not the fact table). lineitem joins orders on their shared
    orderkey (a co-partitionable fact-fact shuffle — bucket both on
    orderkey to eliminate it); the customer->nation->region chain folds
    into one broadcast map, so the fact rows shuffle once."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    dim = F.broadcast(
        c.join(n, c["c_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .select("c_custkey", "r_name")
    )
    rev = (
        li.select("l_orderkey", "l_extendedprice", "l_discount")
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(dim, F.col("o_custkey") == dim["c_custkey"])
        .groupBy("r_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
    )
    w = Window.partitionBy()
    return rev.select(
        "r_name",
        F.round("revenue", 2).alias("revenue"),
        F.round(F.col("revenue") / F.sum("revenue").over(w), 6).alias(
            "share_of_total"
        ),
    )


_RECON_ORACLE = """
WITH a AS (
  SELECT o_orderkey AS k, o_totalprice AS v FROM orders WHERE o_orderkey % 7 <> 0),
b AS (
  SELECT o_orderkey AS k,
         o_totalprice + CASE WHEN o_orderkey % 5 = 0 THEN 1 ELSE 0 END AS v
  FROM orders WHERE o_orderkey % 3 <> 0),
j AS (
  SELECT COALESCE(a.k, b.k) AS k, a.v AS va, b.v AS vb,
         CASE WHEN a.k IS NULL THEN 'only_right'
              WHEN b.k IS NULL THEN 'only_left'
              WHEN a.v = b.v THEN 'matched_equal'
              ELSE 'matched_changed' END AS status
  FROM a FULL OUTER JOIN b ON a.k = b.k)
SELECT status, CAST(COUNT(*) AS BIGINT) AS n FROM j GROUP BY status
"""


@query("snapshot_reconciliation", _RECON_ORACLE)
def snapshot_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation via FULL OUTER join: two overlapping order
    snapshots (one missing every 7th key, the other missing every 3rd and
    perturbing every 5th price) classified into matched_equal /
    matched_changed / only_left / only_right. The canonical CDC-audit /
    migration-verification shape: one key shuffle, map-side classify,
    tiny grouped output."""
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("va")
    )
    b = o.filter(F.col("o_orderkey") % 3 != 0).select(
        F.col("o_orderkey").alias("k"),
        (
            F.col("o_totalprice")
            + F.when(F.col("o_orderkey") % 5 == 0, 1).otherwise(0)
        ).alias("vb"),
    )
    j = a.join(b, "k", "full_outer").select(
        F.when(F.col("va").isNull(), F.lit("only_right"))
        .when(F.col("vb").isNull(), F.lit("only_left"))
        .when(F.col("va") == F.col("vb"), F.lit("matched_equal"))
        .otherwise(F.lit("matched_changed"))
        .alias("status")
    )
    return j.groupBy("status").agg(F.count(F.lit(1)).alias("n"))


_E2E_CURATION_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
         len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS n_tok,
         {_TOKJOIN_SQL} AS h
  FROM documents),
d AS (SELECT h, MIN(doc_id) AS doc_id FROM t GROUP BY h),
kept AS (
  SELECT t.doc_id, t.source, t.n_tok
  FROM t JOIN d ON t.doc_id = d.doc_id
  WHERE t.n_tok >= 20),
hx AS (
  SELECT doc_id, source, n_tok,
         substring(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8) AS hm,
         substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) AS hs
  FROM kept),
mixed AS (
  SELECT source, n_tok, ({_hex8_to_int('hs')}) % 10000 AS sb
  FROM hx
  WHERE ({_hex8_to_int('hm')}) % 10000
        < CASE WHEN CAST(substring(source, 4, 10) AS INT) % 2 = 0
               THEN 10000 ELSE 2500 END),
s AS (
  SELECT source, n_tok,
         CASE WHEN sb < 8000 THEN 'train'
              WHEN sb < 9000 THEN 'val'
              ELSE 'test' END AS split
  FROM mixed)
SELECT split, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
FROM s GROUP BY split, source
"""


@query("corpus_curation_pipeline", _E2E_CURATION_ORACLE)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation as ONE lazy lineage: exact dedup (min-id
    per content hash) -> token-count quality floor -> deterministic
    domain-mixture resampling -> reproducible train/val/test split ->
    per-(split, source) doc and token counts. Every stage is the already-
    oracled operator (dedup.dedup_exact_text, sampling.resample_to_mixture,
    sampling.hash_split) composed declaratively, so Catalyst sees the whole
    pipeline at once — filters and the md5 sampling predicates all run in
    the same scan stage before the two key shuffles (content-hash groupBy,
    final group-agg). The oracle replays the full chain in SQL."""
    from etl_bigquery_pipeline_spark.operators import sampling

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    deduped = dedup.dedup_exact_text(d, "doc_id", "text")
    kept = deduped.withColumn("n_tok", TX.token_count("text")).filter(
        F.col("n_tok") >= 20
    )
    srcs = [r["source"] for r in d.select("source").distinct().collect()]
    fractions = {s: (1.0 if int(s[3:]) % 2 == 0 else 0.25) for s in srcs}
    mixed = sampling.resample_to_mixture(
        kept, "source", fractions, "doc_id", salt="mix"
    )
    split = sampling.hash_split(
        mixed, "doc_id", weights={"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return split.groupBy("split", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("sum_tokens"),
    )


@query("cms_heavy_hitter_gate", "SELECT true AS cms_ok")
def cms_heavy_hitter_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch gate: the streaming-friendly heavy-hitter
    estimate must never under-count (CMS guarantee) and must land within
    5% over the exact counts for the true top-5 users. The sketch is a
    fixed-size mergeable aggregate (the 100 TB path: one pass, map-side
    partial sketches, bytes-sized shuffle); the exact side reuses
    skew.heavy_hitters. Probing the collected sketch is a bounded
    driver-side read of a model-artifact-sized object.

    The over-count tolerance is the sketch's own guarantee — an ADDITIVE
    eps*N bound (w.p. 1-delta over the seeded hash draw), not a relative
    one: heavy-hitter counts grow sublinearly with the stream while
    collision mass grows with N, so a fixed percentage-of-exact bar
    (the original 5%) silently tightens with scale and failed first at
    the sf0.1 sweep (over-count 50 vs eps*N=100, round 6). N comes from
    the sketch itself (totalCount), not a second scan."""
    from etl_bigquery_pipeline_spark.operators import skew

    eps = 0.001
    e = _t(spark, sf_dir, "events")
    exact = {
        r.user_id: r.n for r in skew.heavy_hitters(e, ["user_id"], k=5).collect()
    }
    sk_bytes = bytes(
        e.select(
            F.count_min_sketch(
                F.col("user_id"), F.lit(eps), F.lit(0.99), F.lit(42)
            ).alias("sk")
        ).first()["sk"]
    )
    jvm = spark.sparkContext._jvm
    bais = jvm.java.io.ByteArrayInputStream(sk_bytes)
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bais)
    bound = eps * cms.totalCount()
    ok = all(
        n <= cms.estimateCount(int(uid)) <= n + bound
        for uid, n in exact.items()
    )
    return spark.createDataFrame([(bool(ok),)], "cms_ok boolean")


_UNIFORM_SAMPLE_ORACLE = """
SELECT doc_id, source
FROM documents
ORDER BY md5('sample:' || CAST(doc_id AS VARCHAR)), doc_id
LIMIT 50
"""


@query("uniform_doc_sample", _UNIFORM_SAMPLE_ORACLE)
def uniform_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform k-sample: order by md5(key) and take k —
    a reproducible simple random sample (the md5 is the random tape), the
    eval-set / human-review draw that must come out identical on every
    engine and cluster. Executes as TakeOrdered: each partition keeps its
    k smallest hashes, the driver merges k x partitions rows — no global
    sort, no shuffle of the corpus."""
    d = _t(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("sample:"), F.col("doc_id").cast("string")))
    return (
        d.select("doc_id", "source", h.alias("__h"))
        .orderBy("__h", "doc_id")
        .limit(50)
        .select("doc_id", "source")
    )


_EQUIDEPTH_ORACLE = """
WITH b AS (
  SELECT quantile_cont(o_totalprice, 0.25) AS q1,
         quantile_cont(o_totalprice, 0.50) AS q2,
         quantile_cont(o_totalprice, 0.75) AS q3
  FROM orders),
bucketed AS (
  SELECT CASE WHEN o_totalprice <= q1 THEN 0
              WHEN o_totalprice <= q2 THEN 1
              WHEN o_totalprice <= q3 THEN 2
              ELSE 3 END AS bucket,
         o_totalprice
  FROM orders, b)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
       round(MIN(o_totalprice), 2) AS lo,
       round(MAX(o_totalprice), 2) AS hi
FROM bucketed GROUP BY bucket
"""


@query("equidepth_price_histogram", _EQUIDEPTH_ORACLE)
def equidepth_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quartile) histogram via the two-phase scalar pattern:
    exact interpolated quartiles as a 1-row aggregate, cross-joined
    (broadcast) into a second scan that buckets every row — two passes,
    zero driver collects, no global sort. The fixed-width variant
    (price_histogram) needs one pass; equi-depth costs the extra scan in
    exchange for balanced buckets."""
    o = _t(spark, sf_dir, "orders").select("o_totalprice")
    # exact quartiles via the value-frequency histogram (see
    # _hist_exact_percentiles): percentile()'s per-task value buffer is
    # the r8 sf10 OOM class; gcol=None keeps the corpus-proportional
    # cumulative count range-partitioned (with_global_running_sums) —
    # o_totalprice is near-continuous (~15M distinct at sf10), so a
    # single-partition window over its histogram is a serial funnel
    qs = _hist_exact_percentiles(
        o, None, "o_totalprice", [0.25, 0.50, 0.75], ["q1", "q2", "q3"]
    )
    bucket = (
        F.when(F.col("o_totalprice") <= F.col("q1"), 0)
        .when(F.col("o_totalprice") <= F.col("q2"), 1)
        .when(F.col("o_totalprice") <= F.col("q3"), 2)
        .otherwise(3)
    )
    return (
        o.crossJoin(F.broadcast(qs))
        .select(bucket.alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


_Q3_ORACLE = """
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-03-15'
  AND l_shipdate > TIMESTAMP '1996-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


@query("shipping_priority_top10", _Q3_ORACLE)
def shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): segment-filtered customers
    broadcast into orders, date-filtered both sides so the pushed
    predicates prune at the scans, one orderkey shuffle for the grouped
    revenue, TakeOrdered for the top-10. The deterministic tie-break
    (orderdate, orderkey) keeps the limit stable across engines."""
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit("1996-03-15").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


_Q5_ORACLE = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


@query("local_supplier_volume", _Q5_ORACLE)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): six-way join where the
    customer/supplier nations must MATCH — the classic star join with a
    cross-dimension equality. Region/nation/supplier/customer all
    broadcast (dimension-sized); the only big shuffle is lineitem-orders
    on orderkey. No date filter so the whole-year scan exercises the agg
    path."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    nr = F.broadcast(
        n.join(r, n["n_regionkey"] == r["r_regionkey"]).select(
            "n_nationkey", "n_name"
        )
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(s),
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(nr, s["s_nationkey"] == nr["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
    )


_RETENTION_ORACLE = """
WITH f AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort FROM events GROUP BY 1),
a AS (
  SELECT DISTINCT e.user_id, f.cohort,
         date_diff('day', f.cohort, CAST(e.ts AS DATE)) AS offset_days
  FROM events e JOIN f ON e.user_id = f.user_id)
SELECT cohort, offset_days, CAST(COUNT(*) AS BIGINT) AS n_users
FROM a GROUP BY cohort, offset_days
"""


@query("retention_cohorts", _RETENTION_ORACLE)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen day, counted
    on each later activity-day offset. First-seen is one groupBy on
    user_id; the activity join re-shuffles on the same key, so AQE can
    reuse the exchange / plan a co-located join, and the distinct before
    the final count keeps a user to one row per (cohort, offset)."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    first = e.groupBy("user_id").agg(F.min("day").alias("cohort"))
    return (
        e.join(first, "user_id")
        .select(
            "user_id",
            "cohort",
            F.datediff(F.col("day"), F.col("cohort")).alias("offset_days"),
        )
        .distinct()
        .groupBy("cohort", "offset_days")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


_TRANSITION_ORACLE = """
WITH s AS (
  SELECT event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events)
SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n,
       round(COUNT(*) / CAST(SUM(COUNT(*)) OVER (PARTITION BY event_type)
                             AS DOUBLE), 6) AS p
FROM s WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
"""


@query("event_transition_matrix", _TRANSITION_ORACLE)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event transition matrix (Markov counts + row-normalized
    probabilities): LEAD over each user's time-ordered events, grouped on
    the (from, to) pair. One user_id shuffle for the sequence window, one
    tiny grouped output (|event types|^2 rows) whose normalizing window is
    negligible."""
    e = _t(spark, sf_dir, "events")
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.withColumn("next_type", F.lead("event_type").over(seq))
        .filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    norm = Window.partitionBy("event_type")
    return pairs.select(
        "event_type",
        "next_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n") / F.sum("n").over(norm), 6).alias("p"),
    )


_WEIGHTED_SAMPLE_ORACLE = f"""
WITH w AS (
  SELECT doc_id, source, n_chars,
         least(1.0, n_chars / 300.0) AS wt,
         substring(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 8) AS h
  FROM documents),
kept AS (
  SELECT source, n_chars FROM w
  WHERE ({_hex8_to_int('h')}) % 10000 < wt * 10000)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       round(AVG(n_chars), 4) AS avg_chars
FROM kept GROUP BY source
"""


@query("weighted_doc_sample", _WEIGHTED_SAMPLE_ORACLE)
def weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted sampling (operators/sampling.weighted_sample):
    keep probability proportional to document length (capped at 1), drawn
    from md5(doc_id) so the sample is deterministic and SQL-replayable.
    Longer documents survive more often — the avg_chars per source shifts
    up accordingly. Pure filter: no shuffle before the reporting agg."""
    from etl_bigquery_pipeline_spark.operators import sampling

    d = _t(spark, sf_dir, "documents")
    wt = F.least(F.lit(1.0), F.col("n_chars") / 300.0)
    kept = sampling.weighted_sample(d, wt, "doc_id", salt="wsamp")
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


_ASSIGN_ORACLE = f"""
WITH u AS (
  SELECT label, i AS pos,
         round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS v
  FROM embeddings, generate_series(1, {_DIM}) AS g(i)
  GROUP BY label, i),
c AS (SELECT label, list(v ORDER BY pos) AS cv FROM u GROUP BY label),
d AS (
  SELECT e.vec_id, c.label,
         list_sum([(CAST(e.embedding[i] AS DOUBLE) - cv[i])
                   * (CAST(e.embedding[i] AS DOUBLE) - cv[i])
                   for i in generate_series(1, {_DIM})]) AS d2
  FROM embeddings e CROSS JOIN c),
a AS (
  SELECT vec_id, label, d2,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, label) AS rn
  FROM d)
SELECT vec_id, label AS assigned_label, round(d2, 6) AS dist2
FROM a WHERE rn = 1
"""


def _centroids(e: DataFrame, label_col: str = "label") -> DataFrame:
    """(label, cv array<double>) — elementwise mean per label, rounded to
    6 places so the values are bit-identical across engines (summation
    order differs between Spark partials and a serial fold)."""
    return (
        e.select(label_col, F.posexplode("embedding").alias("pos", "v"))
        .groupBy(label_col, "pos")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("cv"))
        .groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cv"))).alias("s"))
        .select(label_col, F.transform("s", lambda x: x["cv"]).alias("cv"))
    )


def _assign(e: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, assigned_label, d2): nearest centroid by squared L2.
    K centroids broadcast; per-vector argmin via min(struct) — ties break
    on the smaller label, deterministically."""
    d2 = F.aggregate(
        F.zip_with(
            "embedding",
            "cv",
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        e.select("vec_id", "embedding")
        .crossJoin(F.broadcast(cent))
        .select("vec_id", F.col("label"), d2.alias("d2"))
        .groupBy("vec_id")
        .agg(F.min(F.struct("d2", "label")).alias("m"))
        .select(
            "vec_id",
            F.col("m.label").alias("assigned_label"),
            F.col("m.d2").alias("d2"),
        )
    )


@query("centroid_assignment", _ASSIGN_ORACLE)
def centroid_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means E-step as pure DataFrame algebra: per-label centroids
    (posexplode mean, 6-decimal-rounded for cross-engine determinism)
    broadcast against every vector, squared-L2 via zip_with/aggregate —
    all JVM-side, no UDF — argmin via min(struct(d2, label)). The corpus
    never shuffles: K centroid rows broadcast, one groupBy on vec_id."""
    e = _t(spark, sf_dir, "embeddings")
    out = _assign(e, _centroids(e))
    return out.select(
        "vec_id", "assigned_label", F.round("d2", 6).alias("dist2")
    )


@query("kmeans_inertia_gate", "SELECT true AS inertia_monotone")
def kmeans_inertia_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's algorithm on DataFrames — the iterative-algorithm pattern:
    3 iterations of assign (broadcast centroids, zip_with distance) ->
    re-center (posexplode mean over the new assignment). The driver sees
    only one inertia scalar per iteration; all heavy work is distributed
    and each iteration is one lazy plan. Gate: inertia must be
    non-increasing (Lloyd guarantee — violated only if the steps are
    miswired), checked with a tolerance for float merge order."""
    # every Lloyd round consumes e for assign AND re-center; cache the
    # (small) vector table instead of rescanning parquet 7 times
    e = scoped_cache(_t(spark, sf_dir, "embeddings"))
    cent = _centroids(e)
    inertias = []
    for _ in range(3):
        assigned = _assign(e, cent)
        inertias.append(assigned.agg(F.sum("d2")).first()[0])
        cent = _centroids(
            e.join(assigned.select("vec_id", "assigned_label"), "vec_id")
            .select(F.col("assigned_label").alias("label"), "embedding"),
        # truncate lineage each iteration: without this the plan nests one
        # full assign+recenter per round and analysis/codegen cost grows
        # superlinearly with iteration count — the standard iterative-
        # algorithm hygiene (K x dim rows, so the checkpoint is tiny)
        ).localCheckpoint()
    ok = all(
        b <= a * (1 + 1e-9) for a, b in zip(inertias, inertias[1:])
    )
    return spark.createDataFrame([(bool(ok),)], "inertia_monotone boolean")


@query("band_index_probe_matches", "SELECT true AS band_probe_matches")
def band_index_probe_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-band-index gate: build the bucketed minhash band index
    over the corpus once (operators/dedup.build_band_index), probe it
    with a batch containing planted near-copies, and require the
    candidate pair set to EQUAL the direct operator's band collisions
    (same md5 pipeline ⇒ identical band keys ⇒ identical candidates; the
    persisted path only changes WHERE the corpus signatures come from).
    Also requires every exact-verified near-dup pair to appear among the
    index candidates. One boolean row, trivial oracle."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.filter((F.col("doc_id") % 5 == 1) & (F.col("doc_id") < 125)).select(
        (F.col("doc_id") + 3000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" qqq tail")).alias("text"),
    )
    batch = d.filter(F.col("doc_id") % 5 == 0).unionAll(planted)
    corpus = d.filter(F.col("doc_id") % 5 != 0)

    dedup.build_band_index(corpus, "band_idx_catalog")
    probe = dedup.near_dup_candidates_from_index(
        spark, batch, "band_idx_catalog", max_band_bucket=None
    )
    direct = dedup.near_dup_against_corpus(
        batch, corpus, threshold=0.6, max_band_bucket=None
    )
    got = probe.select("batch_id", "corpus_id")
    # direct candidates: rebuild the collision set without the verify cut
    sh_b, bk_b = dedup._shingles_and_bands(
        batch, "doc_id", "text", num_hashes=16, bands=4, shingle_n=3
    )
    sh_c, bk_c = dedup._shingles_and_bands(
        corpus, "doc_id", "text", num_hashes=16, bands=4, shingle_n=3
    )
    want = (
        bk_b.alias("l")
        .join(
            bk_c.alias("r"),
            (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.band") == F.col("r.band")),
        )
        .select(
            F.col("l.doc_id").alias("batch_id"),
            F.col("r.doc_id").alias("corpus_id"),
        )
        .distinct()
    )
    cand_diff = got.exceptAll(want).unionAll(want.exceptAll(got))
    verified_missing = direct.select("batch_id", "corpus_id").exceptAll(got)
    return cand_diff.agg(
        (F.count(F.lit(1)) == 0).alias("__c")
    ).crossJoin(
        verified_missing.agg((F.count(F.lit(1)) == 0).alias("__v"))
    ).select((F.col("__c") & F.col("__v")).alias("band_probe_matches"))


_FUZZY_ORACLE = """
WITH n AS (SELECT DISTINCT p_name FROM part),
t AS (SELECT p_name, split_part(p_name, ' ', 1) AS blk FROM n),
p AS (
  SELECT a.p_name AS name_a, b.p_name AS name_b,
         levenshtein(a.p_name, b.p_name) AS dist
  FROM t a JOIN t b ON a.blk = b.blk AND a.p_name < b.p_name)
SELECT name_a, name_b, CAST(dist AS BIGINT) AS dist
FROM p WHERE dist <= 2
"""


@query("fuzzy_name_pairs", _FUZZY_ORACLE)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string-similarity join: distinct part names blocked on their
    first token, Levenshtein-verified at distance <= 2. The blocking
    predicate is what makes edit-distance joins survive scale — candidate
    pairs exist only within a block (same device as the n-gram Jaccard
    blocked join), and the distinct-names projection collapses the input
    to its name vocabulary before any pairing."""
    p = _t(spark, sf_dir, "part")
    names = p.select("p_name").distinct()
    t = names.select(
        "p_name", F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("blk")
    )
    a, b = t.alias("a"), t.alias("b")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
            .cast("bigint")
            .alias("dist"),
        )
        .filter(F.col("dist") <= 2)
    )


_PSI_ORACLE = """
WITH a AS (
  SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket, COUNT(*) AS n
  FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1),
b AS (
  SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket, COUNT(*) AS n
  FROM orders WHERE o_orderkey % 2 = 1 GROUP BY 1),
ta AS (SELECT SUM(n) AS t FROM a),
tb AS (SELECT SUM(n) AS t FROM b),
j AS (
  SELECT COALESCE(a.bucket, b.bucket) AS bucket,
         COALESCE(a.n, 0) / CAST(ta.t AS DOUBLE) + 1e-6 AS pa,
         COALESCE(b.n, 0) / CAST(tb.t AS DOUBLE) + 1e-6 AS pb
  FROM a FULL OUTER JOIN b ON a.bucket = b.bucket, ta, tb)
SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
       round(SUM((pa - pb) * ln(pa / pb)), 6) AS psi,
       SUM((pa - pb) * ln(pa / pb)) > 0.1 AS drifted
FROM j
"""


@query("distribution_drift_psi", _PSI_ORACLE)
def distribution_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index between two order snapshots (even/odd
    keys): fixed-width price buckets, smoothed proportions, PSI =
    sum((pa-pb)*ln(pa/pb)). The drift monitor that guards a training-data
    refresh: two grouped scans over a bounded bucket space, a full-outer
    join on the tiny bucket dim, one scalar out. Buckets are value-range
    bounded, so the plan is the same at any row count."""
    o = _t(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("bucket")

    def side(parity: int) -> DataFrame:
        return (
            o.filter(F.col("o_orderkey") % 2 == parity)
            .groupBy(bucket)
            .agg(F.count(F.lit(1)).alias("n"))
        )

    a, b = side(0), side(1)
    ta = a.agg(F.sum("n").alias("ta"))
    tb = b.agg(F.sum("n").alias("tb"))
    j = (
        a.withColumnRenamed("n", "na")
        .join(b.withColumnRenamed("n", "nb"), "bucket", "full_outer")
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
        .select(
            "bucket",
            (
                F.coalesce(F.col("na"), F.lit(0)) / F.col("ta").cast("double")
                + 1e-6
            ).alias("pa"),
            (
                F.coalesce(F.col("nb"), F.lit(0)) / F.col("tb").cast("double")
                + 1e-6
            ).alias("pb"),
        )
    )
    term = (F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb"))
    return j.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.round(F.sum(term), 6).alias("psi"),
        (F.sum(term) > 0.1).alias("drifted"),
    )


_EWMA_ORACLE = """
WITH RECURSIVE d AS (
  SELECT day, rev, ROW_NUMBER() OVER (ORDER BY day) AS rn
  FROM (
    SELECT o_orderdate AS day,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
    FROM orders GROUP BY 1)),
e AS (
  SELECT rn, day, rev, rev AS ewma FROM d WHERE rn = 1
  UNION ALL
  SELECT d.rn, d.day, d.rev, 0.9 * e.ewma + 0.1 * d.rev
  FROM d JOIN e ON d.rn = e.rn + 1)
SELECT day, round(rev, 2) AS revenue, round(ewma, 4) AS ewma
FROM e
"""


@query("ewma_daily_revenue", _EWMA_ORACLE)
def ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average over daily revenue — the
    inherently-sequential recurrence (ewma_t = 0.9*ewma_{t-1} + 0.1*x_t)
    no built-in window expresses. Computed with an Arrow-batched
    applyInPandas over the DAILY aggregate: like the anomaly query, the
    sequential series is one row per distinct date — calendar-bounded at
    any raw scale — while the raw-table groupBy before it is the only
    real shuffle. pandas ewm(adjust=False) IS this recurrence in float64,
    which the oracle replays with a recursive CTE."""
    import pandas as pd

    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("rev")
    )

    schema = "day timestamp, revenue double, ewma double"

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day")
        ew = pdf["rev"].ewm(alpha=0.1, adjust=False).mean()
        return pd.DataFrame(
            {
                "day": pdf["day"],
                "revenue": pdf["rev"].round(2),
                "ewma": ew.round(4),
            }
        )

    return (
        daily.withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(fold, schema)
    )


_CHUNK_DEDUP_ORACLE = """
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
  FROM documents),
n AS (
  SELECT doc_id, toks, len(toks) AS nt,
         greatest(CAST(ceil((len(toks) - 16) / 48.0) AS INT), 1) AS n_chunks
  FROM t),
c AS (
  SELECT doc_id,
         unnest([array_to_string(toks[i*48 + 1 : i*48 + 64], ' ')
                 for i in generate_series(0, n_chunks - 1)]) AS chunk
  FROM n),
h AS (SELECT doc_id, md5(chunk) AS ch FROM c),
firsts AS (SELECT ch, MIN(doc_id) AS keeper FROM h GROUP BY ch)
SELECT h.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN h.doc_id > f.keeper THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_chunks,
       round(SUM(CASE WHEN h.doc_id > f.keeper THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS dup_ratio
FROM h JOIN firsts f ON h.ch = f.ch
GROUP BY h.doc_id
"""


@query("chunk_level_dedup", _CHUNK_DEDUP_ORACLE)
def chunk_level_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup (RefinedWeb-style): chunk every document into
    the standard 64/16 windows, hash each chunk, and charge a document
    for every chunk already owned by a lower-id document. Output is the
    per-document duplicated-chunk ratio — the signal for dropping or
    trimming mostly-recycled pages that document-level dedup misses.
    Composition of the existing chunker with one md5 groupBy: the shuffle
    key is the 32-char chunk hash, never the chunk text."""
    d = _t(spark, sf_dir, "documents")
    chunks = TX.token_chunks_of(F.col("__toks"), chunk_tokens=64, overlap=16)
    h = (
        d.select("doc_id", TX.tokens("text").alias("__toks"))
        .select("doc_id", F.explode(chunks).alias("c"))
        .select("doc_id", F.md5(F.col("c.chunk")).alias("ch"))
    )
    firsts = h.groupBy("ch").agg(F.min("doc_id").alias("keeper"))
    return (
        h.join(firsts, "ch")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(
                F.when(F.col("doc_id") > F.col("keeper"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_dup_chunks"),
            F.round(
                F.sum(
                    F.when(F.col("doc_id") > F.col("keeper"), 1).otherwise(0)
                )
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("dup_ratio"),
        )
    )


@query("approx_topk_gate", "SELECT true AS topk_ok")
def approx_topk_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_top_k gate (Spark 4's built-in sketch-backed top-k): with an
    internal capacity that dominates the keyspace the sketch never evicts,
    so estimates are exact — but WHICH k items come back is only defined
    up to count ties. The sf1.0 sweep (round 6) caught both halves of
    that contract tuned away at sf0.01: a fixed capacity of 10k
    saturated at 15k distinct users (a saturated approx_top_k returns an
    EMPTY list, not degraded estimates), and the exact-set-equality check
    failed on a 6-way tie at the 5th-place count (6 users at n=96 for 4
    slots — the sketch's pick and heavy_hitters' deterministic tie-break
    legitimately disagree). The gate now checks what the sketch actually
    guarantees, at any scale: (a) the returned COUNT MULTISET equals the
    exact top-5 count multiset, (b) every returned estimate equals that
    user's true count (filtered 5-id re-count, pushdown-cheap), (c) every
    STRICT heavy hitter — true count above 5th place — is present.
    Capacity = max(10k, 2x count_distinct): one extra single-column agg
    for a gate; production keyspaces past the 1M-item cap should gate on
    the sketch's eps*N bound instead (cms_heavy_hitter_gate pattern).
    One pass, mergeable, fixed memory — the cheap first look before
    committing to the exact TakeOrdered profile on a 100 TB key space."""
    from etl_bigquery_pipeline_spark.operators import skew

    e = _t(spark, sf_dir, "events")
    n_users = int(
        e.select(F.count_distinct("user_id").alias("d")).first()["d"]
    )
    cap = max(10_000, 2 * n_users)
    exact = {
        r.user_id: r.n for r in skew.heavy_hitters(e, ["user_id"], k=5).collect()
    }
    approx = e.agg(
        F.expr(f"approx_top_k(user_id, 5, {cap})").alias("tk")
    ).first()["tk"]
    got = {r["item"]: r["count"] for r in approx}
    kth = min(exact.values())
    strict = {u for u, n in exact.items() if n > kth}
    true_counts = (
        {
            r.user_id: r.n
            for r in e.where(
                F.col("user_id").isin([int(u) for u in got])
            )
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        if got
        else {}
    )
    ok = (
        len(got) == len(exact)
        and sorted(got.values()) == sorted(exact.values())
        and all(got[u] == true_counts.get(u) for u in got)
        and strict <= set(got)
    )
    return spark.createDataFrame([(bool(ok),)], "topk_ok boolean")


_CONTAINMENT_ORACLE = """
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(t[i:i+2], ' ')
                        for i in generate_series(1, greatest(len(t) - 2, 1))]) AS s
  FROM toks),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         round(len(list_intersect(a.s, b.s)) / CAST(len(a.s) AS DOUBLE), 6)
           AS containment_a_in_b
  FROM sh a JOIN sh b
    ON a.doc_id <> b.doc_id AND abs(a.doc_id - b.doc_id) <= 100)
SELECT id_a, id_b, containment_a_in_b
FROM pairs WHERE containment_a_in_b >= 0.8
"""


@query("shingle_containment_pairs", _CONTAINMENT_ORACLE)
def shingle_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment (Broder): |A ∩ B| / |A| over id-blocked
    pairs — catches a document SUBSET-quoted inside a larger one, which
    symmetric Jaccard dilutes below threshold. Directional, so both
    (a,b) and (b,a) are evaluated within the block. Same mandatory
    blocking discipline as the exact Jaccard path; the LSH route remains
    the unblocked scale path for the symmetric case."""
    d = _t(spark, sf_dir, "documents")
    sh_df = (
        widen_if_narrow(d, "doc_id")
        .select("doc_id", TX.tokens("text").alias("__toks"))
        .select(
            "doc_id", TX.shingles_of(F.col("__toks"), 3).alias("__sh")
        )
        .transform(scoped_cache)
    )
    # equi-blocking, not a theta join: a-side rows replicate into their
    # own and the next id-block, the b-side keys by its block — the join
    # is a plain hash join on the block id, and the residual distance
    # predicate filters inside matched blocks only
    a = sh_df.select(
        F.col("doc_id").alias("id_a"),
        F.col("__sh").alias("__sa"),
        F.explode(
            F.array(
                F.floor(F.col("doc_id") / 100) - 1,
                F.floor(F.col("doc_id") / 100),
                F.floor(F.col("doc_id") / 100) + 1,
            )
        ).alias("__blk"),
    )
    b = sh_df.select(
        F.col("doc_id").alias("id_b"),
        F.col("__sh").alias("__sb"),
        F.floor(F.col("doc_id") / 100).alias("__blk"),
    )
    cont = F.round(
        F.size(F.array_intersect("__sa", "__sb"))
        / F.size("__sa").cast("double"),
        6,
    )
    # BOTH sides are corpus-proportional and carry full shingle arrays
    # — the static planner broadcast one at sf10 ("Not enough memory to
    # build and broadcast", r9 sweep; the r7 minhash / r8 ngram hazard
    # class, one more member). Merge-pinned: block ids are the join key
    # on both sides, so sort-merge shuffles each side once and never
    # hash-builds a corpus-sized relation on the driver.
    return (
        a.join(b.hint("merge"), "__blk")
        .filter(
            (F.col("id_a") != F.col("id_b"))
            & (F.abs(F.col("id_a") - F.col("id_b")) <= 100)
        )
        .select("id_a", "id_b", cont.alias("containment_a_in_b"))
        .filter(F.col("containment_a_in_b") >= 0.8)
        .distinct()
    )


@query("grouped_approx_percentile_gate", "SELECT true AS grouped_pct_ok")
def grouped_approx_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped sketch gate: percentile_approx (mergeable, one pass) must
    land within 1% relative of the exact interpolated percentile in
    EVERY group — the per-group mergeability property that makes sketch
    percentiles safe to partial-aggregate across 1000 executors. The
    exact arm runs the value-frequency histogram plan
    (`_hist_exact_percentiles`) rather than percentile()'s per-task
    value buffer — the r8 sf10 OOM class (r8 verdict ask #2); the
    approx arm stays the one-pass sketch under test. The two arms join
    on the 3-row group key (broadcast)."""
    li = _t(spark, sf_dir, "lineitem")
    exact = _hist_exact_percentiles(
        li, "l_returnflag", "l_extendedprice", [0.5, 0.95], ["e50", "e95"]
    )
    approx = li.groupBy("l_returnflag").agg(
        F.expr(
            "percentile_approx(l_extendedprice, array(0.5, 0.95), 10000)"
        ).alias("ap"),
    )
    g = approx.join(F.broadcast(exact), "l_returnflag").select(
        F.array("e50", "e95").alias("ex"), "ap"
    )
    rel_ok = F.forall(
        F.zip_with(
            "ex",
            "ap",
            lambda e, a: F.abs(e - a) <= F.abs(e) * 0.01,
        ),
        lambda x: x,
    )
    return g.agg(
        F.every(rel_ok).alias("grouped_pct_ok")
    )


_PIT_ORACLE = f"""
WITH hist AS ({_SCD2_ORACLE}),
probe AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 2 = 0 THEN DATE '2024-03-01'
              ELSE DATE '2024-08-01' END AS probe_date
  FROM orders)
SELECT o_orderkey, probe_date, h.c_acctbal AS acctbal_at_date
FROM probe JOIN hist h
  ON h.c_custkey = probe.o_custkey
 AND h.valid_from <= probe.probe_date
 AND (h.valid_to IS NULL OR probe.probe_date < h.valid_to)
"""


@query("scd2_point_in_time_join", _PIT_ORACLE)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join against SCD2 history: each order
    probes the dimension AS OF a date (half before, half after the
    version split), matching exactly the version whose validity interval
    covers it. The join has an equi component (custkey) so it plans as a
    hash join with the interval predicate as a residual filter — the
    scale-correct shape for temporal joins (never a pure range
    nested-loop when a key exists). This is what the SCD2 history is FOR:
    reproducing features as they were at training/label time."""
    hist = QUERIES["scd2_customer_history"](spark, sf_dir)
    o = _t(spark, sf_dir, "orders")
    probe = o.select(
        "o_orderkey",
        "o_custkey",
        F.when(
            F.col("o_orderkey") % 2 == 0, F.lit("2024-03-01").cast("date")
        )
        .otherwise(F.lit("2024-08-01").cast("date"))
        .alias("probe_date"),
    )
    return (
        probe.join(
            hist,
            (hist["c_custkey"] == probe["o_custkey"])
            & (hist["valid_from"] <= probe["probe_date"])
            & (
                hist["valid_to"].isNull()
                | (probe["probe_date"] < hist["valid_to"])
            ),
        )
        .select(
            "o_orderkey",
            "probe_date",
            F.col("c_acctbal").alias("acctbal_at_date"),
        )
    )


_CAP_SAMPLE_ORACLE = """
WITH r AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents)
SELECT doc_id, source FROM r WHERE rn <= 5
"""


@query("capped_per_source_sample", _CAP_SAMPLE_ORACLE)
def capped_per_source_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-stratum sampling: rank each source's documents by
    md5(doc_id) and keep the first 5 — the balanced-eval-set draw where
    fractions won't do (small strata must still yield k). Deterministic:
    the hash is the random tape, the id breaks ties. One shuffle on the
    stratum key; per-stratum work is a linear scan, so a skewed stratum
    costs its size, never a cross product."""
    d = _t(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.lit("cap:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(h, F.col("doc_id"))
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 5)
        .select("doc_id", "source")
    )


_ENTROPY_ORACLE = """
WITH g AS (
  SELECT doc_id,
         unnest([substring(text, i, 2)
                 for i in generate_series(1, greatest(len(text) - 1, 1))]) AS bg
  FROM documents),
c AS (SELECT doc_id, bg, COUNT(*) AS n FROM g GROUP BY doc_id, bg),
t AS (SELECT doc_id, SUM(n) AS tot FROM c GROUP BY doc_id)
SELECT c.doc_id,
       round(-SUM((n / CAST(tot AS DOUBLE)) * ln(n / CAST(tot AS DOUBLE))), 4)
         AS bigram_entropy,
       CAST(COUNT(*) AS BIGINT) AS distinct_bigrams
FROM c JOIN t ON c.doc_id = t.doc_id
GROUP BY c.doc_id
"""


@query("char_entropy_quality", _ENTROPY_ORACLE)
def char_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-bigram Shannon entropy per document — the cheap
    perplexity proxy that separates natural text (high, stable entropy)
    from boilerplate/binary junk (low) and random noise (near-maximal).

    The whole computation is row-local, so it runs ZERO-SHUFFLE: bigrams
    materialize via transform(sequence) (JVM-side, no UDF), array_sort
    makes equal bigrams adjacent, and one aggregate() fold walks the
    runs accumulating sum(n*ln n), the distinct-run count, and the
    total. Entropy follows from the identity
    -sum(p*ln p) = ln(tot) - sum(n*ln n)/tot. A 100 TB corpus scans
    once with no Exchange in the plan; the earlier explode + double
    groupBy form shuffled per-doc distinct bigrams for no reason."""
    d = _t(spark, sf_dir, "documents")
    # a run starts when the accumulator is empty (run=0) or the sorted
    # element differs from the previous one; <=> keeps null bigrams
    # (null/empty text) grouped like the explode+groupBy form did
    fold = F.expr(
        """
        aggregate(
          array_sort(transform(sequence(1, greatest(length(text) - 1, 1)),
                               i -> substring(text, i, 2))),
          named_struct('prev', cast(null as string),
                       'run', cast(0 as bigint),
                       'snn', cast(0 as double),
                       'k', cast(0 as bigint),
                       'tot', cast(0 as bigint)),
          (acc, x) -> IF(acc.run > 0 AND x <=> acc.prev,
             named_struct('prev', acc.prev, 'run', acc.run + 1,
                          'snn', acc.snn, 'k', acc.k, 'tot', acc.tot + 1),
             named_struct('prev', x, 'run', cast(1 as bigint),
                          'snn', acc.snn + IF(acc.run > 0,
                                cast(acc.run as double)
                                  * ln(cast(acc.run as double)),
                                cast(0 as double)),
                          'k', acc.k + 1, 'tot', acc.tot + 1)),
          acc -> named_struct(
             'snn', acc.snn + IF(acc.run > 0,
                    cast(acc.run as double) * ln(cast(acc.run as double)),
                    cast(0 as double)),
             'k', acc.k, 'tot', acc.tot))
        """
    )
    return d.select("doc_id", fold.alias("__e")).select(
        "doc_id",
        F.round(
            F.log(F.col("__e.tot").cast("double"))
            - F.col("__e.snn") / F.col("__e.tot").cast("double"),
            4,
        ).alias("bigram_entropy"),
        F.col("__e.k").alias("distinct_bigrams"),
    )


_SEQ_CONFORM_ORACLE = """
WITH s AS (
  SELECT user_id, event_type, ts, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events),
v AS (
  SELECT user_id,
         SUM(CASE WHEN event_type = 'purchase'
                   AND (prev_type IS NULL OR prev_type = 'signup')
                  THEN 1 ELSE 0 END) AS n_violations,
         COUNT(*) AS n_events
  FROM s GROUP BY user_id)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(CASE WHEN n_violations > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS users_with_violations,
       CAST(SUM(n_violations) AS BIGINT) AS total_violations
FROM v
"""


@query("sequence_conformance", _SEQ_CONFORM_ORACLE)
def sequence_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-order conformance: a purchase with no prior event (or
    straight after signup) violates the expected lifecycle — the
    sequence-validity probe a CDP runs before trusting funnel metrics.
    LAG over each user's time order, one grouped verdict; the shuffle is
    the user_id window, the output three scalars."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.withColumn("prev_type", F.lag("event_type").over(w))
    viol = F.when(
        (F.col("event_type") == "purchase")
        & (F.col("prev_type").isNull() | (F.col("prev_type") == "signup")),
        1,
    ).otherwise(0)
    v = s.groupBy("user_id").agg(
        F.sum(viol).alias("n_violations"), F.count(F.lit(1)).alias("n_events")
    )
    return v.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum((F.col("n_violations") > 0).cast("int"))
        .cast("bigint")
        .alias("users_with_violations"),
        F.sum("n_violations").cast("bigint").alias("total_violations"),
    )


_TOP3_NESTED_ORACLE = """
WITH r AS (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer)
SELECT c_mktsegment,
       array_to_string(list(c_custkey ORDER BY rn), ',') AS top_custkeys,
       round(list(c_acctbal ORDER BY rn)[1], 2) AS best_acctbal
FROM r WHERE rn <= 3
GROUP BY c_mktsegment
"""


@query("top3_customers_nested", _TOP3_NESTED_ORACLE)
def top3_customers_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per group materialized as a rank-ordered list column (the
    API-response / feature-vector shape, not one row per rank):
    rank-filter then collect into rank-ordered arrays via
    array_sort(collect_list(struct)) — collect_list alone has no order
    guarantee under parallel merge. The list is emitted as a
    comma-joined string so the output schema stays atomic (the oracle
    comparison canonicalizes via pandas, which cannot hash arrays).
    Group count bounds the output; the rank window shuffles once on
    the segment key."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    r = (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "rn", "c_custkey", "c_acctbal")
    )
    s = r.groupBy("c_mktsegment").agg(
        F.array_sort(
            F.collect_list(F.struct("rn", "c_custkey", "c_acctbal"))
        ).alias("t")
    )
    return s.select(
        "c_mktsegment",
        F.array_join(
            F.transform("t", lambda x: x["c_custkey"].cast("string")), ","
        ).alias("top_custkeys"),
        F.round(F.element_at("t", 1)["c_acctbal"], 2).alias("best_acctbal"),
    )


_BENFORD_ORACLE = """
WITH d AS (
  SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
              AS INT) AS digit
  FROM orders WHERE o_totalprice >= 1),
c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
t AS (SELECT SUM(n) AS tot FROM c)
SELECT digit, CAST(n AS BIGINT) AS n,
       round(n / CAST(tot AS DOUBLE), 6) AS observed,
       round(log10(1.0 + 1.0 / digit), 6) AS benford_expected
FROM c, t
"""


@query("benford_digit_profile", _BENFORD_ORACLE)
def benford_digit_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit profile of order totals: observed leading-
    digit frequencies against log10(1 + 1/d) — the classic anomaly probe
    for fabricated or truncated monetary data. Digit space is 1-9, so
    the grouped output is constant-size at any row count; one scan, one
    tiny shuffle, total via a broadcast 1-row aggregate."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("tot"))
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n") / F.col("tot").cast("double"), 6).alias("observed"),
        F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias(
            "benford_expected"
        ),
    )


_CHI2_ORACLE = """
WITH o AS (
  SELECT c_mktsegment AS seg, n_name AS nat
  FROM customer JOIN nation ON c_nationkey = n_nationkey),
c AS (SELECT seg, nat, COUNT(*) AS n FROM o GROUP BY seg, nat),
m AS (SELECT seg, SUM(n) AS rs FROM c GROUP BY seg),
k AS (SELECT nat, SUM(n) AS cs FROM c GROUP BY nat),
t AS (SELECT SUM(n) AS tot FROM c),
full_grid AS (
  SELECT m.seg, k.nat, m.rs, k.cs, COALESCE(c.n, 0) AS n
  FROM m CROSS JOIN k LEFT JOIN c ON c.seg = m.seg AND c.nat = k.nat)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST((SELECT COUNT(*) FROM m) - 1 AS BIGINT)
         * CAST((SELECT COUNT(*) FROM k) - 1 AS BIGINT) AS dof,
       round(SUM(pow(n - rs * cs / CAST(tot AS DOUBLE), 2)
                 / (rs * cs / CAST(tot AS DOUBLE))), 4) AS chi2
FROM full_grid, t
"""


@query("chi2_segment_nation", _CHI2_ORACLE)
def chi2_segment_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence over the (segment x nation) contingency
    table, zero-observed cells included via the margin cross — the
    association test behind 'is this attribute informative'. Margins are
    dimension-sized, so the grid cross-join is tiny and broadcasts; the
    only data-scale work is the first grouped count."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]).select(
        F.col("c_mktsegment").alias("seg"), F.col("n_name").alias("nat")
    )
    cnt = o.groupBy("seg", "nat").agg(F.count(F.lit(1)).alias("n"))
    m = cnt.groupBy("seg").agg(F.sum("n").alias("rs"))
    k = cnt.groupBy("nat").agg(F.sum("n").alias("cs"))
    t = cnt.agg(F.sum("n").alias("tot"))
    grid = (
        m.crossJoin(k)
        .join(cnt, ["seg", "nat"], "left")
        .select("seg", "nat", "rs", "cs", F.coalesce("n", F.lit(0)).alias("n"))
        .crossJoin(F.broadcast(t))
    )
    exp = F.col("rs") * F.col("cs") / F.col("tot").cast("double")
    n_seg = m.agg(F.count(F.lit(1)).alias("x"))
    n_nat = k.agg(F.count(F.lit(1)).alias("y"))
    return (
        grid.agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.round(F.sum(F.pow(F.col("n") - exp, 2) / exp), 4).alias("chi2"),
        )
        .crossJoin(F.broadcast(n_seg))
        .crossJoin(F.broadcast(n_nat))
        .select(
            "n_cells",
            ((F.col("x") - 1) * (F.col("y") - 1))
            .cast("bigint")
            .alias("dof"),
            "chi2",
        )
    )


_COLPROFILE_ORACLE = """
WITH s AS (
  SELECT COUNT(*) AS n_rows,
         SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS nn_returnflag,
         COUNT(DISTINCT l_returnflag) AS nd_returnflag,
         SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS nn_shipdate,
         COUNT(DISTINCT l_shipdate) AS nd_shipdate,
         SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS nn_quantity,
         COUNT(DISTINCT l_quantity) AS nd_quantity
  FROM lineitem)
SELECT col, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_nulls AS BIGINT) AS n_nulls,
       CAST(n_distinct AS BIGINT) AS n_distinct
FROM (
  SELECT 'l_returnflag' AS col, n_rows, nn_returnflag AS n_nulls,
         nd_returnflag AS n_distinct FROM s
  UNION ALL
  SELECT 'l_shipdate', n_rows, nn_shipdate, nd_shipdate FROM s
  UNION ALL
  SELECT 'l_quantity', n_rows, nn_quantity, nd_quantity FROM s)
"""


@query("column_profile_lineitem", _COLPROFILE_ORACLE)
def column_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile (the shape every catalog/profiling tool emits): one
    row per column with row/null/exact-distinct counts, computed in ONE
    aggregate pass — multiple COUNT(DISTINCT)s plan via Expand (rows x
    profiled columns), which is the documented cost of exactness; swap
    approx_count_distinct per column for the one-pass sketch profile at
    full scale. The wide single-row aggregate unpivots to the long shape
    with a stack()."""
    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_returnflag", "l_shipdate", "l_quantity"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("int")).alias(f"nn_{c}")
        )
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    s = li.agg(*aggs)
    stack = ", ".join(
        f"'{c}', nn_{c}, nd_{c}" for c in cols
    )
    return s.selectExpr(
        f"stack({len(cols)}, {stack}) AS (col, n_nulls, n_distinct)",
        "n_rows",
    ).select(
        "col",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
    )


_COPURCHASE_ORACLE = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
p AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_orders
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey)
SELECT part_a, part_b, CAST(n_orders AS BIGINT) AS n_orders
FROM p
ORDER BY n_orders DESC, part_a, part_b
LIMIT 20
"""


@query("copurchase_part_pairs", _COPURCHASE_ORACLE)
def copurchase_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: part pairs appearing in the same
    order, top-20 by support. The self-join fans out quadratically ONLY
    within an order (TPC-H orders hold <= 7 lines, so the blowup is a
    bounded constant — the same property that makes this shape safe on
    real baskets after a per-basket item cap), then one grouped count and
    a TakeOrdered. Distinct-projection first so duplicate (order, part)
    lines never inflate support."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(20)
    )


_WAU_ORACLE = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM du)
SELECT days.day,
       CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS wau
FROM days JOIN du
  ON du.day BETWEEN days.day - INTERVAL 6 DAY AND days.day
GROUP BY days.day
"""


@query("weekly_active_users", _WAU_ORACLE)
def weekly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users per day (the WAU curve): windowed
    COUNT(DISTINCT) over time, which no window frame computes directly.
    Dedup to (day, user) pairs FIRST (event volume never enters the
    band join), then band-join the pair set against the observed-day
    spine — pairs x 7 rows, bounded by active users x days, not events.
    The band join carries no equi key by design (every day pairs with a
    6-day neighborhood); the spine side is dimension-sized, so it
    broadcasts and the 'product' is the intended 7x fan-out."""
    e = _t(spark, sf_dir, "events")
    du = e.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct()
    return (
        du.alias("p")
        .join(
            F.broadcast(days.alias("d")),
            (F.col("p.day") >= F.date_sub(F.col("d.day"), 6))
            & (F.col("p.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("user_id").cast("bigint").alias("wau"))
    )


_SEASONALITY_ORACLE = """
SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,  -- DuckDB Sun=0, Spark Sun=1
       CAST(hour(ts) AS INT) AS hod,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       round(AVG(value), 4) AS avg_value
FROM events GROUP BY 1, 2
"""


@query("hourly_seasonality", _SEASONALITY_ORACLE)
def hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day x day-of-week seasonality heatmap (the capacity-
    planning / anomaly-baseline profile): one grouped pass into a
    bounded 7x24 cell space — constant output at any event volume."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.dayofweek("ts").cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hod"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


_FULFILL_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(MIN(date_diff('day', CAST(o_orderdate AS DATE),
                          CAST(l_shipdate AS DATE))) AS BIGINT) AS min_days,
       round(AVG(date_diff('day', CAST(o_orderdate AS DATE),
                           CAST(l_shipdate AS DATE))), 4) AS avg_days,
       round(median(date_diff('day', CAST(o_orderdate AS DATE),
                              CAST(l_shipdate AS DATE))), 1) AS median_days
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


@query("fulfillment_latency_by_priority", _FULFILL_ORACLE)
def fulfillment_latency_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency per priority class — the SLA monitor: one
    orderkey join (fact-fact, co-partitionable), datediff map-side, tiny
    grouped stats. Median is the exact interpolated one; at full scale
    swap approx_percentile and keep the same gate discipline."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    d = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select("o_orderpriority", d.alias("days"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.min("days").cast("bigint").alias("min_days"),
            F.round(F.avg("days"), 4).alias("avg_days"),
            F.round(F.median("days"), 1).alias("median_days"),
        )
    )


_INTERORDER_ORACLE = """
WITH s AS (
  SELECT o_custkey,
         date_diff('day',
           LAG(CAST(o_orderdate AS DATE)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           CAST(o_orderdate AS DATE)) AS gap
  FROM orders)
SELECT CAST(COUNT(*) AS BIGINT) AS n_intervals,
       round(AVG(gap), 4) AS avg_gap_days,
       round(median(gap), 1) AS median_gap_days,
       CAST(MAX(gap) AS BIGINT) AS max_gap_days
FROM s WHERE gap IS NOT NULL
"""


@query("interorder_intervals", _INTERORDER_ORACLE)
def interorder_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence: LAG over each customer's order history
    gives the days-between-orders distribution (the retention/LTV input).
    One custkey window shuffle, scalar output."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gap = F.datediff(
        F.col("o_orderdate").cast("date"),
        F.lag(F.col("o_orderdate").cast("date")).over(w),
    )
    s = o.select(gap.alias("gap")).filter(F.col("gap").isNotNull())
    return s.agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.round(F.avg("gap"), 4).alias("avg_gap_days"),
        F.round(F.median("gap"), 1).alias("median_gap_days"),
        F.max("gap").cast("bigint").alias("max_gap_days"),
    )


_PARETO_ORACLE = """
WITH r AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
              AS DOUBLE) AS rev
  FROM lineitem GROUP BY l_partkey),
c AS (
  SELECT l_partkey, rev,
         SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(rev) OVER () AS tot
  FROM r),
k AS (
  SELECT CASE WHEN cum / tot <= 0.8 THEN 'A'
              WHEN cum / tot <= 0.95 THEN 'B'
              ELSE 'C' END AS abc_class, rev
  FROM c)
SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
       round(SUM(rev), 2) AS class_revenue
FROM k GROUP BY abc_class
"""


@query("pareto_abc_parts", _PARETO_ORACLE)
def pareto_abc_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC classification of parts by revenue: cumulative share
    over the revenue-ranked PER-PART aggregate, classes cut at 80/95%.
    The per-part frame grows with the catalog (sf100k ~ 2e10 parts), so
    the running sum rides operators.windows.with_global_running_sums
    (range shuffle + per-partition offsets) instead of a
    single-partition cumulative window; the grand total is a 1-row
    broadcast join. The inventory-policy analytic; ties rank by partkey
    so the class boundary is deterministic."""
    li = _t(spark, sf_dir, "lineitem")
    r = li.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        )
        .cast("double")
        .alias("rev")
    )
    cum = windows.with_global_running_sums(
        r, [F.desc("rev"), F.col("l_partkey")], ["rev"]
    )
    c = cum.join(
        F.broadcast(r.agg(F.sum("rev").alias("__tot")))
    ).select("rev", (F.col("cum_rev") / F.col("__tot")).alias("share"))
    cls = (
        F.when(F.col("share") <= 0.8, "A")
        .when(F.col("share") <= 0.95, "B")
        .otherwise("C")
    )
    return (
        c.select(cls.alias("abc_class"), "rev")
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.sum("rev"), 2).alias("class_revenue"),
        )
    )


_RFM_ORACLE = """
WITH m AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
base AS (
  SELECT o_custkey,
         date_diff('day', MAX(CAST(o_orderdate AS DATE)), maxd) AS recency,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS monetary
  FROM orders, m GROUP BY o_custkey, maxd),
th AS (
  SELECT quantile_cont(recency, 0.5) AS r_med,
         quantile_cont(frequency, 0.5) AS f_med,
         quantile_cont(monetary, 0.5) AS m_med
  FROM base)
SELECT CASE WHEN recency <= r_med THEN 'recent' ELSE 'lapsed' END AS r_seg,
       CASE WHEN frequency > f_med THEN 'frequent' ELSE 'occasional' END AS f_seg,
       CASE WHEN monetary > m_med THEN 'high' ELSE 'low' END AS m_seg,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       round(AVG(monetary), 2) AS avg_monetary
FROM base, th
GROUP BY r_seg, f_seg, m_seg
"""


@query("rfm_segment_counts", _RFM_ORACLE)
def rfm_segment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer recency/frequency/monetary split at
    the exact medians (broadcast 1-row thresholds — the same two-phase
    scalar device as the equi-depth histogram), counted into the 8
    segment cells. The per-customer frame is corpus-proportional, so
    the three medians run on the histogram plan rather than
    percentile()'s per-task value buffer (the r8 sf10 OOM class);
    the frame is cached once and reused by all three + the join."""
    o = _t(spark, sf_dir, "orders")
    maxd = o.agg(F.max(F.col("o_orderdate").cast("date")).alias("maxd"))
    base = (
        o.crossJoin(F.broadcast(maxd))
        .groupBy("o_custkey", "maxd")
        .agg(
            F.datediff(
                "maxd", F.max(F.col("o_orderdate").cast("date"))
            ).alias("recency"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("monetary"),
        )
    ).transform(scoped_cache)
    th = (
        _hist_exact_percentiles(base, None, "recency", [0.5], ["r_med"])
        .crossJoin(
            _hist_exact_percentiles(
                base, None, "frequency", [0.5], ["f_med"]
            )
        )
        .crossJoin(
            _hist_exact_percentiles(
                base, None, "monetary", [0.5], ["m_med"]
            )
        )
    )
    j = base.crossJoin(F.broadcast(th))
    return (
        j.select(
            F.when(F.col("recency") <= F.col("r_med"), "recent")
            .otherwise("lapsed")
            .alias("r_seg"),
            F.when(F.col("frequency") > F.col("f_med"), "frequent")
            .otherwise("occasional")
            .alias("f_seg"),
            F.when(F.col("monetary") > F.col("m_med"), "high")
            .otherwise("low")
            .alias("m_seg"),
            "monetary",
        )
        .groupBy("r_seg", "f_seg", "m_seg")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("monetary"), 2).alias("avg_monetary"),
        )
    )


_BOUNCE_ORACLE = """
WITH e AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events),
f AS (
  SELECT *, CASE WHEN prev IS NULL OR ts - prev > INTERVAL '30 minutes'
                 THEN 1 ELSE 0 END AS brk
  FROM e),
g AS (
  SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM f),
s AS (
  SELECT user_id, session_seq, CAST(MIN(ts) AS DATE) AS day,
         COUNT(*) AS n_events
  FROM g GROUP BY user_id, session_seq)
SELECT day, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       round(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS bounce_rate
FROM s GROUP BY day
"""


@query("bounce_rate_by_day", _BOUNCE_ORACLE)
def bounce_rate_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: share of sessions (30-min inactivity islands,
    the sessionize operator) holding exactly one event, keyed by session
    start day — the engagement KPI layered on sessionization. Adds one
    tiny day-grouped pass over the per-session rollup."""
    e = _t(spark, sf_dir, "events")
    s = sessionize.session_stats(
        e, user_col="user_id", ts_col="ts", gap_minutes=30,
        value_col="value", order_cols=("event_id",),
        keep_bounds=True,
    )
    return (
        s.select(
            F.col("session_start").cast("date").alias("day"),
            (F.col("n_events") == 1).cast("int").alias("is_bounce"),
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("is_bounce").cast("bigint").alias("n_bounces"),
            F.round(
                F.sum("is_bounce") / F.count(F.lit(1)).cast("double"), 6
            ).alias("bounce_rate"),
        )
    )


_NEW_RETURNING_ORACLE = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
f AS (SELECT user_id, MIN(day) AS first_day FROM du GROUP BY user_id)
SELECT du.day,
       CAST(SUM(CASE WHEN du.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS new_users,
       CAST(SUM(CASE WHEN du.day > f.first_day THEN 1 ELSE 0 END) AS BIGINT)
         AS returning_users
FROM du JOIN f ON du.user_id = f.user_id
GROUP BY du.day
"""


@query("new_vs_returning_users", _NEW_RETURNING_ORACLE)
def new_vs_returning_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning split: each active (day, user) pair is new
    iff the day is that user's first. Same pair-frame as WAU/retention —
    the three KPIs share one shuffle shape (dedup to pairs, user-keyed
    join), so a real pipeline computes them off one cached pair table."""
    e = _t(spark, sf_dir, "events")
    du = e.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    f = du.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        du.join(f, "user_id")
        .groupBy("day")
        .agg(
            F.sum((F.col("day") == F.col("first_day")).cast("int"))
            .cast("bigint")
            .alias("new_users"),
            F.sum((F.col("day") > F.col("first_day")).cast("int"))
            .cast("bigint")
            .alias("returning_users"),
        )
    )


_MONTHLY_ROLLUP_ORACLE = """
SELECT CAST(date_trunc('month', CAST(ts AS DATE)) AS DATE) AS month,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS value_sum,
       MIN(value) AS value_min,
       MAX(value) AS value_max,
       round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
             / COUNT(*), 4) AS value_avg
FROM events GROUP BY 1, 2
"""


@query("monthly_event_rollup", _MONTHLY_ROLLUP_ORACLE)
def monthly_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly rollup answered THROUGH the daily aggregate table
    (plans/aggregates): facts fold once into the daily additive rollup,
    the month re-merges O(days x keys) rows. The oracle computes the
    month DIRECTLY from raw events — hash equality proves the
    summary-table routing loses nothing (avg finalized from sum/count,
    never averaged averages)."""
    from etl_bigquery_pipeline_spark.plans import aggregates

    e = _t(spark, sf_dir, "events")
    daily = aggregates.build_daily_rollup(e)
    m = aggregates.rollup_to_monthly(daily)
    return m.select(
        "month",
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("value_sum").cast("double").alias("value_sum"),
        "value_min",
        "value_max",
        "value_avg",
    )


_LIFT_ORACLE = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li),
sup AS (SELECT l_partkey, COUNT(*) AS s FROM li GROUP BY l_partkey),
p AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS ab
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= 3)
SELECT part_a, part_b, CAST(ab AS BIGINT) AS n_together,
       round(ab * CAST(n_orders AS DOUBLE) / (sa.s * sb.s), 4) AS lift
FROM p
JOIN sup sa ON p.part_a = sa.l_partkey
JOIN sup sb ON p.part_b = sb.l_partkey, n
ORDER BY lift DESC, part_a, part_b
LIMIT 20
"""


@query("copurchase_lift_top20", _LIFT_ORACLE)
def copurchase_lift_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association LIFT, not just support: P(a,b)/(P(a)P(b)) over
    co-ordered part pairs with a minimum-support floor (lift on 1-2
    baskets is noise). Support counts broadcast back onto the pair
    frame; top-20 via TakeOrdered with deterministic tie-break. The
    floor is also what bounds the pair frame the lift join touches."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n = li.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    sup = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("s"))
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("ab"))
        .filter(F.col("ab") >= 3)
    )
    sa = sup.select(F.col("l_partkey").alias("part_a"), F.col("s").alias("sa"))
    sb = sup.select(F.col("l_partkey").alias("part_b"), F.col("s").alias("sb"))
    return (
        pairs.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            F.col("ab").cast("bigint").alias("n_together"),
            F.round(
                F.col("ab")
                * F.col("n_orders").cast("double")
                / (F.col("sa") * F.col("sb")),
                4,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(20)
    )


_CONCURRENCY_ORACLE = """
WITH e AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events),
f AS (
  SELECT *, CASE WHEN prev IS NULL OR ts - prev > INTERVAL '30 minutes'
                 THEN 1 ELSE 0 END AS brk
  FROM e),
g AS (
  SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
            ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM f),
s AS (
  SELECT user_id, session_seq, MIN(ts) AS st, MAX(ts) AS en
  FROM g GROUP BY user_id, session_seq),
pts AS (
  SELECT CAST(st AS DATE) AS day, st AS t, 1 AS delta, 0 AS tie FROM s
  UNION ALL
  SELECT CAST(st AS DATE) AS day, en AS t, -1 AS delta, 1 AS tie FROM s),
run AS (
  SELECT day,
         SUM(delta) OVER (PARTITION BY day ORDER BY t, tie, delta
                          ROWS UNBOUNDED PRECEDING) AS live
  FROM pts)
SELECT day, CAST(MAX(live) AS BIGINT) AS peak_concurrent
FROM run GROUP BY day
"""


@query("peak_concurrent_sessions", _CONCURRENCY_ORACLE)
def peak_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the sweep-line algorithm as
    DataFrame algebra: session intervals become +1/-1 boundary events, a
    running sum ordered by time is the live-session count, its max per
    day the capacity answer. The sweep is PARTITIONED BY DAY (sessions
    keyed to their start day; midnight-crossers count toward the start
    day — documented clipping), so no global ordering ever materializes.
    Ends sort after coincident starts (tie column) so a session touching
    a point still counts at it."""
    e = _t(spark, sf_dir, "events")
    s = sessionize.session_stats(
        e, user_col="user_id", ts_col="ts", gap_minutes=30,
        value_col="value", order_cols=("event_id",),
        keep_bounds=True,
    )
    starts = s.select(
        F.col("session_start").cast("date").alias("day"),
        F.col("session_start").alias("t"),
        F.lit(1).alias("delta"),
        F.lit(0).alias("tie"),
    )
    ends = s.select(
        F.col("session_start").cast("date").alias("day"),
        F.col("session_end").alias("t"),
        F.lit(-1).alias("delta"),
        F.lit(1).alias("tie"),
    )
    pts = starts.unionAll(ends)
    w = (
        Window.partitionBy("day")
        .orderBy("t", "tie", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.select("day", F.sum("delta").over(w).alias("live"))
    return run.groupBy("day").agg(
        F.max("live").cast("bigint").alias("peak_concurrent")
    )


# ===================================================================
# Tier — round 4: survivorship, contamination matrix, inference
# statistics, fold assignment, rolling distinct, growth series
# ===================================================================


_SURVIVORSHIP_ORACLE = """
WITH r AS (
  SELECT l_orderkey, l_linenumber, l_extendedprice, l_suppkey,
         COUNT(*) OVER (PARTITION BY l_orderkey, l_linenumber)
           AS n_versions,
         ROW_NUMBER() OVER (
           PARTITION BY l_orderkey, l_linenumber
           ORDER BY l_extendedprice DESC, l_shipdate ASC, l_quantity DESC,
                    l_suppkey ASC, l_partkey ASC, l_discount ASC,
                    l_tax ASC, l_returnflag ASC, l_linestatus ASC) AS rn
  FROM lineitem)
SELECT l_orderkey, l_linenumber,
       CAST(n_versions AS BIGINT) AS n_versions,
       round(l_extendedprice, 2) AS surv_price,
       l_suppkey AS surv_suppkey
FROM r WHERE rn = 1 AND n_versions > 1
"""


@query("lineitem_survivorship", _SURVIVORSHIP_ORACLE)
def lineitem_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship (golden-record) resolution over the seeded duplicate
    PKs: within each (orderkey, linenumber) group the surviving row is
    chosen by an explicit, total ordering over every column — the MDM
    merge rule, deterministic on any engine. One window shuffle on the
    dup key; groups are tiny (2-3 versions), so no skew concern at any
    scale."""
    li = _t(spark, sf_dir, "lineitem")
    pk = ["l_orderkey", "l_linenumber"]
    order = [
        F.col("l_extendedprice").desc(), F.col("l_shipdate").asc(),
        F.col("l_quantity").desc(), F.col("l_suppkey").asc(),
        F.col("l_partkey").asc(), F.col("l_discount").asc(),
        F.col("l_tax").asc(), F.col("l_returnflag").asc(),
        F.col("l_linestatus").asc(),
    ]
    w = Window.partitionBy(*pk).orderBy(*order)
    wc = Window.partitionBy(*pk)
    return (
        li.withColumn("rn", F.row_number().over(w))
        .withColumn("n_versions", F.count(F.lit(1)).over(wc))
        .filter((F.col("rn") == 1) & (F.col("n_versions") > 1))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("n_versions").cast("bigint").alias("n_versions"),
            F.round("l_extendedprice", 2).alias("surv_price"),
            F.col("l_suppkey").alias("surv_suppkey"),
        )
    )


_CONTAMINATION_ORACLE = """
WITH t AS (
  SELECT source, string_split_regex(lower(text), '\\s+') AS toks
  FROM documents),
g AS (
  SELECT DISTINCT source,
         unnest([array_to_string(list_slice(toks, i, i + 4), ' ')
                 for i in generate_series(1, len(toks) - 4)]) AS gram
  FROM t WHERE len(toks) >= 5)
SELECT a.source AS src_a, b.source AS src_b,
       CAST(COUNT(*) AS BIGINT) AS shared_grams
FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
GROUP BY a.source, b.source
ORDER BY shared_grams DESC, src_a, src_b
LIMIT 20
"""


@query("cross_source_contamination", _CONTAMINATION_ORACLE)
def cross_source_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-pair contamination matrix: shared distinct word-5-grams
    between every pair of sources — the check run before declaring two
    corpus slices independent (train/eval leakage, mirrored-crawl
    detection). Shape for scale: distinct (source, gram) FIRST (bounds
    the join input to vocabulary, not token count), then an EQUI-join on
    the gram — never source-pair × document cross products. Top-20 under
    a total ordering."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.split(F.lower("text"), r"\s+").alias("t")
    ).filter(F.size("t") >= 5)
    grams = toks.select(
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 4),"
                " i -> concat_ws(' ', slice(t, i, 5)))"
            )
        ).alias("gram"),
    ).distinct()
    a = grams.select(F.col("source").alias("src_a"), "gram")
    b = grams.select(F.col("source").alias("src_b"), "gram")
    return (
        a.join(b, "gram")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("shared_grams"))
        .orderBy(F.col("shared_grams").desc(), "src_a", "src_b")
        .limit(20)
    )


_WELCH_ORACLE = """
WITH s AS (
  SELECT COUNT(*) FILTER (c_mktsegment = 'BUILDING') AS n_a,
         COUNT(*) FILTER (c_mktsegment = 'MACHINERY') AS n_b,
         AVG(c_acctbal) FILTER (c_mktsegment = 'BUILDING') AS m_a,
         AVG(c_acctbal) FILTER (c_mktsegment = 'MACHINERY') AS m_b,
         VAR_SAMP(c_acctbal) FILTER (c_mktsegment = 'BUILDING') AS v_a,
         VAR_SAMP(c_acctbal) FILTER (c_mktsegment = 'MACHINERY') AS v_b
  FROM customer)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(m_a, 4) AS mean_a, round(m_b, 4) AS mean_b,
       round((m_a - m_b) / sqrt(v_a / n_a + v_b / n_b), 4) AS t_stat,
       round(pow(v_a / n_a + v_b / n_b, 2)
             / (pow(v_a / n_a, 2) / (n_a - 1)
                + pow(v_b / n_b, 2) / (n_b - 1)), 2) AS dof
FROM s
"""


@query("welch_ttest_acctbal", _WELCH_ORACLE)
def welch_ttest_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between two customer segments'
    account balances — the A/B significance primitive, computed in ONE
    scan with conditional aggregates (no per-side subqueries, no
    self-join) and Welch–Satterthwaite degrees of freedom."""
    c = _t(spark, sf_dir, "customer")
    a = F.col("c_mktsegment") == "BUILDING"
    b = F.col("c_mktsegment") == "MACHINERY"
    bal = F.col("c_acctbal")
    s = c.agg(
        F.count(F.when(a, 1)).alias("n_a"),
        F.count(F.when(b, 1)).alias("n_b"),
        F.avg(F.when(a, bal)).alias("m_a"),
        F.avg(F.when(b, bal)).alias("m_b"),
        F.var_samp(F.when(a, bal)).alias("v_a"),
        F.var_samp(F.when(b, bal)).alias("v_b"),
    )
    se2 = F.col("v_a") / F.col("n_a") + F.col("v_b") / F.col("n_b")
    dof = F.pow(se2, 2) / (
        F.pow(F.col("v_a") / F.col("n_a"), 2) / (F.col("n_a") - 1)
        + F.pow(F.col("v_b") / F.col("n_b"), 2) / (F.col("n_b") - 1)
    )
    return s.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round("m_a", 4).alias("mean_a"),
        F.round("m_b", 4).alias("mean_b"),
        F.round((F.col("m_a") - F.col("m_b")) / F.sqrt(se2), 4).alias("t_stat"),
        F.round(dof, 2).alias("dof"),
    )


_KFOLD_ORACLE = f"""
WITH b AS (
  SELECT source,
         substring(md5('fold:' || CAST(doc_id AS VARCHAR)), 1, 8) AS h
  FROM documents),
f AS (SELECT source, ({_hex8_to_int('h')}) % 5 AS fold FROM b)
SELECT source, CAST(fold AS BIGINT) AS fold,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM f GROUP BY source, fold
"""


@query("stratified_kfold_counts", _KFOLD_ORACLE)
def stratified_kfold_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified k-fold assignment: fold = md5 of a salted
    id, mod k — content-addressed like every split in this engine, so
    assignment is reproducible on any cluster, any partitioning, and
    stable under corpus growth (a new doc never moves an old one). One
    narrow projection + one grouped count."""
    d = _t(spark, sf_dir, "documents")
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("fold:"), F.col("doc_id").cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("bigint") % 5
    )
    return (
        d.select("source", fold.alias("fold"))
        .groupBy("source", "fold")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


_ROLLING_7D_ORACLE = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM du)
SELECT d.day,
       CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS users_7d
FROM days d
JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
GROUP BY d.day
"""


@query("rolling_7d_distinct_users", _ROLLING_7D_ORACLE)
def rolling_7d_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct users per day (the WAU-style engagement
    series). COUNT(DISTINCT) cannot ride a sliding window frame, so the
    scale shape is: collapse to distinct (day, user) FIRST (bounds
    everything after to active-user-days), then a range join against the
    distinct day list (calendar-bounded, broadcastable) and one grouped
    distinct count."""
    e = _t(spark, sf_dir, "events")
    du = e.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct()
    return (
        du.alias("u")
        .join(
            F.broadcast(days.alias("d")),
            (F.col("u.day") >= F.date_sub(F.col("d.day"), 6))
            & (F.col("u.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("u.user_id").alias("users_7d"))
    )


_REPEAT_RATE_ORACLE = """
WITH o AS (
  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey)
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN o.n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repeat,
       round(SUM(CASE WHEN o.n_orders >= 2 THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 4) AS repeat_rate
FROM o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


@query("repeat_purchase_rate_by_segment", _REPEAT_RATE_ORACLE)
def repeat_purchase_rate_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Repeat-purchase rate per segment: aggregate the fact table to
    per-customer order counts BEFORE touching the dimension (the shuffle
    is then bounded by customers, not orders), broadcast-join the
    dimension, one grouped rate."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    per_cust = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    rep = (F.col("n_orders") >= 2).cast("int")
    return (
        per_cust.join(
            F.broadcast(c.select("c_custkey", "c_mktsegment")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(rep).cast("bigint").alias("n_repeat"),
            F.round(
                F.sum(rep) / F.count(F.lit(1)).cast("double"), 4
            ).alias("repeat_rate"),
        )
    )


_MOM_GROWTH_ORACLE = """
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         SUM(o_totalprice) AS revenue
  FROM orders GROUP BY 1)
SELECT CAST(month AS DATE) AS month,
       round(revenue, 2) AS revenue,
       round((revenue - LAG(revenue) OVER (ORDER BY month))
             / LAG(revenue) OVER (ORDER BY month) * 100, 4) AS mom_pct
FROM m
"""


@query("mom_revenue_growth", _MOM_GROWTH_ORACLE)
def mom_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: the grouped aggregate does the
    only data-sized shuffle; the LAG window then runs over one row per
    calendar month — bounded by the calendar at any raw scale, the same
    argument as ewma_daily_revenue."""
    o = _t(spark, sf_dir, "orders")
    m = (
        o.groupBy(F.date_trunc("month", "o_orderdate").alias("mts"))
        .agg(F.sum("o_totalprice").alias("revenue"))
    )
    w = Window.orderBy("mts")
    prev = F.lag("revenue").over(w)
    return m.select(
        F.col("mts").cast("date").alias("month"),
        F.round("revenue", 2).alias("revenue"),
        F.round((F.col("revenue") - prev) / prev * 100, 4).alias("mom_pct"),
    )


_NORM_OUTLIER_ORACLE = f"""
WITH n AS (
  SELECT vec_id,
         sqrt(list_sum([CAST(embedding[i] AS DOUBLE)
                        * CAST(embedding[i] AS DOUBLE)
                        for i in generate_series(1, {_DIM})])) AS nrm
  FROM embeddings),
s AS (SELECT AVG(nrm) AS mu, STDDEV_SAMP(nrm) AS sigma FROM n)
SELECT vec_id, round(nrm, 6) AS norm,
       round((nrm - mu) / sigma, 4) AS z
FROM n, s
ORDER BY abs((nrm - mu) / sigma) DESC, vec_id
LIMIT 10
"""


@query("embedding_norm_outliers", _NORM_OUTLIER_ORACLE)
def embedding_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding sanity screen: top-10 vectors by |z| of their L2 norm —
    the cheap catch for broken encoder batches (zeroed rows, exploding
    activations) before vectors reach an index. Norms are one narrow
    no-shuffle projection; mean/std is a 1-row broadcast aggregate; the
    top-10 is TakeOrdered, never a global sort."""
    emb = _t(spark, sf_dir, "embeddings")
    n = emb.select("vec_id", norm("embedding").alias("nrm"))
    s = n.agg(
        F.avg("nrm").alias("mu"), F.stddev_samp("nrm").alias("sigma")
    )
    z = (F.col("nrm") - F.col("mu")) / F.col("sigma")
    return (
        n.crossJoin(F.broadcast(s))
        .select(
            "vec_id",
            F.round("nrm", 6).alias("norm"),
            F.round(z, 4).alias("z"),
        )
        .orderBy(F.abs(F.col("z")).desc(), "vec_id")
        .limit(10)
    )


# The estimator gate's doc panel is FIXED-SIZE, not corpus-proportional
# (the _ANN_PANEL_MAX_ID argument, restated for documents): the gate's
# cost is the blocked exact-Jaccard pair build plus two corpus-size
# signature joins, all linear in the panel — a proportional panel made it
# the r10 sf10 sweep's one heavyweight-by-construction timeout. Estimator
# MAE is no more statistically useful on 50M sampled pairs than on 5M.
# The cap binds only above ~sf1 (doc_id < 51200 covers every document at
# driver and bench scales, documents Nd = 5k x sf), so gate inputs are
# bit-identical where the driver compares.
_MH_EST_GATE_MAX_ID = 51200


@query("minhash_estimate_error_gate", "SELECT true AS est_ok")
def minhash_estimate_error_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality gate for the MinHash estimator itself: over the
    blocked exact-Jaccard pair set of a fixed-size doc panel (doc_id <
    51200 — every doc at driver/bench scales, a 51.2k sample above), the
    signature lane-agreement estimate (matching lanes / num_hashes, 32
    hashes) must track exact Jaccard within 0.2 mean absolute error.
    Complements the LSH recall gates — those bound *candidate recall*,
    this bounds the *estimator* the incremental probes return. Oracle is
    the constant-true contract; the measured error feeds the boolean."""
    d = _t(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _MH_EST_GATE_MAX_ID
    )
    pairs = dedup.ngram_jaccard_pairs(
        d, "doc_id", "text", shingle_n=3, threshold=0.2
    ).select("id_a", "id_b", "jaccard_sim")
    sigs = dedup.minhash_signatures(
        d, "doc_id", "text", num_hashes=32, shingle_n=3
    )
    est = F.aggregate(
        F.zip_with(
            "__sig_a", "__sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    ) / F.lit(32.0)
    # both join sides are CORPUS-PROPORTIONAL (the exact-pair set and
    # the full signature table) — pin to sort-merge or the planner
    # broadcasts one and the driver-side hash build dies at 100x (the
    # r6 candidate-set hazard, re-found by the r7 sf10 sweep here)
    joined = (
        pairs.hint("merge")
        .join(
            sigs.select(
                F.col("doc_id").alias("id_a"),
                F.col("signature").alias("__sig_a"),
            ).hint("merge"),
            "id_a",
        )
        .join(
            sigs.select(
                F.col("doc_id").alias("id_b"),
                F.col("signature").alias("__sig_b"),
            ).hint("merge"),
            "id_b",
        )
        .select((F.abs(est - F.col("jaccard_sim"))).alias("err"))
    )
    return joined.agg(
        F.coalesce(F.avg("err") <= 0.2, F.lit(True)).alias("est_ok")
    )


_LSH_FP_ORACLE = (
    _MINHASH_ORACLE.replace(
        "SELECT id_a, id_b, jaccard_sim FROM scored WHERE jaccard_sim >= 0.6",
        """
SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
       CAST(SUM(CASE WHEN jaccard_sim >= 0.6 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_true_pairs,
       round(1.0 - SUM(CASE WHEN jaccard_sim >= 0.6 THEN 1 ELSE 0 END)
                   / CAST(COUNT(*) AS DOUBLE), 6) AS fp_rate
FROM scored
""",
    )
)


@query("lsh_false_positive_audit", _LSH_FP_ORACLE)
def lsh_false_positive_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRECISION side of the LSH story (the recall gates cover the
    other half): of all band-collision candidates, how many fail exact
    verification? fp_rate is the fraction of verify compute wasted on
    false candidates — the number that decides band geometry (more
    bands/narrower rows => recall up, fp_rate up). Same banded pipeline
    and SQL replay as minhash_near_dup_pairs; threshold=0 keeps every
    candidate so the audit sees them all."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz extra")).alias("text"),
    )
    corpus = d.unionAll(planted)
    scored = dedup.minhash_near_dup_pairs(
        corpus, "doc_id", "text",
        num_hashes=16, bands=4, shingle_n=3, threshold=0.0,
        max_band_bucket=None,
    )
    true_pair = (F.col("jaccard_sim") >= 0.6).cast("int")
    return scored.agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(true_pair).cast("bigint").alias("n_true_pairs"),
        F.round(
            1.0 - F.sum(true_pair) / F.count(F.lit(1)).cast("double"), 6
        ).alias("fp_rate"),
    )


_PRANK_ORACLE = """
SELECT p_partkey, p_brand, round(p_retailprice, 2) AS price,
       round(PERCENT_RANK() OVER w, 6) AS pct_rank,
       round(CUME_DIST() OVER w, 6) AS cume
FROM part
WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice)
"""


@query("percent_rank_price_by_brand", _PRANK_ORACLE)
def percent_rank_price_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative price position within brand (percent_rank + cume_dist):
    the feature-engineering normalization that survives any price drift.
    Both window functions are rank-based, so ties resolve identically on
    any engine and any partitioning; the one shuffle is the brand key."""
    p = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_retailprice")
    return p.select(
        "p_partkey",
        "p_brand",
        F.round("p_retailprice", 2).alias("price"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


_FIRST_TOUCH_ORACLE = """
WITH f AS (
  SELECT user_id, event_type, ts, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
p AS (
  SELECT user_id, SUM(value) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id)
SELECT f.event_type AS first_touch,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(COUNT(p.user_id) AS BIGINT) AS n_converted,
       round(COALESCE(SUM(p.purchase_value), 0), 2) AS attributed_value
FROM f LEFT JOIN p ON f.user_id = p.user_id
WHERE f.rn = 1
GROUP BY f.event_type
"""


@query("first_touch_attribution", _FIRST_TOUCH_ORACLE)
def first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: each user's whole purchase value credits
    the event type that first brought them — the marketing-channel
    question every event pipeline answers. Two shuffles, both user-keyed
    (the first-event window and the purchase rollup), joined user-to-user
    before the tiny channel groupBy; no event-grain join anywhere."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("first_touch"))
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum("value").alias("purchase_value"))
    )
    return (
        first.join(purchases, "user_id", "left")
        .groupBy("first_touch")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.count("purchase_value").alias("n_converted"),
            F.round(
                F.coalesce(F.sum("purchase_value"), F.lit(0.0)), 2
            ).alias("attributed_value"),
        )
    )


_GINI_ORACLE = """
WITH s AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
r AS (
  SELECT n, ROW_NUMBER() OVER (ORDER BY n, source) AS i,
         COUNT(*) OVER () AS k, SUM(n) OVER () AS tot
  FROM s)
SELECT CAST(MAX(k) AS BIGINT) AS n_sources,
       round(2.0 * SUM(i * n) / (MAX(k) * MAX(tot))
             - (MAX(k) + 1.0) / MAX(k), 6) AS gini
FROM r
"""


@query("sources_gini_concentration", _GINI_ORACLE)
def sources_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of documents-per-source — the one-number answer
    to "is this corpus dominated by a few domains?", the balance metric
    a mixture designer watches. Computed by the rank identity
    G = 2*sum(i*x_i)/(k*sum(x)) - (k+1)/k over the ascending-sorted
    per-source counts. The window runs over the AGGREGATED per-source
    frame (k rows, corpus-bounded), so the global ordering is trivially
    cheap at any document count."""
    d = _t(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("n", "source")
    r = s.select(
        "n",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("k"),
        F.sum("n").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("tot"),
    )
    return r.agg(
        F.max("k").cast("bigint").alias("n_sources"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("n"))
            / (F.max("k") * F.max("tot"))
            - (F.max("k") + 1.0) / F.max("k"),
            6,
        ).alias("gini"),
    )


_STICKINESS_ORACLE = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM du),
wau AS (
  SELECT d.day, COUNT(DISTINCT u.user_id) AS wau
  FROM days d JOIN du u ON u.day BETWEEN d.day - 6 AND d.day
  GROUP BY d.day),
dau AS (SELECT day, COUNT(*) AS dau FROM du GROUP BY day)
SELECT dau.day, CAST(dau.dau AS BIGINT) AS dau,
       CAST(wau.wau AS BIGINT) AS wau,
       round(dau.dau / CAST(wau.wau AS DOUBLE), 6) AS stickiness
FROM dau JOIN wau ON dau.day = wau.day
"""


@query("dau_wau_stickiness", _STICKINESS_ORACLE)
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day — the engagement-quality ratio product
    teams track. Same distinct (day, user) pair frame feeds both sides
    (the only event-volume scan); DAU is one grouped count, WAU the
    broadcast day-spine range join from rolling_7d_distinct_users, and
    the final join is day-keyed (calendar-bounded)."""
    e = _t(spark, sf_dir, "events")
    du = e.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct()
    wau = (
        du.alias("u")
        .join(
            F.broadcast(days.alias("d")),
            (F.col("u.day") >= F.date_sub(F.col("d.day"), 6))
            & (F.col("u.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("u.user_id").alias("wau"))
    )
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    return dau.join(wau, "day").select(
        "day",
        F.col("dau").cast("bigint").alias("dau"),
        F.col("wau").cast("bigint").alias("wau"),
        F.round(F.col("dau") / F.col("wau").cast("double"), 6).alias(
            "stickiness"
        ),
    )


_SESSION_HIST_ORACLE = """
WITH e AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events),
f AS (
  SELECT *, CASE WHEN prev IS NULL OR ts - prev > INTERVAL '30 minutes'
                 THEN 1 ELSE 0 END AS brk
  FROM e),
g AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
            ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM f),
s AS (
  SELECT user_id, session_seq, COUNT(*) AS n_events,
         (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 60000000.0 AS mins
  FROM g GROUP BY user_id, session_seq)
SELECT CAST(least(floor(mins / 5) * 5, 60) AS BIGINT) AS bucket_min,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       round(AVG(n_events), 4) AS avg_events
FROM s GROUP BY 1
"""


@query("session_duration_histogram", _SESSION_HIST_ORACLE)
def session_duration_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-duration distribution in 5-minute buckets (capped at 60):
    the engagement-shape histogram behind bounce/dwell analyses. Rides
    the sessionization operator (one user-keyed shuffle); the histogram
    itself groups a session-count-bounded frame into a constant bucket
    space."""
    e = _t(spark, sf_dir, "events")
    s = sessionize.session_stats(e, gap_minutes=30)
    mins = F.col("span_us") / 60000000.0
    bucket = F.least(
        F.floor(mins / 5) * 5, F.lit(60)
    ).cast("bigint")
    return (
        s.select(bucket.alias("bucket_min"), "n_events")
        .groupBy("bucket_min")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.round(F.avg("n_events"), 4).alias("avg_events"),
        )
    )


# ---- model-based quality filtering: distributed logistic regression ----

_LOGREG_FEATS_CTE = """
base AS (
  SELECT doc_id, n_chars,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
  FROM documents),
feats AS (
  SELECT doc_id,
         round(ln(1 + n_chars), 6) AS x1,
         round(ln(1 + len(toks)), 6) AS x2,
         round(CAST(len(list_distinct(toks)) AS DOUBLE)
               / CAST(greatest(len(toks), 1) AS DOUBLE), 6) AS x3,
         CASE WHEN n_chars >= 150 THEN CAST(1.0 AS DOUBLE)
              ELSE CAST(0.0 AS DOUBLE) END AS y
  FROM base)
"""

_LOGREG_ORACLE = f"""
WITH {_LOGREG_FEATS_CTE},
gr1 AS (
  SELECT round(avg(y - 0.5), 6) AS g0,
         round(avg((y - 0.5) * x1), 6) AS g1,
         round(avg((y - 0.5) * x2), 6) AS g2,
         round(avg((y - 0.5) * x3), 6) AS g3
  FROM feats),
w1 AS (
  SELECT 0.0 + 0.1 * g0 AS w0, 0.0 + 0.1 * g1 AS w1,
         0.0 + 0.1 * g2 AS w2, 0.0 + 0.1 * g3 AS w3
  FROM gr1),
p2 AS (
  SELECT f.doc_id, f.x1, f.x2, f.x3, f.y,
         round(1.0 / (1.0 + exp(-(w.w0 + w.w1 * f.x1 + w.w2 * f.x2
                                  + w.w3 * f.x3))), 6) AS p
  FROM feats f CROSS JOIN w1 w),
gr2 AS (
  SELECT round(avg(y - p), 6) AS g0,
         round(avg((y - p) * x1), 6) AS g1,
         round(avg((y - p) * x2), 6) AS g2,
         round(avg((y - p) * x3), 6) AS g3
  FROM p2),
w2 AS (
  SELECT w.w0 + 0.1 * g.g0 AS w0, w.w1 + 0.1 * g.g1 AS w1,
         w.w2 + 0.1 * g.g2 AS w2, w.w3 + 0.1 * g.g3 AS w3
  FROM w1 w CROSS JOIN gr2 g),
p3 AS (
  SELECT f.doc_id, f.x1, f.x2, f.x3, f.y,
         round(1.0 / (1.0 + exp(-(w.w0 + w.w1 * f.x1 + w.w2 * f.x2
                                  + w.w3 * f.x3))), 6) AS p
  FROM feats f CROSS JOIN w2 w),
gr3 AS (
  SELECT round(avg(y - p), 6) AS g0,
         round(avg((y - p) * x1), 6) AS g1,
         round(avg((y - p) * x2), 6) AS g2,
         round(avg((y - p) * x3), 6) AS g3
  FROM p3),
w3 AS (
  SELECT w.w0 + 0.1 * g.g0 AS w0, w.w1 + 0.1 * g.g1 AS w1,
         w.w2 + 0.1 * g.g2 AS w2, w.w3 + 0.1 * g.g3 AS w3
  FROM w2 w CROSS JOIN gr3 g),
scored AS (
  SELECT f.doc_id,
         round(1.0 / (1.0 + exp(-(w.w0 + w.w1 * f.x1 + w.w2 * f.x2
                                  + w.w3 * f.x3))), 6) AS score
  FROM feats f CROSS JOIN w3 w)
SELECT doc_id, score, score >= 0.5 AS pred_high_quality FROM scored
"""


@query("logreg_quality_scores", _LOGREG_ORACLE)
def logreg_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filter (CCNet/FineWeb-style): train a logistic
    regression on JVM-computed document features with batch gradient
    descent (3 iterations, each ONE distributed 4-scalar aggregate —
    the k-means bounded-driver-traffic pattern), then score every
    document. The oracle replays the identical training trajectory as
    unrolled CTEs; gradients are 6-decimal-rounded (absorbing merge-order
    and libm-exp residuals) while the weight updates stay exact IEEE754,
    so the learned weights are bit-identical and the scores hash-match. At scale:
    per iteration one corpus scan + a 4-double reduce; feature vectors
    never leave the executors; scoring is a stateless projection."""
    d = _t(spark, sf_dir, "documents")
    feats = quality_model.doc_features(d)
    trained = quality_model.train_logreg(feats)
    return quality_model.score_documents(feats, trained.weights)


@query("logreg_training_gate", "SELECT true AS loss_decreasing")
def logreg_training_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convergence gate for the distributed GD: the corpus log-loss must
    strictly decrease across both updates (0-weights start at ln 2; the
    label is learnable from x1, so a miswired gradient shows up as a
    non-decreasing loss). One boolean row; all heavy work distributed."""
    d = _t(spark, sf_dir, "documents")
    feats = quality_model.doc_features(d)
    trained = quality_model.train_logreg(feats)
    ls = trained.losses
    ok = all(b < a + 1e-9 for a, b in zip(ls, ls[1:])) and ls[-1] < ls[0]
    return spark.createDataFrame([(bool(ok),)], "loss_decreasing boolean")


# ---- bloom-style pre-shuffle join pruning ----

_BLOOM_PRUNE_ORACLE = """
SELECT p.p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_size = 1
GROUP BY p.p_brand
"""


@query("bloom_pruned_join_parity", _BLOOM_PRUNE_ORACLE)
def bloom_pruned_join_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-style join pruning parity: lineitem ⋈ (parts with p_size=1)
    through operators/join_pruning.bloom_pruned_join — the fact side is
    pre-filtered by a broadcast semi-join against the dim's ≤2^17 hashed
    key codes BEFORE the exact join. The oracle is the PLAIN join: a hash
    match proves the no-false-negative property on real data. At scale
    the prune drops never-matching fact rows before they shuffle, with a
    ~1 MiB broadcast that is independent of dim size."""
    from etl_bigquery_pipeline_spark.operators import join_pruning

    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") == 1).select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    joined = join_pruning.bloom_pruned_join(l, p, "l_partkey")
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_rows"),
        exact_sum(
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        ).alias("revenue"),
    )


# ---- Matryoshka-style truncated-dim prefilter ANN ----


def _cosine_sql_dims(a: str, b: str, dims: int) -> str:
    dot_ = (
        f"list_sum([CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) "
        f"for i in generate_series(1, {dims})])"
    )
    na = (
        f"sqrt(list_sum([CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE) "
        f"for i in generate_series(1, {dims})]))"
    )
    nb = (
        f"sqrt(list_sum([CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) "
        f"for i in generate_series(1, {dims})]))"
    )
    return f"round({dot_} / ({na} * {nb}), 6)"


_TRUNC_PREFIX_DIMS = 16
_TRUNC_TOPK_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id % 50 = 0 AND vec_id < {_ANN_PANEL_MAX_ID}),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
s1 AS (
  SELECT query_id, neighbor_id,
         {_cosine_sql_dims("qv", "cv", _TRUNC_PREFIX_DIMS)} AS psim
  FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
r1 AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY psim DESC, neighbor_id ASC) AS prnk
  FROM s1),
cand AS (SELECT query_id, neighbor_id FROM r1
         WHERE prnk <= 5 * greatest(4, CAST(ceil(
               (SELECT count(*) FROM c) / 500.0) AS BIGINT))),
s2 AS (
  SELECT t.query_id, t.neighbor_id, {_cosine_sql("qv", "cv")} AS sim
  FROM cand t
  JOIN q ON q.query_id = t.query_id
  JOIN c ON c.neighbor_id = t.neighbor_id),
r2 AS (
  SELECT query_id, neighbor_id, sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY sim DESC, neighbor_id ASC) AS BIGINT) AS rnk
  FROM s2)
SELECT query_id, neighbor_id, sim, rnk FROM r2 WHERE rnk <= 5
"""


@query("truncated_dim_topk", _TRUNC_TOPK_ORACLE)
def truncated_dim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style reduced-dimension prefilter: stage 1 scores cosine
    on the first 16 of 64 dims (1/4 the dot-product work per corpus row)
    keeping 4k candidates per query; stage 2 exact-reranks only those
    pairs on the full vector. Unlike LSH/IVF this trajectory is fully
    deterministic, so the ORACLE REPLAYS BOTH STAGES and the result
    hash-matches — an ANN variant with an exact correctness contract. At
    scale: one cheap corpus scan, candidates broadcast back, corpus never
    shuffles.

    The candidate budget is a constant FRACTION of the corpus (~1%,
    floor 20 = the original 4*k): recall of any truncated prefilter
    tracks the scanned fraction, so a constant count decays with corpus
    size — the sf1.0 sweep (round 6) measured the fixed-20 recall under
    the 0.15 floor at 20k vectors, the same defect class as the PQ
    rerank fix. Floor keeps sf0.001-0.1 outputs bit-identical; the
    oracle derives the same budget from its own corpus count."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = _ann_panel(emb, 50)
    factor = max(4, -(-emb.count() // 500))
    out = similarity.truncated_prefilter_topk(
        emb, queries_df, k=5, prefix_dims=_TRUNC_PREFIX_DIMS,
        candidate_factor=factor, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id",
    )
    return out.select(
        "query_id", "neighbor_id", "sim",
        F.col("rank").cast("bigint").alias("rnk"),
    )


@query("truncated_dim_recall_gate", "SELECT true AS recall_ok")
def truncated_dim_recall_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the 16-dim prefilter + exact-rerank top-5 against the
    exact top-5. The synthetic embeddings spread signal evenly across
    dims (not Matryoshka-trained), so a 16/64 prefix keeping 4k
    candidates is a WORST-CASE input for the technique; the floor holds
    at every tested scale (measured 0.22 at sf0.001, 0.42 at sf0.01 —
    tests/test_similarity.py)."""
    exact = QUERIES["similarity_topk"](spark, sf_dir)
    approx = QUERIES["truncated_dim_topk"](spark, sf_dir)
    return _recall_ok(
        exact.select("query_id", "neighbor_id"),
        approx.select("query_id", "neighbor_id"),
        0.15,
    )


# ---- distributed BPE vocabulary training ----

_BPE_VOCAB_CTE = """
__words AS (
  SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                t -> t <> '')) AS word
  FROM documents),
__v AS (SELECT word, COUNT(*) AS wc FROM __words GROUP BY word),
s0 AS (SELECT array_to_string(string_split_regex(word, ''), ' ') AS sym, wc
       FROM __v)
"""

_BPE_PAIRS_FROM = (
    "SELECT unnest([toks[i] || ' ' || toks[i+1] "
    "for i in generate_series(1, len(toks) - 1)]) AS pair, wc "
    "FROM (SELECT string_split(sym, ' ') AS toks, wc FROM {src})"
)

_TOP_BPE_PAIRS_ORACLE = f"""
WITH {_BPE_VOCAB_CTE},
pc AS (SELECT pair, CAST(SUM(wc) AS BIGINT) AS n
       FROM ({_BPE_PAIRS_FROM.format(src="s0")}) GROUP BY pair)
SELECT pair, n FROM pc ORDER BY n DESC, pair ASC LIMIT 20
"""


@query("top_bpe_merge_pairs", _TOP_BPE_PAIRS_ORACLE)
def top_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-0 BPE pair statistics: adjacent character-pair counts over
    the DISTINCT-WORD table weighted by word frequency (operators/bpe).
    The only corpus-proportional work is the word count; pair explosion
    and aggregation are vocab-bounded — the property that makes BPE
    training feasible at 100 TB. Integer counts: no float determinism
    concerns."""
    from etl_bigquery_pipeline_spark.operators import bpe

    d = _t(spark, sf_dir, "documents")
    vocab = bpe.to_symbols(bpe.word_vocab(d))
    return (
        bpe.pair_counts(vocab)
        .select("pair", F.col("n").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(20)
    )


def _bpe_chain_ctes(rounds: int = 3, *, carry_word: bool = False):
    """CTE chain replaying ``rounds`` BPE merges; returns (ctes, last).
    ``carry_word`` keeps the word column alongside ``sym`` so the final
    vocab can be joined back to the corpus (tokenization replay)."""
    word_s0 = "word, " if carry_word else ""
    vocab_cte = _BPE_VOCAB_CTE.replace(
        "s0 AS (SELECT array_to_string",
        f"s0 AS (SELECT {word_s0}array_to_string",
    )
    parts = [vocab_cte.strip()]
    prev = "s0"
    for r in range(1, rounds + 1):
        parts.append(
            f"pc{r} AS (SELECT pair, SUM(wc) AS n "
            f"FROM ({_BPE_PAIRS_FROM.format(src=prev)}) GROUP BY pair)"
        )
        parts.append(
            f"m{r} AS (SELECT pair, n FROM pc{r} "
            f"ORDER BY n DESC, pair ASC LIMIT 1)"
        )
        parts.append(
            f"s{r} AS (SELECT {word_s0}trim(replace(' ' || sym || ' ', "
            f"' ' || m.pair || ' ', "
            f"' ' || replace(m.pair, ' ', '') || ' ')) AS sym, wc "
            f"FROM {prev} CROSS JOIN m{r} m)"
        )
        prev = f"s{r}"
    return parts, prev


def _bpe_merges_oracle(rounds: int = 3) -> str:
    parts, _ = _bpe_chain_ctes(rounds)
    selects = [
        f"SELECT CAST({r} AS BIGINT) AS rnd, pair, "
        f"replace(pair, ' ', '') AS merged, CAST(n AS BIGINT) AS n "
        f"FROM m{r}"
        for r in range(1, rounds + 1)
    ]
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


def _bpe_token_counts_oracle(rounds: int = 3) -> str:
    parts, last = _bpe_chain_ctes(rounds, carry_word=True)
    parts.append(
        f"__seg AS (SELECT word, len(string_split(sym, ' ')) AS ntok "
        f"FROM {last})"
    )
    parts.append(
        "__dw AS (SELECT doc_id, "
        "unnest(list_filter(string_split_regex(text, '\\s+'), "
        "t -> t <> '')) AS word FROM documents)"
    )
    return (
        "WITH " + ",\n".join(parts) + "\n"
        "SELECT d.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words, "
        "CAST(SUM(s.ntok) AS BIGINT) AS n_subtokens "
        "FROM __dw d JOIN __seg s ON d.word = s.word GROUP BY d.doc_id"
    )


@query("bpe_token_counts", _bpe_token_counts_oracle(3))
def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tokenization under the learned BPE merges — the inference
    shape: the 3-round merge chain applies ONCE to the distinct-word
    table, which broadcast-joins back to the exploded corpus; per-doc
    counts come from a partial-sum aggregate. The oracle replays training
    AND tokenization (integer-exact). At 100 TB corpus rows never pass
    through the merge replace chain — only the vocab does."""
    from etl_bigquery_pipeline_spark.operators import bpe

    d = _t(spark, sf_dir, "documents")
    merges = [m["pair"] for m in bpe.train_bpe(d, rounds=3)]
    return bpe.token_counts(d, merges)


@query("bpe_vocab_merges", _bpe_merges_oracle(3))
def bpe_vocab_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three rounds of distributed BPE training (operators/bpe): per
    round, vocab-bounded weighted pair counts -> argmax pair (ONE row to
    the driver) -> merge applied as a `replace` projection. The oracle
    replays the full trajectory as unrolled CTEs; all quantities are
    integer counts with total-ordered argmax (count desc, pair asc), so
    the learned merges hash-match exactly."""
    from etl_bigquery_pipeline_spark.operators import bpe

    d = _t(spark, sf_dir, "documents")
    merges = bpe.train_bpe(d, rounds=3)
    return spark.createDataFrame(
        [(m["round"], m["pair"], m["merged"], m["n"]) for m in merges],
        "rnd bigint, pair string, merged string, n bigint",
    )


# ---- KS two-sample drift + series autocorrelation ----

_KS_ORACLE = """
WITH s AS (
  SELECT c_acctbal AS v,
         CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS in_a
  FROM customer
  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
g AS (
  SELECT v, SUM(in_a) AS ca, SUM(1 - in_a) AS cb
  FROM s GROUP BY v),
r AS (
  SELECT v,
         SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_a,
         SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_b
  FROM g),
t AS (SELECT (SELECT SUM(ca) FROM g) AS n_a, (SELECT SUM(cb) FROM g) AS n_b)
SELECT round(MAX(abs(CAST(cum_a AS DOUBLE) / n_a
                     - CAST(cum_b AS DOUBLE) / n_b)), 6) AS d_stat,
       CAST(MAX(n_a) AS BIGINT) AS n_a, CAST(MAX(n_b) AS BIGINT) AS n_b
FROM r CROSS JOIN t
"""


@query("ks_two_sample_acctbal", _KS_ORACLE)
def ks_two_sample_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov–Smirnov two-sample statistic between two segments'
    account balances — the nonparametric drift primitive next to PSI
    (`distribution_drift_psi`) and Welch (`welch_ttest_acctbal`). One
    scan → per-distinct-value group counts → running ECDFs via the
    distributed range-partition-plus-offsets running sum
    (`windows.with_global_running_sums` — NO single-partition window;
    integer partials are merge-order-exact) → max ECDF gap. Integer
    counts until the one final division."""
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    in_a = (F.col("c_mktsegment") == "BUILDING").cast("long")
    g = (
        c.select(F.col("c_acctbal").alias("v"), in_a.alias("in_a"))
        .groupBy("v")
        .agg(
            F.sum("in_a").alias("ca"),
            F.sum(F.lit(1) - F.col("in_a")).alias("cb"),
        )
    )
    r = windows.with_global_running_sums(g, ["v"], ["ca", "cb"]).select(
        "v",
        F.col("cum_ca").alias("cum_a"),
        F.col("cum_cb").alias("cum_b"),
    )
    tot = g.agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    return (
        r.crossJoin(F.broadcast(tot))
        .agg(
            F.round(
                F.max(
                    F.abs(
                        F.col("cum_a").cast("double") / F.col("n_a")
                        - F.col("cum_b").cast("double") / F.col("n_b")
                    )
                ),
                6,
            ).alias("d_stat"),
            F.max("n_a").cast("bigint").alias("n_a"),
            F.max("n_b").cast("bigint").alias("n_b"),
        )
    )


_AUTOCORR_ORACLE = """
WITH d AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
  FROM orders GROUP BY 1),
l AS (
  SELECT rev,
         lag(rev, 1) OVER (ORDER BY day) AS rev_1,
         lag(rev, 7) OVER (ORDER BY day) AS rev_7
  FROM d)
SELECT round(corr(rev, rev_1), 6) AS autocorr_lag1,
       round(corr(rev, rev_7), 6) AS autocorr_lag7,
       CAST(COUNT(*) AS BIGINT) AS n_days
FROM l
"""


@query("daily_revenue_autocorr", _AUTOCORR_ORACLE)
def daily_revenue_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 / lag-7 autocorrelation of the daily revenue series — the
    seasonality-detection primitive behind forecasting sanity checks.
    The only row-proportional work is the daily rollup (map-side partial
    decimal sums); the lag window and corr run over the calendar-bounded
    series. corr is merge-order sensitive in the last ulps only —
    6-decimal rounding absorbs it."""
    o = _t(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        exact_sum("o_totalprice").alias("rev")
    )
    w = Window.orderBy("day")
    series = d.select(
        "rev",
        F.lag("rev", 1).over(w).alias("rev_1"),
        F.lag("rev", 7).over(w).alias("rev_7"),
    )
    return series.agg(
        F.round(F.corr("rev", "rev_1"), 6).alias("autocorr_lag1"),
        F.round(F.corr("rev", "rev_7"), 6).alias("autocorr_lag7"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )


# ---- graph analytics: triangle counting on the co-purchase graph ----

_TRIANGLES_ORACLE = """
WITH pr AS (SELECT l_orderkey, l_partkey FROM lineitem GROUP BY 1, 2),
e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM pr a JOIN pr b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
       CAST((SELECT COUNT(*) FROM e e1
             JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
             JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v) AS BIGINT)
         AS n_triangles
"""


@query("copurchase_triangles", _TRIANGLES_ORACLE)
def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the part co-purchase graph (parts sharing an
    order are adjacent) via DEGREE-ORDERED orientation
    (operators/graph.py): out-degrees bound at O(sqrt(m)), so the wedge
    join does m^1.5 work regardless of hub skew — the oracle counts the
    same triangles with the simple id-ordered method, proving the
    orientation machinery exact. Integer counts end to end."""
    from etl_bigquery_pipeline_spark.operators import graph

    l = _t(spark, sf_dir, "lineitem")
    pr = scoped_cache(l.select("l_orderkey", "l_partkey").distinct())
    pairs = pr.alias("a").join(
        pr.alias("b"),
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
    )
    edges = graph.undirected_edges(pairs, "pa", "pb")
    return graph.triangle_count(edges)


def _pagerank_oracle(iters: int = 3) -> str:
    parts = [
        "__pr AS (SELECT l_orderkey, l_partkey FROM lineitem GROUP BY 1, 2)",
        "__e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v "
        "FROM __pr a JOIN __pr b ON a.l_orderkey = b.l_orderkey "
        "AND a.l_partkey < b.l_partkey)",
        "__adj AS (SELECT u AS src, v AS dst FROM __e "
        "UNION ALL SELECT v AS src, u AS dst FROM __e)",
        "__deg AS (SELECT src, COUNT(*) AS deg FROM __adj GROUP BY src)",
        "p0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) AS pr FROM __deg)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"p{i} AS (SELECT a.dst AS node, "
            f"round(0.15 + 0.85 * SUM(p.pr / d.deg), 6) AS pr "
            f"FROM __adj a JOIN __deg d ON a.src = d.src "
            f"JOIN p{i-1} p ON a.src = p.node GROUP BY a.dst)"
        )
    return (
        "WITH " + ",\n".join(parts) + "\n"
        f"SELECT node, pr, rnk FROM ("
        f"SELECT node, pr, CAST(ROW_NUMBER() OVER "
        f"(ORDER BY pr DESC, node ASC) AS BIGINT) AS rnk FROM p{iters}) "
        f"WHERE rnk <= 20"
    )


@query("copurchase_pagerank_top20", _pagerank_oracle(3))
def copurchase_pagerank_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 iterations, d=0.85, N-scaled form) on the co-purchase
    graph via operators/graph.pagerank_scaled — per iteration one
    vertex-keyed join + one partial-sum aggregate, lineage truncated per
    round. Scores round to 6 decimals each iteration (absorbing the
    distributed sum's merge order), so the oracle's unrolled replay
    hash-matches. Top-20 via TakeOrdered — no global-sort window."""
    from etl_bigquery_pipeline_spark.operators import graph

    l = _t(spark, sf_dir, "lineitem")
    pr_tbl = scoped_cache(l.select("l_orderkey", "l_partkey").distinct())
    pairs = pr_tbl.alias("a").join(
        pr_tbl.alias("b"),
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
    )
    edges = graph.undirected_edges(pairs, "pa", "pb")
    ranks = graph.pagerank_scaled(edges, iters=3, damping=0.85)
    top = ranks.orderBy(F.col("pr").desc(), F.col("node").asc()).limit(20)
    w = Window.orderBy(F.col("pr").desc(), F.col("node").asc())
    return top.select(
        "node", "pr", F.row_number().over(w).cast("bigint").alias("rnk")
    )


_COMPONENTS_ORACLE = """
WITH RECURSIVE pr AS (
  SELECT l_orderkey, l_partkey FROM lineitem GROUP BY 1, 2),
e0 AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v
  FROM pr a JOIN pr b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
edges AS (SELECT u AS src, v AS dst FROM e0 UNION SELECT v, u FROM e0),
reach(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node),
comp AS (SELECT node, MIN(label) AS cid FROM reach GROUP BY node),
sizes AS (SELECT cid, COUNT(*) AS sz FROM comp GROUP BY cid)
SELECT CAST(sz AS BIGINT) AS component_size,
       CAST(COUNT(*) AS BIGINT) AS n_components
FROM sizes GROUP BY sz
"""


@query("copurchase_components", _COMPONENTS_ORACLE)
def copurchase_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the STRONG co-purchase graph (parts
    co-ordered >= 2 times): pointer-doubled min-label propagation
    (graph.connected_components, O(log diameter) rounds of long-keyed
    equi-joins) vs the oracle's recursive-CTE closure. Emits the
    component-size histogram — the market-basket community structure.
    Integer-exact."""
    from etl_bigquery_pipeline_spark.operators import graph

    l = _t(spark, sf_dir, "lineitem")
    pr_tbl = scoped_cache(l.select("l_orderkey", "l_partkey").distinct())
    strong = (
        pr_tbl.alias("a")
        .join(
            pr_tbl.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("u", "v")
    )
    comp = graph.connected_components(strong)
    return (
        comp.groupBy("component_id")
        .agg(F.count(F.lit(1)).alias("sz"))
        .groupBy(F.col("sz").cast("bigint").alias("component_size"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_components"))
    )


_MANNWHITNEY_ORACLE = """
WITH s AS (
  SELECT c_acctbal AS v,
         CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS in_a
  FROM customer
  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
g AS (
  SELECT v, SUM(in_a) AS ca, SUM(1 - in_a) AS cb, COUNT(*) AS cnt
  FROM s GROUP BY v),
r AS (
  SELECT v, ca, cb, cnt,
         SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - cnt
           AS cum_before
  FROM g),
agg AS (
  SELECT SUM(ca) AS n_a, SUM(cb) AS n_b,
         SUM(ca * (2 * cum_before + cnt + 1)) AS r2a,
         SUM(cnt * cnt * cnt - cnt) AS tie3
  FROM r)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(r2a - n_a * (n_a + 1) AS BIGINT) AS u2,
       round(
         (CAST(r2a - n_a * (n_a + 1) AS DOUBLE) / 2.0
          - CAST(n_a AS DOUBLE) * n_b / 2.0)
         / sqrt(CAST(n_a AS DOUBLE) * n_b / 12.0
                * ((n_a + n_b + 1)
                   - CAST(tie3 AS DOUBLE)
                     / ((n_a + n_b) * (n_a + n_b - 1.0)))),
         6) AS z_score
FROM agg
"""


@query("mannwhitney_u_acctbal", _MANNWHITNEY_ORACLE)
def mannwhitney_u_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank-sum test between two segments' balances — the
    nonparametric counterpart to `welch_ttest_acctbal`, with tie-corrected
    normal approximation. The rank sum stays INTEGER throughout (2*R_A =
    sum ca*(2*cum_before + cnt + 1) over per-distinct-value counts with
    the distributed running sum from the KS query); only the final
    z-score divides. No single-partition window."""
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY")
    )
    in_a = (F.col("c_mktsegment") == "BUILDING").cast("long")
    g = (
        c.select(F.col("c_acctbal").alias("v"), in_a.alias("in_a"))
        .groupBy("v")
        .agg(
            F.sum("in_a").alias("ca"),
            F.sum(F.lit(1) - F.col("in_a")).alias("cb"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    r = windows.with_global_running_sums(g, ["v"], ["cnt"]).select(
        "v", "ca", "cb", "cnt",
        (F.col("cum_cnt") - F.col("cnt")).alias("cum_before"),
    )
    agg = r.agg(
        F.sum("ca").alias("n_a"),
        F.sum("cb").alias("n_b"),
        F.sum(
            F.col("ca") * (2 * F.col("cum_before") + F.col("cnt") + 1)
        ).alias("r2a"),
        F.sum(
            F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")
        ).alias("tie3"),
    )
    n_a, n_b = F.col("n_a"), F.col("n_b")
    u2 = F.col("r2a") - n_a * (n_a + 1)
    ntot = n_a + n_b
    z = (
        u2.cast("double") / 2.0 - n_a.cast("double") * n_b / 2.0
    ) / F.sqrt(
        n_a.cast("double") * n_b / 12.0
        * (
            (ntot + 1)
            - F.col("tie3").cast("double") / (ntot * (ntot - F.lit(1.0)))
        )
    )
    return agg.select(
        n_a.cast("bigint").alias("n_a"),
        n_b.cast("bigint").alias("n_b"),
        u2.cast("bigint").alias("u2"),
        F.round(z, 6).alias("z_score"),
    )


_UNIGRAM_XENT_ORACLE = """
WITH dw AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '\\s+'),
                t -> t <> '')) AS word
  FROM documents),
vocab AS (SELECT word, COUNT(*) AS wc FROM dw GROUP BY word),
tot AS (SELECT SUM(wc) AS n, COUNT(*) AS v FROM vocab),
lp AS (
  SELECT word, ln((wc + 1) / CAST(t.n + t.v AS DOUBLE)) AS logp
  FROM vocab CROSS JOIN tot t)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       round(-AVG(l.logp), 6) AS xent
FROM dw d JOIN lp l ON d.word = l.word
GROUP BY d.doc_id
"""


@query("unigram_xent_scores", _UNIGRAM_XENT_ORACLE)
def unigram_xent_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cross-entropy under the corpus's own add-one-smoothed
    unigram LM — the perplexity-proxy quality signal (CCNet-style: docs
    whose token distribution diverges from the corpus score high). One
    corpus-token shuffle builds the vocab, log-probs join back by word
    (vocab-bounded), per-doc mean via map-side partial aggregation. Only
    the per-doc AVG is merge-order-sensitive — rounded at 6."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != F.lit(""))
    dw = d.select("doc_id", F.explode(toks).alias("word"))
    vocab = dw.groupBy("word").agg(F.count(F.lit(1)).alias("wc"))
    tot = vocab.agg(
        F.sum("wc").alias("n"), F.count(F.lit(1)).alias("v")
    )
    lp = vocab.crossJoin(F.broadcast(tot)).select(
        "word",
        F.log(
            (F.col("wc") + 1) / (F.col("n") + F.col("v")).cast("double")
        ).alias("logp"),
    )
    return (
        dw.join(lp, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.round(-F.avg("logp"), 6).alias("xent"),
        )
    )


def _leakage_safe_split_oracle() -> str:
    """Extend the cluster-closure oracle: split by CLUSTER key so near-dup
    clusters can never straddle train/test."""
    hexs = "0123456789abcdef"
    terms = " + ".join(
        f"(strpos('{hexs}', substring(h, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    tail = (
        "SELECT node AS doc_id, MIN(label) AS cluster_id "
        "FROM reach GROUP BY node"
    )
    assert tail in _CLUSTERS_ORACLE
    return _CLUSTERS_ORACLE.replace(
        tail,
        f""",
clusters AS ({tail}),
assigned AS (
  SELECT d.doc_id, COALESCE(cl.cluster_id, d.doc_id) AS gkey
  FROM docs d LEFT JOIN clusters cl ON d.doc_id = cl.doc_id),
bkt AS (
  SELECT doc_id, gkey,
         substring(md5('split:' || CAST(gkey AS VARCHAR)), 1, 8) AS h
  FROM assigned),
vv AS (SELECT doc_id, gkey, ({terms}) % 10000 AS bucket FROM bkt),
ss AS (
  SELECT doc_id, gkey,
         CASE WHEN bucket < 8000 THEN 'train'
              WHEN bucket < 9000 THEN 'val'
              ELSE 'test' END AS split
  FROM vv),
leak AS (
  SELECT COUNT(*) AS n_span FROM (
    SELECT gkey FROM ss GROUP BY gkey
    HAVING COUNT(DISTINCT split) > 1))
SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST((SELECT n_span FROM leak) AS BIGINT) AS n_spanning_clusters
FROM ss GROUP BY split""",
    )


@query("leakage_safe_split", _leakage_safe_split_oracle())
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware train/val/test split: docs are first closed into
    near-dup clusters (minhash pairs -> pointer-doubled components), then
    the md5 hash split keys on the CLUSTER id — so a document and its
    near-copies can never straddle train and test (the classic silent
    leakage path that inflates eval numbers). Unclustered docs key on
    their own id. Emits per-split counts plus the spanning-cluster count
    (zero by construction, verified through both engines)."""
    from etl_bigquery_pipeline_spark.operators import sampling

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz extra")).alias("text"),
    )
    corpus = d.unionAll(planted)
    pairs = dedup.minhash_near_dup_pairs(
        corpus, "doc_id", "text",
        num_hashes=16, bands=4, shingle_n=3, threshold=0.6,
        max_band_bucket=None,  # exact-recall parity with the SQL replay
    )
    clusters = dedup.near_dup_clusters(pairs)
    assigned = corpus.join(
        clusters.withColumnRenamed("node", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").alias("gkey"),
    )
    split = sampling.hash_split(
        assigned, "gkey", weights={"train": 0.8, "val": 0.1, "test": 0.1}
    )
    leak = (
        split.groupBy("gkey")
        .agg(F.countDistinct("split").alias("ns"))
        .agg(
            F.sum((F.col("ns") > 1).cast("long")).alias("n_span")
        )
    )
    return (
        split.groupBy("split")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .crossJoin(F.broadcast(leak))
        .select(
            "split", "n_docs",
            F.col("n_span").cast("bigint").alias("n_spanning_clusters"),
        )
    )


_BIGRAM_XENT_ORACLE = """
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS ts
  FROM documents),
dw AS (SELECT doc_id, unnest(ts) AS word FROM tok),
uni AS (SELECT word, COUNT(*) AS c1 FROM dw GROUP BY word),
tot AS (SELECT SUM(c1) AS n, COUNT(*) AS v FROM uni),
bg AS (
  SELECT unnest([ts[i] || ' ' || ts[i+1]
                 for i in generate_series(1, len(ts) - 1)]) AS bigram
  FROM tok),
big AS (SELECT bigram, COUNT(*) AS c2 FROM bg GROUP BY bigram),
probes AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'orig' ELSE 'reversed' END AS kind,
         CASE WHEN doc_id % 2 = 0 THEN ts ELSE list_reverse(ts) END AS ts
  FROM tok),
pb AS (
  SELECT doc_id, kind,
         unnest([{'w1': ts[i], 'w2': ts[i+1]}
                 for i in generate_series(1, len(ts) - 1)]) AS p
  FROM probes),
scored AS (
  SELECT pb.doc_id, pb.kind,
         CASE WHEN b.c2 IS NOT NULL
              THEN ln(b.c2 / CAST(u1.c1 AS DOUBLE))
              ELSE ln(0.4) + ln((COALESCE(u2.c1, 0) + 1)
                                / CAST(t.n + t.v AS DOUBLE))
         END AS logp
  FROM pb
  LEFT JOIN big b ON b.bigram = p.w1 || ' ' || p.w2
  JOIN uni u1 ON u1.word = p.w1
  LEFT JOIN uni u2 ON u2.word = p.w2
  CROSS JOIN tot t),
per_doc AS (
  SELECT doc_id, kind, round(-AVG(logp), 6) AS xent2
  FROM scored GROUP BY doc_id, kind)
SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_docs,
       round(AVG(xent2), 6) AS avg_xent2
FROM per_doc GROUP BY kind
"""


@query("bigram_backoff_xent", _BIGRAM_XENT_ORACLE)
def bigram_backoff_xent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM with stupid backoff (Brants et al. 2007, public):
    P(w2|w1) = c(w1 w2)/c(w1), backing off to 0.4 * add-one unigram when
    the bigram is unseen. Probes: every even doc as-is (all bigrams in-
    corpus), every odd doc TOKEN-REVERSED (novel bigrams force the
    backoff path) — reversed text must score strictly worse, the
    word-order sensitivity a unigram LM cannot see. Counts corpus-token-
    bounded; probe scoring joins by bigram/word keys; only the AVGs are
    merge-order-sensitive (rounded 6)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != F.lit(""))
    tok = d.select("doc_id", toks.alias("ts")).transform(scoped_cache)
    dw = tok.select("doc_id", F.explode("ts").alias("word"))
    uni = dw.groupBy("word").agg(F.count(F.lit(1)).alias("c1")).transform(
        scoped_cache
    )
    tot = uni.agg(F.sum("c1").alias("n"), F.count(F.lit(1)).alias("v"))
    bigrams_of = F.expr(
        "zip_with(slice(ts, 1, size(ts) - 1), slice(ts, 2, size(ts) - 1),"
        " (a, b) -> concat(a, ' ', b))"
    )
    big = (
        tok.select(F.explode(bigrams_of).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    probes = tok.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, "orig")
        .otherwise("reversed")
        .alias("kind"),
        F.when(F.col("doc_id") % 2 == 0, F.col("ts"))
        .otherwise(F.reverse("ts"))
        .alias("ts"),
    )
    pairs = probes.select(
        "doc_id", "kind",
        F.explode(
            F.expr(
                "zip_with(slice(ts, 1, size(ts) - 1), "
                "slice(ts, 2, size(ts) - 1), "
                "(a, b) -> struct(a AS w1, b AS w2))"
            )
        ).alias("p"),
    ).select("doc_id", "kind", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    scored = (
        pairs.join(
            big,
            F.concat(F.col("w1"), F.lit(" "), F.col("w2"))
            == F.col("bigram"),
            "left",
        )
        .join(uni.withColumnsRenamed({"word": "w1", "c1": "c1_w1"}), "w1")
        .join(
            uni.withColumnsRenamed({"word": "w2", "c1": "c1_w2"}),
            "w2",
            "left",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id", "kind",
            F.when(
                F.col("c2").isNotNull(),
                F.log(F.col("c2") / F.col("c1_w1").cast("double")),
            )
            .otherwise(
                F.log(F.lit(0.4))
                + F.log(
                    (F.coalesce(F.col("c1_w2"), F.lit(0)) + 1)
                    / (F.col("n") + F.col("v")).cast("double")
                )
            )
            .alias("logp"),
        )
    )
    per_doc = scored.groupBy("doc_id", "kind").agg(
        F.round(-F.avg("logp"), 6).alias("xent2")
    )
    return per_doc.groupBy("kind").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(F.avg("xent2"), 6).alias("avg_xent2"),
    )


_SOURCE_PROFILE_ORACLE = """
WITH dw AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '\\s+'),
                t -> t <> '')) AS word
  FROM documents),
vocab AS (SELECT word, COUNT(*) AS wc FROM dw GROUP BY word),
tot AS (SELECT SUM(wc) AS n, COUNT(*) AS v FROM vocab),
lp AS (
  SELECT word, ln((wc + 1) / CAST(t.n + t.v AS DOUBLE)) AS logp
  FROM vocab CROSS JOIN tot t),
per_doc AS (
  SELECT d.doc_id, COUNT(*) AS n_tok,
         COUNT(DISTINCT d.word) AS n_dis,
         round(-AVG(l.logp), 6) AS xent
  FROM dw d JOIN lp l ON d.word = l.word
  GROUP BY d.doc_id)
SELECT doc.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       round(AVG(p.n_tok), 4) AS avg_tokens,
       round(AVG(CAST(p.n_dis AS DOUBLE) / p.n_tok), 6)
         AS avg_distinct_ratio,
       round(AVG(p.xent), 6) AS avg_xent
FROM per_doc p JOIN documents doc ON doc.doc_id = p.doc_id
GROUP BY doc.source
"""


@query("source_quality_profile", _SOURCE_PROFILE_ORACLE)
def source_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation dashboard: document counts, token lengths,
    lexical diversity, and unigram-LM cross-entropy rolled up by source —
    the view that decides per-domain mixture weights and which feeds need
    attention. Composes the xent machinery; everything after the per-doc
    aggregate is source-cardinality-bounded."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != F.lit(""))
    dw = d.select("doc_id", F.explode(toks).alias("word")).transform(
        scoped_cache
    )
    vocab = dw.groupBy("word").agg(F.count(F.lit(1)).alias("wc"))
    tot = vocab.agg(F.sum("wc").alias("n"), F.count(F.lit(1)).alias("v"))
    lp = vocab.crossJoin(F.broadcast(tot)).select(
        "word",
        F.log(
            (F.col("wc") + 1) / (F.col("n") + F.col("v")).cast("double")
        ).alias("logp"),
    )
    per_doc = (
        dw.join(lp, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.countDistinct("word").alias("n_dis"),
            F.round(-F.avg("logp"), 6).alias("xent"),
        )
    )
    return (
        per_doc.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("n_tok"), 4).alias("avg_tokens"),
            F.round(
                F.avg(F.col("n_dis").cast("double") / F.col("n_tok")), 6
            ).alias("avg_distinct_ratio"),
            F.round(F.avg("xent"), 6).alias("avg_xent"),
        )
    )


_LOGREG_AUC_ORACLE = _LOGREG_ORACLE.replace(
    "SELECT doc_id, score, score >= 0.5 AS pred_high_quality FROM scored",
    """,
g AS (
  SELECT s.score, SUM(f.y) AS ca, SUM(1 - f.y) AS cb
  FROM scored s JOIN feats f ON f.doc_id = s.doc_id
  GROUP BY s.score),
r AS (
  SELECT score, ca, cb,
         SUM(cb) OVER (ORDER BY score ROWS UNBOUNDED PRECEDING) - cb
           AS cumb_before
  FROM g),
agg AS (
  SELECT SUM(ca) AS n_pos, SUM(cb) AS n_neg,
         SUM(ca * (2 * cumb_before + cb)) AS num2
  FROM r)
SELECT CAST(n_pos AS BIGINT) AS n_pos, CAST(n_neg AS BIGINT) AS n_neg,
       round(num2 / (2.0 * n_pos * n_neg), 6) AS auc
FROM agg""",
)


@query("logreg_auc", _LOGREG_AUC_ORACLE)
def logreg_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed AUC of the learned quality model — the rank statistic
    (P(score_pos > score_neg), ties half-credit), computed exactly via
    per-distinct-score counts + the distributed running sum: the doubled
    numerator sum ca*(2*cumb_before + cb) stays INTEGER, one division at
    the end. The oracle replays training AND the rank arithmetic. At
    scale this is a model-eval primitive that never collects a score.
    (On THIS corpus AUC is exactly 1.0 — the label is a threshold of a
    monotone feature, so perfect ranking is the correct answer, verified
    through both engines; with human labels the same machinery reports
    the honest number.)"""
    d = _t(spark, sf_dir, "documents")
    feats = quality_model.doc_features(d).transform(scoped_cache)
    trained = quality_model.train_logreg(feats)
    scored = quality_model.score_documents(feats, trained.weights)
    g = (
        scored.join(feats.select("doc_id", "y"), "doc_id")
        .groupBy("score")
        .agg(
            F.sum("y").cast("long").alias("ca"),
            F.sum(F.lit(1.0) - F.col("y")).cast("long").alias("cb"),
        )
    )
    r = windows.with_global_running_sums(g, ["score"], ["cb"]).select(
        "score", "ca", "cb",
        (F.col("cum_cb") - F.col("cb")).alias("cumb_before"),
    )
    agg = r.agg(
        F.sum("ca").alias("n_pos"),
        F.sum("cb").alias("n_neg"),
        F.sum(
            F.col("ca") * (2 * F.col("cumb_before") + F.col("cb"))
        ).alias("num2"),
    )
    return agg.select(
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.col("n_neg").cast("bigint").alias("n_neg"),
        F.round(
            F.col("num2") / (2.0 * F.col("n_pos") * F.col("n_neg")), 6
        ).alias("auc"),
    )


# ===================================================================
# Round-4 wave 6 — prefix-filter similarity join, hard negatives,
# corpus datasheet, reproducible training order, length bucketing,
# key discovery, model calibration
# ===================================================================

# ---- AllPairs/PPJoin prefix-filtered exact Jaccard self-join ----

_PREFIX_JACCARD_ORACLE = """
WITH docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text || ' zzz extra' FROM documents WHERE doc_id < 25),
tk AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
  FROM docs),
t AS (
  SELECT doc_id,
         list_distinct([array_to_string(t[i:i+2], ' ')
                        for i in generate_series(1, greatest(len(t) - 2, 1))])
           AS toks
  FROM tk),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.toks, b.toks)) AS i,
         len(a.toks) AS na, len(b.toks) AS nb
  FROM t a JOIN t b ON a.doc_id < b.doc_id),
s AS (
  SELECT id_a, id_b,
         round(CAST(i AS DOUBLE) / (na + nb - i), 6) AS jaccard
  FROM p WHERE na + nb - i > 0)
SELECT id_a, id_b, jaccard FROM s WHERE jaccard >= 0.5
"""


@query("prefix_jaccard_pairs", _PREFIX_JACCARD_ORACLE)
def prefix_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-shingle-set Jaccard >= 0.5 pairs via the AllPairs/PPJoin
    prefix filter (operators.dedup.prefix_filter_jaccard_pairs):
    rarest-first element ordering, prefix + length + overlap-bound
    filters, exact verify on candidates only. Shingle sets (not raw
    token sets) are the discriminative representation: the synthetic
    corpus draws words from a small vocabulary, so nearly every doc
    PAIR shares most single tokens — shingling restores a long-tailed
    element space where prefixes actually prune. The oracle is the
    deliberately-quadratic brute force over the same shingle sets, so a
    green hash proves the prefix filter is LOSSLESS (zero false
    negatives) at this threshold — the property that distinguishes it
    from MinHash-LSH. Planted: 25 near-dup copies (two appended tokens
    -> two extra shingles, shifted ids).

    The quadratic oracle is feasible through sf0.1 (5k docs = 12.5M
    DuckDB pairs, sweep-verified); at sf1.0 it is 1.25e9 pairs and is
    the one deliberate skip in the sf1.0 full-catalog sweep (SCALE.md)
    — the Spark side's sf1.0/sf10 behavior is measured there instead."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.filter(F.col("doc_id") < 25).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz extra")).alias("text"),
    )
    corpus = d.unionAll(planted)
    return dedup.prefix_filter_jaccard_pairs(
        corpus, "doc_id", "text", threshold=0.5, shingle_n=3
    )


# ---- hard-negative mining over embeddings ----

_HARD_NEG_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, label AS qlab, embedding AS qv
           FROM embeddings
           WHERE vec_id % 100 = 0 AND vec_id < {_ANN_PANEL_MAX_ID}),
c AS (SELECT vec_id AS neighbor_id, label AS clab, embedding AS cv
      FROM embeddings),
s AS (
  SELECT query_id, neighbor_id, {_cosine_sql("qv", "cv")} AS sim
  FROM q JOIN c ON q.qlab <> c.clab),
r AS (
  SELECT query_id, neighbor_id, sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY sim DESC, neighbor_id ASC) AS BIGINT) AS rnk
  FROM s)
SELECT query_id, neighbor_id, sim, rnk FROM r WHERE rnk <= 3
"""


@query("hard_negative_mining", _HARD_NEG_ORACLE)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training hard negatives (similarity.hard_negatives):
    per probe vector, the top-3 most-cosine-similar vectors with a
    DIFFERENT label — broadcast probes, one corpus scan, label inequality
    fused into the join predicate. The negatives that look most like
    positives are the ones a contrastive batch actually learns from."""
    emb = _t(spark, sf_dir, "embeddings")
    probes = _ann_panel(emb, 100)
    out = similarity.hard_negatives(
        emb, probes, k=3, id_col="vec_id", vec_col="embedding",
        label_col="label", query_id_col="query_id",
    )
    return out.select(
        "query_id", "neighbor_id", "sim",
        F.col("rank").cast("bigint").alias("rnk"),
    )


# ---- corpus datasheet: the one-scan dataset card ----

_DATASHEET_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       round(AVG(n_chars), 4) AS avg_chars,
       round(quantile_cont(n_chars, 0.5), 4) AS p50_chars,
       round(quantile_cont(n_chars, 0.9), 4) AS p90_chars,
       round(AVG(CASE WHEN n_chars < 100 THEN 1.0 ELSE 0.0 END), 6)
         AS short_frac,
       CAST(SUM(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                x -> x <> ''))) AS BIGINT) AS total_tokens
FROM documents
"""


@query("corpus_datasheet", _DATASHEET_ORACLE)
def corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card summary (datasheets-for-datasets style): volume,
    source/lang diversity, length distribution (exact interpolated
    percentiles), short-doc fraction, and total whitespace tokens. The
    two distinct-aggregates expand the scan 2x map-side but group to a
    single row — the shuffle is a handful of partial states, so the
    scan cost dominates at any scale. The length percentiles run on the
    histogram plan (`_hist_exact_percentiles`): percentile()'s per-task
    value buffer over an unaggregated corpus column is the r8 sf10 OOM
    class, and the extra pass it costs here is a pruned single-column
    (n_chars) scan — cheap next to the text-bearing main aggregate."""
    d = _t(spark, sf_dir, "documents")
    pcts = _hist_exact_percentiles(
        d, None, "n_chars", [0.5, 0.9], ["__p50", "__p90"]
    )
    agg = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(
            F.avg(F.when(F.col("n_chars") < 100, 1.0).otherwise(0.0)), 6
        ).alias("short_frac"),
        F.sum(TX.token_count("text")).cast("bigint").alias("total_tokens"),
    )
    return agg.crossJoin(F.broadcast(pcts)).select(
        "n_docs",
        "n_sources",
        "n_langs",
        "total_chars",
        "avg_chars",
        F.round(F.col("__p50"), 4).alias("p50_chars"),
        F.round(F.col("__p90"), 4).alias("p90_chars"),
        "short_frac",
        "total_tokens",
    )


# ---- reproducible per-epoch global shuffle order ----

_EPOCH_SHUFFLE_ORACLE = """
WITH e AS (
  SELECT doc_id, g.e AS epoch,
         md5('epoch:' || CAST(g.e AS VARCHAR) || ':'
             || CAST(doc_id AS VARCHAR)) AS skey
  FROM documents CROSS JOIN generate_series(0, 1) AS g(e)),
r AS (
  SELECT CAST(epoch AS BIGINT) AS epoch, doc_id, skey,
         CAST(ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY skey ASC)
              AS BIGINT) AS rnk
  FROM e)
SELECT epoch, rnk, doc_id, skey FROM r WHERE rnk <= 10
"""


@query("epoch_shuffle_order", _EPOCH_SHUFFLE_ORACLE)
def epoch_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order generation: every epoch re-shuffles
    the corpus by ordering on md5(epoch:doc_id) — a different but fully
    reproducible permutation per epoch, identical on any cluster size
    (no RNG state, no driver). At scale the ORDER BY is a range
    partition on the hash key, i.e. the epoch's shard files fall out of
    a single sort; here the query surfaces the head of two epochs'
    orders as evidence the permutations differ and replay exactly."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    e = d.select(
        "doc_id",
        F.explode(F.array(F.lit(0), F.lit(1))).alias("epoch"),
    ).select(
        F.col("epoch").cast("bigint").alias("epoch"),
        "doc_id",
        F.md5(
            F.concat(
                F.lit("epoch:"),
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        ).alias("skey"),
    )
    w = Window.partitionBy("epoch").orderBy(F.col("skey").asc())
    return (
        e.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 10)
        .select("epoch", "rnk", "doc_id", "skey")
    )


# ---- length-bucketed batching for sequence training ----

_LENGTH_BUCKET_ORACLE = """
WITH t AS (
  SELECT len(list_filter(regexp_split_to_array(text, '\\s+'),
             x -> x <> '')) AS n_tok
  FROM documents),
b AS (
  SELECT n_tok,
         CASE WHEN n_tok < 16 THEN 'lt16' WHEN n_tok < 32 THEN 'lt32'
              WHEN n_tok < 64 THEN 'lt64' WHEN n_tok < 128 THEN 'lt128'
              WHEN n_tok < 256 THEN 'lt256' ELSE 'ge256' END AS bucket
  FROM t)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(CEIL(COUNT(*) / 32.0) AS BIGINT) AS n_batches,
       CAST(MAX(n_tok) AS BIGINT) AS max_tok,
       CAST(SUM(n_tok) AS BIGINT) AS sum_tok,
       round(1.0 - CAST(SUM(n_tok) AS DOUBLE)
                   / (COUNT(*) * MAX(n_tok)), 6) AS pad_waste
FROM b GROUP BY bucket
"""


@query("length_bucket_batches", _LENGTH_BUCKET_ORACLE)
def length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching plan (the pad-to-longest alternative to
    token_budget_packing): bucket documents by token count into fixed
    power-of-two ranges, then per bucket report batch count at size 32
    and the padding waste if every sequence pads to the bucket max.
    Single scan + tiny groupBy; the bucket column is the partition key
    a writer would use to emit homogeneous-length shards."""
    d = _t(spark, sf_dir, "documents")
    t = d.select(TX.token_count("text").alias("n_tok"))
    bucket = (
        F.when(F.col("n_tok") < 16, "lt16")
        .when(F.col("n_tok") < 32, "lt32")
        .when(F.col("n_tok") < 64, "lt64")
        .when(F.col("n_tok") < 128, "lt128")
        .when(F.col("n_tok") < 256, "lt256")
        .otherwise("ge256")
    )
    return (
        t.select(F.col("n_tok"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.ceil(F.count(F.lit(1)) / 32.0).cast("bigint").alias("n_batches"),
            F.max("n_tok").cast("bigint").alias("max_tok"),
            F.sum("n_tok").cast("bigint").alias("sum_tok"),
            F.round(
                1.0
                - F.sum("n_tok").cast("double")
                / (F.count(F.lit(1)) * F.max("n_tok")),
                6,
            ).alias("pad_waste"),
        )
    )


# ---- candidate-key discovery (data profiling) ----

_CANDIDATE_KEY_ORACLE = """
WITH t AS (
  SELECT COUNT(*) AS n_rows,
         COUNT(DISTINCT o_orderkey) AS d1,
         COUNT(DISTINCT o_custkey) AS d2,
         COUNT(DISTINCT CAST(o_custkey AS VARCHAR) || '|'
               || CAST(CAST(o_orderdate AS DATE) AS VARCHAR)) AS d3,
         COUNT(DISTINCT o_orderstatus || '|' || o_orderpriority) AS d4
  FROM orders)
SELECT combo, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       n_distinct = n_rows AS is_key
FROM (
  SELECT 'o_orderkey' AS combo, n_rows, d1 AS n_distinct FROM t
  UNION ALL SELECT 'o_custkey', n_rows, d2 FROM t
  UNION ALL SELECT 'o_custkey|o_orderdate', n_rows, d3 FROM t
  UNION ALL SELECT 'o_orderstatus|o_orderpriority', n_rows, d4 FROM t)
"""


@query("candidate_key_profile", _CANDIDATE_KEY_ORACLE)
def candidate_key_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-key discovery over a fixed combo lattice: exact distinct
    counts for four column combinations in ONE scan (Spark plans the
    multi-distinct agg as a 4x Expand — one pass over the data, partial
    aggregation map-side), then unpivoted to one row per combo with the
    uniqueness verdict. The profiling step that decides dedup keys and
    upsert merge keys before a pipeline hardcodes them."""
    o = _t(spark, sf_dir, "orders")
    agg = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_orderkey").alias("d1"),
        F.countDistinct("o_custkey").alias("d2"),
        F.countDistinct(
            F.concat(
                F.col("o_custkey").cast("string"),
                F.lit("|"),
                F.col("o_orderdate").cast("date").cast("string"),
            )
        ).alias("d3"),
        F.countDistinct(
            F.concat(F.col("o_orderstatus"), F.lit("|"), F.col("o_orderpriority"))
        ).alias("d4"),
    )
    combos = agg.select(
        F.col("n_rows"),
        F.expr(
            "stack(4, 'o_orderkey', d1, 'o_custkey', d2, "
            "'o_custkey|o_orderdate', d3, "
            "'o_orderstatus|o_orderpriority', d4) AS (combo, n_distinct)"
        ),
    )
    return combos.select(
        "combo",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        (F.col("n_distinct") == F.col("n_rows")).alias("is_key"),
    )


# ---- calibration of the learned quality model ----

_CALIBRATION_ORACLE = _LOGREG_ORACLE.replace(
    "SELECT doc_id, score, score >= 0.5 AS pred_high_quality FROM scored",
    """SELECT CAST(least(CAST(floor(score * 10) AS BIGINT), 9) AS BIGINT)
         AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       round(AVG(score), 6) AS mean_score,
       round(AVG(y), 6) AS frac_high
FROM scored s JOIN feats f USING (doc_id)
GROUP BY 1""",
)


@query("logreg_calibration_bins", _CALIBRATION_ORACLE)
def logreg_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the learned quality filter: decile-bin the
    predicted score and compare mean prediction to the empirical
    high-quality rate per bin — the calibration check that decides
    whether a score threshold is trustworthy as a keep-probability.
    Same distributed training as logreg_quality_scores (3 GD steps, one
    4-scalar aggregate each), then one groupBy over <=10 bins."""
    d = _t(spark, sf_dir, "documents")
    feats = quality_model.doc_features(d).transform(scoped_cache)
    trained = quality_model.train_logreg(feats)
    scored = quality_model.score_documents(feats, trained.weights)
    joined = scored.join(feats.select("doc_id", "y"), "doc_id")
    return (
        joined.select(
            F.least(F.floor(F.col("score") * 10).cast("bigint"), F.lit(9).cast("bigint"))
            .cast("bigint")
            .alias("bin"),
            "score",
            "y",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("score"), 6).alias("mean_score"),
            F.round(F.avg("y"), 6).alias("frac_high"),
        )
    )


# ===================================================================
# Round-4 wave 7 — row-level quarantine, compression-ratio quality,
# ingestion breadth (ORC / binaryFile exercised in tests)
# ===================================================================

# ---- row-level quarantine with violation signatures ----

_QUARANTINE_ORACLE = """
WITH p AS (
  SELECT CASE WHEN l_orderkey % 50 = 0 THEN -l_quantity
              ELSE l_quantity END AS q,
         CASE WHEN l_orderkey % 77 = 0 THEN 0.0
              ELSE l_extendedprice END AS ep,
         CASE WHEN l_orderkey % 91 = 0 THEN NULL
              ELSE l_discount END AS disc
  FROM lineitem),
f AS (
  SELECT list_sort(list_filter([
           CASE WHEN coalesce(q < 0, true) THEN 'neg_quantity' END,
           CASE WHEN coalesce(ep <= 0, true) THEN 'nonpos_price' END,
           CASE WHEN coalesce(disc < 0 OR disc > 0.6, true)
                THEN 'bad_discount' END],
         x -> x IS NOT NULL)) AS v
  FROM p)
SELECT CASE WHEN len(v) = 0 THEN '__none__'
            ELSE array_to_string(v, ',') END AS violations,
       CAST(COUNT(*) AS BIGINT) AS n
FROM f GROUP BY 1
"""


@query("quarantine_counts", _QUARANTINE_ORACLE)
def quarantine_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch quarantine (dq.quarantine_split — the batch twin of the
    streaming DLQ): violations are seeded in-query (negated quantities,
    zeroed prices, NULLed discounts on modular orderkeys), rows split
    good/bad in one map-side flags projection, and the bad side grouped
    by its sorted violation signature. The NULLed discounts exercise the
    three-valued-logic posture: a NULL-evaluating rule is a violation
    (unknown is not a pass), so corrupt rows can't slip through."""
    li = _t(spark, sf_dir, "lineitem")
    planted = li.select(
        F.when(F.col("l_orderkey") % 50 == 0, -F.col("l_quantity"))
        .otherwise(F.col("l_quantity"))
        .alias("l_quantity"),
        F.when(F.col("l_orderkey") % 77 == 0, F.lit(0.0))
        .otherwise(F.col("l_extendedprice"))
        .alias("l_extendedprice"),
        F.when(F.col("l_orderkey") % 91 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("l_discount"))
        .alias("l_discount"),
    )
    good, bad = dq.quarantine_split(
        planted,
        {
            "neg_quantity": F.col("l_quantity") < 0,
            "nonpos_price": F.col("l_extendedprice") <= 0,
            "bad_discount": (F.col("l_discount") < 0)
            | (F.col("l_discount") > 0.6),
        },
    )
    bad_counts = bad.groupBy("violations").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    good_count = good.agg(
        F.lit("__none__").alias("violations"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return bad_counts.unionAll(good_count)


# ---- compression-ratio quality signal (Arrow-batched zlib) ----


@query("compression_ratio_quality")  # rows-only: zlib is not SQL-expressible
def compression_ratio_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source compression-ratio profile
    (functions.pandas_udfs.compression_ratio_udf): zlib ratio per
    document — the low-information-content detector (boilerplate and
    template spam compress far below normal prose). The codec genuinely
    needs Python, so this is the sanctioned Arrow-batch escape hatch;
    pytest pins the UDF bit-for-bit to a serial zlib run, and the
    distributed gate below is the oracled correctness signal."""
    from etl_bigquery_pipeline_spark.functions.pandas_udfs import (
        compression_ratio_udf,
    )

    d = _t(spark, sf_dir, "documents")
    r = d.select("source", compression_ratio_udf(F.col("text")).alias("ratio"))
    return (
        r.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("ratio"), 4).alias("avg_ratio"),
            F.round(F.min("ratio"), 4).alias("min_ratio"),
            F.round(F.max("ratio"), 4).alias("max_ratio"),
        )
        .orderBy("source")
    )


@query(
    "compression_quality_gate",
    "SELECT true AS spam_below_corpus, true AS ratios_bounded",
)
def compression_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracled gate for the zlib signal: a planted maximally-repetitive
    document must compress far below the corpus average (the property the
    filter exploits), and every ratio must be positive and bounded. Both
    reductions are distributed aggregates over the UDF column; only two
    booleans reach the driver."""
    from etl_bigquery_pipeline_spark.functions.pandas_udfs import (
        compression_ratio_udf,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    spam = spark.range(1).select(
        F.lit(9000001).cast("bigint").alias("doc_id"),
        F.concat_ws(" ", F.array_repeat(F.lit("spam"), 500)).alias("text"),
    )
    r = d.unionAll(spam).select(
        "doc_id", compression_ratio_udf(F.col("text")).alias("ratio")
    )
    agg = r.agg(
        F.min(F.when(F.col("doc_id") == 9000001, F.col("ratio"))).alias("spam_r"),
        F.avg(F.when(F.col("doc_id") != 9000001, F.col("ratio"))).alias("corpus_r"),
        F.min("ratio").alias("lo"),
        F.max("ratio").alias("hi"),
    )
    return agg.select(
        (F.col("spam_r") < F.col("corpus_r") * 0.5).alias("spam_below_corpus"),
        ((F.col("lo") > 0) & (F.col("hi") <= 1.2)).alias("ratios_bounded"),
    )


# ===================================================================
# Round-4 wave 8 — waterfilling mixture optimizer, mixed-language
# detection, sharded JSONL export (sink exercised in tests)
# ===================================================================

# ---- waterfilling: sampling rates under per-source capacity caps ----

_WATERFILL_ORACLE = """
WITH caps AS (
  SELECT source,
         CAST(SUM(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                  x -> x <> ''))) AS DOUBLE) AS cap
  FROM documents GROUP BY source),
t AS (SELECT COUNT(*) AS n, SUM(cap) AS total FROM caps),
o AS (
  SELECT c.source, c.cap, 1.0 / t.n AS w, c.cap * t.n AS ratio,
         0.8 * t.total AS b
  FROM caps c CROSS JOIN t),
r AS (
  SELECT *,
         SUM(cap) OVER (ORDER BY ratio, source
                        ROWS UNBOUNDED PRECEDING) AS cumc,
         SUM(w) OVER (ORDER BY ratio, source
                      ROWS UNBOUNDED PRECEDING) AS cumw,
         lag(ratio, 1, 0.0) OVER (ORDER BY ratio, source) AS prev_ratio
  FROM o),
s AS (
  SELECT *, (b - (cumc - cap)) / (1.0 - (cumw - w)) AS rj FROM r),
star AS (
  SELECT min(rj) AS rstar FROM s
  WHERE rj >= prev_ratio AND rj <= ratio)
SELECT o.source, CAST(o.cap AS BIGINT) AS tokens,
       round(least(o.cap, star.rstar * o.w), 4) AS alloc_tokens,
       round(least(o.cap, star.rstar * o.w) / o.cap, 6) AS sample_rate,
       o.cap <= star.rstar * o.w AS capped
FROM o CROSS JOIN star
"""


@query("mixture_waterfill_rates", _WATERFILL_ORACLE)
def mixture_waterfill_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture optimizer under per-source capacity caps (the Dolma/Pile
    mixing problem): target uniform source weights, budget = 80% of the
    corpus tokens; sources too small to supply their share are capped at
    capacity and the surplus waterfalls to the rest. Closed-form
    waterfilling: sort sources by capacity/weight, prefix-sum, pick the
    unique breakpoint where the implied water level lands inside its
    interval — no iteration, no driver loop, and the whole computation
    runs on the per-SOURCE aggregate (thousands of rows at any corpus
    scale, so the post-agg global window is trivially bounded). Emits
    per-source allocation, sampling rate, and the capped verdict."""
    d = _t(spark, sf_dir, "documents")
    caps = d.groupBy("source").agg(
        F.sum(TX.token_count("text")).cast("double").alias("cap")
    )
    t = caps.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cap").alias("total")
    )
    o = caps.crossJoin(F.broadcast(t)).select(
        "source",
        "cap",
        (F.lit(1.0) / F.col("n")).alias("w"),
        (F.col("cap") * F.col("n")).alias("ratio"),
        (F.lit(0.8) * F.col("total")).alias("b"),
    )
    ww = Window.orderBy("ratio", "source")
    cum = Window.orderBy("ratio", "source").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = o.select(
        "*",
        F.sum("cap").over(cum).alias("cumc"),
        F.sum("w").over(cum).alias("cumw"),
        F.lag("ratio", 1, 0.0).over(ww).alias("prev_ratio"),
    ).withColumn(
        "rj",
        (F.col("b") - (F.col("cumc") - F.col("cap")))
        / (F.lit(1.0) - (F.col("cumw") - F.col("w"))),
    )
    star = (
        s.filter((F.col("rj") >= F.col("prev_ratio")) & (F.col("rj") <= F.col("ratio")))
        .agg(F.min("rj").alias("rstar"))
    )
    return o.crossJoin(F.broadcast(star)).select(
        "source",
        F.col("cap").cast("bigint").alias("tokens"),
        F.round(F.least(F.col("cap"), F.col("rstar") * F.col("w")), 4).alias(
            "alloc_tokens"
        ),
        F.round(
            F.least(F.col("cap"), F.col("rstar") * F.col("w")) / F.col("cap"), 6
        ).alias("sample_rate"),
        (F.col("cap") <= F.col("rstar") * F.col("w")).alias("capped"),
    )


# ---- mixed-language detection: chunk-level lang-ID disagreement ----


def _mixed_lang_oracle() -> str:
    from etl_bigquery_pipeline_spark.functions.text import STOPWORDS

    langs = sorted(STOPWORDS)
    score_cols = []
    for lang in langs:
        markers = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        score_cols.append(
            f"len(list_filter(ctoks, x -> list_contains([{markers}], x)))"
            f" AS s_{lang}"
        )
    first, rest = langs[0], langs[1:]
    guess_expr = f"'{first}'"
    best_expr = f"s_{first}"
    for lang in rest:
        guess_expr = (
            f"CASE WHEN s_{lang} > {best_expr} THEN '{lang}' ELSE {guess_expr} END"
        )
        best_expr = f"greatest({best_expr}, s_{lang})"
    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
  FROM documents),
n AS (
  SELECT doc_id, toks,
         greatest(CAST(ceil(len(toks) / 32.0) AS INT), 1) AS n_chunks
  FROM t),
c AS (
  SELECT doc_id,
         unnest([list_transform(toks[i*32 + 1 : i*32 + 32], x -> lower(x))
                 for i in generate_series(0, n_chunks - 1)]) AS ctoks
  FROM n),
g AS (SELECT doc_id, {", ".join(score_cols)} FROM c),
cl AS (SELECT doc_id, {guess_expr} AS clang FROM g),
per AS (SELECT doc_id, clang, COUNT(*) AS cnt FROM cl GROUP BY 1, 2),
stats AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_chunks,
         CAST(COUNT(*) AS BIGINT) AS n_langs
  FROM per GROUP BY 1),
top AS (
  SELECT doc_id, clang AS majority_lang, cnt,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY cnt DESC, clang ASC) AS rn
  FROM per)
SELECT s.doc_id, s.n_chunks, s.n_langs, top.majority_lang,
       round(CAST(top.cnt AS DOUBLE) / s.n_chunks, 6) AS majority_frac
FROM stats s JOIN top ON top.doc_id = s.doc_id AND top.rn = 1
WHERE s.n_chunks >= 2
"""


@query("mixed_language_docs", _mixed_lang_oracle())
def mixed_language_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level language coherence (the curation signal behind
    splitting or dropping code-switched / concatenated-crawl documents):
    run the stopword-marker lang-ID per 32-token chunk and report, per
    multi-chunk document, how many distinct languages its chunks vote
    for and the majority share. Pure explode + two small groupBys keyed
    by doc_id; the per-doc window ranks at most a handful of language
    rows. Docs with n_langs > 1 are the mixed-language candidates."""
    from etl_bigquery_pipeline_spark.functions.text import STOPWORDS

    d = _t(spark, sf_dir, "documents")
    # scalable lang scoring: instead of lang_guess's per-language
    # higher-order filters (interpreted lambdas, K x |markers| work per
    # chunk), explode chunk tokens once and count marker hits through a
    # broadcast (marker-word, lang) join — identical semantics (marker
    # hit-count argmax, ties alphabetical, zero-hit chunks default to the
    # first language), hash-join speed
    langs = sorted(STOPWORDS)
    markers = F.broadcast(
        spark.createDataFrame(
            [(w, lang) for lang in langs for w in sorted(set(STOPWORDS[lang]))],
            "__w string, __lang string",
        )
    )
    toks = d.select("doc_id", TX.tokens("text").alias("__toks")).select(
        "doc_id",
        F.transform("__toks", F.lower).alias("__lt"),
        F.size("__toks").alias("__nt"),
    )
    spine = toks.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.ceil(F.col("__nt") / 32.0).cast("int"), F.lit(1))
                - 1,
            )
        ).alias("__ci"),
        "__lt",
    ).select(
        "doc_id", "__ci", F.slice("__lt", F.col("__ci") * 32 + 1, 32).alias("__ct")
    ).transform(scoped_cache)
    hits = (
        spine.select("doc_id", "__ci", F.explode("__ct").alias("__w"))
        .join(markers, "__w")
        .groupBy("doc_id", "__ci", "__lang")
        .agg(F.count(F.lit(1)).alias("__s"))
    )
    bw = Window.partitionBy("doc_id", "__ci").orderBy(
        F.col("__s").desc(), F.col("__lang").asc()
    )
    best = (
        hits.withColumn("__rn", F.row_number().over(bw))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "__ci", F.col("__lang").alias("clang"))
    )
    chunks = spine.select("doc_id", "__ci").join(
        best, ["doc_id", "__ci"], "left"
    ).select(
        "doc_id", F.coalesce(F.col("clang"), F.lit(langs[0])).alias("clang")
    )
    per = chunks.groupBy("doc_id", "clang").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = per.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_chunks"),
        F.count(F.lit(1)).cast("bigint").alias("n_langs"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("cnt").desc(), F.col("clang").asc()
    )
    top = (
        per.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("clang").alias("majority_lang"), "cnt")
    )
    return (
        stats.join(top, "doc_id")
        .filter(F.col("n_chunks") >= 2)
        .select(
            "doc_id",
            "n_chunks",
            "n_langs",
            "majority_lang",
            F.round(F.col("cnt").cast("double") / F.col("n_chunks"), 6).alias(
                "majority_frac"
            ),
        )
    )


# ===================================================================
# Round-4 wave 9 — TPC-H-shaped multi-join analytics breadth
# (Q7/Q8/Q14/Q19/Q22 adaptations to this schema)
# ===================================================================

_Q7_ORACLE = """
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
"""


@query("nation_trade_flows", _Q7_ORACLE)
def nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): revenue flowing between every
    CROSS-nation (customer-nation, supplier-nation) pair by ship year.
    Five-way join: nation broadcast twice under different aliases,
    customer/supplier broadcast, the only big shuffle is
    lineitem-orders on orderkey; the date filter pushes down to the
    lineitem scan."""
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_orderkey", "l_suppkey", "l_shipdate",
             "l_extendedprice", "l_discount")
    n1 = n.select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation"))
    n2 = n.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cnk"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("snk"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )


_Q8_ORACLE = """
WITH flows AS (
  SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
         n2.n_name AS supp_nation,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA')
SELECT l_year,
       round(CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN rev
                           ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(rev) AS DOUBLE), 6) AS mkt_share
FROM flows GROUP BY l_year
"""


@query("market_share_by_year", _Q8_ORACLE)
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): NATION_7 suppliers' share
    of all revenue delivered into ASIA customers, per ship year — the
    conditional-aggregate-over-star-join pattern. Every dimension
    broadcasts; the share is a ratio of two decimal-exact sums computed
    in ONE aggregate (no second pass for the denominator)."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    asia_nk = F.broadcast(
        n.join(r, n["n_regionkey"] == r["r_regionkey"]).select(
            F.col("n_nationkey").alias("cnk")
        )
    )
    n2 = F.broadcast(
        n.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(asia_nk, F.col("c_nationkey") == F.col("cnk"))
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(n2, F.col("s_nationkey") == F.col("snk"))
        .groupBy(F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_7", rev).otherwise(
                        F.lit(0).cast("decimal(18,4)")
                    )
                ).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


_Q14_ORACLE = """
SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       CAST(EXTRACT(month FROM l_shipdate) AS BIGINT) AS l_month,
       round(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,4))) AS DOUBLE), 4) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY 1, 2
"""


@query("promo_revenue_share", _Q14_ORACLE)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): PROMO parts' percentage of
    revenue per ship month. Part broadcasts (dimension); numerator and
    denominator fuse into one aggregate over the single fact scan."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy(
            F.year("l_shipdate").cast("bigint").alias("l_year"),
            F.month("l_shipdate").cast("bigint").alias("l_month"),
        )
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(
                        F.lit(0).cast("decimal(18,4)")
                    )
                ).cast("double")
                / F.sum(rev).cast("double"),
                4,
            ).alias("promo_pct")
        )
    )


_Q19_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 10
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#2' AND p_size <= 20
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#3' AND p_size <= 30
       AND l_quantity >= 20 AND l_quantity <= 30)
"""


@query("complex_predicate_revenue", _Q19_ORACLE)
def complex_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue): an OR-of-ANDs predicate
    spanning both join sides. The join itself stays a plain broadcast
    equi-join on partkey; the disjunction is a post-join filter — the
    plan Catalyst picks when the residual cannot be pushed into either
    side. One scalar row out."""
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size") <= 10)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size") <= 20)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size") <= 30)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(cond)
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


_Q22_ORACLE = """
WITH cutoff AS (
  SELECT AVG(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0),
idle AS (
  SELECT c.c_mktsegment, c.c_acctbal
  FROM customer c CROSS JOIN cutoff
  WHERE c.c_acctbal > cutoff.avg_bal
    AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
FROM idle GROUP BY c_mktsegment
"""


@query("idle_rich_customers", _Q22_ORACLE)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): customers whose
    balance beats the positive-balance average but who have never
    ordered, grouped by market segment. Scalar-subquery cutoff (1-row
    broadcast cross join) + broadcast LEFT ANTI against the orders
    custkey projection — the anti join ships only the distinct custkey
    column, never order rows."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    o = _t(spark, sf_dir, "orders").select("o_custkey").distinct()
    cutoff = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            exact_sum("c_acctbal").alias("total_bal"),
        )
    )


# ===================================================================
# Round-4 wave 10 — graph-ML training data (negative sampling,
# deterministic walks) + exactly-k weighted reservoir sampling
# ===================================================================

_COPURCHASE_EDGE_CTE = """
__pr AS (SELECT l_orderkey, l_partkey FROM lineitem GROUP BY 1, 2),
__e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM __pr a JOIN __pr b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
__nodes AS (SELECT u AS node FROM __e UNION SELECT v FROM __e)
"""

_NEG_SAMPLE_ORACLE = f"""
WITH {_COPURCHASE_EDGE_CTE},
probes AS (SELECT node AS probe FROM __nodes WHERE node % 500 = 0),
cands AS (
  SELECT p.probe, n.node AS cand
  FROM probes p CROSS JOIN __nodes n WHERE n.node <> p.probe),
non_adj AS (
  SELECT probe, cand FROM cands c
  WHERE NOT EXISTS (SELECT 1 FROM __e
                    WHERE u = least(c.probe, c.cand)
                      AND v = greatest(c.probe, c.cand))),
r AS (
  SELECT probe, cand,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY probe
           ORDER BY md5('negs:' || CAST(probe AS VARCHAR) || ':'
                        || CAST(cand AS VARCHAR)) ASC, cand ASC)
         AS BIGINT) AS rnk
  FROM non_adj)
SELECT probe, cand AS negative, rnk FROM r WHERE rnk <= 5
"""


@query("graph_negative_samples", _NEG_SAMPLE_ORACLE)
def graph_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-prediction negative sampling over the part co-purchase graph
    (operators.graph.negative_samples): per probe node, the 5
    non-adjacent nodes ranked first by a salted md5 — a reproducible
    pseudo-random draw with no RNG state, so the training pairs are
    identical on any cluster and replayable by the oracle. Probe work is
    linear in |V| (broadcast probes x vertex set), the true-edge check a
    single anti-join of id pairs."""
    from etl_bigquery_pipeline_spark.operators import graph

    l = _t(spark, sf_dir, "lineitem")
    pr = scoped_cache(l.select("l_orderkey", "l_partkey").distinct())
    pairs = pr.alias("a").join(
        pr.alias("b"),
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
    )
    edges = scoped_cache(graph.undirected_edges(pairs, "pa", "pb"))
    nodes = (
        edges.select(F.col("u").alias("node"))
        .union(edges.select(F.col("v").alias("node")))
        .distinct()
    )
    probes = nodes.filter(F.col("node") % 500 == 0)
    return graph.negative_samples(edges, probes, k=5, salt="negs")


def _walks_oracle(steps: int = 3) -> str:
    parts = [
        "__adj AS (SELECT u AS src, v AS nbr FROM __e "
        "UNION ALL SELECT v AS src, u AS nbr FROM __e)",
        "w0 AS (SELECT node AS walk_id, node FROM __nodes "
        "WHERE node % 500 = 0)",
    ]
    for s in range(1, steps + 1):
        parts.append(
            f"c{s} AS (SELECT w.walk_id, a.nbr, "
            f"ROW_NUMBER() OVER (PARTITION BY w.walk_id ORDER BY "
            f"md5('walk:' || CAST(w.walk_id AS VARCHAR) || ':{s}:' "
            f"|| CAST(w.node AS VARCHAR) || ':' || CAST(a.nbr AS VARCHAR)) "
            f"ASC, a.nbr ASC) AS rn "
            f"FROM w{s-1} w JOIN __adj a ON w.node = a.src)"
        )
        parts.append(
            f"w{s} AS (SELECT walk_id, nbr AS node FROM c{s} WHERE rn = 1)"
        )
    selects = " UNION ALL ".join(
        f"SELECT walk_id, CAST({s} AS BIGINT) AS step, node FROM w{s}"
        for s in range(0, steps + 1)
    )
    return (
        f"WITH {_COPURCHASE_EDGE_CTE}, " + ", ".join(parts) + " " + selects
    )


@query("deterministic_random_walks", _walks_oracle())
def deterministic_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeepWalk/node2vec-style walk corpus over the co-purchase graph,
    made reproducible (operators.graph.deterministic_walks): each hop
    picks the neighbor minimizing a salted md5, so the walk corpus is
    identical across runs/engines and the oracle replays it with
    unrolled per-step CTEs. Each hop is one frontier-adjacency join +
    per-walk argmin — the iterative shape shared with PageRank; the
    adjacency builds once and is scope-cached across hops."""
    from etl_bigquery_pipeline_spark.operators import graph

    l = _t(spark, sf_dir, "lineitem")
    pr = scoped_cache(l.select("l_orderkey", "l_partkey").distinct())
    pairs = pr.alias("a").join(
        pr.alias("b"),
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
    )
    edges = scoped_cache(graph.undirected_edges(pairs, "pa", "pb"))
    nodes = (
        edges.select(F.col("u").alias("node"))
        .union(edges.select(F.col("v").alias("node")))
        .distinct()
    )
    starts = nodes.filter(F.col("node") % 500 == 0)
    return graph.deterministic_walks(edges, starts, steps=3, salt="walk")


_RESERVOIR_ORACLE = f"""
WITH s AS (
  SELECT doc_id, source, n_chars,
         round(-ln((({_hex8_to_int(
             "substring(md5('ares:' || CAST(doc_id AS VARCHAR)), 1, 8)"
         )}) % 100000 + 1) / 100001.0) / n_chars, 6) AS score
  FROM documents),
r AS (
  SELECT doc_id, source, score,
         CAST(ROW_NUMBER() OVER (ORDER BY score ASC, doc_id ASC) AS BIGINT)
           AS rnk
  FROM s)
SELECT doc_id, source, score, rnk FROM r WHERE rnk <= 100
"""


@query("weighted_reservoir_sample", _RESERVOIR_ORACLE)
def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY-100 weighted sample of documents, weight = n_chars
    (operators.sampling.weighted_reservoir_topk — Efraimidis-Spirakis
    A-ES keys over the deterministic md5 uniform). Fixed output size is
    the contract weighted_sample (Bernoulli) cannot give; the global
    top-k plans as TakeOrderedAndProject (per-partition top-k, merged),
    never a single-partition window. Scores rounded with id tie-break so
    ranking is identical across engines."""
    from etl_bigquery_pipeline_spark.operators import sampling

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    out = sampling.weighted_reservoir_topk(
        d, F.col("n_chars"), "doc_id", k=100, salt="ares"
    )
    return out.select("doc_id", "source", "score", "rnk")


# ===================================================================
# Round-4 wave 11 — SFT transcript assembly, duplicate-span detection,
# Gopher-rule quality gates
# ===================================================================

_TRANSCRIPT_ORACLE = """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       string_agg(event_type, ' ' ORDER BY ts, event_id) AS transcript
FROM events GROUP BY user_id
"""


@query("session_transcripts", _TRANSCRIPT_ORACLE)
def session_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-transcript assembly (the SFT-formatting step: turn an
    event/message log into one ordered text per conversation): per user,
    the time-ordered event-type sequence joined into a single string.
    Ordering inside the aggregate is made deterministic by sorting the
    collected (ts, event_id, type) structs — groupBy collect_list alone
    has NO order guarantee under retries/merges, the classic silent
    nondeterminism bug in distributed transcript builders. One shuffle
    on the conversation key; each group's sort is local and bounded by
    conversation length."""
    e = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    return (
        e.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("__ord"),
        )
        .select(
            "user_id",
            "n_events",
            F.array_join(
                F.transform(F.col("__ord"), lambda s: s["event_type"]), " "
            ).alias("transcript"),
        )
    )


# ---- duplicate n-gram spans (exact-substring dedup signal) ----

_DUP_SPAN_ORACLE = """
WITH docs AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' please subscribe to our newsletter for the'
                        || ' latest updates and offers from our team'
                        || ' delivered straight to your inbox every week'
              ELSE text END AS text
  FROM documents),
t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
  FROM docs),
sp AS (
  SELECT doc_id,
         unnest([md5(array_to_string(toks[i:i+19], ' '))
                 for i in generate_series(1, len(toks) - 19)]) AS span_h
  FROM t WHERE len(toks) >= 20),
g AS (
  SELECT span_h, COUNT(*) AS occs, COUNT(DISTINCT doc_id) AS docs
  FROM sp GROUP BY span_h),
dup AS (SELECT * FROM g WHERE docs >= 2)
SELECT CAST((SELECT COUNT(*) FROM g) AS BIGINT) AS n_spans,
       CAST((SELECT COUNT(*) FROM dup) AS BIGINT) AS n_dup_spans,
       CAST((SELECT coalesce(SUM(occs), 0) FROM dup) AS BIGINT)
         AS dup_occurrences,
       CAST((SELECT COUNT(DISTINCT sp.doc_id) FROM sp
             JOIN dup ON sp.span_h = dup.span_h) AS BIGINT)
         AS docs_with_dup_spans
"""


@query("duplicate_ngram_spans", _DUP_SPAN_ORACLE)
def duplicate_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication signal (the rolling-window
    approximation of suffix-array dedup a la 'Deduplicating Training
    Data Makes Language Models Better', public method): hash every
    rolling 20-token span, count spans occurring in >= 2 documents.
    Planted: a fixed boilerplate sentence appended to every 7th doc, so
    the cross-document span family is known. The shuffle carries only
    (span-md5, doc_id) — one row per token position, the same explode
    economy as the shingle operators; the corpus body never moves."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    boiler = (
        " please subscribe to our newsletter for the latest updates and"
        " offers from our team delivered straight to your inbox every week"
    )
    docs = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(boiler))
        ).otherwise(F.col("text")).alias("text"),
    )
    toks = docs.select(
        "doc_id", TX.tokens("text").alias("__toks")
    ).filter(F.size("__toks") >= 20)
    spans = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("__toks") - 19),
                lambda i: F.md5(F.array_join(F.slice("__toks", i, 20), " ")),
            )
        ).alias("span_h"),
    ).transform(scoped_cache)
    g = spans.groupBy("span_h").agg(
        F.count(F.lit(1)).alias("occs"),
        F.countDistinct("doc_id").alias("docs"),
    ).transform(scoped_cache)
    dup = g.filter(F.col("docs") >= 2)
    n_spans = g.agg(F.count(F.lit(1)).cast("bigint").alias("n_spans"))
    dups = dup.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup_spans"),
        F.coalesce(F.sum("occs"), F.lit(0)).cast("bigint").alias("dup_occurrences"),
    )
    affected = (
        spans.join(dup.select("span_h"), "span_h", "left_semi")
        .agg(F.countDistinct("doc_id").cast("bigint").alias("docs_with_dup_spans"))
    )
    return n_spans.crossJoin(dups).crossJoin(affected)


# ---- Gopher-style rule gate ----

_GOPHER_ORACLE = """
WITH t AS (
  SELECT source,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks
  FROM documents),
m AS (
  SELECT source, len(toks) AS n_words,
         CAST(list_sum([length(x) for x in toks]) AS DOUBLE)
           / greatest(len(toks), 1) AS mean_len,
         CAST(len(list_filter(toks, x -> regexp_matches(x, '^[A-Za-z]')))
              AS DOUBLE) / greatest(len(toks), 1) AS alpha_frac
  FROM t),
f AS (
  SELECT source,
         n_words < 30 AS fail_short,
         n_words > 10000 AS fail_long,
         mean_len < 3 OR mean_len > 12 AS fail_mean_len,
         alpha_frac < 0.8 AS fail_alpha
  FROM m)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (WHERE NOT (fail_short OR fail_long
            OR fail_mean_len OR fail_alpha)) AS BIGINT) AS pass_all,
       CAST(COUNT(*) FILTER (WHERE fail_short) AS BIGINT) AS n_fail_short,
       CAST(COUNT(*) FILTER (WHERE fail_mean_len) AS BIGINT)
         AS n_fail_mean_len,
       CAST(COUNT(*) FILTER (WHERE fail_alpha) AS BIGINT) AS n_fail_alpha
FROM f GROUP BY source
"""


@query("gopher_quality_flags", _GOPHER_ORACLE)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule gate (Rae et al. 2021, public heuristics): word
    count bounds, mean word length band, alphabetic-token fraction —
    each a pure JVM expression over one scan, aggregated to a per-source
    pass/fail dashboard. The rule-based sibling of the learned filter
    (logreg_quality_scores): at 100 TB these run first and cheaply, the
    model scores what survives."""
    d = _t(spark, sf_dir, "documents")
    toks = TX.tokens("text")
    m = d.select(
        "source",
        F.size(toks).alias("n_words"),
        (
            F.aggregate(
                F.transform(toks, lambda x: F.length(x).cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.greatest(F.size(toks), F.lit(1))
        ).alias("mean_len"),
        (
            F.size(F.filter(toks, lambda x: x.rlike("^[A-Za-z]"))).cast("double")
            / F.greatest(F.size(toks), F.lit(1))
        ).alias("alpha_frac"),
    )
    f = m.select(
        "source",
        (F.col("n_words") < 30).alias("fail_short"),
        (F.col("n_words") > 10000).alias("fail_long"),
        ((F.col("mean_len") < 3) | (F.col("mean_len") > 12)).alias("fail_mean_len"),
        (F.col("alpha_frac") < 0.8).alias("fail_alpha"),
    )
    any_fail = (
        F.col("fail_short")
        | F.col("fail_long")
        | F.col("fail_mean_len")
        | F.col("fail_alpha")
    )
    return f.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.count_if(~any_fail).cast("bigint").alias("pass_all"),
        F.count_if(F.col("fail_short")).cast("bigint").alias("n_fail_short"),
        F.count_if(F.col("fail_mean_len")).cast("bigint").alias("n_fail_mean_len"),
        F.count_if(F.col("fail_alpha")).cast("bigint").alias("n_fail_alpha"),
    )


# ===================================================================
# Round-4 wave 12 — entity resolution closure, rollup-cascade parity,
# k-anonymity, incremental join-view maintenance
# ===================================================================

_ENTITY_ORACLE = """
WITH RECURSIVE n AS (SELECT DISTINCT p_name FROM part),
t AS (SELECT p_name, split_part(p_name, ' ', 1) AS blk FROM n),
p AS (
  SELECT a.p_name AS name_a, b.p_name AS name_b
  FROM t a JOIN t b ON a.blk = b.blk AND a.p_name < b.p_name
  WHERE levenshtein(a.p_name, b.p_name) <= 2),
edges AS (
  SELECT name_a AS src, name_b AS dst FROM p
  UNION SELECT name_b, name_a FROM p),
reach(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.node)
SELECT node AS p_name, MIN(label) AS canonical_name
FROM reach GROUP BY node
"""


@query("entity_resolution_clusters", _ENTITY_ORACLE)
def entity_resolution_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution (record linkage): blocked Levenshtein
    match pairs (the fuzzy_name_pairs machinery) closed transitively into
    entities via pointer-doubled min-label propagation
    (graph.connected_components — log-diameter rounds of id/label
    equi-joins), each name mapped to its cluster's lexicographic-minimum
    canonical. The oracle closes the same pairs with a recursive CTE.
    Output covers names that matched at least one other name; singletons
    are already canonical by definition."""
    from etl_bigquery_pipeline_spark.operators import graph

    p = _t(spark, sf_dir, "part")
    names = p.select("p_name").distinct()
    t = names.select(
        "p_name", F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("blk")
    )
    a, b = t.alias("a"), t.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .filter(F.levenshtein(F.col("a.p_name"), F.col("b.p_name")) <= 2)
        .select(F.col("a.p_name").alias("u"), F.col("b.p_name").alias("v"))
    )
    return graph.connected_components(pairs).select(
        F.col("node").alias("p_name"),
        F.col("component_id").alias("canonical_name"),
    )


_CASCADE_ORACLE = """
SELECT CAST(date_trunc('month', ts) AS DATE) AS month, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS value_sum,
       round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
             / COUNT(*), 4) AS value_avg
FROM events GROUP BY 1, 2
"""


@query("rollup_cascade_parity", _CASCADE_ORACLE)
def rollup_cascade_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-routing cascade (plans/aggregates): the MONTHLY answer
    computed FROM the persisted daily rollup — sums of sums, min of
    mins, avg finalized from (sum, count), never averaged averages —
    while the oracle computes the same months directly from raw events.
    A green hash PROVES the cascade is lossless: additive measures in
    exact decimal re-merge associatively, so routing dashboards to the
    rollup instead of the raw fact table costs nothing in correctness
    (and ~30x less scan at this data's fan-in)."""
    from etl_bigquery_pipeline_spark.plans import aggregates

    e = _t(spark, sf_dir, "events")
    daily = aggregates.build_daily_rollup(e)
    monthly = aggregates.rollup_to_monthly(daily)
    return monthly.select(
        "month",
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        F.col("value_sum").cast("double").alias("value_sum"),
        "value_avg",
    )


_KANON_ORACLE = """
WITH g AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS grp
  FROM customer GROUP BY 1, 2)
SELECT CAST(MIN(grp) AS BIGINT) AS k_min,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(COUNT(*) FILTER (WHERE grp < 5) AS BIGINT) AS groups_below_5,
       CAST(coalesce(SUM(grp) FILTER (WHERE grp < 5), 0) AS BIGINT)
         AS rows_at_risk
FROM g
"""


@query("k_anonymity_check", _KANON_ORACLE)
def k_anonymity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy DQ: k-anonymity of the (nation, market-segment)
    quasi-identifier — the minimum equivalence-class size, and how many
    rows sit in classes below k=5 (re-identifiable under linkage
    attacks). One groupBy + one scalar aggregate; the release gate a
    privacy review runs before sharing a slice."""
    c = _t(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("grp")
    )
    return g.agg(
        F.min("grp").cast("bigint").alias("k_min"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.count_if(F.col("grp") < 5).cast("bigint").alias("groups_below_5"),
        F.coalesce(F.sum(F.when(F.col("grp") < 5, F.col("grp"))), F.lit(0))
        .cast("bigint")
        .alias("rows_at_risk"),
    )


@query(
    "incremental_join_view_parity",
    "SELECT true AS counts_match, true AS revenue_match",
)
def incremental_join_view_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a JOIN view (the delta algebra:
    dV = dA |><| B_old + A_old |><| dB + dA |><| dB), proven against full
    recompute. The orders-customer join view starts from a 90% snapshot
    of both sides; the held-out 10% arrives as deltas and only
    delta-sized joins run — at 100 TB this is the difference between
    touching the day's ingest and re-joining two full tables. The gate
    checks row count AND exact-decimal revenue parity with the
    from-scratch join; one boolean row reaches the driver."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o_old = o.filter(F.col("o_orderkey") % 10 != 0).transform(scoped_cache)
    do = o.filter(F.col("o_orderkey") % 10 == 0)
    c_old = c.filter(F.col("c_custkey") % 10 != 0).transform(scoped_cache)
    dc = c.filter(F.col("c_custkey") % 10 == 0)
    key = o["o_custkey"] == c["c_custkey"]

    def j(left, right):
        return left.join(
            right, left["o_custkey"] == right["c_custkey"]
        ).select("o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment")

    v_old = j(o_old, c_old)
    dv = j(do, c_old).unionByName(j(o_old, dc)).unionByName(j(do, dc))
    v_incr = v_old.unionByName(dv)
    v_full = j(o, c)

    def summarize(df):
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("s"),
        ).first()

    a, b = summarize(v_incr), summarize(v_full)
    return spark.createDataFrame(
        [(bool(a["n"] == b["n"]), bool(a["s"] == b["s"]))],
        "counts_match boolean, revenue_match boolean",
    )


# ===================================================================
# Round-4 wave 14 — classic relational patterns: gaps & islands,
# streaks, conditional window resets, robust (MAD) anomalies, rank ties
# ===================================================================

_GAPS_ORACLE = """
WITH k AS (SELECT DISTINCT o_orderkey AS k FROM orders),
r AS (SELECT k, k - ROW_NUMBER() OVER (ORDER BY k) AS grp FROM k),
isl AS (
  SELECT MIN(k) AS island_start, MAX(k) AS island_end,
         CAST(COUNT(*) AS BIGINT) AS island_len
  FROM r GROUP BY grp)
SELECT island_start, island_end, island_len FROM isl
ORDER BY island_start LIMIT 20
"""


@query("orderkey_gap_islands", _GAPS_ORACLE)
def orderkey_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over the orderkey sequence (the classic
    key - row_number() grouping trick): contiguous id runs collapse to
    one group key, so islands fall out of a single groupBy. The global
    row_number runs over the DISTINCT KEY projection — at 100 TB the
    distinct keys are still orders of magnitude smaller than the fact
    rows, and the ordered pass is a range sort, not a driver collect.
    First 20 islands by start — the audit view that spots id-space holes
    left by failed ingest batches. The global numbering uses the
    range-partition + offsets machinery (windows.with_global_row_number),
    never a single-partition window."""
    o = _t(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("k")).distinct()
    r, _total = windows.with_global_row_number(o, ["k"], rn_col="__rn")
    r = r.withColumn("grp", F.col("k") - F.col("__rn"))
    return (
        r.groupBy("grp")
        .agg(
            F.min("k").alias("island_start"),
            F.max("k").alias("island_end"),
            F.count(F.lit(1)).cast("bigint").alias("island_len"),
        )
        .drop("grp")
        .orderBy("island_start")
        .limit(20)
    )


_STREAK_ORACLE = """
WITH d AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
r AS (
  SELECT user_id, day,
         day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                    AS INT) AS grp
  FROM d),
s AS (
  SELECT user_id, MIN(day) AS streak_start, CAST(COUNT(*) AS BIGINT) AS len
  FROM r GROUP BY user_id, grp),
b AS (
  SELECT user_id, streak_start, len,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY len DESC, streak_start ASC) AS rn
  FROM s)
SELECT user_id, streak_start, len AS streak_days
FROM b WHERE rn = 1 AND len >= 3
"""


@query("activity_streaks", _STREAK_ORACLE)
def activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user (engagement
    metric): the date-minus-row_number constant marks each run of
    consecutive days, a per-user groupBy measures the runs, a window
    keeps the longest. Every window partitions by user — even shuffle,
    no global ordering anywhere. Users with streaks >= 3 days."""
    e = _t(spark, sf_dir, "events")
    d = e.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    wu = Window.partitionBy("user_id").orderBy("day")
    r = d.withColumn(
        "grp",
        F.date_sub(F.col("day"), F.row_number().over(wu)),
    )
    s = r.groupBy("user_id", "grp").agg(
        F.min("day").alias("streak_start"),
        F.count(F.lit(1)).cast("bigint").alias("len"),
    )
    wb = Window.partitionBy("user_id").orderBy(
        F.col("len").desc(), F.col("streak_start").asc()
    )
    return (
        s.withColumn("rn", F.row_number().over(wb))
        .filter((F.col("rn") == 1) & (F.col("len") >= 3))
        .select("user_id", "streak_start", F.col("len").alias("streak_days"))
    )


_SINCE_PURCHASE_ORACLE = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         COUNT(*) FILTER (WHERE event_type = 'purchase')
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS epoch
  FROM events),
w AS (
  SELECT user_id, event_id, event_type,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id, epoch
                                 ORDER BY ts, event_id) - 1 AS BIGINT)
           AS events_since_purchase,
         CASE WHEN event_type = 'purchase' THEN 0
              ELSE NULL END AS is_reset
  FROM e
  WHERE epoch > 0 AND event_type <> 'purchase')
SELECT user_id, event_id, event_type, events_since_purchase
FROM w
"""


@query("events_since_last_purchase", _SINCE_PURCHASE_ORACLE)
def events_since_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional window reset (counter that restarts at each marker
    event): a running count of purchases partitions each user's timeline
    into epochs, then a row_number within (user, epoch) counts events
    since the last purchase — the two-window composition that expresses
    'resettable' state without any stateful UDF. Post-purchase events
    only; both windows shuffle by user, never globally."""
    e = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.sum(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    ).over(wu)
    we = Window.partitionBy("user_id", "epoch").orderBy("ts", "event_id")
    return (
        e.withColumn("epoch", epoch)
        .filter((F.col("epoch") > 0) & (F.col("event_type") != "purchase"))
        .withColumn(
            "events_since_purchase",
            (F.row_number().over(we) - 1).cast("bigint"),
        )
        .select("user_id", "event_id", "event_type", "events_since_purchase")
    )


_MAD_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
  FROM orders GROUP BY 1),
med AS (SELECT quantile_cont(rev, 0.5) AS m FROM daily),
dev AS (
  SELECT d.day, d.rev, abs(d.rev - med.m) AS ad, med.m
  FROM daily d CROSS JOIN med),
mad AS (SELECT quantile_cont(ad, 0.5) AS mad FROM dev)
SELECT dev.day, round(dev.rev, 4) AS rev,
       round((dev.rev - dev.m) / (1.4826 * mad.mad), 4) AS robust_z
FROM dev CROSS JOIN mad
WHERE abs((dev.rev - dev.m) / (1.4826 * mad.mad)) > 2.5
"""


@query("mad_anomalies", _MAD_ORACLE)
def mad_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection via median absolute deviation — unlike
    the stddev z-score (daily_revenue_anomalies), the MAD denominator is
    immune to the very outliers being hunted, so one extreme day can't
    mask others. Both medians are exact interpolated percentiles over
    the DAILY aggregate (calendar-bounded rows); each scalar broadcasts
    back via the sanctioned 1-row cross join."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("rev")
    ).transform(scoped_cache)
    med = daily.agg(F.expr("percentile(rev, 0.5)").alias("m"))
    dev = daily.crossJoin(F.broadcast(med)).withColumn(
        "ad", F.abs(F.col("rev") - F.col("m"))
    ).transform(scoped_cache)
    mad = dev.agg(F.expr("percentile(ad, 0.5)").alias("mad"))
    z = F.col("rev") - F.col("m")
    return (
        dev.crossJoin(F.broadcast(mad))
        .withColumn("robust_z", F.round(z / (1.4826 * F.col("mad")), 4))
        .filter(F.abs(F.col("robust_z")) > 2.5)
        .select("day", F.round("rev", 4).alias("rev"), "robust_z")
    )


_TIES_ORACLE = """
WITH r AS (
  SELECT p_brand, p_partkey, p_retailprice,
         CAST(RANK() OVER (PARTITION BY p_brand
                           ORDER BY round(p_retailprice, 2) DESC) AS BIGINT)
           AS price_rank,
         CAST(DENSE_RANK() OVER (PARTITION BY p_brand
                           ORDER BY round(p_retailprice, 2) DESC) AS BIGINT)
           AS dense_price_rank
  FROM part)
SELECT p_brand, p_partkey, round(p_retailprice, 2) AS p_retailprice,
       price_rank, dense_price_rank
FROM r WHERE dense_price_rank <= 2
"""


@query("brand_price_ties_rank", _TIES_ORACLE)
def brand_price_ties_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK vs DENSE_RANK with ties INCLUDED (window_rank_parts uses
    row_number, which arbitrarily truncates ties): top-2 price LEVELS
    per brand keep every part at those levels, and the gap between
    rank and dense_rank exposes tie groups. Prices compared at 2
    decimals so tie groups are well-defined cross-engine."""
    p = _t(spark, sf_dir, "part")
    price2 = F.round("p_retailprice", 2)
    w = Window.partitionBy("p_brand").orderBy(price2.desc())
    return (
        p.select(
            "p_brand",
            "p_partkey",
            price2.alias("p_retailprice"),
            F.rank().over(w).cast("bigint").alias("price_rank"),
            F.dense_rank().over(w).cast("bigint").alias("dense_price_rank"),
        )
        .filter(F.col("dense_price_rank") <= 2)
    )


# ===================================================================
# Round-4 wave 15 — VARIANT JSON handling, null-safe join semantics,
# native session_window batch aggregation
# ===================================================================

_VARIANT_ORACLE = """
WITH j AS (
  SELECT event_id,
         '{"base":' || props || ',"meta":{"type":"' || event_type
         || '","depth":' || CAST(event_id % 5 AS VARCHAR)
         || '},"tags":["t' || CAST(event_id % 3 AS VARCHAR) || '","x"]}'
           AS doc
  FROM events)
SELECT event_id,
       CAST(json_extract(doc, '$.base.k') AS BIGINT) AS k,
       CAST(json_extract_string(doc, '$.meta.type') AS VARCHAR) AS meta_type,
       CAST(json_extract(doc, '$.meta.depth') AS BIGINT) AS depth,
       CAST(json_extract_string(doc, '$.tags[0]') AS VARCHAR) AS first_tag
FROM j
"""


@query("variant_json_extraction", _VARIANT_ORACLE)
def variant_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured handling through Spark 4's VARIANT type: nested
    JSON (synthesized in-query around the real props column) is parsed
    ONCE with parse_json into the binary variant encoding, then fields
    at different depths and an array element are extracted with typed
    variant_get paths — the shredded-access pattern that beats repeated
    get_json_object string re-parsing (one parse, many cheap typed
    reads). The oracle replays with DuckDB's JSON path functions."""
    e = _t(spark, sf_dir, "events")
    doc = F.concat(
        F.lit('{"base":'),
        F.col("props"),
        F.lit(',"meta":{"type":"'),
        F.col("event_type"),
        F.lit('","depth":'),
        (F.col("event_id") % 5).cast("string"),
        F.lit('},"tags":["t'),
        (F.col("event_id") % 3).cast("string"),
        F.lit('","x"]}'),
    )
    v = e.select("event_id", F.parse_json(doc).alias("v"))
    return v.select(
        "event_id",
        F.try_variant_get(F.col("v"), "$.base.k", "bigint").alias("k"),
        F.try_variant_get(F.col("v"), "$.meta.type", "string").alias("meta_type"),
        F.try_variant_get(F.col("v"), "$.meta.depth", "bigint").alias("depth"),
        F.try_variant_get(F.col("v"), "$.tags[0]", "string").alias("first_tag"),
    )


_NULLSAFE_ORACLE = """
WITH o AS (
  SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END AS k
  FROM orders),
c AS (
  SELECT CASE WHEN c_custkey % 89 = 0 THEN NULL ELSE c_custkey END AS k
  FROM customer)
SELECT
  CAST((SELECT COUNT(*) FROM o JOIN c ON o.k = c.k) AS BIGINT)
    AS n_equality,
  CAST((SELECT COUNT(*) FROM o JOIN c ON o.k IS NOT DISTINCT FROM c.k)
       AS BIGINT) AS n_null_safe,
  CAST((SELECT COUNT(*) FROM o WHERE k IS NULL) AS BIGINT) AS null_orders,
  CAST((SELECT COUNT(*) FROM c WHERE k IS NULL) AS BIGINT) AS null_customers
"""


@query("null_safe_join_counts", _NULLSAFE_ORACLE)
def null_safe_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL join-key semantics, the classic silent-data-loss pitfall:
    planted NULL keys on both sides, joined with plain equality (NULLs
    never match — rows vanish) vs eqNullSafe / IS NOT DISTINCT FROM
    (NULL matches NULL — the n_null_safe surplus is exactly
    null_orders x null_customers). Both joins remain hash joins —
    eqNullSafe is still an equi-predicate to Catalyst, NOT a
    nested-loop degradation. One summary row."""
    o = _t(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderkey") % 97 == 0, F.lit(None).cast("bigint"))
        .otherwise(F.col("o_custkey"))
        .alias("k")
    ).transform(scoped_cache)
    c = _t(spark, sf_dir, "customer").select(
        F.when(F.col("c_custkey") % 89 == 0, F.lit(None).cast("bigint"))
        .otherwise(F.col("c_custkey"))
        .alias("k")
    ).transform(scoped_cache)
    oc, cc = o.alias("o"), c.alias("c")
    n_eq = oc.join(cc, F.col("o.k") == F.col("c.k")).count()
    n_ns = oc.join(cc, F.col("o.k").eqNullSafe(F.col("c.k"))).count()
    n_no = o.filter(F.col("k").isNull()).count()
    n_nc = c.filter(F.col("k").isNull()).count()
    return spark.createDataFrame(
        [(n_eq, n_ns, n_no, n_nc)],
        "n_equality bigint, n_null_safe bigint, "
        "null_orders bigint, null_customers bigint",
    )


_SESSION_WINDOW_ORACLE = """
WITH e AS (
  SELECT user_id, ts, event_id, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events),
f AS (
  SELECT *, CASE WHEN prev IS NULL OR ts - prev > INTERVAL '30 minutes'
                 THEN 1 ELSE 0 END AS brk
  FROM e),
g AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS seq
  FROM f)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL '30 minutes' AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS value_sum
FROM g GROUP BY user_id, seq
"""


@query("session_window_batch", _SESSION_WINDOW_ORACLE)
def session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE session_window aggregation run in batch mode — the
    same merging-session operator the streaming path uses, verified
    against the relational gaps-and-islands formulation (sessionization
    implements it manually; a green hash proves the two formulations
    agree on every session boundary). Session end is
    last-event + gap, per Spark's session_window contract."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "value_sum",
        )
    )


# ===================================================================
# Round-4 wave 16 — imputation repair, target encoding, sentence
# segmentation, 2D histogram binning
# ===================================================================

_IMPUTE_ORACLE = """
WITH c AS (
  SELECT c_custkey, c_mktsegment,
         CASE WHEN c_custkey % 41 = 0 THEN NULL ELSE c_acctbal END AS bal
  FROM customer),
med AS (
  SELECT c_mktsegment, quantile_cont(bal, 0.5) AS seg_median
  FROM c WHERE bal IS NOT NULL GROUP BY c_mktsegment),
r AS (
  SELECT c.c_mktsegment,
         coalesce(c.bal, m.seg_median) AS filled,
         c.bal IS NULL AS was_imputed
  FROM c JOIN med m ON c.c_mktsegment = m.c_mktsegment)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) FILTER (WHERE was_imputed) AS BIGINT) AS n_imputed,
       round(AVG(filled), 4) AS avg_bal,
       round(MIN(filled), 4) AS min_bal
FROM r GROUP BY c_mktsegment
"""


@query("imputed_acctbal_stats", _IMPUTE_ORACLE)
def imputed_acctbal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint repair by group-median imputation (the DQ-remediation
    step after quarantine flags nulls): NULLs planted on modular
    custkeys, each filled with its market segment's exact interpolated
    median of the surviving values. The medians are one per segment —
    broadcast join back; imputation itself is a stateless coalesce, so
    the repair pass costs one scan + one tiny aggregate at any scale."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.when(F.col("c_custkey") % 41 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    # grouped exact median on the histogram plan — percentile()'s
    # per-task value buffer over an unaggregated base table is the r8
    # sf10 OOM class (bit-identical interpolated values either way)
    med = _hist_exact_percentiles(
        c.select("c_mktsegment", "bal"), "c_mktsegment", "bal",
        [0.5], ["seg_median"],
    )
    r = c.join(F.broadcast(med), "c_mktsegment").select(
        "c_mktsegment",
        F.coalesce("bal", "seg_median").alias("filled"),
        F.col("bal").isNull().alias("was_imputed"),
    )
    return r.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count_if("was_imputed").cast("bigint").alias("n_imputed"),
        F.round(F.avg("filled"), 4).alias("avg_bal"),
        F.round(F.min("filled"), 4).alias("min_bal"),
    )


_TARGET_ENC_ORACLE = """
WITH g AS (
  SELECT c_mktsegment AS seg,
         COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS s
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1),
prior AS (SELECT SUM(s) / SUM(n) AS mu FROM g)
SELECT g.seg,
       CAST(g.n AS BIGINT) AS n_orders,
       round(g.s / g.n, 4) AS raw_mean,
       round((g.s + 20.0 * prior.mu) / (g.n + 20.0), 4) AS encoded
FROM g CROSS JOIN prior
"""


@query("target_encoded_segments", _TARGET_ENC_ORACLE)
def target_encoded_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target encoding (the feature-engineering workhorse for
    high-cardinality categoricals): per-segment mean order value shrunk
    toward the global prior with pseudo-count k=20 — rare categories
    collapse to the prior instead of memorizing noise. Everything runs
    on the per-CATEGORY aggregate; the prior is the sanctioned 1-row
    broadcast. Encodings are what a downstream model joins back
    broadcast-style onto the fact table."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    g = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("s"),
        )
    ).transform(scoped_cache)
    prior = g.agg((F.sum("s") / F.sum("n")).alias("mu"))
    return g.crossJoin(F.broadcast(prior)).select(
        "seg",
        F.col("n").cast("bigint").alias("n_orders"),
        F.round(F.col("s") / F.col("n"), 4).alias("raw_mean"),
        F.round(
            (F.col("s") + 20.0 * F.col("mu")) / (F.col("n") + 20.0), 4
        ).alias("encoded"),
    )


_SENTENCE_ORACLE = """
WITH s AS (
  SELECT doc_id,
         list_filter([trim(x) for x in
                      string_split_regex(text, '[.!?]+')],
                     x -> x <> '') AS sents
  FROM documents),
m AS (
  SELECT doc_id, len(sents) AS n_sentences,
         [len(list_filter(regexp_split_to_array(x, '\\s+'), t -> t <> ''))
          for x in sents] AS lens
  FROM s)
SELECT doc_id, CAST(n_sentences AS BIGINT) AS n_sentences,
       CAST(coalesce(list_max(lens), 0) AS BIGINT) AS max_sentence_tokens,
       round(CAST(coalesce(list_sum(lens), 0) AS DOUBLE)
             / greatest(n_sentences, 1), 4) AS avg_sentence_tokens
FROM m
"""


@query("sentence_stats", _SENTENCE_ORACLE)
def sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation stats (the pre-chunking granularity for RAG
    and the basis of readability scores): regex split on terminal
    punctuation, per-document sentence count and token-length profile —
    all array expressions inside one projection, zero shuffle before
    the (row-per-doc) output."""
    d = _t(spark, sf_dir, "documents")
    sents = F.filter(
        F.transform(F.split("text", r"[.!?]+"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )
    lens = F.transform(
        F.col("__sents"), lambda x: F.size(TX.tokens(x))
    )
    return (
        d.select("doc_id", sents.alias("__sents"))
        .select(
            "doc_id",
            F.size("__sents").cast("bigint").alias("n_sentences"),
            lens.alias("__lens"),
        )
        .select(
            "doc_id",
            "n_sentences",
            F.coalesce(F.array_max("__lens"), F.lit(0))
            .cast("bigint")
            .alias("max_sentence_tokens"),
            F.round(
                F.coalesce(
                    F.aggregate(
                        "__lens", F.lit(0.0), lambda a, x: a + x.cast("double")
                    ),
                    F.lit(0.0),
                )
                / F.greatest(F.col("n_sentences"), F.lit(1)),
                4,
            ).alias("avg_sentence_tokens"),
        )
    )


_HEATMAP_ORACLE = """
SELECT CAST(least(floor(l_quantity / 10), 4) AS BIGINT) AS qty_bin,
       CAST(least(floor(l_extendedprice / 20000), 4) AS BIGINT) AS price_bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
         AS price_total
FROM lineitem
GROUP BY 1, 2
"""


@query("price_qty_heatmap", _HEATMAP_ORACLE)
def price_qty_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2D equi-width binning (the heatmap/contingency grid behind every
    density plot): quantity x price bins with top bins clamped, one
    groupBy over at most 25 cells — the map-side partial aggregation
    collapses the fact table to the grid before any shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.least(F.floor(F.col("l_quantity") / 10), F.lit(4))
            .cast("bigint")
            .alias("qty_bin"),
            F.least(F.floor(F.col("l_extendedprice") / 20000), F.lit(4))
            .cast("bigint")
            .alias("price_bin"),
            "l_extendedprice",
        )
        .groupBy("qty_bin", "price_bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            exact_sum("l_extendedprice").alias("price_total"),
        )
    )


# ===================================================================
# Round-4 wave 17 — Python UDAF surface (grouped-agg pandas_udf),
# winsorized robust stats
# ===================================================================

_GEOMEAN_ORACLE = """
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       round(exp(AVG(ln(p_retailprice))), 6) AS geomean_price
FROM part WHERE p_retailprice > 0
GROUP BY p_brand
"""


@query("geomean_price_by_brand", _GEOMEAN_ORACLE)
def geomean_price_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Python UDAF surface: a GROUPED_AGG pandas_udf (series ->
    scalar per group, Arrow-batched — Spark's only Python aggregate
    shape) computing the geometric mean per brand, hash-matched against
    the SQL identity exp(avg(ln(x))). Proves the UDAF contract is wired
    correctly (partial batches stream into one scalar per group) while
    the JVM replay pins its arithmetic. In production the JVM expression
    wins — this exists for aggregates that genuinely need Python
    (model-based scoring folded into an aggregation)."""
    from etl_bigquery_pipeline_spark.functions.pandas_udfs import geomean_udf

    p = _t(spark, sf_dir, "part").filter(F.col("p_retailprice") > 0)
    # Spark disallows mixing a grouped-agg pandas UDF with JVM aggregates
    # in one agg (INVALID_PANDAS_UDF_PLACEMENT) — the count comes from a
    # sibling aggregate joined back (broadcast; per-brand rows are tiny)
    gm = p.groupBy("p_brand").agg(
        geomean_udf(F.col("p_retailprice")).alias("geomean_price")
    )
    n = p.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts")
    )
    return gm.join(F.broadcast(n), "p_brand").select(
        "p_brand", "n_parts", "geomean_price"
    )


_WINSOR_ORACLE = """
WITH b AS (
  SELECT quantile_cont(c_acctbal, 0.05) AS lo,
         quantile_cont(c_acctbal, 0.95) AS hi
  FROM customer),
w AS (
  SELECT c_mktsegment,
         least(greatest(c_acctbal, b.lo), b.hi) AS wv,
         CAST(c_acctbal < b.lo OR c_acctbal > b.hi AS INT) AS clamped
  FROM customer CROSS JOIN b)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(clamped) AS BIGINT) AS n_clamped,
       round(AVG(wv), 4) AS winsorized_mean,
       round(stddev_samp(wv), 4) AS winsorized_std
FROM w GROUP BY c_mktsegment
"""


@query("winsorized_price_stats", _WINSOR_ORACLE)
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized moments (the robust-stats treatment when you must keep
    every row, unlike the trimmed mean which drops the tails): balances
    clamped to the exact [p5, p95] interpolated percentiles, then
    ordinary mean/stddev per segment. The two cutoffs are one scalar row
    broadcast back (computed on the histogram plan — percentile()'s
    per-task value buffer over an unaggregated base table is the r8
    sf10 OOM class); everything else is a scan + segment groupBy."""
    c = _t(spark, sf_dir, "customer")
    b = _hist_exact_percentiles(
        c, None, "c_acctbal", [0.05, 0.95], ["lo", "hi"]
    )
    w = c.crossJoin(F.broadcast(b)).select(
        "c_mktsegment",
        F.least(F.greatest("c_acctbal", F.col("lo")), F.col("hi")).alias("wv"),
        ((F.col("c_acctbal") < F.col("lo")) | (F.col("c_acctbal") > F.col("hi")))
        .cast("int")
        .alias("clamped"),
    )
    return w.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("clamped").cast("bigint").alias("n_clamped"),
        F.round(F.avg("wv"), 4).alias("winsorized_mean"),
        F.round(F.stddev_samp("wv"), 4).alias("winsorized_std"),
    )


# ===================================================================
# Round-4 wave 18 — argmax builtins, bitmap distinct, try_ arithmetic,
# exact grouped percentiles
# ===================================================================

_LATEST_ORDER_ORACLE = """
WITH r AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders)
SELECT o_custkey, o_orderkey AS latest_orderkey,
       o_orderdate AS latest_orderdate,
       round(o_totalprice, 2) AS latest_totalprice
FROM r WHERE rn = 1
"""


@query("latest_order_by_customer", _LATEST_ORDER_ORACLE)
def latest_order_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group argmax WITHOUT a window: max_by carries companion
    columns to the max of an ordering expression inside one hash
    aggregate — one shuffle of partial (key, best-so-far) states versus
    the window form's full sort of every row. Ties broken by orderkey so
    the argmax is a total order (max_by alone is nondeterministic under
    ties — the struct trick pins it)."""
    o = _t(spark, sf_dir, "orders")
    best = F.struct(F.col("o_orderdate"), F.col("o_orderkey"))
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", best).alias("latest_orderkey"),
        F.max("o_orderdate").alias("latest_orderdate"),
        F.round(F.max_by("o_totalprice", best), 2).alias("latest_totalprice"),
    )


_BITMAP_ORACLE = """
SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS bitmap_distinct,
       true AS parity
FROM orders
"""


@query("bitmap_distinct_parity", _BITMAP_ORACLE)
def bitmap_distinct_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via bitmap aggregation (the
    Doris/ClickHouse bitmap technique, built into Spark 3.5+): keys
    bucket by bitmap_bucket_number, each bucket ORs its bit positions
    into a fixed-size bitmap (bitmap_construct_agg — a map-side-combinable
    binary state), and summing bitmap_count over buckets gives the exact
    distinct count with NO count-distinct Expand. For dense integer keys
    the shuffle is one 4KB bitmap per bucket instead of one row per
    distinct value. Parity against plain COUNT(DISTINCT) is the gate."""
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    bm = (
        o.groupBy(F.bitmap_bucket_number(F.col("o_custkey")).alias("b"))
        .agg(
            F.bitmap_construct_agg(
                F.bitmap_bit_position(F.col("o_custkey"))
            ).alias("bits")
        )
        .agg(F.sum(F.bitmap_count("bits")).cast("bigint").alias("bitmap_distinct"))
    )
    exact = o.agg(
        F.countDistinct("o_custkey").cast("bigint").alias("exact_distinct")
    )
    return exact.crossJoin(F.broadcast(bm)).select(
        "exact_distinct",
        "bitmap_distinct",
        (F.col("exact_distinct") == F.col("bitmap_distinct")).alias("parity"),
    )


_TRY_ARITH_ORACLE = """
SELECT CAST(COUNT(*) FILTER (
         WHERE o_orderkey * 94906265847 > 9223372036854775807)
       AS BIGINT) AS n_would_overflow,
       CAST(COUNT(*) FILTER (WHERE o_orderkey % 3 = 0) AS BIGINT)
         AS n_div_by_zero,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM orders
"""


@query("try_arithmetic_audit", _TRY_ARITH_ORACLE)
def try_arithmetic_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overflow/zero-division-safe arithmetic (the try_ function family):
    try_multiply NULLs where bigint would overflow instead of wrapping
    or raising, try_divide NULLs division by zero — counted against the
    oracle's exact hugeint arithmetic. The audit shape a pipeline runs
    before enabling ANSI mode on untrusted numeric columns."""
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.count_if(
            F.try_multiply(F.col("o_orderkey"), F.lit(94906265847)).isNull()
        )
        .cast("bigint")
        .alias("n_would_overflow"),
        F.count_if(
            F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") % 3).isNull()
        )
        .cast("bigint")
        .alias("n_div_by_zero"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )


_QUARTILE_ORACLE = """
SELECT c_mktsegment,
       round(quantile_cont(c_acctbal, 0.25), 4) AS p25,
       round(quantile_cont(c_acctbal, 0.50), 4) AS p50,
       round(quantile_cont(c_acctbal, 0.75), 4) AS p75,
       round(quantile_cont(c_acctbal, 0.75)
             - quantile_cont(c_acctbal, 0.25), 4) AS iqr
FROM customer GROUP BY c_mktsegment
"""


@query("acctbal_quartiles_by_segment", _QUARTILE_ORACLE)
def acctbal_quartiles_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated quartiles PER GROUP (the grouped complement of
    percentile_lineitem's global form and the exact sibling of
    grouped_approx_percentile_gate), on the histogram plan — all three
    cut points come out of ONE grouped value-frequency histogram, with
    state bounded by distinct values rather than percentile()'s
    per-task value map over the raw rows (the r8 sf10 OOM class; this
    is the identical plan shape over customer instead of lineitem); the
    IQR falls out as a projection. At 100 TB you reach for
    approx_percentile — the gate query quantifies what that costs."""
    c = _t(spark, sf_dir, "customer")
    g = _hist_exact_percentiles(
        c, "c_mktsegment", "c_acctbal", [0.25, 0.50, 0.75],
        ["q1", "q2", "q3"],
    )
    return g.select(
        "c_mktsegment",
        F.round("q1", 4).alias("p25"),
        F.round("q2", 4).alias("p50"),
        F.round("q3", 4).alias("p75"),
        F.round(F.col("q3") - F.col("q1"), 4).alias("iqr"),
    )


# ===================================================================
# Round-4 wave 20 — mergeable-sketch distinct maintenance, feature
# standardization, curriculum ordering
# ===================================================================


@query(
    "hll_incremental_distinct_gate",
    "SELECT true AS merge_matches_whole, true AS estimate_within_5pct",
)
def hll_incremental_distinct_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct maintenance (Apache DataSketches HLL,
    built into Spark 3.5+): the property that makes approx-distinct
    INCREMENTAL at 100 TB — sketch today's batch, union with the stored
    corpus sketch, never rescan history. Gate 1: the union of two
    disjoint batch sketches estimates within 1% of one whole-table
    sketch (unions are lossless on the retained registers, but
    sparse-to-dense mode promotion means the merged estimate need not
    be bit-identical — the gate pins the practical contract). Gate 2:
    the merged estimate lands within 5% of the exact distinct count.
    Sketches are bytes — persistable in any table — and the whole check
    ships two booleans to the driver."""
    o = _t(spark, sf_dir, "orders").select("o_custkey").transform(scoped_cache)
    b1 = o.filter(F.col("o_custkey") % 2 == 0)
    b2 = o.filter(F.col("o_custkey") % 2 != 0)
    s1 = b1.agg(F.hll_sketch_agg("o_custkey").alias("sk"))
    s2 = b2.agg(F.hll_sketch_agg("o_custkey").alias("sk"))
    merged = (
        s1.unionAll(s2)
        .agg(F.hll_union_agg("sk").alias("sk"))
        .select(F.hll_sketch_estimate("sk").alias("est"))
    )
    whole = o.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("est")
    )
    exact = o.agg(F.countDistinct("o_custkey").alias("n"))
    m, w, n = merged.first()["est"], whole.first()["est"], exact.first()["n"]
    return spark.createDataFrame(
        [(bool(abs(m - w) <= 0.01 * max(w, 1)), bool(abs(m - n) <= 0.05 * n))],
        "merge_matches_whole boolean, estimate_within_5pct boolean",
    )


_STANDARDIZE_ORACLE = f"""
WITH s AS (
  SELECT i AS dim,
         avg(CAST(embedding[i] AS DOUBLE)) AS mu,
         stddev_samp(CAST(embedding[i] AS DOUBLE)) AS sd
  FROM embeddings, generate_series(1, 5) AS g(i)
  GROUP BY i),
z AS (
  SELECT s.dim,
         (CAST(e.embedding[s.dim] AS DOUBLE) - s.mu) / s.sd AS zv
  FROM embeddings e CROSS JOIN s)
SELECT CAST(dim AS BIGINT) AS dim,
       round(avg(zv), 6) + 0.0 AS scaled_mean,
       round(stddev_samp(zv), 6) + 0.0 AS scaled_std
FROM z GROUP BY dim
"""


@query("embedding_standardization_gate", _STANDARDIZE_ORACLE)
def embedding_standardization_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature standardization over array columns (the pre-clustering /
    pre-ANN scaling step): per-dimension mean and stddev from ONE
    explode + groupBy pass over the first 5 dimensions, scaling applied
    as a broadcast join + projection, and the gate re-measures the
    scaled column — mean 0, stddev 1 per dimension, rounded to 6. At
    full width the stats frame is |dims| rows; the corpus shuffles only
    (dim, value) pairs for the dims being profiled."""
    e = _t(spark, sf_dir, "embeddings")
    ex = e.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).alias("dim"),
                        F.col("embedding")[i].cast("double").alias("v"),
                    )
                    for i in range(5)
                ]
            )
        ).alias("x")
    ).select(F.col("x.dim").alias("dim"), F.col("x.v").alias("v"))
    stats = ex.groupBy("dim").agg(
        F.avg("v").alias("mu"), F.stddev_samp("v").alias("sd")
    )
    z = ex.join(F.broadcast(stats), "dim").select(
        "dim", ((F.col("v") - F.col("mu")) / F.col("sd")).alias("zv")
    )
    # + 0.0 folds IEEE negative zero to +0.0 on both engines (DuckDB
    # would otherwise print -0.0 for a -1e-17 mean and hash-mismatch)
    return z.groupBy(F.col("dim").cast("bigint").alias("dim")).agg(
        (F.round(F.avg("zv"), 6) + F.lit(0.0)).alias("scaled_mean"),
        (F.round(F.stddev_samp("zv"), 6) + F.lit(0.0)).alias("scaled_std"),
    )


_CURRICULUM_ORACLE = """
WITH q AS (
  SELECT doc_id, n_chars,
         ntile(10) OVER (ORDER BY n_chars DESC, doc_id ASC) AS decile,
         md5('cur:' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents)
SELECT doc_id, CAST(decile AS BIGINT) AS decile,
       CAST(ROW_NUMBER() OVER (ORDER BY decile ASC, h ASC, doc_id ASC)
            AS BIGINT) AS position
FROM q
ORDER BY position LIMIT 25
"""


@query("curriculum_order_head", _CURRICULUM_ORACLE)
def curriculum_order_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering (easy-first training schedules): documents
    bucketed into proxy-difficulty deciles (length here; any score
    column slots in), then shuffled WITHIN decile by salted md5 — so the
    schedule is coarse-to-fine but not length-sorted within a band (a
    pure sort would correlate adjacent batches). First 25 positions
    shown. Deciles come from the distributed global row-number (range
    shuffle + per-partition offsets) with the ntile bucket computed
    closed-form from (rn, N) — no single-partition WindowExec; the only
    bare window runs over the 25-row post-limit head. The body never
    enters the sort (doc_id, n_chars projection only)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    # Distributed ntile: global row numbers via range-partition + offsets
    # (operators.windows.with_global_row_number — no single-partition
    # WindowExec), then the ntile bucket closed-form from (rn, N):
    # the first N%k buckets hold ceil(N/k) rows, the rest floor(N/k).
    ranked, n = windows.with_global_row_number(
        d,
        [F.col("n_chars").desc(), F.col("doc_id").asc()],
        rn_col="__rn",
    )
    base, rem = divmod(n, 10)
    if base == 0:  # fewer rows than buckets: one row per bucket
        decile = F.col("__rn")
    else:
        cut = rem * (base + 1)
        decile = F.when(
            F.col("__rn") <= F.lit(cut),
            F.ceil(F.col("__rn") / F.lit(base + 1)),
        ).otherwise(
            F.lit(rem) + F.ceil((F.col("__rn") - F.lit(cut)) / F.lit(base))
        )
    q = ranked.select(
        "doc_id",
        decile.cast("bigint").alias("decile"),
        F.md5(F.concat(F.lit("cur:"), F.col("doc_id").cast("string"))).alias("h"),
    )
    # Head-25 of the (decile, h, doc_id) order: TakeOrderedAndProject picks
    # the global top-25 distributively; positions 1..25 are then a window
    # over a 25-row post-limit frame (bounded by construction).
    head = q.orderBy("decile", "h", "doc_id").limit(25)
    wp = Window.orderBy(
        F.col("decile").asc(), F.col("h").asc(), F.col("doc_id").asc()
    )
    return head.select(
        "doc_id",
        "decile",
        F.row_number().over(wp).cast("bigint").alias("position"),
    ).orderBy("position")


# ===================================================================
# Round-4 wave 21 — deterministic masking view, percent-of-parent
# hierarchy shares
# ===================================================================

_MASKED_ORACLE = """
SELECT c_custkey,
       substring(c_name, 1, 1) || repeat('*', greatest(length(c_name) - 1, 0))
         AS masked_name,
       CAST(floor(c_acctbal / 1000) * 1000 AS BIGINT) AS acctbal_band,
       c_mktsegment
FROM customer
"""


@query("masked_customer_view", _MASKED_ORACLE)
def masked_customer_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level masking view (the share-with-analytics shape that
    k_anonymity_check gates): names reduced to an initial + padding,
    balances coarsened to 1000-unit bands — deterministic projections,
    so the masked view is reproducible and joinable on the surviving
    key. Zero shuffle; masking composes with any downstream aggregate
    exactly like the raw columns would."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat(
            F.substring("c_name", 1, 1),
            F.repeat(F.lit("*"), F.greatest(F.length("c_name") - 1, F.lit(0))),
        ).alias("masked_name"),
        (F.floor(F.col("c_acctbal") / 1000) * 1000)
        .cast("bigint")
        .alias("acctbal_band"),
        "c_mktsegment",
    )


_NATION_SHARE_ORACLE = """
WITH rev AS (
  SELECT r_name, n_name,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
              AS DOUBLE) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2)
SELECT r_name, n_name, round(revenue, 2) AS revenue,
       round(revenue / SUM(revenue) OVER (PARTITION BY r_name), 6)
         AS share_of_region,
       round(revenue / SUM(revenue) OVER (), 6) AS share_of_total
FROM rev
"""


@query("nation_share_within_region", _NATION_SHARE_ORACLE)
def nation_share_within_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent at two hierarchy levels in one pass: each
    nation's revenue share within its region AND of the grand total —
    two window sums over the per-NATION aggregate (a few dozen rows at
    any scale; the corpus-sized work is the star join + groupBy that
    produced it). The drill-down companion to revenue_share_by_region."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    dim = F.broadcast(
        n.join(r, n["n_regionkey"] == r["r_regionkey"]).select(
            "n_nationkey", "n_name", "r_name"
        )
    )
    rev = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(dim, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("r_name", "n_name")
        .agg(
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
    )
    wr = Window.partitionBy("r_name")
    wt = Window.partitionBy()
    return rev.select(
        "r_name",
        "n_name",
        F.round("revenue", 2).alias("revenue"),
        F.round(F.col("revenue") / F.sum("revenue").over(wr), 6).alias(
            "share_of_region"
        ),
        F.round(F.col("revenue") / F.sum("revenue").over(wt), 6).alias(
            "share_of_total"
        ),
    )


# ===================================================================
# Round-4 wave 22 — readability, OLS trend, full-star join, rare-level
# collapsing
# ===================================================================

_READABILITY_ORACLE = """
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS toks,
         len(list_filter([trim(x) for x in string_split_regex(text, '[.!?]+')],
                         x -> x <> '')) AS n_sents
  FROM documents),
m AS (
  SELECT doc_id,
         len(toks) AS n_words,
         greatest(n_sents, 1) AS n_sents,
         list_sum([greatest(len(regexp_extract_all(lower(x),
                      '[aeiouy]+')), 1) for x in toks]) AS n_syll
  FROM t WHERE len(toks) > 0)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sents)
             - 84.6 * (CAST(n_syll AS DOUBLE) / n_words), 4) AS flesch
FROM m
"""


@query("readability_scores", _READABILITY_ORACLE)
def readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per document (public formula; syllables
    approximated as vowel groups — the standard heuristic when no
    dictionary is available): words/sentence and syllables/word both
    fall out of array expressions in ONE projection, no shuffle before
    the per-doc output. The readability band is a routine curation
    feature next to the Gopher gates."""
    d = _t(spark, sf_dir, "documents")
    toks = TX.tokens("text")
    sents = F.filter(
        F.transform(F.split("text", r"[.!?]+"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )
    syll = F.aggregate(
        F.transform(
            toks,
            lambda x: F.greatest(
                F.size(F.regexp_extract_all(F.lower(x), F.lit("[aeiouy]+"), 0)),
                F.lit(1),
            ),
        ),
        F.lit(0),
        lambda a, x: a + x,
    )
    m = d.select(
        "doc_id",
        F.size(toks).alias("n_words"),
        F.greatest(F.size(sents), F.lit(1)).alias("n_sents"),
        syll.alias("n_syll"),
    ).filter(F.col("n_words") > 0)
    return m.select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.round(
            F.lit(206.835)
            - 1.015 * (F.col("n_words").cast("double") / F.col("n_sents"))
            - 84.6 * (F.col("n_syll").cast("double") / F.col("n_words")),
            4,
        ).alias("flesch"),
    )


_OLS_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
  FROM orders GROUP BY 1),
x AS (
  SELECT rev,
         CAST(day - (SELECT MIN(day) FROM daily) AS DOUBLE) AS t
  FROM daily),
s AS (
  SELECT COUNT(*) AS n, SUM(t) AS sx, SUM(rev) AS sy,
         SUM(t * t) AS sxx, SUM(t * rev) AS sxy, SUM(rev * rev) AS syy
  FROM x)
SELECT CAST(n AS BIGINT) AS n_days,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4)
         AS intercept,
       round(pow(n * sxy - sx * sy, 2)
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
FROM s
"""


@query("revenue_trend_ols", _OLS_ORACLE)
def revenue_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS trend over daily revenue: slope, intercept and R²
    from the five running sums — one groupBy to the daily aggregate, one
    5-scalar reduce, zero iteration (the normal equations in their
    1-D special case). The same sums power forecasting sanity checks
    ('is revenue actually trending?') without any ML dependency."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("rev")
    ).transform(scoped_cache)
    d0 = daily.agg(F.min("day").alias("d0"))
    x = daily.crossJoin(F.broadcast(d0)).select(
        "rev", F.datediff("day", "d0").cast("double").alias("t")
    )
    s = x.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("sx"),
        F.sum("rev").alias("sy"),
        F.sum(F.col("t") * F.col("t")).alias("sxx"),
        F.sum(F.col("t") * F.col("rev")).alias("sxy"),
        F.sum(F.col("rev") * F.col("rev")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.round(num / den, 6).alias("slope"),
        F.round((F.col("sy") - num / den * F.col("sx")) / F.col("n"), 4).alias(
            "intercept"
        ),
        F.round(
            F.pow(num, 2)
            / (den * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))),
            6,
        ).alias("r2"),
    )


_FULL_STAR_ORACLE = """
SELECT r_name,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(COUNT(DISTINCT s_suppkey) AS BIGINT) AS n_suppliers,
       CAST(COUNT(DISTINCT p_partkey) AS BIGINT) AS n_parts,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY r_name
"""


@query("full_star_join_summary", _FULL_STAR_ORACLE)
def full_star_join_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every table in the schema in ONE star join (7-way): lineitem at
    the center, orders as the one fact-fact shuffle, all five dimensions
    broadcast. Written in the 'wrong' order on purpose — dimensions
    joined before the fact-fact edge — to demonstrate that Catalyst's
    join planning (broadcast detection + AQE) yields the right physical
    shape regardless of the lexical order a user wrote."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey")
    p = _t(spark, sf_dir, "part").select("p_partkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    dim = F.broadcast(
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]).join(
            F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]
        ).select("c_custkey", "r_name")
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(dim, o["o_custkey"] == F.col("c_custkey"))
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.countDistinct("s_suppkey").cast("bigint").alias("n_suppliers"),
            F.countDistinct("p_partkey").cast("bigint").alias("n_parts"),
            exact_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue"),
        )
    )


_RARE_COLLAPSE_ORACLE = """
WITH f AS (
  SELECT p_type, COUNT(*) AS n FROM part GROUP BY p_type),
m AS (
  SELECT p.p_partkey,
         CASE WHEN f.n >= 400 THEN p.p_type ELSE '__other__' END AS lvl
  FROM part p JOIN f ON p.p_type = f.p_type)
SELECT lvl, CAST(COUNT(*) AS BIGINT) AS n_parts
FROM m GROUP BY lvl
"""


@query("collapse_rare_categories", _RARE_COLLAPSE_ORACLE)
def collapse_rare_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rare-level collapsing (the feature-engineering guard against
    high-cardinality categorical blowup): levels below the support
    threshold fold into '__other__' via a broadcast frequency join —
    the level-frequency table is |levels| rows at any data scale, so
    the collapse is one scan + one broadcast regardless of cardinality."""
    p = _t(spark, sf_dir, "part")
    f = p.groupBy("p_type").agg(F.count(F.lit(1)).alias("n"))
    m = p.join(F.broadcast(f), "p_type").select(
        F.when(F.col("n") >= 400, F.col("p_type"))
        .otherwise(F.lit("__other__"))
        .alias("lvl")
    )
    return m.groupBy("lvl").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts")
    )


# ===================================================================
# Round-4 wave 25 — relational CEP (pattern negation), positional
# inverted index + phrase search
# ===================================================================

_CEP_ORACLE = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         MAX(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_view_ts
  FROM events)
SELECT user_id, event_id, ts AS purchase_ts,
       last_view_ts IS NULL
         OR ts - last_view_ts > INTERVAL '30 minutes' AS blind_purchase
FROM e WHERE event_type = 'purchase'
"""


@query("cep_purchase_without_view", _CEP_ORACLE)
def cep_purchase_without_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event pattern with NEGATION — 'purchase NOT preceded by a
    view within 30 minutes' — expressed relationally: a running
    conditional MAX carries each user's latest view timestamp (the
    1-PRECEDING frame excludes the current row), and the pattern
    verdict is a plain comparison. No NFA engine, no per-row state
    machine: one user-keyed window pass at any scale. The
    blind-purchase flag is the classic attribution-gap / bot signal.

    The gap comparison is in MICROSECONDS (unix_micros), not
    cast-to-long epoch seconds: casting each timestamp to long FLOORS
    it, so a true gap of 1800.78s can difference to exactly 1800 and
    flip the > 30min verdict — caught by the sf1.0 oracle sweep (round
    6; 1M events put three purchases within 2s of the boundary, where
    sf0.1's 100k had none). Sub-second boundary events are a
    scale-frequency fact: any threshold comparison must be computed at
    the column's native precision."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_view = F.max(
        F.when(F.col("event_type") == "view", F.col("ts"))
    ).over(w)
    return (
        e.withColumn("last_view_ts", last_view)
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            F.col("ts").alias("purchase_ts"),
            (
                F.col("last_view_ts").isNull()
                | (
                    F.unix_micros("ts") - F.unix_micros("last_view_ts")
                    > 30 * 60 * 1_000_000
                )
            ).alias("blind_purchase"),
        )
    )


_PHRASE_ORACLE = """
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS toks
  FROM documents),
post AS (
  SELECT doc_id, u.tok, u.pos
  FROM t, LATERAL (
    SELECT unnest(toks) AS tok,
           unnest(generate_series(1, len(toks))) AS pos) AS u),
tf AS (SELECT tok, COUNT(*) AS n FROM post GROUP BY tok),
top2 AS (SELECT tok FROM tf ORDER BY n DESC, tok ASC LIMIT 2),
w1 AS (SELECT tok FROM top2 ORDER BY tok ASC LIMIT 1),
w2 AS (SELECT tok FROM top2 ORDER BY tok DESC LIMIT 1),
hits AS (
  SELECT a.doc_id, a.pos AS start_pos
  FROM post a JOIN post b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  JOIN w1 ON a.tok = w1.tok
  JOIN w2 ON b.tok = w2.tok)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
       CAST(MIN(start_pos) AS BIGINT) AS first_pos
FROM hits GROUP BY doc_id
"""


@query("phrase_search_postings", _PHRASE_ORACLE)
def phrase_search_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional inverted index + phrase query, fully relational: the
    postings table is (token, doc, position) — one explode, the exact
    shape a search engine shards by token — and a two-token phrase
    match is a self-join on (doc, pos+1) restricted to the phrase's
    tokens. The phrase is chosen data-dependently (the two most frequent
    tokens, in lexical order) so the query is meaningful at any corpus.
    Scale: the restriction to the phrase tokens happens BEFORE the
    positional self-join — only those postings shuffle, the classic
    term-at-a-time evaluation economy."""
    d = _t(spark, sf_dir, "documents")
    post = (
        d.select("doc_id", F.lower(F.col("text")).alias("__t"))
        .select("doc_id", TX.tokens(F.col("__t")).alias("__toks"))
        .select(
            "doc_id",
            F.posexplode("__toks").alias("__p0", "tok"),
        )
        .select("doc_id", "tok", (F.col("__p0") + 1).alias("pos"))
        .transform(scoped_cache)
    )
    tf = post.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    top2 = tf.orderBy(F.col("n").desc(), F.col("tok").asc()).limit(2)
    w1 = top2.orderBy(F.col("tok").asc()).limit(1).select(
        F.col("tok").alias("__w1")
    )
    w2 = top2.orderBy(F.col("tok").desc()).limit(1).select(
        F.col("tok").alias("__w2")
    )
    a = post.join(F.broadcast(w1), post["tok"] == F.col("__w1")).select(
        "doc_id", F.col("pos").alias("start_pos")
    )
    b = post.join(F.broadcast(w2), post["tok"] == F.col("__w2")).select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pos_b")
    )
    hits = a.join(
        b,
        (F.col("doc_id") == F.col("doc_b"))
        & (F.col("pos_b") == F.col("start_pos") + 1),
    )
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matches"),
        F.min("start_pos").cast("bigint").alias("first_pos"),
    )


# ===================================================================
# Round-4 wave 26 — time-weighted averages, correlation matrix
# ===================================================================

_TWAP_ORACLE = """
WITH e AS (
  SELECT user_id, ts, value,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_ts
  FROM events),
seg AS (
  SELECT user_id, value,
         CAST(epoch_us(next_ts) - epoch_us(ts) AS DOUBLE) / 1e6 AS dt
  FROM e WHERE next_ts IS NOT NULL)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       round(SUM(value * dt) / SUM(dt), 6) AS time_weighted_avg,
       round(SUM(dt) / 3600.0, 4) AS observed_hours
FROM seg WHERE user_id IS NOT NULL GROUP BY user_id
HAVING SUM(dt) > 0
"""


@query("time_weighted_avg_value", _TWAP_ORACLE)
def time_weighted_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average over IRREGULARLY sampled values (the TWAP /
    sensor-mean shape — a plain AVG over-weights bursts): each reading
    holds until the next one (lead over the user's time order), so the
    mean is sum(value x holding-time) / total time. One user-keyed
    window + one groupBy; rows with no successor contribute no interval
    (the standard left-closed convention, mirrored in the oracle)."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = (
        e.withColumn("next_ts", F.lead("ts").over(w))
        .filter(F.col("next_ts").isNotNull())
        .select(
            "user_id",
            "value",
            (
                (F.unix_micros("next_ts") - F.unix_micros("ts")).cast("double")
                / 1e6
            ).alias("dt"),
        )
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
            F.round(
                F.sum(F.col("value") * F.col("dt")) / F.sum("dt"), 6
            ).alias("time_weighted_avg"),
            F.round(F.sum("dt") / 3600.0, 4).alias("observed_hours"),
            F.sum("dt").alias("__tot"),
        )
        .filter(F.col("__tot") > 0)
        .drop("__tot")
    )


_CORR_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         COUNT(*) FILTER (WHERE event_type = 'view') AS v,
         COUNT(*) FILTER (WHERE event_type = 'click') AS c,
         COUNT(*) FILTER (WHERE event_type = 'purchase') AS p
  FROM events GROUP BY 1)
SELECT round(corr(v, c), 6) AS corr_view_click,
       round(corr(v, p), 6) AS corr_view_purchase,
       round(corr(c, p), 6) AS corr_click_purchase,
       CAST(COUNT(*) AS BIGINT) AS n_days
FROM daily
"""


@query("event_type_correlations", _CORR_ORACLE)
def event_type_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-metric correlation matrix (do clicks move with views?):
    conditional counts pivot the event stream into per-day metric
    columns in ONE scan, then Pearson correlations between every pair —
    corr is an ordinary distributed aggregate (five running sums per
    pair), no collect, no pandas. The daily pivot is the only shuffle;
    the correlation matrix is a single row regardless of history
    length."""
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count_if(F.col("event_type") == "view").alias("v"),
        F.count_if(F.col("event_type") == "click").alias("c"),
        F.count_if(F.col("event_type") == "purchase").alias("p"),
    )
    return daily.agg(
        F.round(F.corr("v", "c"), 6).alias("corr_view_click"),
        F.round(F.corr("v", "p"), 6).alias("corr_view_purchase"),
        F.round(F.corr("c", "p"), 6).alias("corr_click_purchase"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )


# ===================================================================
# Round-4 wave 27 — churn labeling, exposure conversion, dataset
# content fingerprints
# ===================================================================

_CHURN_ORACLE = """
WITH horizon AS (SELECT MAX(ts) AS h FROM events),
last_seen AS (
  SELECT user_id, MAX(ts) AS last_ts, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id)
SELECT l.user_id, l.n_events,
       CAST(floor(CAST(epoch_us(horizon.h) - epoch_us(l.last_ts) AS DOUBLE)
                  / 86400e6) AS BIGINT) AS days_inactive,
       epoch_us(horizon.h) - epoch_us(l.last_ts) > 14 * 86400e6 AS churned
FROM last_seen l CROSS JOIN horizon
"""


@query("churn_labels", _CHURN_ORACLE)
def churn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn label generation (the target column of a retention model):
    a user is churned when inactive for >14 days at the observation
    horizon — the horizon being the data's own max timestamp, so the
    label set is reproducible from the table alone. One groupBy + a
    1-row broadcast; labels join back to any feature table by user."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    horizon = e.agg(F.max("ts").alias("h"))
    last_seen = e.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    inactive_us = F.unix_micros("h") - F.unix_micros("last_ts")
    return last_seen.crossJoin(F.broadcast(horizon)).select(
        "user_id",
        "n_events",
        F.floor(inactive_us.cast("double") / 86400e6)
        .cast("bigint")
        .alias("days_inactive"),
        (inactive_us > 14 * 86400 * 1_000_000).alias("churned"),
    )


_EXPOSURE_ORACLE = """
WITH u AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS exposed,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id)
SELECT CAST(exposed AS BIGINT) AS exposed,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(converted) AS BIGINT) AS n_converted,
       round(AVG(CAST(converted AS DOUBLE)), 6) AS conversion_rate
FROM u GROUP BY exposed
"""


@query("click_exposure_conversion", _EXPOSURE_ORACLE)
def click_exposure_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exposure-vs-conversion comparison (the observational uplift
    table): purchase rate among users who ever clicked vs those who
    never did — per-user flags from one conditional-MAX groupBy, rates
    from a two-row aggregate. The honest framing is correlation, not
    causation; the query is the denominator-correct version of the
    metric dashboards usually get wrong (user-level, not event-level)."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    u = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "click", 1).otherwise(0)
        ).alias("exposed"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    return u.groupBy(F.col("exposed").cast("bigint").alias("exposed")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
        F.round(F.avg(F.col("converted").cast("double")), 6).alias(
            "conversion_rate"
        ),
    )


def _row_fp_sql(cols: str) -> str:
    h = f"substring(md5({cols}), 1, 8)"
    return _hex8_to_int(h)


_DATASET_FP_ORACLE = f"""
SELECT 'orders' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM({_row_fp_sql("CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR) || '|' || CAST(round(o_totalprice, 2) AS VARCHAR)")}) AS BIGINT) AS fingerprint
FROM orders
UNION ALL
SELECT 'customer', CAST(COUNT(*) AS BIGINT),
       CAST(SUM({_row_fp_sql("CAST(c_custkey AS VARCHAR) || '|' || c_mktsegment")}) AS BIGINT)
FROM customer
UNION ALL
SELECT 'region', CAST(COUNT(*) AS BIGINT),
       CAST(SUM({_row_fp_sql("CAST(r_regionkey AS VARCHAR) || '|' || r_name")}) AS BIGINT)
FROM region
"""


@query("dataset_content_fingerprints", _DATASET_FP_ORACLE)
def dataset_content_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent content fingerprints (the cache-invalidation /
    reproducibility primitive behind 'did this table change?'): each
    row hashes to a 32-bit integer (md5 prefix) and the table
    fingerprint is their SUM — commutative and associative, so it is
    identical under any partitioning, row order, or engine, and
    incrementally maintainable (add the hashes of inserted rows,
    subtract deleted). One scan per table, one bigint out. Monetary
    values are rounded before hashing so the fingerprint tolerates
    storage-format float formatting, not value changes."""
    def fp(df, cols):
        concat = F.concat_ws("|", *cols)
        h = (
            F.conv(F.substring(F.md5(concat), 1, 8), 16, 10).cast("bigint")
        )
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(h).cast("bigint").alias("fingerprint"),
        )

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    r = _t(spark, sf_dir, "region")
    fo = fp(
        o,
        [
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.round("o_totalprice", 2).cast("string"),
        ],
    ).select(F.lit("orders").alias("tbl"), "n_rows", "fingerprint")
    fc = fp(
        c, [F.col("c_custkey").cast("string"), F.col("c_mktsegment")]
    ).select(F.lit("customer").alias("tbl"), "n_rows", "fingerprint")
    fr = fp(
        r, [F.col("r_regionkey").cast("string"), F.col("r_name")]
    ).select(F.lit("region").alias("tbl"), "n_rows", "fingerprint")
    return fo.unionAll(fc).unionAll(fr)


# ===================================================================
# Round-4 wave 28 — nucleus coverage, join fan-out histogram,
# JL random-projection gate
# ===================================================================

_NUCLEUS_ORACLE = """
WITH caps AS (
  SELECT source,
         CAST(SUM(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                  x -> x <> ''))) AS DOUBLE) AS tok
  FROM documents GROUP BY source),
t AS (SELECT SUM(tok) AS total FROM caps),
r AS (
  SELECT source, tok,
         SUM(tok) OVER (ORDER BY tok DESC, source ASC
                        ROWS UNBOUNDED PRECEDING) / t.total AS cum_share
  FROM caps CROSS JOIN t),
k AS (
  SELECT *, lag(cum_share, 1, 0.0)
              OVER (ORDER BY tok DESC, source ASC) AS prev_share
  FROM r)
SELECT source, CAST(tok AS BIGINT) AS tokens,
       round(cum_share, 6) AS cum_share
FROM k WHERE prev_share < 0.9
"""


@query("sources_nucleus_p90", _NUCLEUS_ORACLE)
def sources_nucleus_p90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nucleus (top-p) source coverage: the smallest prefix of sources,
    largest first, whose cumulative token share reaches 90% — the
    mixture-analysis companion to the Gini concentration view (how many
    sources actually carry the corpus?). Everything beyond the one
    token-count scan runs on the per-SOURCE aggregate; the boundary
    source is included via the lagged-share test (prev < p <= cum)."""
    d = _t(spark, sf_dir, "documents")
    caps = d.groupBy("source").agg(
        F.sum(TX.token_count("text")).cast("double").alias("tok")
    )
    t = caps.agg(F.sum("tok").alias("total"))
    cum = Window.orderBy(F.col("tok").desc(), F.col("source").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    lagw = Window.orderBy(F.col("tok").desc(), F.col("source").asc())
    r = caps.crossJoin(F.broadcast(t)).withColumn(
        "cum_share", F.sum("tok").over(cum) / F.col("total")
    ).withColumn("prev_share", F.lag("cum_share", 1, 0.0).over(lagw))
    return r.filter(F.col("prev_share") < 0.9).select(
        "source",
        F.col("tok").cast("bigint").alias("tokens"),
        F.round("cum_share", 6).alias("cum_share"),
    )


_FANOUT_ORACLE = """
WITH f AS (
  SELECT o_orderkey, COUNT(l_orderkey) AS fanout
  FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY o_orderkey)
SELECT CAST(fanout AS BIGINT) AS fanout,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM f GROUP BY fanout
"""


@query("join_fanout_histogram", _FANOUT_ORACLE)
def join_fanout_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-explosion detector: the per-key fan-out histogram of the
    orders-lineitem join (how many fact rows does each key pull?),
    including fanout=0 via the left join — the profile run BEFORE a new
    join ships, because a surprise heavy tail here is tomorrow's skew
    incident. Two groupBys; the second is over |distinct fanouts| rows."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    f = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"], "left")
        .groupBy("o_orderkey")
        .agg(F.count("l_orderkey").alias("fanout"))
    )
    return f.groupBy(F.col("fanout").cast("bigint").alias("fanout")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )


@query(
    "jl_projection_gate",
    "SELECT true AS norms_preserved, true AS distances_preserved",
)
def jl_projection_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection (the cheap dimensionality
    crunch before ANN: 64 -> 32 dims with distances approximately
    preserved): a seeded Gaussian matrix (literal columns — no UDF, no
    driver data) projects every embedding in one whole-stage-codegen
    projection. Gates, computed distributively: (a) the median ratio of
    projected to original squared norm lies in [0.6, 1.4]; (b) across a
    deterministic pair sample (vec i with vec i+250), the squared
    pairwise-DISTANCE distortion stays within the JL envelope — median
    in [0.7, 1.4], 5th/95th percentiles inside [0.3, 2.2]. Distance
    preservation (not ranking) is what JL guarantees; on this corpus the
    neighbor margins are far below the distortion at 2x compression, so
    a top-k recall gate would test the DATA, not the projection."""
    from etl_bigquery_pipeline_spark.operators import similarity

    emb = _t(spark, sf_dir, "embeddings").transform(scoped_cache)
    planes = similarity._hyperplanes(_DIM, 32, seed=7)
    scale = 1.0 / (32 ** 0.5)
    proj_cols = [
        F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                F.array(*[F.lit(float(x)) for x in plane]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        * scale
        for plane in planes
    ]
    p = emb.select(
        "vec_id",
        "label",
        F.array(*proj_cols).alias("proj"),
        F.col("embedding").cast("array<double>").alias("orig"),
    ).transform(scoped_cache)
    sq = lambda c: F.aggregate(  # noqa: E731
        c, F.lit(0.0), lambda acc, x: acc + x * x
    )
    ratios = p.select(
        F.try_divide(sq(F.col("proj")), sq(F.col("orig"))).alias("r")
    )
    # per-vector ratios are corpus-proportional: exact medians run on
    # the histogram plan, not percentile()'s per-task value buffer
    med = _hist_exact_percentiles(ratios, None, "r", [0.5], ["m"]).first()[
        "m"
    ]

    a = p.select(
        F.col("vec_id").alias("ia"),
        F.col("proj").alias("pa"),
        F.col("orig").alias("oa"),
    )
    b = p.select(
        (F.col("vec_id") - 250).alias("ia"),
        F.col("proj").alias("pb"),
        F.col("orig").alias("ob"),
    )
    d2 = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda u, v: (u - v) * (u - v)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    dist = a.join(b, "ia").select(
        F.try_divide(
            d2(F.col("pa"), F.col("pb")), d2(F.col("oa"), F.col("ob"))
        ).alias("r")
    )
    q = _hist_exact_percentiles(
        dist, None, "r", [0.05, 0.5, 0.95], ["p05", "p50", "p95"]
    ).first()
    dist_ok = (
        0.7 <= q["p50"] <= 1.4 and q["p05"] >= 0.3 and q["p95"] <= 2.2
    )
    return spark.createDataFrame(
        [(bool(0.6 <= med <= 1.4), bool(dist_ok))],
        "norms_preserved boolean, distances_preserved boolean",
    )


# ===================================================================
# Round-4 wave 29 — session path mining, geospatial grid, calendar dim
# ===================================================================

_PATHS_ORACLE = """
WITH o AS (
  SELECT user_id,
         string_agg(event_type, ' ' ORDER BY ts, event_id) AS seq
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
t AS (
  SELECT list_filter(regexp_split_to_array(seq, ' '), x -> x <> '') AS s
  FROM o),
g AS (
  SELECT unnest([array_to_string(s[i:i+2], ' > ')
                 for i in generate_series(1, len(s) - 2)]) AS path
  FROM t WHERE len(s) >= 3),
c AS (SELECT path, COUNT(*) AS n FROM g GROUP BY path),
r AS (
  SELECT path, CAST(n AS BIGINT) AS n,
         ROW_NUMBER() OVER (ORDER BY n DESC, path ASC) AS rn
  FROM c)
SELECT path, n FROM r WHERE rn <= 10
"""


@query("top_session_paths", _PATHS_ORACLE)
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path mining: the 10 most common 3-step event sequences across
    user timelines (the what-do-people-actually-do view funnels are
    built from). Ordered sequences come from the deterministic
    struct-sorted collect (the session_transcripts machinery), trigrams
    from one slice-transform explode; the count groupBy is keyed by
    path string — at most |event_types|^3 groups at any scale."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    seqs = (
        e.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("__ord")
        )
        .select(
            F.transform(F.col("__ord"), lambda s: s["event_type"]).alias("s")
        )
        .filter(F.size("s") >= 3)
    )
    g = seqs.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("s") - 2),
                lambda i: F.array_join(F.slice("s", i, 3), " > "),
            )
        ).alias("path")
    )
    c = g.groupBy("path").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = Window.orderBy(F.col("n").desc(), F.col("path").asc())
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("path", "n")
    )


_GEO_ORACLE = f"""
WITH u AS (
  SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL),
pos AS (
  SELECT user_id,
         (({_hex8_to_int("substring(md5('lat:' || CAST(user_id AS VARCHAR)), 1, 8)")}) % 120000) / 1000.0 - 60.0 AS lat,
         (({_hex8_to_int("substring(md5('lon:' || CAST(user_id AS VARCHAR)), 1, 8)")}) % 360000) / 1000.0 - 180.0 AS lon
  FROM u),
d AS (
  SELECT user_id, lat, lon,
         CAST(floor(lat / 10) AS BIGINT) AS cell_lat,
         CAST(floor(lon / 10) AS BIGINT) AS cell_lon,
         2 * 6371.0 * asin(sqrt(
           pow(sin(radians(lat - 40.0) / 2), 2)
           + cos(radians(40.0)) * cos(radians(lat))
             * pow(sin(radians(lon - (-74.0)) / 2), 2))) AS km_from_nyc
  FROM pos)
SELECT cell_lat, cell_lon,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       round(MIN(km_from_nyc), 3) AS min_km_from_nyc
FROM d GROUP BY cell_lat, cell_lon
"""


@query("geo_grid_density", _GEO_ORACLE)
def geo_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geospatial grid aggregation: users get deterministic synthetic
    coordinates (md5 draws — the corpus has no geo columns, so the
    PLUMBING is what this verifies), bucket into 10-degree cells (the
    geohash-style spatial partition key), and compute great-circle
    haversine distance from a fixed point — all JVM trig, replayed
    exactly by the oracle. At scale the cell key is the spatial
    equi-join/pruning device: radius queries prune to candidate cells
    before any distance math."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    u = e.select("user_id").distinct()

    def draw(salt, mod, scale, shift):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col("user_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        return (h % mod) / scale - shift

    pos = u.select(
        "user_id",
        draw("lat:", 120000, 1000.0, 60.0).alias("lat"),
        draw("lon:", 360000, 1000.0, 180.0).alias("lon"),
    )
    lat0, lon0 = 40.0, -74.0
    hav = (
        2.0
        * 6371.0
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(F.col("lat") - lat0) / 2), 2)
                + F.cos(F.radians(F.lit(lat0)))
                * F.cos(F.radians("lat"))
                * F.pow(F.sin(F.radians(F.col("lon") - lon0) / 2), 2)
            )
        )
    )
    d = pos.select(
        F.floor(F.col("lat") / 10).cast("bigint").alias("cell_lat"),
        F.floor(F.col("lon") / 10).cast("bigint").alias("cell_lon"),
        hav.alias("km_from_nyc"),
    )
    return d.groupBy("cell_lat", "cell_lon").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.round(F.min("km_from_nyc"), 3).alias("min_km_from_nyc"),
    )


_CALENDAR_ORACLE = """
WITH bounds AS (
  SELECT CAST(MIN(ts) AS DATE) AS lo, CAST(MAX(ts) AS DATE) AS hi
  FROM events),
spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
  FROM bounds)
SELECT day,
       CAST(EXTRACT(isodow FROM day) AS BIGINT) AS iso_dow,
       EXTRACT(isodow FROM day) >= 6 AS is_weekend,
       CAST(EXTRACT(month FROM day) AS BIGINT) AS month,
       CAST(EXTRACT(quarter FROM day) AS BIGINT) AS quarter,
       CAST(date_trunc('month', day) AS DATE) AS month_start
FROM spine
"""


@query("calendar_dimension_build", _CALENDAR_ORACLE)
def calendar_dimension_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar dimension generation (the date spine every gap-filling
    and fiscal-reporting join needs): sequence() from the data's own
    bounds, one row per day with ISO weekday, weekend flag, month and
    quarter attributes — derived columns only, no source scan beyond
    the 2-scalar bounds aggregate. Calendar-bounded rows at any data
    scale; broadcast it against any fact table."""
    e = _t(spark, sf_dir, "events")
    bounds = e.agg(
        F.min(F.col("ts").cast("date")).alias("lo"),
        F.max(F.col("ts").cast("date")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    return spine.select(
        "day",
        F.dayofweek("day").alias("__dow_sun1"),
        F.month("day").cast("bigint").alias("month"),
        F.quarter("day").cast("bigint").alias("quarter"),
        F.date_trunc("month", "day").cast("date").alias("month_start"),
    ).select(
        "day",
        # ISO weekday (Mon=1..Sun=7) from Spark's Sunday=1 convention
        ((F.col("__dow_sun1") + 5) % 7 + 1).cast("bigint").alias("iso_dow"),
        (((F.col("__dow_sun1") + 5) % 7 + 1) >= 6).alias("is_weekend"),
        "month",
        "quarter",
        "month_start",
    )


# ===================================================================
# Round-4 wave 30 — kNN outliers, null patterns, FK discovery
# ===================================================================

_KNN_OUT_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id % 25 = 0 AND vec_id < {_ANN_PANEL_MAX_ID}),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
s AS (
  SELECT query_id, neighbor_id, {{cos}} AS sim
  FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
r AS (
  SELECT query_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id ASC) AS rn
  FROM s),
m AS (
  SELECT query_id, round(AVG(sim), 6) AS knn_sim
  FROM r WHERE rn <= 5 GROUP BY query_id),
z AS (
  SELECT query_id, knn_sim,
         CAST(ROW_NUMBER() OVER (ORDER BY knn_sim ASC, query_id ASC)
              AS BIGINT) AS isolation_rank
  FROM m)
SELECT query_id, knn_sim, isolation_rank FROM z WHERE isolation_rank <= 5
"""


@query(
    "knn_distance_outliers",
    _KNN_OUT_ORACLE.replace("{cos}", _cosine_sql("qv", "cv")),
)
def knn_distance_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-distance outlier scoring (the distance-based anomaly family:
    a point whose 5 nearest neighbors are still far away sits in sparse
    space): mean top-5 cosine similarity per probe, lowest-5 flagged as
    most isolated. Reuses the broadcast-probe cosine_topk machinery —
    corpus scanned once, probes broadcast; the isolation ranking runs
    over |probes| rows. The embedding-space twin of MAD/z-score tabular
    outliers: useful for hunting mislabeled or off-distribution
    documents before training."""
    from etl_bigquery_pipeline_spark.operators import similarity

    emb = _t(spark, sf_dir, "embeddings")
    probes = _ann_panel(emb, 25)
    topk = similarity.cosine_topk(
        emb, probes, k=5, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id",
    )
    m = topk.groupBy("query_id").agg(
        F.round(F.avg("sim"), 6).alias("knn_sim")
    )
    w = Window.orderBy(F.col("knn_sim").asc(), F.col("query_id").asc())
    return (
        m.withColumn("isolation_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("isolation_rank") <= 5)
    )


_NULL_PATTERN_ORACLE = """
WITH p AS (
  SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_custkey END AS a,
         CASE WHEN o_orderkey % 21 = 0 THEN NULL ELSE o_totalprice END AS b,
         CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_orderstatus END AS c
  FROM orders)
SELECT concat(CASE WHEN a IS NULL THEN 'N' ELSE '-' END,
              CASE WHEN b IS NULL THEN 'N' ELSE '-' END,
              CASE WHEN c IS NULL THEN 'N' ELSE '-' END) AS pattern,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM p GROUP BY 1
"""


@query("null_pattern_profile", _NULL_PATTERN_ORACLE)
def null_pattern_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missingness-pattern analysis (the step before choosing an
    imputation strategy: are nulls independent or co-occurring?): each
    row maps to its null-indicator string across the audited columns,
    one groupBy counts the patterns. The planted nulls share a factor
    (%7 and %21), so the 'NN-' co-occurrence pattern shows up exactly
    where MCAR would predict none — the signal this profile exists to
    catch. At most 2^k patterns regardless of row count."""
    o = _t(spark, sf_dir, "orders")
    p = o.select(
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None).cast("bigint"))
        .otherwise(F.col("o_custkey"))
        .alias("a"),
        F.when(F.col("o_orderkey") % 21 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("o_totalprice"))
        .alias("b"),
        F.when(F.col("o_orderkey") % 11 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("o_orderstatus"))
        .alias("c"),
    )
    ind = lambda col: F.when(F.col(col).isNull(), "N").otherwise("-")  # noqa: E731
    return (
        p.select(
            F.concat(ind("a"), ind("b"), ind("c")).alias("pattern")
        )
        .groupBy("pattern")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )


_INCLUSION_ORACLE = """
WITH pairs AS (
  SELECT 'lineitem.l_orderkey -> orders.o_orderkey' AS fk,
         (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem) AS n_child,
         (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey FROM lineitem) a
          WHERE EXISTS (SELECT 1 FROM orders WHERE o_orderkey = a.l_orderkey))
           AS n_contained
  UNION ALL
  SELECT 'lineitem.l_partkey -> part.p_partkey',
         (SELECT COUNT(DISTINCT l_partkey) FROM lineitem),
         (SELECT COUNT(*) FROM (SELECT DISTINCT l_partkey FROM lineitem) a
          WHERE EXISTS (SELECT 1 FROM part WHERE p_partkey = a.l_partkey))
  UNION ALL
  SELECT 'orders.o_custkey -> customer.c_custkey',
         (SELECT COUNT(DISTINCT o_custkey) FROM orders),
         (SELECT COUNT(*) FROM (SELECT DISTINCT o_custkey FROM orders) a
          WHERE EXISTS (SELECT 1 FROM customer WHERE c_custkey = a.o_custkey))
  UNION ALL
  SELECT 'customer.c_custkey -> orders.o_custkey',
         (SELECT COUNT(DISTINCT c_custkey) FROM customer),
         (SELECT COUNT(*) FROM (SELECT DISTINCT c_custkey FROM customer) a
          WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = a.c_custkey)))
SELECT fk, CAST(n_child AS BIGINT) AS n_child,
       CAST(n_contained AS BIGINT) AS n_contained,
       round(CAST(n_contained AS DOUBLE) / n_child, 6) AS inclusion,
       n_contained = n_child AS is_foreign_key
FROM pairs
"""


@query("inclusion_dependency_profile", _INCLUSION_ORACLE)
def inclusion_dependency_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key DISCOVERY via inclusion coefficients (the profiling
    companion to candidate_key_profile: candidate keys say what could be
    referenced, inclusion says what actually references it): for each
    candidate (child, parent) pair, the fraction of distinct child
    values contained in the parent — 1.0 means the FK holds, and the
    deliberately-reversed customer->orders pair shows a real non-FK
    (customers without orders). Each pair is a distinct projection +
    broadcast semi-join count."""
    def coeff(child, ccol, parent, pcol, label):
        a = child.select(F.col(ccol).alias("k")).distinct().transform(scoped_cache)
        n_child = a.count()
        n_cont = a.join(
            F.broadcast(parent.select(F.col(pcol).alias("k")).distinct()),
            "k",
            "left_semi",
        ).count()
        return (label, n_child, n_cont)

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part")
    c = _t(spark, sf_dir, "customer")
    rows = [
        coeff(li, "l_orderkey", o, "o_orderkey",
              "lineitem.l_orderkey -> orders.o_orderkey"),
        coeff(li, "l_partkey", p, "p_partkey",
              "lineitem.l_partkey -> part.p_partkey"),
        coeff(o, "o_custkey", c, "c_custkey",
              "orders.o_custkey -> customer.c_custkey"),
        coeff(c, "c_custkey", o, "o_custkey",
              "customer.c_custkey -> orders.o_custkey"),
    ]
    out = spark.createDataFrame(
        rows, "fk string, n_child bigint, n_contained bigint"
    )
    return out.select(
        "fk",
        "n_child",
        "n_contained",
        F.round(F.col("n_contained").cast("double") / F.col("n_child"), 6).alias(
            "inclusion"
        ),
        (F.col("n_contained") == F.col("n_child")).alias("is_foreign_key"),
    )


# ===================================================================
# Round-4 wave 31 — YoY growth, reactivation detection, embedding drift
# ===================================================================

_YOY_ORACLE = """
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
  FROM orders GROUP BY 1),
j AS (
  SELECT m.month, m.rev, p.rev AS rev_last_year
  FROM monthly m
  LEFT JOIN monthly p ON p.month = m.month - INTERVAL 1 YEAR)
SELECT month, round(rev, 2) AS rev,
       round(rev_last_year, 2) AS rev_last_year,
       round((rev - rev_last_year) / rev_last_year, 6) AS yoy_growth
FROM j WHERE rev_last_year IS NOT NULL
"""


@query("yoy_revenue_growth", _YOY_ORACLE)
def yoy_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year growth by calendar alignment (the seasonal
    companion to mom_revenue_growth's positional lag): each month joins
    its same-month-last-year row by DATE arithmetic, not row offset —
    immune to gaps in the month sequence, which is exactly where a
    lag(12) silently compares the wrong months. Self-join over the
    monthly aggregate (calendar-bounded rows)."""
    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("rev")
    ).transform(scoped_cache)
    prev = monthly.select(
        F.add_months(F.col("month"), 12).alias("month"),
        F.col("rev").alias("rev_last_year"),
    )
    return (
        monthly.join(prev, "month")
        .select(
            "month",
            F.round("rev", 2).alias("rev"),
            F.round("rev_last_year", 2).alias("rev_last_year"),
            F.round(
                (F.col("rev") - F.col("rev_last_year")) / F.col("rev_last_year"),
                6,
            ).alias("yoy_growth"),
        )
    )


_REACTIVATED_ORACLE = """
WITH e AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events WHERE user_id IS NOT NULL)
SELECT user_id,
       CAST(COUNT(*) FILTER (
         WHERE prev_ts IS NOT NULL
           AND epoch_us(ts) - epoch_us(prev_ts) > 14 * 86400e6)
       AS BIGINT) AS n_reactivations,
       CAST(floor(MAX(epoch_us(ts) - epoch_us(prev_ts)) / 86400e6)
            AS BIGINT) AS longest_gap_days
FROM e GROUP BY user_id
HAVING COUNT(*) FILTER (
  WHERE prev_ts IS NOT NULL
    AND epoch_us(ts) - epoch_us(prev_ts) > 14 * 86400e6) > 0
"""


@query("reactivated_users", _REACTIVATED_ORACLE)
def reactivated_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dormancy reactivation (the win-back signal churn_labels can't
    see: the user came BACK): events arriving after a >14-day silence
    per user, counted with the longest observed gap. One lag over the
    user timeline + one groupBy — the same window pass sessionization
    makes, with a different gap threshold reading."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    g = e.withColumn("gap_us", gap_us)
    react = F.count_if(F.col("gap_us") > 14 * 86400 * 1_000_000)
    return (
        g.groupBy("user_id")
        .agg(
            react.cast("bigint").alias("n_reactivations"),
            F.floor(F.max("gap_us") / 86400e6).cast("bigint").alias(
                "longest_gap_days"
            ),
        )
        .filter(F.col("n_reactivations") > 0)
    )


_EMB_DRIFT_ORACLE = f"""
WITH h AS (
  SELECT CASE WHEN vec_id < (SELECT MAX(vec_id) FROM embeddings) / 2
              THEN 0 ELSE 1 END AS half,
         embedding
  FROM embeddings),
m AS (
  SELECT half, i AS dim, avg(CAST(embedding[i] AS DOUBLE)) AS mu
  FROM h, generate_series(1, {{dim}}) AS g(i)
  GROUP BY half, i),
c AS (
  SELECT a.dim, a.mu AS mu0, b.mu AS mu1
  FROM m a JOIN m b ON a.dim = b.dim AND a.half = 0 AND b.half = 1)
SELECT round(sqrt(SUM((mu0 - mu1) * (mu0 - mu1))), 6) AS centroid_shift,
       round(sqrt(SUM(mu0 * mu0)), 6) AS centroid_norm_first,
       round(sqrt(SUM(mu1 * mu1)), 6) AS centroid_norm_second
FROM c
"""


@query(
    "embedding_drift_gate", _EMB_DRIFT_ORACLE.replace("{dim}", str(64))
)
def embedding_drift_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift (the vector twin of the tabular PSI drift
    check): split the corpus into first/second halves by id, compute
    each half's centroid via one explode-groupBy pass, and report the
    L2 centroid shift against the centroid norms for scale. At
    production scale the halves are yesterday/today batches and the
    gate thresholds the shift; here the two halves of one synthetic
    draw give a near-zero shift — the null-hypothesis reading the
    threshold would be calibrated on."""
    e = _t(spark, sf_dir, "embeddings")
    mx = e.agg(F.max("vec_id").alias("m"))
    h = e.crossJoin(F.broadcast(mx)).select(
        F.when(F.col("vec_id") < F.col("m") / 2, 0).otherwise(1).alias("half"),
        "embedding",
    )
    ex = h.select(
        "half",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "__p", "v"
        ),
    ).select("half", (F.col("__p") + 1).alias("dim"), "v")
    m = ex.groupBy("half", "dim").agg(F.avg("v").alias("mu"))
    a = m.filter(F.col("half") == 0).select("dim", F.col("mu").alias("mu0"))
    b = m.filter(F.col("half") == 1).select("dim", F.col("mu").alias("mu1"))
    c = a.join(b, "dim")
    return c.agg(
        F.round(
            F.sqrt(F.sum((F.col("mu0") - F.col("mu1")) ** 2)), 6
        ).alias("centroid_shift"),
        F.round(F.sqrt(F.sum(F.col("mu0") ** 2)), 6).alias(
            "centroid_norm_first"
        ),
        F.round(F.sqrt(F.sum(F.col("mu1") ** 2)), 6).alias(
            "centroid_norm_second"
        ),
    )


# ===================================================================
# Round-4 wave 32 — key-skew profile, weighted median, CUSUM
# change-point detection
# ===================================================================

_SKEW_PROFILE_ORACLE = """
WITH g AS (
  SELECT user_id, CAST(COUNT(*) AS DOUBLE) AS n
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
t AS (
  SELECT SUM(n) AS total, COUNT(*) AS k, MAX(n) AS mx,
         quantile_cont(n, 0.5) AS p50, quantile_cont(n, 0.99) AS p99
  FROM g)
SELECT CAST(k AS BIGINT) AS n_keys,
       round(mx / total, 6) AS top_key_share,
       round(p99 / p50, 4) AS p99_over_p50,
       round(mx / (total / k), 4) AS max_over_mean
FROM t
"""


@query("key_skew_profile", _SKEW_PROFILE_ORACLE)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic (run BEFORE keying a join or agg on a
    column — the numeric answer to 'will one reducer own this?'):
    per-key group sizes, then the ratios that predict trouble — top key
    share of all rows, p99/p50 group size, and max-over-mean (the
    straggler factor a perfectly even shuffle would put at 1.0). The
    decision input for salting/AQE-skew handling, computed as one
    groupBy + one scalar aggregate."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    # per-key counts are corpus-proportional (one row per user), so the
    # group-size percentiles run on the histogram plan — and the
    # histogram of COUNTS is tiny (distinct group sizes, not groups)
    g = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    ).transform(scoped_cache)
    pcts = _hist_exact_percentiles(
        g, None, "n", [0.99, 0.5], ["__p99", "__p50"]
    )
    agg = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.round(F.max("n") / F.sum("n"), 6).alias("top_key_share"),
        F.round(F.max("n") / (F.sum("n") / F.count(F.lit(1))), 4).alias(
            "max_over_mean"
        ),
    )
    return agg.crossJoin(F.broadcast(pcts)).select(
        "n_keys",
        "top_key_share",
        F.round(F.col("__p99") / F.col("__p50"), 4).alias("p99_over_p50"),
        "max_over_mean",
    )


_WMEDIAN_ORACLE = """
WITH w AS (
  SELECT round(l_extendedprice, 2) AS price, SUM(l_quantity) AS wt
  FROM lineitem GROUP BY 1),
o AS (
  SELECT price,
         SUM(wt) OVER (ORDER BY price ASC ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(wt) OVER () AS total
  FROM w)
SELECT MIN(price) AS weighted_median_price
FROM o WHERE cum >= total / 2
"""


@query("weighted_median_price", _WMEDIAN_ORACLE)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median (the quantity-weighted 'typical unit price' a
    plain median of line items distorts): collapse weights per price,
    walk the cumulative weight to the 50% crossing. The running sum is
    the distributed range-partition + offsets machinery
    (windows.with_global_running_sums) — never a single-partition
    window; one value returns."""
    li = _t(spark, sf_dir, "lineitem")
    # collapse to per-price weights first (groupBy), then the running
    # sum runs through the distributed range-partition + offsets
    # machinery — never a single-partition global window. l_quantity is
    # integer-valued, so the distributed partial sums are bit-exact.
    w = li.select(
        F.round("l_extendedprice", 2).alias("price"),
        F.col("l_quantity").alias("wt"),
    ).groupBy("price").agg(F.sum("wt").alias("wt"))
    r = windows.with_global_running_sums(w, ["price"], ["wt"])
    tot = w.agg(F.sum("wt").alias("total"))
    return (
        r.crossJoin(F.broadcast(tot))
        .filter(F.col("cum_wt") >= F.col("total") / 2)
        .agg(F.min("price").alias("weighted_median_price"))
    )


_CUSUM_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
  FROM orders GROUP BY 1),
m AS (SELECT AVG(rev) AS mu FROM daily),
c AS (
  SELECT day, rev,
         SUM(rev - m.mu) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
           AS cusum
  FROM daily CROSS JOIN m),
r AS (
  SELECT day, round(cusum, 2) AS cusum,
         ROW_NUMBER() OVER (ORDER BY abs(cusum) DESC, day ASC) AS rn
  FROM c)
SELECT day AS changepoint_day, cusum AS cusum_at_peak FROM r WHERE rn = 1
"""


@query("revenue_changepoint_cusum", _CUSUM_ORACLE)
def revenue_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point detection (public technique: the running sum
    of deviations from the global mean peaks where the level shifted):
    one pass to the daily aggregate, one calendar-bounded ordered
    window, and the argmax |CUSUM| is the single most likely
    change-point day — the question 'when did revenue regime-change?'
    answered without any model fitting."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("rev")
    ).transform(scoped_cache)
    m = daily.agg(F.avg("rev").alias("mu"))
    cum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = daily.crossJoin(F.broadcast(m)).select(
        "day", F.sum(F.col("rev") - F.col("mu")).over(cum).alias("cusum")
    )
    w = Window.orderBy(F.abs(F.col("cusum")).desc(), F.col("day").asc())
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("day").alias("changepoint_day"),
            F.round("cusum", 2).alias("cusum_at_peak"),
        )
    )


# ===================================================================
# Round-4 wave 33 — business-day arithmetic, bool_and/bool_or
# fulfillment classification
# ===================================================================

_BIZ_DAYS_ORACLE = """
WITH j AS (
  SELECT l_orderkey, l_linenumber,
         CAST(o_orderdate AS DATE) AS d0, CAST(l_shipdate AS DATE) AS d1
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate >= o_orderdate AND l_orderkey % 50 = 0),
b AS (
  SELECT l_orderkey, l_linenumber,
         len(list_filter(generate_series(d0, d1 - INTERVAL 1 DAY,
                                         INTERVAL 1 DAY),
                         d -> EXTRACT(isodow FROM d) <= 5)) AS biz_days
  FROM j)
SELECT l_orderkey, l_linenumber, CAST(biz_days AS BIGINT) AS business_days
FROM b
"""


@query("business_days_to_ship", _BIZ_DAYS_ORACLE)
def business_days_to_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Business-day arithmetic (SLA reporting counts weekdays, not
    calendar days): expand each order->ship interval into its date
    sequence and count ISO weekdays — exact for any span, array
    expressions only (no calendar join). Sampled to every 50th order:
    the per-row array is span-length-bounded, so the operator's cost is
    rows x average span, the same economics as the chunking family.
    Spark's weekday() is Monday=0, so <= 4 marks weekdays; the oracle
    uses isodow <= 5 — same set, different convention, hash-identical
    counts."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("o_orderdate").cast("date").alias("d0"),
            F.col("l_shipdate").cast("date").alias("d1"),
        )
    )
    days = F.sequence(
        F.col("d0"), F.date_sub(F.col("d1"), 1), F.expr("INTERVAL 1 DAY")
    )
    biz = F.size(F.filter(days, lambda d: F.weekday(d) <= 4))
    return j.select(
        "l_orderkey",
        "l_linenumber",
        # empty interval (same-day ship): sequence(d0, d0-1) is invalid,
        # so guard to zero
        F.when(F.col("d1") > F.col("d0"), biz)
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("business_days"),
    )


_FULFILL_ORACLE = """
WITH s AS (
  SELECT l_orderkey,
         bool_and(l_linestatus = 'F') AS all_f,
         bool_or(l_linestatus = 'F') AS any_f
  FROM lineitem GROUP BY l_orderkey)
SELECT CASE WHEN all_f THEN 'fulfilled'
            WHEN any_f THEN 'partial'
            ELSE 'open' END AS status,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM s GROUP BY 1
"""


@query("order_fulfillment_status", _FULFILL_ORACLE)
def order_fulfillment_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Universal/existential aggregation (bool_and / bool_or — the ALL
    and ANY quantifiers as grouped aggregates): classify each order by
    whether ALL, SOME, or NONE of its lines are finalized. One groupBy
    carrying two booleans per order; the classification is a projection.
    The pattern behind every 'is the batch fully processed?' gate."""
    li = _t(spark, sf_dir, "lineitem")
    s = li.groupBy("l_orderkey").agg(
        F.bool_and(F.col("l_linestatus") == "F").alias("all_f"),
        F.bool_or(F.col("l_linestatus") == "F").alias("any_f"),
    )
    status = (
        F.when(F.col("all_f"), "fulfilled")
        .when(F.col("any_f"), "partial")
        .otherwise("open")
    )
    return s.select(status.alias("status")).groupBy("status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )


# ===================================================================
# Round-4 wave 34 — interval-union sweep line, HLL set algebra,
# empirical-CDF resampling
# ===================================================================

_COVERED_ORACLE = """
WITH iv AS (
  SELECT user_id, ts AS s, ts + INTERVAL '5 minutes' AS e
  FROM events WHERE user_id IS NOT NULL),
pts AS (
  SELECT user_id, s AS t, 1 AS d FROM iv
  UNION ALL
  SELECT user_id, e, -1 FROM iv),
sw AS (
  SELECT user_id, t, d,
         SUM(d) OVER (PARTITION BY user_id ORDER BY t, d DESC
                      ROWS UNBOUNDED PRECEDING) AS active,
         lead(t) OVER (PARTITION BY user_id ORDER BY t, d DESC) AS nxt
  FROM pts)
SELECT user_id,
       CAST((CAST(SUM(CASE WHEN active > 0 AND nxt IS NOT NULL
                           THEN epoch_us(nxt) - epoch_us(t)
                           ELSE 0 END) AS BIGINT) + 3000) // 6000
            AS DOUBLE) / 1e4 AS covered_minutes
FROM sw GROUP BY user_id
"""


@query("covered_time_per_user", _COVERED_ORACLE)
def covered_time_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval UNION length (overlaps counted once — the question 'how
    long was the user actually active?' that summing per-event windows
    double-counts): the classic sweep line, relationally — each 5-minute
    activity interval emits +1/-1 endpoints, a per-user running sum
    tracks the active count, and segments where active > 0 contribute
    their length. End-before-start ordering at ties (d DESC puts +1
    first) makes touching intervals merge. One user-keyed window pass;
    the same shape computes concurrent-load curves and SLA coverage.

    Covered time is summed as EXACT integer microseconds and rounded to
    4 decimals in integer arithmetic ((us + 3000) div 6000, one final
    /1e4) — a double sum over thousands of segments per user differed
    from DuckDB in the last ulp at sf10 (1M events) and flipped the
    4-decimal rounding (caught by the r7 sf10 sweep; same class and
    same cure as funnel_click_to_purchase at sf1.0)."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    iv = e.select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("e"),
    )
    pts = iv.select(
        "user_id", F.col("s").alias("t"), F.lit(1).alias("d")
    ).unionAll(
        iv.select("user_id", F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    w = Window.partitionBy("user_id").orderBy(F.col("t"), F.col("d").desc())
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sw = pts.select(
        "user_id",
        "t",
        F.sum("d").over(cum).alias("active"),
        F.lead("t").over(w).alias("nxt"),
    )
    seg_us = F.when(
        (F.col("active") > 0) & F.col("nxt").isNotNull(),
        F.unix_micros("nxt") - F.unix_micros("t"),
    ).otherwise(F.lit(0).cast("bigint"))
    return (
        sw.groupBy("user_id")
        .agg(F.sum(seg_us).alias("__us"))
        .select(
            "user_id",
            (
                F.expr("(__us + 3000) div 6000").cast("double") / 1e4
            ).alias("covered_minutes"),
        )
    )


@query(
    "hll_intersection_estimate_gate",
    "SELECT true AS within_tolerance",
)
def hll_intersection_estimate_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch SET ALGEBRA: intersection size from HLL sketches via
    inclusion-exclusion (|A n B| = |A| + |B| - |A u B|, the union being
    the one operation HLL supports natively). Estimates the overlap
    between customers with orders below/above the median order value —
    two sketches + one union, no join of the underlying sets — and
    gates it against the exact overlap within 15% + a small absolute
    slack (inclusion-exclusion compounds the per-sketch error; that
    compounding is WHY the gate exists — it documents the technique's
    real tolerance, not an idealized one)."""
    o = _t(spark, sf_dir, "orders").transform(scoped_cache)
    # histogram-plan median (not percentile()'s per-task value buffer —
    # o_totalprice over a raw fact is the r8 sf10 OOM class)
    med = _hist_exact_percentiles(o, None, "o_totalprice", [0.5], ["m"])
    j = o.crossJoin(F.broadcast(med))
    lo = j.filter(F.col("o_totalprice") < F.col("m")).select("o_custkey")
    hi = j.filter(F.col("o_totalprice") >= F.col("m")).select("o_custkey")
    sa = lo.agg(F.hll_sketch_agg("o_custkey").alias("sk")).transform(scoped_cache)
    sb = hi.agg(F.hll_sketch_agg("o_custkey").alias("sk")).transform(scoped_cache)
    na = sa.select(F.hll_sketch_estimate("sk").alias("e")).first()["e"]
    nb = sb.select(F.hll_sketch_estimate("sk").alias("e")).first()["e"]
    nu = (
        sa.unionAll(sb)
        .agg(F.hll_union_agg("sk").alias("sk"))
        .select(F.hll_sketch_estimate("sk").alias("e"))
        .first()["e"]
    )
    est = na + nb - nu
    exact = lo.intersect(hi).count()
    ok = abs(est - exact) <= max(0.15 * max(exact, 1), 50)
    return spark.createDataFrame([(bool(ok),)], "within_tolerance boolean")


_RESAMPLE_ORACLE = """
WITH src AS (
  SELECT c_acctbal,
         CAST(ROW_NUMBER() OVER (ORDER BY c_acctbal, c_custkey) AS DOUBLE)
           / (SELECT COUNT(*) FROM customer) AS cdf
  FROM customer),
draws AS (
  SELECT i,
         (({hex}) % 100000 + 1) / 100001.0 AS u
  FROM generate_series(1, 500) AS g(i)),
m AS (
  SELECT d.i, d.u,
         (SELECT MIN(s.c_acctbal) FROM src s WHERE s.cdf >= d.u) AS v
  FROM draws d)
SELECT CAST(COUNT(*) AS BIGINT) AS n_draws,
       round(AVG(v), 4) AS resampled_mean,
       round(quantile_cont(v, 0.5), 4) AS resampled_median
FROM m
"""


@query(
    "empirical_resample_stats",
    _RESAMPLE_ORACLE.replace(
        "{hex}",
        _hex8_to_int("substring(md5('draw:' || CAST(i AS VARCHAR)), 1, 8)"),
    ),
)
def empirical_resample_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-transform sampling from an EMPIRICAL distribution (the
    synthetic-data generator that matches a real column's shape):
    deterministic md5 uniforms map through the account-balance ECDF via
    an as-of lookup (smallest value whose CDF >= u). The ECDF ranks use
    the distributed global numbering; the 500 draws broadcast against
    the sorted quantile table — a range join at scale. Output is the
    resample's summary stats, which converge on the source's as draws
    grow."""
    c = _t(spark, sf_dir, "customer")
    ranked, total = windows.with_global_row_number(
        c.select("c_acctbal", "c_custkey"), ["c_acctbal", "c_custkey"],
        rn_col="__rn",
    )
    src = ranked.select(
        "c_acctbal", (F.col("__rn").cast("double") / total).alias("cdf")
    )
    draws = spark.range(1, 501).select(
        F.col("id").alias("i"),
        (
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("draw:"), F.col("id").cast("string"))),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 100000
                + 1
            )
            / 100001.0
        ).alias("u"),
    )
    # as-of lookup: min value whose cdf >= u (draws broadcast; at scale
    # this is a range join against the sorted quantile table)
    m = (
        src.join(F.broadcast(draws), F.col("cdf") >= F.col("u"))
        .groupBy("i")
        .agg(F.min("c_acctbal").alias("v"))
    )
    return m.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_draws"),
        F.round(F.avg("v"), 4).alias("resampled_mean"),
        F.round(F.expr("percentile(v, 0.5)"), 4).alias("resampled_median"),
    )


# ===================================================================
# Round-4 wave 35 — decayed popularity, largest-remainder allocation
# ===================================================================

_DECAYED_ORACLE = """
WITH mx AS (SELECT MAX(l_shipdate) AS m FROM lineitem),
w AS (
  SELECT l_partkey,
         round(SUM(exp(-CAST(epoch_us(mx.m) - epoch_us(l_shipdate) AS DOUBLE)
                       / (30.0 * 86400e6))), 4) AS decayed_count,
         CAST(COUNT(*) AS BIGINT) AS raw_count
  FROM lineitem CROSS JOIN mx
  GROUP BY l_partkey),
r AS (
  SELECT l_partkey, decayed_count, raw_count,
         CAST(ROW_NUMBER() OVER (ORDER BY decayed_count DESC,
                                 l_partkey ASC) AS BIGINT) AS rnk
  FROM w)
SELECT l_partkey, decayed_count, raw_count, rnk FROM r WHERE rnk <= 10
"""


@query("decayed_part_popularity", _DECAYED_ORACLE)
def decayed_part_popularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted popularity (the recommender primitive raw counts
    get wrong: last year's bestseller should not outrank this week's):
    each sale contributes exp(-age/30d), summed per part — the decay is
    a pure projection against the broadcast max-date scalar, partial
    aggregation keeps the shuffle at one double per part, and top-10
    selection is TakeOrdered. Raw counts ride along to show where decay
    reorders the leaderboard."""
    li = _t(spark, sf_dir, "lineitem")
    mx = li.agg(F.max("l_shipdate").alias("m"))
    w = (
        li.crossJoin(F.broadcast(mx))
        .groupBy("l_partkey")
        .agg(
            F.round(
                F.sum(
                    F.exp(
                        -(
                            F.unix_micros("m") - F.unix_micros("l_shipdate")
                        ).cast("double")
                        / (30.0 * 86400e6)
                    )
                ),
                4,
            ).alias("decayed_count"),
            F.count(F.lit(1)).cast("bigint").alias("raw_count"),
        )
    )
    win = Window.orderBy(F.col("decayed_count").desc(), F.col("l_partkey").asc())
    return (
        w.orderBy(F.col("decayed_count").desc(), F.col("l_partkey").asc())
        .limit(10)
        .withColumn("rnk", F.row_number().over(win).cast("bigint"))
    )


_ALLOC_ORACLE = """
WITH li AS (
  SELECT l_orderkey, l_linenumber, l_extendedprice
  FROM lineitem WHERE l_orderkey % 100 = 0),
tot AS (
  SELECT l_orderkey,
         SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS order_total
  FROM li GROUP BY l_orderkey),
raw AS (
  SELECT li.l_orderkey, li.l_linenumber,
         -- allocate 10.00 in cents, proportional to line price
         1000.0 * CAST(li.l_extendedprice AS DECIMAL(18,4)) / t.order_total
           AS cents_exact
  FROM li JOIN tot t ON li.l_orderkey = t.l_orderkey),
fl AS (
  SELECT *, CAST(floor(cents_exact) AS BIGINT) AS cents_floor,
         cents_exact - floor(cents_exact) AS frac
  FROM raw),
need AS (
  SELECT l_orderkey,
         CAST(1000 - SUM(cents_floor) AS BIGINT) AS leftover
  FROM fl GROUP BY l_orderkey),
rk AS (
  SELECT fl.*, need.leftover,
         ROW_NUMBER() OVER (PARTITION BY fl.l_orderkey
                            ORDER BY fl.frac DESC, fl.l_linenumber ASC)
           AS frac_rank
  FROM fl JOIN need ON fl.l_orderkey = need.l_orderkey)
SELECT l_orderkey, l_linenumber,
       CAST(cents_floor + CASE WHEN frac_rank <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS alloc_cents
FROM rk
"""


@query("largest_remainder_allocation", _ALLOC_ORACLE)
def largest_remainder_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact monetary allocation by largest remainder (Hamilton's
    method, public): split a 10.00 fee across each order's lines
    proportionally to price so the cents SUM EXACTLY — floor every
    share, then hand the leftover cents to the largest fractional
    parts. Naive rounding leaks cents; this is the allocation ledgers
    and ad-spend attribution actually require. All window/groupBy work
    keys by order; the exact shares divide decimals so both engines
    agree bit-for-bit before the floor."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_orderkey") % 100 == 0
    ).select("l_orderkey", "l_linenumber", "l_extendedprice")
    tot = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias(
            "order_total"
        )
    )
    raw = li.join(tot, "l_orderkey").select(
        "l_orderkey",
        "l_linenumber",
        (
            F.lit(1000.0)
            * F.col("l_extendedprice").cast("decimal(18,4)")
            / F.col("order_total")
        ).alias("cents_exact"),
    )
    fl = raw.select(
        "l_orderkey",
        "l_linenumber",
        F.floor("cents_exact").cast("bigint").alias("cents_floor"),
        (F.col("cents_exact") - F.floor("cents_exact")).alias("frac"),
    )
    need = fl.groupBy("l_orderkey").agg(
        (F.lit(1000) - F.sum("cents_floor")).cast("bigint").alias("leftover")
    )
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("frac").desc(), F.col("l_linenumber").asc()
    )
    return (
        fl.join(need, "l_orderkey")
        .withColumn("frac_rank", F.row_number().over(w))
        .select(
            "l_orderkey",
            "l_linenumber",
            (
                F.col("cents_floor")
                + F.when(F.col("frac_rank") <= F.col("leftover"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("alloc_cents"),
        )
    )


# ===================================================================
# Round-4 wave 36 — clamped running inventory via the prefix-min
# identity
# ===================================================================

_INVENTORY_ORACLE = """
WITH d AS (
  SELECT l_partkey, l_shipdate, l_linenumber, l_orderkey,
         CASE WHEN l_returnflag = 'R' THEN l_quantity
              ELSE -l_quantity END AS delta
  FROM lineitem WHERE l_partkey % 200 = 0),
s AS (
  SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber,
         SUM(delta) OVER (PARTITION BY l_partkey
                          ORDER BY l_shipdate, l_orderkey, l_linenumber
                          ROWS UNBOUNDED PRECEDING) AS pref
  FROM d),
p AS (
  SELECT *, MIN(pref) OVER (PARTITION BY l_partkey
                            ORDER BY l_shipdate, l_orderkey, l_linenumber
                            ROWS UNBOUNDED PRECEDING) AS min_pref
  FROM s)
SELECT l_partkey,
       CAST(COUNT(*) AS BIGINT) AS n_moves,
       round(MAX(pref - least(min_pref, 0)), 2) AS peak_stock,
       CAST(SUM(CASE WHEN pref - least(min_pref, 0) = 0 THEN 1
                     ELSE 0 END) AS BIGINT) AS stockout_moves
FROM p GROUP BY l_partkey
"""


@query("clamped_running_inventory", _INVENTORY_ORACLE)
def clamped_running_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running inventory clamped at zero — a SEQUENTIAL-looking fold
    (stock can never go negative; sales against empty stock are lost,
    not borrowed) collapsed to a closed form: with prefix sums P_t,
    clamped stock S_t = P_t - min(0, min_{k<=t} P_k). Two stacked
    windows per part (prefix sum, then running min of it) replace any
    per-row state machine — the same windows-instead-of-recurrence
    move as events_since_last_purchase, for a fold that looks like it
    needs applyInPandas but doesn't (only folds with both clamps do;
    see ewma for the genuinely sequential case). Returns are inflow,
    sales outflow; per-part peak stock and stockout counts emerge."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_partkey") % 200 == 0)
    d = li.select(
        "l_partkey",
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_returnflag") == "R", F.col("l_quantity"))
        .otherwise(-F.col("l_quantity"))
        .alias("delta"),
    )
    order = ["l_shipdate", "l_orderkey", "l_linenumber"]
    wp = Window.partitionBy("l_partkey").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    p = d.withColumn("pref", F.sum("delta").over(wp)).withColumn(
        "min_pref", F.min("pref").over(wp)
    )
    stock = F.col("pref") - F.least(F.col("min_pref"), F.lit(0.0))
    return p.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_moves"),
        F.round(F.max(stock), 2).alias("peak_stock"),
        F.sum(F.when(stock == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("stockout_moves"),
    )


# ===================================================================
# Round-4 wave 37 — RLE event runs, grouped correlation, degree
# distribution slope
# ===================================================================

_RUNS_ORACLE = """
WITH e AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
                   IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS brk
  FROM events WHERE user_id IS NOT NULL),
g AS (
  SELECT user_id, event_type,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM e),
r AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS run_len
  FROM g GROUP BY user_id, event_type, run_id)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_runs,
       CAST(MAX(run_len) AS BIGINT) AS longest_run,
       round(AVG(run_len), 4) AS avg_run_len
FROM r GROUP BY event_type
"""


@query("event_type_runs", _RUNS_ORACLE)
def event_type_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length encoding of behavior streams (does the same action
    repeat in bursts? — the bot/rage-click signal): consecutive
    same-type events collapse into runs via the change-marker running
    sum (the islands trick keyed on VALUE change rather than time gap),
    then run lengths profile per type. Two user-keyed window passes +
    two groupBys."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    brk = F.when(
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
    ).otherwise(0)
    g = e.withColumn("brk", brk).withColumn("run_id", F.sum("brk").over(cum))
    r = g.groupBy("user_id", "event_type", "run_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("run_len")
    )
    return r.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_runs"),
        F.max("run_len").cast("bigint").alias("longest_run"),
        F.round(F.avg("run_len"), 4).alias("avg_run_len"),
    )


_GROUPED_CORR_ORACLE = """
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       round(corr(l_quantity, l_discount), 6) AS qty_discount_corr
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


@query("discount_qty_corr_by_brand", _GROUPED_CORR_ORACLE)
def discount_qty_corr_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped Pearson correlation (the price-sensitivity question 'do
    discounts move quantity?' answered PER BRAND — a global corr hides
    Simpson-style sign flips between segments): corr as a grouped
    aggregate over the broadcast part join, five running sums per
    group, one row per brand."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_discount"
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.round(F.corr("l_quantity", "l_discount"), 6).alias(
                "qty_discount_corr"
            ),
        )
    )


_DEGREE_DIST_ORACLE = """
WITH __pr AS (SELECT l_orderkey, l_partkey FROM lineitem GROUP BY 1, 2),
__e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM __pr a JOIN __pr b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
deg AS (
  SELECT node, COUNT(*) AS d FROM (
    SELECT u AS node FROM __e UNION ALL SELECT v FROM __e) GROUP BY node),
hist AS (
  SELECT d, CAST(COUNT(*) AS DOUBLE) AS cnt FROM deg GROUP BY d),
pts AS (SELECT ln(CAST(d AS DOUBLE)) AS x, ln(cnt) AS y FROM hist WHERE d > 0),
s AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM pts)
SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
       CAST((SELECT MAX(d) FROM deg) AS BIGINT) AS max_degree,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS loglog_slope
FROM s
"""


@query("degree_distribution_slope", _DEGREE_DIST_ORACLE)
def degree_distribution_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-distribution shape check (is this graph heavy-tailed? —
    the question that decides whether skew machinery like the
    degree-ordered triangle orientation is NEEDED): log-log OLS slope
    of the degree histogram, a power law showing as a straight negative
    slope. The histogram is |distinct degrees| rows, so the regression
    runs on a vanishing aggregate of the graph."""
    from etl_bigquery_pipeline_spark.operators import graph

    l = _t(spark, sf_dir, "lineitem")
    pr = scoped_cache(l.select("l_orderkey", "l_partkey").distinct())
    pairs = pr.alias("a").join(
        pr.alias("b"),
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
    )
    edges = graph.undirected_edges(pairs, "pa", "pb")
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    ).transform(scoped_cache)
    hist = deg.groupBy("d").agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    pts = hist.filter(F.col("d") > 0).select(
        F.log(F.col("d").cast("double")).alias("x"), F.log("cnt").alias("y")
    )
    s = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    meta = deg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.max("d").cast("bigint").alias("max_degree"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return meta.crossJoin(F.broadcast(s)).select(
        "n_nodes",
        "max_degree",
        F.round(num / den, 4).alias("loglog_slope"),
    )


# ===================================================================
# Round-4 wave 38 — cohort LTV, forecast backtest, CUPED
# ===================================================================

_LTV_ORACLE = """
WITH first_seen AS (
  SELECT user_id, CAST(date_trunc('month', MIN(ts)) AS DATE) AS cohort
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
rev AS (
  SELECT f.cohort,
         CAST(datediff('month', f.cohort,
                       CAST(date_trunc('month', e.ts) AS DATE)) AS BIGINT)
           AS month_age,
         CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS v
  FROM events e JOIN first_seen f ON e.user_id = f.user_id
  GROUP BY 1, 2),
size_ AS (SELECT cohort, COUNT(*) AS n_users FROM first_seen GROUP BY cohort),
cum AS (
  SELECT r.cohort, r.month_age,
         SUM(r.v) OVER (PARTITION BY r.cohort ORDER BY r.month_age
                        ROWS UNBOUNDED PRECEDING) AS cum_v
  FROM rev r)
SELECT c.cohort, c.month_age, CAST(s.n_users AS BIGINT) AS n_users,
       round(c.cum_v / s.n_users, 4) AS cum_value_per_user
FROM cum c JOIN size_ s ON c.cohort = s.cohort
"""


@query("cohort_ltv_curves", _LTV_ORACLE)
def cohort_ltv_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves (the revenue companion to retention_cohorts:
    how much cumulative value per user has each signup cohort produced
    by month-age N?): first-seen month assigns cohorts, monthly value
    aggregates per (cohort, age), and a cohort-keyed running sum builds
    the curve — every window is calendar-bounded, the user-level work is
    two groupBys."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("month", F.min("ts")).cast("date").alias("cohort")
    ).transform(scoped_cache)
    rev = (
        e.join(first_seen, "user_id")
        .groupBy(
            "cohort",
            F.months_between(
                F.date_trunc("month", "ts").cast("date"), F.col("cohort")
            )
            .cast("bigint")
            .alias("month_age"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("v"))
    )
    size = first_seen.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    w = Window.partitionBy("cohort").orderBy("month_age").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = rev.withColumn("cum_v", F.sum("v").over(w))
    return cum.join(F.broadcast(size), "cohort").select(
        "cohort",
        "month_age",
        F.col("n_users").cast("bigint").alias("n_users"),
        F.round(F.col("cum_v") / F.col("n_users"), 4).alias(
            "cum_value_per_user"
        ),
    )


_BACKTEST_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
  FROM orders GROUP BY 1),
p AS (
  SELECT day, rev,
         lag(rev, 7) OVER (ORDER BY day) AS pred
  FROM daily)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days_scored,
       round(AVG(abs(rev - pred)), 2) AS mae,
       round(AVG(abs(rev - pred) / rev), 6) AS mape,
       round(sqrt(AVG(pow(rev - pred, 2))), 2) AS rmse
FROM p WHERE pred IS NOT NULL
"""


@query("seasonal_naive_backtest", _BACKTEST_ORACLE)
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-quality floor (any model must beat this or it is
    worthless): the seasonal-naive predictor — tomorrow looks like the
    same weekday last week (lag 7 on the daily aggregate) — scored with
    MAE/MAPE/RMSE. The backtest IS a query: no fitting, one
    calendar-bounded window, three error aggregates. The baseline every
    forecasting deliverable should be benchmarked against and rarely
    is."""
    o = _t(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("rev")
    )
    w = Window.orderBy("day")
    p = daily.withColumn("pred", F.lag("rev", 7).over(w)).filter(
        F.col("pred").isNotNull()
    )
    err = F.abs(F.col("rev") - F.col("pred"))
    return p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days_scored"),
        F.round(F.avg(err), 2).alias("mae"),
        F.round(F.avg(err / F.col("rev")), 6).alias("mape"),
        F.round(F.sqrt(F.avg(F.pow(F.col("rev") - F.col("pred"), 2))), 2).alias(
            "rmse"
        ),
    )


_CUPED_ORACLE = """
WITH span AS (
  SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS mid_us FROM events),
u AS (
  SELECT e.user_id,
         CAST(SUM(CASE WHEN epoch_us(e.ts) < span.mid_us
                       THEN CAST(e.value AS DECIMAL(18,4))
                       ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS pre,
         CAST(SUM(CASE WHEN epoch_us(e.ts) >= span.mid_us
                       THEN CAST(e.value AS DECIMAL(18,4))
                       ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS post
  FROM events e CROSS JOIN span
  WHERE e.user_id IS NOT NULL
  GROUP BY e.user_id),
s AS (
  SELECT COUNT(*) AS n, covar_samp(pre, post) AS cov,
         var_samp(pre) AS vpre, var_samp(post) AS vpost, AVG(pre) AS mpre
  FROM u),
adj AS (
  SELECT var_samp(u.post - (s.cov / s.vpre) * (u.pre - s.mpre)) AS vadj
  FROM u CROSS JOIN s)
SELECT CAST(s.n AS BIGINT) AS n_users,
       round(s.cov / s.vpre, 6) AS theta,
       round(s.vpost, 4) AS var_post,
       round(adj.vadj, 4) AS var_adjusted,
       round(1.0 - adj.vadj / s.vpost, 6) AS variance_reduction
FROM s CROSS JOIN adj
"""


@query("cuped_variance_reduction", _CUPED_ORACLE)
def cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (public A/B-testing technique: regress the experiment
    metric on a pre-period covariate and analyze the residual — same
    mean, less variance, smaller sample sizes): per-user pre/post value
    from the data's own midpoint, theta = cov/var(pre) from one
    5-scalar aggregate, and the adjusted metric's variance measured in
    a second pass. The reported variance_reduction is the fraction of
    experiment noise the covariate explains — the number that justifies
    deploying CUPED at all."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    span = e.agg(
        F.floor(
            (F.unix_micros(F.min("ts")) + F.unix_micros(F.max("ts"))) / 2
        )
        .cast("bigint")
        .alias("mid_us")
    )
    j = e.crossJoin(F.broadcast(span))
    pre_case = F.when(
        F.unix_micros("ts") < F.col("mid_us"),
        F.col("value").cast("decimal(18,4)"),
    ).otherwise(F.lit(0).cast("decimal(18,4)"))
    post_case = F.when(
        F.unix_micros("ts") >= F.col("mid_us"),
        F.col("value").cast("decimal(18,4)"),
    ).otherwise(F.lit(0).cast("decimal(18,4)"))
    u = j.groupBy("user_id").agg(
        F.sum(pre_case).cast("double").alias("pre"),
        F.sum(post_case).cast("double").alias("post"),
    ).transform(scoped_cache)
    s = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.covar_samp("pre", "post").alias("cov"),
        F.var_samp("pre").alias("vpre"),
        F.var_samp("post").alias("vpost"),
        F.avg("pre").alias("mpre"),
    )
    adj = (
        u.crossJoin(F.broadcast(s))
        .select(
            (
                F.col("post")
                - (F.col("cov") / F.col("vpre")) * (F.col("pre") - F.col("mpre"))
            ).alias("a")
        )
        .agg(F.var_samp("a").alias("vadj"))
    )
    return s.crossJoin(F.broadcast(adj)).select(
        F.col("n").cast("bigint").alias("n_users"),
        F.round(F.col("cov") / F.col("vpre"), 6).alias("theta"),
        F.round("vpost", 4).alias("var_post"),
        F.round("vadj", 4).alias("var_adjusted"),
        F.round(1.0 - F.col("vadj") / F.col("vpost"), 6).alias(
            "variance_reduction"
        ),
    )


# ===================================================================
# Round-4 wave 39 — SRM assignment check, linear attribution
# ===================================================================

_SRM_ORACLE = f"""
WITH u AS (
  SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL),
a AS (
  SELECT user_id,
         ({_hex8_to_int("substring(md5('exp1:' || CAST(user_id AS VARCHAR)), 1, 8)")}) % 2
           AS arm
  FROM u),
c AS (
  SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n0,
         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1
  FROM a)
SELECT CAST(n0 AS BIGINT) AS arm_a,
       CAST(n1 AS BIGINT) AS arm_b,
       round(pow(n0 - (n0 + n1) / 2, 2) / ((n0 + n1) / 2)
             + pow(n1 - (n0 + n1) / 2, 2) / ((n0 + n1) / 2), 6) AS chi2,
       (pow(n0 - (n0 + n1) / 2, 2) / ((n0 + n1) / 2)
        + pow(n1 - (n0 + n1) / 2, 2) / ((n0 + n1) / 2)) < 3.84
         AS assignment_healthy
FROM c
"""


@query("srm_assignment_check", _SRM_ORACLE)
def srm_assignment_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check (the first gate on ANY experiment
    readout: if the 50/50 split isn't 50/50, every downstream metric is
    suspect): users assigned by salted md5 parity — the deterministic
    assignment a real experiment platform uses, replayable by the
    oracle — and the observed counts chi-square-tested against the
    expected split (3.84 = chi2 0.95 critical value at 1 df). One
    distinct + one 2-scalar aggregate."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    u = e.select("user_id").distinct()
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("exp1:"), F.col("user_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    c = u.select(arm.alias("arm")).agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("double")
        .alias("n0"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("double")
        .alias("n1"),
    )
    exp = (F.col("n0") + F.col("n1")) / 2
    chi2 = (
        F.pow(F.col("n0") - exp, 2) / exp + F.pow(F.col("n1") - exp, 2) / exp
    )
    return c.select(
        F.col("n0").cast("bigint").alias("arm_a"),
        F.col("n1").cast("bigint").alias("arm_b"),
        F.round(chi2, 6).alias("chi2"),
        (chi2 < 3.84).alias("assignment_healthy"),
    )


_LINEAR_ATTR_ORACLE = """
WITH p AS (
  SELECT user_id, ts AS p_ts, event_id AS p_id
  FROM events WHERE event_type = 'purchase' AND user_id IS NOT NULL),
touch AS (
  SELECT e.user_id, p.p_id, e.event_type, e.event_id
  FROM events e JOIN p
    ON e.user_id = p.user_id
   AND e.ts < p.p_ts
   AND e.ts >= p.p_ts - INTERVAL '24 hours'
  WHERE e.event_type <> 'purchase'),
n AS (
  SELECT p_id, COUNT(*) AS n_touches FROM touch GROUP BY p_id),
credit AS (
  SELECT t.event_type, 1.0 / n.n_touches AS c
  FROM touch t JOIN n ON t.p_id = n.p_id)
SELECT event_type,
       round(SUM(c), 4) AS attributed_purchases,
       CAST(COUNT(*) AS BIGINT) AS n_touchpoints
FROM credit GROUP BY event_type
"""


@query("linear_attribution", _LINEAR_ATTR_ORACLE)
def linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution (the fairness upgrade over
    first_touch_attribution: every touchpoint in the 24h window before
    a purchase shares the credit equally, so credit sums to exactly one
    per purchase): a time-bounded self-join builds the
    (touch, purchase) pairs — the same range-join shape as
    signup-followups, bounded on both ends so state never grows — and
    the per-purchase touch count normalizes the credit. The column to
    check is attributed_purchases: its total equals the number of
    purchases with >= 1 touch, by construction."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    touch = (
        e.filter(F.col("event_type") != "purchase")
        .join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("ts") < F.col("p_ts"))
            & (F.col("ts") >= F.col("p_ts") - F.expr("INTERVAL 24 HOURS")),
        )
        .select("p_id", "event_type")
        .transform(scoped_cache)
    )
    n = touch.groupBy("p_id").agg(F.count(F.lit(1)).alias("n_touches"))
    credit = touch.join(n, "p_id").select(
        "event_type", (F.lit(1.0) / F.col("n_touches")).alias("c")
    )
    return credit.groupBy("event_type").agg(
        F.round(F.sum("c"), 4).alias("attributed_purchases"),
        F.count(F.lit(1)).cast("bigint").alias("n_touchpoints"),
    )


# ===================================================================
# Round-4 wave 40 — price/volume revenue bridge
# ===================================================================

_BRIDGE_ORACLE = """
WITH mid AS (
  SELECT (epoch_us(MIN(l_shipdate)) + epoch_us(MAX(l_shipdate))) // 2 AS m
  FROM lineitem),
per AS (
  SELECT p.p_brand,
         CASE WHEN epoch_us(li.l_shipdate) < mid.m THEN 0 ELSE 1 END AS period,
         CAST(SUM(CAST(li.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty,
         CAST(SUM(CAST(li.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
  FROM lineitem li JOIN part p ON li.l_partkey = p.p_partkey
  CROSS JOIN mid
  GROUP BY 1, 2),
j AS (
  SELECT a.p_brand,
         a.qty AS q0, a.rev AS r0, a.rev / a.qty AS p0,
         b.qty AS q1, b.rev AS r1, b.rev / b.qty AS p1
  FROM per a JOIN per b
    ON a.p_brand = b.p_brand AND a.period = 0 AND b.period = 1)
SELECT p_brand,
       round(r1 - r0, 2) AS delta_rev,
       round((q1 - q0) * p0, 2) AS volume_effect,
       round(q0 * (p1 - p0), 2) AS price_effect,
       round((q1 - q0) * (p1 - p0), 2) AS mix_effect
FROM j
"""


@query("revenue_bridge_decomposition", _BRIDGE_ORACLE)
def revenue_bridge_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price/volume bridge (the 'WHY did revenue change?' decomposition
    every business review runs): between the data's two half-periods,
    per brand, delta revenue splits exactly into volume effect
    ((q1-q0) x p0), price effect (q0 x (p1-p0)), and the interaction
    mix term — the three sum to delta_rev by algebra, so the bridge is
    self-auditing. One star-join scan into a (brand, period) aggregate;
    the decomposition is a projection over the self-joined periods."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    mid = li.agg(
        F.floor(
            (F.unix_micros(F.min("l_shipdate")) + F.unix_micros(F.max("l_shipdate")))
            / 2
        )
        .cast("bigint")
        .alias("m")
    )
    per = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .crossJoin(F.broadcast(mid))
        .groupBy(
            "p_brand",
            F.when(F.unix_micros("l_shipdate") < F.col("m"), 0)
            .otherwise(1)
            .alias("period"),
        )
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("double")
            .alias("qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("rev"),
        )
        .transform(scoped_cache)
    )
    a = per.filter(F.col("period") == 0).select(
        "p_brand",
        F.col("qty").alias("q0"),
        F.col("rev").alias("r0"),
        (F.col("rev") / F.col("qty")).alias("p0"),
    )
    b = per.filter(F.col("period") == 1).select(
        "p_brand",
        F.col("qty").alias("q1"),
        F.col("rev").alias("r1"),
        (F.col("rev") / F.col("qty")).alias("p1"),
    )
    return a.join(b, "p_brand").select(
        "p_brand",
        F.round(F.col("r1") - F.col("r0"), 2).alias("delta_rev"),
        F.round((F.col("q1") - F.col("q0")) * F.col("p0"), 2).alias(
            "volume_effect"
        ),
        F.round(F.col("q0") * (F.col("p1") - F.col("p0")), 2).alias(
            "price_effect"
        ),
        F.round(
            (F.col("q1") - F.col("q0")) * (F.col("p1") - F.col("p0")), 2
        ).alias("mix_effect"),
    )


# ===================================================================
# Round-4 wave 41 — salted two-phase aggregation, markup density
# ===================================================================

_SALTED_AGG_ORACLE = """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS value_sum
FROM events WHERE user_id IS NOT NULL
GROUP BY user_id
"""


@query("salted_agg_parity", _SALTED_AGG_ORACLE)
def salted_agg_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase SALTED aggregation (the groupBy twin of salted_join —
    when one key owns a third of the rows, pre-aggregating under
    (key, salt) spreads the hot key over N reducers, and a second
    groupBy folds the partials): count and decimal-exact sum are both
    algebraic, so the salted result is IDENTICAL to the direct groupBy
    — which is exactly what the oracle checks. Spark's map-side partial
    aggregation already gives much of this for free; explicit salting
    is the insurance when partials can't combine (high-cardinality
    intermediates, exact distincts) — this query pins the algebra."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    salt = F.pmod(F.xxhash64("event_id"), F.lit(16)).alias("__salt")
    partial = e.groupBy("user_id", salt).agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("ps"),
    )
    return partial.groupBy("user_id").agg(
        F.sum("pn").cast("bigint").alias("n_events"),
        F.sum("ps").cast("double").alias("value_sum"),
    )


_MARKUP_ORACLE = """
WITH m AS (
  SELECT source,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(length(regexp_replace(text, '[^\\[\\](){}<>]', '', 'g'))
              AS DOUBLE) AS n_brackets,
         CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
           AS n_digits,
         CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)
           AS n_upper
  FROM documents WHERE length(text) > 0)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       round(AVG(n_brackets / n_chars), 6) AS bracket_density,
       round(AVG(n_digits / n_chars), 6) AS digit_density,
       round(AVG(n_upper / n_chars), 6) AS upper_density
FROM m GROUP BY source
"""


@query("markup_density_stats", _MARKUP_ORACLE)
def markup_density_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class densities (the cheap code-vs-prose /
    table-vs-text discriminators: brackets, digits, uppercase — the
    features a corpus router uses before spending tokenizer time):
    regexp strip-and-measure per class, one scan, per-source averages.
    Pure JVM regex, zero shuffle before the per-source rollup."""
    d = _t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n = F.length("text").cast("double")
    dens = lambda pat: (  # noqa: E731
        F.length(F.regexp_replace("text", pat, "")).cast("double") / n
    )
    m = d.select(
        "source",
        dens(r"[^\[\](){}<>]").alias("b"),
        dens(r"[^0-9]").alias("g"),
        dens(r"[^A-Z]").alias("u"),
    )
    return m.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(F.avg("b"), 6).alias("bracket_density"),
        F.round(F.avg("g"), 6).alias("digit_density"),
        F.round(F.avg("u"), 6).alias("upper_density"),
    )


# ===================================================================
# Round-4 wave 42 — grouped OLS, quantile-transform uniformity
# ===================================================================

_GROUPED_OLS_ORACLE = """
WITH s AS (
  SELECT p_brand, COUNT(*) AS n,
         SUM(CAST(p_size AS DOUBLE)) AS sx,
         SUM(p_retailprice) AS sy,
         SUM(CAST(p_size AS DOUBLE) * CAST(p_size AS DOUBLE)) AS sxx,
         SUM(CAST(p_size AS DOUBLE) * p_retailprice) AS sxy
  FROM part GROUP BY p_brand)
SELECT p_brand, CAST(n AS BIGINT) AS n_parts,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS size_slope,
       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 4)
         AS intercept
FROM s WHERE n * sxx - sx * sx <> 0
"""


@query("price_size_slope_by_brand", _GROUPED_OLS_ORACLE)
def price_size_slope_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED closed-form OLS (one regression per brand in a single
    aggregate — the 'fit thousands of tiny models' shape that a
    per-group sklearn loop gets catastrophically wrong at scale): the
    five sufficient statistics per group, slope and intercept as
    projections. Whether price rises with size is answered for every
    brand in one shuffle; groups with degenerate variance drop out via
    the denominator guard."""
    p = _t(spark, sf_dir, "part")
    x = F.col("p_size").cast("double")
    y = F.col("p_retailprice")
    s = p.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.filter(den != 0).select(
        "p_brand",
        F.col("n").cast("bigint").alias("n_parts"),
        F.round(num / den, 6).alias("size_slope"),
        F.round((F.col("sy") - num / den * F.col("sx")) / F.col("n"), 4).alias(
            "intercept"
        ),
    )


_QT_ORACLE = """
WITH r AS (
  SELECT c_acctbal,
         CAST(ROW_NUMBER() OVER (ORDER BY c_acctbal, c_custkey) - 1 AS DOUBLE)
           / (SELECT COUNT(*) - 1 FROM customer) AS u
  FROM customer),
h AS (
  SELECT CAST(least(floor(u * 10), 9) AS BIGINT) AS decile,
         COUNT(*) AS n
  FROM r GROUP BY 1),
t AS (SELECT SUM(n) AS total, COUNT(*) AS k FROM h)
SELECT CAST(t.k AS BIGINT) AS n_deciles,
       CAST(MIN(h.n) AS BIGINT) AS min_bucket,
       CAST(MAX(h.n) AS BIGINT) AS max_bucket,
       MAX(h.n) - MIN(h.n) <= 2 AS uniform
FROM h CROSS JOIN t GROUP BY t.k
"""


@query("quantile_transform_uniformity_gate", _QT_ORACLE)
def quantile_transform_uniformity_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile transform (map any column to uniform [0,1] by its own
    ECDF — the rank-based normalization robust to every outlier a
    z-score is not) with its defining property as the gate: the
    transformed deciles are uniform to within rounding (bucket sizes
    differ by at most 2 — ties and integer division, not noise). Ranks
    come from the distributed global numbering, never a
    single-partition window."""
    c = _t(spark, sf_dir, "customer").select("c_acctbal", "c_custkey")
    ranked, total = windows.with_global_row_number(
        c, ["c_acctbal", "c_custkey"], rn_col="__rn"
    )
    u = ranked.select(
        ((F.col("__rn") - 1).cast("double") / (total - 1)).alias("u")
    )
    h = u.groupBy(
        F.least(F.floor(F.col("u") * 10), F.lit(9)).cast("bigint").alias(
            "decile"
        )
    ).agg(F.count(F.lit(1)).alias("n"))
    t = h.agg(F.sum("n").alias("total"), F.count(F.lit(1)).alias("k"))
    return h.crossJoin(F.broadcast(t)).groupBy(F.col("k")).agg(
        F.min("n").cast("bigint").alias("min_bucket"),
        F.max("n").cast("bigint").alias("max_bucket"),
        ((F.max("n") - F.min("n")) <= 2).alias("uniform"),
    ).select(
        F.col("k").cast("bigint").alias("n_deciles"),
        "min_bucket",
        "max_bucket",
        "uniform",
    )


# ===================================================================
# Round-4 wave 43 — n-gram novelty, token-budget coverage
# ===================================================================

_NOVELTY_ORACLE = """
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS tk
  FROM documents),
sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(tk[i:i+2], ' ')
                        for i in generate_series(1, greatest(len(tk) - 2, 1))])
           AS grams
  FROM t),
ex AS (SELECT doc_id, unnest(grams) AS g FROM sh),
df AS (SELECT g, COUNT(DISTINCT doc_id) AS d FROM ex GROUP BY g),
m AS (
  SELECT ex.doc_id,
         COUNT(*) AS n_grams,
         COUNT(*) FILTER (WHERE df.d = 1) AS unique_grams
  FROM ex JOIN df ON ex.g = df.g
  GROUP BY ex.doc_id)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       round(CAST(unique_grams AS DOUBLE) / n_grams, 6) AS novelty
FROM m
"""


@query("ngram_novelty_scores", _NOVELTY_ORACLE)
def ngram_novelty_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty (the informativeness signal dual to the
    boilerplate ratio: what fraction of a document's 3-grams appear
    NOWHERE else in the corpus?): shingle-set explode, corpus document
    frequency per gram, per-doc unique fraction. The shuffle carries
    (gram-string, doc_id) — the standard shingle economy; high-novelty
    docs are the corpus's unique content, low-novelty ones are
    recombinations. Complements duplicate_ngram_spans (which hunts the
    SHARED side of the same distribution)."""
    d = _t(spark, sf_dir, "documents")
    # sh feeds two branches (gram aggregate + per-doc size) and is
    # deliberately NOT cached: materializing the gram arrays costs more
    # than re-running the codegen'd tokenize projection (measured 2x)
    sh = d.select(
        "doc_id", TX.tokens("text").alias("__tk")
    ).select(
        "doc_id",
        F.array_distinct(TX.shingles_of(F.col("__tk"), 3)).alias("__grams"),
    )
    ex = sh.select("doc_id", F.explode("__grams").alias("g"))
    # grams are distinct per doc, so count(1) per gram == document
    # frequency, and a d==1 gram's owner IS its min(doc_id) — uniqueness
    # counts fall out of the gram aggregate alone, with no join back of
    # the exploded gram set (which would shuffle every (gram, doc) pair
    # a second time; the gram-key shuffle here happens once)
    uniq = (
        ex.groupBy("g")
        .agg(F.count(F.lit(1)).alias("d"), F.min("doc_id").alias("doc_id"))
        .filter(F.col("d") == 1)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("unique_grams"))
    )
    n = sh.select("doc_id", F.size("__grams").cast("bigint").alias("n_grams"))
    return n.join(uniq, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.round(
            F.coalesce(F.col("unique_grams"), F.lit(0)).cast("double")
            / F.col("n_grams"),
            6,
        ).alias("novelty"),
    )


_BUDGET_ORACLE = """
WITH t AS (
  SELECT doc_id, n_chars,
         len(list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> ''))
           AS tok
  FROM documents),
o AS (
  SELECT doc_id, tok,
         SUM(tok) OVER (ORDER BY n_chars DESC, doc_id ASC
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM t)
SELECT CAST(COUNT(*) FILTER (WHERE cum <= 10000) AS BIGINT)
         AS docs_in_budget,
       CAST(coalesce(SUM(tok) FILTER (WHERE cum <= 10000), 0) AS BIGINT)
         AS tokens_used,
       round(CAST(coalesce(SUM(tok) FILTER (WHERE cum <= 10000), 0)
                  AS DOUBLE) / SUM(tok), 6) AS corpus_fraction
FROM o
"""


@query("token_budget_coverage", _BUDGET_ORACLE)
def token_budget_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget coverage (the planning question before a training
    run: ordering docs by priority, how many fit a 10k-token budget and
    what corpus fraction is that?): a running token sum over the
    priority order (length-desc here; any score column slots in), the
    budget crossing read off with filtered aggregates. The running sum
    goes through the distributed range-partition machinery
    (windows.with_global_running_sums) — priority order at corpus scale
    is a range sort, not a single-partition window."""
    d = _t(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "n_chars", TX.token_count("text").alias("tok")
    )
    r = windows.with_global_running_sums(
        t, [F.col("n_chars").desc(), F.col("doc_id").asc()], ["tok"]
    )
    in_b = F.col("cum_tok") <= 10000
    return r.agg(
        F.count_if(in_b).cast("bigint").alias("docs_in_budget"),
        F.coalesce(F.sum(F.when(in_b, F.col("tok"))), F.lit(0))
        .cast("bigint")
        .alias("tokens_used"),
        F.round(
            F.coalesce(F.sum(F.when(in_b, F.col("tok"))), F.lit(0)).cast(
                "double"
            )
            / F.sum("tok"),
            6,
        ).alias("corpus_fraction"),
    )


# ===================================================================
# Round-4 wave 44 — IR evaluation metrics (MRR / NDCG) for the
# truncated-dim ranking
# ===================================================================

_MRR_NDCG_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
           WHERE vec_id % 50 = 0 AND vec_id < {_ANN_PANEL_MAX_ID}),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
ex AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
           ORDER BY {_cosine_sql("qv", "cv")} DESC, neighbor_id ASC)
           AS ex_rank
  FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
ap AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
           ORDER BY {_cosine_sql_dims("qv", "cv", 16)} DESC,
                    neighbor_id ASC) AS ap_rank
  FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
j AS (
  SELECT ap.query_id, ap.ap_rank, ex.ex_rank
  FROM ap JOIN ex ON ap.query_id = ex.query_id
                 AND ap.neighbor_id = ex.neighbor_id
  WHERE ap.ap_rank <= 10),
mrr AS (
  SELECT query_id,
         coalesce(MAX(CASE WHEN ex_rank = 1 THEN 1.0 / ap_rank END), 0.0)
           AS rr
  FROM j GROUP BY query_id),
dcg AS (
  SELECT query_id,
         SUM(CASE WHEN ex_rank <= 10
                  THEN (11.0 - ex_rank) / (ln(ap_rank + 1) / ln(2))
                  ELSE 0 END) AS dcg
  FROM j GROUP BY query_id),
idcg AS (
  SELECT SUM((11.0 - i) / (ln(i + 1) / ln(2))) AS v
  FROM generate_series(1, 10) AS g(i))
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
       round(AVG(mrr.rr), 6) AS mrr,
       round(AVG(dcg.dcg / idcg.v), 6) AS ndcg_at_10
FROM mrr JOIN dcg ON mrr.query_id = dcg.query_id CROSS JOIN idcg
"""


@query("ann_mrr_ndcg_eval", _MRR_NDCG_ORACLE)
def ann_mrr_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IR-standard ranking evaluation for the truncated-dim ANN path:
    MRR (where does the exact top-1 neighbor land in the approximate
    ranking?) and NDCG@10 (graded relevance = 11 - exact rank,
    log-discounted by approximate position) — the metrics that say
    whether a cheaper ranking is good enough to SHOW, where recall
    gates only say whether it is good enough to PREFILTER. Both exact
    and 16-dim-prefix rankings come from `similarity.cosine_topk`
    (per-vector norms precomputed, narrow inputs widened — the first
    cut hand-rolled the pair scoring and recomputed both norms per
    pair over a 13-split scan, a 720s straggler at sf10); everything
    after is joins over (query, neighbor, rank) triples.

    Only the TOP-10 of each ranking matters: a pair outside the exact
    top-10 contributes grade 0 to NDCG and can never satisfy the
    MRR ex_rank=1 test, so the join is ap-top10 LEFT ex-top10 with the
    NULL ex_rank falling into the same 0 branches the full-rank join
    produced — identical aggregates, two orders of magnitude fewer
    rows ranked past the scoring scan."""
    from etl_bigquery_pipeline_spark.operators import similarity

    # widen BEFORE caching: the sf10 embeddings file is a single row
    # group, so a cache built straight off the scan materializes 13
    # planned partitions with ONE holding every row — and cosine_topk's
    # internal widen passes cached frames through, serializing the
    # whole pair compute into one task (the r10 sweep's 720s straggler)
    emb = widen_if_narrow(
        _t(spark, sf_dir, "embeddings"), "vec_id"
    ).transform(scoped_cache)
    probes = _ann_panel(emb, 50)

    def _sliced(df):
        return df.select(
            "vec_id",
            F.slice(F.col("embedding").cast("array<double>"), 1, 16).alias(
                "embedding"
            ),
        )

    ex = similarity.cosine_topk(
        emb, probes, k=10, id_col="vec_id", vec_col="embedding",
        query_id_col="query_id",
    ).select("query_id", "neighbor_id", F.col("rank").alias("ex_rank"))
    ap = similarity.cosine_topk(
        _sliced(emb), _sliced(probes), k=10, id_col="vec_id",
        vec_col="embedding", query_id_col="query_id",
    ).select("query_id", "neighbor_id", F.col("rank").alias("ap_rank"))
    j = ap.join(ex, ["query_id", "neighbor_id"], "left").transform(
        scoped_cache
    )
    mrr = j.groupBy("query_id").agg(
        F.coalesce(
            F.max(F.when(F.col("ex_rank") == 1, 1.0 / F.col("ap_rank"))),
            F.lit(0.0),
        ).alias("rr")
    )
    dcg = j.groupBy("query_id").agg(
        F.sum(
            F.when(
                F.col("ex_rank") <= 10,
                (11.0 - F.col("ex_rank"))
                / (F.log(F.col("ap_rank") + 1) / F.log(F.lit(2.0))),
            ).otherwise(0.0)
        ).alias("dcg")
    )
    idcg = sum((11.0 - i) / (__import__("math").log2(i + 1)) for i in range(1, 11))
    return (
        mrr.join(dcg, "query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_queries"),
            F.round(F.avg("rr"), 6).alias("mrr"),
            F.round(F.avg(F.col("dcg") / F.lit(idcg)), 6).alias("ndcg_at_10"),
        )
    )


# ===================================================================
# Round-4 wave 45 — dow/hour heatmap, aging buckets
# ===================================================================

_DOW_HOUR_ORACLE = """
SELECT CAST(EXTRACT(isodow FROM ts) AS BIGINT) AS iso_dow,
       CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       round(AVG(CAST(value AS DOUBLE)), 4) AS avg_value
FROM events GROUP BY 1, 2
"""


@query("events_heatmap_dow_hour", _DOW_HOUR_ORACLE)
def events_heatmap_dow_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 7x24 activity heatmap (when is traffic actually happening —
    the capacity-planning and anomaly-baseline view): ISO weekday x
    hour cells from one scan, at most 168 groups at any event volume so
    the shuffle is partial-aggregate states only. Spark's dayofweek is
    Sunday=1; normalized to ISO Monday=1 to match the calendar
    dimension's convention."""
    e = _t(spark, sf_dir, "events")
    iso_dow = ((F.dayofweek("ts") + 5) % 7 + 1).cast("bigint")
    return (
        e.groupBy(
            iso_dow.alias("iso_dow"),
            F.hour("ts").cast("bigint").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.avg(F.col("value").cast("double")), 4).alias("avg_value"),
        )
    )


_AGING_ORACLE = """
WITH now_ AS (SELECT MAX(o_orderdate) AS n FROM orders),
a AS (
  SELECT CASE
           WHEN datediff('day', CAST(o_orderdate AS DATE),
                         CAST(now_.n AS DATE)) <= 30 THEN '00-30d'
           WHEN datediff('day', CAST(o_orderdate AS DATE),
                         CAST(now_.n AS DATE)) <= 90 THEN '31-90d'
           WHEN datediff('day', CAST(o_orderdate AS DATE),
                         CAST(now_.n AS DATE)) <= 365 THEN '91-365d'
           ELSE '365d+' END AS bucket,
         o_totalprice
  FROM orders CROSS JOIN now_)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
         AS total_value
FROM a GROUP BY bucket
"""


@query("orders_aging_buckets", _AGING_ORACLE)
def orders_aging_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aging report (receivables/backlog style): orders bucketed by age
    against the data's own horizon — the reproducible stand-in for
    'today' — with counts and exact-decimal value per band. One scan,
    four groups; the CASE ladder is the same fixed-threshold device as
    length_bucket_batches (deterministic cross-engine, unlike float
    log-bucketing)."""
    o = _t(spark, sf_dir, "orders")
    now_ = o.agg(F.max("o_orderdate").alias("n"))
    age = F.datediff(
        F.col("n").cast("date"), F.col("o_orderdate").cast("date")
    )
    bucket = (
        F.when(age <= 30, "00-30d")
        .when(age <= 90, "31-90d")
        .when(age <= 365, "91-365d")
        .otherwise("365d+")
    )
    return (
        o.crossJoin(F.broadcast(now_))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            exact_sum("o_totalprice").alias("total_value"),
        )
    )


# ===================================================================
# Registration order for the driver's correctness sweep
# ===================================================================
# The driver's per-round sweep walks ``queries()`` in registration order
# and records a bounded prefix of it.  The 50 names below were recorded
# green in rounds 1-2 (CORRECTNESS_r01/r02); they are stable and
# deterministic, so they yield the front of the queue to queries that do
# not yet have a driver row.  This is pure ordering — no query is added,
# removed, or altered here.
# ===================================================================
# Round-5 wave 46 — semantic decontamination (embedding-space eval-set
# leakage), temperature-smoothed mixture rates
# ===================================================================

_SEMDECON_ORACLE = f"""
WITH e AS (SELECT vec_id AS eval_id, embedding AS ev
           FROM embeddings
           WHERE vec_id % 50 = 0 AND vec_id < {_ANN_PANEL_MAX_ID}),
planted AS (SELECT vec_id + 1000003 AS vec_id, embedding
            FROM embeddings
            WHERE vec_id % 100 = 0 AND vec_id < {_ANN_PANEL_MAX_ID}),
c AS (SELECT vec_id, embedding AS cv FROM
        (SELECT vec_id, embedding FROM embeddings
         WHERE vec_id % 50 <> 0 OR vec_id >= {_ANN_PANEL_MAX_ID}
         UNION ALL SELECT * FROM planted)),
m AS (
  SELECT c.vec_id, max({_cosine_sql("cv", "ev")}) AS max_eval_sim
  FROM c CROSS JOIN e GROUP BY c.vec_id)
SELECT vec_id, max_eval_sim
FROM m WHERE max_eval_sim >= 0.9
"""


def _semdecon_inputs(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(corpus, evals) for the decontamination pair: eval set = every
    50th vector; contamination planted by leaking every 100th eval
    vector back into the corpus under a shifted id (the corpus has no
    natural near-dups), same planting discipline as the dedup family."""
    emb = _t(spark, sf_dir, "embeddings")
    evals = _ann_panel(emb, 50).select("vec_id", "embedding")
    planted = _ann_panel(emb, 100).select(
        (F.col("vec_id") + 1000003).alias("vec_id"), "embedding"
    )
    # corpus = exact complement of the eval panel (plus the planted
    # leaks): the panel cap keeps the eval side a bounded broadcast at
    # any corpus scale — the operator's documented contract
    corpus = (
        emb.filter(
            (F.col("vec_id") % 50 != 0)
            | (F.col("vec_id") >= _ANN_PANEL_MAX_ID)
        )
        .select("vec_id", "embedding")
        .unionByName(planted)
    )
    return corpus, evals


@query("semantic_decontamination", _SEMDECON_ORACLE)
def semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space benchmark decontamination (the semantic companion
    to the n-gram `decontamination` query: paraphrased eval leakage that
    shares no 13-gram still sits next to its source in embedding space):
    flag corpus vectors whose max cosine vs ANY eval vector >= 0.9.
    Inputs per _semdecon_inputs; the operator is
    operators/similarity.semantic_decontaminate (exact path — eval set
    broadcast, corpus scanned once, per-corpus-row max folded map-side;
    the corpus never shuffles, the same economics as `decontamination`'s
    broadcast eval-grams). The LSH-prefiltered and persisted-index
    variants of the same operator are gated by
    semantic_decon_prefilter_gate."""
    from etl_bigquery_pipeline_spark.operators.similarity import (
        semantic_decontaminate,
    )

    corpus, evals = _semdecon_inputs(spark, sf_dir)
    return semantic_decontaminate(corpus, evals, threshold=0.9)


@query(
    "semantic_decon_prefilter_gate",
    "SELECT true AS subset_ok, true AS recall_ok",
)
def semantic_decon_prefilter_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quality gate for the approximate decontamination paths (same
    discipline as lsh_recall_vs_exact): the LSH-prefiltered flag set
    must be a SUBSET of the exact flags (structural — the prefilter
    only drops candidates before the exact cosine threshold, so any
    extra flag is a bug, not noise) and must recover >= 0.8 of them
    (4-bit hyperplanes + 1-flip multi-probe keep ~0.9 of true
    cosine>=0.9 pairs in expectation; planted leaks are exact
    duplicates, which always share a bucket). Emits one boolean row so
    the oracle is trivial while both bounds are computed in Spark."""
    from etl_bigquery_pipeline_spark.operators.similarity import (
        semantic_decontaminate,
    )

    corpus, evals = _semdecon_inputs(spark, sf_dir)
    exact = semantic_decontaminate(corpus, evals, threshold=0.9)
    approx = semantic_decontaminate(
        corpus, evals, threshold=0.9, prefilter="lsh", bits=4, max_flips=1
    )
    joined = (
        exact.select(F.col("vec_id"), F.lit(1).alias("__e"))
        .join(
            approx.select(F.col("vec_id"), F.lit(1).alias("__a")),
            "vec_id",
            "full_outer",
        )
    )
    return joined.agg(
        (F.sum(F.when(F.col("__e").isNull(), 1).otherwise(0)) == 0).alias(
            "subset_ok"
        ),
        (
            F.try_divide(
                F.sum(
                    F.when(
                        F.col("__e").isNotNull() & F.col("__a").isNotNull(),
                        1,
                    ).otherwise(0)
                ),
                F.sum(F.when(F.col("__e").isNotNull(), 1).otherwise(0)),
            )
            >= 0.8
        ).alias("recall_ok"),
    )


_TEMPMIX_ORACLE = """
WITH s AS (
  SELECT source,
         SUM(len(list_filter(regexp_split_to_array(text, '\\s+'),
                             x -> x <> ''))) AS tok
  FROM documents GROUP BY source),
t AS (SELECT SUM(tok) AS total, SUM(pow(tok, 0.5)) AS zsum FROM s)
SELECT source, CAST(tok AS BIGINT) AS tokens,
       round(tok / total, 6) AS share,
       round(pow(tok, 0.5) / zsum, 6) AS temp_weight,
       round((pow(tok, 0.5) / zsum) / (tok / total), 6) AS sample_rate
FROM s CROSS JOIN t
"""


@query("temperature_mixture_rates", _TEMPMIX_ORACLE)
def temperature_mixture_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed source mixing (the multilingual/multi-corpus
    sampling rule: weight source s by share^(1/T), T=2 — big sources
    down-weighted, small ones boosted, the standard alternative to the
    capacity-capped `mixture_waterfill_rates`). sample_rate is the
    relative up/down-sampling each source needs to hit its temperature
    weight. One token-count scan; everything after runs on the
    per-SOURCE aggregate with the normalizer as a 1-row broadcast."""
    d = _t(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.sum(TX.token_count("text")).cast("double").alias("tok")
    )
    t = s.agg(
        F.sum("tok").alias("__total"),
        F.sum(F.pow("tok", 0.5)).alias("__zsum"),
    )
    return s.crossJoin(F.broadcast(t)).select(
        "source",
        F.col("tok").cast("bigint").alias("tokens"),
        F.round(F.col("tok") / F.col("__total"), 6).alias("share"),
        F.round(F.pow("tok", 0.5) / F.col("__zsum"), 6).alias("temp_weight"),
        F.round(
            (F.pow("tok", 0.5) / F.col("__zsum"))
            / (F.col("tok") / F.col("__total")),
            6,
        ).alias("sample_rate"),
    )


# ===================================================================
# Round-6 wave 48 — BM25 retrieval scoring, Heaps-law vocab growth
# ===================================================================

_BM25_TERMS = ("merge", "vector", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75

_BM25_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
  FROM documents),
dl AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl FROM toks),
stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
  FROM (SELECT doc_id, unnest(t) AS term FROM toks)
  WHERE term IN ('merge', 'vector', 'window')
  GROUP BY doc_id, term),
df AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_terms,
         SUM( ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
              * tf.tf * ({_BM25_K1} + 1)
              / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / stats.avgdl)) ) AS score
  FROM tf
  JOIN df USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
  GROUP BY tf.doc_id)
SELECT doc_id, n_terms, round(score, 6) AS bm25
FROM scored
ORDER BY round(score, 6) DESC, doc_id
LIMIT 20
"""


@query("bm25_top_docs", _BM25_ORACLE)
def bm25_top_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 documents for a fixed 3-term query (the retrieval
    scoring dual of `tfidf_keywords`: tf saturation via k1, length
    normalization via b — what a training-pipeline's quality-by-query
    retrieval probe actually ranks with). Shape: the explode is filtered
    to the query terms BEFORE the groupBy, so the shuffle carries only
    matching (doc, term) pairs; df is a |query-terms|-row broadcast; N
    and avgdl ride one 1-row broadcast aggregate; the final top-20 is an
    ordered limit (TakeOrdered — no global sort). Ordering ties break on
    the ROUNDED score then doc_id so both engines pick the same 20."""
    k1, b = _BM25_K1, _BM25_B
    d = _t(spark, sf_dir, "documents")
    toks = widen_if_narrow(d, "doc_id").select(
        "doc_id", TX.tokens(F.lower(F.col("text"))).alias("t")
    )
    dl = toks.select(
        "doc_id", F.size("t").cast("double").alias("dl"), "t"
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("__n_docs"),
        F.avg("dl").alias("__avgdl"),
    )
    # tf is consumed twice (scoring + df counts); without the cache the
    # second consumer would re-run the tokenize+explode corpus scan —
    # the dominant cost at scale. Post-filter, tf is bounded by
    # |matching docs| x |query terms|, so the cache is small.
    tf = scoped_cache(
        dl.select("doc_id", "dl", F.explode("t").alias("term"))
        .filter(F.col("term").isin(list(_BM25_TERMS)))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    df_counts = tf.groupBy("term").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = idf * F.col("tf") * (k1 + 1) / (
        F.col("tf")
        + k1 * (1 - b + b * F.col("dl") / F.col("__avgdl"))
    )
    scored = (
        tf.join(F.broadcast(df_counts), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.sum(contrib).alias("score"),
        )
    )
    return (
        scored.select(
            "doc_id", "n_terms", F.round("score", 6).alias("bm25")
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


_HEAPS_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents),
m AS (SELECT MAX(doc_id) AS mx FROM documents),
grams AS (
  SELECT doc_id, unnest(t) AS g FROM toks
  UNION ALL
  SELECT doc_id,
         unnest([array_to_string(t[i:i+1], ' ')
                 for i in generate_series(1, greatest(len(t) - 1, 1))]) AS g
  FROM toks),
own AS (SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g),
nb AS (
  SELECT LEAST(CAST(FLOOR(first_doc * 10.0 / (mx + 1)) AS BIGINT), 9) AS bucket,
         COUNT(*) AS new_grams
  FROM own CROSS JOIN m
  GROUP BY 1),
tb AS (
  SELECT LEAST(CAST(FLOOR(doc_id * 10.0 / (mx + 1)) AS BIGINT), 9) AS bucket,
         SUM(len(t)) AS toks
  FROM toks CROSS JOIN m
  GROUP BY 1)
SELECT tb.bucket,
       CAST(SUM(tb.toks) OVER (ORDER BY tb.bucket) AS BIGINT) AS cum_tokens,
       CAST(SUM(COALESCE(nb.new_grams, 0)) OVER (ORDER BY tb.bucket) AS BIGINT) AS cum_vocab,
       CAST(COALESCE(nb.new_grams, 0) AS BIGINT) AS new_grams
FROM tb LEFT JOIN nb ON tb.bucket = nb.bucket
ORDER BY tb.bucket
"""


@query("heaps_law_vocab_growth", _HEAPS_ORACLE)
def heaps_law_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth curve: cumulative distinct vocabulary
    (unigrams + bigrams) vs cumulative tokens across ten equal-width
    doc_id buckets — the corpus-profiling curve that tells you whether
    more data still buys new content or the crawl has saturated.

    Scale shape: a gram's first appearance is just min(doc_id) inside
    the gram aggregate (the aggregate-side owner-derivation lens from
    `ngram_novelty_scores` — no join-back, no ordered scan), so the only
    data-proportional shuffle carries (gram, doc_id). Everything after
    is 10 bucket rows; the running sums are a bare window over that
    fixed-width frame (whitelisted)."""
    d = _t(spark, sf_dir, "documents")
    toks = widen_if_narrow(d, "doc_id").select(
        "doc_id", TX.tokens(F.col("text")).alias("t")
    )
    mx = d.agg(F.max("doc_id").alias("__mx"))

    def bucket(id_col: Column) -> Column:
        return F.least(
            F.floor(id_col * 10.0 / (F.col("__mx") + 1)).cast("bigint"),
            F.lit(9).cast("bigint"),
        )

    grams = toks.select(
        "doc_id",
        F.explode(
            F.concat(F.col("t"), TX.ngrams_of(F.col("t"), 2))
        ).alias("g"),
    )
    owners = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    new_per_bucket = (
        owners.crossJoin(F.broadcast(mx))
        .groupBy(bucket(F.col("first_doc")).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("new_grams"))
    )
    toks_per_bucket = (
        toks.select("doc_id", F.size("t").alias("n_tok"))
        .crossJoin(F.broadcast(mx))
        .groupBy(bucket(F.col("doc_id")).alias("bucket"))
        .agg(F.sum("n_tok").alias("toks"))
    )
    joined = toks_per_bucket.join(
        F.broadcast(new_per_bucket), "bucket", "left"
    ).select(
        "bucket",
        "toks",
        F.coalesce("new_grams", F.lit(0)).alias("new_grams"),
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        "bucket",
        F.sum("toks").over(w).cast("bigint").alias("cum_tokens"),
        F.sum("new_grams").over(w).cast("bigint").alias("cum_vocab"),
        F.col("new_grams").cast("bigint").alias("new_grams"),
    ).orderBy("bucket")


_DSIR_BUCKETS = 4096
_DSIR_CTE = f"""
toks AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS t
  FROM documents),
grams AS (
  SELECT doc_id, source,
         unnest([array_to_string(t[i:i+1], ' ')
                 for i in generate_series(1, greatest(len(t) - 1, 1))]) AS g
  FROM toks),
hb0 AS (
  SELECT doc_id, source, substring(md5('dsir:' || g), 1, 8) AS h
  FROM grams),
hb AS (
  SELECT doc_id, source, ({{HEX}}) % {_DSIR_BUCKETS} AS b FROM hb0),
agg AS (
  SELECT b, COUNT(*) AS cr,
         SUM(CASE WHEN CAST(substring(source, 4, 10) AS INT) % 4 = 0
                  THEN 1 ELSE 0 END) AS ct
  FROM hb GROUP BY b),
tot AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM agg),
sc AS (
  SELECT b, ln((ct + 1) / CAST(t.nt + {_DSIR_BUCKETS} AS DOUBLE))
           - ln((cr + 1) / CAST(t.nr + {_DSIR_BUCKETS} AS DOUBLE)) AS lr
  FROM agg CROSS JOIN tot t)
""".replace("{HEX}", _hex8_to_int("h"))

_DSIR_ORACLE = f"""
WITH {_DSIR_CTE}
SELECT h.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       round(AVG(s.lr), 6) + 0.0 AS dsir_logratio
FROM hb h JOIN sc s ON h.b = s.b
GROUP BY h.doc_id
"""


@query("dsir_importance_weights", _DSIR_ORACLE)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling" — public): score each
    document by the average log-likelihood ratio of its HASHED bigram
    features under an add-one-smoothed target bag-of-ngrams LM vs the
    raw-corpus LM. Target here = the deterministic quarter of sources
    with source number % 4 == 0 (the "curated" slice); raw = the full
    corpus (target included — a defined estimator, and at 100 TB the
    raw counts are what one pass gives you). Downstream, these weights
    feed Gumbel-top-k resampling; the weight computation is the
    distributed part and is emitted per-doc here.

    Scale shape: feature hashing (md5 -> 4096 buckets) makes BOTH
    distributions fixed-size — the gram shuffle aggregates map-side
    into <= 4096 rows regardless of corpus size, the per-bucket score
    table broadcasts back, and the per-doc mean is one more map-side
    partial aggregation. Two corpus scans total (bucket counts, then
    join-back) — deliberately NOT caching the exploded gram frame,
    which is corpus-token-sized. Only the per-doc AVG is
    merge-order-sensitive — rounded at 6 (unigram_xent_scores
    precedent), then + 0.0 on BOTH engines: a doc whose mean log-ratio
    is a hair below zero rounds to IEEE -0.0 on one engine and +0.0 on
    the other (DuckDB emitted '-0' at sf10, round-6 sweep), and a
    signed-zero difference is a real hash difference. Adding +0.0
    canonicalizes both zeros (-0.0 + 0.0 = +0.0 in IEEE 754)."""
    hb, sc_df = _dsir_gram_scores(_t(spark, sf_dir, "documents"))
    return (
        hb.join(F.broadcast(sc_df), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            (F.round(F.avg("lr"), 6) + F.lit(0.0)).alias("dsir_logratio"),
        )
    )


def _dsir_gram_scores(d: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Shared DSIR plumbing: (hb, sc) where hb = one row per bigram
    instance with its hashed feature bucket, and sc = the <= 4096-row
    per-bucket log-likelihood-ratio table (broadcast side)."""
    toks = widen_if_narrow(d, "doc_id").select(
        "doc_id", "source", TX.tokens(F.col("text")).alias("t")
    )
    grams = toks.select(
        "doc_id",
        "source",
        F.explode(TX.ngrams_of(F.col("t"), 2)).alias("g"),
    )
    hb = grams.select(
        "doc_id",
        "source",
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("dsir:"), F.col("g"))), 1, 8
                ),
                16,
                10,
            ).cast("bigint")
            % _DSIR_BUCKETS
        ).alias("b"),
    )
    is_target = F.substring("source", 4, 10).cast("int") % 4 == 0
    agg = hb.groupBy("b").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.when(is_target, 1).otherwise(0)).alias("ct"),
    )
    tot = agg.agg(F.sum("cr").alias("nr"), F.sum("ct").alias("nt"))
    B = F.lit(_DSIR_BUCKETS)
    sc_df = agg.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log((F.col("ct") + 1) / (F.col("nt") + B).cast("double"))
            - F.log((F.col("cr") + 1) / (F.col("nr") + B).cast("double"))
        ).alias("lr"),
    )
    return hb, sc_df


_DSIR_RESAMPLE_ORACLE = f"""
WITH {_DSIR_CTE},
dw AS (
  SELECT h.doc_id,
         SUM(CAST(floor(s.lr * 1000000000.0 + 0.5) AS BIGINT)) AS wi
  FROM hb h JOIN sc s ON h.b = s.b
  GROUP BY h.doc_id),
gu AS (
  SELECT doc_id, wi,
         substring(md5('gum:' || CAST(doc_id AS VARCHAR)), 1, 8) AS h8
  FROM dw),
keyd AS (
  SELECT doc_id,
         round(CAST(wi AS BIGINT) / 1000000000.0
               - ln(-ln((({_hex8_to_int("h8")}) % 100000 + 1)
                        / 100001.0)), 6) + 0.0 AS gumbel_key
  FROM gu),
r AS (
  SELECT doc_id, gumbel_key,
         CAST(ROW_NUMBER() OVER (ORDER BY gumbel_key DESC, doc_id ASC)
              AS BIGINT) AS rnk
  FROM keyd)
SELECT doc_id, gumbel_key, rnk FROM r WHERE rnk <= 100
"""


@query("dsir_gumbel_resample", _DSIR_RESAMPLE_ORACLE)
def dsir_gumbel_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR's second half: sample EXACTLY 100 documents without
    replacement with probability proportional to exp(importance weight)
    via the Gumbel-top-k trick (Xie et al. 2023 resample; Gumbel-max is
    public folklore) — key = log-weight + Gumbel(0,1), take the k
    largest. Working in LOG space is what makes this runnable: the doc
    log-weights (SUM of per-feature log-ratios, the paper's estimator)
    span hundreds of nats, so materializing exp(weight) for A-ES
    (weighted_reservoir_topk) would overflow; the Gumbel form never
    exponentiates.

    Determinism discipline (reservoir-sample precedent, plus the
    round-6 ladder lessons): the Gumbel uniform is the md5(doc_id)
    integer mapped into (0,1); the log-weight is summed as exact BIGINT
    nano-nats (each per-bucket lr is a bit-identical double on both
    engines, scaled and rounded once) so the merge order cannot move
    it; key = one identical divide + subtract chain, rounded 6 with a
    doc_id tie-break; + 0.0 canonicalizes signed zeros. Global top-k
    plans as TakeOrderedAndProject; ranks assigned over the 100
    survivors only."""
    hb, sc_df = _dsir_gram_scores(_t(spark, sf_dir, "documents"))
    dw = (
        hb.join(F.broadcast(sc_df), "b")
        .groupBy("doc_id")
        .agg(
            # floor(x + 0.5), not round(x, 0): Spark HALF_UPs the
            # shortest decimal repr while DuckDB rounds the binary
            # value, so a per-bucket lr landing on a representational
            # .5 tie would desync wi on the two engines (r6 ADVICE).
            # floor of the identical IEEE double is tie-stable.
            F.sum(
                F.floor(F.col("lr") * 1_000_000_000.0 + 0.5).cast("bigint")
            ).alias("wi")
        )
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("gum:"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 100000
        + 1
    ) / 100001.0
    key = (
        F.round(
            F.col("wi") / F.lit(1_000_000_000.0) - F.log(-F.log(u)), 6
        )
        + F.lit(0.0)
    ).alias("gumbel_key")
    top = (
        dw.select("doc_id", key)
        .orderBy(F.col("gumbel_key").desc(), F.col("doc_id").asc())
        .limit(100)
    )
    win = Window.orderBy(F.col("gumbel_key").desc(), F.col("doc_id").asc())
    return top.withColumn("rnk", F.row_number().over(win).cast("bigint"))


# ---- wave 50 (round 7): DOULION approximate triangle counting ----
# The exact m^1.5 wedge plan was proven the floor in r5 but died on
# single-node SPILL DISK at sf10 (SCALE.md). DOULION (Tsourakakis et
# al., KDD 2009 — public) sparsifies edges at probability p and scales
# the surviving count by 1/p^3: wedge work drops to p^1.5 of exact
# while the estimator stays unbiased. Same exact/approx pairing
# discipline as LSH-vs-brute-force: the estimate query is the scale
# path, the gate pins its error against the exact count at driver
# scales (measured rel_err: 0.105 @ sf0.001, 0.001 @ sf0.01 — the
# bound 0.15 binds at the SMALLEST sf and only tightens with scale).
# The coin is md5 of the canonical edge key, so the sample — and both
# engines' estimates — are bit-reproducible; p = 0.2 makes 1/p^3 = 125
# an exact integer, one BIGINT*constant multiply, no pow() ulp risk.

def _copurchase_edge_sql(alias_e: str = "e") -> str:
    return f"""
pr AS (SELECT l_orderkey, l_partkey FROM lineitem GROUP BY 1, 2),
{alias_e} AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      FROM pr a JOIN pr b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)"""


_DOULION_SAMPLED_CTE = f"""{_copurchase_edge_sql()},
eh AS (SELECT u, v,
              substring(md5('tri:' || CAST(u AS VARCHAR) || ':'
                            || CAST(v AS VARCHAR)), 1, 8) AS h8
       FROM e),
s AS (SELECT u, v FROM eh WHERE (({_hex8_to_int("h8")}) % 10) < 2),
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles_sampled
       FROM s e1 JOIN s e2 ON e2.u = e1.u AND e2.v > e1.v
                 JOIN s e3 ON e3.u = e1.v AND e3.v = e2.v)"""


_DOULION_ORACLE = f"""
WITH {_DOULION_SAMPLED_CTE}
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_edges_sampled,
       st.n_triangles_sampled,
       CAST(st.n_triangles_sampled * 125.0 AS DOUBLE) AS triangles_est
FROM st
"""


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    pr = scoped_cache(l.select("l_orderkey", "l_partkey").distinct())
    pairs = pr.alias("a").join(
        pr.alias("b"),
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
    )
    from etl_bigquery_pipeline_spark.operators import graph

    return graph.undirected_edges(pairs, "pa", "pb")


@query("copurchase_triangles_doulion", _DOULION_ORACLE)
def copurchase_triangles_doulion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOULION triangle estimate on the co-purchase graph at p = 0.2:
    the completes-at-any-scale companion to copurchase_triangles. The
    sampled subgraph goes through the identical degree-ordered m^1.5
    plan, but with 2.8% of the exact wedge volume (0.2^1.5) — measured
    at sf10 where the exact count exhausted single-node spill disk.
    The md5 coin makes the oracle's estimate bit-identical."""
    from etl_bigquery_pipeline_spark.operators import graph

    return graph.doulion_triangle_estimate(
        _copurchase_edges(spark, sf_dir), keep_num=2, keep_den=10
    )


_TRIANGLE_GATE_ORACLE = f"""
WITH {_DOULION_SAMPLED_CTE},
ex AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles_exact
       FROM e e1 JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
                 JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v)
SELECT ex.n_triangles_exact,
       CAST(st.n_triangles_sampled * 125.0 AS DOUBLE) AS triangles_est,
       floor(abs(st.n_triangles_sampled * 125.0 - ex.n_triangles_exact)
             / ex.n_triangles_exact * 1e6 + 0.5) / 1e6 AS rel_err,
       (abs(st.n_triangles_sampled * 125.0 - ex.n_triangles_exact)
        / ex.n_triangles_exact) <= 0.15 AS est_ok
FROM ex, st
"""


@query("triangle_sample_error_gate", _TRIANGLE_GATE_ORACLE)
def triangle_sample_error_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accuracy gate for the DOULION estimator: exact count and p=0.2
    estimate on the SAME edge set, relative error pinned <= 0.15 (the
    sf0.001 worst case is 0.105; variance shrinks as 1/sqrt(T*p^3), so
    the bound only loosens as the graph grows — scale-invariant in the
    r6 ladder's sense). Fully oracled: both engines replicate the
    deterministic sample, the exact count, and the error arithmetic,
    so this is a value-hash parity row, not a constant-true contract."""
    from etl_bigquery_pipeline_spark.operators import graph

    edges = scoped_cache(_copurchase_edges(spark, sf_dir))
    exact = graph.triangle_count(edges).select(
        F.col("n_triangles").alias("n_triangles_exact")
    )
    est = graph.doulion_triangle_estimate(edges, keep_num=2, keep_den=10)
    rel = (
        F.abs(F.col("triangles_est") - F.col("n_triangles_exact"))
        / F.col("n_triangles_exact")
    )
    return exact.crossJoin(est.select("triangles_est")).select(
        "n_triangles_exact",
        "triangles_est",
        # tie-stable rounding: Spark's round() HALF_UPs the shortest
        # decimal repr while DuckDB rounds the binary double, so a
        # representational .5 tie could desync — floor(x*1e6+0.5)/1e6
        # is bit-identical in both engines (same fix as dsir weights)
        (F.floor(rel * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias("rel_err"),
        (rel <= 0.15).alias("est_ok"),
    )


_DRIVER_COVERED_R02 = [
    "flagship_sales_rollup", "table_row_counts", "null_counts_orders",
    "dup_groups_lineitem_pk", "dup_groups_orderkey", "orphan_lineitem_part",
    "customers_without_orders", "range_lineitem", "range_part_price",
    "distinct_part_rows", "coercion_roundtrip", "split_packed_column",
    "clean_dropna", "topk_orders", "window_rank_parts",
    "set_except_customers", "revenue_by_segment", "rollup_region_nation",
    "dedup_exact_documents", "minhash_near_dup_pairs", "ngram_jaccard_pairs",
    "simhash_fingerprints", "similarity_topk", "embedding_near_dup_pairs",
    "token_stats_by_lang", "quality_scores", "doc_fingerprints",
    "json_extract_events", "events_tumbling_hourly", "events_sliding_1h_30m",
    "sessionization", "dq_report_lineitem", "set_intersect_union_nations",
    "cube_orders", "grouping_sets_orders", "semi_join_customers",
    "scalar_subquery_filter", "window_lag_running_orders",
    "pivot_event_counts", "unpivot_part_measures", "asof_join_error_signup",
    "range_join_signup_followups", "string_functions_part",
    "date_functions_orders", "math_functions_lineitem", "lang_id_confusion",
    "approx_distinct_orders", "lsh_cosine_topk", "array_functions_embeddings",
    "map_functions_events",
]

def _reorder_for_sweep() -> None:
    covered = [n for n in _DRIVER_COVERED_R02 if n in QUERIES]
    # newest-registered first: the driver's sweep is budget-bounded, so
    # the queries with the least prior verification (this round's
    # additions register last) must land earliest in the walk
    uncovered = [n for n in reversed(QUERIES) if n not in set(covered)]
    ordered = uncovered + covered
    for mapping in (QUERIES, ORACLE):
        snapshot = {n: mapping[n] for n in ordered if n in mapping}
        mapping.clear()
        mapping.update(snapshot)


_reorder_for_sweep()
