"""Tier 1 reference parity + Tier 1.5 relational breadth — split from plans/catalog.py (r11).

Queries register into the shared catalog_base.QUERIES/ORACLE via
the @query decorator at import; plans/catalog.py imports the part
modules in the original textual order, so registration order (and
the driver's sample-prefix derivation) is unchanged.
"""

from __future__ import annotations

from etl_bigquery_pipeline_spark.plans.catalog_base import (
    DataFrame,
    F,
    SparkSession,
    Window,
    _t,
    cleaning,
    dedup,
    exact_sum,
    query,
    to_double_or_null,
)

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


