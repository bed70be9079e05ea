"""Round-4 waves: survivorship, contamination, inference, hard negatives — split from plans/catalog.py (r11).

Queries register into the shared catalog_base.QUERIES/ORACLE via
the @query decorator at import; plans/catalog.py imports the part
modules in the original textual order, so registration order (and
the driver's sample-prefix derivation) is unchanged.
"""

from __future__ import annotations

from etl_bigquery_pipeline_spark.plans.catalog_base import (
    DataFrame,
    F,
    QUERIES,
    SparkSession,
    Window,
    _t,
    dedup,
    exact_sum,
    norm,
    quality_model,
    literal_frame,
    query,
    scoped_cache,
    sessionize,
    similarity,
    windows,
)
from etl_bigquery_pipeline_spark.plans.catalog_p2_llm_core import (
    _ANN_PANEL_MAX_ID,
    _DIM,
    _MINHASH_ORACLE,
    _ann_panel,
    _cosine_sql,
)
from etl_bigquery_pipeline_spark.plans.catalog_p3_approx_gates import (
    _recall_ok,
)
from etl_bigquery_pipeline_spark.plans.catalog_p4_breadth import (
    _CLUSTERS_ORACLE,
    _hex8_to_int,
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
    # r11 A/B note: semi-joining the signature pass down to pair-member
    # docs (guide §3.2) measured SLOWER at sf0.1 (8.4s vs 5.8s) — the
    # pair set must then materialize through a cache before the one
    # fused action, and the panel is fixed-size (_MH_EST_GATE_MAX_ID)
    # so the pruning buys nothing at scale either; kept single-action.
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
    return literal_frame(spark, [(bool(ok),)], "loss_decreasing boolean")


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
    return literal_frame(
        spark,
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
    pairs = graph.cooccurrence_pairs(l, "l_orderkey", "l_partkey")
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
    pairs = graph.cooccurrence_pairs(l, "l_orderkey", "l_partkey")
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
    strong = (
        graph.cooccurrence_pairs(l, "l_orderkey", "l_partkey")
        .groupBy(F.col("pa").alias("u"), F.col("pb").alias("v"))
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


