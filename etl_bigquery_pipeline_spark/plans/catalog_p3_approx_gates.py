"""Approximate operators, recall/error gates, corpus statistics — split from plans/catalog.py (r11).

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
    TX,
    Window,
    _t,
    dedup,
    dq,
    exact_sum,
    literal_frame,
    query,
    scoped_cache,
    similarity,
    widen_if_narrow,
    windows,
)
from etl_bigquery_pipeline_spark.plans.catalog_p2_llm_core import (
    _DIM,
    _ann_panel,
)
from pyspark.sql import Column

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
    # both sides are key-unique ((query_id, rank) is a dense per-query
    # ranking), so set equality is ONE full outer join counting
    # one-sided rows — the two-arm exceptAll shuffled each result four
    # times (guide §2.4: remove shuffles outright). Join on the KEY
    # only and compare neighbor_id/sim null-safely in the filter: sim
    # is a nullable double (try_divide; NULL for zero-norm vectors), and
    # a NULL join key never matches, so keying on sim would flag
    # identical NULL-sim rows as a mismatch where exceptAll (NULL=NULL)
    # matched them (r11 ADVICE #1).
    diff = (
        got.select(
            "query_id", "rank",
            F.col("neighbor_id").alias("__gn"), F.col("sim").alias("__gs"),
            F.lit(1).alias("__g"),
        )
        .join(
            want.select(
                "query_id", "rank",
                F.col("neighbor_id").alias("__wn"), F.col("sim").alias("__ws"),
                F.lit(1).alias("__w"),
            ),
            ["query_id", "rank"],
            "full_outer",
        )
        .filter(
            F.col("__g").isNull()
            | F.col("__w").isNull()
            | ~F.col("__gn").eqNullSafe(F.col("__wn"))
            | ~F.col("__gs").eqNullSafe(F.col("__ws"))
        )
    )
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
    bands = literal_frame(
        spark,
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


