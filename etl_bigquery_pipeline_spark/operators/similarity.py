"""Similarity search over embedding columns (north-star tier).

Two strategies over array<float> embeddings:

- ``cosine_topk``: exact brute force — broadcast the (small) query set
  against the corpus, JVM-side dot products, per-query top-k via window
  rank. The correctness baseline; at 100 TB it is one corpus scan per
  query batch with no corpus shuffle (queries are broadcast), which is the
  right exact plan.
- ``lsh_cosine_topk``: random-hyperplane LSH — bucket corpus and queries by
  sign-pattern hash, search only same-bucket (and optionally neighboring
  probes) candidates. Trades recall for a candidate set ~1/2^bits of the
  corpus; the scale path when the query batch is large.

Hyperplanes are generated driver-side from a fixed seed (numpy
RandomState), shipped as literal arrays — deterministic across runs and
engines. An IVF (k-means-partitioned) variant slots into the same contract
with trained centroids replacing random planes.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from etl_bigquery_pipeline_spark.functions.vectors import cosine, dot, norm
from etl_bigquery_pipeline_spark.operators.partitioning import widen_if_narrow


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    sim_decimals: int = 6,
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, sim, rank), self-matches excluded.

    ``queries`` is expected to be small (it is broadcast); ``corpus`` is
    scanned once. Ranking uses the rounded similarity with neighbor-id
    tie-break, so results are total-ordered and engine-reproducible.
    """
    # norms are per-vector, not per-pair: compute them in the pre-join
    # projections (once per row) so each pair costs one dot product.
    # Widen the corpus before scoring: small inputs arrive as one file
    # split and the per-pair dot products would run single-task (no-op on
    # wide at-scale inputs — no corpus shuffle at 100 TB).
    corpus = widen_if_narrow(corpus, id_col)
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("__qvec"),
        norm(vec_col).alias("__qnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        norm(vec_col).alias("__cnorm"),
    )
    sim = F.round(
        F.try_divide(
            dot(F.col("__qvec"), F.col("__cvec")),
            F.col("__qnorm") * F.col("__cnorm"),
        ),
        sim_decimals,
    ).alias("sim")
    scored = (
        c.join(F.broadcast(q), F.col(query_id_col) != F.col("neighbor_id"))
        .select(query_id_col, "neighbor_id", sim)
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "sim", "rank")
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    rs = np.random.RandomState(seed)
    return rs.standard_normal((bits, dim)).round(6).tolist()


def hyperplane_bucket(
    vec_col, *, dim: int, bits: int = 8, seed: int = 42
):
    """Sign-pattern LSH bucket id (string of 0/1) for an embedding column."""
    col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    planes = _hyperplanes(dim, bits, seed)
    bit_cols = []
    for plane in planes:
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        d = dot(col, lit_plane)
        bit_cols.append(F.when(d >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bit_cols)


def probe_buckets(bucket, *, bits: int, max_flips: int = 1):
    """Multi-probe expansion: the bucket code plus every code within
    Hamming distance ``max_flips`` (1 flip -> bits+1 probes)."""
    col = F.col(bucket) if isinstance(bucket, str) else bucket
    probes = [col]
    if max_flips >= 1:
        for i in range(bits):
            flipped = F.when(
                F.substring(col, i + 1, 1) == "1", F.lit("0")
            ).otherwise(F.lit("1"))
            probes.append(
                F.concat(F.substring(col, 1, i), flipped, F.substring(col, i + 2, bits - i - 1))
            )
    return F.array(*probes)


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = 64,
    bits: int = 4,
    seed: int = 42,
    sim_decimals: int = 6,
    probe_flips: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket
    neighborhood (multi-probe: own bucket + every bucket ``probe_flips``
    bit-flips away — single-probe recall on weakly-clustered data is only
    ~1/2^bits; one flip lifts it to ~(bits+1)/2^bits).

    The bucket join shuffles on a <=bits-char key; at scale the corpus is
    written bucketed-by(bucket), queries explode to their probe set, and no
    corpus shuffle happens at all — that persisted path is
    operators/ann_index.build_lsh_index / probe_lsh_index (probe results
    are value-identical to this operator at equal parameters).
    """
    bucket = lambda d: hyperplane_bucket(vec_col, dim=dim, bits=bits, seed=seed)  # noqa: E731
    # bits x dim dot products per corpus row for the bucket code — widen
    # the scan before computing (one-split small inputs otherwise
    # serialize the whole projection; wide inputs pass through untouched).
    c = widen_if_narrow(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        norm(vec_col).alias("__cnorm"),
        bucket(corpus).alias("__bucket"),
    )
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("__qvec"),
        norm(vec_col).alias("__qnorm"),
        F.explode(
            probe_buckets(
                bucket(queries), bits=bits, max_flips=probe_flips
            )
        ).alias("__bucket"),
    )
    sim = F.round(
        F.try_divide(
            dot(F.col("__qvec"), F.col("__cvec")),
            F.col("__qnorm") * F.col("__cnorm"),
        ),
        sim_decimals,
    ).alias("sim")
    scored = (
        c.join(F.broadcast(q), "__bucket")
        .filter(F.col(query_id_col) != F.col("neighbor_id"))
        .select(query_id_col, "neighbor_id", sim)
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "sim", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    dim: int = 64,
    bits: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH self-join: pairs in the
    same hyperplane bucket with cosine >= threshold (id_a < id_b).

    The join key alone is the 2^bits-value bucket code — a
    low-cardinality shuffle key, so at most 2^bits tasks would own ALL
    the within-bucket pair work (the r10 sf10 sweep measured the
    16-bucket default as a one-straggler 720s timeout at 200k vectors:
    ~1.25e9 pair dot products through <=16 cores). The self-join is
    therefore salted: the right side takes a slice = id % S, the left
    side replicates across all S slices (an exploded literal array —
    S copies of the smaller projected frame, not of the corpus scan),
    and the join key becomes (bucket, slice) — 2^bits * S tasks, same
    pair set, order-independent results."""
    # Widen before the bucket-code projection (see lsh_cosine_topk); when
    # the widen does repartition, the identical exchange under both
    # self-join sides is computed once (ReusedExchange).
    slices = 16
    # exact coordinate prefilter: for unit vectors, cos(u,w) >= t implies
    # ||u-w||^2 = 2(1-cos) <= 2(1-t), hence |u_k - w_k| <= sqrt(2(1-t))
    # for EVERY coordinate — a cheap scalar bound in the join condition
    # that rejects most within-bucket pairs before the 64-dim dot
    # product runs (at threshold 0.99 the bound is ~0.1414; the r10
    # sf10 sweep measured the unfiltered ~1.25e9 dots as a 720s
    # timeout). Two coordinates compound the rejection; a kept pair
    # still pays the full exact dot, so the output is unchanged.
    cbound = float((2.0 * (1.0 - threshold)) ** 0.5)
    b = widen_if_narrow(df, id_col).select(
        F.col(id_col),
        F.col(vec_col).alias("__v"),
        norm(vec_col).alias("__norm"),
        F.try_divide(
            F.element_at(vec_col, 1).cast("double"), norm(vec_col)
        ).alias("__nv1"),
        F.try_divide(
            F.element_at(vec_col, 2).cast("double"), norm(vec_col)
        ).alias("__nv2"),
        hyperplane_bucket(vec_col, dim=dim, bits=bits, seed=seed).alias("__bucket"),
    )
    l = b.withColumn(
        "__slice", F.explode(F.array(*[F.lit(i) for i in range(slices)]))
    ).alias("l")
    r = b.withColumn(
        "__slice", F.pmod(F.col(id_col), F.lit(slices)).cast("int")
    ).alias("r")
    sim = F.round(
        F.try_divide(
            dot(F.col("l.__v"), F.col("r.__v")),
            F.col("l.__norm") * F.col("r.__norm"),
        ),
        6,
    ).alias("cosine_sim")
    return (
        l.join(
            r,
            (F.col("l.__bucket") == F.col("r.__bucket"))
            & (F.col("l.__slice") == F.col("r.__slice"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            & (F.abs(F.col("l.__nv1") - F.col("r.__nv1")) <= F.lit(cbound))
            & (F.abs(F.col("l.__nv2") - F.col("r.__nv2")) <= F.lit(cbound)),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            sim,
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


# ------------------------------------------------------------------ IVF ---


def train_centroids(
    corpus: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    nlist: int = 16,
    sample_n: int = 2048,
    iters: int = 10,
    seed: int = 42,
) -> list[list[float]]:
    """Deterministic k-means centroids from a bounded, ordered sample.

    Driver-side training on <= sample_n vectors (the one sanctioned
    driver-side step: model fitting on a sample, like any ML pipeline);
    fixed seed + fixed iteration count + id-ordered sample make the
    centroids reproducible run-over-run.
    """
    rows = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(sample_n).collect()
    )
    x = np.array([list(r[1]) for r in rows], dtype=np.float64)
    rs = np.random.RandomState(seed)
    centroids = x[rs.choice(len(x), size=min(nlist, len(x)), replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(len(centroids)):
            members = x[assign == j]
            if len(members):
                centroids[j] = members.mean(axis=0)
    return centroids.round(6).tolist()


def _nearest_centroids(vec_col, centroids: list[list[float]], n: int):
    """Indices of the n nearest centroids (by dot product, desc; index asc
    tie-break) as an array column."""
    col = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    scored = F.array(
        *[
            F.struct(
                dot(col, F.array(*[F.lit(float(v)) for v in c])).alias("d"),
                F.lit(i).alias("i"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    ranked = F.reverse(F.array_sort(scored))  # by (d, i) asc -> reversed
    return F.transform(F.slice(ranked, 1, n), lambda s: s["i"])


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    nlist: int = 16,
    nprobe: int = 4,
    sample_n: int = 2048,
    seed: int = 42,
    sim_decimals: int = 6,
) -> DataFrame:
    """IVF approximate top-k: corpus partitioned by nearest trained
    centroid, queries probe their ``nprobe`` nearest cells.

    The scale shape: corpus is written partitioned/bucketed by cell id, so
    a query batch touches nprobe/nlist of the data with no corpus shuffle
    — that persisted path is operators/ann_index.build_ivf_index /
    probe_ivf_index (value-identical probes, centroids persisted in the
    index meta table). Expected recall beats random-hyperplane LSH at
    equal candidate budget because cells follow the data distribution.
    """
    # widen before the cell-assignment/scoring projections: a narrow
    # (or single-row-group) scan would otherwise run the whole per-pair
    # compute in one task (see widen_if_narrow's sf10 caveat)
    corpus = widen_if_narrow(corpus, id_col)
    centroids = train_centroids(
        corpus,
        vec_col=vec_col,
        id_col=id_col,
        nlist=nlist,
        sample_n=sample_n,
        seed=seed,
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        norm(vec_col).alias("__cnorm"),
        F.element_at(_nearest_centroids(vec_col, centroids, 1), 1).alias("__cell"),
    )
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("__qvec"),
        norm(vec_col).alias("__qnorm"),
        F.explode(_nearest_centroids(vec_col, centroids, nprobe)).alias("__cell"),
    )
    sim = F.round(
        F.try_divide(
            dot(F.col("__qvec"), F.col("__cvec")),
            F.col("__qnorm") * F.col("__cnorm"),
        ),
        sim_decimals,
    ).alias("sim")
    scored = (
        c.join(F.broadcast(q), "__cell")
        .filter(F.col(query_id_col) != F.col("neighbor_id"))
        .select(query_id_col, "neighbor_id", sim)
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "sim", "rank")
    )


def truncated_prefilter_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 5,
    prefix_dims: int = 16,
    candidate_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    sim_decimals: int = 6,
) -> DataFrame:
    """Matryoshka-style two-stage top-k: cheap prefilter on a dimension
    PREFIX, exact rerank on the full vector for candidates only.

    Stage 1 scores cosine on ``slice(vec, 1, prefix_dims)`` — the
    corpus-scan dot-product work drops to prefix_dims/dim of brute force —
    and keeps ``candidate_factor * k`` candidates per query (rounded-sim
    + neighbor-id total order, engine-reproducible). Stage 2 joins only
    those candidate pairs back to the full vectors (candidate set is
    query-batch-bounded, so it broadcasts; the corpus is never shuffled)
    and reranks exactly.

    Works when the embedding's leading dimensions carry most of the
    signal — true by construction for Matryoshka-trained embeddings and
    approximately for PCA'd ones. Fully deterministic given the inputs, so
    the whole two-stage trajectory is SQL-replayable (see
    truncated_dim_topk in plans/catalog.py) — unlike LSH/IVF whose quality
    is gated statistically instead.
    """
    pre = F.slice(F.col(vec_col), 1, prefix_dims)
    cand = cosine_topk(
        corpus.select(F.col(id_col), pre.alias(vec_col)),
        queries.select(F.col(id_col), pre.alias(vec_col)),
        k=candidate_factor * k,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        sim_decimals=sim_decimals,
    ).select(query_id_col, "neighbor_id")
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("__qvec"),
        norm(vec_col).alias("__qnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        norm(vec_col).alias("__cnorm"),
    )
    sim = F.round(
        F.try_divide(
            dot(F.col("__qvec"), F.col("__cvec")),
            F.col("__qnorm") * F.col("__cnorm"),
        ),
        sim_decimals,
    ).alias("sim")
    scored = (
        c.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(q), query_id_col)
        .select(query_id_col, "neighbor_id", sim)
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "sim", "rank")
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
    sim_decimals: int = 6,
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the top-k most-similar corpus vectors whose LABEL DIFFERS
    from the query's (the classic in-batch-negatives upgrade — the
    negatives that look most like positives are the informative ones).

    Same execution shape as cosine_topk: queries broadcast with
    precomputed norms, corpus scanned once (never shuffled), the label
    inequality fused into the join predicate so same-label pairs are
    dropped before the dot product is even evaluated. Ranking is on the
    rounded similarity with neighbor-id tie-break (total order,
    engine-reproducible). At 100 TB the per-executor cost is
    |queries| dot products per corpus row — batch the query set if it
    outgrows a broadcast."""
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(label_col).alias("__qlab"),
        F.col(vec_col).alias("__qvec"),
        norm(vec_col).alias("__qnorm"),
    )
    c = widen_if_narrow(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("__clab"),
        F.col(vec_col).alias("__cvec"),
        norm(vec_col).alias("__cnorm"),
    )
    sim = F.round(
        F.try_divide(
            dot(F.col("__qvec"), F.col("__cvec")),
            F.col("__qnorm") * F.col("__cnorm"),
        ),
        sim_decimals,
    ).alias("sim")
    scored = c.join(
        F.broadcast(q), F.col("__qlab") != F.col("__clab")
    ).select(query_id_col, "neighbor_id", sim)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "sim", "rank")
    )


def semantic_decontaminate(
    corpus: DataFrame | None,
    evals: DataFrame,
    *,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    prefilter: str | None = None,
    bits: int = 4,
    seed: int = 42,
    max_flips: int = 1,
    index_table: str | None = None,
    sim_decimals: int = 6,
) -> DataFrame:
    """Flag corpus vectors whose max cosine vs ANY eval vector meets
    ``threshold`` — embedding-space benchmark decontamination (the
    semantic companion to n-gram decontamination: a paraphrased eval
    leak shares no 13-gram but still sits next to its source in
    embedding space). Returns (id_col, max_eval_sim).

    Three candidate strategies, one contract:

    - ``prefilter=None`` (default, EXACT): eval set broadcast, corpus
      scanned once, per-row max folded map-side — the corpus never
      shuffles, so the pass costs one scan at any corpus size. Right
      whenever the eval set fits a broadcast (benchmark eval sets are
      bounded by construction), and the recall baseline for the rest.
    - ``prefilter="lsh"``: hyperplane-bucket the corpus map-side (no
      shuffle — the bucket is a projected expression), explode each
      eval vector to its multi-probe codes (own bucket + every
      ``max_flips``-flip neighbor), broadcast-join on the code. Each
      corpus row is scored only against evals probing its bucket:
      ~ (bits+1)/2^bits of the eval set instead of all of it. Flags
      are a strict SUBSET of the exact flags (the final threshold is
      the exact cosine; the prefilter only drops candidates) — recall
      is the only loss, gated in plans/catalog.py
      (semantic_decon_prefilter_gate), same discipline as
      lsh_recall_vs_exact.
    - ``index_table``: candidates from a PERSISTED LSH index
      (operators/ann_index.build_lsh_index) instead of re-hashing the
      corpus: eval probe codes are collected driver-side (bounded —
      |evals|×(bits+1) short strings) and pushed into the scan as
      bucket pruning, so non-matching bucket files are never read.
      The daily shape when the same corpus is decontaminated against
      rotating eval sets: hash the corpus once, probe per eval set.

    At 100 TB: every path scans the corpus at most once with zero
    corpus shuffle; eval-side work is broadcast. Choose exact for a
    one-shot sweep, the index for repeated sweeps, the inline LSH
    prefilter when the eval set is large enough that |corpus|×|evals|
    dot products dominate (the broadcast-join fan-out drops by
    ~2^bits/(bits+1)).
    """
    e_base = evals.select(
        F.col(vec_col).alias("__ev"), norm(vec_col).alias("__en")
    )
    sim = F.round(
        dot(F.col(vec_col), F.col("__ev"))
        / (F.col("__cn") * F.col("__en")),
        sim_decimals,
    )

    if index_table is not None:
        from etl_bigquery_pipeline_spark.operators.ann_index import _read_meta

        spark = evals.sparkSession
        meta = _read_meta(spark, index_table)
        if meta.get("kind") != "lsh":
            raise ValueError(
                f"{index_table!r} is a {meta.get('kind')!r} index; "
                "semantic_decontaminate probes LSH indexes only"
            )
        dim, bits, seed = meta["dim"], meta["bits"], meta["seed"]
        e = evals.select(
            F.col(vec_col).alias("__ev"),
            norm(vec_col).alias("__en"),
            F.explode(
                probe_buckets(
                    hyperplane_bucket(
                        vec_col, dim=dim, bits=bits, seed=seed
                    ),
                    bits=bits,
                    max_flips=max_flips,
                )
            ).alias("bucket"),
        )
        codes = sorted({r.bucket for r in e.select("bucket").collect()})
        c = (
            spark.table(index_table)
            .filter(F.col("bucket").isin(codes))
            .select(
                F.col("neighbor_id").alias(id_col),
                F.col("vec").alias(vec_col),
                F.col("vnorm").alias("__cn"),
                "bucket",
            )
        )
        scored = c.join(F.broadcast(e), "bucket")
    elif prefilter == "lsh":
        e = evals.select(
            F.col(vec_col).alias("__ev"),
            norm(vec_col).alias("__en"),
            F.explode(
                probe_buckets(
                    hyperplane_bucket(
                        vec_col, dim=dim, bits=bits, seed=seed
                    ),
                    bits=bits,
                    max_flips=max_flips,
                )
            ).alias("__bkt"),
        )
        c = widen_if_narrow(corpus, id_col).select(
            id_col,
            vec_col,
            norm(vec_col).alias("__cn"),
            hyperplane_bucket(vec_col, dim=dim, bits=bits, seed=seed).alias(
                "__bkt"
            ),
        )
        scored = c.join(F.broadcast(e), "__bkt")
    elif prefilter is None:
        c = widen_if_narrow(corpus, id_col).select(
            id_col, vec_col, norm(vec_col).alias("__cn")
        )
        scored = c.join(F.broadcast(e_base))
    else:
        raise ValueError(f"unknown prefilter {prefilter!r}")

    return (
        scored.groupBy(id_col)
        .agg(F.max(sim).alias("max_eval_sim"))
        .filter(F.col("max_eval_sim") >= threshold)
    )
