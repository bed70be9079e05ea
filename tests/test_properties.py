"""Property-based tests (hypothesis): invariants that must hold for any
input, not just fixtures. Kept small — each property runs Spark jobs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_bigquery_pipeline_spark.functions import coercion
from etl_bigquery_pipeline_spark.operators import dedup

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

words = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=4), min_size=1, max_size=12
)


@SLOW
@given(ws=words)
def test_content_hash_whitespace_invariant(spark, ws):
    """Any whitespace layout of the same tokens hashes identically."""
    from etl_bigquery_pipeline_spark.functions.text import content_hash
    import pyspark.sql.functions as F

    normal = " ".join(ws)
    weird = "  " + "\t ".join(ws) + "   "
    df = spark.createDataFrame([(normal,), (weird,)], ["t"])
    hashes = [r.h for r in df.select(content_hash("t").alias("h")).collect()]
    assert hashes[0] == hashes[1]


@SLOW
@given(ws=words)
def test_jaccard_self_similarity_is_one(spark, ws):
    import pyspark.sql.functions as F

    text = " ".join(ws)
    df = spark.createDataFrame([(1, text), (2, text)], ["doc_id", "text"])
    pairs = dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", shingle_n=2, threshold=0.0, block_width=10
    ).collect()
    assert len(pairs) == 1 and pairs[0].jaccard_sim == 1.0


@SLOW
@given(
    vals=st.lists(
        st.one_of(
            st.integers(-10**6, 10**6).map(str),
            st.text(alphabet="xyz.", min_size=1, max_size=5),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_long_coercion_never_raises(spark, vals):
    """errors='coerce' semantics: any string input yields value-or-null,
    never an exception (ANSI mode notwithstanding)."""
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    out = df.select(coercion.to_long_or_null("v").alias("x")).collect()
    for src, row in zip(vals, out):
        try:
            expect = int(float(src))
        except ValueError:
            expect = None
        assert row.x == expect


@SLOW
@given(
    frac=st.floats(min_value=0.0, max_value=1.0),
    ids=st.lists(st.integers(min_value=0, max_value=10_000),
                 min_size=1, max_size=30, unique=True),
)
def test_weighted_sample_subset_of_higher_weight(spark, frac, ids):
    """For any keys and any weight w, sample(w) ⊆ sample(min(1, w+0.3)) —
    deterministic md5 thresholds are monotone in the weight."""
    import pyspark.sql.functions as F

    from etl_bigquery_pipeline_spark.operators import sampling

    df = spark.createDataFrame([(i,) for i in ids], ["k"])
    lo = {r.k for r in sampling.weighted_sample(df, F.lit(frac), "k").collect()}
    hi_frac = min(1.0, frac + 0.3)
    hi = {r.k for r in sampling.weighted_sample(df, F.lit(hi_frac), "k").collect()}
    assert lo <= hi


@SLOW
@given(ws=words)
def test_containment_bounds_jaccard(spark, ws):
    """For any two shingle sets A, B: jaccard(A,B) <= containment(A in B)
    — the asymmetric measure can only be more permissive."""
    import pyspark.sql.functions as F

    from etl_bigquery_pipeline_spark.functions.text import shingles
    from etl_bigquery_pipeline_spark.operators.dedup import jaccard

    a = " ".join(ws)
    b = " ".join(ws[: max(1, len(ws) // 2)]) + " zzz qqq www"
    df = spark.createDataFrame([(a, b)], ["ta", "tb"])
    row = df.select(
        jaccard(shingles("ta", 2), shingles("tb", 2)).alias("j"),
        (
            F.size(F.array_intersect(shingles("ta", 2), shingles("tb", 2)))
            / F.size(shingles("ta", 2)).cast("double")
        ).alias("c"),
    ).first()
    assert row.j <= row.c + 1e-12


@SLOW
@given(
    counts=st.lists(
        st.tuples(st.integers(min_value=0, max_value=50),
                  st.integers(min_value=1, max_value=1000)),
        min_size=1, max_size=20, unique_by=lambda t: t[0],
    ),
    k=st.integers(min_value=1, max_value=8),
)
def test_heavy_hitters_from_counts_invariants(spark, counts, k):
    """Shares sum to <= 1, cum_share is non-decreasing and ends at the
    sum of the top-k shares, ranks are 1..min(k, n_keys)."""
    from etl_bigquery_pipeline_spark.operators import skew

    df = spark.createDataFrame(counts, ["key", "n"])
    out = skew.heavy_hitters_from_counts(df, ["key"], "n", k=k).collect()
    assert [r.rnk for r in out] == list(range(1, min(k, len(counts)) + 1))
    ns = [r.n for r in out]
    assert ns == sorted(ns, reverse=True)
    # each share is rounded to 6 decimals, so the sum can exceed 1.0 by
    # up to half an ulp-of-rounding per row
    assert sum(r.share for r in out) <= 1.0 + 5e-7 * max(len(out), 1)
    cums = [r.cum_share for r in out]
    assert all(b >= a - 1e-9 for a, b in zip(cums, cums[1:]))
    assert abs(cums[-1] - sum(r.share for r in out)) < 1e-4


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=33),
    w=st.integers(min_value=1, max_value=33),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    ss=st.sampled_from(["444", "420", "422", "gray"]),
)
def test_jpeg_roundtrip_any_shape(h, w, seed, ss):
    """Baseline JPEG decode must handle ANY image shape (including 1-pixel
    and non-MCU-aligned edges) for every subsampling: correct output
    dims, and a smoothed image recovered within quantization loss."""
    import numpy as np

    from etl_bigquery_pipeline_spark.multimodal.jpeg import (
        decode_baseline_jpeg,
    )
    from tests.jpeg_fixture import encode_baseline_jpeg

    rng = np.random.RandomState(seed)
    # low-frequency content: JPEG loss stays small, so the bound is tight
    base = rng.randint(60, 196, (1, 1, 3))
    img = np.clip(
        base
        + np.arange(h)[:, None, None] * 2
        + np.arange(w)[None, :, None],
        0, 255,
    ).astype(np.uint8)
    payload = encode_baseline_jpeg(img, subsampling=ss)
    out = decode_baseline_jpeg(payload)
    assert out.shape == (h, w, 3)
    if ss == "gray":
        lum = (
            0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
        )
        assert np.abs(out[..., 0].astype(float) - lum).mean() < 6.0
    else:
        assert np.abs(out.astype(int) - img.astype(int)).mean() < 8.0


@settings(max_examples=40, deadline=None)
@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    ncolors=st.sampled_from([2, 3, 4, 7, 16, 256]),
    seed=st.integers(0, 10_000),
    interlace=st.booleans(),
)
def test_gif_roundtrip_any_shape(h, w, ncolors, seed, interlace):
    """GIF LZW round-trip for arbitrary sizes, palette widths, and
    interlace — pixel-exact by construction (lossless format)."""
    import numpy as np

    from etl_bigquery_pipeline_spark.multimodal import binary_ops
    from tests.gif_fixture import encode_gif

    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (ncolors, 3), dtype=np.uint8)
    rows = rng.randint(0, ncolors, (h, w)).astype(np.uint8)
    got = binary_ops.decode_image(encode_gif(rows, pal, interlace=interlace))
    assert np.array_equal(got, pal[rows])


@SLOW
@given(ws=words, seed=st.integers(0, 1000))
def test_bloom_prune_parity_any_keyset(spark, ws, seed):
    """bloom_pruned_join == plain join for arbitrary fact/dim key sets,
    including tiny code spaces (heavy false positives)."""
    import random

    from pyspark.sql import functions as F

    from etl_bigquery_pipeline_spark.operators import join_pruning as JP

    rnd = random.Random(seed)
    fact_keys = [rnd.randint(0, 20) for _ in range(30)]
    dim_keys = sorted({rnd.randint(0, 25) for _ in range(8)})
    fact = spark.createDataFrame([(k, i) for i, k in enumerate(fact_keys)], "k long, v long")
    dim = spark.createDataFrame([(k, str(k)) for k in dim_keys], "k long, name string")
    for m in (4, 1 << 17):
        got = sorted(map(tuple, JP.bloom_pruned_join(fact, dim, "k", m=m).collect()))
        want = sorted(map(tuple, fact.join(dim, "k").collect()))
        assert got == want


@SLOW
@given(ws=words)
def test_bpe_merge_preserves_characters(spark, ws):
    """Any merge sequence only regroups characters: stripping spaces from
    the merged sym always reproduces the original word."""
    from pyspark.sql import functions as F

    from etl_bigquery_pipeline_spark.operators import bpe

    docs = spark.createDataFrame([(1, " ".join(ws))], "doc_id long, text string")
    merges = [m["pair"] for m in bpe.train_bpe(docs, rounds=2)]
    vocab = bpe.segment_words(bpe.to_symbols(bpe.word_vocab(docs)), merges)
    for r in vocab.collect():
        assert r.sym.replace(" ", "") == r.word


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    seed=st.integers(0, 10_000),
    ss=st.sampled_from(["444", "420", "422", "gray"]),
    script=st.sampled_from(["spectral", "sa"]),
)
def test_progressive_jpeg_equals_baseline_any_shape(h, w, seed, ss, script):
    """For any image, a progressive encoding decodes to EXACTLY the same
    pixels as the baseline encoding (identical coefficients by
    construction) — covers empty bands, partial MCUs, EOB-run edges."""
    import numpy as np

    from etl_bigquery_pipeline_spark.multimodal.jpeg import decode_jpeg
    from tests.jpeg_fixture import (
        encode_baseline_jpeg,
        encode_progressive_jpeg,
    )

    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    base = decode_jpeg(encode_baseline_jpeg(arr, subsampling=ss))
    got = decode_jpeg(
        encode_progressive_jpeg(arr, subsampling=ss, script=script)
    )
    assert np.array_equal(got, base)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=0,
        max_size=25,
    )
)
def test_near_dup_clusters_matches_union_find(spark, edges):
    """For ANY pair set (self-loops, duplicates, reversed repeats,
    multiple components), the distributed min-label closure must agree
    with a sequential union-find: same node set, each node labeled with
    its component's minimum id. Exercises the label-sum convergence
    probe on arbitrary topologies."""
    pairs = [(a, b) for a, b in edges if a != b]
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    # component min == min over members sharing the same root
    roots: dict[int, int] = {}
    for x, r in want.items():
        roots[r] = min(roots.get(r, x), x)
    want = {x: roots[r] for x, r in want.items()}

    df = spark.createDataFrame(
        pairs or [(0, 0)], "id_a bigint, id_b bigint"
    ).filter("id_a != id_b")
    got = {
        r.node: r.cluster_id
        for r in dedup.near_dup_clusters(df).collect()
    }
    assert got == want
