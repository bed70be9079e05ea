"""Distributed BPE vocabulary training (operators/bpe)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_bigquery_pipeline_spark.operators import bpe

SF0001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(
        [(1, "low low lower lowest"), (2, "new newer newest low")],
        "doc_id bigint, text string",
    )


def test_word_vocab_counts(tiny):
    v = {r.word: r.wc for r in bpe.word_vocab(tiny).collect()}
    assert v["low"] == 3 and v["newer"] == 1 and len(v) == 6


def test_to_symbols_char_join(tiny):
    s = {r.word: r.sym for r in bpe.to_symbols(bpe.word_vocab(tiny)).collect()}
    assert s["low"] == "l o w"
    assert s["newest"] == "n e w e s t"


def test_pair_counts_weighted(tiny):
    pc = {r.pair: r.n for r in
          bpe.pair_counts(bpe.to_symbols(bpe.word_vocab(tiny))).collect()}
    # "l o": in low(3) + lower(1) + lowest(1) = 5
    assert pc["l o"] == 5 and pc["o w"] == 5
    assert pc["e r"] == 2  # lower + newer


def test_apply_merge_respects_symbol_boundaries(spark):
    # after merging "a b" -> "ab", the pair "b c" must NOT match inside
    # "ab c" (the space padding guards the boundary)
    df = spark.createDataFrame([("a b c d",)], "sym string").withColumn(
        "wc", F.lit(1)
    )
    m1 = bpe.apply_merge(df, "a b").first()["sym"]
    assert m1 == "ab c d"
    m2 = bpe.apply_merge(
        spark.createDataFrame([(m1,)], "sym string"), "b c"
    ).first()["sym"]
    assert m2 == "ab c d"  # unchanged: no standalone "b c" remains


def test_apply_merge_overlap_single_pass(spark):
    # documented variant: single-pass replace resolves "l l l l" to
    # "ll l l" (greedy leftmost with gap), identically on both engines
    df = spark.createDataFrame([("l l l l",)], "sym string")
    assert bpe.apply_merge(df, "l l").first()["sym"] == "ll l l"


def test_train_bpe_top_counts_non_increasing(spark):
    docs = spark.read.parquet(f"{SF0001}/documents.parquet")
    merges = bpe.train_bpe(docs, rounds=4)
    assert len(merges) == 4
    ns = [m["n"] for m in merges]
    assert all(b <= a for a, b in zip(ns, ns[1:]))
    assert all(m["merged"] == m["pair"].replace(" ", "") for m in merges)


def test_segment_words_applies_all_merges(tiny):
    vocab = bpe.to_symbols(bpe.word_vocab(tiny))
    seg = bpe.segment_words(vocab, ["l o", "lo w", "e r"])
    s = {r.word: r.sym for r in seg.collect()}
    assert s["low"] == "low"
    assert s["lower"] == "low er"
    assert s["newest"] == "n e w e s t"


def test_token_counts_inference_shape(tiny):
    # merges: "l o" then "lo w" => "low" is 1 subtoken, "lower" is 3
    # ("low", "e", "r"), "new" stays 3 chars
    counts = {r.doc_id: (r.n_words, r.n_subtokens)
              for r in bpe.token_counts(tiny, ["l o", "lo w"]).collect()}
    # doc1: low(1) low(1) lower(3) lowest(4) = 4 words, 9 subtokens
    assert counts[1] == (4, 9)
    # doc2: new(3) newer(5) newest(6) low(1) = 4 words, 15 subtokens
    assert counts[2] == (4, 15)


def test_token_counts_no_merges_equals_chars(tiny):
    got = {r.doc_id: r.n_subtokens
           for r in bpe.token_counts(tiny, []).collect()}
    want = {
        r.doc_id: sum(len(w) for w in r.text.split())
        for r in tiny.collect()
    }
    assert got == want
