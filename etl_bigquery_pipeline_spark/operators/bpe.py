"""Distributed BPE vocabulary training (LLM-pipeline tier).

Byte-pair encoding learns a subword vocabulary by repeatedly merging the
most frequent adjacent symbol pair. The naive formulation rescans the
corpus per merge; the classic trick (Sennrich et al. 2016, public) makes
each round VOCAB-bounded instead of corpus-bounded:

1. One corpus pass builds the distinct-word frequency table
   (word, count) — the only shuffle proportional to corpus size.
2. Every subsequent round operates on that table: adjacent-pair counts
   weighted by word frequency (map-side partial sums over <= |vocab|
   rows), argmax pair (ONE row collected to the driver), merge applied
   as a projection.

At 100 TB the word table is ~10^7 rows regardless of corpus size, so 50
merge rounds cost 50 tiny vocab-table jobs after a single corpus scan.

Representation: a word's symbol sequence is a SPACE-JOINED string
("h e l l o"); symbols themselves never contain spaces, so applying merge
(a, b) is `replace(' '||sym||' ', ' a b ', ' ab ')` + trim. The space
padding prevents matches across symbol boundaries, and left-to-right
non-overlapping `replace` semantics are identical in Spark and DuckDB —
which makes the whole training trajectory SQL-replayable (all counts are
integers: no float determinism concerns anywhere). Note the single-pass
replace resolves overlapping runs ("l l l l" -> "ll l l", not "ll ll")
the same way on both engines; this greedy-leftmost-with-gap behavior is a
documented variant of BPE's usual repeated-scan merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wc): distinct-word frequencies — the one corpus-wide
    shuffle. Map-side partial counts collapse repeats before exchange."""
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def to_symbols(vocab: DataFrame) -> DataFrame:
    """Add ``sym``: the word as a space-joined character sequence."""
    return vocab.withColumn(
        "sym", F.array_join(F.split(F.col("word"), ""), " ")
    )


def pair_counts(vocab_sym: DataFrame) -> DataFrame:
    """(pair, n): adjacent symbol pairs weighted by word frequency.
    Bounded by total symbols across the VOCAB, not the corpus."""
    pairs = F.expr(
        "zip_with(slice(__toks, 1, size(__toks) - 1), "
        "slice(__toks, 2, size(__toks) - 1), (a, b) -> concat(a, ' ', b))"
    )
    return (
        vocab_sym.withColumn("__toks", F.split(F.col("sym"), " "))
        .select(F.explode(pairs).alias("pair"), "wc")
        .groupBy("pair")
        .agg(F.sum("wc").alias("n"))
    )


def apply_merge(vocab_sym: DataFrame, pair: str) -> DataFrame:
    """Merge one pair ("a b" -> "ab") across the vocab — a projection."""
    merged = pair.replace(" ", "")
    return vocab_sym.withColumn(
        "sym",
        F.trim(
            F.replace(
                F.concat(F.lit(" "), F.col("sym"), F.lit(" ")),
                F.lit(f" {pair} "),
                F.lit(f" {merged} "),
            )
        ),
    )


def train_bpe(
    docs: DataFrame, rounds: int = 3, text_col: str = "text"
) -> list[dict]:
    """Learn ``rounds`` merges. Returns [{round, pair, merged, n}, ...].
    Driver traffic: ONE (pair, n) row per round; everything else stays
    distributed. The vocab lineage is rebuilt lazily per round (cheap:
    |vocab| rows through `replace` projections)."""
    vocab = to_symbols(word_vocab(docs, text_col))
    merges: list[dict] = []
    for rnd in range(1, rounds + 1):
        top = (
            pair_counts(vocab)
            .orderBy(F.col("n").desc(), F.col("pair").asc())
            .first()
        )
        if top is None:
            break
        merges.append(
            {
                "round": rnd,
                "pair": top["pair"],
                "merged": top["pair"].replace(" ", ""),
                "n": top["n"],
            }
        )
        vocab = apply_merge(vocab, top["pair"])
    return merges


def segment_words(
    vocab_or_docs: DataFrame, merges: list[str], sym_col: str = "sym"
) -> DataFrame:
    """Apply a learned merge list to an existing ``sym`` column (chained
    projections, one `replace` per merge — no shuffle)."""
    out = vocab_or_docs
    for pair in merges:
        out = apply_merge(out, pair)
    return out


def token_counts(
    docs: DataFrame,
    merges: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_words, n_subtokens): tokenize the corpus under a learned
    merge list — the production inference shape: the merge chain is
    applied ONCE to the distinct-word table (vocab-bounded), which then
    broadcast-joins back to the exploded corpus. Corpus-side work is one
    explode + a per-doc partial-sum aggregate; no corpus row ever passes
    through the merge `replace` chain."""
    vocab = segment_words(to_symbols(word_vocab(docs, text_col)), merges)
    seg = vocab.select(
        "word", F.size(F.split(F.col("sym"), " ")).alias("__ntok")
    )
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
    )
    dw = docs.select(F.col(id_col), F.explode(toks).alias("word"))
    return (
        dw.join(F.broadcast(seg), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("__ntok").alias("n_subtokens"),
        )
        .select(
            id_col,
            F.col("n_words").cast("bigint").alias("n_words"),
            F.col("n_subtokens").cast("bigint").alias("n_subtokens"),
        )
    )
