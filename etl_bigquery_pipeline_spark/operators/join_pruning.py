"""Bloom-style pre-shuffle join pruning (SURVEY.md §7.4 scale tier).

At 100 TB the dominant cost of fact ⋈ dim is shuffling fact rows that can
never match. Spark's own runtime row-level filtering covers some shapes;
this operator makes the technique explicit and predictable: project the
dim keys onto a bounded hashed-bucket space (``pmod(xxhash64(key), m)``),
collect the DISTINCT bucket codes — at most ``m`` rows no matter how large
the dim is — and broadcast-semi-join the fact against them BEFORE the
exact shuffle join.

Exactly a Bloom filter with k=1 hash function, expressed as pure Catalyst
relational algebra instead of an opaque bitset:
- no false negatives: a fact key present in dim hashes to a code that is
  in the set by construction, so the exact join's result is unchanged
  (oracled: bloom_pruned_join_parity in plans/catalog.py);
- false positives (~|dim|/m of the code space) only cost shuffle volume
  and are removed by the exact join that follows;
- the pruning structure stays a DataFrame: Catalyst broadcasts it as a
  build-side hash relation inside whole-stage codegen — no UDF, no
  driver-side bitset, no collect.

Sizing: m = 2^17 codes ≈ 1 MiB broadcast. With a 10M-key dim the code
space saturates (every bucket occupied → no pruning): raise m toward
2^22-2^24 (still a few-hundred-MiB broadcast at worst — the point is m
grows with the TARGET false-positive rate, not with |dim|), or prefer a
plain broadcast join when the dim itself fits the broadcast threshold.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_CODE_SPACE = 1 << 17


def _code(col: Column | str, m: int) -> Column:
    return F.pmod(F.xxhash64(col), F.lit(m))


def membership_codes(dim: DataFrame, key: str, m: int = DEFAULT_CODE_SPACE) -> DataFrame:
    """Distinct hashed bucket codes of ``dim[key]`` — ≤ m rows regardless
    of dim size. One column ``__code``."""
    return dim.select(_code(key, m).alias("__code")).distinct()


def prune_by_membership(
    fact: DataFrame, codes: DataFrame, key: str, m: int = DEFAULT_CODE_SPACE
) -> DataFrame:
    """Keep only fact rows whose hashed key code appears in ``codes``
    (broadcast left-semi). Superset of the exact-match rows."""
    return fact.join(
        F.broadcast(codes),
        _code(fact[key], m) == codes["__code"],
        "left_semi",
    )


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    *,
    m: int = DEFAULT_CODE_SPACE,
    how: str = "inner",
) -> DataFrame:
    """fact ⋈ dim with the fact side pre-pruned by the dim's hashed key
    membership. Result is identical to ``fact.join(dim, on, how)`` for
    inner/left-semi joins (no false negatives; the exact join removes the
    false positives).

    Only inner and left_semi are accepted: for left/outer joins the prune
    would have to PASS THROUGH non-matching fact rows rather than drop
    them, which erases the shuffle saving the operator exists for.
    """
    if how not in {"inner", "left_semi", "leftsemi", "semi"}:
        raise ValueError(
            f"bloom_pruned_join supports inner/left_semi, got {how!r}"
        )
    pruned = prune_by_membership(fact, membership_codes(dim, on, m), on, m)
    return pruned.join(dim, on, how)
