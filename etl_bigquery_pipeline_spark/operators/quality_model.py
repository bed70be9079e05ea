"""Model-based quality classification: distributed logistic regression.

The reference pipeline filters rows with static rules
(/root/reference/dags/etl_pipeline.py dropna/validation blocks); a
training-data curation pipeline at 100 TB additionally wants a LEARNED
quality filter (CCNet / FineWeb-style): featurize every document, train a
small classifier, score and threshold the corpus.

Spark-first design
------------------
- Featurization is pure JVM column algebra (no UDFs): token counts via
  split/filter, ratios, logs.
- Training is batch gradient descent where each iteration is ONE
  distributed aggregate: grad_j = avg((y - sigmoid(w.x)) * x_j) over the
  corpus, collected as a single 4-scalar row (the same bounded-driver-
  traffic pattern as the k-means tier in plans/catalog.py). Weights are
  plain Python floats re-embedded as literals, so every iteration is one
  lazy plan over the corpus — nothing is cached, nothing wide shuffles:
  the aggregate is a map-side partial sum + single merge.
- At 100 TB the per-iteration cost is one scan + a 4-double reduce; the
  driver holds 4 floats. Feature vectors never leave the executors.

Cross-engine determinism (DuckDB-oracle replayable)
---------------------------------------------------
Only quantities whose value depends on DISTRIBUTED MERGE ORDER are
rounded (to 6 decimals, far above the ~1e-13 merge-order residual):
- features: round(ln(1+n), 6), round(distinct ratio, 6)
- per-iteration: p = round(sigmoid(z), 6)  (absorbs last-ulp libm exp
  differences), grad_j = round(avg(...), 6)
The weight update itself (w' = w + lr*grad) is deliberately NOT rounded:
given identical rounded gradients it is an exact IEEE754 expression that
every engine evaluates bit-identically. Rounding it would instead
MANUFACTURE divergence: lr*grad lands exactly on .xxxxxx5 decimal
boundaries (e.g. lr=0.5 times any odd 6th digit), where Spark
(shortest-decimal-repr HALF_UP) and DuckDB (binary-value rounding)
legitimately disagree. Same reason the learning rate is 0.1, not 0.5 —
and 0.1*g never produces an exact half-way decimal. The learned weights
are then BIT-IDENTICAL and the final scores hash-match.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Fixed featurization/label constants — mirrored in the SQL oracle.
LABEL_CHARS_THRESHOLD = 150
DEFAULT_LR = 0.1
DEFAULT_ITERS = 3


def doc_features(docs: DataFrame) -> DataFrame:
    """(doc_id, x1, x2, x3, y): JVM-only featurization of a documents table.

    x1 = ln(1 + n_chars)          — length
    x2 = ln(1 + n_tokens)         — token count (whitespace)
    x3 = distinct_tokens / tokens — lexical diversity
    y  = 1.0 iff n_chars >= LABEL_CHARS_THRESHOLD (the training label; a
         real deployment would join human/LLM labels here instead)
    All rounded to 6 decimals (see module docstring).
    """
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != F.lit(""))
    ntok = F.size(toks)
    ndis = F.size(F.array_distinct(toks))
    return docs.select(
        "doc_id",
        F.round(F.log(F.lit(1.0) + F.col("n_chars")), 6).alias("x1"),
        F.round(F.log(F.lit(1.0) + ntok), 6).alias("x2"),
        F.round(
            ndis.cast("double") / F.greatest(ntok, F.lit(1)).cast("double"), 6
        ).alias("x3"),
        F.when(F.col("n_chars") >= LABEL_CHARS_THRESHOLD, 1.0)
        .otherwise(0.0)
        .alias("y"),
    )


def _z(w: list[float]):
    """Linear term w0 + w1*x1 + w2*x2 + w3*x3 — literal weights, fixed
    evaluation order (must textually match the oracle's expression)."""
    return (
        F.lit(w[0])
        + F.lit(w[1]) * F.col("x1")
        + F.lit(w[2]) * F.col("x2")
        + F.lit(w[3]) * F.col("x3")
    )


def _p(w: list[float]):
    """round(sigmoid(z), 6)."""
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(w))), 6)


@dataclass
class TrainResult:
    weights: list[float]
    losses: list[float]  # log-loss before each update + after the last


def train_logreg(
    feats: DataFrame, iters: int = DEFAULT_ITERS, lr: float = DEFAULT_LR
) -> TrainResult:
    """Batch GD: one distributed 4-scalar aggregate per iteration.

    Driver traffic per iteration: one Row of 5 doubles (4 gradients + the
    current log-loss). The corpus is scanned once per iteration with a
    map-side partial aggregate; no shuffle wider than the 4-double merge.
    """
    w = [0.0, 0.0, 0.0, 0.0]
    losses: list[float] = []
    for _ in range(iters):
        p = _p(w)
        eps = F.lit(1e-9)
        loss = -(
            F.col("y") * F.log(F.greatest(p, eps))
            + (F.lit(1.0) - F.col("y")) * F.log(F.greatest(F.lit(1.0) - p, eps))
        )
        row = feats.agg(
            F.round(F.avg(F.col("y") - p), 6).alias("g0"),
            F.round(F.avg((F.col("y") - p) * F.col("x1")), 6).alias("g1"),
            F.round(F.avg((F.col("y") - p) * F.col("x2")), 6).alias("g2"),
            F.round(F.avg((F.col("y") - p) * F.col("x3")), 6).alias("g3"),
            F.round(F.avg(loss), 6).alias("loss"),
        ).first()
        losses.append(row["loss"])
        # exact IEEE754 update, deliberately unrounded (module docstring)
        w = [w[j] + lr * row[f"g{j}"] for j in range(4)]
    # final loss with the trained weights (for the convergence gate)
    p = _p(w)
    eps = F.lit(1e-9)
    loss = -(
        F.col("y") * F.log(F.greatest(p, eps))
        + (F.lit(1.0) - F.col("y")) * F.log(F.greatest(F.lit(1.0) - p, eps))
    )
    losses.append(feats.agg(F.round(F.avg(loss), 6).alias("l")).first()["l"])
    return TrainResult(weights=w, losses=losses)


def score_documents(feats: DataFrame, weights: list[float]) -> DataFrame:
    """(doc_id, score, pred_high_quality): sigmoid scores under trained
    weights. Pure projection — distributes trivially."""
    score = _p(weights)
    return feats.select(
        "doc_id",
        score.alias("score"),
        (score >= F.lit(0.5)).alias("pred_high_quality"),
    )
