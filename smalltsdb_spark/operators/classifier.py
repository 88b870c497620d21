"""Model-based quality classification — the learned half of corpus curation.

The heuristic gates (``textstats.gopher_rules``, quality_score) are rule
lists; production corpus pipelines (CCNet, GPT-3's WebText filter, LLaMA's
quality classifier) additionally train a LINEAR text classifier on hashed
n-gram features (the fastText recipe: Joulin et al. 2016, "Bag of Tricks
for Efficient Text Classification") and keep documents the model scores as
reference-like.  This module is that step as a distributed DataFrame
algorithm:

- :func:`featurize` — unigram+bigram → ``md5_long(gram) % dim`` hashed
  features with mean pooling (x_f = count_f / n_grams), one explode +
  one groupBy; the (doc, feature) relation is the only corpus-sized
  thing and it never leaves the cluster.
- :func:`fit` — full-batch logistic-regression gradient descent.  Each
  iteration: broadcast the dim-sized weight relation, join to score
  every document (one shuffle on doc), aggregate the per-feature
  gradient (one shuffle on feature), collect exactly ``dim + 1``
  numbers to the driver (model-sized, the kmeans discipline), update.
- :func:`predict` — one broadcast join + sigmoid per document.

**Determinism contract (the oracle story).**  Float sums in a shuffle
arrive in nondeterministic order, so naive GD diverges bit-wise between
runs and engines.  Every cross-row sum here is therefore FIXED-POINT:
per-row contributions quantize to integers (``round(x * 2^24)`` — ~7
decimal digits) and sum as longs, which is order-independent; the driver
divides back once per iteration.  Margins and gradients are thus
bit-identical across partitionings, runs, AND engines — the pure-Python
oracle reproduces training exactly, so the driver row is value-checked
end-to-end (the generated-constant oracle pattern).  Quantized gradient
aggregation is standard practice in distributed training anyway; 2^-24
per-term error is far below the step sizes involved.

Scale shape at 100 TB: per iteration one broadcast (dim floats, ~2 MB at
2^18) + one feature-keyed shuffle of the (doc, feature) relation — the
same cost class as one TF-IDF pass, times a small fixed iteration count.
No per-row Python anywhere.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from smalltsdb_spark.functions import md5_long, tokens, word_ngrams
from smalltsdb_spark.operators import spread

#: fixed-point scale for order-independent sums (~7 decimal digits)
FP_SHIFT = 24
FP_SCALE = float(1 << FP_SHIFT)


@dataclass
class LogisticModel:
    weights: list[float]  # len == dim
    bias: float
    dim: int
    losses: list[float]  # training log-loss per iteration (driver-side)


def featurize(
    df: DataFrame, id_col: str, text_col: str, dim: int
) -> DataFrame:
    """(id, feature, x) — hashed unigram+bigram bag with mean pooling.

    ``x = count(gram occurrences hashing to feature) / n_grams(doc)``;
    documents with no grams are dropped (nothing to score).
    """
    toks = F.filter(tokens(text_col), lambda w: F.length(w) > 0)
    grams = F.concat(toks, word_ngrams(toks, 2))
    ex = spread(df).select(
        F.col(id_col).alias("_id"),
        F.size(grams).alias("_n"),
        F.explode(grams).alias("_g"),
    )
    return (
        ex.groupBy(
            "_id", F.pmod(md5_long("_g"), F.lit(dim)).cast("long").alias("feature")
        )
        .agg(
            (F.count("*").cast("double") / F.first("_n")).alias("x")
        )
        .select(F.col("_id").alias(id_col), "feature", "x")
    )


def _margins(features: DataFrame, id_col: str, weights_df: DataFrame, bias: float):
    """Per-doc fixed-point margin: Σ_f round(w_f·x_f·2^24) as a long sum
    (order-independent), plus the bias — returned as (id, margin double)."""
    return (
        features.join(F.broadcast(weights_df), "feature")
        .groupBy(id_col)
        .agg(
            F.sum(
                F.floor(
                    F.col("x") * F.col("w") * F.lit(FP_SCALE) + F.lit(0.5)
                ).cast("long")
            ).alias("_m_int")
        )
        .select(
            id_col,
            (F.col("_m_int") / F.lit(FP_SCALE) + F.lit(float(bias))).alias(
                "margin"
            ),
        )
    )


def fit(
    features: DataFrame,
    labels: DataFrame,
    id_col: str,
    dim: int,
    *,
    iters: int = 15,
    lr: float = 0.5,
) -> LogisticModel:
    """Full-batch logistic GD over the (id, feature, x) relation against
    ``labels`` (id, label ∈ {0,1}).  Driver traffic per iteration is
    exactly ``dim + 2`` numbers (gradient, bias gradient, loss)."""
    spark = features.sparkSession
    fx = features.join(labels, id_col).persist()
    n_docs = fx.select(id_col).distinct().count()
    if n_docs == 0:
        raise ValueError("no labeled documents to fit on")
    w = [0.0] * dim
    bias = 0.0
    losses: list[float] = []
    try:
        for _ in range(iters):
            weights_df = spark.createDataFrame(
                [(i, wi) for i, wi in enumerate(w)], "feature long, w double"
            )
            margins = _margins(
                fx.select(id_col, "feature", "x"), id_col, weights_df, bias
            )
            # err = sigmoid(margin) − label, per doc — margin is already
            # deterministic, so err is too; everything summed below is
            # fixed-point quantized per row
            # persisted: err feeds BOTH the gradient join and the scalar
            # aggregate below — without the cache the whole margin pass
            # (broadcast join + corpus groupBy) would run twice per
            # iteration.  docs-sized (one row per doc); AQE's runtime
            # stats pick broadcast vs shuffle join for it — broadcast at
            # bench scale, shuffle at corpus scale, both correct.
            err = (
                margins.join(labels, id_col)
                .select(
                    id_col,
                    (
                        F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin")))
                        - F.col("label").cast("double")
                    ).alias("err"),
                    "margin",
                    F.col("label").cast("double").alias("_y"),
                )
                .persist()
            )
            stats = (
                fx.select(id_col, "feature", "x")
                .join(err.select(id_col, "err"), id_col)
                .groupBy("feature")
                .agg(
                    F.sum(
                        F.floor(
                            F.col("err") * F.col("x") * F.lit(FP_SCALE)
                            + F.lit(0.5)
                        ).cast("long")
                    ).alias("g_int")
                )
                .collect()
            )
            scalar = err.agg(
                F.sum(
                    F.floor(
                        F.col("err") * F.lit(FP_SCALE) + F.lit(0.5)
                    ).cast("long")
                ).alias("gb_int"),
                F.sum(
                    F.round(
                        F.log1p(F.exp(-F.abs(F.col("margin"))))
                        + F.when(
                            ((F.col("margin") >= 0) & (F.col("_y") < 0.5))
                            | ((F.col("margin") < 0) & (F.col("_y") >= 0.5)),
                            F.abs(F.col("margin")),
                        ).otherwise(F.lit(0.0)),
                        6,
                    )
                ).alias("loss_sum"),
            ).first()
            err.unpersist()
            for row in stats:
                f = int(row.feature)
                w[f] -= lr * (row.g_int / FP_SCALE) / n_docs
            bias -= lr * (scalar.gb_int / FP_SCALE) / n_docs
            losses.append(float(scalar.loss_sum) / n_docs)
    finally:
        fx.unpersist()
    return LogisticModel(weights=w, bias=bias, dim=dim, losses=losses)


def predict(
    features: DataFrame, model: LogisticModel, id_col: str
) -> DataFrame:
    """(id, score) — sigmoid of the deterministic fixed-point margin."""
    spark = features.sparkSession
    weights_df = spark.createDataFrame(
        [(i, wi) for i, wi in enumerate(model.weights)], "feature long, w double"
    )
    margins = _margins(features, id_col, weights_df, model.bias)
    return margins.select(
        id_col,
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin")))).alias("score"),
    )


# ---------------------------------------------------------------------------
# Pure-Python reference (oracle generation + differential tests)
# ---------------------------------------------------------------------------


def reference_fit_predict(
    docs: list[tuple],
    dim: int,
    label_fn,
    *,
    iters: int = 15,
    lr: float = 0.5,
) -> dict:
    """Independent implementation of featurize+fit+predict over
    ``[(id, text), ...]`` — same hashing, same fixed-point sums, so it
    reproduces the distributed training EXACTLY (the determinism
    contract in the module docstring).  Returns {id: (label, score)}."""
    import hashlib

    def h(g: str) -> int:
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % dim

    feats: dict[int, dict[int, float]] = {}
    labels: dict[int, int] = {}
    for doc_id, text in docs:
        ws = [t for t in text.split(" ") if t]
        grams = ws + [" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)]
        if not grams:
            continue
        counts: dict[int, int] = {}
        for g in grams:
            counts[h(g)] = counts.get(h(g), 0) + 1
        feats[doc_id] = {f: c / len(grams) for f, c in counts.items()}
        labels[doc_id] = int(label_fn(text))

    n = len(feats)
    w = [0.0] * dim
    bias = 0.0

    def margin(fx: dict[int, float]) -> float:
        m_int = sum(math.floor(w[f] * x * FP_SCALE + 0.5) for f, x in fx.items())
        return m_int / FP_SCALE + bias

    for _ in range(iters):
        g_int = [0] * dim
        gb_int = 0
        for doc_id, fx in feats.items():
            e = 1.0 / (1.0 + math.exp(-margin(fx))) - labels[doc_id]
            for f, x in fx.items():
                g_int[f] += math.floor(e * x * FP_SCALE + 0.5)
            gb_int += math.floor(e * FP_SCALE + 0.5)
        for f in range(dim):
            w[f] -= lr * (g_int[f] / FP_SCALE) / n
        bias -= lr * (gb_int / FP_SCALE) / n

    return {
        doc_id: (
            labels[doc_id],
            1.0 / (1.0 + math.exp(-margin(fx))),
        )
        for doc_id, fx in feats.items()
    }
