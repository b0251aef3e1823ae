"""Model-based quality filtering: a linear classifier over cheap
surface features (the fastText / CCNet / FineWeb-edu recipe shape —
train a small classifier on weak labels, score the whole corpus, gate
on the score).

Division of labor, exactly the trained-IVF pattern (`ivf_oracle`):

- **training** is a bounded, deterministic driver-side fit — pyarrow
  reads the training table, numpy computes features and runs
  fixed-iteration gradient descent (no RNG, float64). Classifier fits
  are sample-based in practice (FineWeb-edu trains on ~450k labeled
  rows, not the corpus), so the driver-side bound is the real recipe,
  and determinism is what lets the DuckDB oracle hold literal weights.
- **scoring** is fully distributed and JVM-side: features are Catalyst
  expressions (token/char counts, ratios of exact integers), the score
  is a literal-weighted sum — whole-stage codegen, no Python on the
  scoring path, pushdown-friendly.

The scored output is the LOGIT, not the sigmoid: a logit is pure
multiply-add over literals (bit-reproducible in any engine), while
exp() may differ in the last ulp between libm implementations — the
monotone logit carries the same ranking/thresholding information with
none of the cross-engine risk (predictions are ``logit > 0``).
"""

from __future__ import annotations

import functools

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from vearch_spark.functions.text import (
    STOPWORDS,
    mean_token_length,
    punct_ratio,
    tokens,
)

FEATURES = ("n_tok", "mtl", "punct", "sw_en")


def feature_exprs(text_col: str = "text") -> dict[str, Column]:
    """The JVM feature expressions — each has an exact DuckDB twin
    (integer counts and ratios of exact integers; NULL-free via
    coalesce so empty/degenerate docs score instead of vanishing).
    The text column itself is coalesced to "" so a NULL doc scores
    exactly like :func:`np_features`' ``None → ""`` training rows —
    an uncoalesced ``F.size(split(NULL))`` is NULL, which silently
    NULLed quality_logit/is_match and drifted scoring from training."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    t = tokens(txt)
    n_tok = F.size(t).cast("double")
    sw = F.size(
        F.filter(t, lambda x: x.isin(*STOPWORDS["en"]))
    ).cast("double")
    return {
        "n_tok": n_tok,
        "mtl": F.coalesce(mean_token_length(txt), F.lit(0.0)),
        "punct": F.coalesce(punct_ratio(txt), F.lit(0.0)),
        "sw_en": F.coalesce(F.try_divide(sw, n_tok), F.lit(0.0)),
    }


def np_features(texts: list[str | None]) -> np.ndarray:
    """Numpy twin of :func:`feature_exprs` for the driver-side fit.
    (Training-side only — scoring parity is JVM↔DuckDB, so a drift
    here would change the learned weights, not break the oracle; the
    parity test pins it anyway to keep the fit meaningful.)"""
    sw_set = set(STOPWORDS["en"])
    out = np.zeros((len(texts), len(FEATURES)), dtype=np.float64)
    for i, txt in enumerate(texts):
        s = txt or ""
        toks = s.split(" ")
        n_tok = float(len(toks))
        tok_chars = float(sum(len(w) for w in toks))
        n_chars = float(len(s))
        n_punct = float(sum(not (c.isascii() and (c.isalnum() or c == " ")) for c in s))
        sw = float(sum(w in sw_set for w in toks))
        out[i, 0] = n_tok
        out[i, 1] = tok_chars / n_tok if n_tok else 0.0
        out[i, 2] = n_punct / n_chars if n_chars else 0.0
        out[i, 3] = sw / n_tok if n_tok else 0.0
    return out


def fit_logreg(
    x: np.ndarray, y: np.ndarray, iters: int = 300, lr: float = 0.5
) -> dict:
    """Deterministic logistic regression: standardize, full-batch
    gradient descent, fixed iterations, no RNG. Returns the scoring
    parameters (weights in STANDARDIZED space plus the mu/sd to apply
    at score time)."""
    mu = x.mean(axis=0)
    sd = x.std(axis=0)
    sd = np.where(sd == 0.0, 1.0, sd)
    xs = (x - mu) / sd
    w = np.zeros(x.shape[1], dtype=np.float64)
    b = 0.0
    n = float(len(y))
    yy = y.astype(np.float64)
    for _ in range(int(iters)):
        z = xs @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = xs.T @ (p - yy) / n
        gb = float((p - yy).sum() / n)
        w -= lr * g
        b -= lr * gb
    return {
        "w": [float(v) for v in w],
        "b": float(b),
        "mu": [float(v) for v in mu],
        "sd": [float(v) for v in sd],
    }


def rule_labels(x: np.ndarray, threshold: float = 0.95) -> np.ndarray:
    """Weak labels by DISTILLING the rule-based gate
    (``text.quality_score``'s banded composite, recomputed here in
    numpy) into the linear model — the standard bootstrap when no
    human/LLM labels exist yet: the classifier smooths the rule's hard
    bands into a rankable score, and production swaps these labels for
    curated ones without touching the scoring machinery."""
    n_tok, mtl, punct = x[:, 0], x[:, 1], x[:, 2]
    len_ok = np.where(
        (n_tok >= 20) & (n_tok <= 5000), 1.0, np.where(n_tok > 5000, 0.5, n_tok / 20.0)
    )
    punct_ok = np.where(punct <= 0.1, 1.0, np.maximum(0.0, 1.0 - (punct - 0.1) * 4.0))
    mtl_ok = np.where((mtl >= 2.0) & (mtl <= 12.0), 1.0, 0.4)
    return (0.4 * len_ok + 0.4 * punct_ok + 0.2 * mtl_ok) >= threshold


@functools.lru_cache(maxsize=8)
def fit_from_parquet(sf_dir: str, threshold: float = 0.95) -> tuple:
    """Train the distilled quality classifier from the documents table
    read via pyarrow (no SparkSession — the oracle builder runs this
    too, so both engines hold the SAME literal weights). Returns a
    hashable params tuple for lru_cache friendliness."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    x = np_features(tbl["text"].to_pylist())
    params = fit_logreg(x, rule_labels(x, threshold))
    return (
        tuple(params["w"]),
        params["b"],
        tuple(params["mu"]),
        tuple(params["sd"]),
    )


def logit_expr(params: tuple, text_col: str = "text") -> Column:
    """Literal-weighted standardized logit, built as an explicit
    left-to-right sum so the DuckDB twin folds in the same order."""
    w, b, mu, sd = params
    feats = feature_exprs(text_col)
    acc: Column = F.lit(float(b))
    for i, name in enumerate(FEATURES):
        acc = acc + F.lit(float(w[i])) * (
            (feats[name] - F.lit(float(mu[i]))) / F.lit(float(sd[i]))
        )
    return acc


def score_docs(
    df: DataFrame,
    params: tuple,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distributed scoring: (id, quality_logit, is_match) — one narrow
    JVM projection, no shuffle; the gate composes with any downstream
    filter/sample operator."""
    logit = logit_expr(params, text_col)
    return df.select(
        F.col(id_col),
        logit.cast("float").alias("quality_logit"),
        (logit > 0).cast("int").alias("is_match"),
    )
