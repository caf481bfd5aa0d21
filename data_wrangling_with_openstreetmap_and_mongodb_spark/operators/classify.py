"""Trainable text classification: hashed multinomial Naive Bayes.

The model-based quality/language filter of a training-data pipeline
(FineWeb-style classifier gating, with NB standing in for the linear head):
train per-class token statistics over a labeled split, broadcast the
bounded model, score the corpus in one map-side pass.

Engine-exactness: every log-likelihood quantizes to the 1e-6 grid at MODEL
BUILD time (``quantize6(ln ...)`` — transcendental ulps die there), so
document scores are sums of exact 1e-6 multiples accumulated in decimal
(``detagg.dsum``) — bit-identical in any engine that replays the same
formula.  Prediction breaks score ties by class name, so the argmax is
total.

Scale shape: the model is ``num_classes x num_buckets`` rows — bounded by
CONSTRUCTION (hashing trick), independent of corpus size — and broadcasts
into the scoring join; the corpus never shuffles by token.  Scoring
shuffles only ``(id, class, partial-sum)`` rows (map-side combined).
Training shuffles ``(class, bucket)`` count rows, also bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_wrangling_with_openstreetmap_and_mongodb_spark.functions.detagg import (
    dsum,
    quantize6,
)
from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.text import (
    md5_hash32,
    whitespace_tokens,
)


def _bucketed_tokens(df: DataFrame, text_col: str, num_buckets: int) -> DataFrame:
    toks = whitespace_tokens(F.col(text_col))
    return df.withColumn(
        "__bucket",
        F.explode(F.transform(toks, lambda t: md5_hash32(t) % num_buckets)),
    )


def nb_train(
    df: DataFrame,
    text_col: str,
    label_col: str,
    num_buckets: int = 1024,
    alpha: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Train hashed multinomial NB; returns ``(priors, likelihoods)``.

    ``priors``: one row per class — ``(label, log_prior)`` with
    ``log_prior = q6(ln(class_docs / total_docs))``.
    ``likelihoods``: DENSE ``num_classes x num_buckets`` grid —
    ``(label, bucket, log_lik)`` with Laplace smoothing
    ``q6(ln((count + alpha) / (class_tokens + alpha * num_buckets)))`` —
    dense so unseen buckets need no scoring-time fallback branch.
    """
    from pyspark.sql.window import Window

    # total docs via a whole-table window over the (tiny) per-class counts —
    # no driver action, the plan stays one lazy DAG
    per_class = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("__docs")
    )
    total = F.sum("__docs").over(Window.partitionBy())
    priors = per_class.select(
        "label",
        quantize6(
            F.log(F.col("__docs").cast("double") / total.cast("double"))
        ).alias("log_prior"),
    )
    tok = _bucketed_tokens(df, text_col, num_buckets).select(
        F.col(label_col).alias("label"), "__bucket"
    )
    counts = tok.groupBy("label", "__bucket").agg(F.count(F.lit(1)).alias("__c"))
    class_tot = tok.groupBy("label").agg(F.count(F.lit(1)).alias("__tot"))
    grid = class_tot.select(
        "label", "__tot", F.explode(F.sequence(F.lit(0), F.lit(num_buckets - 1))).alias("__bucket")
    )
    lik = grid.join(counts, ["label", "__bucket"], "left").select(
        "label",
        F.col("__bucket").alias("bucket"),
        quantize6(
            F.log(
                (F.coalesce(F.col("__c"), F.lit(0)).cast("double") + F.lit(float(alpha)))
                / (F.col("__tot").cast("double") + F.lit(float(alpha) * num_buckets))
            )
        ).alias("log_lik"),
    )
    return priors, lik


def nb_predict(
    df: DataFrame,
    priors: DataFrame,
    likelihoods: DataFrame,
    text_col: str,
    id_col: str,
    num_buckets: int = 1024,
) -> DataFrame:
    """Score every document against every class and pick the argmax:
    ``(id, predicted, score)``.

    The likelihood grid BROADCASTS into the token join (bounded by
    construction); per-(doc, class) sums accumulate exactly (``dsum`` over
    1e-6-quantized terms); tokenless documents fall back to priors alone
    (classes cross join from the doc side, token sums coalesce to 0); ties
    break by class name descending — a total, engine-reproducible argmax.
    """
    tok = _bucketed_tokens(df, text_col, num_buckets).select(
        F.col(id_col).alias("id"), "__bucket"
    )
    tsum = (
        tok.join(
            F.broadcast(likelihoods.withColumnRenamed("bucket", "__bucket")),
            "__bucket",
        )
        .groupBy("id", "label")
        .agg(dsum(F.col("log_lik")).alias("__s"))
    )
    scored = (
        df.select(F.col(id_col).alias("id"))
        .crossJoin(F.broadcast(priors))
        .join(tsum, ["id", "label"], "left")
        .select(
            "id",
            "label",
            (F.col("log_prior") + F.coalesce(F.col("__s"), F.lit(0.0))).alias(
                "score"
            ),
        )
    )
    best = scored.groupBy("id").agg(
        F.max(F.struct("score", "label")).alias("__best")
    )
    return best.select(
        "id",
        F.col("__best.label").alias("predicted"),
        F.col("__best.score").alias("score"),
    )
