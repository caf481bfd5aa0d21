"""Streaming classifier gating: score arriving documents against a trained
hashed-NB model inside ``foreachBatch`` — the online half of the
FineWeb-style model-based quality/language filter
(``operators/classify.py``).

The model (priors + dense ``classes x buckets`` likelihood grid) is
bounded by CONSTRUCTION and broadcasts into every micro-batch's scoring
join; per batch the work is linear in the batch (its own token buckets)
plus the broadcast probe.  No streaming state accumulates in the query —
the model IS the state, managed as two plain tables and swappable between
batches by re-running the batch trainer (``nb_train``).  ``foreachBatch``
rather than stream-native operators because scoring is a pure batch
function of each micro-batch against static tables (the
``streaming/dedup_probe.py`` / ``streaming/asof_enrich.py`` pattern), and
it reuses the battle-tested batch operator unchanged — which is exactly
what makes the stream/batch equivalence test (tests/test_streaming_nb.py)
a real contract rather than a reimplementation check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def run_streaming_nb_scoring(
    docs_stream: DataFrame,
    priors: DataFrame,
    likelihoods: DataFrame,
    out_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 1024,
) -> None:
    """Drive scoring to completion (availableNow), appending
    ``(id, predicted, score)`` rows to ``out_path`` parquet."""
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.classify import nb_predict

    def score_batch(batch: DataFrame, batch_id: int) -> None:
        (
            nb_predict(
                batch, priors, likelihoods, text_col, id_col, num_buckets=num_buckets
            )
            .write.mode("append")
            .parquet(out_path)
        )

    (
        docs_stream.writeStream.foreachBatch(score_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
