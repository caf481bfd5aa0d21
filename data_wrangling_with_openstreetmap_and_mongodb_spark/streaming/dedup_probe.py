"""Streaming near-duplicate probe against a persisted MinHash band index —
the continuous-ingest composition of ``operators/dedup.minhash_band_index``
/ ``minhash_probe_index``.

The production shape of online corpus dedup: the corpus is indexed ONCE
(batch job, `(id, band, bucket, sig)` rows persisted — ideally bucketed by
`(band, bucket)` for co-located probes); arriving document micro-batches are
each probed against the index inside ``foreachBatch``.  Per batch the work
is linear in the BATCH (its own signatures) plus the band-key equi-join —
corpus text is never rescanned, and no streaming state accumulates in the
query itself (the index IS the state, managed as a plain table).

``foreachBatch`` rather than a stream-stream join because the index side is
a static, incrementally-maintained table, not a stream: joining a stream
against a snapshot-consistent batch table each micro-batch is exactly the
semantics wanted, and it keeps the heavy signature pipeline on the battle-
tested batch operator (same md5 hash family, same SQL-oracle semantics as
``dedup_incremental_minhash``)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def run_streaming_dedup_probe(
    docs_stream: DataFrame,
    index: DataFrame,
    out_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    n: int = 3,
    threshold: float = 0.8,
) -> None:
    """Drive the probe to completion (availableNow) appending
    ``(new_id, corpus_id, est_jaccard)`` matches to ``out_path`` parquet.

    Batches are probed independently — duplicate pairs WITHIN one batch are
    out of contract here (they are the batch dedup operators' job before
    indexing); this operator answers "which arriving documents duplicate
    the existing corpus", which is the admission-control question at ingest.
    """
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.dedup import (
        minhash_probe_index,
    )

    def probe_batch(batch: DataFrame, batch_id: int) -> None:
        (
            minhash_probe_index(
                batch,
                index,
                text_col,
                id_col,
                num_hashes=num_hashes,
                bands=bands,
                n=n,
                threshold=threshold,
            )
            .write.mode("append")
            .parquet(out_path)
        )

    (
        docs_stream.writeStream.foreachBatch(probe_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
