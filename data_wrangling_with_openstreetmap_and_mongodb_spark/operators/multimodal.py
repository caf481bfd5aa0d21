"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A training-data engine at the 100 TB point carries image/audio/video as
``binary`` columns with a typed metadata struct, decoding only inside
Arrow-batched Python (``mapInPandas``) so bytes never round-trip through JVM
row objects one at a time.  The container has no image/audio libraries, so
the *decode* step is stubbed (``NotImplementedError`` for real codecs, a
deterministic byte-level fake for tests) while everything Spark-side —
schema, batching, partitioning, UDF signatures — is real and tested.

Payloads here derive from the ``documents`` table (text encoded as UTF-8
bytes): deterministic, driver-provided input, same plumbing as a real corpus.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

PAYLOAD_SCHEMA = (
    "doc_id long, payload binary, "
    "meta struct<format:string, n_bytes:long>"
)

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, fingerprint string, "
    "n_frames long, f0 double, f1 double, f2 double"
)

FRAME_BYTES = 64  # fixed "frame" size for the frame-sampling stub


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload + metadata struct to each document."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("format"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_payload(payload: bytes, fmt: str) -> dict:
    """Real decoders (image/audio/video) are not available in this
    environment — the dispatch is the extension point."""
    if fmt == "text/plain":
        return _fake_decode(payload)
    raise NotImplementedError(
        f"no codec for {fmt!r}: install decoders and register them here"
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic byte-level 'decode' standing in for a codec: byte count,
    md5 fingerprint, fixed-size frame count, and a tiny feature vector —
    every value reproducible from the bytes alone."""
    import hashlib

    n = len(payload)
    # Feature vector flattened to scalar columns (f0..f2): array<double>
    # outputs are unhashable for downstream pandas-based canonicalization.
    return {
        "n_bytes": n,
        "fingerprint": hashlib.md5(payload).hexdigest(),
        "n_frames": (n + FRAME_BYTES - 1) // FRAME_BYTES,
        "f0": float(n % 256),
        "f1": float(payload[0]) if n else 0.0,
        "f2": float(payload[-1]) if n else 0.0,
    }


FRAME_INDEX_SCHEMA = "doc_id long, frame_id int, frame_bytes int, frame_md5 string"


def sample_frames(with_payload: DataFrame, frame_bytes: int = FRAME_BYTES) -> DataFrame:
    """Frame sampling over binary payloads: one output row per fixed-size
    frame — the video/audio 'decode → per-frame feature' shape, with the
    codec stubbed to byte-slicing + fingerprint.  Demonstrates the 1→N
    Arrow-batched mapInPandas contract a real frame extractor uses."""
    import hashlib

    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for i in range(0, max(len(b), 1), frame_bytes):
                    chunk = b[i : i + frame_bytes]
                    out.append(
                        {
                            "doc_id": doc_id,
                            "frame_id": i // frame_bytes,
                            "frame_bytes": len(chunk),
                            "frame_md5": hashlib.md5(chunk).hexdigest(),
                        }
                    )
            if out:
                yield pd.DataFrame(out)

    return with_payload.mapInPandas(run, schema=FRAME_INDEX_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id long, payload binary, "
    "meta struct<format:string, n_bytes:long>, resized_md5 string"
)


def resize_payloads(with_payload: DataFrame, target_bytes: int = 128) -> DataFrame:
    """Resize/transcode stub over binary payloads: emits a new payload of
    exactly ``target_bytes`` (truncate or zero-pad — the deterministic fake
    standing in for an image resize/audio resample) plus its fingerprint.

    The Spark-side contract is the real thing a codec-backed resize uses:
    binary in → binary out through Arrow batches, metadata struct updated to
    the post-transform size, 1→1 row mapping.  Swap ``_fake_resize`` for a
    PIL/ffmpeg call and nothing else changes."""
    import hashlib

    import pandas as pd

    def _fake_resize(b: bytes) -> bytes:
        return b[:target_bytes].ljust(target_bytes, b"\x00")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                resized = _fake_resize(bytes(payload))
                out.append(
                    {
                        "doc_id": doc_id,
                        "payload": resized,
                        "meta": {"format": meta["format"], "n_bytes": len(resized)},
                        "resized_md5": hashlib.md5(resized).hexdigest(),
                    }
                )
            if out:
                yield pd.DataFrame(out)

    return with_payload.mapInPandas(run, schema=RESIZED_SCHEMA)


def extract_features(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The decode loop sees pandas batches of raw bytes — exactly the shape a
    real image/audio featurizer needs (decode → ndarray → model) — and emits
    typed columns."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                d = decode_payload(bytes(payload), meta["format"])
                d["doc_id"] = doc_id
                out.append(d)
            if out:
                yield pd.DataFrame(out)

    return with_payload.mapInPandas(run, schema=FEATURE_SCHEMA)
