"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A training-data engine at the 100 TB point carries image/audio/video as
``binary`` columns with a typed metadata struct, decoding only inside
Arrow-batched Python (``mapInPandas``) so bytes never round-trip through JVM
row objects one at a time.

Two decode tiers:

- REAL stdlib codecs for uncompressed formats: 24-bit BI_RGB BMP
  (:func:`decode_bmp` — struct-parsed headers, bottom-up/top-down row order,
  4-byte row padding, BGR→RGB) and 16-bit PCM WAV (:func:`decode_wav` —
  RIFF chunk walk, fmt/data chunks, interleaved int16 frames).  No external
  libraries; encode and decode are independent implementations (the WAV
  encoder is CPython's ``wave`` module, the decoder is a hand-written RIFF
  parser; the BMP pair is validated against hand-crafted golden bytes).
- A deterministic byte-level fake for ``text/plain`` payloads, standing in
  for codecs the container genuinely lacks (PNG/JPEG/MP3 …) — those raise
  ``NotImplementedError`` at the dispatch.

Payloads derive from driver-provided tables (``documents``): deterministic
input, same plumbing as a real corpus.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
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


# ---------------------------------------------------------------------------
# Real stdlib codecs: 24-bit BMP + 16-bit PCM WAV
# ---------------------------------------------------------------------------


def encode_bmp(rgb: np.ndarray) -> bytes:
    """Encode an ``(h, w, 3)`` uint8 top-down RGB array as a 24-bit BI_RGB
    BMP: BITMAPFILEHEADER + BITMAPINFOHEADER, rows stored bottom-up in BGR
    order, each padded to a 4-byte boundary — the baseline Windows format."""
    h, w, _ = rgb.shape
    row_raw = w * 3
    pad = (4 - row_raw % 4) % 4
    pixel_bytes = (row_raw + pad) * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + pixel_bytes, 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        rows.append(rgb[y][:, ::-1].tobytes() + b"\x00" * pad)  # RGB → BGR
    return header + info + b"".join(rows)


def decode_bmp(b: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to an ``(h, w, 3)`` uint8 top-down
    RGB array.  Handles both bottom-up (positive height) and top-down
    (negative height) files and per-row 4-byte padding; anything but
    24-bit BI_RGB raises ``NotImplementedError`` (palette/RLE/bitfield
    BMPs are out of scope, not silently mis-decoded)."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    off = struct.unpack_from("<I", b, 10)[0]
    hdr_size, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", b, 14)
    if hdr_size < 40 or bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB BMP supported (got bpp={bpp}, compression={comp})"
        )
    top_down = h < 0
    h = abs(h)
    row_raw = w * 3
    row_size = (row_raw + 3) // 4 * 4
    arr = np.frombuffer(b, dtype=np.uint8, count=row_size * h, offset=off)
    px = arr.reshape(h, row_size)[:, :row_raw].reshape(h, w, 3)[:, :, ::-1]
    if not top_down:
        px = px[::-1]
    return np.ascontiguousarray(px)


def encode_wav(rate: int, channels: int, samples: np.ndarray) -> bytes:
    """Encode interleaved int16 samples as a PCM WAV via CPython's stdlib
    ``wave`` module (the known-good encoder the hand-written decoder is
    tested against)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(channels)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(b: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a 16-bit PCM WAV: walk the RIFF chunk list (word-aligned, so
    junk/LIST chunks skip correctly), read ``fmt `` and ``data``, return
    ``(sample_rate, n_channels, interleaved int16 samples)``.  Non-PCM or
    non-16-bit audio raises ``NotImplementedError``."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt_chunk = data = None
    pos = 12
    while pos + 8 <= len(b):
        cid, sz = struct.unpack_from("<4sI", b, pos)
        pos += 8
        if cid == b"fmt ":
            fmt_chunk = b[pos : pos + sz]
        elif cid == b"data":
            data = b[pos : pos + sz]
        pos += sz + (sz & 1)  # RIFF chunks are 2-byte aligned
    if fmt_chunk is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, ch, rate, _brate, _align, bits = struct.unpack_from(
        "<HHIIHH", fmt_chunk, 0
    )
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError(
            f"only 16-bit PCM WAV supported (got format={audio_fmt}, bits={bits})"
        )
    return rate, ch, np.frombuffer(data, dtype="<i2")


def decode_payload(payload: bytes, fmt: str) -> dict:
    """Codec dispatch.  ``image/bmp`` and ``audio/wav`` decode for REAL via
    the stdlib codecs above; ``text/plain`` keeps the deterministic
    byte-level fake; everything else (PNG/JPEG/MP3 …) raises — the
    container has no codec libraries, and a wrong answer is worse than an
    explicit gap."""
    if fmt == "text/plain":
        return _fake_decode(payload)
    if fmt == "image/bmp":
        px = decode_bmp(payload)
        h, w, _ = px.shape
        return {"kind": "image", "width": w, "height": h, "pixels": px}
    if fmt == "audio/wav":
        rate, ch, samples = decode_wav(payload)
        return {
            "kind": "audio",
            "sample_rate": rate,
            "n_channels": ch,
            "samples": samples,
        }
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


# ---------------------------------------------------------------------------
# Real-codec media pipeline: synthesize genuine BMP/WAV bytes from closed-form
# per-doc formulas, decode them back with the independent stdlib parsers, and
# emit features an oracle can recompute symbolically.  The encode→decode round
# trip is what proves the codecs: row padding, bottom-up flips, BGR ordering,
# RIFF chunk walking all have to be right for the features to match.
# ---------------------------------------------------------------------------

MEDIA_FEATURE_SCHEMA = (
    "doc_id long, fmt string, width long, height long, n_channels long, "
    "sample_rate long, n_samples long, mean_luma double, first_luma double, "
    "mean_r double, rms double, peak long"
)


def _media_plan(doc_id: int) -> dict:
    """Closed-form media spec per doc: even ids carry a BMP whose pixel i
    (row-major, top-down) is ``R=(d+i)%256, G=(d+2i)%256, B=(d+3i)%256``
    over a ``(5+d%4) × (3+d%3)`` canvas (widths 5-8 exercise every row-pad
    width); odd ids carry a ``1+d%2``-channel 16-bit PCM WAV at
    ``8000+(d%3)*4000`` Hz with ``30+d%7`` frames and interleaved sample
    ``s_i = ((d*11 + i*17) % 2048) - 1024``."""
    d = int(doc_id)
    if d % 2 == 0:
        w, h = 5 + d % 4, 3 + d % 3
        i = np.arange(w * h, dtype=np.int64)
        px = np.stack(
            [(d + i) % 256, (d + 2 * i) % 256, (d + 3 * i) % 256], axis=-1
        ).astype(np.uint8).reshape(h, w, 3)
        return {"fmt": "image/bmp", "payload": encode_bmp(px)}
    ch, rate, frames = 1 + d % 2, 8000 + (d % 3) * 4000, 30 + d % 7
    i = np.arange(frames * ch, dtype=np.int64)
    samples = ((d * 11 + i * 17) % 2048 - 1024).astype(np.int16)
    return {"fmt": "audio/wav", "payload": encode_wav(rate, ch, samples)}


def synthesize_media_payloads(docs: DataFrame) -> DataFrame:
    """Attach a REAL encoded media payload (BMP or WAV per :func:`_media_plan`)
    to each document — Arrow-batched, map-only, partition-preserving."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                m = _media_plan(doc_id)
                out.append(
                    {
                        "doc_id": doc_id,
                        "payload": m["payload"],
                        "meta": {"format": m["fmt"], "n_bytes": len(m["payload"])},
                    }
                )
            if out:
                yield pd.DataFrame(out)

    return docs.select("doc_id").mapInPandas(run, schema=PAYLOAD_SCHEMA)


def resize_bmp(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor image resize: destination pixel ``(x, y)`` samples
    source ``(⌊x·w/out_w⌋, ⌊y·h/out_h⌋)`` — the classic index-map NN
    kernel, pure integer arithmetic so it replays exactly in any engine."""
    h, w, _ = px.shape
    ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return np.ascontiguousarray(px[ys][:, xs])


def resize_bmp_payloads(
    with_payload: DataFrame, out_w: int = 4, out_h: int = 3
) -> DataFrame:
    """REAL image resize over BMP payloads (supersedes the byte-level
    ``resize_payloads`` fake for images): decode → nearest-neighbor sample
    → re-encode, all inside Arrow batches.  Rows whose format is not
    ``image/bmp`` are dropped (a real pipeline branches by modality before
    a resize stage).  1→1 map-only — no shuffle, partitioning inherited."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                if meta["format"] != "image/bmp":
                    continue
                resized = encode_bmp(resize_bmp(decode_bmp(bytes(payload)), out_w, out_h))
                out.append(
                    {
                        "doc_id": doc_id,
                        "payload": resized,
                        "meta": {"format": "image/bmp", "n_bytes": len(resized)},
                    }
                )
            if out:
                yield pd.DataFrame(out)

    return with_payload.mapInPandas(run, schema=PAYLOAD_SCHEMA)


def resample_wav(
    samples: np.ndarray, ch: int, in_frames: int, out_frames: int
) -> np.ndarray:
    """Nearest-neighbor sample-rate conversion: output frame ``j`` samples
    source frame ``⌊j·in_frames/out_frames⌋`` across all channels — the
    audio analogue of :func:`resize_bmp`'s index map, pure integer
    arithmetic."""
    if out_frames <= 0:
        return samples[:0]
    idx = (np.arange(out_frames, dtype=np.int64) * in_frames) // out_frames
    return np.ascontiguousarray(samples.reshape(in_frames, ch)[idx].reshape(-1))


def resample_wav_payloads(with_payload: DataFrame, out_rate: int = 8000) -> DataFrame:
    """REAL audio resample over WAV payloads: decode → NN frame map →
    re-encode at ``out_rate`` (``out_frames = ⌊frames·out_rate/in_rate⌋``).
    Non-WAV rows drop (modality branch).  1→1 map-only, no shuffle."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                if meta["format"] != "audio/wav":
                    continue
                rate, ch, s = decode_wav(bytes(payload))
                frames = len(s) // ch
                out_frames = (frames * out_rate) // rate
                res = encode_wav(out_rate, ch, resample_wav(s, ch, frames, out_frames))
                out.append(
                    {
                        "doc_id": doc_id,
                        "payload": res,
                        "meta": {"format": "audio/wav", "n_bytes": len(res)},
                    }
                )
            if out:
                yield pd.DataFrame(out)

    return with_payload.mapInPandas(run, schema=PAYLOAD_SCHEMA)


def extract_media_features(with_payload: DataFrame) -> DataFrame:
    """Decode real BMP/WAV payloads and emit typed features, computed as
    exact integer sums divided once — ``mean = int_sum / n`` and
    ``rms = sqrt(int_sumsq / n)`` are each ONE float division/sqrt over
    exactly-represented integers, so any engine recomputing the same
    formula lands on the bit-identical double (no summation-order drift).
    Luma mixes the channel means: ``0.299·r̄ + 0.587·ḡ + 0.114·b̄``."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                d = decode_payload(bytes(payload), meta["format"])
                row = {
                    "doc_id": doc_id, "fmt": meta["format"],
                    "width": None, "height": None, "n_channels": None,
                    "sample_rate": None, "n_samples": None,
                    "mean_luma": None, "first_luma": None, "mean_r": None,
                    "rms": None, "peak": None,
                }
                if d["kind"] == "image":
                    px = d["pixels"].astype(np.int64)
                    h, w, _ = px.shape
                    n = w * h
                    sr, sg, sb = (int(px[:, :, c].sum()) for c in range(3))
                    r0, g0, b0 = (int(v) for v in px[0, 0])
                    row.update(
                        width=w, height=h, n_channels=3, n_samples=n,
                        mean_luma=0.299 * (sr / n) + 0.587 * (sg / n) + 0.114 * (sb / n),
                        first_luma=0.299 * r0 + 0.587 * g0 + 0.114 * b0,
                        mean_r=sr / n,
                    )
                else:
                    s = d["samples"].astype(np.int64)
                    ns = len(s)
                    row.update(
                        n_channels=d["n_channels"], sample_rate=d["sample_rate"],
                        n_samples=ns,
                        rms=float(np.sqrt(int((s * s).sum()) / ns)),
                        peak=int(np.abs(s).max()),
                    )
                out.append(row)
            if out:
                yield pd.DataFrame(out)

    return with_payload.mapInPandas(run, schema=MEDIA_FEATURE_SCHEMA)
