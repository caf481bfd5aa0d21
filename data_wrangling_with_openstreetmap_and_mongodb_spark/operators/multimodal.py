"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A training-data engine at the 100 TB point carries image/audio/video as
``binary`` columns with a typed metadata struct, decoding only inside
Arrow-batched Python (``mapInPandas``) so bytes never round-trip through JVM
row objects one at a time.

Two decode tiers:

- REAL stdlib codecs: 24-bit BI_RGB BMP (:func:`decode_bmp` — struct-parsed
  headers, bottom-up/top-down row order, 4-byte row padding, BGR→RGB),
  16-bit PCM WAV (:func:`decode_wav` — RIFF chunk walk, fmt/data chunks,
  interleaved int16 frames), 8-bit grey/RGB/palette(+tRNS)/RGBA PNG
  (:func:`decode_png` — chunk framing with CRC-32 verification, zlib
  inflate, all five scanline unfilters, PLTE/tRNS expansion), and
  multi-frame GIF87a/89a (:func:`decode_gif` — full GIF-variant LZW with
  growing code widths, global/local color tables, interlace, GCE delays).
  No external libraries; encode and
  decode are independent implementations (the WAV encoder is CPython's
  ``wave`` module, the decoder is a hand-written RIFF parser; the BMP/PNG
  pairs are validated against hand-crafted golden bytes).
- A deterministic byte-level fake for ``text/plain`` payloads, standing in
  for codecs the container genuinely lacks (JPEG/MP3 …) — those raise
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


def _mulaw_expand_table() -> np.ndarray:
    """G.711 μ-law byte → linear int16 (the standard segment expansion:
    complement, 4-bit mantissa biased by 0x84, 3-bit exponent shift).
    Anchors: 0xFF → 0, 0x00 → -32124, 0x80 → +32124."""
    out = np.empty(256, dtype=np.int16)
    for b in range(256):
        u = ~b & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
        out[b] = (0x84 - t) if (u & 0x80) else (t - 0x84)
    return out


def _alaw_expand_table() -> np.ndarray:
    """G.711 A-law byte → linear int16 (XOR 0x55 toggle, segment 0/1
    special-cased, others shift).  Anchors: 0x55 → -8, 0xD5 → +8,
    0x2A → -32256, 0xAA → +32256."""
    out = np.empty(256, dtype=np.int16)
    for b in range(256):
        a = b ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        out[b] = t if (a & 0x80) else -t
    return out


_G711_TABLES = {6: _alaw_expand_table(), 7: _mulaw_expand_table()}
_G711_NAMES = {6: "alaw", 7: "mulaw"}


def encode_wav_g711(rate: int, channels: int, raw: bytes, law: str) -> bytes:
    """Wrap already-companded G.711 bytes (``law`` = 'mulaw'/'alaw') in a
    RIFF/WAVE container: format tag 7/6, 8 bits per sample — the telephony
    WAV flavor.  The payload bytes pass through untouched; this is container
    framing only (decode expands them, so encode and decode stay
    independent implementations)."""
    tag = {"mulaw": 7, "alaw": 6}[law]
    fmt = struct.pack("<HHIIHH", tag, channels, rate, rate * channels, channels, 8)
    data = raw
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(b: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a WAV: walk the RIFF chunk list (word-aligned, so junk/LIST
    chunks skip correctly), read ``fmt `` and ``data``, return
    ``(sample_rate, n_channels, interleaved int16 samples)``.  Supports
    16-bit PCM (format 1) and 8-bit G.711 μ-law/A-law (formats 7/6 —
    expanded to linear int16 via the standard segment tables).  Anything
    else raises ``NotImplementedError``."""
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
    if audio_fmt == 1 and bits == 16:
        return rate, ch, np.frombuffer(data, dtype="<i2")
    if audio_fmt in _G711_TABLES and bits == 8:
        table = _G711_TABLES[audio_fmt]
        return rate, ch, table[np.frombuffer(data, dtype=np.uint8)]
    raise NotImplementedError(
        f"only 16-bit PCM and 8-bit G.711 mu/A-law WAV supported "
        f"(got format={audio_fmt}, bits={bits})"
    )


# ---------------------------------------------------------------------------
# Real stdlib PNG codec (zlib is in the standard library, so the most common
# real-world image format needs no external dependency): 8-bit greyscale /
# RGB / palette (PLTE, optional tRNS alpha) / RGBA, all five scanline
# filters.  Sub-8/16-bit depth and Adam7 interlace raise
# NotImplementedError — explicit gaps, never a silent mis-decode.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel in the FILTERED stream (supported subset;
# palette type 3 carries 1 index byte per pixel and expands after unfilter)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 6: 4}


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (left, up, upper-left)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(px: np.ndarray, row_filters=None) -> bytes:
    """Encode a uint8 array as an 8-bit PNG: ``(h, w)`` → greyscale (color
    type 0), ``(h, w, 3)`` → RGB (2), ``(h, w, 4)`` → RGBA (6).

    ``row_filters`` picks the scanline filter per row (default: row ``y``
    uses filter ``y % 5``, so any image taller than 4 rows exercises every
    filter type — None/Sub/Up/Average/Paeth all have to be applied AND
    inverted correctly for a round trip to be pixel-exact).  Filtering is
    vectorized per row (the encoder only needs the RAW previous row, so
    there is no sequential dependency on the encode side)."""
    import zlib

    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    color_type = {1: 0, 3: 2, 4: 6}.get(ch)
    if color_type is None:
        raise ValueError(f"unsupported channel count {ch} (want 1/3/4)")
    bpp = ch  # bytes per pixel at bit depth 8
    raw = px.reshape(h, w * ch).astype(np.int16)
    zero = np.zeros(w * ch, dtype=np.int16)
    out = bytearray()
    for y in range(h):
        f = (y % 5) if row_filters is None else int(row_filters[y])
        cur = raw[y]
        prior = raw[y - 1] if y else zero
        left = np.concatenate([np.zeros(bpp, dtype=np.int16), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, dtype=np.int16), prior[:-bpp]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prior
        elif f == 3:
            filt = cur - (left + prior) // 2
        elif f == 4:
            pred = np.fromiter(
                (_paeth(int(a), int(b), int(c)) for a, b, c in zip(left, prior, upleft)),
                dtype=np.int16,
                count=w * ch,
            )
            filt = cur - pred
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out.append(f)
        out += (filt % 256).astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


def encode_palette_png(
    indices: np.ndarray, plte: np.ndarray, trns: bytes | None = None,
    row_filters=None,
) -> bytes:
    """Encode an ``(h, w)`` uint8 index array as an 8-bit palette PNG
    (color type 3): PLTE from the ``(n, 3)`` uint8 palette, optional tRNS
    per-entry alpha.  Scanline filters operate on the INDEX bytes (bpp=1),
    same per-row filter choice as :func:`encode_png` (default ``y % 5``)."""
    import zlib

    indices = np.asarray(indices, dtype=np.uint8)
    plte = np.asarray(plte, dtype=np.uint8)
    if plte.ndim != 2 or plte.shape[1] != 3 or not 1 <= len(plte) <= 256:
        raise ValueError(f"palette must be (n<=256, 3) uint8, got {plte.shape}")
    if int(indices.max(initial=0)) >= len(plte):
        raise ValueError("index out of palette range")
    h, w = indices.shape
    raw = indices.reshape(h, w).astype(np.int16)
    zero = np.zeros(w, dtype=np.int16)
    out = bytearray()
    for y in range(h):
        f = (y % 5) if row_filters is None else int(row_filters[y])
        cur = raw[y]
        prior = raw[y - 1] if y else zero
        left = np.concatenate([np.zeros(1, dtype=np.int16), cur[:-1]])
        upleft = np.concatenate([np.zeros(1, dtype=np.int16), prior[:-1]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prior
        elif f == 3:
            filt = cur - (left + prior) // 2
        elif f == 4:
            pred = np.fromiter(
                (_paeth(int(a), int(b), int(c)) for a, b, c in zip(left, prior, upleft)),
                dtype=np.int16,
                count=w,
            )
            filt = cur - pred
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out.append(f)
        out += (filt % 256).astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    chunks = _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"PLTE", plte.tobytes())
    if trns is not None:
        chunks += _png_chunk(b"tRNS", bytes(trns))
    return chunks + _png_chunk(b"IDAT", zlib.compress(bytes(out))) + _png_chunk(b"IEND", b"")


def decode_png(b: bytes) -> np.ndarray:
    """Decode an 8-bit greyscale/RGB/palette/RGBA PNG to a uint8 ``(h, w)``
    / ``(h, w, 3)`` / ``(h, w, 4)`` array.

    Full format walk: signature, big-endian chunk framing with CRC-32
    verification on every chunk, IHDR validation, multi-IDAT concatenation,
    zlib inflate, then sequential scanline unfiltering (Sub/Average/Paeth
    reference the RECONSTRUCTED left neighbor, so the inner loop is
    inherently order-dependent; Up/None vectorize).  Palette images (color
    type 3, 8-bit indices) expand through PLTE to RGB — or to RGBA when a
    tRNS chunk supplies per-entry alpha — with out-of-range indices a
    ``ValueError``, never a silent wrap.  Sub-8/16-bit depth and interlace
    raise ``NotImplementedError``; framing/CRC damage raises
    ``ValueError``."""
    import zlib

    if b[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos = len(_PNG_SIG)
    ihdr = None
    plte = None
    trns = None
    idat = bytearray()
    saw_iend = False
    while pos + 8 <= len(b):
        length, ctype = struct.unpack_from(">I4s", b, pos)
        data = b[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(b):
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        (crc,) = struct.unpack_from(">I", b, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            if length % 3:
                raise ValueError(f"PLTE length {length} not a multiple of 3")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(data, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            saw_iend = True
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    if not saw_iend:
        raise ValueError("truncated PNG (no complete IEND chunk)")
    w, h, depth, color_type, comp, filt_method, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if comp != 0 or filt_method != 0:
        raise ValueError(f"bad IHDR compression/filter method ({comp}/{filt_method})")
    if depth != 8 or color_type not in _PNG_CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"only 8-bit non-interlaced grey/RGB/palette/RGBA PNG supported "
            f"(got depth={depth}, color_type={color_type}, interlace={interlace})"
        )
    if color_type == 3 and plte is None:
        raise ValueError("palette PNG (color type 3) missing PLTE chunk")
    ch = _PNG_CHANNELS[color_type]
    bpp = ch
    stride = w * ch
    data = zlib.decompress(bytes(idat))
    if len(data) != (stride + 1) * h:
        raise ValueError(
            f"PNG pixel data length {len(data)} != expected {(stride + 1) * h}"
        )
    prior = bytearray(stride)
    rows = []
    for y in range(h):
        off = y * (stride + 1)
        f = data[off]
        line = bytearray(data[off + 1 : off + 1 + stride])
        if f == 0:
            pass
        elif f == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prior[x]) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + (left + prior[x]) // 2) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                left = line[x - bpp] if x >= bpp else 0
                upleft = prior[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + _paeth(left, prior[x], upleft)) & 0xFF
        else:
            raise ValueError(f"bad PNG scanline filter {f} at row {y}")
        prior = line
        rows.append(bytes(line))
    px = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(h, w, ch)
    if color_type == 3:
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError(
                f"palette index {int(idx.max())} out of range "
                f"(PLTE has {len(plte)} entries)"
            )
        rgb = plte[idx]  # (h, w, 3)
        if trns is None:
            return np.ascontiguousarray(rgb)
        # tRNS: alpha per palette entry; entries past its end are opaque
        alpha_tab = np.full(len(plte), 255, dtype=np.uint8)
        alpha_tab[: len(trns)] = trns[: len(plte)]
        return np.ascontiguousarray(
            np.concatenate([rgb, alpha_tab[idx][:, :, None]], axis=-1)
        )
    return np.ascontiguousarray(px[:, :, 0] if ch == 1 else px)


def decode_payload(payload: bytes, fmt: str) -> dict:
    """Codec dispatch.  ``image/bmp``, ``image/png``, ``image/gif``
    (multi-frame) and ``audio/wav`` decode for REAL via the stdlib codecs in
    this module; ``text/plain`` keeps the deterministic byte-level fake;
    everything else (JPEG/MP3 …) raises — the container has no codec
    libraries, and a wrong answer is worse than an explicit gap."""
    if fmt == "text/plain":
        return _fake_decode(payload)
    if fmt == "image/bmp":
        px = decode_bmp(payload)
        h, w, _ = px.shape
        return {"kind": "image", "width": w, "height": h, "pixels": px}
    if fmt == "image/png":
        px = decode_png(payload)
        h, w = px.shape[:2]
        return {"kind": "image", "width": w, "height": h, "pixels": px}
    if fmt == "image/gif":
        frames, delays = decode_gif(payload)
        h, w = frames[0].shape[:2]
        return {
            "kind": "animation",
            "width": w,
            "height": h,
            "n_frames": len(frames),
            "frames": frames,
            "delays": delays,
        }
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


# ---------------------------------------------------------------------------
# Real-codec PNG pipeline: closed-form per-doc PNGs (grey/RGB/RGBA cycling,
# every scanline filter exercised), decoded back by the independent chunk
# walker above, features exact-rational so a SQL oracle replays them
# symbolically.  Same contract as the BMP/WAV pipeline: the round trip only
# matches if chunk framing, CRCs, inflate and all five unfilters are right.
# ---------------------------------------------------------------------------

PNG_FEATURE_SCHEMA = (
    "doc_id long, png_type string, width long, height long, n_channels long, "
    "n_samples long, mean_c0 double, mean_luma double, mean_alpha double"
)

_PNG_KIND = {0: "grey", 1: "rgb", 2: "rgba"}


def _png_plan(doc_id: int) -> bytes:
    """Closed-form PNG spec per doc: color type cycles grey/RGB/RGBA with
    ``doc_id % 3`` over a ``(5+d%4) × (3+d%3)`` canvas (widths 5-8, heights
    3-5).  Pixel ``i`` (row-major, top-down): grey ``v=(d+7i)%256``; RGB
    ``r=(d+i)%256, g=(d+2i)%256, b=(d+3i)%256``; RGBA adds ``a=(d+5i)%256``.
    Row ``y`` is stored with scanline filter ``(d+y)%5``, so the corpus
    exercises None/Sub/Up/Average/Paeth at every canvas width and channel
    count."""
    d = int(doc_id)
    w, h = 5 + d % 4, 3 + d % 3
    i = np.arange(w * h, dtype=np.int64)
    kind = d % 3
    if kind == 0:
        px = ((d + 7 * i) % 256).astype(np.uint8).reshape(h, w)
    else:
        planes = [(d + i) % 256, (d + 2 * i) % 256, (d + 3 * i) % 256]
        if kind == 2:
            planes.append((d + 5 * i) % 256)
        px = np.stack(planes, axis=-1).astype(np.uint8).reshape(h, w, len(planes))
    return encode_png(px, row_filters=[(d + y) % 5 for y in range(h)])


def synthesize_png_payloads(docs: DataFrame) -> DataFrame:
    """Attach a REAL encoded PNG payload (per :func:`_png_plan`) to each
    document — Arrow-batched, map-only, partition-preserving."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                payload = _png_plan(doc_id)
                out.append(
                    {
                        "doc_id": doc_id,
                        "payload": payload,
                        "meta": {"format": "image/png", "n_bytes": len(payload)},
                    }
                )
            if out:
                yield pd.DataFrame(out)

    return docs.select("doc_id").mapInPandas(run, schema=PAYLOAD_SCHEMA)


def extract_png_features(with_payload: DataFrame) -> DataFrame:
    """Decode real PNG payloads (any supported channel count) and emit typed
    features as exact integer sums divided once — the same bit-reproducible
    contract as :func:`extract_media_features`.  ``mean_luma`` is the
    0.299/0.587/0.114 mix for RGB(A) and the grey mean for greyscale (a grey
    pixel's luma is itself); ``mean_alpha`` is NULL unless RGBA."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                d = decode_payload(bytes(payload), meta["format"])
                px = d["pixels"].astype(np.int64)
                ch = 1 if px.ndim == 2 else px.shape[-1]
                h, w = d["height"], d["width"]
                n = w * h
                row = {
                    "doc_id": doc_id,
                    "png_type": _PNG_KIND[{1: 0, 3: 1, 4: 2}[ch]],
                    "width": w, "height": h, "n_channels": ch, "n_samples": n,
                    "mean_c0": None, "mean_luma": None, "mean_alpha": None,
                }
                if ch == 1:
                    s0 = int(px.sum())
                    row.update(mean_c0=s0 / n, mean_luma=s0 / n)
                else:
                    sr, sg, sb = (int(px[:, :, c].sum()) for c in range(3))
                    row.update(
                        mean_c0=sr / n,
                        mean_luma=0.299 * (sr / n) + 0.587 * (sg / n) + 0.114 * (sb / n),
                    )
                    if ch == 4:
                        row.update(mean_alpha=int(px[:, :, 3].sum()) / n)
                out.append(row)
            if out:
                yield pd.DataFrame(out)

    return with_payload.mapInPandas(run, schema=PNG_FEATURE_SCHEMA)


def _palette_png_plan(doc_id: int) -> bytes:
    """Closed-form palette PNG per doc: an 8-entry palette with entry ``j``
    = ``((d+37j)%256, (d+59j)%256, (d+83j)%256)``, index map ``(d+i)%8``
    over the usual ``(5+d%4) × (3+d%3)`` canvas, row ``y`` filtered with
    ``(d+y)%5``; ODD docs add a 4-entry tRNS (``alpha_j = (d+11j)%256``,
    later entries opaque) so both the RGB and RGBA expansion paths carry
    oracle coverage."""
    d = int(doc_id)
    w, h = 5 + d % 4, 3 + d % 3
    j = np.arange(8, dtype=np.int64)
    plte = np.stack(
        [(d + 37 * j) % 256, (d + 59 * j) % 256, (d + 83 * j) % 256], axis=-1
    ).astype(np.uint8)
    idx = ((d + np.arange(w * h, dtype=np.int64)) % 8).astype(np.uint8).reshape(h, w)
    trns = bytes(int((d + 11 * k) % 256) for k in range(4)) if d % 2 else None
    return encode_palette_png(idx, plte, trns=trns, row_filters=[(d + y) % 5 for y in range(h)])


def synthesize_palette_png_payloads(docs: DataFrame) -> DataFrame:
    """Attach a REAL palette PNG payload (per :func:`_palette_png_plan`) to
    each document — Arrow-batched, map-only, partition-preserving."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                payload = _palette_png_plan(doc_id)
                out.append(
                    {
                        "doc_id": doc_id,
                        "payload": payload,
                        "meta": {"format": "image/png", "n_bytes": len(payload)},
                    }
                )
            if out:
                yield pd.DataFrame(out)

    return docs.select("doc_id").mapInPandas(run, schema=PAYLOAD_SCHEMA)


# ---------------------------------------------------------------------------
# Real stdlib GIF codec: the multi-frame (video-shaped) format — frame
# extraction through a REAL container instead of the byte-slicing fake.
# Decoder implements full GIF-variant LZW (growing code widths to 12 bits,
# clear/end codes), 87a/89a headers, global AND local color tables, Adam-less
# 4-pass interlace, and Graphic Control Extension delays.  The encoder emits
# a VALID literal-only LZW stream (clear codes re-issued before the code
# width would grow — the classic "uncompressed GIF" construction), so the
# two directions share no compression logic.
# ---------------------------------------------------------------------------


def _gif_pack_codes(codes: list[int], min_code_size: int) -> bytes:
    """LSB-first bit-pack LZW codes at the width the DECODER will track:
    width starts at min_code_size+1 and grows when the dict (which gains one
    entry per emitted code after the first post-clear code) reaches 2^width."""
    clear = 1 << min_code_size
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1
    dict_size = clear + 2
    prev_was_clear = True
    for code in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if code == clear:
            width = min_code_size + 1
            dict_size = clear + 2
            prev_was_clear = True
        elif code == clear + 1:
            break
        else:
            if prev_was_clear:
                prev_was_clear = False  # first code after clear adds nothing
            else:
                dict_size += 1
                if dict_size == (1 << width) and width < 12:
                    width += 1
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_interlace_order(h: int) -> list[int]:
    return [y for start, step in _GIF_INTERLACE_PASSES for y in range(start, h, step)]


def encode_gif(
    frames: list[np.ndarray],
    plte: np.ndarray,
    delays_cs: list[int] | None = None,
    interlace: bool = False,
    local_palettes: list[np.ndarray | None] | None = None,
) -> bytes:
    """Encode ``(h, w)`` uint8 index frames as a GIF89a: global color table
    from ``plte`` (padded to the next power of two, max 256 entries), one
    image block per frame (optional per-frame local color table overriding
    the global one), literal-only LZW (valid stream, no dict reuse),
    optional interlaced row order, per-frame delay in centiseconds via a
    Graphic Control Extension."""
    plte = np.asarray(plte, dtype=np.uint8)
    if plte.ndim != 2 or plte.shape[1] != 3 or not 1 <= len(plte) <= 256:
        raise ValueError(f"palette must be (n<=256, 3) uint8, got {plte.shape}")
    h, w = frames[0].shape

    def table_bits(n):
        bits = 1
        while (1 << bits) < n:
            bits += 1
        return max(bits, 1)

    gbits = table_bits(len(plte))
    gct = plte.tobytes() + b"\x00" * ((1 << gbits) * 3 - len(plte) * 3)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (gbits - 1), 0, 0)
    out += gct
    for fi, fr in enumerate(frames):
        fr = np.asarray(fr, dtype=np.uint8)
        if fr.shape != (h, w):
            raise ValueError("all frames must share the canvas size")
        lct = None if local_palettes is None else local_palettes[fi]
        active = plte if lct is None else np.asarray(lct, dtype=np.uint8)
        if int(fr.max(initial=0)) >= len(active):
            raise ValueError("index out of color-table range")
        if delays_cs is not None:
            out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0, delays_cs[fi], 0, 0)
        flags = 0
        lbits = 0
        if lct is not None:
            lbits = table_bits(len(lct))
            flags |= 0x80 | (lbits - 1)
        if interlace:
            flags |= 0x40
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, flags)
        if lct is not None:
            out += active.tobytes() + b"\x00" * ((1 << lbits) * 3 - len(active) * 3)
        # indices in stored row order
        ys = _gif_interlace_order(h) if interlace else range(h)
        literals = [int(v) for y in ys for v in fr[y]]
        min_code = max(table_bits(len(active)), 2)
        clear = 1 << min_code
        codes = []
        for i, lit in enumerate(literals):
            if i % 200 == 0:
                codes.append(clear)  # re-clear before the width would grow
            codes.append(lit)
        if not literals:
            codes.append(clear)
        codes.append(clear + 1)  # end of information
        packed = _gif_pack_codes(codes, min_code)
        out.append(min_code)
        for off in range(0, len(packed), 255):
            chunk = packed[off : off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> list[int]:
    """Full GIF-variant LZW: growing code width (to 12 bits), clear resets,
    end-of-information; raises on corrupt streams instead of guessing."""
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    dictionary: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    acc = 0
    nbits = 0
    pos = 0
    prev: list[int] | None = None
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            dictionary = [[i] for i in range(clear)] + [[], []]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(dictionary) or not dictionary[code]:
                raise ValueError(f"bad first LZW code {code}")
            entry = dictionary[code]
        elif code < len(dictionary) and (dictionary[code] or code < clear):
            entry = dictionary[code]
            dictionary.append(prev + [entry[0]])
        elif code == len(dictionary):
            entry = prev + [prev[0]]
            dictionary.append(entry)
        else:
            raise ValueError(f"bad LZW code {code} (dict size {len(dictionary)})")
        out.extend(entry)
        if prev is not None and len(dictionary) == (1 << width) and width < 12:
            width += 1
        prev = entry
    return out[:n_pixels]


def decode_gif(b: bytes) -> tuple[list[np.ndarray], list[int | None]]:
    """Decode a GIF87a/89a to ``(frames, delays)``: one ``(h, w, 3)`` uint8
    RGB array per image block (local color table wins over the global one;
    interlaced frames are deinterlaced), and the preceding Graphic Control
    Extension's delay in centiseconds (None when absent).  Malformed
    framing, missing color tables, and out-of-range indices raise
    ``ValueError``."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (bad signature)")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 1 << ((flags & 0x07) + 1)
        gct = np.frombuffer(b, dtype=np.uint8, count=n * 3, offset=pos).reshape(-1, 3)
        pos += n * 3
    frames: list[np.ndarray] = []
    delays: list[int | None] = []
    pending_delay: int | None = None
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return frames, delays
        if block == 0x21:  # extension: label + sub-blocks
            label = b[pos]
            pos += 1
            while True:
                size = b[pos]
                pos += 1
                if size == 0:
                    break
                if label == 0xF9 and size == 4:
                    pending_delay = struct.unpack_from("<H", b, pos + 1)[0]
                pos += size
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        fx, fy, fw, fh, fflags = struct.unpack_from("<HHHHB", b, pos)
        pos += 9
        if (fx, fy) != (0, 0) or (fw, fh) != (w, h):
            raise NotImplementedError(
                "sub-canvas GIF frames (compositing) not supported"
            )
        table = gct
        if fflags & 0x80:
            n = 1 << ((fflags & 0x07) + 1)
            table = np.frombuffer(
                b, dtype=np.uint8, count=n * 3, offset=pos
            ).reshape(-1, 3)
            pos += n * 3
        if table is None:
            raise ValueError("GIF frame has neither local nor global color table")
        min_code = b[pos]
        pos += 1
        if not 2 <= min_code <= 8:
            raise ValueError(f"bad LZW minimum code size {min_code}")
        data = bytearray()
        while True:
            size = b[pos]
            pos += 1
            if size == 0:
                break
            data += b[pos : pos + size]
            pos += size
        idx = np.array(
            _gif_lzw_decode(bytes(data), min_code, fw * fh), dtype=np.int64
        ).reshape(fh, fw)
        if fflags & 0x40:  # interlaced: stored rows map to pass order
            order = _gif_interlace_order(fh)
            de = np.empty_like(idx)
            de[order] = idx
            idx = de
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError(
                f"GIF index {int(idx.max())} out of color-table range ({len(table)})"
            )
        frames.append(np.ascontiguousarray(table[idx].astype(np.uint8)))
        delays.append(pending_delay)
        pending_delay = None
    raise ValueError("truncated GIF (no trailer)")


GIF_FRAME_SCHEMA = (
    "doc_id long, frame_id long, delay_cs long, width long, height long, "
    "n_samples long, mean_c0 double, mean_luma double"
)


def _gif_plan(doc_id: int) -> bytes:
    """Closed-form multi-frame GIF per doc: ``1 + d%3`` frames on the usual
    ``(5+d%4) × (3+d%3)`` canvas, 16-entry palette
    ``j → ((d+29j)%256, (d+53j)%256, (d+71j)%256)``, frame ``f`` pixel ``i``
    (row-major) indexing entry ``(d+f+i)%16``, delay ``4+f`` cs."""
    d = int(doc_id)
    w, h = 5 + d % 4, 3 + d % 3
    j = np.arange(16, dtype=np.int64)
    plte = np.stack(
        [(d + 29 * j) % 256, (d + 53 * j) % 256, (d + 71 * j) % 256], axis=-1
    ).astype(np.uint8)
    i = np.arange(w * h, dtype=np.int64)
    frames = [
        ((d + f + i) % 16).astype(np.uint8).reshape(h, w)
        for f in range(1 + d % 3)
    ]
    return encode_gif(frames, plte, delays_cs=[4 + f for f in range(len(frames))])


def synthesize_gif_payloads(docs: DataFrame) -> DataFrame:
    """Attach a REAL multi-frame GIF payload (per :func:`_gif_plan`) to each
    document — Arrow-batched, map-only, partition-preserving."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id in pdf["doc_id"]:
                payload = _gif_plan(doc_id)
                out.append(
                    {
                        "doc_id": doc_id,
                        "payload": payload,
                        "meta": {"format": "image/gif", "n_bytes": len(payload)},
                    }
                )
            if out:
                yield pd.DataFrame(out)

    return docs.select("doc_id").mapInPandas(run, schema=PAYLOAD_SCHEMA)


def extract_gif_frames(with_payload: DataFrame) -> DataFrame:
    """Decode real multi-frame GIFs and emit ONE ROW PER FRAME — the 1→N
    frame-extraction contract (the video decode shape) through a REAL
    codec, superseding :func:`sample_frames`' byte-slicing stand-in for
    this format.  Features are exact integer sums divided once, the
    bit-reproducible contract shared with the other codec extractors."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                if meta["format"] != "image/gif":
                    continue
                frames, delays = decode_gif(bytes(payload))
                for fi, (px, delay) in enumerate(zip(frames, delays)):
                    px = px.astype(np.int64)
                    h, w, _ = px.shape
                    n = w * h
                    sr, sg, sb = (int(px[:, :, c].sum()) for c in range(3))
                    out.append(
                        {
                            "doc_id": doc_id, "frame_id": fi,
                            "delay_cs": delay, "width": w, "height": h,
                            "n_samples": n,
                            "mean_c0": sr / n,
                            "mean_luma": 0.299 * (sr / n) + 0.587 * (sg / n)
                            + 0.114 * (sb / n),
                        }
                    )
            if out:
                yield pd.DataFrame(out)

    return with_payload.mapInPandas(run, schema=GIF_FRAME_SCHEMA)
