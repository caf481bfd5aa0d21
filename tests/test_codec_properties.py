"""Property-based tests (hypothesis) for the stdlib media codecs: encode ∘
decode must be the identity for EVERY well-formed input, not just the golden
fixtures — arbitrary pixel values (including 0x00 rows that look like padding
and 'BM'-colliding bytes), arbitrary int16 samples (including extremes and
values whose little-endian bytes spell RIFF chunk ids), and every row-pad
width.  Pure Python/numpy — no SparkSession needed."""

from __future__ import annotations
from conftest import fuzz_examples

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.multimodal import (
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
    resample_wav,
    resize_bmp,
)


@st.composite
def images(draw):
    w = draw(st.integers(min_value=1, max_value=9))
    h = draw(st.integers(min_value=1, max_value=7))
    data = draw(
        st.binary(min_size=w * h * 3, max_size=w * h * 3)
    )
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


@settings(max_examples=fuzz_examples(60), deadline=None)
@given(images())
def test_bmp_roundtrip_identity(px):
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)


@settings(max_examples=fuzz_examples(60), deadline=None)
@given(
    st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=64),
    st.integers(min_value=1, max_value=2),
    st.sampled_from([8000, 11025, 44100]),
)
def test_wav_roundtrip_identity(vals, ch, rate):
    frames = len(vals) // ch
    if frames == 0:
        return
    samples = np.array(vals[: frames * ch], dtype=np.int16)
    r, c, out = decode_wav(encode_wav(rate, ch, samples))
    assert (r, c) == (rate, ch)
    assert np.array_equal(out, samples)


@settings(max_examples=fuzz_examples(40), deadline=None)
@given(images(), st.integers(min_value=1, max_value=12), st.integers(min_value=1, max_value=12))
def test_resize_matches_index_map(px, out_w, out_h):
    """The resize output pixel (x, y) must equal the source pixel at the
    documented integer index map — for every size combination, up or down."""
    out = resize_bmp(px, out_w, out_h)
    h, w, _ = px.shape
    assert out.shape == (out_h, out_w, 3)
    for y in (0, out_h - 1):
        for x in (0, out_w - 1):
            assert np.array_equal(out[y, x], px[(y * h) // out_h, (x * w) // out_w])


@settings(max_examples=fuzz_examples(40), deadline=None)
@given(
    st.lists(st.integers(min_value=-1024, max_value=1024), min_size=2, max_size=48),
    st.integers(min_value=1, max_value=2),
    st.integers(min_value=1, max_value=24),
)
def test_resample_matches_index_map(vals, ch, out_frames):
    frames = len(vals) // ch
    if frames == 0:
        return
    s = np.array(vals[: frames * ch], dtype=np.int16)
    out = resample_wav(s, ch, frames, out_frames)
    assert len(out) == out_frames * ch
    grid = s.reshape(frames, ch)
    for j in (0, out_frames - 1):
        src = (j * frames) // out_frames
        assert np.array_equal(out[j * ch : (j + 1) * ch], grid[src])


@st.composite
def png_images(draw):
    """Arbitrary 8-bit image + per-row filter choices: grey/RGB/RGBA shapes,
    pixel bytes that collide with chunk ids and filter markers, and filter
    assignments hypothesis picks freely (not just the y%5 default)."""
    w = draw(st.integers(min_value=1, max_value=9))
    h = draw(st.integers(min_value=1, max_value=7))
    ch = draw(st.sampled_from([1, 3, 4]))
    data = draw(st.binary(min_size=w * h * ch, max_size=w * h * ch))
    shape = (h, w) if ch == 1 else (h, w, ch)
    px = np.frombuffer(data, dtype=np.uint8).reshape(shape)
    filters = draw(
        st.lists(st.integers(min_value=0, max_value=4), min_size=h, max_size=h)
    )
    return px, filters


@settings(max_examples=fuzz_examples(120), deadline=None)
@given(png_images())
def test_png_roundtrip_identity(img):
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    px, filters = img
    out = decode_png(encode_png(px, row_filters=filters))
    assert out.shape == px.shape and np.array_equal(out, px)


@st.composite
def gifs(draw):
    w = draw(st.integers(min_value=1, max_value=8))
    h = draw(st.integers(min_value=1, max_value=12))
    n_colors = draw(st.integers(min_value=2, max_value=32))
    n_frames = draw(st.integers(min_value=1, max_value=3))
    plte = np.frombuffer(
        draw(st.binary(min_size=n_colors * 3, max_size=n_colors * 3)), dtype=np.uint8
    ).reshape(-1, 3)
    frames = [
        np.frombuffer(draw(st.binary(min_size=w * h, max_size=w * h)), dtype=np.uint8)
        .reshape(h, w) % n_colors
        for _ in range(n_frames)
    ]
    interlace = draw(st.booleans())
    return frames, plte, interlace


@settings(max_examples=fuzz_examples(80), deadline=None)
@given(gifs())
def test_gif_roundtrip_identity(g):
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    frames, plte, interlace = g
    out, delays = decode_gif(encode_gif(frames, plte, interlace=interlace))
    assert len(out) == len(frames) and delays == [None] * len(frames)
    for f, o in zip(frames, out):
        assert np.array_equal(o, plte[f])


@st.composite
def jpeg_images(draw):
    w = draw(st.integers(min_value=1, max_value=20))
    h = draw(st.integers(min_value=1, max_value=20))
    color = draw(st.booleans())
    shape = (h, w, 3) if color else (h, w)
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    return np.random.RandomState(seed).randint(  # seeded: shrinkable fuzz
        0, 256, size=shape, dtype=np.uint8
    )


@settings(max_examples=fuzz_examples(60), deadline=None)
@given(jpeg_images(), st.booleans(), st.booleans())
def test_jpeg_roundtrip_bounded_and_mode_equivalent(img, progressive, subsample):
    """Random images, every mode pairing: (1) q=1 roundtrip loss is bounded
    by DCT-rounding (+ color-convert integer rounding for RGB), and
    (2) progressive and sequential encodings of the same image decode
    BIT-IDENTICALLY — the modes share only the forward DCT/quantization,
    so equality pins both entropy paths against each other."""
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    if subsample and img.ndim == 2:
        subsample = False  # grayscale has no chroma to subsample
    q1 = np.ones(64, dtype=np.int64)
    kw = dict(quant_luma=q1, quant_chroma=q1, subsample=subsample)
    seq = decode_jpeg(encode_jpeg(img, **kw))
    assert seq.shape == img.shape
    if not subsample:  # 4:2:0 chroma averaging is real loss, skip the bound
        tol = 2 if img.ndim == 2 else 4
        assert int(np.abs(seq.astype(int) - img.astype(int)).max()) <= tol
    prog = decode_jpeg(encode_jpeg(img, progressive=True, **kw))
    assert np.array_equal(prog, seq)


@settings(max_examples=fuzz_examples(40), deadline=None)
@given(jpeg_images(), st.data())
def test_jpeg_truncation_always_raises_cleanly(img, data):
    """Any prefix cut of a valid JPEG (either coding) raises ValueError or
    NotImplementedError — never IndexError/struct.error/StopIteration."""
    import pytest

    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    progressive = data.draw(st.booleans())
    b = encode_jpeg(img, progressive=progressive)
    # progressive needs EOI to reconstruct, so every cut must raise; for
    # sequential, dropping ONLY the EOI still decodes (lenient trailing)
    hi = len(b) if progressive else len(b) - 2
    cut = data.draw(st.integers(min_value=2, max_value=max(2, hi - 1)))
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jpeg(b[:cut])


@st.composite
def png_depth_images(draw):
    """Arbitrary (pixels, depth, channels, interlace) over the full spec
    matrix the r14 encoder supports: 1/2/4-bit grey, 8-bit everything,
    16-bit everything, plain and Adam7."""
    depth = draw(st.sampled_from([1, 2, 4, 8, 16]))
    ch = 1 if depth < 8 else draw(st.sampled_from([1, 2, 3, 4]))
    w = draw(st.integers(min_value=1, max_value=11))
    h = draw(st.integers(min_value=1, max_value=9))
    n = w * h * ch
    if depth == 16:
        vals = draw(st.lists(st.integers(0, 65535), min_size=n, max_size=n))
        px = np.array(vals, dtype=np.uint16)
    else:
        vals = draw(
            st.lists(st.integers(0, (1 << depth) - 1), min_size=n, max_size=n)
        )
        px = np.array(vals, dtype=np.uint8)
    px = px.reshape((h, w) if ch == 1 else (h, w, ch))
    return px, depth, draw(st.booleans())


@settings(max_examples=fuzz_examples(120), deadline=None)
@given(png_depth_images())
def test_png_depth_roundtrip_identity(img):
    """r14 depth/grey-alpha support: decode(encode(px, depth)) equals px
    exactly — ×(255/(2^d−1)) for sub-8 greys (the decoder's documented
    8-bit scaling), identity elsewhere — for every spec-valid
    (depth, color-type, interlace) combination, at every width that
    stresses the bit-packing tail byte and the Adam7 pass grids."""
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    px, depth, interlace = img
    out = decode_png(encode_png(px, depth=depth, interlace=interlace))
    scale = {1: 255, 2: 85, 4: 17}.get(depth, 1)
    want = px.astype(np.uint16) * scale if depth < 8 else px
    assert out.shape == px.shape
    assert np.array_equal(out.astype(np.uint32), want.astype(np.uint32))
    if depth == 16:
        assert out.dtype == np.uint16


@st.composite
def mp3_streams(draw):
    version = draw(st.sampled_from(["MPEG1", "MPEG2", "MPEG2.5"]))
    layer = draw(st.sampled_from([1, 2, 3]))
    rates = {
        "MPEG1": (44100, 48000, 32000),
        "MPEG2": (22050, 24000, 16000),
        "MPEG2.5": (11025, 12000, 8000),
    }[version]
    sr = draw(st.sampled_from(rates))
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.multimodal import (
        _MP3_BITRATES,
    )

    vg = 1 if version == "MPEG1" else 2
    table = _MP3_BITRATES[(vg, min(layer, 2) if vg == 2 else layer)]
    k = draw(st.integers(min_value=1, max_value=6))
    specs = [
        (draw(st.sampled_from(table)), draw(st.integers(0, 1)))
        for _ in range(k)
    ]
    return version, layer, sr, specs, draw(st.sampled_from([1, 2])), draw(
        st.integers(0, 3)
    ) * 37


@settings(max_examples=fuzz_examples(120), deadline=None)
@given(mp3_streams())
def test_mp3_header_walk_roundtrip(s):
    """The walker must recover frame count, sample totals, exact average
    bitrate, VBR flag and channel count from ANY stream the builder can
    express — every version x layer x samplerate x bitrate-index x padding
    combination, with and without ID3v2 — and any truncation of the last
    frame must raise ValueError, never mis-count."""
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.multimodal import (
        decode_mp3_headers,
        encode_mp3_frames,
    )

    version, layer, sr, specs, ch, id3 = s
    b = encode_mp3_frames(version, layer, sr, specs, channels=ch, id3v2_bytes=id3)
    m = decode_mp3_headers(b)
    assert m["version"] == version and m["layer"] == layer
    assert m["sample_rate"] == sr and m["n_channels"] == ch
    assert m["n_frames"] == len(specs)
    assert m["is_vbr"] == (len({br for br, _ in specs}) > 1)
    assert m["avg_bitrate_kbps"] == sum(br for br, _ in specs) / len(specs)
    spf = 384 if layer == 1 else (1152 if layer == 2 or version == "MPEG1" else 576)
    assert m["n_samples"] == len(specs) * spf
    assert m["n_bytes"] == len(b)
    import pytest

    with pytest.raises(ValueError):
        decode_mp3_headers(b[:-1])


@st.composite
def adpcm_streams(draw):
    ch = draw(st.sampled_from([1, 2]))
    groups = draw(st.integers(min_value=1, max_value=4))  # per full block
    align = 4 * ch + 4 * ch * groups
    n_blocks = draw(st.integers(min_value=1, max_value=3))
    blocks = []
    frames_full = 1 + 8 * groups
    for _ in range(n_blocks):
        hdr = b""
        for _ in range(ch):
            pred = draw(st.integers(-32768, 32767))
            idx = draw(st.integers(0, 88))
            hdr += int.to_bytes(pred & 0xFFFF, 2, "little") + bytes([idx, 0])
        body = draw(
            st.binary(min_size=4 * ch * groups, max_size=4 * ch * groups)
        )
        blocks.append(hdr + body)
    total_frames = n_blocks * frames_full
    n_samples = draw(st.integers(min_value=1, max_value=total_frames))
    return ch, align, b"".join(blocks), n_samples, total_frames


@settings(max_examples=fuzz_examples(100), deadline=None)
@given(adpcm_streams())
def test_adpcm_fact_truncation_is_prefix(s):
    """For ANY block data and ANY fact length <= decodable frames, the
    fact-truncated output must be exactly the prefix of the untruncated
    decode — fact changes LENGTH, never values (mono and stereo)."""
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.multimodal import (
        decode_wav,
        encode_wav_adpcm,
    )

    ch, align, data, n_samples, total = s
    _, _, full = decode_wav(encode_wav_adpcm(8000, ch, align, data))
    _, _, cut = decode_wav(encode_wav_adpcm(8000, ch, align, data, n_samples))
    assert len(full) == total * ch
    assert len(cut) == n_samples * ch
    assert cut.tolist() == full[: n_samples * ch].tolist()


@settings(max_examples=fuzz_examples(40), deadline=None)
@given(jpeg_images(), st.data())
def test_jpeg_fill_bytes_before_markers_decode_identically(img, data):
    """The spec allows any number of 0xFF fill bytes before a marker;
    third-party encoders emit them (ADVICE r13 found the walker could read
    past the end at a fill-run truncation).  Inserting fill runs before
    header-segment markers must not change the decode — and truncating at
    an injected fill run must raise ValueError, never IndexError."""
    import pytest

    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    b = encode_jpeg(img, progressive=data.draw(st.booleans()))
    # walk header segments (stop at SOS: beyond it 0xFF runs are entropy
    # stuffing, not fill) and inject a fill run before each marker
    out = bytearray(b[:2])
    pos = 2
    sos_seen = False
    while pos < len(b) and not sos_seen:
        assert b[pos] == 0xFF
        marker = b[pos + 1]
        out += bytes([0xFF] * data.draw(st.integers(0, 3)))
        if marker == 0xDA:
            sos_seen = True
            out += b[pos:]
            break
        import struct as _s

        (seglen,) = _s.unpack_from(">H", b, pos + 2)
        out += b[pos : pos + 2 + seglen]
        pos += 2 + seglen
    filled = bytes(out)
    assert np.array_equal(decode_jpeg(filled), decode_jpeg(b))
    # truncation inside the padded header must raise cleanly
    cut = data.draw(st.integers(min_value=2, max_value=len(filled) - len(b) + pos + 1))
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jpeg(filled[:cut])


@st.composite
def lossless_images(draw):
    prec = draw(st.sampled_from([2, 4, 8, 12, 16]))
    w = draw(st.integers(min_value=1, max_value=9))
    h = draw(st.integers(min_value=1, max_value=7))
    ch = draw(st.sampled_from([1, 3]))
    n = w * h * ch
    vals = draw(st.lists(st.integers(0, (1 << prec) - 1), min_size=n, max_size=n))
    px = np.array(vals, dtype=np.uint16 if prec > 8 else np.uint8)
    px = px.reshape((h, w) if ch == 1 else (h, w, ch))
    return px, prec, draw(st.integers(1, 7))


@settings(max_examples=fuzz_examples(100), deadline=None)
@given(lossless_images())
def test_jpeg_lossless_roundtrip_identity(img):
    """SOF3 has no quantizer: decode(encode(px)) must be px bit-for-bit
    for EVERY input, precision, predictor, and channel count — including
    extreme values whose mod-2^16 diffs exercise the category-16 symbol."""
    from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg_lossless,
    )

    px, prec, pred = img
    out = decode_jpeg(encode_jpeg_lossless(px, predictor=pred, precision=prec))
    assert out.shape == px.shape
    assert np.array_equal(out.astype(np.uint32), px.astype(np.uint32))
