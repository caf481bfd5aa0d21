"""Foreign-file codec fixtures (VERDICT r14 ask #1): every media payload the
suite decoded through r14 was produced by this repo's own encoders, so an
encoder/decoder-CORRELATED spec misreading (both sides agreeing on a wrong
bit order / predictor / chroma placement) was structurally invisible to the
round-trip soak.  These fixtures were emitted by a second, independent codec
stack -- OpenJDK 17's javax.imageio / javax.sound.sampled
(tools/foreign_fixtures/GenForeignFixtures.java, provenance in FIXTURES.md)
-- from closed-form pixel/sample patterns re-derived here in numpy, never
via repo code:

  * gradient.png / gradient.bmp: lossless, so OUR decode must equal the
    formula EXACTLY;
  * palette.gif: indexed write is lossless -- exact vs both the formula and
    Java's own re-decode;
  * smooth.jpg / gradient.jpg: lossy -- compared against Java's OWN decode
    of the same bytes (gradient.jpg.decoded.bin), tolerances sized to
    IDCT/chroma-upsampling rounding (Java=libjpeg fancy upsampling, ours=
    nearest-replication; luma carries no upsampling so it gets the tight
    bound on the discontinuous image);
  * ramp.wav: PCM is lossless -- exact integer-formula match;
  * ramp_ulaw.wav / ramp_alaw.wav: payload bytes extracted by an
    independent RIFF walk below and expanded through CPython's audioop (a
    THIRD G.711 implementation) must equal our decode sample-for-sample.

Plus the one genuinely third-party file in reach: the reference repo's own
matplotlib-emitted PNG (/root/reference/output_97_0.png, 676x499 RGBA,
multi-IDAT, ancillary sBIT/pHYs) -- our decode must be BIT-IDENTICAL to
Java's (sha256 over row-major RGBA recorded in manifest.json).

And an audioop cross-check of the IMA ADPCM stepping math: audioop's
Intel/DVI ADPCM uses the same step/index tables with swapped nibble order
and no block framing, so decoding our block payloads through
audioop.adpcm2lin seeded with the block-header state must reproduce our
decoder's samples exactly.
"""

from __future__ import annotations

import hashlib
import json
import os
import struct
import warnings

import numpy as np
import pytest

from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.multimodal import (
    decode_bmp,
    decode_gif,
    decode_jpeg,
    decode_png,
    decode_wav,
    encode_wav_adpcm,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures", "foreign")
REFERENCE_PNG = "/root/reference/output_97_0.png"
W, H = 64, 40


def _fixture(name: str) -> bytes:
    with open(os.path.join(FIXTURES, name), "rb") as f:
        return f.read()


@pytest.fixture(scope="module")
def manifest() -> dict:
    with open(os.path.join(FIXTURES, "manifest.json")) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def gradient_rgb() -> np.ndarray:
    # the generator's pattern, re-derived: r=(3x+7y)%256 g=(5x+11y)%256 b=(xy)%256
    y, x = np.mgrid[0:H, 0:W]
    return np.stack(
        [(3 * x + 7 * y) % 256, (5 * x + 11 * y) % 256, (x * y) % 256], axis=-1
    ).astype(np.uint8)


def test_pattern_matches_generator_manifest(manifest, gradient_rgb):
    # guards the re-derivation itself: if the formula here drifted from the
    # Java side, every "exact" assertion below would be vacuously rewritable
    assert (
        hashlib.sha256(gradient_rgb.tobytes()).hexdigest()
        == manifest["gradient"]["src_rgb_sha256"]
    )


def test_foreign_png_decodes_exactly(gradient_rgb):
    px = decode_png(_fixture("gradient.png"))
    assert px.shape == (H, W, 3) and px.dtype == np.uint8
    assert np.array_equal(px, gradient_rgb)


def test_foreign_bmp_decodes_exactly(gradient_rgb):
    px = decode_bmp(_fixture("gradient.bmp"))
    assert np.array_equal(px, gradient_rgb)


def test_foreign_gif_decodes_exactly(gradient_rgb):
    frames, delays = decode_gif(_fixture("palette.gif"))
    assert len(frames) == 1 and delays == [None]
    # vs the independent formula: idx=(x+2y)%8 through palette
    # c_k=((37k+11)%256,(59k+3)%256,(83k+7)%256)
    y, x = np.mgrid[0:H, 0:W]
    k = np.arange(8)
    pal = np.stack(
        [(37 * k + 11) % 256, (59 * k + 3) % 256, (83 * k + 7) % 256], axis=-1
    ).astype(np.uint8)
    assert np.array_equal(frames[0], pal[(x + 2 * y) % 8])
    # and vs Java's own re-decode of the same bytes
    jref = np.frombuffer(_fixture("palette.gif.decoded.bin"), dtype=np.uint8)
    assert np.array_equal(frames[0], jref.reshape(H, W, 3))


def test_foreign_jpeg_smooth_close_to_java_decode(manifest):
    """Smooth ramps: no mod-wrap discontinuities, so remaining divergence is
    IDCT + upsampling rounding.  Measured: max 7 / mean 1.31 at HEAD."""
    ours = decode_jpeg(_fixture("smooth.jpg")).astype(int)
    jref = (
        np.frombuffer(_fixture("smooth.jpg.decoded.bin"), dtype=np.uint8)
        .reshape(H, W, 3)
        .astype(int)
    )
    d = np.abs(ours - jref)
    assert d.max() <= 8 and d.mean() <= 2.0, (d.max(), d.mean())
    # and both must sit near the true source ramp (decoder-agnostic sanity)
    y, x = np.mgrid[0:H, 0:W]
    src = np.stack(
        [
            (2 * 255 * x + (W - 1)) // (2 * (W - 1)),
            (2 * 255 * y + (H - 1)) // (2 * (H - 1)),
            (2 * 255 * (x + y) + (W + H - 2)) // (2 * (W + H - 2)),
        ],
        axis=-1,
    )
    ds = np.abs(ours - src)
    assert ds.max() <= 16 and ds.mean() <= 4.0, (ds.max(), ds.mean())


def test_foreign_jpeg_gradient_luma_matches_java_decode():
    """The wrapping gradient is a chroma-upsampling torture test: Java
    (libjpeg fancy/triangular) and our nearest-replication legitimately
    disagree by tens of RGB counts AT WRAP EDGES, but luma has no
    upsampling, so the Y plane must agree tightly (measured mean 0.44;
    the max reflects out-of-gamut clamping at chroma spikes)."""
    ours = decode_jpeg(_fixture("gradient.jpg")).astype(float)
    jref = (
        np.frombuffer(_fixture("gradient.jpg.decoded.bin"), dtype=np.uint8)
        .reshape(H, W, 3)
        .astype(float)
    )

    def luma(a):
        return 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]

    dl = np.abs(luma(ours) - luma(jref))
    assert dl.mean() <= 1.0 and dl.max() <= 24.0, (dl.mean(), dl.max())
    d = np.abs(ours - jref)
    assert d.mean() <= 16.0, d.mean()


def test_foreign_jpeg_progressive_close_to_java_decode(manifest):
    """A FOREIGN SOF2 bitstream: Java's writer in progressive mode emits
    libjpeg's standard multi-scan script (spectral selection + successive
    approximation), produced by an encoder this repo never implemented —
    the strongest independent exercise of the progressive decode path.
    Measured at HEAD: max 7 / mean 1.31 vs Java's own decode."""
    b = _fixture("smooth_progressive.jpg")
    assert b.find(b"\xff\xc2") > 0 and b.find(b"\xff\xc0") < 0  # SOF2, no SOF0
    ours = decode_jpeg(b).astype(int)
    jref = (
        np.frombuffer(
            _fixture("smooth_progressive.jpg.decoded.bin"), dtype=np.uint8
        )
        .reshape(H, W, 3)
        .astype(int)
    )
    d = np.abs(ours - jref)
    assert d.max() <= 8 and d.mean() <= 2.0, (d.max(), d.mean())


def test_foreign_png_16bit_grey_decodes_exactly():
    px = decode_png(_fixture("grey16.png"))
    assert px.shape == (H, W) and px.dtype == np.uint16
    y, x = np.mgrid[0:H, 0:W]
    assert np.array_equal(
        px.astype(np.int64), (257 * x * y + 41 * x + 97 * y) % 65536
    )


def test_foreign_bmp_4bit_matches_java_reader(manifest):
    """OpenJDK's BMP WRITER has a sub-8-bit bug (one palette index per byte
    into 4bpp-sized rows), so the file's pixels don't match the source
    image — Java's own reader confirms.  The fixture therefore checks
    READER-vs-READER parity: two independent decoders applying the spec's
    MSB-first nibble rule to the same bytes must agree exactly.  (The gap
    this file found was real regardless: decode_bmp rejected ALL 4-bit
    files before r15.)"""
    ours = decode_bmp(_fixture("palette.bmp"))
    jref = np.frombuffer(_fixture("palette.bmp.decoded.bin"), dtype=np.uint8)
    assert np.array_equal(ours, jref.reshape(H, W, 3))


def _pack_bmp(bpp: int, w: int, h: int, idx: np.ndarray, table: np.ndarray) -> bytes:
    """Spec-correct sub-8-bit palette BMP, hand-packed here from the
    BITMAPINFOHEADER layout (an independent derivation — NOT encode_bmp,
    which has no palette path): MSB-first bit packing, 4-byte row padding,
    bottom-up rows, BGRX color table."""
    row_raw = (w * bpp + 7) // 8
    row_size = (row_raw + 3) // 4 * 4
    bits = np.zeros((h, row_size * 8), dtype=np.uint8)
    for yy in range(h):
        for xx in range(w):
            v = int(idx[yy, xx])
            for bi in range(bpp):
                bits[yy, xx * bpp + bi] = (v >> (bpp - 1 - bi)) & 1
    rows = np.packbits(bits, axis=1)[::-1]  # bottom-up storage
    tab = b"".join(
        bytes([int(b_), int(g_), int(r_), 0]) for r_, g_, b_ in table
    )
    off = 14 + 40 + len(tab)
    header = b"BM" + struct.pack(
        "<IHHI", off + rows.size, 0, 0, off
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, rows.size, 0, 0,
                    len(table), 0)
    return header + tab + rows.tobytes()


@pytest.mark.parametrize("bpp", [1, 4])
def test_bmp_sub8_palette_spec_packing(bpp):
    """The r15 1/4-bit BMP path against a spec-correct hand-packed file
    (widths chosen to exercise partial trailing bytes and row padding)."""
    rng = np.random.default_rng(bpp)
    w, h = 13, 5  # 13 px @4bpp = 6.5 bytes -> trailing half byte; @1bpp 2 bytes
    n_colors = 1 << bpp
    idx = rng.integers(0, n_colors, (h, w))
    table = rng.integers(0, 256, (n_colors, 3))
    px = decode_bmp(_pack_bmp(bpp, w, h, idx, table))
    assert np.array_equal(px, table[idx].astype(np.uint8))


def _riff_data_chunk(b: bytes) -> tuple[int, bytes]:
    """Independent minimal RIFF walk (NOT decode_wav): returns
    (format_tag, data bytes)."""
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
    pos, tag, data = 12, None, None
    while pos + 8 <= len(b):
        cid, sz = struct.unpack_from("<4sI", b, pos)
        pos += 8
        if cid == b"fmt ":
            tag = struct.unpack_from("<H", b, pos)[0]
        elif cid == b"data":
            data = b[pos : pos + sz]
        pos += sz + (sz & 1)
    assert tag is not None and data is not None
    return tag, data


def test_foreign_wav_pcm_decodes_exactly(manifest):
    rate, ch, samples = decode_wav(_fixture("ramp.wav"))
    assert (rate, ch) == (8000, 1)
    want = ((np.arange(4000) * 2057) % 20001) - 10000
    assert np.array_equal(np.asarray(samples, dtype=np.int64), want)


def test_foreign_wav_stereo_decodes_exactly():
    rate, ch, samples = decode_wav(_fixture("ramp_stereo.wav"))
    assert (rate, ch) == (8000, 2)
    i = np.arange(2000)
    want = np.empty(4000, dtype=np.int64)
    want[0::2] = ((i * 2057) % 20001) - 10000
    want[1::2] = ((i * 3023) % 18001) - 9000
    assert np.array_equal(np.asarray(samples, dtype=np.int64), want)


@pytest.mark.parametrize("law, fmt_tag", [("ulaw", 7), ("alaw", 6)])
def test_foreign_wav_g711_matches_audioop(law, fmt_tag):
    """Java encoded the law bytes and wrote the container; audioop (a third
    implementation) expands the same payload; our decode must match it
    sample-for-sample."""
    audioop = pytest.importorskip("audioop")
    b = _fixture(f"ramp_{law}.wav")
    tag, payload = _riff_data_chunk(b)
    assert tag == fmt_tag
    rate, ch, ours = decode_wav(b)
    assert (rate, ch) == (8000, 1)
    expand = audioop.ulaw2lin if law == "ulaw" else audioop.alaw2lin
    want = np.frombuffer(expand(payload, 2), dtype="<i2")
    assert np.array_equal(np.asarray(ours, dtype=np.int64), want.astype(np.int64))


def test_adpcm_stepping_matches_audioop():
    """audioop's Intel/DVI ADPCM shares IMA's step/index tables but packs
    the FIRST sample of each byte in the HIGH nibble (IMA WAV: low) and has
    no block framing.  Nibble-swapping our block payload and seeding
    audioop's (valpred, index) state from the block header must therefore
    reproduce our decode of samples[1:] exactly -- an independent
    implementation of the core stepping math agreeing on random data."""
    audioop = pytest.importorskip("audioop")
    rng = np.random.default_rng(99)
    for trial in range(50):
        pred = int(rng.integers(-32768, 32768))
        idx = int(rng.integers(0, 89))
        groups = int(rng.integers(1, 9))
        nib = bytes(rng.integers(0, 256, 4 * groups, dtype=np.uint8))
        block = struct.pack("<hBB", pred, idx, 0) + nib
        _, _, ours = decode_wav(encode_wav_adpcm(8000, 1, 4 + 4 * groups, block))
        assert ours[0] == pred
        swapped = bytes(((x & 0x0F) << 4) | (x >> 4) for x in nib)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", DeprecationWarning)
            out, _state = audioop.adpcm2lin(swapped, 2, (pred, idx))
        want = np.frombuffer(out, dtype="<i2").astype(np.int64)
        got = np.asarray(ours[1 : 1 + len(want)], dtype=np.int64)
        assert np.array_equal(got, want), trial


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_PNG), reason="reference repo not mounted"
)
def test_reference_matplotlib_png_bit_identical_to_java(manifest):
    """The reference repo's own output_97_0.png: 676x499 8-bit RGBA,
    multi-IDAT, ancillary sBIT/pHYs chunks, emitted by matplotlib years
    before this repo existed.  Our decoder and OpenJDK's must produce the
    bit-identical pixel array."""
    exp = manifest["reference_png_java_decode"]
    with open(REFERENCE_PNG, "rb") as f:
        b = f.read()
    # IHDR read directly here (not via decode_png): 8-bit RGBA, no interlace
    w, h = struct.unpack(">II", b[16:24])
    depth, ctype, _comp, _filt, interlace = b[24:29]
    assert (w, h, depth, ctype, interlace) == (exp["width"], exp["height"], 8, 6, 0)
    px = decode_png(b)
    assert px.shape == (h, w, 4) and px.dtype == np.uint8
    assert hashlib.sha256(px.tobytes()).hexdigest() == exp["rgba_sha256"]
    sums = px.reshape(-1, 4).astype(np.uint64).sum(axis=0)
    assert sums.tolist() == [exp["sum_r"], exp["sum_g"], exp["sum_b"], exp["sum_a"]]
