"""Deep-fuzz soak for the r14 codec paths — the reproducible form of the
closing evidence in COVERAGE.md (r14 gate-scale close).

Beyond the committed hypothesis tiers (bounded examples, CI-speed), this
runs thousands of randomized trials per codec plus the EXHAUSTIVE MP3
version x layer x sample-rate x bitrate matrix:

  * lossless JPEG (SOF3): decode(encode(px)) bit-exact over random images
    across precisions 2..16, all seven predictors, 1-4 channels;
  * PNG depths: 1/2/4/8/16-bit x grey/grey-alpha/RGB/RGBA x plain/Adam7,
    exact (x255/85/17 scaling for sub-8 greys);
  * ADPCM fact truncation: the fact-cut decode is always a prefix of the
    full decode, mono and stereo, random block data;
  * MP3 header walk: every table cell round-trips through the builder;
  * 12-bit JPEG at 4:2:0/4:2:2: shape-preserving, loss bounded.

    python tools/codec_soak.py [n_scale]

n_scale multiplies the default trial counts (default 1).  Exit 0 = clean.

Since r15 the tiers are parameterized functions so the suite runs a
budgeted seeded slice every round (tests/test_codec_soak.py, VERDICT r14
ask #4) — the soak evidence regenerates at HEAD instead of living in a
one-off COVERAGE.md record; this CLI remains the full-scale form.
"""

from __future__ import annotations

import os
import struct
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # pragma: no cover - import side effect
    sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

from data_wrangling_with_openstreetmap_and_mongodb_spark.operators.multimodal import (  # noqa: E402
    _MP3_BITRATES,
    _MP3_SAMPLE_RATES,
    decode_jpeg,
    decode_mp3_headers,
    decode_png,
    decode_wav,
    encode_jpeg,
    encode_jpeg_lossless,
    encode_mp3_frames,
    encode_png,
    encode_wav_adpcm,
)

DEFAULT_SEED = 2024


def soak_lossless_jpeg(n: int, rng: np.random.Generator) -> list[tuple]:
    """decode(encode(px)) bit-exact: random precision/predictor/channels."""
    fails: list[tuple] = []
    for trial in range(n):
        prec = int(rng.choice([2, 4, 8, 12, 16]))
        w, h = int(rng.integers(1, 12)), int(rng.integers(1, 10))
        ch = int(rng.choice([1, 2, 3, 4]))
        pred = int(rng.integers(1, 8))
        px = rng.integers(0, 1 << prec, (h, w, ch) if ch > 1 else (h, w)).astype(
            np.uint16 if prec > 8 else np.uint8
        )
        out = decode_jpeg(encode_jpeg_lossless(px, predictor=pred, precision=prec))
        if not np.array_equal(out.astype(np.uint32), px.astype(np.uint32)):
            fails.append(("lossless", trial, prec, pred, ch))
            break
    return fails


def soak_jpeg12_subsampled(n: int, rng: np.random.Generator) -> list[tuple]:
    """12-bit DCT at 4:2:0 and 4:2:2: shape-preserving, loss bounded."""
    fails: list[tuple] = []
    for trial in range(n):
        w, h = int(rng.integers(4, 30)), int(rng.integers(4, 30))
        px = rng.integers(0, 4096, (h, w, 3)).astype(np.uint16)
        for sub in (True, "422"):
            out = decode_jpeg(encode_jpeg(px, precision=12, subsample=sub))
            err = int(np.abs(out.astype(int) - px.astype(int)).max())
            if out.shape != px.shape or err > 4096:
                fails.append(("j12sub", trial, sub, err))
                break
        if fails:
            break
    return fails


def soak_png_depths(n: int, rng: np.random.Generator) -> list[tuple]:
    """PNG 1/2/4/8/16-bit x channel-count x plain/Adam7: exact."""
    fails: list[tuple] = []
    for trial in range(n):
        depth = int(rng.choice([1, 2, 4, 8, 16]))
        ch = 1 if depth < 8 else int(rng.choice([1, 2, 3, 4]))
        w, h = int(rng.integers(1, 20)), int(rng.integers(1, 16))
        il = bool(rng.integers(0, 2))
        px = rng.integers(0, 1 << depth, (h, w, ch) if ch > 1 else (h, w)).astype(
            np.uint16 if depth == 16 else np.uint8
        )
        out = decode_png(encode_png(px, depth=depth, interlace=il))
        sc = {1: 255, 2: 85, 4: 17}.get(depth, 1)
        want = px.astype(np.uint32) * sc if depth < 8 else px.astype(np.uint32)
        if not np.array_equal(out.astype(np.uint32).reshape(px.shape), want):
            fails.append(("png", trial, depth, ch, il, w, h))
            break
    return fails


def soak_adpcm_fact(n: int, rng: np.random.Generator) -> list[tuple]:
    """IMA ADPCM: the fact-cut decode is a prefix of the full decode."""
    fails: list[tuple] = []
    for trial in range(n):
        chn = int(rng.choice([1, 2]))
        groups = int(rng.integers(1, 5))
        align = 4 * chn + 4 * chn * groups
        nb = int(rng.integers(1, 4))
        data = b""
        for _ in range(nb):
            for _ in range(chn):
                data += struct.pack(
                    "<hBB",
                    int(rng.integers(-32768, 32768)),
                    int(rng.integers(0, 89)),
                    0,
                )
            data += bytes(rng.integers(0, 256, 4 * chn * groups, dtype=np.uint8))
        total = nb * (1 + 8 * groups)
        ns = int(rng.integers(1, total + 1))
        _, _, full = decode_wav(encode_wav_adpcm(8000, chn, align, data))
        _, _, cut = decode_wav(encode_wav_adpcm(8000, chn, align, data, ns))
        if len(full) != total * chn or cut.tolist() != full[: ns * chn].tolist():
            fails.append(("adpcm", trial))
            break
    return fails


def soak_mp3_matrix() -> list[tuple]:
    """EXHAUSTIVE version x layer x sample-rate x bitrate header round-trip
    (the full public tables — deterministic, no rng, ~1000 cells)."""
    fails: list[tuple] = []
    for version, vbits in (("MPEG1", 3), ("MPEG2", 2), ("MPEG2.5", 0)):
        vg = 1 if version == "MPEG1" else 2
        for layer in (1, 2, 3):
            table = _MP3_BITRATES[(vg, min(layer, 2) if vg == 2 else layer)]
            for sr in _MP3_SAMPLE_RATES[vbits]:
                for br in table:
                    m = decode_mp3_headers(
                        encode_mp3_frames(version, layer, sr, [(br, 0), (br, 1)])
                    )
                    if m["n_frames"] != 2 or m["avg_bitrate_kbps"] != br:
                        fails.append(("mp3", version, layer, sr, br))
    return fails


def run_soak(
    scale: float = 1.0, seed: int = DEFAULT_SEED, verbose: bool = True
) -> list[tuple]:
    """Run every tier at ``scale`` x the full-soak trial counts with one
    shared seeded rng (scale=1 reproduces the committed r14 soak)."""
    rng = np.random.default_rng(seed)
    fails: list[tuple] = []
    for label, run in (
        (f"lossless soak ({int(2000 * scale)})",
         lambda: soak_lossless_jpeg(int(2000 * scale), rng)),
        (f"12-bit subsampled ({int(40 * scale)})",
         lambda: soak_jpeg12_subsampled(int(40 * scale), rng)),
        (f"png depth soak ({int(800 * scale)})",
         lambda: soak_png_depths(int(800 * scale), rng)),
        (f"adpcm fact soak ({int(400 * scale)})",
         lambda: soak_adpcm_fact(int(400 * scale), rng)),
        ("mp3 exhaustive matrix", soak_mp3_matrix),
    ):
        tier_fails = run()
        fails.extend(tier_fails)
        if verbose:
            print(f"{label}: {'OK' if not tier_fails else tier_fails[-1]}")
    return fails


def main() -> int:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    fails = run_soak(scale=scale, seed=DEFAULT_SEED)
    print(f"\nTOTAL FAILS: {len(fails)}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
