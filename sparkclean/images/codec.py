"""Deterministic image codec used for the synthetic corpus.

The container has no PIL/libjpeg (SURVEY.md §2.12 — decode is stubbed
behind a deterministic fake), so we ship our own tiny codec with the two
properties the pipeline contract needs:

* ``png`` — lossless: raw RGB zlib-compressed → decode is bit-exact.
* ``jpeg`` — lossy-but-bounded: uniform quantisation to Q levels before
  compression.  Quantisation error is uniform in [-Q/2, Q/2], so
  MSE ≈ Q²/12; with Q=8 → PSNR ≈ 40.9 dB, exercising the "PSNR ≥ 40 dB
  for lossy formats" gate of BASELINE.json input_hint for real.

Format: 5-byte magic + uint16 w,h (LE) + zlib payload.  Everything is
NumPy-vectorised; decode_batch is what the Spark mapInPandas pass calls
per Arrow batch.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

MAGIC_PNG = b"SCPNG"
MAGIC_JPG = b"SCJPG"
JPEG_Q = 8


def synth_pixels(seed: int, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 image: gradient + counter-based noise.

    Pure function of (seed, w, h) — duplicates that share a seed share
    pixels exactly, regardless of partitioning.
    """
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.empty((h, w, 3), dtype=np.float64)
    s = np.float64(seed % 997 + 1)
    base[:, :, 0] = (xx * 255.0 / max(w - 1, 1) + s) % 256
    base[:, :, 1] = (yy * 255.0 / max(h - 1, 1) + 2 * s) % 256
    base[:, :, 2] = ((xx + yy) * 127.0 / max(w + h - 2, 1) + 3 * s) % 256
    # counter-based noise: splitmix-style integer mix of (seed, y, x);
    # uint64 wrap-around is the intended mixing behaviour
    with np.errstate(over="ignore"):
        idx = (yy.astype(np.uint64) * np.uint64(w) + xx.astype(np.uint64)) + np.uint64(
            seed
        ) * np.uint64(0x9E3779B97F4A7C15)
        z = (idx ^ (idx >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    noise = (z % np.uint64(32)).astype(np.float64) - 16.0
    out = np.clip(base + noise[:, :, None], 0, 255).astype(np.uint8)
    return out


def encode(pixels: np.ndarray, fmt: str) -> bytes:
    h, w = pixels.shape[:2]
    if fmt == "png":
        payload = pixels.tobytes()
        magic = MAGIC_PNG
    elif fmt == "jpeg":
        q = JPEG_Q
        quant = (pixels.astype(np.int32) // q * q + q // 2).clip(0, 255).astype(np.uint8)
        payload = quant.tobytes()
        magic = MAGIC_JPG
    else:
        raise ValueError(f"unknown fmt {fmt!r}")
    return magic + struct.pack("<HH", w, h) + zlib.compress(payload, level=1)


def decode(blob) -> tuple[np.ndarray, str]:
    """Accepts any buffer (bytes / memoryview / Arrow buffer slice) —
    the decode scan hands in zero-copy views of the Arrow data buffer.
    The exact ``bufsize`` (w*h*3 is known from the header) lets zlib
    allocate the output once instead of growing it."""
    mv = blob if isinstance(blob, memoryview) else memoryview(blob)
    w, h = struct.unpack("<HH", mv[5:9])
    raw = zlib.decompress(mv[9:], bufsize=w * h * 3)
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)
    fmt = "png" if mv[:5] == MAGIC_PNG else "jpeg"
    return arr, fmt


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))


def luma32(pixels: np.ndarray) -> np.ndarray:
    """float32 luma = (r+g+b)/3 via an exact uint16 channel add — ~10×
    faster than ``pixels.mean(axis=2)`` (NumPy's innermost-axis-of-3
    pairwise reduction is strided and slow); the only difference from
    the mean is float32 rounding of an EXACT integer sum, ≤ 2e-5."""
    s = pixels[:, :, 0].astype(np.uint16) + pixels[:, :, 1] + pixels[:, :, 2]
    return s.astype(np.float32) * np.float32(1.0 / 3.0)


def phash64(pixels: np.ndarray, luma: np.ndarray | None = None) -> int:
    """Perceptual-hash surrogate: 8×8 block-mean luma thresholded at its
    mean → 64 bits. Identical pixels → identical hash; robust to the
    jpeg quantisation.  Pass a precomputed float32 luma to avoid a
    second full-image pass.  The luma formula is part of the hash
    definition — synth (corpus phash column) and decode (recompute)
    MUST both route through :func:`luma32` or hashes drift."""
    if luma is None:
        luma = luma32(pixels)
    h, w = luma.shape
    if h % 8 == 0 and w % 8 == 0:
        # uniform blocks → one vectorised reshape-mean (identical values
        # to the general path when dimensions divide evenly)
        blocks = luma.reshape(8, h // 8, 8, w // 8).mean(axis=(1, 3))
    else:
        ys = (np.arange(9) * h) // 8
        xs = (np.arange(9) * w) // 8
        blocks = np.empty((8, 8))
        for i in range(8):
            for j in range(8):
                blocks[i, j] = luma[
                    ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)
                ].mean()
    bits = (blocks > blocks.mean()).flatten()
    # LSB-first bit pack — identical value to the former 64-iteration
    # Python loop (bit k of val = bits[k]), vectorised
    val = int.from_bytes(np.packbits(bits, bitorder="little").tobytes(), "little")
    # interpret as signed int64 for Spark LongType
    if val >= 1 << 63:
        val -= 1 << 64
    return val
