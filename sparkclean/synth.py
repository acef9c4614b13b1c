"""Deterministic synthetic image+caption corpus (FIXTURES.md F1).

Generated fully distributed: ``spark.range(n)`` → ``mapInPandas`` where
every random choice is a counter-based integer mix of the row id — so
the table is identical for any partitioning, executor count, or run.
No driver-side data, no external data.

Schema matches BASELINE.json input_hint exactly:
    image_id string, bytes binary, w int, h int, fmt string,
    caption string, phash long

Skew knobs (SURVEY.md §2.12): Zipf-skewed language mix (hot language
~50%), Zipf-sized phash duplicate clusters (~2% of rows collapse onto
n/1000 hot base images).  Corruption mix for the quality labels:
empty/short, repeated n-grams, digit spam, PII injection, toxicity
tokens.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .images import codec
from .text.shared import LANG_MARKERS, LANG_ORDER, TOXICITY_LEXICON

SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
)

# Zipf-ish language mix — en is the hot language
LANG_PROBS = np.array([0.50, 0.15, 0.10, 0.08, 0.06, 0.05, 0.03, 0.03])
_FILLER = [
    "photo", "picture", "view", "close", "up", "portrait", "landscape", "city",
    "street", "mountain", "river", "sky", "sunset", "group", "people", "person",
    "dog", "cat", "car", "building", "tree", "flower", "food", "table", "room",
    "beach", "night", "day", "red", "blue", "green", "old", "new", "small", "large",
]

MIX_C1 = np.uint64(0x9E3779B97F4A7C15)
MIX_C2 = np.uint64(0xBF58476D1CE4E5B9)
MIX_C3 = np.uint64(0x94D049BB133111EB)


def mix64(ids: np.ndarray, tag: int) -> np.ndarray:
    """splitmix64-style counter-based hash of (id, tag) — vectorised;
    uint64 wrap-around is intended."""
    with np.errstate(over="ignore"):
        z = ids.astype(np.uint64) + np.uint64(tag) * MIX_C1
        z = (z ^ (z >> np.uint64(30))) * MIX_C2
        z = (z ^ (z >> np.uint64(27))) * MIX_C3
        return z ^ (z >> np.uint64(31))


def _u(ids: np.ndarray, tag: int) -> np.ndarray:
    """uniform [0,1) derived from mix64."""
    return (mix64(ids, tag) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _gen_captions(ids: np.ndarray) -> tuple[list[str], np.ndarray]:
    """Deterministic captions + language index per id."""
    n = len(ids)
    cum = np.cumsum(LANG_PROBS)
    lang_idx = np.searchsorted(cum, _u(ids, 1), side="right").clip(0, len(LANG_ORDER) - 1)
    n_words = 4 + (mix64(ids, 2) % np.uint64(14)).astype(np.int64)  # 4..17

    corrupt = _u(ids, 3)
    captions: list[str] = []
    for i in range(n):
        rid = int(ids[i])
        lang = LANG_ORDER[lang_idx[i]]
        markers = LANG_MARKERS[lang]
        nw = int(n_words[i])
        widx = mix64(np.arange(nw, dtype=np.uint64) + np.uint64(rid) * np.uint64(131), 4)
        words = [
            markers[int(w % np.uint64(len(markers)))]
            if (w % np.uint64(3)) == 0
            else _FILLER[int((w >> np.uint64(8)) % np.uint64(len(_FILLER)))]
            for w in widx
        ]
        c = corrupt[i]
        if c < 0.02:  # empty / too short
            text = "" if c < 0.01 else words[0]
        elif c < 0.07:  # repeated n-grams
            text = " ".join(words[:3] * 6)
        elif c < 0.10:  # digit spam
            digits = str(int(mix64(np.array([rid], dtype=np.uint64), 5)[0]))
            text = " ".join([digits] * 4 + words[:3])
        elif c < 0.13:  # PII injection
            kind = int(mix64(np.array([rid], dtype=np.uint64), 6)[0] % np.uint64(3))
            pii = [
                f"user{rid % 997}@example.com",
                f"{100 + rid % 900}-{10 + rid % 90}-{1000 + rid % 9000}",
                f"({200 + rid % 800}) {200 + rid % 800}-{1000 + rid % 9000}",
            ][kind]
            text = " ".join(words[:5]) + " " + pii + " " + " ".join(words[5:8])
        elif c < 0.15:  # toxicity token
            tox = TOXICITY_LEXICON[rid % len(TOXICITY_LEXICON)]
            text = " ".join(words[:4]) + " " + tox + " " + " ".join(words[4:8])
        else:
            text = " ".join(words)
        captions.append(text)
    return captions, lang_idx


def _image_seed(ids: np.ndarray, n_total: int) -> np.ndarray:
    """Duplicate-cluster assignment: ~2% of rows share one of n/1000 hot
    base seeds (Zipf-ish cluster sizes via squared uniform)."""
    n_bases = max(n_total // 1000, 1)
    is_dup = _u(ids, 7) < 0.02
    base_pick = (_u(ids, 8) ** 2 * n_bases).astype(np.int64)  # skew to low ids
    return np.where(is_dup, base_pick, ids.astype(np.int64) + n_bases)


def synth_images(
    spark: SparkSession,
    n: int,
    with_images: bool = True,
    partitions: int | None = None,
    base_px: int = 32,
    px_step: int = 16,
) -> DataFrame:
    """Build the synthetic corpus as a distributed DataFrame.

    ``base_px``/``px_step`` control image dimensions
    (base_px .. base_px + 4·px_step); larger sizes make decode CPU
    dominate transport, matching real-corpus proportions.
    """
    parts = partitions or max(spark.sparkContext.defaultParallelism, 8)
    base = spark.range(0, n, 1, parts)
    n_total = n
    gen_images = with_images

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy().astype(np.uint64)
            m = len(ids)
            captions, _ = _gen_captions(ids)
            fmt_jpeg = _u(ids, 10) < 0.30
            seeds = _image_seed(ids, n_total)
            # dimensions derive from the SEED, not the row id: pixels are
            # synth_pixels(seed, w, h), so duplicate-cluster members must
            # share (w, h) to actually share pixels/phash — id-derived
            # sizes silently shrank the advertised ~2% phash clusters
            # ~25x on the with_images path (round-3 review)
            su = seeds.astype(np.uint64)
            ws = base_px + (mix64(su, 9) % np.uint64(5)).astype(np.int64) * px_step
            hs = base_px + (mix64(su, 11) % np.uint64(5)).astype(np.int64) * px_step
            blobs: list[bytes | None] = [None] * m
            phashes = np.zeros(m, dtype=np.int64)
            if gen_images:
                for i in range(m):
                    px = codec.synth_pixels(int(seeds[i]), int(ws[i]), int(hs[i]))
                    blobs[i] = codec.encode(px, "jpeg" if fmt_jpeg[i] else "png")
                    phashes[i] = codec.phash64(px)
            else:
                phashes = seeds  # cluster key still usable without pixels
            yield pd.DataFrame(
                {
                    "image_id": [f"img_{int(i):012d}" for i in ids],
                    "bytes": blobs,
                    "w": ws.astype(np.int32),
                    "h": hs.astype(np.int32),
                    "fmt": np.where(fmt_jpeg, "jpeg", "png"),
                    "caption": captions,
                    "phash": phashes,
                }
            )

    return base.mapInPandas(gen, SCHEMA)
