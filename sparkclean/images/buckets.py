"""Aspect-ratio bucketing for multi-aspect image training — Catalyst +
SQL twins.

Diffusion/vision training at scale groups images into a frozen set of
aspect-ratio buckets so each batch shares one resolution (the SDXL
multi-aspect recipe, Podell et al. 2023 §2.3, and the earlier public
NovelAI bucketing write-up): enumerate (w, h) pairs on a 64-pixel grid
under a pixel-area budget, then assign every image to the bucket whose
aspect ratio is nearest its own.

Determinism note (why there is no ``ln`` here): the usual
|log(aspect) − log(bucket)| score is transcendental, and libm results
differ by ulps across engines — enough to flip an argmin between two
near-equidistant buckets and break hash-exact twins.  Instead the
distance |w/h − bw/bh| is computed as ``abs(w·bh − h·bw) / (h·bh)``:
integer cross-multiplication plus ONE IEEE-754 division, which is
correctly rounded and therefore bit-identical in the JVM, DuckDB and
NumPy.  Same argmin for any monotone distance in aspect space; ties
break on the first bucket in the frozen enumeration order.

Scale shape: entirely row-local — the frozen bucket table is a ~40-
element literal array folded per row (constant work, no join, no
shuffle; partitioning inherited from the scan).  At 10^12 images this
is a projection inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: SDXL-style enumeration: 64-px grid, area <= AREA_BUDGET, aspect in
#: [1/MAX_ASPECT, MAX_ASPECT], sides >= MIN_SIDE.  Frozen at import —
#: the ORDER is part of the contract (argmin ties break on index).
GRID = 64
AREA_BUDGET = 1024 * 1024
MAX_ASPECT = 4.0
MIN_SIDE = 256


def _enumerate_buckets() -> list[tuple[int, int]]:
    out = []
    for w in range(MIN_SIDE, AREA_BUDGET // MIN_SIDE + 1, GRID):
        for h in range(MIN_SIDE, AREA_BUDGET // MIN_SIDE + 1, GRID):
            if w * h > AREA_BUDGET:
                continue
            if w > MAX_ASPECT * h or h > MAX_ASPECT * w:
                continue
            # keep only maximal-area buckets per aspect class: growing
            # both sides by one grid step must break the budget
            if (w + GRID) * (h + GRID) <= AREA_BUDGET:
                continue
            out.append((w, h))
    return sorted(out)


BUCKETS: list[tuple[int, int]] = _enumerate_buckets()


def _best_bucket(w: Column, h: Column) -> Column:
    """struct(score, idx, bw, bh) of the nearest bucket — array_min over
    the literal bucket table; struct ordering gives the (score, idx)
    tie-break."""
    entries = [
        F.struct(
            (
                F.abs(w * F.lit(bh) - h * F.lit(bw)).cast("double")
                / (h * F.lit(bh)).cast("double")
            ).alias("score"),
            F.lit(i).alias("idx"),
            F.lit(bw).alias("bw"),
            F.lit(bh).alias("bh"),
        )
        for i, (bw, bh) in enumerate(BUCKETS)
    ]
    return F.array_min(F.array(*entries))


def assign_aspect_buckets(
    df: DataFrame,
    w_col: str = "w",
    h_col: str = "h",
    id_col: str = "image_id",
) -> DataFrame:
    """(id, w, h, bucket_id, bucket_w, bucket_h) per image.  Rows with
    non-positive or null dimensions get bucket_id −1 (null bucket dims)
    so every input row appears in the output."""
    w = F.col(w_col).cast("long")
    h = F.col(h_col).cast("long")
    ok = w.isNotNull() & h.isNotNull() & (w > 0) & (h > 0)
    best = _best_bucket(w, h)
    return df.select(
        id_col,
        w_col,
        h_col,
        F.when(ok, best["idx"].cast("long")).otherwise(F.lit(-1)).alias(
            "bucket_id"
        ),
        F.when(ok, best["bw"].cast("long")).alias("bucket_w"),
        F.when(ok, best["bh"].cast("long")).alias("bucket_h"),
    )


def assign_aspect_buckets_sql(
    table: str,
    w_col: str = "w",
    h_col: str = "h",
    id_col: str = "image_id",
) -> str:
    """DuckDB twin of :func:`assign_aspect_buckets`.  ``table`` may be
    any table expression."""
    rows = ", ".join(f"({i}, {bw}, {bh})" for i, (bw, bh) in enumerate(BUCKETS))
    return f"""
WITH abimg AS MATERIALIZED (
  SELECT {id_col} AS id, {w_col} AS w, {h_col} AS h,
         ({w_col} IS NOT NULL AND {h_col} IS NOT NULL
          AND {w_col} > 0 AND {h_col} > 0) AS ok
  FROM {table}
), abbuckets (idx, bw, bh) AS (VALUES {rows}),
scored AS (
  SELECT i.id, i.w, i.h, b.idx, b.bw, b.bh,
         row_number() OVER (
             PARTITION BY i.id
             ORDER BY abs(i.w::BIGINT * b.bh - i.h::BIGINT * b.bw)::DOUBLE
                      / (i.h::BIGINT * b.bh)::DOUBLE,
                      b.idx
         ) AS rn
  FROM abimg i JOIN abbuckets b ON i.ok
)
SELECT i.id AS {id_col}, i.w AS {w_col}, i.h AS {h_col},
       coalesce(s.idx, -1)::BIGINT AS bucket_id,
       s.bw::BIGINT AS bucket_w, s.bh::BIGINT AS bucket_h
FROM abimg i LEFT JOIN scored s ON s.id = i.id AND s.rn = 1
"""
