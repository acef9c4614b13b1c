"""Distributed order-statistics primitives.

Two scale-killers keep reappearing in feature-space managers:

* an exact interpolated median via Spark's ``percentile`` aggregate —
  which materialises the whole value multiset in ONE final aggregation
  buffer (O(distinct) memory through a single reducer; an OOM at
  10^12 unrounded doubles);
* a global ``row_number`` via an unpartitioned ``Window.orderBy`` —
  which serialises the whole table through one task.

Both have shuffle-bounded replacements built from the same two ideas:

* :func:`exact_quantile` — the ``bottom_n_flags`` band trick
  (quality/issues.py): ``approxQuantile`` bounds a ~2·err·N-row band
  around the target rank; only the band is sorted; the exact
  interpolated quantile (same formula as Spark ``percentile`` /
  DuckDB ``quantile_cont``) is read off the two straddling order
  statistics.  Bit-identical to the exact aggregate, O(err·N) memory.
* :func:`global_row_number` — repartitionByRange on the order key, a
  within-partition ``row_number``, and a broadcast prefix-sum of
  per-partition counts (the pattern proven by
  ``valuation.non_iid_ks``'s ECDF).  ``group_cols`` generalises it to
  P independent rankings in one pass (used by the non-IID permutation
  test).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


#: target row count for the single-task band rank — the band window is
#: deliberately unpartitioned (it is tiny), so cap its size regardless
#: of N by shrinking the approxQuantile error with the data
_BAND_TARGET_ROWS = 1_000_000
_ERR_FLOOR = 1e-7  # GK-sketch memory grows ~1/err — keep the driver safe


def _adaptive_err(n: int, err: float | None) -> float:
    """Band half-width as a fraction of n.  With the default (err=None)
    the band is ≤ ~2·_BAND_TARGET_ROWS rows at ANY n: 0.002 for small
    inputs, shrinking as 1e6/n once n passes 5·10^8, floored at 1e-7
    (where the Greenwald-Khanna summary is ~10^7 entries — hundreds of
    MB of driver memory).  Beyond n ≈ 10^13 the floor makes the band
    exceed the target; :func:`_values_at_ranks` then RECURSES on the
    band (two-stage refinement), so there is no hard n ceiling."""
    if err is not None:
        return err
    return max(_ERR_FLOOR, min(0.002, _BAND_TARGET_ROWS / max(n, 1)))


def _rows_at_ranks_selection(
    df: DataFrame,
    order_cols: list[str],
    need: set[int],
    band_target: int,
    depth: int = 0,
) -> dict[int, "object"]:
    """Exact rows at the given 1-indexed global ranks under the total
    order ``order_cols``, with no data-sized single-task sort anywhere.

    Distributed selection: range-partition on the order keys, collect
    ONLY the P per-partition counts (P = shuffle partitions, constant at
    any data scale), locate each needed rank's partition by prefix sum,
    and rank just those partitions with a partition-local window.  A
    target partition still bigger than ``band_target`` recurses — each
    level shrinks the candidate set ~P×, so 2-3 levels cover any n.
    ``order_cols`` must be a total order (unique keys) for the range
    partitioner to make progress under heavy ties; callers append a
    unique id or a synthetic tiebreak column.  Returns {rank: Row}.
    """
    spark = df.sparkSession
    num_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    keys = [F.col(c).asc() for c in order_cols]
    part = (
        df.repartitionByRange(num_parts, *keys)
        .withColumn("_grr_pid", F.spark_partition_id())
        .persist()
    )
    try:
        cnts = sorted(
            (r["_grr_pid"], r["_grr_c"])
            for r in part.groupBy("_grr_pid")
            .agg(F.count(F.lit(1)).alias("_grr_c"))
            .collect()
        )
        total = sum(c for _, c in cnts)
        offsets: dict[int, tuple[int, int]] = {}
        run = 0
        for pid, c in cnts:
            offsets[pid] = (run, c)
            run += c
        groups: dict[int, set[int]] = {}
        for k in need:
            if not 1 <= k <= total:
                raise ValueError(f"rank {k} outside [1, {total}]")
            for pid, (off, c) in offsets.items():
                if off < k <= off + c:
                    groups.setdefault(pid, set()).add(k)
                    break
        w = Window.partitionBy("_grr_pid").orderBy(*keys)
        out: dict[int, object] = {}
        for pid, ks in groups.items():
            off, c = offsets[pid]
            shifted = sorted(int(k - off) for k in ks)
            sub = part.where(F.col("_grr_pid") == pid)
            if c > band_target and depth < 4 and c < total:
                rows = _rows_at_ranks_selection(
                    sub.drop("_grr_pid"),
                    order_cols,
                    set(shifted),
                    band_target,
                    depth + 1,
                )
            else:
                rows = {
                    r["_grr_rnk"]: r
                    for r in sub.withColumn("_grr_rnk", F.row_number().over(w))
                    .where(F.col("_grr_rnk").isin(shifted))
                    .collect()
                }
            for k in ks:
                out[k] = rows[k - off]
        return out
    finally:
        part.unpersist()


def _values_at_ranks(
    vals: DataFrame,
    need: set[int],
    n: int,
    err: float | None,
    band_target: int,
    depth: int = 0,
) -> dict[int, float]:
    """Exact values of ``vals._v`` at the given 1-indexed ascending
    global ranks.  Strategy: approxQuantile band around [min, max] rank,
    then ONE agg job measuring the band's actual size (not the err-based
    estimate — heavy ties at the band edge can inflate the true band
    arbitrarily beyond 2·err·n).  A band within ``band_target`` is
    ranked through a single (tiny) task; anything larger — error-floor
    bands at n ≳ 10^13 as well as tie-block bands — routes to the
    range-partitioned :func:`_rows_at_ranks_selection`, which never
    sorts more than ~max(band/P, band_target) rows in one task.  A
    synthetic tiebreak column keeps the range partitioner splitting
    tie blocks."""
    w = Window.orderBy(F.col("_v").asc())

    def grab(band: DataFrame, ranks: set[int]) -> dict[int, float]:
        rows = (
            band.withColumn("_grr_rn", F.row_number().over(w))
            .where(F.col("_grr_rn").isin(list(ranks)))
            .select("_grr_rn", "_v")
            .collect()
        )
        return {r["_grr_rn"]: r["_v"] for r in rows}

    if n <= band_target:
        return grab(vals, need)

    kmin, kmax = min(need), max(need)
    e = _adaptive_err(n, err)
    lo_q = max(0.0, (kmin - 1) / n - 2 * e)
    hi_q = min(1.0, kmax / n + 2 * e)
    lo, hi = vals.approxQuantile("_v", [lo_q, hi_q], e / 2)
    cnt = vals.agg(
        F.count(F.when(F.col("_v") < lo, 1)).alias("_grr_below"),
        F.count(
            F.when((F.col("_v") >= lo) & (F.col("_v") <= hi), 1)
        ).alias("_grr_band"),
    ).first()
    c_below, c_band = int(cnt["_grr_below"]), int(cnt["_grr_band"])
    band_cond = (F.col("_v") >= F.lit(lo)) & (F.col("_v") <= F.lit(hi))
    if c_below > kmin - 1:
        # heavy ties pushed the lower estimate past the target rank —
        # extend the band to the bottom; its true size is still known
        band_cond = F.col("_v") <= F.lit(hi)
        c_band += c_below
        c_below = 0
    if kmax - c_below > c_band:
        # upper estimate undershot the top rank — extend the band upward
        band_cond = (
            (F.col("_v") >= F.lit(lo)) if c_below else F.col("_v").isNotNull()
        )
        c_band = n - c_below

    shifted = {k - c_below for k in need}
    band = vals.where(band_cond)
    if c_band <= band_target:
        got = grab(band, shifted)
        return {k + c_below: got[k] for k in shifted}
    # measured band exceeds the single-task budget (ties or error floor)
    # — exact distributed selection; the tiebreak column is arbitrary
    # but the VALUE at a rank is tie-order-invariant
    sel = band.withColumn("_grr_tb", F.monotonically_increasing_id())
    rows = _rows_at_ranks_selection(
        sel, ["_v", "_grr_tb"], shifted, band_target, depth
    )
    return {k + c_below: float(rows[k]["_v"]) for k in shifted}


def exact_quantile(
    df: DataFrame, col: str, q: float = 0.5, err: float | None = None
) -> float | None:
    """Exact linear-interpolated quantile of ``col`` without an exact
    ``Percentile`` aggregate anywhere in the plan.

    Matches ``percentile(col, q)`` (Spark) and ``quantile_cont(col, q)``
    (DuckDB) bit-for-bit: with n non-null values sorted ascending and
    pos = (n-1)·q, the result is v[⌊pos⌋] + (pos-⌊pos⌋)·(v[⌈pos⌉]-v[⌊pos⌋]).
    Only approxQuantile bands are ever ranked through a single task
    (~2·err·n rows, recursively refined past the error floor — see
    :func:`_values_at_ranks`); there is no data-sized sort anywhere.
    """
    vals = df.select(F.col(col).cast("double").alias("_v")).where(
        F.col("_v").isNotNull()
    )
    n = vals.count()
    if n == 0:
        return None
    if n == 1:
        return float(vals.first()["_v"])
    pos = (n - 1) * q
    k1 = int(math.floor(pos))
    k2 = int(math.ceil(pos))
    g = pos - k1
    got = _values_at_ranks(vals, {k1 + 1, k2 + 1}, n, err, _BAND_TARGET_ROWS)
    v1 = got[k1 + 1]
    v2 = got[k2 + 1]
    return float(v1) if k1 == k2 else float(v1 + g * (v2 - v1))


def exact_median(df: DataFrame, col: str, err: float | None = None) -> float | None:
    return exact_quantile(df, col, 0.5, err)


def global_prefix_sum(
    df: DataFrame,
    weight_col: str,
    order_cols: list[str],
    out_col: str = "prefix_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """EXCLUSIVE global running sum of ``weight_col`` under the
    ``order_cols`` total order — ``sum(w) OVER (ORDER BY ... ROWS
    UNBOUNDED PRECEDING AND 1 PRECEDING)`` without the unpartitioned
    window that would serialise the table through one task.

    Same shape as :func:`global_row_number`: range-partition on the
    order keys, an in-partition exclusive running sum, and broadcast
    per-partition weight totals prefix-summed across partitions.  The
    weight is accumulated as ``long`` (10^12 rows x 10^6-token docs
    stays within 2^63; doubles would lose exactness past 2^53).
    ``order_cols`` must be a total order (unique keys)."""
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    keys = [F.col(c) for c in order_cols]
    part = (
        df.repartitionByRange(num_partitions, *keys)
        .withColumn("_grr_pid", F.spark_partition_id())
        .persist()  # pin sampled range boundaries for both branches
    )
    w_in = (
        Window.partitionBy("_grr_pid")
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w = F.col(weight_col).cast("long")
    run = part.withColumn(
        "_grr_run", F.coalesce(F.sum(w).over(w_in), F.lit(0).cast("long"))
    )
    ptot = part.groupBy("_grr_pid").agg(F.sum(w).alias("_grr_c"))
    w_p = Window.orderBy(F.col("_grr_pid").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = ptot.select(
        "_grr_pid",
        F.coalesce(F.sum("_grr_c").over(w_p), F.lit(0).cast("long")).alias(
            "_grr_off"
        ),
    )
    return (
        run.join(F.broadcast(offs), "_grr_pid")
        .withColumn(out_col, (F.col("_grr_run") + F.col("_grr_off")).cast("long"))
        .drop("_grr_pid", "_grr_run", "_grr_off")
    )


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rank",
    group_cols: list[str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Total-order ``row_number`` over ``order_cols`` without an
    unpartitioned window: range-partition on (group, order) keys,
    rank within each partition, then add broadcast per-partition
    offsets.  With ``group_cols`` the ranking restarts per group (P
    independent rankings, one shuffle).

    ``num_partitions`` defaults to the session's shuffle-partition
    setting, so partition sizes track the cluster config instead of a
    constant (a fixed 32 would mean 3·10^10 rows per range partition at
    10^12 rows).  ``order_cols`` must be a total order per group
    (tie-break on a unique id) for the result to be deterministic.
    """
    group_cols = group_cols or []
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    keys = [F.col(c) for c in group_cols + order_cols]
    part = (
        df.repartitionByRange(num_partitions, *keys)
        .withColumn("_grr_pid", F.spark_partition_id())
        .persist()  # pin sampled range boundaries for both branches
    )
    w_in = Window.partitionBy("_grr_pid", *group_cols).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    ranked = part.withColumn("_grr_rn", F.row_number().over(w_in))
    ptot = part.groupBy("_grr_pid", *group_cols).agg(F.count(F.lit(1)).alias("_grr_c"))
    w_p = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("_grr_pid").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = ptot.select(
        "_grr_pid",
        *group_cols,
        F.coalesce(F.sum("_grr_c").over(w_p), F.lit(0)).alias("_grr_off"),
    )
    join_keys = ["_grr_pid"] + group_cols
    # long, not int: this helper exists FOR the >2^31-row regime, where
    # an int cast would overflow (ANSI throw / silent wrap)
    return (
        ranked.join(F.broadcast(offs), join_keys)
        .withColumn(out_col, (F.col("_grr_rn") + F.col("_grr_off")).cast("long"))
        .drop("_grr_pid", "_grr_rn", "_grr_off")
    )
