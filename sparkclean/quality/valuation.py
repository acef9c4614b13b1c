"""Data valuation (KNN-Shapley) and non-IID detection — distributed.

* :func:`knn_shapley_scores` — data_valuation.py:14-127 semantics.  The
  reference's O(N²) scores matrix hides a telescoping recursion:
  with m_j = 1[y(neighbor_j) == y(α)] and s[idx_{k-1}] = 0,

      s_α[idx_j] = m_j - m_{k-1}

  so each example α contributes (m_j - m_{k-1}) to its j-th neighbor
  and the final value of point i is 0.5·(Σ_α s_α[i]/(N·k) + 1).
  That's a KNN edge list + one groupBy — no N×N anything.

* :func:`non_iid_ks` — simplified Kolmogorov-Smirnov two-sample test
  with a permutation p-value (noniid.py:19-57 + 267-299 analog): split
  the dataset into two halves by median id, D = max |ECDF_a - ECDF_b|
  over the distinct-value step points, then rerun D under 25 frozen
  hash-based permutations (all P+1 statistics from ONE grouped
  prefix-sum ECDF pass) and report the Gaussian-KDE tail p-value
  (:func:`kde_tail_p`, the reference's integrate_box semantics); issue
  flag at p < 0.05, matching the reference's decision rule.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sim.knn import knn_edges, knn_edges_cte_sql

# non-IID permutation-test defaults (reference noniid.py:108-122) — the
# DuckDB oracle in __spark_entry__.py imports THESE so the two engines
# cannot silently drift apart
NIID_PERMUTATIONS = 25
NIID_SEED = 0
NIID_SIGNIFICANCE = 0.05

# Abramowitz & Stegun 7.1.26 rational erf approximation, |err| <= 1.5e-7.
# Used INSTEAD of libm erf on BOTH engines: DuckDB has no erf built-in,
# and a same-formula/same-op-order evaluation keeps the two p-values
# ulp-identical where exact-vs-approximate would differ by ~1e-7 — enough
# to flip a 6dp-rounded gate value.
_ERF_P = 0.3275911
_ERF_A1 = 0.254829592
_ERF_A2 = -0.284496736
_ERF_A3 = 1.421413741
_ERF_A4 = -1.453152027
_ERF_A5 = 1.061405429


def erf_approx(x: float) -> float:
    """A&S 7.1.26 erf; the exact float-op-order twin of :func:`erf_sql`."""
    t = 1.0 / (1.0 + _ERF_P * abs(x))
    poly = ((((_ERF_A5 * t + _ERF_A4) * t + _ERF_A3) * t + _ERF_A2) * t + _ERF_A1) * t
    s = -1.0 if x < 0 else 1.0
    return s * (1.0 - poly * math.exp(-(x * x)))


def erf_sql(z: str) -> str:
    """DuckDB expression mirroring :func:`erf_approx` term by term."""
    t = f"(1.0 / (1.0 + {_ERF_P} * abs({z})))"
    poly = (
        f"((((({_ERF_A5} * {t} + {_ERF_A4}) * {t} + {_ERF_A3}) * {t} "
        f"+ {_ERF_A2}) * {t} + {_ERF_A1}) * {t})"
    )
    return (
        f"((CASE WHEN ({z}) < 0 THEN -1.0 ELSE 1.0 END) "
        f"* (1.0 - {poly} * exp(-(({z}) * ({z})))))"
    )


def kde_tail_p(d_obs: float, stats: list[float]) -> float:
    """Gaussian-KDE tail mass above ``d_obs`` — scipy semantics
    (reference noniid.py:292-299: ``gaussian_kde(ks_stats)
    .integrate_box(obs, 100)``): Scott bandwidth h = std(stats, ddof=1)
    * P^(-1/5), p = mean_i [Φ((100-x_i)/h) - Φ((d-x_i)/h)] with Φ via
    :func:`erf_approx`.  Degenerate (zero-bandwidth) permutation
    distributions fall back to the empirical tail — scipy would raise
    on the singular covariance."""
    n = len(stats)
    if n < 2 or min(stats) == max(stats):
        # exact-tie degeneracy (var may still round to a subnormal — the
        # SQL twin tests max(d) = min(d) for the same reason)
        return (1.0 + sum(1 for s in stats if s >= d_obs)) / (1.0 + n)
    mean = sum(stats) / n
    var = sum((x - mean) ** 2 for x in stats) / (n - 1)
    h = math.sqrt(var) * n ** (-0.2)
    rt2h = h * math.sqrt(2.0)
    return (
        sum(
            0.5 * (erf_approx((100.0 - x) / rt2h) - erf_approx((d_obs - x) / rt2h))
            for x in stats
        )
        / n
    )


def kde_pvalue_cte_sql(num_permutations: int) -> str:
    """DuckDB CTE block computing :func:`kde_tail_p` over the oracle's
    ``dstat(perm, d)`` / ``dobs(d)`` CTEs; yields ``pv(p_value)``.  The
    zero-bandwidth CASE arm goes NULL so coalesce lands on the same
    empirical tail as the Python fallback."""
    hi = erf_sql("(100.0 - x) / (h * sqrt(2.0))")
    lo = erf_sql("(dob - x) / (h * sqrt(2.0))")
    return f"""
bw AS (SELECT CASE WHEN max(d) = min(d) THEN 0.0
              ELSE sqrt(var_samp(d)) * pow({num_permutations}.0, -0.2) END AS h
       FROM dstat WHERE perm >= 0),
kterms AS (
  SELECT s.d AS x, o.d AS dob, b.h AS h
  FROM dstat s CROSS JOIN dobs o CROSS JOIN bw b WHERE s.perm >= 0),
pkde AS (
  SELECT avg(CASE WHEN h > 0 THEN 0.5 * ({hi} - {lo}) ELSE NULL END) AS p
  FROM kterms),
pemp AS (
  SELECT (1.0 + count(*) FILTER (WHERE s.perm >= 0 AND s.d >= o.d))
         / (1.0 + {num_permutations}) AS p
  FROM dstat s CROSS JOIN dobs o),
pv AS (SELECT coalesce(pkde.p, pemp.p) AS p_value FROM pkde CROSS JOIN pemp)"""


def knn_shapley_scores(
    df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, data_valuation_score) — higher = more valuable example.

    The KNN edge list comes from the shared bucketed builder
    :func:`sparkclean.sim.knn.knn_edges` (banded LSH equi-join — no
    cartesian self-join); labels ride in via two id-keyed joins against
    the (id, label) projection."""
    total = df.count()
    labels = df.select(F.col(id_col).alias("_lid"), F.col(label_col).alias("_ly"))
    edges = (
        knn_edges(df, k=k, id_col=id_col, vec_col=vec_col, metric="cosine")
        .join(labels.select(F.col("_lid").alias("qid"), F.col("_ly").alias("_qy")), "qid")
        .join(labels.select(F.col("_lid").alias("nid"), F.col("_ly").alias("_ny")), "nid")
        .select(
            F.col("qid").alias("_qid"),
            F.col("nid").alias("_nid"),
            F.col("rk").alias("_rk"),
            (F.col("_ny") == F.col("_qy")).cast("double").alias("_m"),
        )
    )
    # "last" neighbor = the max-rank edge per query (== rk k normally;
    # degrades to the per-qid edge count when the table has <= k rows,
    # instead of silently dropping every contribution).  The window is
    # k-bounded per qid — never a global sort.
    w_q = Window.partitionBy("_qid")
    last = (
        edges.withColumn("_mrk", F.max("_rk").over(w_q))
        .where(F.col("_rk") == F.col("_mrk"))
        .select(F.col("_qid"), F.col("_m").alias("_m_last"))
    )
    contrib = edges.join(last, "_qid").withColumn("_c", F.col("_m") - F.col("_m_last"))
    sums = contrib.groupBy(F.col("_nid").alias(id_col)).agg(F.sum("_c").alias("_s"))
    return (
        df.select(id_col)
        .join(sums, id_col, "left")
        .fillna({"_s": 0.0})
        .select(
            id_col,
            (F.lit(0.5) * (F.col("_s") / F.lit(float(total * k)) + F.lit(1.0))).alias(
                "data_valuation_score"
            ),
        )
    )


def knn_shapley_sql(table: str, k: int = 10, dim: int = 64) -> str:
    """DuckDB twin of :func:`knn_shapley_scores` (embeddings schema).
    ``dim`` must match the embedding width (Spark infers it)."""
    edges_cte = knn_edges_cte_sql(table, k=k, metric="cosine", dim=dim)
    return f"""
WITH {edges_cte.lstrip()},
tot AS (SELECT count(*)::DOUBLE AS n FROM {table}),
kept AS (
  SELECT e.qid, e.nid, e.rk,
         CASE WHEN ny.label = qy.label THEN 1.0 ELSE 0.0 END AS m
  FROM knn e
  JOIN {table} qy ON qy.vec_id = e.qid
  JOIN {table} ny ON ny.vec_id = e.nid
),
-- max-rank edge per qid (= rk {k} normally; degrades to the per-qid edge
-- count on tiny tables instead of dropping all contributions)
last AS (
  SELECT qid, m AS m_last FROM kept
  QUALIFY rk = max(rk) OVER (PARTITION BY qid)
),
contrib AS (
  SELECT kept.nid, kept.m - last.m_last AS c FROM kept JOIN last USING (qid)
), sums AS (SELECT nid, sum(c) AS s FROM contrib GROUP BY 1)
SELECT e.vec_id, round(0.5 * (coalesce(sums.s, 0.0) / (tot.n * {k}) + 1.0), 6) AS data_valuation_score
FROM {table} e LEFT JOIN sums ON sums.nid = e.vec_id CROSS JOIN tot"""


def non_iid_ks(
    df: DataFrame,
    id_col: str,
    value_col: str,
    ecdf_partitions: int | None = None,
    num_permutations: int = NIID_PERMUTATIONS,
    seed: int = NIID_SEED,
    significance: float = NIID_SIGNIFICANCE,
) -> DataFrame:
    """One-row result: (ks_statistic, p_value, n_a, n_b, is_non_iid_issue).

    Observed statistic: split the dataset into two halves at the median
    id and take the two-sample KS distance of ``value_col`` — evaluated
    at the ECDF's step points (the DISTINCT values), which is both the
    textbook definition and tie-robust.

    p-value (reference noniid.py:267-299): the reference reruns its
    statistic under ``num_permutations`` seeded index permutations and
    reads the observed stat's tail mass off a Gaussian KDE of the
    permuted stats (``gaussian_kde(ks).integrate_box(obs, 100)``).
    Here each permutation is a frozen hash-based one — rows are
    re-ranked by md5(id:perm:seed) and the first n_a ranks form group A,
    which is exactly a uniformly-drawn size-preserving relabelling —
    and the p-value is the same Scott-bandwidth KDE tail
    (:func:`kde_tail_p`, erf via the A&S formula shared with the DuckDB
    twin; remaining divergence vs the reference is only the frozen
    hash permutations themselves and the 1.5e-7 erf approximation).
    Issue flag: p_value < significance, matching the reference's
    decision rule (noniid.py:199).

    Everything is one grouped ECDF pass: the observed split rides along
    as perm = -1, so P+1 KS statistics come out of ONE prefix-sum over
    (perm, value) — repartitionByRange + within-partition window +
    broadcast per-(perm, partition) offsets.  No exact ``percentile``
    aggregate (median via the approxQuantile band trick) and no
    single-partition global window anywhere; the permutation ranks use
    the same grouped range-partitioned pattern
    (:func:`sparkclean.stats.global_row_number`).
    """
    from ..stats import exact_median, global_row_number

    if ecdf_partitions is None:
        # track the session's shuffle sizing instead of a constant — at
        # 10^12 rows a fixed 32 would put ~3·10^10 rows per range partition
        ecdf_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    median_id = exact_median(df, id_col)
    base = df.select(
        F.col(value_col).alias("_v"),
        F.col(id_col).alias("_id"),
        (F.col(id_col) <= F.lit(median_id)).cast("int").alias("_a0"),
    )
    counts = base.agg(
        F.sum("_a0").alias("na"), F.sum(F.lit(1) - F.col("_a0")).alias("nb")
    ).collect()[0]
    n_a, n_b = int(counts["na"]), int(counts["nb"])

    obs = base.select(F.lit(-1).alias("_perm"), "_v", F.col("_a0").alias("_a"))
    tagged = obs
    if num_permutations > 0:
        from ..text.shared import hash60_col

        pm = base.select(
            "_v",
            "_id",
            F.explode(
                F.array(*[F.lit(i) for i in range(num_permutations)])
            ).alias("_perm"),
        ).withColumn(
            "_h",
            hash60_col(
                F.concat_ws(
                    ":",
                    F.col("_id").cast("string"),
                    F.col("_perm").cast("string"),
                    F.lit(str(seed)),
                )
            ),
        )
        ranked = global_row_number(
            pm,
            ["_h", "_id"],
            out_col="_rn",
            group_cols=["_perm"],
            num_partitions=ecdf_partitions,
        )
        permed = ranked.select(
            "_perm", "_v", (F.col("_rn") <= F.lit(n_a)).cast("int").alias("_a")
        )
        tagged = obs.unionByName(permed)

    g = (
        tagged.groupBy("_perm", "_v")
        .agg(
            F.sum("_a").alias("_ga"),
            F.sum(F.lit(1) - F.col("_a")).alias("_gb"),
        )
        .repartitionByRange(ecdf_partitions, F.col("_perm"), F.col("_v"))
        .withColumn("_pid", F.spark_partition_id())
        .persist()  # pin the sampled range boundaries for both branches
    )
    w_in = Window.partitionBy("_pid", "_perm").orderBy(F.col("_v").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = g.withColumn("_ca", F.sum("_ga").over(w_in)).withColumn(
        "_cb", F.sum("_gb").over(w_in)
    )
    ptot = g.groupBy("_pid", "_perm").agg(
        F.sum("_ga").alias("_ta"), F.sum("_gb").alias("_tb")
    )
    w_p = (
        Window.partitionBy("_perm")
        .orderBy(F.col("_pid").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = ptot.select(
        "_pid",
        "_perm",
        F.coalesce(F.sum("_ta").over(w_p), F.lit(0)).alias("_oa"),
        F.coalesce(F.sum("_tb").over(w_p), F.lit(0)).alias("_ob"),
    )
    drows = (
        cum.join(F.broadcast(offs), ["_pid", "_perm"])
        .groupBy("_perm")
        .agg(
            F.max(
                F.abs(
                    (F.col("_ca") + F.col("_oa")).cast("double") / F.lit(float(n_a))
                    - (F.col("_cb") + F.col("_ob")).cast("double") / F.lit(float(n_b))
                )
            ).alias("_d")
        )
        .collect()
    )
    g.unpersist()
    dmap = {r["_perm"]: float(r["_d"]) for r in drows}
    d = dmap[-1]
    if num_permutations:
        # perm-index order keeps the mixture sums deterministic
        p_value = kde_tail_p(d, [dmap[p] for p in range(num_permutations)])
    else:
        p_value = 0.0
    flag = (
        p_value < significance
        if num_permutations
        else d > 1.36 * math.sqrt((n_a + n_b) / (n_a * n_b))
    )
    spark = df.sparkSession
    return spark.createDataFrame(
        [(float(round(d, 6)), float(round(p_value, 6)), n_a, n_b, bool(flag))],
        "ks_statistic: double, p_value: double, n_a: long, n_b: long, "
        "is_non_iid_issue: boolean",
    )
