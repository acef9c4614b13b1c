"""Multi-annotator consensus — distributed re-expression of
cleanlab/multiannotator.py.

Input is the long format (example_id, annotator_id, label); the wide
(N, M) matrix of the reference maps to a pivot
(`convert_long_to_wide_dataset`, multiannotator.py:1063).

* :func:`majority_vote_label` — mode per example with the reference's
  tie-break chain (multiannotator.py:897-1010): highest pred_prob among
  tied classes → *lowest* empirical class frequency → smallest class id
  (deterministic stand-in for the reference's final random pick).
* :func:`annotator_stats` — per-annotator agreement with consensus
  (the quality proxy of get_label_quality_multiannotator's
  annotator_stats table).
* :func:`consensus_quality` — CROWDLAB-lite per-example score: agreement
  fraction × model self-confidence of the consensus label.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def convert_long_to_wide(long_df: DataFrame) -> DataFrame:
    """(example_id, annotator_id, label) → one row per example with a
    map annotator→label (Spark analog of the reference's wide frame)."""
    return long_df.groupBy("example_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("annotator_id", "label"))
        ).alias("annotator_labels")
    )


def majority_vote_label(
    long_df: DataFrame, probs_df: DataFrame | None = None, probs_col: str = "pred_probs"
) -> DataFrame:
    """Consensus label per example_id.

    One groupBy((example, label)) + one window — no driver-side state
    except nothing at all; class frequencies ride along via a broadcast
    join of the K-row frequency table.

    Tie-break order vs the reference (multiannotator_utils.py:
    votes → model prob → EMPIRICAL class frequency → then the reference
    consults per-annotator quality and finally a seeded random pick):
    this engine substitutes SMALLEST CLASS ID for the last two levels —
    a documented divergence (the annotator-quality level is a circular
    dependency in the streaming shape, and the random level is
    tie-unspecified); every earlier level matches exactly.
    """
    votes = long_df.groupBy("example_id", "label").agg(F.count(F.lit(1)).alias("n_votes"))
    freqs = long_df.groupBy("label").agg(F.count(F.lit(1)).alias("class_freq"))
    cand = votes.join(F.broadcast(freqs), "label", "left")
    if probs_df is not None:
        probs = probs_df.select(
            "example_id", F.col(probs_col).alias("_probs")
        )
        cand = cand.join(probs, "example_id", "left").withColumn(
            "_p_label", F.element_at("_probs", F.col("label").cast("int") + 1)
        )
    else:
        cand = cand.withColumn("_p_label", F.lit(0.0))
    w = Window.partitionBy("example_id").orderBy(
        F.col("n_votes").desc(),
        F.col("_p_label").desc(),
        F.col("class_freq").asc(),
        F.col("label").asc(),
    )
    return (
        cand.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("example_id", F.col("label").alias("consensus_label"), "n_votes")
    )


def annotator_stats(long_df: DataFrame, consensus: DataFrame) -> DataFrame:
    """Per-annotator: #labels given, agreement with consensus."""
    joined = long_df.join(consensus.select("example_id", "consensus_label"), "example_id")
    return (
        joined.groupBy("annotator_id")
        .agg(
            F.count(F.lit(1)).alias("num_labeled"),
            F.avg(
                F.when(F.col("label") == F.col("consensus_label"), 1.0).otherwise(0.0)
            ).alias("agreement"),
        )
        .withColumn("annotator_quality", F.col("agreement"))
    )


def consensus_quality(
    long_df: DataFrame, probs_df: DataFrame, probs_col: str = "pred_probs"
) -> DataFrame:
    """Per-example consensus quality: agreement fraction × model
    self-confidence of the consensus label (CROWDLAB-lite; the full
    CROWDLAB ensemble of multiannotator.py:46-348 refines the same two
    signals)."""
    consensus = majority_vote_label(long_df, probs_df, probs_col)
    totals = long_df.groupBy("example_id").agg(F.count(F.lit(1)).alias("n_annotations"))
    probs = probs_df.select("example_id", F.col(probs_col).alias("_probs"))
    return (
        consensus.join(totals, "example_id")
        .join(probs, "example_id")
        .select(
            "example_id",
            "consensus_label",
            (F.col("n_votes").cast("double") / F.col("n_annotations")).alias("agreement"),
            F.element_at("_probs", F.col("consensus_label").cast("int") + 1).alias(
                "model_confidence"
            ),
        )
        .withColumn(
            "consensus_quality_score", F.col("agreement") * F.col("model_confidence")
        )
    )


# ------------------------------------------------------------------ CROWDLAB
# Full CROWDLAB ensemble (multiannotator.py:1394-1527) re-expressed as
# distributed aggregations: every scalar (consensus likelihood, most-likely-
# class error, model weight) is one small agg collected to the driver;
# per-annotator weights are an M-row collect; the posterior itself is a
# single Catalyst projection with the weights inlined.

_CLIP = 1e-6  # CLIPPING_LOWER_BOUND (internal/constants.py:2)
_SMALL = 1e-30  # SMALL_CONST (internal/multiannotator_utils.py:16)


def _crowdlab_round(
    long_df: DataFrame,
    priors: list[DataFrame],
    cons: DataFrame,
    num_classes: int,
) -> tuple[DataFrame, dict]:
    """One CROWDLAB estimation round for a GIVEN consensus labelling
    (multiannotator.py:1394-1640, single- and multi-model): scalar stats
    (consensus likelihood, most-likely-class error, per-model weight),
    per-annotator co-annotation weights, and the full posterior
    distribution per example.

    ``priors`` is a list of (example_id, _prior ARRAY<DOUBLE>) frames —
    one per ensemble member (P=1 for the single-model path); the
    posterior numerator is ``sum_p mw_p * prior_p[c]`` plus the
    annotator-vote mass (multiannotator.py:1598-1636)."""
    from .scores import predicted_label

    # long_df feeds FIVE consumers in this round (counts, agreement, the
    # pair self-join, the annotator roster, the posterior vote mass) and
    # cons feeds two — pin both narrow frames so each of the round's
    # ~6 driver round-trips reads a cache instead of re-deriving the
    # annotator table / majority-vote window chain.  Cache ownership:
    # the returned posterior reads these lazily, so they stay pinned for
    # the session (same contract as pipeline.caption_scores and
    # sim.knn.knn_edges — batch drivers clearCache() between queries;
    # long-lived callers clear when done).
    long_df = long_df.persist()
    cons = cons.persist()
    # num_annotations and agreement share ONE grouped pass over the
    # (votes ⨝ consensus) frame — one shuffle instead of two per round
    nagree = (
        long_df.join(cons.select("example_id", "consensus_label"), "example_id")
        .groupBy("example_id")
        .agg(
            F.count(F.lit(1)).alias("num_annotations"),
            F.avg((F.col("label") == F.col("consensus_label")).cast("double")).alias(
                "annotator_agreement"
            ),
        )
    )
    base = cons.select("example_id", "consensus_label").join(nagree, "example_id")
    for i, p in enumerate(priors):
        base = base.join(p.withColumnRenamed("_prior", f"_prior_{i}"), "example_id")
    base = base.persist()

    # ONE grouped pass delivers every scalar the round needs — the
    # K-row per-consensus-label stats fold together what used to be
    # three driver round-trips (consensus likelihood + mean annotation
    # count, modal class, most-likely-class / per-model argmax errors):
    # each action at gate scale costs a full recompute of the upstream
    # chain, so round-trip count IS the round's latency
    multi = F.col("num_annotations") != 1
    gag = [
        F.count(F.when(multi, 1)).alias("_nm"),
        F.sum(F.when(multi, F.col("annotator_agreement"))).alias("_sa"),
        F.count(F.lit(1)).alias("_na"),
        F.sum(F.col("num_annotations").cast("double")).alias("_sn"),
    ] + [
        F.count(
            F.when(
                multi
                & (predicted_label(F.col(f"_prior_{i}")) != F.col("consensus_label")),
                1,
            )
        ).alias(f"_err_{i}")
        for i in range(len(priors))
    ]
    # per-annotator agreement with co-annotators: every (a, b) co-annotation
    # pair contributes one Bernoulli(match) sample; the reference's
    # (n-1)-weighted average over examples equals the plain pair average
    # (multiannotator.py:1304-1393)
    l1 = long_df.select(
        "example_id", F.col("annotator_id").alias("_a"), F.col("label").alias("_la")
    )
    l2 = long_df.select(
        "example_id", F.col("annotator_id").alias("_b"), F.col("label").alias("_lb")
    )
    pair_agree = (
        l1.join(l2, "example_id")
        .where(F.col("_a") != F.col("_b"))
        .groupBy("_a")
        .agg(F.avg((F.col("_la") == F.col("_lb")).cast("double")).alias("agree"))
    )
    roster = (
        long_df.select("annotator_id")
        .distinct()
        .join(pair_agree.withColumnRenamed("_a", "annotator_id"), "annotator_id", "left")
    )

    # ONE driver round-trip for BOTH driver-sized tables (K class-stat
    # rows + A annotator rows): union the tagged frames so both subtrees
    # execute inside the same job.  annotator_id keeps its original type
    # (the weight map below is keyed on it).
    aid_type = dict(roster.dtypes)["annotator_id"]
    stat_rows = base.groupBy("consensus_label").agg(*gag).select(
        F.lit(0).alias("_tag"),
        F.col("consensus_label").cast("int").alias("consensus_label"),
        F.col("_nm"), F.col("_sa"), F.col("_na"), F.col("_sn"),
        F.array(*[F.col(f"_err_{i}").cast("long") for i in range(len(priors))]).alias(
            "_errs"
        ),
        F.lit(None).cast(aid_type).alias("annotator_id"),
        F.lit(None).cast("double").alias("agree"),
    )
    roster_rows_df = roster.select(
        F.lit(1).alias("_tag"),
        F.lit(None).cast("int").alias("consensus_label"),
        F.lit(None).cast("long").alias("_nm"),
        F.lit(None).cast("double").alias("_sa"),
        F.lit(None).cast("long").alias("_na"),
        F.lit(None).cast("double").alias("_sn"),
        F.lit(None).cast("array<long>").alias("_errs"),
        F.col("annotator_id"),
        F.col("agree"),
    )
    fused = stat_rows.unionByName(roster_rows_df).collect()
    stats = sorted(
        (r for r in fused if r["_tag"] == 0), key=lambda r: r["consensus_label"]
    )
    roster_rows = [r for r in fused if r["_tag"] == 1]
    n_multi = sum(r["_nm"] for r in stats)
    if n_multi == 0:
        # every example has exactly one annotation — the consensus
        # likelihood is undefined here.  The reference routes fully
        # single-annotated data through a dedicated path
        # (multiannotator.py:646-661: model_weight=1, no temperature
        # scaling) that this engine does not implement; fail loudly with
        # the routing advice instead of a bare TypeError(float(None)).
        raise ValueError(
            "CROWDLAB needs at least one example with multiple "
            "annotations; for fully single-annotated data use "
            "majority_vote_label/consensus_quality (the reference's "
            "single-annotator path is a documented gap)"
        )
    consensus_likelihood = sum(r["_sa"] or 0.0 for r in stats) / n_multi
    non_consensus_likelihood = (1.0 - consensus_likelihood) / (num_classes - 1)
    mean_n = sum(r["_sn"] for r in stats) / sum(r["_na"] for r in stats)
    # modal consensus class on the multi-annotated subset
    # (np.argmax(bincount) tie-break = smallest label; stats is sorted
    # by label so max() resolves ties to the smallest)
    mode_row = max(stats, key=lambda r: r["_nm"])
    mode_label = int(mode_row["consensus_label"])
    n_mode = mode_row["_nm"]
    # (n_multi - n_mode)/n_multi, NOT 1 - n_mode/n_multi: the former is
    # what avg(indicator) evaluates to in both engines (ulp-different)
    mlce = max((n_multi - n_mode) / n_multi, _CLIP)
    model_weights = [
        max(1.0 - (sum(r["_errs"][i] for r in stats) / n_multi) / mlce, _CLIP)
        * (mean_n ** 0.5)
        for i in range(len(priors))
    ]

    # annotators with no co-annotations surface as agree=NULL and take
    # the imputed mean
    agree_by_annot = {
        r["annotator_id"]: float(r["agree"])
        for r in roster_rows
        if r["agree"] is not None
    }
    all_annotators = [r["annotator_id"] for r in roster_rows]
    if agree_by_annot:
        impute = sum(agree_by_annot.values()) / len(agree_by_annot)
    else:
        impute = 1.0
    weights = {
        a: max(1.0 - (1.0 - agree_by_annot.get(a, impute)) / mlce, _CLIP)
        for a in all_annotators
    }

    # posterior projection: W = annotator weight mass on the example,
    # W_c = weight mass voting class c; posterior_c =
    # (sum_p mw_p * prior_p[c] + ncl * W + (cl - ncl) * W_c) / (sum mw + W)
    w_map = F.create_map(
        *[x for a, w in sorted(weights.items()) for x in (F.lit(a), F.lit(float(w)))]
    )
    wl = long_df.withColumn("_w", F.element_at(w_map, F.col("annotator_id")))
    per_class = wl.groupBy("example_id", "label").agg(F.sum("_w").alias("_wc"))
    class_mass = per_class.groupBy("example_id").agg(
        F.sum("_wc").alias("_W"),
        F.map_from_entries(
            F.collect_list(F.struct(F.col("label").cast("int").alias("k"), F.col("_wc").alias("v")))
        ).alias("_wmap"),
    )
    cl, ncl = consensus_likelihood, non_consensus_likelihood
    mw_total = sum(model_weights)
    out = base.join(class_mass, "example_id")

    def _post(p0, i):
        num = p0.cast("double") * F.lit(model_weights[0])
        for m in range(1, len(priors)):
            num = num + F.element_at(F.col(f"_prior_{m}"), i + 1).cast("double") * F.lit(
                model_weights[m]
            )
        num = (
            num
            + F.lit(ncl) * F.col("_W")
            + F.lit(cl - ncl) * F.coalesce(F.element_at(F.col("_wmap"), i), F.lit(0.0))
        )
        return num / (F.lit(mw_total) + F.col("_W"))

    post = F.transform(F.col("_prior_0"), lambda p, i: _post(p, i))
    out = out.withColumn("post_pred_probs", post).withColumn(
        "consensus_quality_score",
        F.element_at(F.col("post_pred_probs"), F.col("consensus_label").cast("int") + 1),
    )
    info = {
        "model_weight": model_weights[0] if len(priors) == 1 else model_weights,
        "model_weights": model_weights,
        "annotator_weights": weights,
        "consensus_likelihood": consensus_likelihood,
        "most_likely_class_error": mlce,
    }
    return (
        out.select(
            "example_id",
            "consensus_label",
            "num_annotations",
            "annotator_agreement",
            "post_pred_probs",
            "consensus_quality_score",
        ),
        info,
    )


def _refine_consensus(round_df: DataFrame, mv: DataFrame) -> DataFrame:
    """Consensus refinement (multiannotator.py:225-236 / :466-473):
    argmax of the round-1 posterior; exact-tie falls back to the
    majority-vote label."""
    mx = F.array_max(F.col("post_pred_probs"))
    n_ties = F.size(F.filter(F.col("post_pred_probs"), lambda x: x == mx))
    argmx = (F.array_position(F.col("post_pred_probs"), mx) - F.lit(1)).cast("int")
    refined = round_df.select(
        "example_id",
        F.when(n_ties == 1, argmx).alias("_ref"),
    )
    return (
        refined.join(
            mv.select("example_id", F.col("consensus_label").alias("_mv")), "example_id"
        )
        .select(
            "example_id",
            F.coalesce(F.col("_ref"), F.col("_mv")).cast("int").alias("consensus_label"),
        )
    )


def crowdlab_posterior(
    long_df: DataFrame,
    probs_df: DataFrame,
    num_classes: int,
    probs_col: str = "pred_probs",
    refine_consensus: bool = True,
) -> tuple[DataFrame, dict]:
    """get_label_quality_multiannotator, quality_method=crowdlab
    (multiannotator.py:46-348): round 1 with the majority-vote consensus,
    then the consensus is refined to the posterior argmax (tie -> MV) and
    every statistic is recomputed in round 2 (multiannotator.py:225-260).

    Returns ``(df, info)``: df has example_id, consensus_label,
    num_annotations, annotator_agreement, post_pred_probs,
    consensus_quality_score; info carries model_weight and the
    per-annotator weights (final round)."""
    probs = probs_df.select("example_id", F.col(probs_col).alias("_prior"))
    mv = majority_vote_label(long_df, probs_df, probs_col)
    r1, info1 = _crowdlab_round(long_df, [probs], mv, num_classes)
    if not refine_consensus:
        return r1, info1
    cons2 = _refine_consensus(r1, mv)
    return _crowdlab_round(long_df, [probs], cons2, num_classes)


def crowdlab_ensemble_posterior(
    long_df: DataFrame,
    probs_dfs: list[DataFrame],
    num_classes: int,
    probs_col: str = "pred_probs",
) -> tuple[DataFrame, dict]:
    """get_label_quality_multiannotator_ensemble (multiannotator.py:351-560):
    per-model temperature scaling, majority vote over the model-averaged
    probs, CROWDLAB round with per-model weights, consensus refinement,
    round 2."""
    temps = find_best_temps(long_df, probs_dfs, num_classes, probs_col)
    scaled = [
        temp_scale_probs(p, t, probs_col).select(
            "example_id", F.col(probs_col).alias("_prior")
        )
        for p, t in zip(probs_dfs, temps)
    ]
    # model-average probs drive the majority-vote tie-break (:441-447)
    avg = scaled[0].select("example_id", F.col("_prior").alias("_p0"))
    for i, s in enumerate(scaled[1:], start=1):
        avg = avg.join(s.select("example_id", F.col("_prior").alias(f"_p{i}")), "example_id")
    n_models = len(scaled)
    avg_expr = F.transform(
        F.col("_p0"),
        lambda x, i: sum(
            [x.cast("double")]
            + [F.element_at(F.col(f"_p{m}"), i + 1).cast("double") for m in range(1, n_models)]
        )
        / F.lit(float(n_models)),
    )
    avg_probs = avg.select("example_id", avg_expr.alias("pred_probs"))
    mv = majority_vote_label(long_df, avg_probs, "pred_probs")
    r1, _ = _crowdlab_round(long_df, scaled, mv, num_classes)
    cons2 = _refine_consensus(r1, mv)
    return _crowdlab_round(long_df, scaled, cons2, num_classes)


def _soft_ce_udf(temps: list[float], num_classes: int):
    """Arrow kernel: per-row soft-cross-entropy vector over ``temps``
    (internal/multiannotator_utils.py:255-305): scaled_c = p_c^(1/t) /
    Σ, CE = -Σ_c emp_c · ln(clip(scaled_c, 1e-30)) / ln K.

    Replaces the per-temp interpreted-HOF projection (pow/log over K
    classes × ~13 temps ≈ a multi-hundred-node tree whose analysis +
    codegen dominated the whole temperature search at gate scale — the
    r3 literal-tree lesson).  The powed-sum fold accumulates ONE CLASS
    at a time for left-assoc parity with the Catalyst fold; the CE sum
    iterates classes with frac 0 contributing exactly 0.0, which equals
    the entry-fold value up to summation order (the entry order itself
    is a nondeterministic collect_list)."""
    import math

    lnK = math.log(num_classes)
    inv_ts = [1.0 / t for t in temps]

    @pandas_udf("array<double>")
    def fn(p: pd.Series, ek: pd.Series, ef: pd.Series) -> pd.Series:
        n = len(p)
        # NULL tolerance of the Catalyst projection this kernel replaced:
        # a NULL pred_probs / empirical row yields a NULL CE vector (the
        # downstream F.avg skips it) instead of crashing the executor
        res: list[list[float] | None] = [None] * n
        valid = [
            i
            for i in range(n)
            if p.iloc[i] is not None and ek.iloc[i] is not None and ef.iloc[i] is not None
        ]
        if not valid:
            return pd.Series(res)
        P = np.asarray([np.asarray(p.iloc[i], dtype=np.float64) for i in valid])
        nv = len(valid)
        K = P.shape[1]
        Fm = np.zeros((nv, K))
        for r, i in enumerate(valid):
            Fm[r, np.asarray(ek.iloc[i], dtype=np.int64)] = np.asarray(
                ef.iloc[i], dtype=np.float64
            )
        out = np.empty((nv, len(inv_ts)))
        for j, it in enumerate(inv_ts):
            pw = P**it
            s = pw[:, 0].copy()
            for c in range(1, K):
                s = s + pw[:, c]
            lo = np.log(np.maximum(pw / s[:, None], _SMALL))
            acc = np.zeros(nv)
            for c in range(K):
                acc = acc + Fm[:, c] * lo[:, c]
            out[:, j] = -acc / lnK
        for r, i in enumerate(valid):
            res[i] = out[r]
        return pd.Series(res)

    return fn


def find_best_temps(
    long_df: DataFrame,
    probs_dfs: list[DataFrame],
    num_classes: int,
    probs_col: str = "pred_probs",
    coarse_search_range=(0.1, 0.2, 0.5, 0.8, 1, 2, 3, 5, 8),
    fine_search_size: int = 4,
) -> list[float]:
    """Temperatures minimising mean soft cross-entropy between the
    annotators' empirical label distribution and each model's scaled
    pred_probs (internal/multiannotator_utils.py:277-337).

    ALL models share one coarse pass and one fine pass — the empirical
    distribution depends only on ``long_df``, so the P searches ride the
    same joined frame with one CE-vector column per model (two
    distributed aggregations total instead of 2·P; at scale that is one
    data pass per phase instead of P)."""
    emp = (
        long_df.groupBy("example_id", "label")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy("example_id")
        .agg(
            F.collect_list(
                F.struct(F.col("label").cast("int").alias("k"), F.col("_c").alias("c"))
            ).alias("_raw"),
            F.sum("_c").alias("_n"),
        )
        .select(
            "example_id",
            F.transform(F.col("_raw"), lambda e: e["k"]).alias("_ek"),
            F.transform(
                F.col("_raw"), lambda e: e["c"].cast("double") / F.col("_n")
            ).alias("_ef"),
        )
    )
    joined = emp
    for m, p in enumerate(probs_dfs):
        joined = joined.join(
            p.select("example_id", F.col(probs_col).alias(f"_p{m}")), "example_id"
        )
    joined = joined.persist()
    P = len(probs_dfs)

    def _mean_ces(temps_per_model: list[list[float]]) -> list[list[float]]:
        """One action: the CE means for every (model, temperature)."""
        ced = joined
        aggs = []
        for m, temps in enumerate(temps_per_model):
            if not temps:
                continue
            ces = _soft_ce_udf(temps, num_classes)(
                F.col(f"_p{m}"), F.col("_ek"), F.col("_ef")
            )
            ced = ced.withColumn(f"_ces{m}", ces)
            aggs += [
                F.avg(F.element_at(F.col(f"_ces{m}"), i + 1)).alias(f"m{m}t{i}")
                for i in range(len(temps))
            ]
        row = ced.agg(*aggs).first()
        return [
            [float(row[f"m{m}t{i}"]) for i in range(len(temps))]
            for m, temps in enumerate(temps_per_model)
        ]

    coarse = list(coarse_search_range)
    all_ces = _mean_ces([coarse] * P)
    fines: list[list[float]] = []
    for ces in all_ces:
        idx = min(range(len(coarse)), key=lambda i: (ces[i], i))
        fine: list[float] = []
        if idx != 0:
            lo, hi = coarse[idx - 1], coarse[idx]
            fine += [lo + j * (hi - lo) / fine_search_size for j in range(fine_search_size)]
        if idx != len(coarse) - 1:
            lo, hi = coarse[idx], coarse[idx + 1]
            fine += [lo + j * (hi - lo) / fine_search_size for j in range(fine_search_size + 1)]
        fines.append(fine)
    all_fces = _mean_ces(fines)
    joined.unpersist()
    out = []
    for fine, fces in zip(fines, all_fces):
        best = min(range(len(fine)), key=lambda i: (fces[i], i))
        out.append(float(fine[best]))
    return out


def find_best_temp(
    long_df: DataFrame,
    probs_df: DataFrame,
    num_classes: int,
    probs_col: str = "pred_probs",
    coarse_search_range=(0.1, 0.2, 0.5, 0.8, 1, 2, 3, 5, 8),
    fine_search_size: int = 4,
) -> float:
    """Single-model :func:`find_best_temps`."""
    return find_best_temps(
        long_df, [probs_df], num_classes, probs_col, coarse_search_range, fine_search_size
    )[0]


def temp_scale_probs(
    probs_df: DataFrame, temp: float, probs_col: str = "pred_probs"
) -> DataFrame:
    """Apply temperature scaling (multiannotator_utils.py:337-352):
    clip at 1e-30, renormalise, raise to 1/t, renormalise."""
    clipped = F.transform(F.col(probs_col), lambda x: F.greatest(x.cast("double"), F.lit(_SMALL)))
    df = probs_df.withColumn("_pc", clipped)
    s1 = F.aggregate(F.col("_pc"), F.lit(0.0), lambda a, x: a + x)
    df = df.withColumn("_s1", s1).withColumn(
        "_pt", F.transform(F.col("_pc"), lambda x: F.pow(x / F.col("_s1"), F.lit(1.0 / temp)))
    )
    s2 = F.aggregate(F.col("_pt"), F.lit(0.0), lambda a, x: a + x)
    df = df.withColumn("_s2", s2).withColumn(
        probs_col, F.transform(F.col("_pt"), lambda x: x / F.col("_s2"))
    )
    return df.drop("_pc", "_s1", "_pt", "_s2")


def _activelab_blend(
    long_df: DataFrame,
    posterior_df: DataFrame,
    weights: dict,
    model_weight_mass: float,
    num_classes: int,
) -> DataFrame:
    """The shared ActiveLab blend (multiannotator.py:646-694 / 827-870):
    consensus quality weighted by (annotation weight + model-weight
    mass), mixed with the 1/K prior at the average annotator weight.
    ``model_weight_mass`` is the single model weight for the one-model
    path and the SUM of weights for the ensemble path — the ONLY
    difference between the two callers."""
    avg_w = sum(weights.values()) / len(weights)
    w_map = F.create_map(
        *[x for a, w in sorted(weights.items()) for x in (F.lit(a), F.lit(float(w)))]
    )
    ann_w = (
        long_df.withColumn("_w", F.element_at(w_map, F.col("annotator_id")))
        .groupBy("example_id")
        .agg(F.sum("_w").alias("_W"))
    )
    out = posterior_df.join(ann_w, "example_id")
    labeled_w = F.col("_W") + F.lit(model_weight_mass)
    score = (
        F.col("consensus_quality_score") * labeled_w + F.lit((1.0 / num_classes) * avg_w)
    ) / (labeled_w + F.lit(avg_w))
    return out.select("example_id", score.alias("active_learning_score"))


def active_learning_scores(
    long_df: DataFrame,
    probs_df: DataFrame,
    num_classes: int,
    probs_col: str = "pred_probs",
) -> DataFrame:
    """ActiveLab scores for labeled examples (multiannotator.py:564-694):
    temp-scale pred_probs, run CROWDLAB, then blend the consensus quality
    with the 1/K prior using (annotation weight + model weight) vs the
    average annotator weight."""
    temp = find_best_temp(long_df, probs_df, num_classes, probs_col)
    scaled = temp_scale_probs(probs_df, temp, probs_col)
    df, info = crowdlab_posterior(long_df, scaled, num_classes, probs_col)
    return _activelab_blend(long_df, df, info["annotator_weights"],
                            float(info["model_weight"]), num_classes)


def active_learning_scores_ensemble(
    long_df: DataFrame,
    probs_dfs: list[DataFrame],
    num_classes: int,
    probs_col: str = "pred_probs",
) -> DataFrame:
    """ActiveLab for model ensembles (multiannotator.py:729-870): ensemble
    CROWDLAB, then blend the consensus quality with the 1/K prior using
    (annotation weight + SUM of model weights) vs the average annotator
    weight."""
    df, info = crowdlab_ensemble_posterior(long_df, probs_dfs, num_classes, probs_col)
    return _activelab_blend(long_df, df, info["annotator_weights"],
                            float(sum(info["model_weights"])), num_classes)
