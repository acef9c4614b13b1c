"""CROWDLAB / ActiveLab parity vs an independent NumPy re-derivation.

The NumPy oracle below re-implements the published CROWDLAB formulas
(multiannotator.py:1394-1527, :564-694) directly from the paper/maths —
it shares no code with the Spark implementation, so agreement between the
two is a real check.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkclean.quality.multiannotator import (
    active_learning_scores,
    crowdlab_posterior,
    find_best_temp,
    temp_scale_probs,
)

K = 4
CLIP = 1e-6


def _fixture(n=120, seed=7):
    rng = np.random.RandomState(seed)
    true = rng.randint(0, K, size=n)
    probs = rng.dirichlet(np.ones(K), size=n)
    # sharpen towards the true label so the fixture is non-degenerate
    probs[np.arange(n), true] += 1.5
    probs /= probs.sum(axis=1, keepdims=True)
    # 3 annotators: a1 everywhere (noisy true), a2 on even ids, a3 on ids%3!=0
    lab = np.full((n, 3), np.nan)
    lab[:, 0] = np.where(rng.rand(n) < 0.8, true, rng.randint(0, K, size=n))
    mask2 = np.arange(n) % 2 == 0
    lab[mask2, 1] = np.where(rng.rand(mask2.sum()) < 0.7, true[mask2], rng.randint(0, K, size=mask2.sum()))
    mask3 = np.arange(n) % 3 != 0
    lab[mask3, 2] = np.where(rng.rand(mask3.sum()) < 0.6, true[mask3], rng.randint(0, K, size=mask3.sum()))
    return lab, probs


def _np_majority(lab, probs):
    n = lab.shape[0]
    cons = np.zeros(n, dtype=int)
    freqs = np.zeros(K)
    for c in range(K):
        freqs[c] = np.nansum(lab == c)
    for i in range(n):
        row = lab[i][~np.isnan(lab[i])].astype(int)
        counts = np.bincount(row, minlength=K)
        best = counts.max()
        tied = [c for c in range(K) if counts[c] == best]
        # tie-break: highest pred_prob, then lowest class frequency, then id
        tied.sort(key=lambda c: (-probs[i, c], freqs[c], c))
        cons[i] = tied[0]
    return cons


def _np_round(lab, probs, cons):
    n, m = lab.shape
    nann = (~np.isnan(lab)).sum(axis=1)
    agree = (lab == cons[:, None]).sum(axis=1) / nann
    multi = nann != 1
    cl = agree[multi].mean()
    ncl = (1 - cl) / (K - 1)
    mode = np.argmax(np.bincount(cons[multi], minlength=K))
    mlce = max((cons[multi] != mode).mean(), CLIP)
    # per-annotator agreement with co-annotators = plain pair average
    w = np.zeros(m)
    for j in range(m):
        matches, pairs = 0, 0
        for i in range(n):
            if np.isnan(lab[i, j]) or nann[i] < 2:
                continue
            for o in range(m):
                if o == j or np.isnan(lab[i, o]):
                    continue
                pairs += 1
                matches += lab[i, j] == lab[i, o]
        w[j] = max(1 - (1 - matches / pairs) / mlce, CLIP)
    me = (np.argmax(probs[multi], axis=1) != cons[multi]).mean()
    mw = max(1 - me / mlce, CLIP) * math.sqrt(nann.mean())
    post = np.zeros_like(probs)
    for i in range(n):
        W = sum(w[j] for j in range(m) if not np.isnan(lab[i, j]))
        for c in range(K):
            wc = sum(w[j] for j in range(m) if lab[i, j] == c)
            post[i, c] = (probs[i, c] * mw + ncl * W + (cl - ncl) * wc) / (mw + W)
    q = post[np.arange(n), cons]
    return cons, nann, agree, post, q, w, mw


def _np_crowdlab(lab, probs):
    """Two-round reference flow (multiannotator.py:46-348): MV consensus,
    posterior, refined consensus (argmax, tie -> MV), recompute."""
    mv = _np_majority(lab, probs)
    _, _, _, post1, _, _, _ = _np_round(lab, probs, mv)
    refined = np.array(
        [
            int(np.where(post1[i] == post1[i].max())[0][0])
            if (post1[i] == post1[i].max()).sum() == 1
            else mv[i]
            for i in range(lab.shape[0])
        ]
    )
    return _np_round(lab, probs, refined)


def _long_df(spark, lab):
    rows = []
    for i in range(lab.shape[0]):
        for j in range(lab.shape[1]):
            if not np.isnan(lab[i, j]):
                rows.append((i, f"a{j + 1}", int(lab[i, j])))
    return spark.createDataFrame(rows, "example_id: long, annotator_id: string, label: int")


def _probs_df(spark, probs):
    rows = [(i, [float(x) for x in p]) for i, p in enumerate(probs)]
    return spark.createDataFrame(rows, "example_id: long, pred_probs: array<double>")


@pytest.fixture(scope="module")
def fixture_dfs(spark):
    lab, probs = _fixture()
    return lab, probs, _long_df(spark, lab), _probs_df(spark, probs)


def test_crowdlab_posterior_matches_numpy(spark, fixture_dfs):
    lab, probs, long_df, probs_df = fixture_dfs
    df, info = crowdlab_posterior(long_df, probs_df, K)
    cons, nann, agree, post, q, w, mw = _np_crowdlab(lab, probs)
    got = {r["example_id"]: r for r in df.collect()}
    assert len(got) == lab.shape[0]
    for i in range(lab.shape[0]):
        r = got[i]
        assert r["consensus_label"] == cons[i], i
        assert r["num_annotations"] == nann[i]
        assert abs(r["annotator_agreement"] - agree[i]) < 1e-9
        assert np.allclose(r["post_pred_probs"], post[i], atol=1e-9)
        assert abs(r["consensus_quality_score"] - q[i]) < 1e-9
    assert abs(info["model_weight"] - mw) < 1e-9
    for j in range(3):
        assert abs(info["annotator_weights"][f"a{j + 1}"] - w[j]) < 1e-9


def test_posterior_rows_sum_to_one(spark, fixture_dfs):
    _, _, long_df, probs_df = fixture_dfs
    df, _ = crowdlab_posterior(long_df, probs_df, K)
    sums = df.select(
        F.aggregate("post_pred_probs", F.lit(0.0), lambda a, x: a + x).alias("s")
    ).collect()
    assert all(abs(r["s"] - 1.0) < 1e-9 for r in sums)


def test_find_best_temp_matches_numpy(spark, fixture_dfs):
    lab, probs, long_df, probs_df = fixture_dfs

    def np_soft_ce(t):
        scaled = probs ** (1.0 / t)
        scaled /= scaled.sum(axis=1, keepdims=True)
        ces = []
        for i in range(lab.shape[0]):
            row = lab[i][~np.isnan(lab[i])].astype(int)
            emp = np.bincount(row, minlength=K) / len(row)
            ces.append(-(emp * np.log(np.clip(scaled[i], 1e-30, None))).sum() / np.log(K))
        return float(np.mean(ces))

    coarse = [0.1, 0.2, 0.5, 0.8, 1, 2, 3, 5, 8]
    ces = [np_soft_ce(t) for t in coarse]
    idx = int(np.argmin(ces))
    fine = []
    if idx != 0:
        lo, hi = coarse[idx - 1], coarse[idx]
        fine += [lo + j * (hi - lo) / 4 for j in range(4)]
    if idx != len(coarse) - 1:
        lo, hi = coarse[idx], coarse[idx + 1]
        fine += [lo + j * (hi - lo) / 4 for j in range(5)]
    expected = fine[int(np.argmin([np_soft_ce(t) for t in fine]))]

    got = find_best_temp(long_df, probs_df, K)
    assert abs(got - expected) < 1e-12


def test_temp_scale_probs_normalises(spark, fixture_dfs):
    _, probs, _, probs_df = fixture_dfs
    out = temp_scale_probs(probs_df, 2.0)
    rows = {r["example_id"]: r["pred_probs"] for r in out.collect()}
    clipped = np.clip(probs, 1e-30, None)
    clipped /= clipped.sum(axis=1, keepdims=True)
    scaled = clipped ** 0.5
    scaled /= scaled.sum(axis=1, keepdims=True)
    for i in range(probs.shape[0]):
        assert np.allclose(rows[i], scaled[i], atol=1e-12)


def test_activelab_scores_bounded_and_blend(spark, fixture_dfs):
    lab, probs, long_df, probs_df = fixture_dfs
    out = {r["example_id"]: r["active_learning_score"] for r in active_learning_scores(long_df, probs_df, K).collect()}
    assert len(out) == lab.shape[0]
    assert all(0.0 <= v <= 1.0 for v in out.values())
    # examples with more annotators lean more on consensus quality than 1/K
    # (weights are monotone in annotation count); just assert the blend sits
    # between min(q, 1/K) and max(q, 1/K) per the weighted-average identity
    temp = find_best_temp(long_df, probs_df, K)
    scaled = temp_scale_probs(probs_df, temp)
    df, _ = crowdlab_posterior(long_df, scaled, K)
    qmap = {r["example_id"]: r["consensus_quality_score"] for r in df.collect()}
    for i, v in out.items():
        lo, hi = sorted((qmap[i], 1.0 / K))
        assert lo - 1e-9 <= v <= hi + 1e-9
