"""ObjectLab box-score parity vs a direct NumPy re-derivation
(object_detection/rank.py:307-891), with planted geometry exercising
every branch: overlapping annotations, absent classes, low/high
confidence predictions, empty prediction sets."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkclean.quality.objectlab import (
    ALPHA,
    EUC_FACTOR,
    badloc_box_scores,
    box_pairs,
    min_possible_similarity,
    objectlab_scores_from_boxes,
    overlooked_box_scores,
    swap_box_scores,
)

# (image, box_id, label, x1, y1, x2, y2)
LAB = [
    (0, 0, 0, 0.0, 0.0, 10.0, 10.0),
    (0, 1, 1, 0.1, 0.1, 10.0, 10.0),   # overlaps box 0 with IoU>0.95, other label
    (0, 2, 2, 40.0, 40.0, 50.0, 50.0),
    (1, 3, 0, 0.0, 0.0, 8.0, 8.0),
    (2, 4, 1, 5.0, 5.0, 15.0, 15.0),
]
# (image, box_id, label, prob, x1, y1, x2, y2)
PRED = [
    (0, 10, 0, 0.99, 0.0, 0.0, 10.0, 10.0),    # matches lab 0
    (0, 11, 2, 0.40, 41.0, 41.0, 50.0, 50.0),  # low-confidence near lab 2
    (0, 12, 3, 0.99, 80.0, 80.0, 90.0, 90.0),  # confident, isolated, class absent
    (1, 13, 1, 0.97, 30.0, 30.0, 40.0, 40.0),  # other-class confident, far
    # image 2 has no predictions at all
]


def _np_scores():
    def iou(a, b):
        xl, yt = max(a[0], b[0]), max(a[1], b[1])
        xr, yb = min(a[2], b[2]), min(a[3], b[3])
        if xr < xl or yb < yt:
            return 0.0
        inter = (xr - xl) * (yb - yt)
        ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
        return inter / max(ua, 1e-6)

    def sim(a, b):
        c1 = ((a[0] + a[2]) / 2, (a[1] + a[3]) / 2)
        c2 = ((b[0] + b[2]) / 2, (b[1] + b[3]) / 2)
        d = math.hypot(c1[0] - c2[0], c1[1] - c2[1])
        return ALPHA * iou(a, b) + (1 - ALPHA) * math.exp(-d * EUC_FACTOR)

    pairs = {}
    for li, (im, lb, lk, *lbox) in enumerate(LAB):
        for pi, (im2, pb, pk, pp, *pbox) in enumerate(PRED):
            if im == im2:
                pairs[(lb, pb)] = (iou(lbox, pbox), sim(lbox, pbox), lk, pk, pp)
    sims = [v[1] for v in pairs.values() if v[1] != 0]
    minsim = min(sims) if sims else 1.0

    over = {}
    for im2, pb, pk, pp, *pbox in PRED:
        rel = {k: v for k, v in pairs.items() if k[1] == pb}
        if pp < 0.95 or any(v[0] > 0 for v in rel.values()):
            over[pb] = None
            continue
        ks = [v[1] for v in rel.values() if v[2] == pk]
        over[pb] = minsim * (1 - pp) if not ks else max(ks)

    bad = {}
    for im, lb, lk, *lbox in LAB:
        rel = {k: v for k, v in pairs.items() if k[0] == lb and v[3] == lk}
        if not rel or max(v[4] for v in rel.values()) <= 0.5:
            bad[lb] = 1.0
            continue
        cand = [v[1] for v in rel.values() if v[4] > 0.5 and v[0] > 0]
        bad[lb] = max(cand) if cand else 1.0

    def lab_iou(a, b):
        return iou(a[3:], b[3:])

    swap = {}
    for i, box in enumerate(LAB):
        im, lb, lk = box[0], box[1], box[2]
        has_ov = any(
            o[0] == im and o[1] != lb and o[2] != lk and lab_iou(box, o) >= 0.95
            for o in LAB
        )
        if has_ov:
            swap[lb] = minsim
            continue
        rel = [v for k, v in pairs.items() if k[0] == lb and v[3] != lk and v[4] > 0.95]
        swap[lb] = 1.0 if not rel else max(minsim, 1 - max(v[1] for v in rel))
    return minsim, over, bad, swap


@pytest.fixture(scope="module")
def box_dfs(spark):
    lab = spark.createDataFrame(
        LAB, "image_id: int, box_id: int, label: int, x1: double, y1: double, x2: double, y2: double"
    )
    pred = spark.createDataFrame(
        PRED,
        "image_id: int, box_id: int, label: int, prob: double, "
        "x1: double, y1: double, x2: double, y2: double",
    )
    return lab, pred


def test_box_subtype_scores_match_numpy(spark, box_dfs):
    lab, pred = box_dfs
    pairs = box_pairs(lab, pred)
    minsim_np, over_np, bad_np, swap_np = _np_scores()
    minsim = min_possible_similarity(pairs)
    assert abs(minsim - minsim_np) < 1e-12

    over = {r["pred_box"]: r["score_overlooked"] for r in overlooked_box_scores(pred, pairs, minsim).collect()}
    for pb, exp in over_np.items():
        if exp is None:
            assert over[pb] is None, pb
        else:
            assert abs(over[pb] - exp) < 1e-12, pb
    # box 12: confident prediction of an absent class, no overlap ->
    # overlooked candidate scored minsim * (1 - prob)
    assert over[12] is not None and abs(over[12] - minsim * 0.01) < 1e-12

    bad = {r["lab_box"]: r["score_badloc"] for r in badloc_box_scores(lab, pairs).collect()}
    for lb, exp in bad_np.items():
        assert abs(bad[lb] - exp) < 1e-12, lb
    assert bad[4] == 1.0  # image 2: no predictions at all

    swap = {r["lab_box"]: r["score_swap"] for r in swap_box_scores(lab, pairs, minsim).collect()}
    for lb, exp in swap_np.items():
        assert abs(swap[lb] - exp) < 1e-12, lb
    # boxes 0/1 overlap >=0.95 with different labels -> both get minsim
    assert abs(swap[0] - minsim) < 1e-12 and abs(swap[1] - minsim) < 1e-12


def test_image_scores_bounded_and_complete(spark, box_dfs):
    lab, pred = box_dfs
    out = {r["image_id"]: r["label_quality_score"] for r in objectlab_scores_from_boxes(lab, pred).collect()}
    assert set(out) == {0, 1, 2}
    assert all(0.0 <= v <= 1.0 + 1e-12 for v in out.values())
    # image 2 has one annotation, zero predictions: badloc=swap=1, no
    # overlooked rows -> perfect score
    assert abs(out[2] - 1.0) < 1e-9
