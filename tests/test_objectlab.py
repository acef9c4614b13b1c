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


def test_per_class_ap_matches_greedy_loop(spark):
    """The window formulation of the matcher must equal the reference's
    per-image greedy loop (filter.py:260-388) and its interpolated-AP
    integration, on a randomized fixture with distinct confidences."""
    from sparkclean.quality.objectlab import IOU_THRS, per_class_ap

    rng = np.random.RandomState(5)
    K = 3
    labs, preds = [], []
    for im in range(12):
        for _ in range(rng.randint(0, 4)):
            x1, y1 = (float(v) for v in rng.rand(2) * 40)
            labs.append(
                (im, len(labs), int(rng.randint(K)), x1, y1,
                 x1 + 5 + float(rng.rand()) * 10, y1 + 5 + float(rng.rand()) * 10)
            )
    for im in range(12):
        for _ in range(rng.randint(0, 5)):
            if labs and rng.rand() < 0.5:
                src = labs[rng.randint(len(labs))]
                x1 = src[3] + float(rng.randn()) * 2
                y1 = src[4] + float(rng.randn()) * 2
                x2 = max(src[5] + float(rng.randn()) * 2, x1 + 0.5)
                y2 = max(src[6] + float(rng.randn()) * 2, y1 + 0.5)
                k = src[2] if rng.rand() < 0.7 else int(rng.randint(K))
                im_use = src[0]
            else:
                x1, y1 = (float(v) for v in rng.rand(2) * 40)
                x2 = x1 + 5 + float(rng.rand()) * 10
                y2 = y1 + 5 + float(rng.rand()) * 10
                k, im_use = int(rng.randint(K)), im
            preds.append((im_use, 1000 + len(preds), k, float(rng.rand()), x1, y1, x2, y2))

    lab_df = spark.createDataFrame(
        labs, "image_id: int, box_id: int, label: int, x1: double, y1: double, x2: double, y2: double"
    )
    pred_df = spark.createDataFrame(
        preds,
        "image_id: int, box_id: int, label: int, prob: double, x1: double, y1: double, x2: double, y2: double",
    )
    got = per_class_ap(lab_df, pred_df, K)

    # ---- NumPy greedy-loop oracle
    def iou(a, b):
        xl, yt = max(a[0], b[0]), max(a[1], b[1])
        xr, yb = min(a[2], b[2]), min(a[3], b[3])
        if xr < xl or yb < yt:
            return 0.0
        inter = (xr - xl) * (yb - yt)
        ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
        return inter / max(ua, 1e-6)

    def ap_for(k, thr):
        rows = []  # (prob, tp) in image order then box order
        ngts = sum(1 for l in labs if l[2] == k)
        for im in sorted({r[0] for r in labs} | {r[0] for r in preds}):
            pboxes = [p for p in preds if p[0] == im and p[2] == k]
            lboxes = [l for l in labs if l[0] == im and l[2] == k]
            if not pboxes:
                continue
            covered = [False] * len(lboxes)
            entries = []
            for p in pboxes:
                ious = [iou(l[3:], p[4:]) for l in lboxes]
                mx = max(ious) if ious else None
                am = int(np.argmax(ious)) if ious else None
                entries.append([p[3], mx, am, 0])
            for idx in sorted(range(len(entries)), key=lambda i: -entries[i][0]):
                pr, mx, am, _ = entries[idx]
                if mx is not None and mx >= thr and not covered[am]:
                    covered[am] = True
                    entries[idx][3] = 1
            rows += [(e[0], e[3]) for e in entries]
        if not rows:
            return 0.0
        rows.sort(key=lambda t: -t[0])
        eps = np.finfo(np.float32).eps
        tp = np.cumsum([r[1] for r in rows])
        fp = np.cumsum([1 - r[1] for r in rows])
        rec = tp / max(ngts, eps)
        prec = tp / np.maximum(tp + fp, eps)
        mrec = np.hstack(([0.0], rec, [1.0]))
        mpre = np.hstack(([0.0], prec, [0.0]))
        for i in range(len(mpre) - 1, 0, -1):
            mpre[i - 1] = max(mpre[i - 1], mpre[i])
        idx = np.where(mrec[1:] != mrec[:-1])[0]
        return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))

    for k in range(K):
        expected = float(np.mean([ap_for(k, t) for t in IOU_THRS]))
        assert abs(got[k] - expected) < 1e-9, (k, got[k], expected)
