"""ObjectLab — object-detection label-quality from raw bounding boxes.

Distributed re-expression of cleanlab/object_detection/rank.py: per-image
(annotated x predicted) box-pair similarity (IoU blended with an
exponential centre-distance kernel, rank.py:307-426), the three per-box
subtype scores (overlooked rank.py:555-610, badloc :690-747, swap
:825-891), softmin pooling per image and the weighted geometric combine
(:1017-1115).

Scale shape: everything is ONE image-keyed equi-join producing the L x M
pair table per image (boxes per image are bounded, so pair counts stay
small), followed by per-box groupBys — no driver-side loops over images,
no Python in the hot path.  Constants from internal/constants.py:9-38.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ALPHA = 0.9
EUC_FACTOR = 0.1
EPSILON = 1e-6
LOW_PROBABILITY_THRESHOLD = 0.5
HIGH_PROBABILITY_THRESHOLD = 0.95
LABEL_OVERLAP_THRESHOLD = 0.95

_BOX = ("x1", "y1", "x2", "y2")


def _iou(p: str, q: str) -> Column:
    """IoU of two boxes given column prefixes (rank.py:323-364)."""
    xl = F.greatest(F.col(f"{p}_x1"), F.col(f"{q}_x1"))
    yt = F.greatest(F.col(f"{p}_y1"), F.col(f"{q}_y1"))
    xr = F.least(F.col(f"{p}_x2"), F.col(f"{q}_x2"))
    yb = F.least(F.col(f"{p}_y2"), F.col(f"{q}_y2"))
    inter = F.when((xr < xl) | (yb < yt), F.lit(0.0)).otherwise((xr - xl) * (yb - yt))
    area_p = (F.col(f"{p}_x2") - F.col(f"{p}_x1")) * (F.col(f"{p}_y2") - F.col(f"{p}_y1"))
    area_q = (F.col(f"{q}_x2") - F.col(f"{q}_x1")) * (F.col(f"{q}_y2") - F.col(f"{q}_y1"))
    return inter / F.greatest(area_p + area_q - inter, F.lit(EPSILON))


def _iou_sql(p: str, q: str) -> str:
    xl = f"greatest({p}_x1, {q}_x1)"
    yt = f"greatest({p}_y1, {q}_y1)"
    xr = f"least({p}_x2, {q}_x2)"
    yb = f"least({p}_y2, {q}_y2)"
    inter = f"(CASE WHEN {xr} < {xl} OR {yb} < {yt} THEN 0.0 ELSE ({xr} - {xl}) * ({yb} - {yt}) END)"
    ap = f"(({p}_x2 - {p}_x1) * ({p}_y2 - {p}_y1))"
    aq = f"(({q}_x2 - {q}_x1) * ({q}_y2 - {q}_y1))"
    return f"({inter} / greatest({ap} + {aq} - {inter}, {EPSILON}))"


def _sim(p: str, q: str, alpha: float = ALPHA) -> Column:
    """alpha * IoU + (1-alpha) * exp(-EUC_FACTOR * centre distance)
    (rank.py:398-420; the double 1-(1-x) in the reference cancels)."""
    cx_p = (F.col(f"{p}_x1") + F.col(f"{p}_x2")) / 2.0
    cy_p = (F.col(f"{p}_y1") + F.col(f"{p}_y2")) / 2.0
    cx_q = (F.col(f"{q}_x1") + F.col(f"{q}_x2")) / 2.0
    cy_q = (F.col(f"{q}_y1") + F.col(f"{q}_y2")) / 2.0
    dist = F.sqrt((cx_p - cx_q) ** 2 + (cy_p - cy_q) ** 2)
    return F.lit(alpha) * _iou(p, q) + F.lit(1.0 - alpha) * F.exp(-dist * F.lit(EUC_FACTOR))


def _sim_sql(p: str, q: str, alpha: float = ALPHA) -> str:
    cx_p = f"(({p}_x1 + {p}_x2) / 2.0)"
    cy_p = f"(({p}_y1 + {p}_y2) / 2.0)"
    cx_q = f"(({q}_x1 + {q}_x2) / 2.0)"
    cy_q = f"(({q}_y1 + {q}_y2) / 2.0)"
    dist = f"sqrt(({cx_p} - {cx_q}) * ({cx_p} - {cx_q}) + ({cy_p} - {cy_q}) * ({cy_p} - {cy_q}))"
    return f"({alpha} * {_iou_sql(p, q)} + {1.0 - alpha} * exp(-{dist} * {EUC_FACTOR}))"


def box_pairs(lab: DataFrame, pred: DataFrame, alpha: float = ALPHA) -> DataFrame:
    """Per-image (annotated, predicted) pair table with iou + similarity.

    ``lab``: (image_id, box_id, label, x1, y1, x2, y2);
    ``pred``: same plus ``prob``."""
    l = lab.select(
        "image_id",
        F.col("box_id").alias("lab_box"),
        F.col("label").alias("lab_label"),
        *[F.col(c).cast("double").alias(f"l_{c}") for c in _BOX],
    )
    p = pred.select(
        "image_id",
        F.col("box_id").alias("pred_box"),
        F.col("label").alias("pred_label"),
        F.col("prob").cast("double").alias("prob"),
        *[F.col(c).cast("double").alias(f"p_{c}") for c in _BOX],
    )
    return (
        l.join(p, "image_id")
        .withColumn("iou", _iou("l", "p"))
        .withColumn("sim", _sim("l", "p", alpha))
    )


def min_possible_similarity(pairs: DataFrame) -> float:
    """Global min over NONZERO similarity entries; 1.0 when there are no
    pairs (rank.py:464-470)."""
    row = pairs.where(F.col("sim") != 0).agg(F.min("sim")).first()
    return float(row[0]) if row and row[0] is not None else 1.0


def overlooked_box_scores(
    pred: DataFrame,
    pairs: DataFrame,
    minsim: float,
    high: float = HIGH_PROBABILITY_THRESHOLD,
) -> DataFrame:
    """Per predicted box (rank.py:555-610): NULL when low-confidence or
    overlapping ANY annotation; else max similarity to a same-class
    annotation, or ``minsim * (1 - prob)`` when that class is absent."""
    g = pairs.groupBy("pred_box").agg(
        F.max((F.col("iou") > 0).cast("int")).alias("_any_iou"),
        F.max(F.when(F.col("lab_label") == F.col("pred_label"), F.col("sim"))).alias("_ksim"),
        F.sum((F.col("lab_label") == F.col("pred_label")).cast("int")).alias("_nk"),
    )
    out = pred.select("image_id", F.col("box_id").alias("pred_box"), "prob").join(
        g, "pred_box", "left"
    )
    score = (
        F.when(
            (F.col("prob") < high) | (F.coalesce(F.col("_any_iou"), F.lit(0)) > 0),
            F.lit(None).cast("double"),
        )
        .when(
            F.coalesce(F.col("_nk"), F.lit(0)) == 0,
            F.lit(minsim) * (F.lit(1.0) - F.col("prob")),
        )
        .otherwise(F.col("_ksim"))
    )
    return out.select("image_id", "pred_box", score.alias("score_overlooked"))


def badloc_box_scores(
    lab: DataFrame, pairs: DataFrame, low: float = LOW_PROBABILITY_THRESHOLD
) -> DataFrame:
    """Per annotated box (rank.py:690-747): among same-class predictions,
    1.0 if none clear the low-probability bar; else max similarity over
    predictions with prob > low AND iou > 0 (1.0 when that set is empty)."""
    k = pairs.where(F.col("lab_label") == F.col("pred_label"))
    g = k.groupBy("lab_box").agg(
        F.max("prob").alias("_maxp"),
        F.max(
            F.when((F.col("prob") > low) & (F.col("iou") > 0), F.col("sim"))
        ).alias("_simc"),
        F.sum(((F.col("prob") > low) & (F.col("iou") > 0)).cast("int")).alias("_nc"),
    )
    out = lab.select("image_id", F.col("box_id").alias("lab_box")).join(g, "lab_box", "left")
    score = F.when(
        F.col("_maxp").isNull() | (F.col("_maxp") <= low), F.lit(1.0)
    ).otherwise(
        F.when(F.coalesce(F.col("_nc"), F.lit(0)) > 0, F.col("_simc")).otherwise(F.lit(1.0))
    )
    return out.select("image_id", "lab_box", score.alias("score_badloc"))


def swap_box_scores(
    lab: DataFrame,
    pairs: DataFrame,
    minsim: float,
    high: float = HIGH_PROBABILITY_THRESHOLD,
    overlapping_label_check: bool = True,
) -> DataFrame:
    """Per annotated box (rank.py:825-891): minsim when the box overlaps
    (IoU >= 0.95) another differently-labeled annotation; 1.0 when no
    other-class prediction clears the high bar; else
    ``max(minsim, 1 - max similarity to a confident other-class
    prediction)``."""
    base = lab.select("image_id", F.col("box_id").alias("lab_box"))
    if overlapping_label_check:
        a = lab.select(
            "image_id",
            F.col("box_id").alias("lab_box"),
            F.col("label").alias("_la"),
            *[F.col(c).cast("double").alias(f"l_{c}") for c in _BOX],
        )
        b = lab.select(
            "image_id",
            F.col("box_id").alias("_ob"),
            F.col("label").alias("_lb"),
            *[F.col(c).cast("double").alias(f"p_{c}") for c in _BOX],
        )
        ov = (
            a.join(b, "image_id")
            .where(F.col("lab_box") != F.col("_ob"))
            .where(_iou("l", "p") >= F.lit(LABEL_OVERLAP_THRESHOLD))
            .where(F.col("_la") != F.col("_lb"))
            .select("lab_box")
            .distinct()
            .withColumn("_hasov", F.lit(True))
        )
        base = base.join(ov, "lab_box", "left")
    else:
        base = base.withColumn("_hasov", F.lit(False))
    nk = pairs.where(F.col("lab_label") != F.col("pred_label"))
    g = nk.groupBy("lab_box").agg(
        F.max(F.when(F.col("prob") > high, F.col("sim"))).alias("_snk"),
        F.sum((F.col("prob") > high).cast("int")).alias("_nnk"),
    )
    out = base.join(g, "lab_box", "left")
    score = (
        F.when(F.coalesce(F.col("_hasov"), F.lit(False)), F.lit(minsim))
        .when(F.coalesce(F.col("_nnk"), F.lit(0)) == 0, F.lit(1.0))
        .otherwise(F.greatest(F.lit(minsim), F.lit(1.0) - F.col("_snk")))
    )
    return out.select("image_id", "lab_box", score.alias("score_swap"))


def _require_global_box_ids(lab: DataFrame, pred: DataFrame) -> None:
    """Every per-box aggregation and join in this module keys on bare
    ``box_id`` — the input contract is that box ids are GLOBALLY unique
    across images (unlike the reference's per-image 0..L-1 indices).
    Per-image ids would silently blend boxes across images, so validate
    loudly up front (one cheap agg per table — box tables are small
    relative to the corpus).  Callers with per-image indices should key
    as e.g. ``concat(image_id, '#', idx)`` first."""
    for name, df in (("lab", lab), ("pred", pred)):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("box_id").alias("d"),
        ).first()
        if row["n"] != row["d"]:
            raise ValueError(
                f"{name} box_id values are not globally unique "
                f"({row['n']} rows, {row['d']} distinct) — objectlab "
                "keys per-box state on bare box_id; derive a global id "
                "(e.g. concat(image_id, '#', index)) first"
            )


def objectlab_scores_from_boxes(
    lab: DataFrame, pred: DataFrame, alpha: float = ALPHA
) -> DataFrame:
    """End-to-end ObjectLab image scores from raw box tables
    (rank.py:50-205): subtype box scores -> per-image softmin pooling ->
    weighted geometric combine.  ``box_id`` must be globally unique
    (validated; see :func:`_require_global_box_ids`)."""
    from .task_scores import objectlab_image_scores

    _require_global_box_ids(lab, pred)
    pairs = box_pairs(lab, pred, alpha).persist()
    minsim = min_possible_similarity(pairs)
    over = overlooked_box_scores(pred, pairs, minsim).select(
        "image_id",
        F.col("score_overlooked").alias("over"),
        F.lit(None).cast("double").alias("badloc"),
        F.lit(None).cast("double").alias("swap"),
    )
    bad = badloc_box_scores(lab, pairs).select(
        "image_id",
        F.lit(None).cast("double").alias("over"),
        F.col("score_badloc").alias("badloc"),
        F.lit(None).cast("double").alias("swap"),
    )
    sw = swap_box_scores(lab, pairs, minsim).select(
        "image_id",
        F.lit(None).cast("double").alias("over"),
        F.lit(None).cast("double").alias("badloc"),
        F.col("score_swap").alias("swap"),
    )
    allb = over.unionByName(bad).unionByName(sw)
    return objectlab_image_scores(
        allb,
        "image_id",
        {"over": F.col("over"), "badloc": F.col("badloc"), "swap": F.col("swap")},
    )


# ------------------------------------------------- find_label_issues (AP)

AP_SCALE_FACTOR = 0.25
OVERLOOKED_THRESHOLD_FACTOR = 0.8
BADLOC_THRESHOLD_FACTOR = 0.8
SWAP_THRESHOLD_FACTOR = 0.8
IOU_THRS = [0.5 + 0.05 * i for i in range(10)]
_F32_EPS = 1.1920928955078125e-07  # np.finfo(np.float32).eps


def per_class_ap(
    lab: DataFrame, pred: DataFrame, num_classes: int, iou_thresholds=None
) -> dict:
    """COCO-style mean AP per class over IoU thresholds 0.50:0.05:0.95
    (object_detection/filter.py:260-450), computed declaratively:

    The reference's per-image greedy matching ("highest-confidence
    prediction with IoU >= thr claims each ground-truth box") depends only
    on (image, class, thr, matched-gt) groups, so it is exactly
    ``row_number() == 1`` over that window ordered by confidence — no
    sequential loop. The PR curve is a forward cumulative sum, the
    interpolated precision a backward running max, and AP the sum of
    recall-step x interpolated precision: three window passes, one
    aggregation. Ties in confidence use (prob desc, image, box) total
    order (the reference's unstable argsort is tie-unspecified).

    Returns {class: mean AP}."""
    thrs = list(iou_thresholds or IOU_THRS)
    from pyspark.sql import Window

    l = lab.select(
        "image_id",
        F.col("box_id").alias("lab_box"),
        F.col("label").alias("k"),
        *[F.col(c).cast("double").alias(f"l_{c}") for c in _BOX],
    )
    p = pred.select(
        "image_id",
        F.col("box_id").alias("pred_box"),
        F.col("label").alias("k"),
        F.col("prob").cast("double").alias("prob"),
        *[F.col(c).cast("double").alias(f"p_{c}") for c in _BOX],
    )
    scp = l.join(p, ["image_id", "k"]).withColumn("iou", _iou("l", "p"))
    w_best = Window.partitionBy("pred_box").orderBy(
        F.col("iou").desc(), F.col("lab_box").asc()
    )
    best = (
        scp.withColumn("_rn", F.row_number().over(w_best))
        .where(F.col("_rn") == 1)
        .select("pred_box", F.col("iou").alias("iou_max"), F.col("lab_box").alias("am"))
    )
    pall = p.select("image_id", "pred_box", "k", "prob").join(best, "pred_box", "left")
    thr_arr = F.explode(F.array(*[F.lit(float(t)) for t in thrs])).alias("thr")
    pt = pall.select("*", thr_arr).withColumn(
        "cand", F.col("iou_max").isNotNull() & (F.col("iou_max") >= F.col("thr"))
    )
    w_claim = Window.partitionBy("k", "thr", "image_id", "am", "cand").orderBy(
        F.col("prob").desc(), F.col("pred_box").asc()
    )
    pt = pt.withColumn("_rn", F.row_number().over(w_claim)).withColumn(
        "tp", (F.col("cand") & (F.col("_rn") == 1)).cast("int")
    )
    gts = {r["k"]: r["n"] for r in lab.groupBy(F.col("label").alias("k")).count().withColumnRenamed("count", "n").collect()}
    g_map = F.create_map(*[x for k in range(num_classes) for x in (F.lit(k), F.lit(float(gts.get(k, 0))))])
    order = [F.col("prob").desc(), F.col("image_id").asc(), F.col("pred_box").asc()]
    w_cum = (
        Window.partitionBy("k", "thr").orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    )
    w_back = (
        Window.partitionBy("k", "thr").orderBy(*order).rowsBetween(0, Window.unboundedFollowing)
    )
    w_lag = Window.partitionBy("k", "thr").orderBy(*order)
    ser = (
        pt.withColumn("ctp", F.sum("tp").over(w_cum))
        .withColumn("cfp", F.sum(F.lit(1) - F.col("tp")).over(w_cum))
        .withColumn("_g", F.element_at(g_map, F.col("k")))
        .withColumn("recall", F.col("ctp") / F.greatest(F.col("_g"), F.lit(_F32_EPS)))
        .withColumn(
            "prec",
            F.col("ctp").cast("double")
            / F.greatest((F.col("ctp") + F.col("cfp")).cast("double"), F.lit(_F32_EPS)),
        )
    )
    ser = ser.withColumn("pint", F.max("prec").over(w_back)).withColumn(
        "rprev", F.lag("recall", 1, 0.0).over(w_lag)
    )
    ap_rows = (
        ser.groupBy("k", "thr")
        .agg(F.sum((F.col("recall") - F.col("rprev")) * F.col("pint")).alias("ap"))
        .groupBy("k")
        .agg(F.avg("ap").alias("map"))
        .collect()
    )
    ap = {int(r["k"]): float(r["map"]) for r in ap_rows}
    return {k: ap.get(k, 0.0) for k in range(num_classes)}


def objectlab_find_label_issues(
    lab: DataFrame, pred: DataFrame, num_classes: int, alpha: float = ALPHA
) -> DataFrame:
    """object_detection/filter.find_label_issues (filter.py:32-226):
    per-box subtype scores compared against per-class thresholds
    ``AP_k * 0.25 * 0.8``; an image is an issue when ANY of its boxes
    (predicted or annotated) falls at or below its threshold.  NaN box
    scores count as 1.0 (never an issue).  ``box_id`` must be globally
    unique (validated; see :func:`_require_global_box_ids`)."""
    # lab/pred feed ~8 separate jobs (AP collect, gt counts, minsim,
    # three subtype DAGs, final union) — pin the small box tables once
    # instead of re-deriving them per job
    lab = lab.persist()
    pred = pred.persist()
    _require_global_box_ids(lab, pred)
    ap = per_class_ap(lab, pred, num_classes)
    thr = {k: ap[k] * AP_SCALE_FACTOR for k in range(num_classes)}
    thr_map = F.create_map(*[x for k, v in thr.items() for x in (F.lit(k), F.lit(float(v)))])
    pairs = box_pairs(lab, pred, alpha).persist()
    minsim = min_possible_similarity(pairs)

    over = overlooked_box_scores(pred, pairs, minsim).join(
        pred.select(F.col("box_id").alias("pred_box"), F.col("label").alias("_k")),
        "pred_box",
    )
    over_flag = over.select(
        "image_id",
        (
            F.coalesce(F.col("score_overlooked"), F.lit(1.0))
            <= F.element_at(thr_map, F.col("_k")) * F.lit(OVERLOOKED_THRESHOLD_FACTOR)
        ).alias("_flag"),
    )
    lab_k = lab.select(F.col("box_id").alias("lab_box"), F.col("label").alias("_k"))
    bad = badloc_box_scores(lab, pairs).join(lab_k, "lab_box")
    bad_flag = bad.select(
        "image_id",
        (
            F.coalesce(F.col("score_badloc"), F.lit(1.0))
            <= F.element_at(thr_map, F.col("_k")) * F.lit(BADLOC_THRESHOLD_FACTOR)
        ).alias("_flag"),
    )
    sw = swap_box_scores(lab, pairs, minsim).join(lab_k, "lab_box")
    sw_flag = sw.select(
        "image_id",
        (
            F.coalesce(F.col("score_swap"), F.lit(1.0))
            <= F.element_at(thr_map, F.col("_k")) * F.lit(SWAP_THRESHOLD_FACTOR)
        ).alias("_flag"),
    )
    flags = over_flag.unionByName(bad_flag).unionByName(sw_flag)
    images = (
        lab.select("image_id").unionByName(pred.select("image_id")).distinct()
    )
    agg = flags.groupBy("image_id").agg(F.max(F.col("_flag").cast("int")).alias("_any"))
    return images.join(agg, "image_id", "left").select(
        "image_id", (F.coalesce(F.col("_any"), F.lit(0)) > 0).alias("is_label_issue")
    )
