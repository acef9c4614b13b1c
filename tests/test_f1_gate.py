"""The BASELINE F1 ≥ 0.99 keep/drop gate, computed explicitly.

Reference labels are produced by an independent plain-Python/NumPy run
of the same frozen pipeline logic (text.fast used batch-wise locally —
the same functions a reviewer would run outside Spark), compared
against the distributed Catalyst/SQL pipeline output.
"""

import numpy as np

from sparkclean import synth
from sparkclean.pipeline import run_caption_quality
from sparkclean.text.fast import caption_features_batch, label_and_probs_batch
from sparkclean.text.scrub import scrub_py

N = 800


def test_keep_drop_f1_and_scrub_exact(spark):
    corpus = synth.synth_images(spark, N, with_images=False, partitions=4).cache()
    captions = {r["image_id"]: r["caption"] for r in corpus.select("image_id", "caption").collect()}

    # ---- reference run (local NumPy, no Spark)
    ids = sorted(captions)
    texts = [captions[i] for i in ids]
    feats = caption_features_batch(texts)
    labels, probs = label_and_probs_batch(feats)
    # pass 1: thresholds
    t = np.full(3, 2.0)
    for k in range(3):
        sel = labels == k
        if sel.any():
            t[k] = probs[sel, k].mean()
    t = np.clip(t, 2e-6, None)
    # pass 2: fast issue count + bottom-n by (score, id)
    am = probs.argmax(1)
    conf_neq = (probs[np.arange(len(ids)), am] >= t[am] - 1e-6) & (am != labels)
    n_issues = int(conf_neq.sum())
    score = probs[np.arange(len(ids)), labels]
    order = np.lexsort((np.array(ids), score))
    flagged = np.zeros(len(ids), dtype=bool)
    flagged[order[:n_issues]] = True
    boosted = probs.copy()
    boosted[np.arange(len(ids)), labels] += 1e-6
    flagged &= boosted.argmax(1) != labels
    ref_keep = (labels == 0) & ~flagged
    ref_scrub = [scrub_py(x) for x in texts]

    # ---- distributed run
    out = {
        r["doc_id"]: r
        for r in run_caption_quality(
            corpus.withColumnRenamed("image_id", "doc_id"), "doc_id", "caption"
        ).collect()
    }
    got_keep = np.array([out[i]["keep"] for i in ids])
    tp = int((got_keep & ref_keep).sum())
    fp = int((got_keep & ~ref_keep).sum())
    fn = int((~got_keep & ref_keep).sum())
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99, f"keep/drop F1 {f1}"

    # scrubbed text exact per row
    for i, expected in zip(ids, ref_scrub):
        assert out[i]["scrubbed_text"] == expected, i
