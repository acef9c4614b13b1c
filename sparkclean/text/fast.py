"""Arrow-batch caption scorer — the production fast path.

Computes, per Arrow batch inside a pandas/mapInPandas worker, exactly
the same features / pseudo-label / pred_probs as the Catalyst SQL path
in text.rules / text.langid / text.ppl / pipeline (and their DuckDB
twins): identical formulas, identical hashing (md5), identical
tie-breaks.  Float results agree to the last ulp except for libm
``exp`` differences (~1e-16 relative), which the 6-dp output rounding
absorbs; pseudo-labels and keep/drop rules compare quantities far from
their decision boundaries on the synthetic corpus (margin analysis in
SURVEY.md §7).

This is the dataflow BASELINE.json prescribes — "vectorized
pandas/Arrow UDFs run fastText language ID, a hashed n-gram KenLM-style
perplexity scorer" — and it sidesteps the JVM contention of interpreted
higher-order expressions (measured 0.38 scaling efficiency for the
Catalyst feature stage at 32 threads vs ~0.9 for Python workers).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

from ..constants import CONFIDENT_THRESHOLDS_LOWER_BOUND
from .ppl import FALLBACK_LOGP, LOGP_MAX, LOGP_MIN, RES
from .shared import ENGLISH_STOPWORDS, LANG_MARKERS, LANG_ORDER

_WS = re.compile(r"\s+")
_NON_DIGIT = re.compile(r"[^0-9]")
_NON_ALPHA = re.compile(r"[^A-Za-z]")
_NON_PUNCT = re.compile(r"[^!-/:-@\[-`{-~]")
_NON_UPPER = re.compile(r"[^A-Z]")

_STOPSET = frozenset(ENGLISH_STOPWORDS)
# token → list of language indices whose marker list contains it
_MARKER_LANGS: dict[str, list[int]] = {}
for _li, _lang in enumerate(LANG_ORDER):
    for _w in LANG_MARKERS[_lang]:
        _MARKER_LANGS.setdefault(_w, []).append(_li)

# frozen scorer weights — single source of truth lives in pipeline.py
from .. import pipeline as _pl  # noqa: E402  (cycle-safe: only constants used)


def _logp(bigram: str) -> float:
    h = int(hashlib.md5(bigram.encode("utf-8")).hexdigest()[:15], 16)
    return LOGP_MIN + (h % RES) / RES * (LOGP_MAX - LOGP_MIN)


def caption_features_batch(texts) -> dict[str, np.ndarray]:
    """All caption features + pseudo-label + pred_probs for one batch."""
    n = len(texts)
    out = {
        "n_chars": np.zeros(n, dtype=np.int64),
        "n_words": np.zeros(n, dtype=np.int64),
        "digit_ratio": np.zeros(n),
        "alpha_ratio": np.zeros(n),
        "punct_ratio": np.zeros(n),
        "upper_ratio": np.zeros(n),
        "repetition_ratio": np.zeros(n),
        "stopword_ratio": np.zeros(n),
        "pred_lang": np.empty(n, dtype=object),
        "ppl": np.zeros(n),
    }
    n_langs = len(LANG_ORDER)
    for i, raw in enumerate(texts):
        t = "" if raw is None else str(raw)
        ln = len(t)
        out["n_chars"][i] = ln
        if ln > 0:
            out["digit_ratio"][i] = len(_NON_DIGIT.sub("", t)) / ln
            out["alpha_ratio"][i] = len(_NON_ALPHA.sub("", t)) / ln
            out["punct_ratio"][i] = len(_NON_PUNCT.sub("", t)) / ln
            out["upper_ratio"][i] = len(_NON_UPPER.sub("", t)) / ln
        stripped = t.strip()
        words = _WS.split(stripped) if stripped else []
        nw = len(words)
        out["n_words"][i] = nw
        if nw > 0:
            out["repetition_ratio"][i] = 1.0 - len(set(words)) / nw
        # words of lower(text) == lower of words for whitespace-stable text
        wl = [w.lower() for w in words]
        if nw > 0:
            out["stopword_ratio"][i] = sum(1 for w in wl if w in _STOPSET) / nw
        # marker langid (first max wins, zero hits → und)
        hits = [0] * n_langs
        for w in wl:
            for li in _MARKER_LANGS.get(w, ()):
                hits[li] += 1
        best = max(hits) if hits else 0
        out["pred_lang"][i] = (
            LANG_ORDER[hits.index(best)] if best > 0 else "und"
        )
        # hashed-bigram perplexity (exact twin of ppl_hash_col)
        if nw >= 2:
            s = 0.0
            for a, b in zip(wl, wl[1:]):
                s += _logp(a + " " + b)
            mean_logp = s / (nw - 1)
        else:
            mean_logp = FALLBACK_LOGP
        out["ppl"][i] = np.exp(-mean_logp)
    return out


def label_and_probs_batch(feat: dict[str, np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """Frozen softmax-linear pseudo-label scorer (pipeline.WEIGHTS)."""
    f_len = np.minimum(feat["n_words"].astype(np.float64), 50.0) / 50.0
    en = (feat["pred_lang"] == "en").astype(np.float64)
    lppl = np.log(feat["ppl"]) / 10.0
    logits = []
    for w in _pl.WEIGHTS:
        logits.append(
            w["bias"]
            + w["f_len"] * f_len
            + w["rep"] * feat["repetition_ratio"]
            + w["digit"] * feat["digit_ratio"]
            + w["punct"] * feat["punct_ratio"]
            + w["stop"] * feat["stopword_ratio"]
            + w["en"] * en
            + w["lppl"] * lppl
        )
    exps = [np.exp(l) for l in logits]
    total = exps[0] + exps[1] + exps[2]
    probs = np.stack([e / total for e in exps], axis=1)
    label = np.where(
        feat["pred_lang"] != "en",
        2,
        np.where(
            (feat["n_words"] < _pl.MIN_WORDS_GOOD)
            | (feat["repetition_ratio"] > _pl.MAX_REPETITION_GOOD)
            | (feat["digit_ratio"] > _pl.MAX_DIGIT_GOOD),
            1,
            0,
        ),
    ).astype(np.int32)
    return label, probs
