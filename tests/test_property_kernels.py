"""Property-based checks for driver-side kernels (no SparkSession)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from sparkclean.quality import matrix_ops
from sparkclean.text.scrub import scrub_py


@given(
    st.lists(st.floats(min_value=0, max_value=1000, allow_nan=False), min_size=1, max_size=30)
)
@settings(max_examples=200, deadline=None)
def test_round_preserving_sum_properties(vals):
    arr = np.array(vals)
    out = matrix_ops.round_preserving_sum(arr)
    assert out.dtype.kind == "i"
    assert out.sum() == round(float(np.round(arr.sum())))
    # each element moves at most ~1 beyond plain rounding
    assert np.all(np.abs(out - np.round(arr)) <= np.ceil(len(vals) / 2))


@given(
    st.integers(min_value=2, max_value=8),
    st.integers(min_value=0, max_value=10_000),
)
@settings(max_examples=100, deadline=None)
def test_calibrate_confident_joint_invariants(k, seed):
    rng = np.random.RandomState(seed)
    cj = rng.randint(0, 50, size=(k, k))
    np.fill_diagonal(cj, np.diagonal(cj) + 1)
    counts = rng.randint(1, 100, size=k)
    cal = matrix_ops.calibrate_confident_joint(cj, counts)
    # the defining invariants (count.py:221-291)
    assert cal.sum() == counts.sum()
    assert np.array_equal(cal.sum(axis=1), counts)
    assert (cal >= 0).all()


@given(st.integers(min_value=2, max_value=6), st.integers(min_value=0, max_value=5000))
@settings(max_examples=100, deadline=None)
def test_estimate_latent_shapes_and_ranges(k, seed):
    rng = np.random.RandomState(seed)
    cj = rng.randint(0, 40, size=(k, k))
    np.fill_diagonal(cj, np.diagonal(cj) + 5)
    counts = cj.sum(axis=1)
    py, nm, inv = matrix_ops.estimate_latent(cj, counts)
    assert abs(py.sum() - 1.0) < 1e-9
    assert (py >= 1e-6).all()
    assert nm.shape == (k, k) and inv.shape == (k, k)
    assert (nm >= 0).all() and (inv >= 0).all()


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_scrub_never_leaves_email_or_ssn(text):
    import re

    out = scrub_py(text)
    assert not re.search(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", out)
    assert not re.search(r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", out)


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_scrub_idempotent(text):
    once = scrub_py(text)
    assert scrub_py(once) == once


@given(st.integers(min_value=2, max_value=6), st.integers(min_value=0, max_value=5000))
@settings(max_examples=100, deadline=None)
def test_clip_noise_rates_reference_semantics(k, seed):
    rng = np.random.RandomState(seed)
    nm = rng.dirichlet(np.ones(k), size=k).T  # columns sum to 1
    out = matrix_ops.clip_noise_rates(nm)
    # columns renormalised to 1 (internal/util.py:49-75)
    assert np.allclose(out.sum(axis=0), 1.0)
    off = ~np.eye(k, dtype=bool)
    assert (out[off] <= 0.9999 / out.sum(axis=0).min() + 1e-12).all()
    # when nothing needs clipping the matrix is unchanged
    if (nm[off] <= 0.9999).all():
        assert np.allclose(out, nm)


@given(
    st.lists(
        st.floats(min_value=-5, max_value=5, allow_nan=False, width=32).map(
            lambda x: 0.0 if abs(x) < 1e-6 else x
        ),
        min_size=2,
        max_size=12,
    ),
    st.integers(min_value=0, max_value=1),
)
@settings(max_examples=200, deadline=None)
def test_clip_values_preserves_requested_sum(vals, use_new_sum):
    # values below the 1e-100 TINY_VALUE guard excluded: the reference
    # divides by clip(sum, 1e-100) too, so denormal sums are not preserved
    v = np.array(vals)
    if np.clip(v, 0, 1).sum() <= 1e-12:
        return
    if use_new_sum:
        out = matrix_ops.clip_values(v, 0.0, 1.0, new_sum=1.0)
        assert abs(out.sum() - 1.0) < 1e-9
    else:
        # new_sum=None preserves the PRE-clip total (internal/util.py:104)
        out = matrix_ops.clip_values(v, 0.0, 1.0)
        assert abs(out.sum() - v.sum()) < 1e-9


@given(st.integers(min_value=2, max_value=6), st.integers(min_value=0, max_value=5000))
@settings(max_examples=100, deadline=None)
def test_latent_algebra_round_trip(k, seed):
    """inv from (py, nm) and nm back from (ps, inv) stay column-stochastic,
    and the Bayes joint is consistent: nm*py == (inv*ps).T pre-clip."""
    rng = np.random.RandomState(seed)
    nm = rng.dirichlet(np.ones(k) + 3 * np.eye(k)[0], size=k).T
    nm = matrix_ops.clip_noise_rates(nm)
    py = rng.dirichlet(np.ones(k))
    ps = nm @ py
    inv = matrix_ops.compute_inv_noise_matrix(py, nm, ps)
    assert np.allclose(inv.sum(axis=0), 1.0)
    nm2 = matrix_ops.compute_noise_matrix_from_inverse(ps, inv, py)
    assert np.allclose(nm2.sum(axis=0), 1.0)
    # exact round-trip when no entry hits the 0.9999 clip
    if (nm[~np.eye(k, dtype=bool)] <= 0.9999).all() and (
        inv[~np.eye(k, dtype=bool)] <= 0.9999
    ).all():
        assert np.allclose(nm2, nm, atol=1e-9)


@given(st.integers(min_value=2, max_value=6), st.integers(min_value=0, max_value=5000))
@settings(max_examples=50, deadline=None)
def test_converge_estimates_stays_stochastic(k, seed):
    rng = np.random.RandomState(seed)
    cj = rng.randint(0, 40, size=(k, k))
    np.fill_diagonal(cj, np.diagonal(cj) + 5)
    counts = cj.sum(axis=1)
    py, nm, inv = matrix_ops.estimate_latent(cj, counts, converge_latent_estimates=True)
    assert abs(py.sum() - 1.0) < 1e-9
    assert (py >= 1e-5 - 1e-12).all()
    assert np.allclose(nm.sum(axis=0), 1.0)
    assert np.allclose(inv.sum(axis=0), 1.0)


@given(st.integers(min_value=2, max_value=6), st.integers(min_value=0, max_value=5000))
@settings(max_examples=100, deadline=None)
def test_remove_noise_from_class_columns_sum_to_one(k, seed):
    rng = np.random.RandomState(seed)
    nm = rng.dirichlet(np.ones(k) + 5 * np.eye(k)[0], size=k).T
    cwn = int(rng.randint(0, k))
    out = matrix_ops.remove_noise_from_class(nm, cwn)
    assert np.allclose(out.sum(axis=0), 1.0)
    # the cwn row is zero everywhere except its own column
    mask = np.ones(k, dtype=bool)
    mask[cwn] = False
    assert (out[cwn, mask] == 0.0).all()


def test_compute_py_methods_agree_on_clean_matrix():
    """With a noise-free nm (identity), every py_method returns ps."""
    k = 4
    ps = np.array([0.1, 0.2, 0.3, 0.4])
    nm = np.eye(k)
    inv = np.eye(k)
    tc = ps * 100
    for m in ("cnt", "eqn", "marginal", "marginal_ps"):
        py = matrix_ops.compute_py(ps, nm, inv, py_method=m, true_labels_class_counts=tc)
        assert np.allclose(py, ps, atol=1e-9), m


def test_compute_pyx_multiplier_identity():
    assert np.allclose(
        matrix_ops.compute_pyx_multiplier(np.eye(3), np.eye(3)), np.ones(3)
    )


# ---------------------------------------------------------- dedup kernels
# Pure-Python mirrors of the Catalyst minhash/simhash expressions let
# hypothesis hammer the algebraic invariants without a SparkSession.

def _hash60_py(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _shingles_py(text: str, n: int = 3):
    import re

    w = [t for t in re.split(r"\s+", text.lower().strip()) if t != ""] if text.strip() else []
    if len(w) < n:
        return []
    seen, out = set(), []
    for i in range(len(w) - n + 1):
        h = _hash60_py(" ".join(w[i : i + n]))
        if h not in seen:
            seen.add(h)
            out.append(h)
    return out


def _minhash_py(shingles):
    from sparkclean.dedup.minhash import COEF_A, COEF_B, MERSENNE_P

    if not shingles:
        return [MERSENNE_P] * len(COEF_A)
    return [
        min((a * (s % (1 << 31)) + b) % MERSENNE_P for s in shingles)
        for a, b in zip(COEF_A, COEF_B)
    ]


@given(st.text(alphabet="abcdef \n", min_size=0, max_size=120))
@settings(max_examples=200, deadline=None)
def test_minhash_signature_invariants(text):
    sig = _minhash_py(_shingles_py(text))
    from sparkclean.dedup.minhash import MERSENNE_P, NUM_HASHES

    assert len(sig) == NUM_HASHES
    assert all(0 <= v <= MERSENNE_P for v in sig)
    # duplicating the document's shingle set never changes the signature
    assert sig == _minhash_py(_shingles_py(text) * 2)


@given(
    st.lists(st.text(alphabet="abcdxyz", min_size=1, max_size=8), min_size=3, max_size=30),
    st.integers(min_value=0, max_value=1000),
)
@settings(max_examples=150, deadline=None)
def test_minhash_jaccard_monotone_under_shared_prefix(words, seed):
    """Two documents sharing all shingles have identical signatures; the
    estimated band-collision probability of disjoint docs is ~0."""
    doc = " ".join(words)
    assert _minhash_py(_shingles_py(doc)) == _minhash_py(_shingles_py(doc))
    other = " ".join(w + "qq" for w in words)  # disjoint token space
    s1, s2 = _shingles_py(doc), _shingles_py(other)
    if s1 and s2 and not set(s1) & set(s2):
        sig1, sig2 = _minhash_py(s1), _minhash_py(s2)
        matches = sum(a == b for a, b in zip(sig1, sig2))
        assert matches <= len(sig1) // 2  # disjoint sets rarely collide


def test_simhash_permutation_invariant(spark):
    """Simhash is a bag-of-distinct-tokens fingerprint: word order and
    repetition must not change it."""
    from pyspark.sql import functions as F

    from sparkclean.dedup.simhash import with_simhash

    df = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),
            (1, "delta gamma beta alpha"),
            (2, "alpha alpha beta beta gamma gamma delta"),
            (3, "completely different tokens here"),
        ],
        "doc_id: long, text: string",
    )
    out = {r["doc_id"]: r["simhash"] for r in with_simhash(df).collect()}
    assert out[0] == out[1] == out[2]
    assert out[0] != out[3]


# ------------------------------------------------------- non-IID KDE tail


@given(st.integers(0, 2**32 - 1))
@settings(max_examples=40, deadline=None)
def test_kde_tail_matches_scipy_semantics(seed):
    """kde_tail_p == gaussian_kde(stats).integrate_box(d, 100) re-derived
    in NumPy with EXACT libm erf (scipy itself is not installed here):
    Scott bandwidth h = std(ddof=1) * P^(-1/5), tail = mean_i
    [ndtr((100-x_i)/h) - ndtr((d-x_i)/h)].  The A&S-erf twin must agree
    to 1e-6 (its |err| bound is 1.5e-7)."""
    import math

    from sparkclean.quality.valuation import kde_tail_p

    rng = np.random.default_rng(seed)
    stats = list(rng.uniform(0.01, 0.4, size=25))
    d = float(rng.uniform(0.0, 0.6))

    h = float(np.std(stats, ddof=1)) * 25 ** (-0.2)

    def ndtr(z):
        return 0.5 * (1.0 + math.erf(z / math.sqrt(2.0)))

    exp = sum(ndtr((100.0 - x) / h) - ndtr((d - x) / h) for x in stats) / 25
    assert abs(kde_tail_p(d, stats) - exp) < 1e-6


def test_kde_tail_degenerate_falls_back_to_empirical():
    from sparkclean.quality.valuation import kde_tail_p

    # all-identical permutation stats → singular KDE → empirical tail
    assert kde_tail_p(0.5, [0.2] * 25) == (1.0 + 0) / 26.0
    assert kde_tail_p(0.1, [0.2] * 25) == (1.0 + 25) / 26.0
