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
