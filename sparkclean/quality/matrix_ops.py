"""Driver-side K×K matrix kernels for confident-learning estimation.

Everything here operates on tiny K×K NumPy arrays collected from
distributed aggregations; none of it touches row-level data.  Semantics
follow the reference (cleanlab v2.9.0) exactly — citations per function —
but the code is written fresh for this engine.
"""

from __future__ import annotations

import numpy as np

from ..constants import CLIPPING_LOWER_BOUND, TINY_VALUE


def round_preserving_sum(values: np.ndarray) -> np.ndarray:
    """Largest-remainder integer rounding that preserves the (rounded) total.

    Semantics of /root/reference/cleanlab/internal/util.py:194-230: start
    from elementwise ``round``, then repeatedly bump the entries whose
    fractional residual most favours the needed direction until the
    integer total matches ``round(sum(values))``.
    """
    vals = np.asarray(values, dtype=float)
    out = vals.round()
    target = np.sum(vals).round()
    while abs(np.sum(out).round() - target) > 1e-6:
        gap = np.round(target - np.sum(out).round())
        step = 1 if gap > 0 else -1
        n_changes = min(int(abs(gap)), vals.size)
        # residual = how much each entry was rounded *down*; bump the most
        # under-rounded entries first when stepping up (and vice versa).
        # Ties broken by lower index (deterministic total order; the
        # reference leaves tie order unspecified — unstable argsort).
        residual = vals - out
        idx = np.arange(vals.size)
        order = np.lexsort((idx, -step * residual))[:n_changes]
        out[order] += step
    return out.astype(int)


def round_preserving_row_totals(mat: np.ndarray) -> np.ndarray:
    """Row-wise :func:`round_preserving_sum` (util.py:231-248)."""
    return np.stack([round_preserving_sum(row) for row in np.asarray(mat, dtype=float)]).astype(int)


def calibrate_confident_joint(cj: np.ndarray, label_counts: np.ndarray) -> np.ndarray:
    """Calibrate the raw confident joint so row sums match the noisy-label
    prior and the grand total matches N (count.py:221-291).

    ``label_counts[k]`` = number of rows with noisy label k (zero-filled
    for missing classes).
    """
    cj = np.asarray(cj, dtype=float)
    label_counts = np.asarray(label_counts, dtype=float)
    row_sums = np.clip(cj.sum(axis=1), TINY_VALUE, None)
    scaled = (cj.T / row_sums * label_counts).T
    total = np.clip(scaled.sum(), TINY_VALUE, None)
    scaled = scaled / total * label_counts.sum()
    return round_preserving_row_totals(scaled)


def estimate_joint_from_cj(calibrated_cj: np.ndarray) -> np.ndarray:
    """Normalise a calibrated confident joint into a probability matrix
    summing to 1 (count.py:329-399 tail)."""
    cj = np.asarray(calibrated_cj, dtype=float)
    return cj / np.clip(cj.sum(), TINY_VALUE, None)


def clip_noise_rates(noise_matrix: np.ndarray) -> np.ndarray:
    """Clip off-diagonal noise rates of a column-stochastic K×K matrix to
    [0, 0.9999], keep diagonal entries untouched, then renormalise every
    column to sum to 1 (internal/util.py:49-75 semantics)."""
    nm = np.asarray(noise_matrix, dtype=float)
    diagonal = np.diagonal(nm)
    nm = np.clip(nm, 0.0, 0.9999)
    np.fill_diagonal(nm, diagonal)
    return nm / np.clip(nm.sum(axis=0), TINY_VALUE, None)


def clip_values(vec: np.ndarray, low: float, high: float, new_sum: float | None = None) -> np.ndarray:
    """Clip a vector elementwise, then rescale so it sums to ``new_sum``
    (or to the pre-clip total when ``new_sum`` is None) —
    internal/util.py:78-110."""
    v = np.asarray(vec, dtype=float)
    target = v.sum() if new_sum is None else new_sum
    v = np.clip(v, low, high)
    return v * (target / np.clip(v.sum(), TINY_VALUE, None))


def compute_py(
    ps: np.ndarray,
    noise_matrix: np.ndarray,
    inv_noise_matrix: np.ndarray,
    py_method: str = "cnt",
    true_labels_class_counts: np.ndarray | None = None,
) -> np.ndarray:
    """Latent class prior p(y) (internal/latent_algebra.py:176-256).

    * ``cnt``       — ratio of confident-count marginals times ps (robust default)
    * ``eqn``       — linear-system solve ``inv(noise_matrix) @ ps``
    * ``marginal``  — confident-count column marginal / total
    * ``marginal_ps`` — ``inv_noise_matrix @ ps``
    """
    ps = np.asarray(ps, dtype=float)
    if py_method == "cnt":
        # diagonal trick: py_k ~ ps_k * inv[k,k] / nm[k,k]
        py = inv_noise_matrix.diagonal() / np.clip(noise_matrix.diagonal(), TINY_VALUE, None) * ps
    elif py_method == "eqn":
        py = np.linalg.inv(noise_matrix).dot(ps)
    elif py_method == "marginal":
        if true_labels_class_counts is None:
            raise ValueError("marginal py_method needs true_labels_class_counts")
        tc = np.asarray(true_labels_class_counts, dtype=float)
        py = tc / np.clip(tc.sum(), TINY_VALUE, None)
    elif py_method == "marginal_ps":
        py = np.dot(inv_noise_matrix, ps)
    else:
        raise ValueError(f"unknown py_method {py_method!r}")
    py = clip_values(py, low=CLIPPING_LOWER_BOUND, high=1.0, new_sum=1.0)
    return py


def compute_inv_noise_matrix(
    py: np.ndarray, noise_matrix: np.ndarray, ps: np.ndarray | None = None
) -> np.ndarray:
    """Bayes-rule inverse noise matrix P(true=y|noisy=s) from the latent
    prior and the forward noise matrix (internal/latent_algebra.py:66-113):
    ``joint = nm * py; inv = joint.T / ps`` then off-diagonal clip."""
    joint = np.asarray(noise_matrix, dtype=float) * np.asarray(py, dtype=float)
    ps = joint.sum(axis=1) if ps is None else np.asarray(ps, dtype=float)
    inv = joint.T / np.clip(ps, TINY_VALUE, None)
    return clip_noise_rates(inv)


def compute_noise_matrix_from_inverse(
    ps: np.ndarray, inv_noise_matrix: np.ndarray, py: np.ndarray | None = None
) -> np.ndarray:
    """Forward noise matrix P(noisy=s|true=y) from the inverse matrix
    (internal/latent_algebra.py:116-173): ``joint = (inv * ps).T;
    nm = joint / py`` then off-diagonal clip."""
    joint = (np.asarray(inv_noise_matrix, dtype=float) * np.asarray(ps, dtype=float)).T
    py = joint.sum(axis=0) if py is None else np.asarray(py, dtype=float)
    nm = joint / np.clip(py, TINY_VALUE, None)
    return clip_noise_rates(nm)


def compute_py_inv_noise_matrix(
    ps: np.ndarray, noise_matrix: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Solve ``py = inv(nm) @ ps`` (clipped to a valid prior) and derive the
    inverse noise matrix (internal/latent_algebra.py:39-63)."""
    ps = np.asarray(ps, dtype=float)
    py = np.linalg.inv(np.asarray(noise_matrix, dtype=float)).dot(ps)
    py = clip_values(py, low=CLIPPING_LOWER_BOUND, high=1.0, new_sum=1.0)
    return py, compute_inv_noise_matrix(py, noise_matrix, ps)


def compute_ps_py_inv_noise_matrix(
    label_counts: np.ndarray, noise_matrix: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(ps, py, inv_noise_matrix) from distributed per-class label counts
    (internal/latent_algebra.py:18-36; `labels` replaced by the counts a
    ``groupBy(label).count()`` already produced)."""
    label_counts = np.asarray(label_counts, dtype=float)
    ps = label_counts / np.clip(label_counts.sum(), TINY_VALUE, None)
    py, inv = compute_py_inv_noise_matrix(ps, noise_matrix)
    return ps, py, inv


def converge_estimates(
    ps: np.ndarray,
    py: np.ndarray,
    noise_matrix: np.ndarray,
    inv_noise_matrix: np.ndarray,
    inv_noise_matrix_iterations: int = 5,
    noise_matrix_iterations: int = 3,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Alternating fixed-point pass making (py, nm, inv) mutually consistent
    (count.py:1331-1404): 5 inner (inv, py) updates per each of 3 outer
    noise-matrix updates."""
    for _ in range(noise_matrix_iterations):
        for _ in range(inv_noise_matrix_iterations):
            inv_noise_matrix = compute_inv_noise_matrix(py, noise_matrix, ps)
            py = compute_py(ps, noise_matrix, inv_noise_matrix)
        noise_matrix = compute_noise_matrix_from_inverse(ps, inv_noise_matrix, py)
    return py, noise_matrix, inv_noise_matrix


def compute_pyx_multiplier(
    noise_matrix: np.ndarray, inv_noise_matrix: np.ndarray
) -> np.ndarray:
    """Per-class multiplier ``inv.diag / nm.diag`` used by the per-row
    posterior correction P(true=k|x) (internal/latent_algebra.py:259-312).
    The row-level ``clip + renormalise`` happens in Spark (scores.pyx_posterior)."""
    return np.asarray(inv_noise_matrix, dtype=float).diagonal() / np.clip(
        np.asarray(noise_matrix, dtype=float).diagonal(), TINY_VALUE, None
    )


def remove_noise_from_class(noise_matrix: np.ndarray, class_without_noise: int) -> np.ndarray:
    """PU-learning helper (internal/util.py:15-46): zero the row
    P(noisy=cwn | true≠cwn), then raise every diagonal entry so each column
    sums to 1 again."""
    x = np.array(noise_matrix, dtype=float)
    k_all = np.arange(len(x))
    x[class_without_noise, k_all[k_all != class_without_noise]] = 0.0
    np.fill_diagonal(x, 1.0 - (x.sum(axis=0) - np.diag(x)))
    return x


def estimate_latent(
    cj: np.ndarray,
    label_counts: np.ndarray,
    py_method: str = "cnt",
    converge_latent_estimates: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(py, noise_matrix, inv_noise_matrix) from a confident joint
    (count.py:715-796)."""
    cj = np.asarray(cj, dtype=float)
    label_counts = np.asarray(label_counts, dtype=float)
    n = label_counts.sum()
    ps = label_counts / max(n, 1.0)
    noisy_counts = cj.sum(axis=1)
    true_counts = cj.sum(axis=0)
    noise_matrix = cj / np.clip(true_counts, TINY_VALUE, None)
    inv_noise_matrix = cj.T / np.clip(noisy_counts, TINY_VALUE, None)
    py = compute_py(ps, noise_matrix, inv_noise_matrix, py_method, true_counts)
    noise_matrix = clip_noise_rates(noise_matrix)
    inv_noise_matrix = clip_noise_rates(inv_noise_matrix)
    if converge_latent_estimates:
        py, noise_matrix, inv_noise_matrix = converge_estimates(
            ps, py, noise_matrix, inv_noise_matrix
        )
        # count.py:792-794 re-clips with the looser 1e-5 bound after converging
        py = clip_values(py, low=1e-5, high=1.0, new_sum=1.0)
        noise_matrix = clip_noise_rates(noise_matrix)
        inv_noise_matrix = clip_noise_rates(inv_noise_matrix)
    return py, noise_matrix, inv_noise_matrix


def keep_at_least_n_per_class(prune_count_matrix: np.ndarray, n: int, frac_noise: float = 1.0) -> np.ndarray:
    """Adjust the (transposed-cj) prune-count matrix so each class keeps at
    least ``n`` examples, optionally scaling off-diagonal noise by
    ``frac_noise`` (filter.py:539-604 + _reduce_prune_counts :607-635)."""
    pcm = np.asarray(prune_count_matrix, dtype=float)
    diag = np.diagonal(pcm)
    new_diag = np.maximum(diag, n)
    bump = new_diag - diag
    nonzero_off = np.maximum(np.count_nonzero(pcm, axis=0) - 1.0, 1.0)
    adjusted = pcm - bump / nonzero_off
    adjusted[adjusted < 0] = 0
    np.fill_diagonal(adjusted, new_diag)

    # frac_noise: shrink off-diagonals, return the shrunk mass to the diagonal
    scaled = adjusted * frac_noise
    np.fill_diagonal(scaled, adjusted.diagonal())
    np.fill_diagonal(scaled, adjusted.diagonal() + np.sum(adjusted - scaled, axis=0))
    scaled = scaled.astype(int)

    return round_preserving_row_totals(scaled).astype(int)


def rank_classes_by_label_quality(joint: np.ndarray, num_examples: int) -> list[dict]:
    """Per-class quality summary (dataset.py:16-108): label issues,
    inverse issues, label noise and quality score, sorted worst-first."""
    j = np.asarray(joint, dtype=float)
    rows = []
    for k in range(j.shape[0]):
        row_sum = j[k, :].sum()
        col_sum = j[:, k].sum()
        noise = 1.0 - (j[k, k] / row_sum if row_sum > 0 else 0.0)
        rows.append(
            {
                "class_index": k,
                "num_label_issues": int(round((row_sum - j[k, k]) * num_examples)),
                "num_inverse_issues": int(round((col_sum - j[k, k]) * num_examples)),
                "label_noise": noise,
                "label_quality_score": 1.0 - noise,
            }
        )
    rows.sort(key=lambda r: r["label_quality_score"])
    return rows


def find_overlapping_classes(joint: np.ndarray, num_examples: int) -> list[dict]:
    """Symmetrised off-diagonal mass per class pair, sorted desc
    (dataset.py:111-283)."""
    j = np.asarray(joint, dtype=float)
    k = j.shape[0]
    out = []
    for a in range(k):
        for b in range(a + 1, k):
            p = j[a, b] + j[b, a]
            out.append(
                {
                    "class_a": a,
                    "class_b": b,
                    "num_overlapping_examples": int(round(p * num_examples)),
                    "joint_probability": p,
                }
            )
    out.sort(key=lambda r: -r["joint_probability"])
    return out


def overall_label_health_score(joint: np.ndarray) -> float:
    """1 - off-diagonal mass = trace of the joint (dataset.py:286-358)."""
    return float(np.trace(np.asarray(joint, dtype=float)))
