"""Driver-side K×K matrix kernels for confident-learning estimation.

Everything here operates on tiny K×K NumPy arrays collected from
distributed aggregations; none of it touches row-level data.  Semantics
follow the reference (cleanlab v2.9.0) exactly — citations per function —
but the code is written fresh for this engine.
"""

from __future__ import annotations

import numpy as np

from ..constants import TINY_VALUE


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
    """Clip a K×K column-stochastic matrix into valid probability range,
    preserving column sums (internal/util.py:49-75 semantics).

    Diagonal entries are clipped to [1e-5, 1.0], off-diagonal to [0, 0.9999],
    then each column is rescaled to keep its original total.
    """
    nm = np.asarray(noise_matrix, dtype=float).copy()

    def _clip_column(col: np.ndarray, diag_idx: int) -> np.ndarray:
        total = col.sum()
        clipped = col.copy()
        off = np.ones(len(col), dtype=bool)
        off[diag_idx] = False
        clipped[off] = np.clip(clipped[off], 0.0, 0.9999)
        clipped[diag_idx] = np.clip(clipped[diag_idx], 1e-5, 1.0)
        new_total = clipped.sum()
        if new_total > 0 and total > 0:
            clipped = clipped * (total / new_total)
        return clipped

    for k in range(nm.shape[1]):
        nm[:, k] = _clip_column(nm[:, k], k)
    return nm


def clip_values(vec: np.ndarray, low: float, high: float, new_sum: float | None = None) -> np.ndarray:
    """Clip a vector elementwise then rescale to ``new_sum``
    (internal/util.py:78-110)."""
    v = np.clip(np.asarray(vec, dtype=float), low, high)
    if new_sum is not None and v.sum() > 0:
        v = v * (new_sum / v.sum())
    return v


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
    * ``marginal_ps`` — alias of marginal computed against ps normalisation
    """
    ps = np.asarray(ps, dtype=float)
    if py_method == "cnt":
        # diagonal trick: py_k ~ ps_k * inv[k,k] / nm[k,k]
        py = inv_noise_matrix.diagonal() / np.clip(noise_matrix.diagonal(), TINY_VALUE, None) * ps
    elif py_method == "eqn":
        py = np.linalg.lstsq(noise_matrix, ps, rcond=None)[0]
    elif py_method in ("marginal", "marginal_ps"):
        if true_labels_class_counts is None:
            raise ValueError("marginal py_method needs true_labels_class_counts")
        tc = np.asarray(true_labels_class_counts, dtype=float)
        py = tc / np.clip(tc.sum(), TINY_VALUE, None)
    else:
        raise ValueError(f"unknown py_method {py_method!r}")
    py = clip_values(py, low=1e-5, high=1.0, new_sum=1.0)
    return py


def estimate_latent(
    cj: np.ndarray, label_counts: np.ndarray, py_method: str = "cnt"
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
    return py, clip_noise_rates(noise_matrix), clip_noise_rates(inv_noise_matrix)


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
