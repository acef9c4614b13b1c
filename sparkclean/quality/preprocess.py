"""Input formatting helpers (internal/util.py analogs)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def format_labels(
    df: DataFrame, label_col: str, out_col: str = "label_id"
) -> tuple[DataFrame, dict[int, str]]:
    """Map arbitrary (e.g. string) labels to 0..K-1 by lexicographic
    order (internal/util.py:563-585).  Returns (df + int column,
    inverse mapping k → original label).

    The distinct-label collect is K rows; the mapping is applied as a
    broadcast-by-value when-chain, so no join or shuffle is added.
    """
    uniques = sorted(
        r[0] for r in df.select(label_col).distinct().collect() if r[0] is not None
    )
    mapping = {i: lab for i, lab in enumerate(uniques)}
    expr: Column = F.lit(None).cast("int")
    for i, lab in reversed(list(enumerate(uniques))):
        expr = F.when(F.col(label_col) == F.lit(lab), F.lit(i)).otherwise(expr)
    return df.withColumn(out_col, expr), mapping


def log_loss_per_model(
    df: DataFrame, label_col: str, probs_cols: list[str], clip: float = 1e-6
) -> list[float]:
    """-avg(ln p̂[label]) per model with lower-clip + row renormalisation
    (rank.py:258-291's preprocessing)."""
    aggs = []
    for c in probs_cols:
        clipped = F.transform(F.col(c), lambda x: F.greatest(x.cast("double"), F.lit(clip)))
        total = F.aggregate(clipped, F.lit(0.0), lambda a, x: a + x)
        p_label = F.element_at(clipped, F.col(label_col).cast("int") + 1) / total
        aggs.append(F.avg(-F.log(p_label)).alias(c))
    row = df.agg(*aggs).collect()[0]
    return [float(row[c]) for c in probs_cols]


def log_loss_search_weights(
    df: DataFrame,
    label_col: str,
    probs_cols: list[str],
    t_values: tuple[float, ...] = (1.0, 10.0, 100.0),
    clip: float = 1e-6,
) -> list[float]:
    """rank.py log_loss_search: for each temperature t, weight models by
    exp(-t·LL_m) (normalised), evaluate the log loss of the weighted
    average pred_probs, keep the best t's weights."""
    import math

    lls = log_loss_per_model(df, label_col, probs_cols, clip)
    # every temperature's weighted-average log loss is an independent
    # column expression — evaluate ALL of them in ONE aggregation pass
    # instead of one full scan per temperature (round-3 review)
    per_t_weights: list[list[float]] = []
    aggs = []
    for ti, t in enumerate(t_values):
        ws = [math.exp(-t * ll) for ll in lls]
        s = sum(ws)
        ws = [w / s for w in ws]
        per_t_weights.append(ws)

        # bind w through a factory, NOT a defaulted lambda parameter:
        # pyspark counts defaulted params, so `lambda x, _w=w:` is seen
        # as the (element, index) signature and _w receives the INDEX
        def _scaled(col_name: str, w: float):
            return F.transform(
                F.col(col_name), lambda x: x.cast("double") * F.lit(w)
            )

        avg_probs = None
        for w, c in zip(ws, probs_cols):
            term = _scaled(c, w)
            avg_probs = term if avg_probs is None else F.zip_with(avg_probs, term, lambda a, b: a + b)
        p_label = F.element_at(avg_probs, F.col(label_col).cast("int") + 1)
        aggs.append(F.avg(-F.log(F.greatest(p_label, F.lit(clip)))).alias(f"_ev{ti}"))
    row = df.agg(*aggs).collect()[0]
    best_weights, best_eval = None, float("inf")
    for ti in range(len(t_values)):
        ev = float(row[f"_ev{ti}"])
        if ev < best_eval:
            best_eval, best_weights = ev, per_t_weights[ti]
    return best_weights
