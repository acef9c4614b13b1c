"""Multi-annotator consensus — distributed re-expression of
cleanlab/multiannotator.py.

Input is the long format (example_id, annotator_id, label); the wide
(N, M) matrix of the reference maps to a pivot
(`convert_long_to_wide_dataset`, multiannotator.py:1063).

* :func:`majority_vote_label` — mode per example with the reference's
  tie-break chain (multiannotator.py:897-1010): highest pred_prob among
  tied classes → *lowest* empirical class frequency → smallest class id
  (deterministic stand-in for the reference's final random pick).
* :func:`annotator_stats` — per-annotator agreement with consensus
  (the quality proxy of get_label_quality_multiannotator's
  annotator_stats table).
* :func:`consensus_quality` — CROWDLAB-lite per-example score: agreement
  fraction × model self-confidence of the consensus label.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def convert_long_to_wide(long_df: DataFrame) -> DataFrame:
    """(example_id, annotator_id, label) → one row per example with a
    map annotator→label (Spark analog of the reference's wide frame)."""
    return long_df.groupBy("example_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("annotator_id", "label"))
        ).alias("annotator_labels")
    )


def majority_vote_label(
    long_df: DataFrame, probs_df: DataFrame | None = None, probs_col: str = "pred_probs"
) -> DataFrame:
    """Consensus label per example_id.

    One groupBy((example, label)) + one window — no driver-side state
    except nothing at all; class frequencies ride along via a broadcast
    join of the K-row frequency table.
    """
    votes = long_df.groupBy("example_id", "label").agg(F.count(F.lit(1)).alias("n_votes"))
    freqs = long_df.groupBy("label").agg(F.count(F.lit(1)).alias("class_freq"))
    cand = votes.join(F.broadcast(freqs), "label", "left")
    if probs_df is not None:
        probs = probs_df.select(
            "example_id", F.col(probs_col).alias("_probs")
        )
        cand = cand.join(probs, "example_id", "left").withColumn(
            "_p_label", F.element_at("_probs", F.col("label").cast("int") + 1)
        )
    else:
        cand = cand.withColumn("_p_label", F.lit(0.0))
    w = Window.partitionBy("example_id").orderBy(
        F.col("n_votes").desc(),
        F.col("_p_label").desc(),
        F.col("class_freq").asc(),
        F.col("label").asc(),
    )
    return (
        cand.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("example_id", F.col("label").alias("consensus_label"), "n_votes")
    )


def annotator_stats(long_df: DataFrame, consensus: DataFrame) -> DataFrame:
    """Per-annotator: #labels given, agreement with consensus."""
    joined = long_df.join(consensus.select("example_id", "consensus_label"), "example_id")
    return (
        joined.groupBy("annotator_id")
        .agg(
            F.count(F.lit(1)).alias("num_labeled"),
            F.avg(
                F.when(F.col("label") == F.col("consensus_label"), 1.0).otherwise(0.0)
            ).alias("agreement"),
        )
        .withColumn("annotator_quality", F.col("agreement"))
    )


def consensus_quality(
    long_df: DataFrame, probs_df: DataFrame, probs_col: str = "pred_probs"
) -> DataFrame:
    """Per-example consensus quality: agreement fraction × model
    self-confidence of the consensus label (CROWDLAB-lite; the full
    CROWDLAB ensemble of multiannotator.py:46-348 refines the same two
    signals)."""
    consensus = majority_vote_label(long_df, probs_df, probs_col)
    totals = long_df.groupBy("example_id").agg(F.count(F.lit(1)).alias("n_annotations"))
    probs = probs_df.select("example_id", F.col(probs_col).alias("_probs"))
    return (
        consensus.join(totals, "example_id")
        .join(probs, "example_id")
        .select(
            "example_id",
            "consensus_label",
            (F.col("n_votes").cast("double") / F.col("n_annotations")).alias("agreement"),
            F.element_at("_probs", F.col("consensus_label").cast("int") + 1).alias(
                "model_confidence"
            ),
        )
        .withColumn(
            "consensus_quality_score", F.col("agreement") * F.col("model_confidence")
        )
    )
