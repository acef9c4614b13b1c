"""Driver contract: entry / queries / oracle_sql.

Each ``queries()`` entry exercises a sparkclean operator over the
driver-provided parquet tables; ``oracle_sql()`` holds the DuckDB twin
built from the same SQL generators the modules ship (sparkclean.*_sql),
so Spark and oracle cannot drift.  Columns are aliased identically on
both sides; floats rounded to 6dp at the output boundary only.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkclean import pipeline as pl
from sparkclean.constants import CONFIDENT_THRESHOLDS_LOWER_BOUND as T_LOWER
from sparkclean.constants import FLOATING_POINT_COMPARISON as FPC
from sparkclean.dedup import exact as dedup_exact
from sparkclean.dedup import minhash as dedup_minhash
from sparkclean.dedup import simhash as dedup_simhash
from sparkclean.quality import issues as q_issues
from sparkclean.quality import scores as q_scores
from sparkclean.quality import thresholds as q_thresholds
from sparkclean.quality.joint import with_confident_bins
from sparkclean.sim import knn as sim_knn
from sparkclean.text import langid as t_langid
from sparkclean.text import ppl as t_ppl
from sparkclean.text import rules as t_rules
from sparkclean.text import scrub as t_scrub
from sparkclean.text import tokenize as t_tok

K = 10  # embeddings table: label in 0..9, pred_probs derived K=10


# ------------------------------------------------------------ helpers

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _with_probs(df: DataFrame, lo: int = 1) -> DataFrame:
    """Derive K=10 pred_probs from embedding dims [lo, lo+K) via
    softmax(4x) — deterministic, same formula as the SQL oracle."""
    e = F.transform(
        F.slice(F.col("embedding"), lo, K), lambda x: F.exp(x.cast("double") * F.lit(4.0))
    )
    df = df.withColumn("_e", e)
    total = F.aggregate(F.col("_e"), F.lit(0.0), lambda a, x: a + x)
    return df.withColumn("pred_probs", F.transform(F.col("_e"), lambda x: x / total)).drop("_e")


_PROBS_CTE = """
ev{sfx} AS (
  SELECT vec_id, label,
         list_transform(embedding[{lo}:{hi}], x -> exp(x::DOUBLE * 4.0)) AS e
  FROM embeddings
), pp{sfx} AS (
  SELECT vec_id, label,
         list_transform(e, v -> v / list_aggregate(e, 'sum')) AS p
  FROM ev{sfx}
)"""


def _probs_cte(lo: int = 1, sfx: str = "") -> str:
    return _PROBS_CTE.format(lo=lo, hi=lo + K - 1, sfx=sfx)


_ENT_SQL = (
    "(-(list_aggregate(list_transform(p, x -> CASE WHEN x > 0 THEN x * ln(x) "
    "ELSE 0.0 END), 'sum')) / ln(10))"
)

# thresholds CTE: per-class mean self-confidence, missing → 2.0, clip 2e-6
_TH_CTE = f"""
sc AS (SELECT vec_id, label, p, p[label + 1] AS self_conf FROM pp),
th0 AS (SELECT label AS k, greatest(avg(self_conf), {T_LOWER}) AS t FROM sc GROUP BY label),
tv AS (
  SELECT list(coalesce(th0.t, 2.0::DOUBLE) ORDER BY r.k) AS tvec
  FROM range(0, {K}) r(k) LEFT JOIN th0 ON th0.k = r.k
)"""

# confident-bin CTE (needs pp + tv): guess + n_conf per row
_BIN_CTE = f"""
binned AS (
  SELECT s.vec_id, s.label, s.p, s.self_conf,
         list_transform(range(1, {K + 1}), i -> s.p[i] >= t.tvec[i] - {FPC}) AS bins
  FROM sc s CROSS JOIN tv t
), guessed AS (
  SELECT vec_id, label, p, self_conf,
         len(list_filter(bins, b -> b)) AS n_conf,
         CASE WHEN len(list_filter(bins, b -> b)) > 1
              THEN list_position(p, list_max(p)) - 1
              ELSE list_position(bins, true) - 1 END AS guess,
         list_transform(range(1, {K + 1}),
             i -> p[i] + CASE WHEN i = label + 1 THEN {FPC} ELSE 0.0 END) AS bp
  FROM binned
)"""

# boosted argmax; requires a `bp` column in scope (see _BIN_CTE / _BP_CTE)
_BOOST_SQL = "(list_position(bp, list_max(bp)) - 1)"

_BP_CTE = f"""
ppb AS (
  SELECT vec_id, label, p,
         list_transform(range(1, {K + 1}),
             i -> p[i] + CASE WHEN i = label + 1 THEN {FPC} ELSE 0.0 END) AS bp
  FROM pp
)"""


# ------------------------------------------------------------- queries

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full caption-quality pipeline on sf0.001 documents."""
    docs = _docs(spark, "/root/testdata/sf0.001")
    return pl.run_caption_quality(docs, id_col="doc_id", text_col="text")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # ---- cleanlab-core scores over embeddings
    def self_confidence_scores(spark, sf):
        df = _with_probs(_emb(spark, sf))
        return df.select(
            "vec_id",
            F.round(q_scores.self_confidence(F.col("label"), F.col("pred_probs")), 6).alias(
                "score"
            ),
        )

    def normalized_margin_scores(spark, sf):
        df = _with_probs(_emb(spark, sf))
        return df.select(
            "vec_id",
            F.round(q_scores.normalized_margin(F.col("label"), F.col("pred_probs")), 6).alias(
                "score"
            ),
        )

    def cwe_scores(spark, sf):
        df = _with_probs(_emb(spark, sf))
        return df.select(
            "vec_id",
            F.round(
                q_scores.confidence_weighted_entropy(F.col("label"), F.col("pred_probs"), K), 6
            ).alias("score"),
        )

    def entropy_scores(spark, sf):
        df = _with_probs(_emb(spark, sf))
        return df.select(
            "vec_id",
            F.round(q_scores.normalized_entropy(F.col("pred_probs"), K), 6).alias("score"),
        )

    def confident_thresholds(spark, sf):
        df = _with_probs(_emb(spark, sf))
        t = q_thresholds.get_confident_thresholds(df, K)
        return spark.createDataFrame(
            [(k, round(v, 6)) for k, v in enumerate(t)], "k: int, threshold: double"
        )

    def confident_joint_raw(spark, sf):
        df = _with_probs(_emb(spark, sf))
        t = q_thresholds.get_confident_thresholds(df, K)
        binned = with_confident_bins(df, t)
        return (
            binned.where(F.col("is_confident"))
            .groupBy(
                F.col("label").cast("int").alias("given_label"),
                F.col("true_label_guess").alias("true_label_guess"),
            )
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def num_label_issues_q(spark, sf):
        df = _with_probs(_emb(spark, sf))
        n = q_issues.num_label_issues(df, K)
        return spark.createDataFrame([(n,)], "n_issues: long")

    def issues_low_self_confidence(spark, sf):
        df = _with_probs(_emb(spark, sf))
        out = q_issues.find_label_issues(
            df, K, id_col="vec_id", filter_by="low_self_confidence"
        )
        return out.select("vec_id", "is_label_issue")

    def issues_predicted_neq_given(spark, sf):
        df = _with_probs(_emb(spark, sf))
        out = q_issues.find_label_issues(
            df, K, id_col="vec_id", filter_by="predicted_neq_given"
        )
        return out.select("vec_id", "is_label_issue")

    def issues_confident_learning(spark, sf):
        df = _with_probs(_emb(spark, sf))
        out = q_issues.find_label_issues(
            df, K, id_col="vec_id", filter_by="confident_learning"
        )
        return out.select("vec_id", "is_label_issue")

    def class_imbalance(spark, sf):
        df = _emb(spark, sf)
        total = df.count()
        counts = df.groupBy(F.col("label").cast("int").alias("label")).agg(
            F.count(F.lit(1)).alias("n")
        )
        return counts.select(
            "label",
            "n",
            F.round(F.col("n").cast("double") / F.lit(float(total)), 6).alias("prior"),
            (F.col("n").cast("double") / F.lit(float(total)) < F.lit(0.1 / K)).alias(
                "is_imbalance_issue"
            ),
        )

    def ood_entropy(spark, sf):
        df = _with_probs(_emb(spark, sf))
        from sparkclean.quality.ood import ood_entropy_score

        return df.select(
            "vec_id", F.round(ood_entropy_score(F.col("pred_probs"), K), 6).alias("score")
        )

    def ood_least_confidence(spark, sf):
        df = _with_probs(_emb(spark, sf))
        from sparkclean.quality.ood import ood_least_confidence_score

        return df.select(
            "vec_id", F.round(ood_least_confidence_score(F.col("pred_probs")), 6).alias("score")
        )

    def ood_gen(spark, sf):
        df = _with_probs(_emb(spark, sf))
        from sparkclean.quality.ood import ood_gen_score

        return df.select(
            "vec_id", F.round(ood_gen_score(F.col("pred_probs"), K), 6).alias("score")
        )

    def ensemble_label_quality(spark, sf):
        a = _with_probs(_emb(spark, sf), lo=1).withColumnRenamed("pred_probs", "_pa")
        b = _with_probs(a, lo=11).withColumnRenamed("pred_probs", "_pb")
        sc_a = q_scores.self_confidence(F.col("label"), F.col("_pa"))
        sc_b = q_scores.self_confidence(F.col("label"), F.col("_pb"))
        return b.select(
            "vec_id", F.round((sc_a + sc_b) / F.lit(2.0), 6).alias("score")
        )

    # ---- text operators over documents
    def text_quality_features(spark, sf):
        out = t_rules.with_quality_features(
            _docs(spark, sf).select("doc_id", "text"), "text"
        )
        return out.select(
            "doc_id",
            "n_chars",
            "n_words",
            F.round("digit_ratio", 6).alias("digit_ratio"),
            F.round("alpha_ratio", 6).alias("alpha_ratio"),
            F.round("punct_ratio", 6).alias("punct_ratio"),
            F.round("upper_ratio", 6).alias("upper_ratio"),
            F.round("repetition_ratio", 6).alias("repetition_ratio"),
            F.round("stopword_ratio", 6).alias("stopword_ratio"),
        )

    def langid_markers(spark, sf):
        return _docs(spark, sf).select(
            "doc_id", t_langid.langid_markers_col(F.col("text")).alias("pred_lang")
        )

    def perplexity(spark, sf):
        return _docs(spark, sf).select(
            "doc_id", F.round(t_ppl.ppl_hash_col(F.col("text")), 6).alias("ppl")
        )

    def token_stats(spark, sf):
        return _docs(spark, sf).select(
            "doc_id",
            t_tok.ws_token_count_col(F.col("text")).alias("ws_tokens"),
            t_tok.bpe_token_count_col(F.col("text")).alias("bpe_tokens"),
            t_tok.fingerprint_col(F.col("text")).alias("fingerprint"),
        )

    def scrub_text(spark, sf):
        return _docs(spark, sf).select(
            "doc_id", t_scrub.scrub_col(F.col("text")).alias("scrubbed")
        )

    def exact_duplicates(spark, sf):
        return dedup_exact.exact_duplicates(_docs(spark, sf), "text", "doc_id")

    def minhash_near_duplicates(spark, sf):
        return dedup_minhash.near_duplicate_pairs(_docs(spark, sf), "text", "doc_id", 0.8)

    def simhash_fingerprints(spark, sf):
        return _docs(spark, sf).select(
            "doc_id", dedup_simhash.simhash_col(F.col("text")).alias("simhash")
        )

    def caption_quality_pipeline(spark, sf):
        return pl.run_caption_quality(_docs(spark, sf), id_col="doc_id", text_col="text")

    # ---- similarity search over embeddings
    def knn_bruteforce(spark, sf):
        df = _emb(spark, sf)
        return sim_knn.cosine_topk(df, df.where(F.col("vec_id") < 20), k=5)

    def embedding_near_duplicates(spark, sf):
        return sim_knn.embedding_near_duplicates(_emb(spark, sf), threshold=0.9)

    # ---- events rollup
    def events_hourly(spark, sf):
        return (
            _events(spark, sf)
            .groupBy(
                F.date_trunc("hour", F.col("ts")).alias("hour"),
                F.col("event_type"),
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.avg("value"), 6).alias("avg_value"),
            )
        )

    q.update(
        self_confidence_scores=self_confidence_scores,
        normalized_margin_scores=normalized_margin_scores,
        cwe_scores=cwe_scores,
        entropy_scores=entropy_scores,
        confident_thresholds=confident_thresholds,
        confident_joint_raw=confident_joint_raw,
        num_label_issues=num_label_issues_q,
        issues_low_self_confidence=issues_low_self_confidence,
        issues_predicted_neq_given=issues_predicted_neq_given,
        issues_confident_learning=issues_confident_learning,
        class_imbalance=class_imbalance,
        ood_entropy=ood_entropy,
        ood_least_confidence=ood_least_confidence,
        ood_gen=ood_gen,
        ensemble_label_quality=ensemble_label_quality,
        text_quality_features=text_quality_features,
        langid_markers=langid_markers,
        perplexity=perplexity,
        token_stats=token_stats,
        scrub_text=scrub_text,
        exact_duplicates=exact_duplicates,
        minhash_near_duplicates=minhash_near_duplicates,
        simhash_fingerprints=simhash_fingerprints,
        caption_quality_pipeline=caption_quality_pipeline,
        knn_bruteforce=knn_bruteforce,
        embedding_near_duplicates=embedding_near_duplicates,
        events_hourly=events_hourly,
    )
    return q


# ---------------------------------------------------------- oracle SQL

def oracle_sql() -> dict[str, str]:
    pc = _probs_cte()
    o: dict[str, str] = {}

    o["self_confidence_scores"] = (
        f"WITH {pc} SELECT vec_id, round(p[label + 1], 6) AS score FROM pp"
    )
    o["normalized_margin_scores"] = f"""
WITH {pc}
SELECT vec_id, round((p[label + 1] - list_max(list_transform(range(1, {K + 1}),
  i -> CASE WHEN i = label + 1 THEN -1.0 ELSE p[i] END)) + 1.0) / 2.0, 6) AS score
FROM pp"""
    o["cwe_scores"] = f"""
WITH {pc},
raw AS (
  SELECT vec_id, {_ENT_SQL} / greatest(p[label + 1], 1e-6) AS r FROM pp
)
SELECT vec_id, round(ln(r + 1.0) / greatest(r, 1e-6), 6) AS score FROM raw"""
    o["entropy_scores"] = f"WITH {pc} SELECT vec_id, round({_ENT_SQL}, 6) AS score FROM pp"
    o["confident_thresholds"] = f"""
WITH {pc},
sc AS (SELECT label, p[label + 1] AS self_conf FROM pp),
th0 AS (SELECT label AS k, greatest(avg(self_conf), {T_LOWER}) AS t FROM sc GROUP BY label)
SELECT r.k::INT AS k, round(coalesce(th0.t, 2.0::DOUBLE), 6) AS threshold
FROM range(0, {K}) r(k) LEFT JOIN th0 ON th0.k = r.k"""
    o["confident_joint_raw"] = f"""
WITH {pc}, {_TH_CTE}, {_BIN_CTE}
SELECT label AS given_label, guess::INT AS true_label_guess, count(*) AS n
FROM guessed WHERE n_conf >= 1 GROUP BY 1, 2"""
    o["num_label_issues"] = f"""
WITH {pc}, {_TH_CTE}, {_BIN_CTE}
SELECT count(*) FILTER (
  WHERE n_conf >= 1 AND guess <> label AND {_BOOST_SQL} <> label
) AS n_issues FROM guessed"""
    o["issues_low_self_confidence"] = f"""
WITH {pc}, {_TH_CTE}, {_BIN_CTE},
cnt AS (
  SELECT count(*) FILTER (
    WHERE n_conf >= 1 AND guess <> label AND {_BOOST_SQL} <> label
  ) AS n_issues FROM guessed
), ranked AS (
  SELECT vec_id, row_number() OVER (ORDER BY self_conf ASC, vec_id ASC) AS rn FROM sc
)
SELECT r.vec_id, (r.rn <= c.n_issues) AS is_label_issue FROM ranked r CROSS JOIN cnt c"""
    o["issues_predicted_neq_given"] = f"""
WITH {pc}, {_BP_CTE}
SELECT vec_id,
  (list_position(p, list_max(p)) - 1 <> label AND {_BOOST_SQL} <> label) AS is_label_issue
FROM ppb"""
    o["issues_confident_learning"] = f"""
WITH {pc}, {_TH_CTE}, {_BIN_CTE}
SELECT vec_id,
  (n_conf >= 1 AND guess <> label AND {_BOOST_SQL} <> label) AS is_label_issue
FROM guessed"""
    o["class_imbalance"] = f"""
WITH t AS (SELECT count(*)::DOUBLE AS total FROM embeddings)
SELECT label::INT AS label, count(*) AS n,
       round(count(*) / t.total, 6) AS prior,
       (count(*) / t.total < {0.1 / K}) AS is_imbalance_issue
FROM embeddings CROSS JOIN t GROUP BY label, t.total"""
    o["ood_entropy"] = f"WITH {pc} SELECT vec_id, round(1.0 - {_ENT_SQL}, 6) AS score FROM pp"
    o["ood_least_confidence"] = f"WITH {pc} SELECT vec_id, round(list_max(p), 6) AS score FROM pp"
    o["ood_gen"] = f"""
WITH {pc},
sm AS (
  SELECT vec_id,
    (SELECT list_transform(e2, v -> v / list_aggregate(e2, 'sum'))
     FROM (SELECT list_transform(p, x -> exp(x)) AS e2)) AS sp
  FROM pp
)
SELECT vec_id,
  round(1.0 - list_aggregate(list_transform(sp, x -> pow(x, 0.1) * pow(1.0 - x, 0.1)), 'sum') / 100.0, 6) AS score
FROM sm"""
    pc_b = _probs_cte(lo=11, sfx="2")
    o["ensemble_label_quality"] = f"""
WITH {pc}, {pc_b.lstrip()}
SELECT pp.vec_id, round((pp.p[pp.label + 1] + pp2.p[pp2.label + 1]) / 2.0, 6) AS score
FROM pp JOIN pp2 ON pp.vec_id = pp2.vec_id"""

    feats = t_rules.quality_features_sql_exprs("text")
    feat_sel = ", ".join(
        f"round({e}, 6) AS {k}" if k.endswith("_ratio") else f"{e} AS {k}"
        for k, e in feats.items()
    )
    o["text_quality_features"] = f"SELECT doc_id, {feat_sel} FROM documents"
    o["langid_markers"] = (
        f"SELECT doc_id, {t_langid.langid_markers_sql('text')} AS pred_lang FROM documents"
    )
    o["perplexity"] = f"SELECT doc_id, round({t_ppl.ppl_hash_sql('text')}, 6) AS ppl FROM documents"
    o["token_stats"] = f"""
SELECT doc_id, {t_tok.ws_token_count_sql('text')} AS ws_tokens,
       {t_tok.bpe_token_count_sql('text')} AS bpe_tokens,
       {t_tok.fingerprint_sql('text')} AS fingerprint
FROM documents"""
    o["scrub_text"] = f"SELECT doc_id, {t_scrub.scrub_sql('text')} AS scrubbed FROM documents"
    o["exact_duplicates"] = dedup_exact.exact_duplicates_sql("documents", "text", "doc_id")
    o["minhash_near_duplicates"] = dedup_minhash.near_duplicate_pairs_sql(
        "documents", "text", "doc_id", 0.8
    )
    o["simhash_fingerprints"] = (
        f"SELECT doc_id, {dedup_simhash.simhash_sql('text')} AS simhash FROM documents"
    )
    o["caption_quality_pipeline"] = pl.oracle_sql_for("documents", "doc_id", "text")
    o["knn_bruteforce"] = sim_knn.cosine_topk_sql("embeddings", "vec_id < 20", k=5)
    o["embedding_near_duplicates"] = sim_knn.embedding_near_duplicates_sql(
        "embeddings", threshold=0.9
    )
    o["events_hourly"] = """
SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
       round(avg(value), 6) AS avg_value
FROM events GROUP BY 1, 2"""
    return o
