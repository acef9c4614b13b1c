"""Count-min sketch: never-undercount property, exactness at large m,
twin agreement, and the no-join no-shuffle estimate plan."""

import duckdb
import numpy as np

from sparkclean.dedup import cms as CM
from sparkclean.text.shared import words_py

DOCS = [
    (0, "hot gram run hot gram run hot gram run cold tail words"),
    (1, "hot gram run appears here too plus other filler text"),
    (2, "totally unrelated content with zero repeated trigram anywhere"),
    (3, ""),
    (4, None),
]


def _true_counts(n=3):
    from collections import Counter

    c = Counter()
    for _, text in DOCS:
        w = words_py(text or "")
        for i in range(len(w) - n + 1):
            c[" ".join(w[i : i + n])] += 1
    return c


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id: long, text: string")


def test_estimates_never_undercount_and_exact_at_large_m(spark):
    df = _docs_df(spark)
    true = _true_counts()
    # m = 2^18 >> grams: no collisions, estimates are exact counts
    table = CM.build_cms(df, n=3, m_bits=18, k=3)
    assert int(table.sum()) == 3 * sum(true.values())
    import hashlib

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    gh = np.array([h60(g) for g in true], dtype=np.int64)
    est = CM.cms_estimate_np(gh, table, 18)
    for g, e in zip(true, est):
        assert e == true[g], g
    # tiny m = 2^6: collisions guaranteed, but never an undercount
    small = CM.build_cms(df, n=3, m_bits=6, k=2)
    est_small = CM.cms_estimate_np(gh, small, 6)
    assert (est_small >= est).all()


def test_doc_level_max_and_twin_agreement(spark):
    df = _docs_df(spark)
    got = {
        r["doc_id"]: (r["n_grams"], r["max_est_freq"])
        for r in CM.cms_gram_frequency(df, n=3, m_bits=18, k=3).collect()
    }
    assert len(got) == len(DOCS)
    # doc 0's hottest gram "hot gram run" appears 3x in doc 0 + 1x in doc 1
    assert got[0][1] == 4
    assert got[1][1] == 4  # shares the corpus-hot gram
    assert got[2][1] == 1
    assert got[3] == (0, 0) and got[4] == (0, 0)
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    for m_bits in (18, 6):
        want = {
            r[0]: (r[1], r[2])
            for r in con.sql(
                CM.cms_gram_frequency_sql("documents", n=3, m_bits=m_bits, k=3)
            ).fetchall()
        }
        got_m = {
            r["doc_id"]: (r["n_grams"], r["max_est_freq"])
            for r in CM.cms_gram_frequency(
                df, n=3, m_bits=m_bits, k=3
            ).collect()
        }
        assert got_m == want, m_bits  # incl. identical overcounts at m=2^6


def test_estimate_plan_has_no_join_no_shuffle(spark):
    out = CM.cms_gram_frequency(_docs_df(spark), n=3, m_bits=10, k=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    for node in ("Exchange", "Join"):
        assert node not in plan, node
