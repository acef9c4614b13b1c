"""top_tfidf_terms: serial NumPy-free reference, tie determinism, twin
agreement, and the WindowGroupLimit top-k plan."""

import math

import duckdb

from sparkclean.text import tfidf as T
from sparkclean.text.shared import words_py

DOCS = [
    (0, "apple banana apple cherry apple"),
    (1, "banana cherry banana date"),
    (2, "unique words only here"),
    (3, "tie tie bie bie"),  # equal tf & df -> term ASC breaks the tie
    (4, ""),
    (5, None),
]


def _serial(n_terms):
    from collections import Counter

    tfs = {i: Counter(words_py(t or "")) for i, t in DOCS}
    dfreq = Counter()
    for c in tfs.values():
        dfreq.update(set(c))
    n = float(len(DOCS))
    out = {}
    for i, c in tfs.items():
        scored = sorted(
            ((-tf * math.log(n / dfreq[t]), t) for t, tf in c.items()),
        )
        for rank, (neg, t) in enumerate(scored[:n_terms], start=1):
            out[(i, rank)] = (t, round(-neg, 6))
    return out


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id: long, text: string")


def test_matches_serial_reference_and_ties_break_on_term(spark):
    got = {
        (r["doc_id"], r["term_rank"]): (r["term"], r["score"])
        for r in T.top_tfidf_terms(_docs_df(spark), n_terms=2).collect()
    }
    assert got == _serial(2)
    # doc 3: "bie" and "tie" have identical tf and df -> term ASC
    assert got[(3, 1)][0] == "bie" and got[(3, 2)][0] == "tie"
    # empty/null docs emit nothing
    assert not any(i in (4, 5) for i, _ in got)


def test_twin_agreement(spark):
    got = sorted(
        tuple(r) for r in T.top_tfidf_terms(_docs_df(spark), n_terms=3).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    want = sorted(
        tuple(r)
        for r in con.sql(T.top_tfidf_terms_sql("documents", n_terms=3)).fetchall()
    )
    assert got == want


def test_topk_rides_window_group_limit(spark):
    out = T.top_tfidf_terms(_docs_df(spark), n_terms=2)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "WindowGroupLimit" in plan
