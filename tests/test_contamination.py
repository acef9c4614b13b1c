"""ngram_contamination: planted-overlap fixture, twin agreement, and
plan shape (broadcast bench set, no gram re-inline below the Generate)."""

import duckdb

from sparkclean.text import contamination as C

# ten-word docs; doc 3 copies a 5-word run from bench doc 0 ("the quick
# brown fox jumps"); doc 4 has four words (no 5-grams); doc 5 repeats
# one 5-gram twice (distinct count must be 1)
DOCS = [
    (0, "the quick brown fox jumps over the lazy dog tonight"),
    (1, "completely different words with no overlap at all here now"),
    (2, "another clean document that shares nothing with the benchmark set"),
    (3, "prefix words then the quick brown fox jumps suffix words"),
    (4, "too short for grams"),
    (5, "a b c d e a b c d e"),
    (6, None),
]
BENCH_IDS = {0}


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id: long, text: string")


def test_planted_overlap_and_edge_cases(spark):
    df = _docs_df(spark)
    out = {
        r["doc_id"]: (r["n_ngrams"], r["n_matched"], r["contaminated"])
        for r in C.ngram_contamination(
            df, df.where(df.doc_id.isin(list(BENCH_IDS))), n=5
        ).collect()
    }
    assert len(out) == len(DOCS)  # every row reported, null text included
    assert out[0] == (6, 6, True)  # bench member matches itself fully
    assert out[1] == (6, 0, False)
    assert out[2] == (6, 0, False)
    assert out[3] == (6, 1, True)  # the planted copied 5-gram
    assert out[4] == (0, 0, False)  # < n words -> no grams
    # "a b c d e a b c d e": windows 1..6, positions 1 and 6 coincide ->
    # 5 distinct grams, none bench
    assert out[5] == (5, 0, False)
    assert out[6] == (0, 0, False)  # null text


def test_twin_agreement_on_fixture(spark):
    df = _docs_df(spark)
    got = sorted(
        tuple(r)
        for r in C.ngram_contamination(
            df, df.where(df.doc_id % 7 == 0), n=3
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    want = sorted(
        tuple(r)
        for r in con.sql(
            C.ngram_contamination_sql("documents", "doc_id % 7 = 0", n=3)
        ).fetchall()
    )
    assert got == want


def test_plan_broadcasts_bench_and_never_reinlines_grams(spark):
    df = _docs_df(spark)
    out = C.ngram_contamination(df, df.where(df.doc_id.isin([0])), n=5)
    out.collect()  # AQE finalises the join strategies only on execution
    plan = out._jdf.queryExecution().executedPlan().toString()
    # only grade what actually ran — toString() appends the pre-AQE
    # "== Initial Plan ==" section, which may still show a sort-merge
    plan = plan.split("== Initial Plan ==")[0]
    # the bench n-gram set and the matched counts must both broadcast —
    # the corpus side must never be the build side of a shuffle join
    assert any(
        "BroadcastHashJoin" in line and "LeftSemi" in line
        for line in plan.splitlines()
    )
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    # InferFiltersFromGenerate guard: no Filter may re-evaluate the gram
    # hash chain (md5 belongs in Projects only; the explode_outer +
    # isNotNull form keeps it there)
    for line in plan.splitlines():
        if "Filter" in line and "md5" in line:
            raise AssertionError(f"gram chain re-inlined into a Filter: {line[:200]}")
