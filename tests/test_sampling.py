"""source_cap_sample / source_mixture_weights: determinism, twin
agreement, and the WindowGroupLimit pushdown on the kept-only path."""

import duckdb

from sparkclean.text import sampling as S

DOCS = [
    (i, f"word{i} " * (i % 7 + 1) + "tail", f"src{i % 3}")
    for i in range(30)
] + [(30, None, "src0"), (31, "", "srcempty")]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id: long, text: string, source: string")


def test_cap_sample_deterministic_and_capped(spark):
    df = _docs_df(spark)
    out = S.source_cap_sample(df, cap=4, id_col="doc_id").collect()
    assert len(out) == len(DOCS)
    again = S.source_cap_sample(df, cap=4, id_col="doc_id").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    per = {}
    for r in out:
        per.setdefault(r["source"], []).append(r)
        assert r["kept"] == (r["sample_rank"] <= 4)
    for src, rows in per.items():
        ranks = sorted(r["sample_rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        assert sum(r["kept"] for r in rows) == min(4, len(rows))


def test_kept_only_matches_full_form_and_prunes_in_plan(spark):
    df = _docs_df(spark)
    full = {
        (r["doc_id"], r["source"], r["sample_rank"])
        for r in S.source_cap_sample(df, cap=4).collect()
        if r["kept"]
    }
    kept = S.source_cap_sample(df, cap=4, kept_only=True)
    got = {(r["doc_id"], r["source"], r["sample_rank"]) for r in kept.collect()}
    assert got == full
    plan = kept._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    # the production path must pre-prune to cap rows per source on the
    # map side — a hot domain never funnels through one window task
    assert "WindowGroupLimit" in plan


def test_corpus_sample_is_top_n_by_hash_and_plan_is_heap_based(spark):
    df = _docs_df(spark)
    out = S.corpus_sample(df, size=7)
    rows = out.collect()
    assert len(rows) == 7
    keys = [r["sample_key"] for r in rows]
    assert keys == sorted(keys)
    # layout independence: same sample after an adversarial repartition
    again = {
        r["doc_id"] for r in S.corpus_sample(df.repartition(13), size=7).collect()
    }
    assert again == {r["doc_id"] for r in rows}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # heap-based top-N, never a global sort


def test_hash_fraction_sample_deterministic_and_row_local(spark):
    df = _docs_df(spark)
    out = {r["doc_id"]: r["kept"] for r in S.hash_fraction_sample(df, 0.3).collect()}
    assert len(out) == len(DOCS)
    again = {
        r["doc_id"]: r["kept"]
        for r in S.hash_fraction_sample(df.repartition(5), 0.3).collect()
    }
    assert out == again
    assert 0 < sum(out.values()) < len(out)  # neither all nor none at p=0.3
    assert all(
        not r["kept"] for r in S.hash_fraction_sample(df, 0.0).collect()
    )
    assert all(r["kept"] for r in S.hash_fraction_sample(df, 1.0).collect())
    plan = (
        S.hash_fraction_sample(df, 0.3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_mixture_weights_twin_agreement(spark):
    df = _docs_df(spark)
    got = sorted(tuple(r) for r in S.source_mixture_weights(df).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, source VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", DOCS)
    want = sorted(
        tuple(r)
        for r in con.sql(S.source_mixture_weights_sql("documents")).fetchall()
    )
    assert got == want
    # the zero-token source ("", None texts only would be src-specific;
    # srcempty has one empty doc) gets a null weight, share 0
    by_src = {r[0]: r for r in got}
    assert by_src["srcempty"][2] == 0 and by_src["srcempty"][4] is None
