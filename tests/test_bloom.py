"""Bloom-filter decontamination: position-schedule reference, filter
build, Catalyst/Arrow route parity, superset-of-exact property, twin
agreement, and the no-join no-shuffle membership plan."""

import duckdb
import numpy as np
from pyspark.sql import functions as F

from sparkclean.dedup import bloom as BL
from sparkclean.text import contamination as C

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog tonight"),
    (1, "completely different words with no overlap at all here now"),
    (2, "prefix words then the quick brown fox jumps suffix words"),
    (3, "too short"),
    (4, None),
    (5, "zebra yak xylophone wombat vulture unicorn tapir snake rhino quail"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id: long, text: string")


def test_position_schedule_matches_reference():
    rng = np.random.RandomState(7)
    gh = rng.randint(0, 1 << 60, size=200, dtype=np.int64)
    pos = BL.bloom_positions_np(gh, 14, 3)
    m = 1 << 14
    for j in range(200):
        h1 = int(gh[j]) % m
        h2 = ((int(gh[j]) >> 20) % m) * 2 + 1
        for i in range(3):
            assert pos[i, j] == (h1 + i * h2) % m
    assert pos.min() >= 0 and pos.max() < m


def test_build_words_sets_exactly_the_given_bits():
    words = BL.build_bloom_words(np.array([0, 63, 64, 1000, 1000]), 10)
    assert words.shape == (16,)
    got = {
        w * 64 + b for w in range(16) for b in range(64)
        if (int(words[w]) >> b) & 1
    }
    assert got == {0, 63, 64, 1000}


def test_member_col_matches_numpy_kernel(spark):
    rng = np.random.RandomState(11)
    bench = rng.randint(0, 1 << 60, size=50, dtype=np.int64)
    words = BL.build_bloom_words(BL.bloom_positions_np(bench, 12, 3), 12)
    probe = np.concatenate([bench[:10], rng.randint(0, 1 << 60, 300, dtype=np.int64)])
    pos = BL.bloom_positions_np(probe, 12, 3)
    want = np.ones(len(probe), dtype=bool)
    for i in range(3):
        p = pos[i]
        want &= ((words[p >> 6] >> (p & 63).astype(np.uint64)) & np.uint64(1)).astype(bool)
    assert want[:10].all()  # real members always hit
    df = spark.createDataFrame(
        [(int(h),) for h in probe], "gh: long"
    ).withColumn("m", BL.bloom_member_col(F.col("gh"), words, 12, 3))
    # order-independent comparison: map hash -> membership
    got_map = {r["gh"]: r["m"] for r in df.collect()}
    for h, w in zip(probe, want):
        assert got_map[int(h)] == bool(w)


def test_superset_of_exact_and_twin_agreement(spark):
    df = _docs_df(spark)
    bench = df.where(df.doc_id == 0)
    bl = {
        r["doc_id"]: (r["n_ngrams"], r["n_flagged"], r["flagged"])
        for r in BL.bloom_contamination(df, bench, n=5, m_bits=12).collect()
    }
    ex = {
        r["doc_id"]: r["contaminated"]
        for r in C.ngram_contamination(df, bench, n=5).collect()
    }
    assert len(bl) == len(DOCS)
    for i, contaminated in ex.items():
        if contaminated:
            assert bl[i][2], i  # never a false negative
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.sql(
            BL.bloom_contamination_sql("documents", "doc_id = 0", n=5, m_bits=12)
        ).fetchall()
    }
    assert bl == want


def test_membership_plan_has_no_join_no_shuffle(spark):
    df = _docs_df(spark)
    out = BL.bloom_contamination(df, df.where(df.doc_id == 0), n=5, m_bits=12)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    for node in ("Exchange", "Join"):
        assert node not in plan, node


def test_with_bloom_flags_applies_to_a_stream(spark, tmp_path):
    """The membership pass is a stateless projection: a prebuilt filter
    flags a Structured Streaming source identically to the batch path."""
    from sparkclean.dedup.bloom import (
        _bench_positions,
        build_bloom_words,
        with_bloom_flags,
    )

    df = _docs_df(spark)
    bench = df.where(df.doc_id == 0)
    pos = np.array(
        [r["p"] for r in _bench_positions(bench, 5, 12, 3, "text").collect()],
        dtype=np.int64,
    )
    words = build_bloom_words(pos, 12)
    want = sorted(
        tuple(r) for r in with_bloom_flags(df, words, n=5, m_bits=12, k=3).collect()
    )
    src = str(tmp_path / "bloom_stream_src")
    df.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    flagged = with_bloom_flags(stream, words, n=5, m_bits=12, k=3)
    assert flagged.isStreaming
    q = (
        flagged.writeStream.format("memory")
        .queryName("bloom_stream_out")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "bloom_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        tuple(r) for r in spark.sql("SELECT * FROM bloom_stream_out").collect()
    )
    assert got == want
