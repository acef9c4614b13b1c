"""global_prefix_sum / pack_sequences: exactness vs a serial oracle,
partition-count invariance, and the no-unpartitioned-window plan shape."""

import re

from pyspark.sql import functions as F

from sparkclean.stats import global_prefix_sum
from sparkclean.text import packing as P
from sparkclean.text.shared import words_py

DOCS = (
    [(i, ("tok " * (i % 11 + 1)).strip()) for i in range(40)]
    + [(40, ""), (41, None), (42, "one two three four five six seven")]
)


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id: long, text: string")


def _serial_pack(budget):
    out, run = {}, 0
    for i, text in sorted(DOCS):
        n = len(words_py(text or ""))
        start = run // budget
        end = (run + max(n, 1) - 1) // budget
        out[i] = (n, run, start, end - start + 1)
        run += n
    return out


def test_prefix_sum_matches_serial_under_any_partitioning(spark):
    df = _docs_df(spark).select(
        "doc_id", F.length(F.coalesce("text", F.lit(""))).alias("w")
    )
    want, run = {}, 0
    for i, text in sorted(DOCS):
        want[i] = run
        run += len(text or "")
    for parts in (1, 3, 16):
        got = {
            r["doc_id"]: r["off"]
            for r in global_prefix_sum(
                df, "w", ["doc_id"], "off", num_partitions=parts
            ).collect()
        }
        assert got == want, f"num_partitions={parts}"


def test_pack_sequences_matches_serial_oracle(spark):
    for budget in (7, 64):
        got = {
            r["doc_id"]: (
                r["n_tokens"],
                r["stream_offset"],
                r["bin_id"],
                r["n_bins_spanned"],
            )
            for r in P.pack_sequences(_docs_df(spark), budget=budget).collect()
        }
        assert got == _serial_pack(budget), f"budget={budget}"


def _serial_chunks(chunk, stride):
    out = {}
    for i, text in sorted(DOCS):
        w = words_py(text or "")
        if not w:
            continue
        nc = min(
            1 + max(0, -(-(max(len(w) - chunk, 0)) // stride)),
            1 + (len(w) - 1) // stride,
        )
        for c in range(nc):
            s = c * stride
            out[(i, c)] = (" ".join(w[s : s + chunk]), min(chunk, len(w) - s))
    return out


def test_chunk_documents_matches_serial_oracle(spark):
    for chunk, stride in ((5, 3), (8, 8), (64, 48)):
        got = {
            (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
            for r in P.chunk_documents(
                _docs_df(spark), chunk_size=chunk, stride=stride
            ).collect()
        }
        assert got == _serial_chunks(chunk, stride), (chunk, stride)
    # empty and null docs (40, 41) produce no rows
    ids = {
        r["doc_id"]
        for r in P.chunk_documents(_docs_df(spark), 5, 3).collect()
    }
    assert 40 not in ids and 41 not in ids


def test_chunk_plan_is_row_local_without_split_reinline(spark):
    out = P.chunk_documents(_docs_df(spark), chunk_size=5, stride=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan
    # explode_outer keeps the inferred filter off the split chain
    for line in plan.splitlines():
        if "Filter" in line and "split(" in line:
            raise AssertionError(f"split re-inlined into a Filter: {line[:200]}")


def test_plan_has_no_unpartitioned_data_window(spark):
    out = P.pack_sequences(_docs_df(spark), budget=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan or "RepartitionByExpression" in plan
    # the data-sized running sum must be partitioned (_grr_pid); only the
    # P-row per-partition-totals prefix sum may be unpartitioned
    for m in re.finditer(r"Window \[", plan):
        tail = plan[m.start() : plan.index("\n", m.start())]
        if "_grr_run" in tail and tail.count("], [") < 2:
            raise AssertionError(f"unpartitioned data window: {tail[:200]}")
