"""Adversarial-whitespace property suite: the DuckDB twins of the
words-based prep operators must agree with the Python reference kernels
on texts the gate corpus never exercises (tabs, vertical tab, form
feed, NBSP/EM-space, quotes, empty tokens).  This suite caught the
RE2-vs-Java ``\\s`` divergence (DuckDB's ``\\s`` misses 0x0B) fixed in
shared.WS_CLASS_SQL."""

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from sparkclean.text import contamination as C
from sparkclean.text import linededup as L
from sparkclean.text import packing as P
from sparkclean.text.shared import words_py, words_sql

# ASCII whitespace zoo + unicode spaces (NBSP, EM) that Java/Python
# ASCII \s must NOT split on + quoting hazards
ALPHABET = list("abAB x.!?'\"\t\n\r\x0b\x0c") + ["\u00a0", "\u2003", "\u0130", "\u03a3", "\u03c2"]
TEXT = st.text(alphabet=st.sampled_from(ALPHABET), max_size=40)
DOCS = st.lists(TEXT, min_size=1, max_size=5)


def _con(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    return con


@given(TEXT)
@settings(max_examples=300, deadline=None)
def test_words_twin_parity(text):
    con = _con([(0, text)])
    got = con.sql(f"SELECT {words_sql('text')} FROM documents").fetchone()[0]
    assert got == words_py(text), repr(text)


@given(DOCS)
@settings(max_examples=60, deadline=None)
def test_dedup_lines_twin_parity(texts):
    rows = list(enumerate(texts))
    want = {
        i: L.dedup_lines_py(t) for i, t in rows
    }
    con = _con(rows)
    got = {
        r[0]: (r[1], r[2])
        for r in con.sql(L.dedup_lines_sql("documents")).fetchall()
    }
    assert got == want


@given(DOCS, st.integers(min_value=1, max_value=6), st.integers(min_value=1, max_value=6))
@settings(max_examples=60, deadline=None)
def test_chunk_twin_parity(texts, chunk, stride):
    rows = list(enumerate(texts))
    want = {}
    for i, t in rows:
        w = words_py(t or "")
        if not w:
            continue
        nc = min(
            1 + max(0, -(-(max(len(w) - chunk, 0)) // stride)),
            1 + (len(w) - 1) // stride,
        )
        for c in range(nc):
            s = c * stride
            want[(i, c)] = (" ".join(w[s : s + chunk]), min(chunk, len(w) - s))
    con = _con(rows)
    got = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.sql(
            P.chunk_documents_sql("documents", chunk_size=chunk, stride=stride)
        ).fetchall()
    }
    assert got == want


@given(DOCS, st.integers(min_value=1, max_value=3))
@settings(max_examples=60, deadline=None)
def test_contamination_twin_parity(texts, n):
    rows = list(enumerate(texts))

    def grams(t):
        w = words_py(t or "")
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    bench = set().union(*(grams(t) for i, t in rows if i % 2 == 0)) if rows else set()
    want = {}
    for i, t in rows:
        g = grams(t)
        m = len(g & bench)
        want[i] = (len(g), m, m > 0)
    con = _con(rows)
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.sql(
            C.ngram_contamination_sql("documents", "doc_id % 2 = 0", n=n)
        ).fetchall()
    }
    assert got == want


@given(DOCS)
@settings(max_examples=40, deadline=None)
def test_c4_clean_twin_parity(texts):
    from sparkclean.text import c4 as C4

    rows = list(enumerate(texts))
    want = {}
    for i, t in rows:
        cleaned, n_kept = C4.c4_clean_py(t)
        want[i] = (cleaned, n_kept, C4.c4_keep_py(t, cleaned))
    con = _con(rows)
    got = {
        r[0]: (r[1], r[2], r[4])
        for r in con.sql(C4.c4_line_clean_sql("documents")).fetchall()
    }
    assert got == want


@given(DOCS)
@settings(max_examples=25, deadline=None)
def test_gopher_twin_parity(texts):
    from sparkclean.text import gopher as G

    rows = list(enumerate(texts))
    want = {}
    for i, t in rows:
        f = G.gopher_features_py(t)
        want[i] = tuple(round(f[k], 6) for k in G.FEATURES) + (G.gopher_keep_py(f),)
    con = _con(rows)
    got = {r[0]: tuple(r[1:]) for r in con.sql(G.gopher_repetition_sql("documents")).fetchall()}
    assert got == want
