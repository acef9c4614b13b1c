"""Generate the adversarial "zoo" corpus: the documents table rebuilt
with hostile text (VT/FF/CR separators, NBSP/EM spaces, uppercase,
Turkish İ, Greek sigma, quotes, braces, planted dups, empty and null
texts) plus the other sf0.001 tables copied verbatim, so
tools/check_correctness.py can drive the REAL gate harness over inputs
the plain-ASCII driver corpus never exercises.

This corpus found four latent cross-engine divergences in round 4
(RE2 \\s vs VT — twice, incl. inside TOKEN_REGEX's negated class;
DuckDB unicode trim; null-text token_stats).  Re-run after touching
any text twin:

    python tools/make_zoo.py && \\
    python tools/check_correctness.py /tmp/zoo_sf <text queries...>
"""

from __future__ import annotations

import os
import random
import shutil

import duckdb

OUT = "/tmp/zoo_sf"
SRC = "/root/testdata/sf0.001"
WORDS = [
    "table", "value", "part", "scan", "the", "is", "with", "und", "der",
    "le", "la", "AB", "Ab", "aB", "İstanbul", "ΣΑΣ", "σας", "ΒΙΟΣ",
    "word'quote", 'dq"uote', "java", "script", "javascript", "lorem",
    "ipsum", "{brace}", "a", "b", "badword",
]
SEPS = [" ", "  ", "\t", "\n", "\x0b", "\x0c", "\r", " ", " ", " "]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events",
    ]:
        shutil.copy(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")
    rng = random.Random(42)
    docs = []
    for i in range(120):
        n = rng.randint(0, 30)
        toks = [rng.choice(WORDS) for _ in range(n)]
        seps = [rng.choice(SEPS) for _ in range(max(n - 1, 0))]
        text = "".join(
            t + (s if j < len(seps) else "")
            for j, (t, s) in enumerate(zip(toks, seps + [""]))
        )
        if rng.random() < 0.15:
            text = rng.choice(SEPS) + text + rng.choice(SEPS)
        if rng.random() < 0.1:
            text = text + "."
        docs.append((i, text, rng.choice(["en", "fr", "und"]), f"src{i % 5}", len(text)))
    docs.append((120, docs[3][1], "en", "src0", len(docs[3][1])))  # exact dup
    docs.append((121, docs[7][1] + " tail", "en", "src1", 0))      # near dup
    docs.append((122, "", "en", "src2", 0))
    docs.append((123, None, "en", "src3", 0))
    # identical-content mega-group (round 5): 25 copies of one
    # boilerplate page — identical shingle sets and simhashes, the
    # hot-fingerprint shape the distinct-collapse guards against.  The
    # gate twins must stay hash-exact with the group collapsed to one
    # representative on BOTH engines.
    boiler = (
        "lorem ipsum the table value is with part scan the value table "
        "is part with scan lorem ipsum value the table part"
    )
    for j in range(25):
        docs.append((130 + j, boiler, "en", f"src{j % 5}", len(boiler)))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", docs)
    con.execute(f"COPY d TO '{OUT}/documents.parquet' (FORMAT parquet)")

    # ties-heavy embeddings: 40 base vectors x 10 EXACT copies (every
    # score/rank tie-break path live), a zero vector (cosine zero-norm
    # guard — found the ANSI DIVIDE_BY_ZERO in knn_bruteforce) and
    # softmax-saturating extremes; all 10 labels present.
    erows, vid = [], 0
    for b in range(40):
        base = [round(rng.uniform(-2, 2), 3) for _ in range(64)]
        if b == 0:
            base = [0.0] * 64
        if b == 1:
            base = [10.0] * 64
        if b == 2:
            base = [-10.0] * 64
        for _ in range(10):
            erows.append((vid, [float(x) for x in base], b % 10))
            vid += 1
    con.execute(
        "CREATE TABLE e (vec_id BIGINT, embedding FLOAT[], label INTEGER)"
    )
    con.executemany("INSERT INTO e VALUES (?,?,?)", erows)
    con.execute(f"COPY e TO '{OUT}/embeddings.parquet' (FORMAT parquet)")
    print(f"zoo written: {len(docs)} docs, {len(erows)} embeddings -> {OUT}")


if __name__ == "__main__":
    main()
