"""Dedup + similarity-search behaviour on corpora with planted
duplicates (the driver tables contain few/none)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkclean.dedup import exact as d_exact
from sparkclean.dedup import minhash as d_minhash
from sparkclean.dedup import simhash as d_simhash
from sparkclean.sim import knn as s_knn

BASE = "the quick brown fox jumps over the lazy dog near the river bank today"


@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = []
    words = BASE.split()
    for i in range(60):
        rows.append((i, " ".join(words[j % len(words)] for j in range(i, i + 12)) + f" tail{i}"))
    # exact duplicates: 100/101/102 identical; 103 same modulo whitespace
    rows.append((100, BASE))
    rows.append((101, BASE))
    rows.append((102, BASE))
    rows.append((103, "  " + BASE.replace(" ", "  ") + " "))
    # near duplicate: one word changed
    rows.append((110, BASE.replace("lazy", "sleepy")))
    # unrelated
    rows.append((120, "completely different content about spark query engines and shuffles"))
    return spark.createDataFrame(rows, "doc_id: long, text: string").cache()


def test_exact_duplicates(spark, dup_docs):
    out = d_exact.exact_duplicates(dup_docs, "text", "doc_id").collect()
    ids = sorted(r["doc_id"] for r in out)
    # whitespace-normalised fingerprint folds 103 into the cluster
    assert ids == [100, 101, 102, 103]
    assert all(r["cluster_rep"] == 100 and r["cluster_size"] == 4 for r in out)

    kept = d_exact.distinct_by_fingerprint(dup_docs, "text", "doc_id")
    assert kept.count() == dup_docs.count() - 3
    assert kept.where(F.col("doc_id").isin([101, 102, 103])).count() == 0


def test_minhash_near_duplicates(spark, dup_docs):
    pairs = d_minhash.near_duplicate_pairs(dup_docs, "text", "doc_id", threshold=0.5)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    # exact-content group {100,101,102,103} (identical shingle SETS —
    # 103 differs only in whitespace) collapses to representative 100:
    # no jaccard-1 within-group pairs in the output
    assert not any(
        a in (101, 102, 103) or b in (101, 102, 103) for (a, b) in got
    )
    assert all(v < 1.0 for v in got.values())
    # one-word change still pairs with the group REPRESENTATIVE
    assert (100, 110) in got and 0.5 <= got[(100, 110)] < 1.0
    # unrelated doc never pairs with the base cluster
    assert not any(120 in (a, b) for (a, b) in got)


def test_simhash_pairs(spark, dup_docs):
    out = d_simhash.simhash_candidate_pairs(dup_docs, "text", "doc_id", max_hamming=4)
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in out.collect()}
    # identical fingerprints ({100,101,102,103} hash alike) collapse to
    # rep 100 before banding: no distance-0 pairs, no non-rep members
    assert all(1 <= h <= 4 for h in got.values())
    assert not any(
        a in (101, 102, 103) or b in (101, 102, 103) for (a, b) in got
    )
    # duplicate-group MEMBERSHIP comes from clusters over the fingerprints
    from sparkclean.dedup.hamming import hamming_clusters

    fps = d_simhash.with_simhash(dup_docs, "text", "sh").select("doc_id", "sh")
    cl = {
        r["doc_id"]: (r["cluster_rep"], r["cluster_size"])
        for r in hamming_clusters(
            fps, "doc_id", "sh", max_distance=0, bits=32
        ).collect()
    }
    assert cl[100][0] == cl[101][0] == cl[102][0] == cl[103][0] == 100
    assert cl[100][1] >= 4
    # a one-word change moves the fingerprint but stays closer than an
    # unrelated doc (compare raw hamming distances, not candidacy —
    # 13-token docs flip several of 32 bits per token change)
    sh = {
        r["doc_id"]: r["sh"]
        for r in dup_docs.select(
            "doc_id", d_simhash.simhash_col(F.col("text")).alias("sh")
        ).collect()
    }
    ham = lambda a, b: bin((sh[a] ^ sh[b]) & 0xFFFFFFFF).count("1")
    assert ham(100, 110) < ham(100, 120)


def test_simhash_block_bits_knob(spark, dup_docs):
    """block_bits is the scale knob: 4 blocks of 8 bits guarantee (by
    pigeonhole) recall of every pair within Hamming distance 3, so the
    verified pair set at block_bits=8 must be a superset of the default
    16-bit blocking — with the planted duplicates present in both."""
    base = d_simhash.simhash_candidate_pairs(dup_docs, "text", "doc_id", max_hamming=3)
    wide = d_simhash.simhash_candidate_pairs(
        dup_docs, "text", "doc_id", max_hamming=3, block_bits=8
    )
    got16 = {(r["id_a"], r["id_b"]) for r in base.collect()}
    got8 = {(r["id_a"], r["id_b"]) for r in wide.collect()}
    assert got16 <= got8
    # the planted exact group rides the collapse (not the band join):
    # 100/103 share a fingerprint, so they cluster at any block_bits
    from sparkclean.dedup.hamming import hamming_clusters

    fps = d_simhash.with_simhash(dup_docs, "text", "sh").select("doc_id", "sh")
    cl = {
        r["doc_id"]: r["cluster_rep"]
        for r in hamming_clusters(
            fps, "doc_id", "sh", max_distance=3, bits=32, block_bits=8
        ).collect()
    }
    assert cl[100] == cl[103]
    with pytest.raises(ValueError):
        d_simhash.simhash_candidate_pairs(dup_docs, block_bits=7)


def test_simhash_null_text(spark):
    """Null text rows must flow through the Arrow kernel as simhash 0 —
    the value the Catalyst fold produces (each bit's NULL vote falls
    into the when().otherwise(0) branch) and the SQL twin's CASE
    mirrors — instead of raising TypeError.  All three paths must agree
    so null-text corpora hash identically at the gate."""
    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, None), (3, "the quick brown fox"), (4, "")],
        "doc_id: long, text: string",
    )
    sh = {r["doc_id"]: r["sh"] for r in
          d_simhash.with_simhash(df, "text", "sh").collect()}
    fold = {r["doc_id"]: r["sh"] for r in
            df.select("doc_id", d_simhash.simhash_col(F.col("text")).alias("sh")).collect()}
    assert sh == fold  # Arrow kernel == Catalyst fold, including null text
    assert sh[2] == 0 and sh[4] == 0
    assert sh[1] == sh[3] is not None
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)",
                    [(1, "the quick brown fox"), (2, None),
                     (3, "the quick brown fox"), (4, "")])
    oracle = dict(con.execute(
        f"SELECT doc_id, {d_simhash.simhash_sql('text')} FROM docs"
    ).fetchall())
    assert oracle == sh  # DuckDB twin agrees row-for-row
    # identical fingerprints ({1,3} share a hash; {2,4} are both 0)
    # collapse before banding: no distance-0 pairs — membership comes
    # from clusters, which must group each pair and keep them apart
    pairs = {(r["id_a"], r["id_b"])
             for r in d_simhash.simhash_candidate_pairs(df).collect()}
    assert not ((1, 3) in pairs or (2, 4) in pairs)
    from sparkclean.dedup.hamming import hamming_clusters

    fps = d_simhash.with_simhash(df, "text", "sh").select("doc_id", "sh")
    cl = {
        r["doc_id"]: (r["cluster_rep"], r["cluster_size"])
        for r in hamming_clusters(
            fps, "doc_id", "sh", max_distance=3, bits=32
        ).collect()
    }
    assert cl[1] == cl[3] == (1, 2)
    assert cl[2] == cl[4] == (2, 2)


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(11)
    base = rng.randn(20, 16)
    rows = []
    vid = 0
    for c in range(20):
        for j in range(5):
            v = base[c] + rng.randn(16) * 0.05
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<double>, label: int").cache()


def test_lsh_topk_recall(spark, vectors):
    queries = vectors.where(F.col("vec_id") < 10)
    exact = s_knn.cosine_topk(vectors, queries, k=4)
    approx = s_knn.lsh_topk(vectors, queries, dim=16, k=4)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    # same-cluster neighbours share LSH buckets with high probability
    recall = len(e & a) / len(e)
    assert recall >= 0.5, recall
    # LSH results are a subset of correct cosine ranking within buckets:
    # every returned pair must have cosine >= 0.9 (same-cluster)
    for r in approx.collect():
        assert r["cosine"] > 0.8


def test_embedding_near_duplicates(spark, vectors):
    pairs = s_knn.embedding_near_duplicates(vectors, threshold=0.995, block_col="label")
    got = pairs.collect()
    assert len(got) > 0
    for r in got:
        assert r["cosine"] >= 0.995


def test_near_duplicate_issues_matches_numpy(spark):
    """Datalab near-duplicate manager (duplicate.py:20-228) vs direct
    NumPy: radius sets, reciprocal membership, exp-transform scores.

    The manager consumes the shared bucketed graph (sim.knn.knn_edges),
    so the NumPy oracle replays the manager's set/score logic over the
    SAME edge list — graph recall is certified separately in
    tests/test_knn_edges.py.  The planted duplicates below are angularly
    identical, so the bucketed graph always contains them."""
    import numpy as np
    from sparkclean.quality.datalab import near_duplicate_issues
    from sparkclean.sim.knn import knn_edges

    rng = np.random.RandomState(11)
    pts = rng.rand(40, 4) * 10
    pts[5] = pts[3] + 1e-4          # near-duplicate pair
    pts[9] = pts[3] + 2e-4          # chain: close to 3 (and to 5)
    pts[20] = pts[17]               # exact duplicate
    df = spark.createDataFrame(
        [(i, [float(x) for x in p]) for i, p in enumerate(pts)],
        "vec_id: long, embedding: array<double>",
    )
    got = {r["vec_id"]: r for r in near_duplicate_issues(df, k=10).collect()}

    # NumPy oracle over the manager's own edge list
    edge_rows = knn_edges(df, k=10, metric="euclidean").collect()
    knn_map = {i: [] for i in range(len(pts))}
    for r in edge_rows:
        knn_map[r["qid"]].append((r["rk"], r["nid"], r["d"]))
    for v in knn_map.values():
        v.sort()
    nn_dist = np.array([knn_map[i][0][2] for i in range(len(pts))])
    med = max(np.median(nn_dist), 1e-6)
    radius = 0.13 * med
    sets = [
        {nid for _, nid, d in knn_map[i] if d < radius} for i in range(len(pts))
    ]
    for i in range(len(pts)):       # reciprocal closure
        for j in list(sets[i]):
            sets[j].add(i)
    flagged = {i for i, s in enumerate(sets) if s}
    for i in range(len(pts)):
        assert abs(got[i]["nn_dist"] - nn_dist[i]) < 1e-9
        assert got[i]["is_near_duplicate_issue"] == (i in flagged), i
        exp_score = 0.0 if abs(nn_dist[i]) <= 1e-8 else 1 - np.exp(-nn_dist[i] / med)
        assert abs(got[i]["near_duplicate_score"] - exp_score) < 1e-9
    assert 20 in flagged and 17 in flagged and 3 in flagged and 5 in flagged


# ---------------------------------------------------------------- hamming


def _rand_hashes(n, seed, planted_flips):
    """n random 64-bit fingerprints; every 10th row gets a partner at
    exactly ``planted_flips`` Hamming distance.  Returns (int64 list,
    planted pair set)."""
    rng = np.random.default_rng(seed)
    h = rng.integers(0, 1 << 64, size=n, dtype=np.uint64)
    planted = set()
    for i in range(0, n - 1, 10):
        pos = rng.choice(64, size=planted_flips, replace=False)
        mask = np.uint64(0)
        for p in pos:
            mask |= np.uint64(1) << np.uint64(p)
        h[i + 1] = h[i] ^ mask
        planted.add((i, i + 1))
    return [int(x) for x in h.view(np.int64)], planted


def _brute_pairs(hashes, max_d):
    out = set()
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            if ((hashes[i] ^ hashes[j]) & ((1 << 64) - 1)).bit_count() <= max_d:
                out.add((i, j))
    return out


def test_hamming_pairs_exact_vs_brute(spark):
    """block_bits=16 (4 blocks) is pigeonhole-EXACT for distance <= 3:
    blocked search == brute force, including negative int64 hashes."""
    from sparkclean.dedup.hamming import hamming_pairs

    hashes, planted = _rand_hashes(240, seed=7, planted_flips=3)
    df = spark.createDataFrame(
        list(enumerate(hashes)), "id: long, phash: long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_pairs(df, "id", "phash", max_distance=3).collect()
    }
    exp = _brute_pairs(hashes, 3)
    assert set(got) == exp and planted <= exp
    for (a, b), d in got.items():
        assert d == ((hashes[a] ^ hashes[b]) & ((1 << 64) - 1)).bit_count()
        assert d <= 3


def test_hamming_rotation_recall(spark):
    """Growth path: at block_bits=32 (2 blocks — exact only to distance 1)
    the rotation union lifts recall on planted distance-3 pairs while
    bucket sizes stay ~N/2^32 (VERDICT r3 item 4)."""
    from sparkclean.dedup.hamming import hamming_pairs

    hashes, planted = _rand_hashes(400, seed=13, planted_flips=3)
    df = spark.createDataFrame(
        list(enumerate(hashes)), "id: long, phash: long"
    ).cache()

    def recall(n_perms):
        got = {
            (r["id_a"], r["id_b"])
            for r in hamming_pairs(
                df, "id", "phash", max_distance=3, block_bits=32, n_perms=n_perms
            ).collect()
        }
        assert got <= _brute_pairs(hashes, 3)  # verify step: no false pairs
        return len(got & planted) / len(planted)

    r1, r4 = recall(1), recall(4)
    # single 32-bit split finds a random distance-3 pair iff one half is
    # flip-free: P = 2*(1/2)^3 = 0.25; four rotations ~ 1-(3/4)^4 = 0.68
    assert 0.1 <= r1 <= 0.45
    assert r4 >= r1 + 0.2 and r4 >= 0.5
    df.unpersist()


def test_simhash_n_perms_superset(spark, dup_docs):
    """The rotation union can only ADD candidates: n_perms=2 pairs are a
    superset of n_perms=1 at the same (max_hamming, block_bits), and the
    verify step keeps every reported pair within the radius."""
    base = {
        (r["id_a"], r["id_b"])
        for r in d_simhash.simhash_candidate_pairs(
            dup_docs, "text", "doc_id", max_hamming=3, block_bits=16
        ).collect()
    }
    wide = {
        (r["id_a"], r["id_b"])
        for r in d_simhash.simhash_candidate_pairs(
            dup_docs, "text", "doc_id", max_hamming=3, block_bits=16, n_perms=2
        ).collect()
    }
    assert base <= wide


def test_hamming_clusters_vs_union_find(spark):
    """hamming_clusters == brute-force union-find over the brute pair
    set (exact config), with singletons kept at size 1 — and the
    min-label convergence works for STRING ids (no numeric-sum check)."""
    from sparkclean.dedup.hamming import hamming_clusters

    hashes, _ = _rand_hashes(200, seed=23, planted_flips=3)
    ids = [f"doc_{i:04d}" for i in range(len(hashes))]
    df = spark.createDataFrame(
        list(zip(ids, hashes)), "id: string, phash: long"
    )
    got = {
        r["id"]: (r["cluster_rep"], r["cluster_size"])
        for r in hamming_clusters(df, "id", "phash", max_distance=3).collect()
    }

    # union-find over brute pairs
    parent = {i: i for i in range(len(hashes))}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in _brute_pairs(hashes, 3):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict[int, list[int]] = {}
    for i in range(len(hashes)):
        comps.setdefault(find(i), []).append(i)
    exp = {}
    for members in comps.values():
        rep = ids[min(members)]
        for m in members:
            exp[ids[m]] = (rep, len(members))
    assert got == exp
    assert any(sz > 1 for _, sz in got.values())   # planted pairs clustered
    assert any(sz == 1 for _, sz in got.values())  # singletons preserved


def test_minhash_near_duplicate_clusters(spark, dup_docs):
    """Text keep-one-per-cluster == union-find over the operator's own
    verified pair set (transitive closure, min-id rep, singleton
    preservation).  At threshold 0.8 the planted exact cluster
    {100,101,102,103} stays together and the unrelated doc is a
    singleton (the one-word variant 110 falls below 0.8 — jaccard ~0.6
    — and the sliding-window docs only chain mod-14)."""
    out = {
        r["doc_id"]: (r["cluster_rep"], r["cluster_size"])
        for r in d_minhash.near_duplicate_clusters(
            dup_docs, "text", "doc_id", threshold=0.8
        ).collect()
    }
    assert len(out) == dup_docs.count()

    # the operator's verified pair set is representative-level since the
    # shingle-set collapse, so the oracle union-find also unions each
    # exact-content group (same _gk) — jaccard-1 edges by definition
    pairs = [
        (r["id_a"], r["id_b"])
        for r in d_minhash.near_duplicate_pairs(
            dup_docs, "text", "doc_id", threshold=0.8
        ).collect()
    ]
    gk_members: dict[int, list[int]] = {}
    for r in d_minhash._content_members(dup_docs, "text", "doc_id").select(
        "_id", "_gk"
    ).collect():
        gk_members.setdefault(r["_gk"], []).append(r["_id"])
    for members in gk_members.values():
        rep = min(members)
        pairs.extend((rep, m) for m in members if m != rep)
    ids = sorted(out)
    parent = {i: i for i in ids}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict[int, list[int]] = {}
    for i in ids:
        comps.setdefault(find(i), []).append(i)
    exp = {}
    for members in comps.values():
        rep = min(members)
        for m in members:
            exp[m] = (rep, len(members))
    assert out == exp
    assert out[100] == (100, 4) and out[103] == (100, 4)
    assert out[110] == (110, 1) and out[120] == (120, 1)


def test_embedding_near_duplicate_clusters(spark, vectors):
    """Embedding keep-one-per-cluster == union-find over the operator's
    own verified pair set (the gate table has no >=0.9 pairs, so this
    planted-cluster fixture is the real coverage for the embedding
    cluster path)."""
    out = {
        r["vec_id"]: (r["cluster_rep"], r["cluster_size"])
        for r in s_knn.embedding_near_duplicate_clusters(
            vectors, threshold=0.995, block_col="label"
        ).collect()
    }
    assert len(out) == vectors.count()
    pairs = [
        (r["id_a"], r["id_b"])
        for r in s_knn.embedding_near_duplicates(
            vectors, threshold=0.995, block_col="label"
        ).collect()
    ]
    assert pairs  # fixture plants same-cluster near-dups
    parent = {i: i for i in out}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict[int, list[int]] = {}
    for i in out:
        comps.setdefault(find(i), []).append(i)
    exp = {}
    for members in comps.values():
        rep = min(members)
        for m in members:
            exp[m] = (rep, len(members))
    assert out == exp
    assert any(sz > 1 for _, sz in out.values())


def test_cluster_operators_plan_shape(spark, dup_docs, vectors):
    """No CartesianProduct in any cluster-dedup plan: candidates flow
    through blocked/banded equi-joins and the component loop is
    equi-join + agg rounds (PLANS.md §8)."""
    from sparkclean.dedup.hamming import hamming_clusters

    frames = {
        "minhash_clusters": d_minhash.near_duplicate_clusters(
            dup_docs, "text", "doc_id", threshold=0.8
        ),
        "hamming_clusters": hamming_clusters(
            dup_docs.select(
                "doc_id", F.xxhash64(F.col("text")).alias("ph")
            ),
            "doc_id",
            "ph",
        ),
        "embedding_clusters": s_knn.embedding_near_duplicate_clusters(
            vectors, threshold=0.995, block_col="label"
        ),
    }
    for name, df in frames.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, f"{name} plan has a cartesian product"


# ------------------------------------------- hot-fingerprint guard (r5)


def test_hamming_mega_cluster_linear_not_quadratic(spark):
    """The hot-fingerprint guard (VERDICT r4 item 1): m rows sharing ONE
    fingerprint (blank/solid-color images at corpus scale) collapse to a
    single band-join row — the pair output is linear in DISTINCT hashes
    (zero within-group pairs, not C(m,2)), while clusters still expand
    full membership, including a NULL-fingerprint singleton."""
    from sparkclean.dedup.hamming import hamming_clusters, hamming_pairs

    m = 5000
    h0 = 0x0123456789ABCDEF
    h1 = h0 ^ 0b10000000101  # exactly 3 flipped bits
    far = -0x7EDCBA987654321
    rows = [(i, h0) for i in range(m)] + [(m, h1), (m + 1, far), (m + 2, None)]
    df = spark.createDataFrame(rows, "id: long, phash: long")
    pairs = hamming_pairs(df, "id", "phash", max_distance=3).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs] == [(0, m, 3)]
    cl = {
        r["id"]: (r["cluster_rep"], r["cluster_size"])
        for r in hamming_clusters(df, "id", "phash", max_distance=3).collect()
    }
    assert len(cl) == m + 3
    assert all(cl[i] == (0, m + 1) for i in range(m + 1))
    assert cl[m + 1] == (m + 1, 1)
    assert cl[m + 2] == (m + 2, 1)  # NULL fingerprint stays a singleton


def test_minhash_mega_group_linear_not_quadratic(spark):
    """Same guard on the minhash band join: m identical docs are ONE
    shingle-set group — pair output stays linear (one rep-level pair to
    the near variant), clusters expand the full m+1 membership."""
    # change only the LAST word: 1 of 38 trigram shingles differs →
    # jaccard 37/39 ≈ 0.949, band-hit probability ~1 - 1.7e-6 (a
    # mid-document change leaves ~0.85 jaccard, which misses all 8
    # bands for ~0.2% of fixtures — this one stays deterministic-safe)
    words = [f"w{i:02d}" for i in range(40)]
    base = " ".join(words)
    variant = " ".join(words[:-1] + ["CHANGED"])
    m = 1000
    rows = [(i, base) for i in range(m)] + [
        (m, variant),
        (m + 1, "an entirely unrelated document about spark shuffles and joins"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    pairs = d_minhash.near_duplicate_pairs(df, "text", "doc_id", threshold=0.8).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(0, m)]
    assert 0.8 <= pairs[0]["jaccard"] < 1.0
    cl = {
        r["doc_id"]: (r["cluster_rep"], r["cluster_size"])
        for r in d_minhash.near_duplicate_clusters(
            df, "text", "doc_id", threshold=0.8
        ).collect()
    }
    assert all(cl[i] == (0, m + 1) for i in range(m + 1))
    assert cl[m + 1] == (m + 1, 1)


def test_hamming_twins_on_duplicate_heavy_fixture(spark):
    """Cross-engine pin for the collapse path: Spark and the DuckDB twin
    must agree row-for-row on a fixture dominated by duplicate
    fingerprints (the gate corpus has none, so this is the real twin
    coverage for hgrp/hmem)."""
    import duckdb

    from sparkclean.dedup import hamming as H

    h0 = 0x0123456789ABCDEF
    rows = (
        [(i, h0) for i in range(50)]
        + [(50, h0 ^ 0b11), (51, h0 ^ 0b11), (52, -0x7EDCBA987654321)]
        + [(53, None)]
    )
    df = spark.createDataFrame(rows, "doc_id: long, phash: long")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, phash BIGINT)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    got_pairs = sorted(
        tuple(r) for r in H.hamming_pairs(df, "doc_id", "phash").collect()
    )
    want_pairs = sorted(
        tuple(r)
        for r in con.sql(H.hamming_pairs_sql("documents", "doc_id", "phash")).fetchall()
    )
    assert got_pairs == want_pairs == [(0, 50, 2)]
    got_cl = sorted(
        tuple(r) for r in H.hamming_clusters(df, "doc_id", "phash").collect()
    )
    want_cl = sorted(
        tuple(r)
        for r in con.sql(
            H.hamming_clusters_sql("documents", "doc_id", "phash")
        ).fetchall()
    )
    assert got_cl == want_cl
    assert dict((i, (rep, sz)) for i, rep, sz in got_cl)[53] == (53, 1)


def test_minhash_twins_on_duplicate_heavy_fixture(spark):
    """Cross-engine pin for the shingle-set collapse: duplicate-heavy +
    degenerate rows (empty text, NULL text, whitespace-only) hash
    identically through both engines' collapse + expansion."""
    import duckdb

    words = [f"tok{i:02d}" for i in range(40)]
    base = " ".join(words)
    # last-word change: 1/38 shingles differ, jaccard 37/39 (see the
    # band-hit note in test_minhash_mega_group_linear_not_quadratic)
    variant = " ".join(words[:-1] + ["CHANGED"])
    rows = (
        [(i, base) for i in range(30)]
        + [(30, variant), (31, "short text only"), (32, ""), (33, None), (34, "   ")]
    )
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    got_pairs = sorted(
        tuple(r)
        for r in d_minhash.near_duplicate_pairs(df, "text", "doc_id", 0.8).collect()
    )
    want_pairs = sorted(
        tuple(r)
        for r in con.sql(
            d_minhash.near_duplicate_pairs_sql("documents", "text", "doc_id", 0.8)
        ).fetchall()
    )
    assert got_pairs == want_pairs == [(0, 30, pytest.approx(37 / 39, abs=1e-6))]
    got_cl = sorted(
        tuple(r)
        for r in d_minhash.near_duplicate_clusters(df, "text", "doc_id", 0.8).collect()
    )
    want_cl = sorted(
        tuple(r)
        for r in con.sql(
            d_minhash.near_duplicate_clusters_sql("documents", "text", "doc_id", 0.8)
        ).fetchall()
    )
    assert got_cl == want_cl
    cl = {i: (rep, sz) for i, rep, sz in got_cl}
    assert all(cl[i] == (0, 31) for i in range(31))
    assert all(cl[i] == (i, 1) for i in (31, 32, 33, 34))
