"""ANN route crossover bench (round-5 VERDICT item 7).

The sf0.1 embeddings table is only 2k rows — too small for the "use the
ANN route at scale" claim to be measurable — so this bench synthesises
a deterministic clustered embedding table at a configurable N (default
200k x dim 64), runs the three similarity-search routes over the SAME
Q=100 query rows, and reports seconds + recall@k vs the exact
brute-force answer:

    python bench/ann.py [N]     # appends nothing; prints a JSON line

Results land in BENCH.md (crossover table) so the route choice at
10^12 rows is backed by a measured trend, not an assertion.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def synth_embeddings(spark, n: int, dim: int = 64, n_clusters: int = 256,
                     partitions: int = 32):
    """Deterministic clustered vectors: cluster centers from
    RandomState(7), members = center + small noise keyed by row id.
    Clustered (not uniform) so IVF/LSH have real structure to exploit,
    matching web-embedding geometry."""
    import pandas as pd

    centers = np.random.RandomState(7).randn(n_clusters, dim) * 3.0

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            # per-row noise must not depend on partitioning: derive it
            # counter-style from the id
            noise = np.stack([
                np.random.RandomState((int(i) * 2654435761 + 11) % (2**31)).randn(dim)
                for i in ids
            ])
            vecs = centers[ids % n_clusters] + 0.3 * noise
            yield pd.DataFrame({
                "vec_id": ids,
                "embedding": [v.astype(np.float64).tolist() for v in vecs],
                "label": (ids % 10).astype("int32"),
            })

    return spark.range(0, n, 1, partitions).mapInPandas(
        gen, "vec_id long, embedding array<double>, label int"
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    q_n, k, dim = 100, 10, 64

    from sparkclean.session import get_spark
    from sparkclean.sim import ivf as sim_ivf
    from sparkclean.sim import knn as sim_knn

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("ann-bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    path = f"/tmp/sparkclean_ann_{n}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        synth_embeddings(spark, n, dim).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    queries = df.where(df.vec_id < q_n)

    def run(name, fn):
        best, rows = float("inf"), None
        for _ in range(2):
            t0 = time.time()
            got = fn().collect()
            best = min(best, time.time() - t0)
            rows = got
            spark.catalog.clearCache()
        return best, rows

    t_brute, brute_rows = run("brute", lambda: sim_knn.cosine_topk(df, queries, k=k))
    truth = {}
    for r in brute_rows:
        truth.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall(rows):
        hit = tot = 0
        for r in rows:
            tot += 1
            if r["neighbor_id"] in truth.get(r["query_id"], ()):  # noqa: PLR1714
                hit += 1
        return round(hit / max(tot, 1), 4)

    t_lsh, lsh_rows = run("lsh", lambda: sim_knn.lsh_topk(df, queries, dim=dim, k=k, bands=4))

    # IVF: index training AND cell assignment amortise across query
    # batches at corpus scale (the cell id is a materialised column,
    # ideally the table's partition key), so report build and query
    # separately: build = train + assign + write, query = probe join only
    # scale-appropriate index geometry: candidates/query ~ n*probe/cells;
    # the library defaults (16 cells / probe 4) are sized for the 2k-row
    # gate table, pruning only 4x
    n_cells, n_probe = 128, 8
    t0 = time.time()
    cents = sim_ivf.train_centroids(df, dim, n_cells=n_cells)
    ivf_path = f"/tmp/sparkclean_ann_ivf_{n}"
    df.withColumn(
        "_cell", sim_ivf._assign_udf(cents)(df["embedding"])
    ).write.mode("overwrite").parquet(ivf_path)
    t_ivf_build = time.time() - t0
    indexed = spark.read.parquet(ivf_path)
    t_ivf, ivf_rows = run(
        "ivf",
        lambda: sim_ivf.ivf_topk(
            indexed, queries, dim=dim, k=k, n_cells=n_cells, n_probe=n_probe,
            centroids=cents, cell_col="_cell",
        ),
    )

    print(json.dumps({
        "n": n, "q": q_n, "k": k, "dim": dim, "cpus": cpus,
        "brute_sec": round(t_brute, 2),
        "lsh_sec": round(t_lsh, 2), "lsh_recall": recall(lsh_rows),
        "ivf_build_sec": round(t_ivf_build, 2),
        "ivf_query_sec": round(t_ivf, 2), "ivf_recall": recall(ivf_rows),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
