"""Benchmark harness — prints ONE JSON line per run.

Headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS], plus the fused image+caption pipeline over
the deterministic synthetic corpus (throughput metric: images/sec for
keep-drop + scrub, per BASELINE.json).

Usage: python bench.py            # driver mode, one JSON line on stdout
       SPARKCLEAN_BENCH_N=... python bench.py   # override image count
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# process-global for the multi-core VM probe: set by run() right before
# the ProcessPoolExecutor forks, so workers inherit the loaded sample
_PROBE_SAMPLE = None


def _mt_probe_worker(_i: int) -> float:
    """One kernel pass over the fork-inherited probe sample; used by the
    multi-core canary (processes, not threads — see run())."""
    from sparkclean.images.decode import _stats_for_batch

    t0 = time.time()
    _stats_for_batch(_PROBE_SAMPLE)
    return time.time() - t0


HEADLINE = [
    "caption_quality_pipeline",
    "issues_low_self_confidence",
    "minhash_near_duplicates",
    "knn_bruteforce",
    "ood_knn_distance",  # added r2: shared bucketed knn_edges path
    "confident_joint_raw",
    "events_hourly",
]


def run(sf_dir: str, cpus: int, image_n: int, include_headline: bool = True) -> dict:
    import __spark_entry__ as entry_mod
    from sparkclean.pipeline import (
        run_image_caption_quality,
        run_image_caption_quality_from_path,
    )
    from sparkclean.session import get_spark
    from sparkclean.synth import synth_images

    spark = get_spark(
        "sparkclean-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    if include_headline:
        qs = entry_mod.queries()
        for name in HEADLINE:
            # best of two reps (same methodology as the image stage /
            # bench/scaling.py): rep 1 pays python-worker spawn + JIT for
            # whichever query hits them first, and local-mode runs show
            # ±20% scheduling noise; rep 2 is the steady-state number.
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
                # queries persist intermediates; drop them so reps and
                # later stages measure clean, not under cache pressure
                spark.catalog.clearCache()
            timings[name] = round(best, 3)

    # rescue observability: the ood_knn_distance rep above rebuilt the
    # shared knn_edges graph at this sf — record how many query rows hit
    # the broadcast rescue backstop (must stay ~0; see sim/knn.py)
    from sparkclean.sim import knn as sim_knn

    rescue_count = sim_knn.LAST_RESCUE_COUNT

    # fused image pipeline over the synthetic corpus (decode + score +
    # scrub).  Corpus is generated once to /tmp (deterministic, keyed by
    # N) and scanned with the python-native reader; generation is setup,
    # not workload.
    # v3: luma32 phash + seed-derived duplicate dimensions (synth.py) —
    # cached corpora from older definitions would fail phash validation
    corpus_path = f"/tmp/sparkclean_bench_corpus_v3_{image_n}"
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        synth_images(
            spark, image_n, with_images=True, partitions=max(cpus * 8, 64),
            base_px=64, px_step=24,
        ).write.mode("overwrite").parquet(corpus_path)
    # warm python workers (untimed)
    run_image_caption_quality(
        spark.read.parquet(corpus_path).limit(500)
    ).write.format("noop").mode("overwrite").save()
    # best of two repetitions (same methodology as bench/scaling.py): the
    # first pass pays python-worker spawn + JIT, and local-mode runs show
    # ±20% scheduling noise; the second pass is the steady-state number a
    # long-running cluster job sees.
    # Per-stage sub-timings (self-diagnosing bench, round-5): the image
    # number decomposes into the three jobs the pipeline actually runs —
    #   pass1_scan_thresholds: decode+caption-feature Arrow scan into the
    #     persist, paid by the thresholds aggregation;
    #   pass2_issue_count: fused issue-count agg over the cached frame;
    #   final_write: bottom-n selection + scrub + noop write;
    #   plan_build_other: driver-side plan construction remainder.
    # The breakdown recorded is the one from the BEST rep, so the stages
    # sum to (approximately) the reported image_pipeline number.
    image_secs = float("inf")
    image_stages: dict[str, float] = {}
    for _ in range(2):
        st: dict[str, float] = {}
        t0 = time.time()
        out = run_image_caption_quality_from_path(spark, corpus_path, stage_times=st)
        t_build = time.time() - t0
        t0w = time.time()
        out.write.format("noop").mode("overwrite").save()
        t_write = time.time() - t0w
        rep_total = t_build + t_write
        if rep_total < image_secs:
            image_secs = rep_total
            image_stages = dict(st)
            image_stages["final_write"] = round(t_write, 3)
            image_stages["plan_build_other"] = round(
                t_build - sum(st.values()), 3
            )
        spark.catalog.clearCache()
    timings["image_pipeline"] = round(image_secs, 3)

    # Decode-stage isolation (diagnostic, not part of the suite total):
    # the same corpus through the Arrow scan alone, with and without the
    # fused caption-feature kernel — separates "decode got slower" from
    # "caption scoring got slower" from "the aggregation jobs got slower".
    from sparkclean.images.decode import decode_scan

    for flag, key in ((False, "decode_scan_only"), (True, "decode_scan_with_captions")):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            decode_scan(spark, corpus_path, with_caption_features=flag).write.format(
                "noop"
            ).mode("overwrite").save()
            best = min(best, time.time() - t0)
        image_stages[key] = round(best, 3)

    # VM-speed canary: the decode/stats kernel over a fixed 3000-row
    # corpus sample, single-threaded, best-of-two.  The kernel is
    # deterministic and was unchanged across runs where this probe read
    # 1950 vs 1270 rows/s (BENCH.md round-4 notes) — this VM has
    # multi-ten-minute ~1.5x degraded epochs, so the probe calibrates
    # every recorded bench number: compare probes before comparing
    # suites.
    probe = None
    try:
        import glob as _glob

        import pandas as _pd
        import pyarrow.parquet as _pq

        from sparkclean.images.decode import _stats_for_batch

        dfs, got = [], 0
        for f in sorted(_glob.glob(os.path.join(corpus_path, "*.parquet"))):
            t = _pq.read_table(f)
            dfs.append(t.to_pandas())
            got += len(t)
            if got >= 3000:
                break
        sample = _pd.concat(dfs).head(3000)
        _stats_for_batch(sample)  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            _stats_for_batch(sample)
            best = min(best, time.time() - t0)
        probe = round(len(sample) / best, 0)

        # Multi-core canary (round-5): the single-thread probe provably
        # under-detects — the r4 driver run read probe=1999 (clean)
        # alongside a 25.2 s suite.  Run the same kernel in min(cpus, 8)
        # concurrent PROCESSES (Spark's python workers are processes;
        # threads are GIL-bound here — a thread pool measured aggregate
        # BELOW single-thread) to surface memory-bandwidth contention
        # the solo probe can't see.  Reports aggregate rows/s and
        # efficiency vs (single-process probe x workers): on a clean VM
        # this sits ~0.6-0.9 (shared DRAM); a contended epoch drags it
        # well below its own history even when the solo probe looks
        # clean.
        from concurrent.futures import ProcessPoolExecutor

        global _PROBE_SAMPLE
        _PROBE_SAMPLE = sample  # fork-inherited by the pool workers
        nworkers = min(cpus, 8)
        with ProcessPoolExecutor(nworkers) as ex:
            list(ex.map(_mt_probe_worker, range(nworkers)))  # warm/spawn
            best_mt = float("inf")
            for _ in range(2):
                t0 = time.time()
                list(ex.map(_mt_probe_worker, range(nworkers)))
                best_mt = min(best_mt, time.time() - t0)
        probe_mt = round(nworkers * len(sample) / best_mt, 0)
        probe_mt_eff = round(probe_mt / (probe * nworkers), 3) if probe else None
    except Exception:
        probe_mt = None
        probe_mt_eff = None
        nworkers = None

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline suite wall time (keep-drop+scrub incl. image decode)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else None,
        "images_per_sec": round(image_n / image_secs, 1),
        "image_n": image_n,
        "cpus": cpus,
        "knn_rescue_rows": rescue_count if include_headline else None,
        "vm_probe_rows_per_sec": probe,
        "vm_probe_mt_rows_per_sec": probe_mt,
        "vm_probe_mt_workers": nworkers,
        "vm_probe_mt_efficiency": probe_mt_eff,
        "image_stages": image_stages,
    }
    spark.stop()
    return result


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    image_n = int(os.environ.get("SPARKCLEAN_BENCH_N", "240000"))
    result = run(sf_dir, cpus, image_n)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
