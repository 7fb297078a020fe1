"""Benchmark harness.

Two parts:

1. Headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
   /root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` — per-query
   wall seconds, materialized via the noop sink (full execution, no
   collect overhead).
2. The north-rule scaling evidence: the full parse→enrich→route→
   aggregate pipeline on an identical generated sequences dataset at
   two parallelism levels (local[8] vs local[32] — the in-sandbox stand-
   in for N vs 4N executors), reporting sequences/sec at both and the
   scaling efficiency speedup/4. Each level runs in its own subprocess
   (a JVM can't change master once started).

Prints ONE JSON line: {"metric", "value", "unit", "queries", "sf", ...}.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

BENCH_ROWS = int(os.environ.get("LFES_BENCH_ROWS", "8000000"))
BENCH_REPS = int(os.environ.get("LFES_BENCH_REPS", "3"))
BENCH_DATA = os.path.join(REPO, ".bench_data", f"seq_{BENCH_ROWS}")

HEADLINE = [
    "enrich_left_join",
    "fields_multi_hit",
    "docinfo_latest",
    "topk_per_key",
    "esql_stats_by",
    "dedup_exact",
    "ngram_jaccard",
    "quality_scores",
    "fingerprint",
    "salted_route_agg",
    "embedding_topk",
    "minhash_lsh",
]


def ensure_bench_data() -> str:
    from logstash_filter_elasticsearch_spark.data.gen import write_dataset

    if not os.path.exists(os.path.join(BENCH_DATA, "_DONE")):
        shutil.rmtree(BENCH_DATA, ignore_errors=True)
        os.makedirs(BENCH_DATA, exist_ok=True)
        # >=64 files so the scan parallelizes past 32 cores (a single
        # 8-file layout caps the scan stage at 8 tasks and flattens the
        # N-vs-4N scaling curve)
        write_dataset(
            BENCH_DATA,
            n_rows=BENCH_ROWS,
            seed=42,
            mean_tok=48,
            rows_per_file=max(BENCH_ROWS // 64, 10_000),
        )
        open(os.path.join(BENCH_DATA, "_DONE"), "w").write("ok")
    return BENCH_DATA


def pipeline_worker(cores: int, data_dir: str, out_dir: str) -> None:
    """Subprocess entry: run the pipeline at local[cores].

    One full warm-up run (JIT + codegen compile + parquet footer cache),
    then BENCH_REPS measured runs into fresh sink dirs, reporting the
    best. This host shows 2-3x run-to-run noise (shared hypervisor);
    best-of-N against a warmed JVM is the stable, comparable number.
    """
    from logstash_filter_elasticsearch_spark.pipeline import PipelineConfig, run_pipeline
    from logstash_filter_elasticsearch_spark.session import get_spark

    spark = get_spark(app_name=f"bench-{cores}", cores=cores)

    def one_run(tag: str):
        run_dir = os.path.join(out_dir, tag)
        shutil.rmtree(run_dir, ignore_errors=True)
        cfg = PipelineConfig(
            sequences_path=os.path.join(data_dir, "sequences"),
            lookup_path=os.path.join(data_dir, "lookup.parquet"),
            out_dir=run_dir,
        )
        t0 = time.monotonic()
        metrics = run_pipeline(spark, cfg)
        dt = time.monotonic() - t0
        shutil.rmtree(run_dir, ignore_errors=True)
        return dt, metrics

    one_run("warmup")
    best, metrics = min((one_run(f"r{i}") for i in range(BENCH_REPS)), key=lambda x: x[0])
    print(json.dumps({"cores": cores, "seconds": best, "rows": metrics["total_rows"]}))
    spark.stop()


def run_scaling(data_dir: str, levels=(8, 32)) -> dict:
    results = {}
    # tmpfs when available: the scaling measurement targets compute +
    # shuffle, not the sandbox's disk throughput
    out_root = "/dev/shm/lfes_bench_out" if os.path.isdir("/dev/shm") else os.path.join(
        REPO, ".bench_out"
    )
    for cores in levels:
        out_dir = os.path.join(out_root, f"c{cores}")
        shutil.rmtree(out_dir, ignore_errors=True)
        env = dict(os.environ, PYTHONPATH=REPO)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--pipeline-worker",
             str(cores), data_dir, out_dir],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
        shutil.rmtree(out_dir, ignore_errors=True)
    lo, hi = levels
    thr = {c: results[c]["rows"] / results[c]["seconds"] for c in levels}
    speedup = thr[hi] / thr[lo]
    return {
        f"pipeline_local{lo}_seq_per_s": round(thr[lo], 1),
        f"pipeline_local{hi}_seq_per_s": round(thr[hi], 1),
        f"pipeline_local{lo}_sec": round(results[lo]["seconds"], 2),
        f"pipeline_local{hi}_sec": round(results[hi]["seconds"], 2),
        "pipeline_rows": results[hi]["rows"],
        "scaling_speedup": round(speedup, 3),
        "scaling_efficiency": round(speedup / (hi / lo), 3),
    }


def run_headline(sf_dir: str, cores: int) -> dict:
    import __spark_entry__ as entrymod
    from logstash_filter_elasticsearch_spark.session import get_spark

    spark = get_spark(app_name="bench-queries", cores=cores)
    qs = entrymod.queries()
    timings = {}
    for name in HEADLINE:
        fn = qs[name]
        fn(spark, sf_dir).limit(1).count()  # warm plan/codegen path
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - t0, 3)
    spark.stop()
    return timings


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--pipeline-worker":
        pipeline_worker(int(sys.argv[2]), sys.argv[3], sys.argv[4])
        return

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    data_dir = ensure_bench_data()
    scaling = run_scaling(data_dir)
    queries = run_headline(sf_dir, cpus)

    out = {
        "metric": "e2e parse-enrich-route-aggregate throughput, local[32]",
        "value": scaling["pipeline_local32_seq_per_s"],
        "unit": "seq/sec",
        "queries": queries,
        "sf": sf,
        **scaling,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
