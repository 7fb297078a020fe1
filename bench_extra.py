"""Extra benchmarks for optimization work (guide §1.4).

``bench.py`` is frozen for measurement; this harness reproduces its
per-query methodology (warm once, median of reps via the noop sink) for
any subset of declared queries, at any SF dir, and can dump
``.explain("formatted")`` plans for the judge's plan evidence.

Usage:
    python bench_extra.py [--reps N] [--plans DIR] [query ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
Prints one JSON line: {"sf_dir", "queries": {name: {"median", "samples"}}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _median(xs):
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: bench.py HEADLINE)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None, help="dump explain('formatted') per query here")
    ap.add_argument("--no-time", action="store_true", help="plans only, skip timing")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from bench import HEADLINE
    from logstash_filter_elasticsearch_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    names = args.names or HEADLINE

    spark = get_spark(app_name="bench-extra", cores=cpus)
    qs = entrymod.queries()
    out = {}
    for name in names:
        fn = qs[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            plan = fn(spark, sf_dir)._sc._jvm.PythonSQLUtils.explainString(
                fn(spark, sf_dir)._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as f:
                f.write(plan)
        if args.no_time:
            continue
        spark.sparkContext.setJobDescription(f"warm:{name}")
        fn(spark, sf_dir).limit(1).count()  # warm plan/codegen path
        samples = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name}:rep{i}")
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.monotonic() - t0, 3))
        out[name] = {"median": round(_median(samples), 3), "samples": samples}
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)
    spark.stop()
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
