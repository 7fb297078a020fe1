"""Whole-contract physical-plan audit: every queries() entry, one sweep.

``tests/test_plans.py`` pins plan-quality properties (pushdown,
pruning, broadcast-not-shuffle, codegen) for a handful of load-bearing
operators. This tool extends the anti-pattern scan to the ENTIRE
driver contract: it compiles all `queries()` entries against a small
sf dir (plans only — nothing is executed) and greps the physical plan
for the things that kill a 100 TB run:

* ``BatchEvalPython`` — row-at-a-time Python UDF in the plan. Always a
  defect here: the engine's rule is built-ins or Arrow-batched stages.
* ``CartesianProduct`` — a non-broadcast cartesian join. The engine's
  deliberate cross-joins are all broadcast-one-side and therefore
  compile to ``BroadcastNestedLoopJoin`` instead, so any
  ``CartesianProduct`` is an unintended all-pairs shuffle.

Arrow-batched Python stages (``ArrowEvalPython``, ``MapInPandas``,
``FlatMapGroupsInPandas``) are the sanctioned slow path for the
declared UDF operators (multimodal codecs, embedding signatures); they
are counted and reported, not failed.

Usage: python tools/plan_audit.py [sf_dir]
Prints one line per query + a summary; exit 1 if any forbidden node
appears.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FORBIDDEN = ("BatchEvalPython", "CartesianProduct")
REPORTED = ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as entrymod
    from logstash_filter_elasticsearch_spark.session import get_spark

    spark = get_spark(app_name="plan-audit", cores=8)
    failures: list[str] = []
    arrow_users: dict[str, list[str]] = {}

    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, sf_dir)
            # physical plan without executing the query; AQE leaves
            # this as the initial plan, which is what we audit
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "simple"
                )
            )
        except Exception as e:  # a query that cannot even compile
            failures.append(f"{name}: plan build failed: {e}")
            print(f"FAIL  {name}: {e}")
            continue
        bad = [n for n in FORBIDDEN if n in plan]
        arrows = [n for n in REPORTED if n in plan]
        if bad:
            failures.append(f"{name}: {bad}")
            print(f"FAIL  {name}: forbidden {bad}")
        else:
            tag = f"  [arrow: {','.join(arrows)}]" if arrows else ""
            print(f"ok    {name}{tag}")
        if arrows:
            arrow_users[name] = arrows

    spark.stop()
    print()
    print(
        f"{len(arrow_users)} queries use Arrow-batched Python stages: "
        f"{sorted(arrow_users)}"
    )
    if failures:
        print(f"\n{len(failures)} FORBIDDEN plan nodes:")
        for f in failures:
            print("  " + f)
        return 1
    print("ALL PLANS CLEAN (no BatchEvalPython, no CartesianProduct)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
