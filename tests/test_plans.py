"""Physical-plan quality gates: the 100 TB design points must be
visible in the executed plan, not just asserted in prose.

- filters reach the parquet scan (PushedFilters)
- column pruning reaches the scan (ReadSchema carries only used cols)
- the enrichment join is a BroadcastHashJoin (no shuffle of the big side)
- hot-path stages run inside WholeStageCodegen with zero Python nodes
"""

import pytest
from pyspark.sql import functions as F


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def parquet_events(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("plans") / "events.parquet")
    spark.range(0, 1000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 50).alias("user_id"),
        F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias("event_type"),
        (F.col("id") * 1.5).alias("value"),
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("props"),
    ).write.mode("overwrite").parquet(p)
    return p


def test_filter_pushdown_reaches_scan(spark, parquet_events):
    df = spark.read.parquet(parquet_events).filter(
        (F.col("event_type") == "t1") & (F.col("value") > 10)
    ).select("event_id", "value")
    plan = _executed(df)
    assert "PushedFilters" in plan
    assert "IsNotNull(event_type)" in plan or "EqualTo(event_type,t1)" in plan


def test_column_pruning_reaches_scan(spark, parquet_events):
    df = spark.read.parquet(parquet_events).select("event_id", "user_id")
    plan = _executed(df)
    m = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert m, plan
    # the 2-column projection must NOT read value/props/event_type
    assert "props" not in m[0] and "value" not in m[0]


def test_enrich_is_broadcast_and_codegen(spark, parquet_events):
    from logstash_filter_elasticsearch_spark.operators.enrich import (
        EnrichSpec,
        Enricher,
    )

    events = spark.read.parquet(parquet_events)
    lookup = spark.range(0, 50).select(
        F.col("id").alias("k"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    spec = EnrichSpec(
        event_key="user_id", lookup_key="k", fields={"name": "nm"},
        result_size=1, sort=[("name", "asc")],
    )
    out = Enricher(spec).apply(events, lookup)
    out.collect()  # materialize so AQE finalizes the physical plan
    plan = _executed(out)
    assert "isFinalPlan=true" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan       # the big side must not shuffle
    # "*(n)" is the WholeStageCodegen marker in AQE final-plan strings
    assert "WholeStageCodegen" in plan or "*(" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_template_static_clauses_push_down(spark, parquet_events):
    """Template static conjuncts must land in the lookup scan's
    PushedFilters — the broadcast payload shrinks before it ships."""
    from logstash_filter_elasticsearch_spark.plans.template import (
        enrich_with_template,
    )

    events = spark.read.parquet(parquet_events)
    lookup_path = parquet_events  # reuse as a lookup table
    lookup = spark.read.parquet(lookup_path)
    out = enrich_with_template(
        events,
        lookup,
        {
            "size": 1,
            "sort": [{"value": "desc"}],
            "query": {
                "bool": {
                    "filter": [
                        {"term": {"event_type": "t1"}},
                        {"term": {"user_id": "%{[user_id]}"}},
                    ]
                }
            },
        },
        fields={"props": "p"},
    )
    plan = _executed(out)
    assert "EqualTo(event_type,t1)" in plan  # static clause pushed to scan
    assert "BroadcastHashJoin" in plan


def test_prefix_node_pushes_startswith_to_scan(spark, parquet_events):
    """The prefix template node must reach the parquet reader as
    StringStartsWith — leading-match selectivity applies at the scan."""
    from logstash_filter_elasticsearch_spark.plans.template import (
        compile_template,
        to_column,
    )

    t = compile_template({"query": {"prefix": {"event_type": "t1"}}})
    df = (
        spark.read.parquet(parquet_events)
        .filter(to_column(t.conjuncts()[0], F.col))
        .select("event_id")
    )
    plan = _executed(df)
    assert "StringStartsWith(event_type,t1)" in plan


def test_analyzed_match_and_hash_sample_stay_jvm_side(spark, parquet_events):
    """match_analyzed tokenization and the deterministic HASH sample
    predicate are pure codegen expressions — zero Python eval nodes,
    and the sample filter sits before any exchange."""
    from logstash_filter_elasticsearch_spark.plans.esql import run_esql
    from logstash_filter_elasticsearch_spark.plans.template import (
        compile_template,
        to_column,
    )

    events = spark.read.parquet(parquet_events)
    t = compile_template({"query": {"match": {"props": "p1 p2"}}})
    plan = _executed(events.filter(to_column(t.conjuncts()[0], F.col)))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    sampled = run_esql(
        spark,
        "FROM t | SAMPLE 0.25 HASH(event_id, 7) | STATS c = COUNT(*)",
        tables={"t": events},
    )
    plan = _executed(sampled)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the sample filter executes BELOW the aggregate's exchange (plan
    # strings print root-first, so the child Filter appears after it)
    assert plan.index("Exchange") < plan.index("Filter")
