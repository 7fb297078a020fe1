"""End-to-end parse → enrich → route → aggregate pipeline.

Set-oriented reimagining of the reference's per-event loop
(elasticsearch.rb:214-216 -> dsl_executor.rb:28-91): one declarative
DataFrame program per batch instead of one RPC per event.

Physical plan shape (verified via .explain in tests):

    scan parquet (column-pruned, predicate pushdown)
      -> regexp parse projections        [whole-stage codegen]
      -> BroadcastHashJoin (lookup)      [no shuffle of the big side]
      -> route column
      -> (a) exchange on (route, file-salt) -> partitioned fan-out write
      -> (b) salted two-phase aggregate  -> per-sink metrics

The only shuffle of the event table is the single repartition before
the fan-out write, keyed by (route, hash-salt) so the 60%-skewed route
spreads over many tasks. Per-sink aggregation is salted two-phase
(operators/aggregate.py) so a hot route never lands on one reducer.

Resume: checkpoint.Manifest records committed sinks + lineage +
metrics; re-running skips them (idempotent — tested by kill/resume).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logstash_filter_elasticsearch_spark.checkpoint import Manifest, publish_atomic
from logstash_filter_elasticsearch_spark.operators.aggregate import salted_agg
from logstash_filter_elasticsearch_spark.operators.enrich import EnrichSpec, Enricher
from logstash_filter_elasticsearch_spark.operators.parse import parse_doc_ids

QUARANTINE_ROUTE = "_quarantine"


@dataclass
class PipelineConfig:
    sequences_path: str
    lookup_path: str
    out_dir: str
    # salt buckets per route in the fan-out write; with a 60%-skewed
    # route this bounds the hottest write task at ~60%/N of the data
    files_per_route: int = 32
    salt_buckets: int = 32
    # enrichment config (reference option names, elasticsearch.rb:59-161)
    fields: dict[str, str] = field(
        default_factory=lambda: {
            "payload.response": "resp_code",
            "payload.verb": "verb",
        }
    )
    docinfo_fields: dict[str, str] = field(default_factory=lambda: {"_id": "es_doc_id"})
    aggregation_fields: dict[str, tuple[str, str]] = field(
        default_factory=lambda: {"bytes_avg": ("avg", "payload.bytes")}
    )
    result_size: int = 1
    sort: list[tuple[str, str]] = field(
        default_factory=lambda: [("payload.timestamp_ms", "desc")]
    )
    add_tag_on_match: list[str] = field(default_factory=lambda: ["enriched"])


def build_enriched(spark: SparkSession, cfg: PipelineConfig) -> DataFrame:
    """The lazy logical plan: parse + enrich + route column."""
    seqs = spark.read.parquet(cfg.sequences_path)
    lookup = spark.read.parquet(cfg.lookup_path)

    parsed = parse_doc_ids(seqs)
    spec = EnrichSpec(
        event_key="join_key",
        lookup_key="join_key",
        fields=cfg.fields,
        docinfo_fields=cfg.docinfo_fields,
        aggregation_fields=cfg.aggregation_fields,
        result_size=cfg.result_size,
        sort=cfg.sort,
        add_tag_on_match=cfg.add_tag_on_match,
        broadcast=True,
    )
    enriched = Enricher(spec).apply(parsed, lookup)
    # quarantine routing per tag_on_failure semantics (dsl_executor.rb:79-87)
    return enriched.withColumn(
        "route",
        F.when(F.col("parse_ok"), F.col("route_source")).otherwise(
            F.lit(QUARANTINE_ROUTE)
        ),
    )


def compute_route_aggregates(df: DataFrame, salt_buckets: int = 32) -> DataFrame:
    """Per-sink aggregates (the set-form of aggregation_fields,
    dsl_executor.rb:71-77): rows, token sum, matched rows per route."""
    return salted_agg(
        df.withColumn("_matched_i", F.col("matched").cast("long")),
        keys=["route"],
        aggs={
            "rows": ("count", "route"),
            "sum_n_tok": ("sum", "n_tok"),
            "matched_rows": ("sum", "_matched_i"),
        },
        salt_buckets=salt_buckets,
    )


def run_pipeline(spark: SparkSession, cfg: PipelineConfig) -> dict:
    """Execute with manifest-gated idempotent commits. Returns metrics."""
    os.makedirs(cfg.out_dir, exist_ok=True)
    manifest = Manifest(os.path.join(cfg.out_dir, "_MANIFEST.json"))

    df = build_enriched(spark, cfg)

    agg_rows = compute_route_aggregates(df, cfg.salt_buckets).collect()
    route_metrics = {
        r["route"]: {
            "rows": r["rows"],
            "sum_n_tok": r["sum_n_tok"],
            "matched_rows": r["matched_rows"],
        }
        for r in agg_rows
    }

    committed = manifest.committed_routes
    pending = sorted(set(route_metrics) - committed)
    run_id = manifest.begin_run(
        {
            "sequences_path": cfg.sequences_path,
            "lookup_path": cfg.lookup_path,
            "pending_routes": pending,
        }
    )

    if pending:
        staging = os.path.join(cfg.out_dir, f"_staging_{run_id}")
        writable = df.filter(F.col("route").isin(pending))
        # spread the skewed route across files_per_route buckets so the
        # fan-out write is balanced (one hot route != one hot task)
        writable = writable.repartition(
            F.col("route"), F.pmod(F.hash("doc_id"), F.lit(cfg.files_per_route))
        )
        writable.write.mode("overwrite").partitionBy("route").parquet(staging)

        input_files = spark.read.parquet(cfg.sequences_path).inputFiles()
        for route in pending:
            src = os.path.join(staging, f"route={route}")
            if not os.path.exists(src):
                continue
            publish_atomic(src, os.path.join(cfg.out_dir, "sinks", f"route={route}"))
            manifest.commit_route(
                route,
                run_id,
                metrics=route_metrics[route],
                lineage={
                    "n_input_files": len(input_files),
                    "input_files_sample": sorted(input_files)[:5],
                    "lookup_path": cfg.lookup_path,
                },
            )
        shutil.rmtree(staging, ignore_errors=True)

    # per-sink aggregates sink (rebuilt from the manifest every run)
    agg_out = [
        (route, e["metrics"]["rows"], e["metrics"]["sum_n_tok"], e["metrics"]["matched_rows"])
        for route, e in sorted(manifest.data["routes"].items())
    ]
    spark.createDataFrame(
        agg_out, "route string, rows long, sum_n_tok long, matched_rows long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(cfg.out_dir, "aggregates.parquet")
    )

    return {
        "run_id": run_id,
        "routes": route_metrics,
        "committed": sorted(manifest.committed_routes),
        "skipped_previously_committed": sorted(committed & set(route_metrics)),
        "total_rows": sum(m["rows"] for m in route_metrics.values()),
        "total_tokens": sum(m["sum_n_tok"] for m in route_metrics.values()),
    }
