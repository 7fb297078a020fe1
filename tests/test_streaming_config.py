"""Streaming pipeline + config-validation tests."""

import os

import pyarrow.dataset as pads
import pytest

from logstash_filter_elasticsearch_spark.config import ConfigError, QueryConfig, check_tables
from logstash_filter_elasticsearch_spark.streaming.pipeline import (
    run_streaming_pipeline,
    windowed_source_counts,
)


def test_streaming_fanout_matches_batch(spark, seq_data, tmp_path):
    """availableNow stream over the same input: routed rows equal the
    batch pipeline's totals; quarantine preserved."""
    out = str(tmp_path / "stream_out")
    q = run_streaming_pipeline(
        spark,
        seq_data["seq_dir"],
        seq_data["lookup"],
        out_dir=out,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    total = 0
    quarantined = 0
    for batch_dir in os.listdir(out):
        ds = pads.dataset(os.path.join(out, batch_dir)).to_table(columns=["doc_id", "tags"])
        total += ds.num_rows
        quarantined += sum(
            1 for t in ds.column("tags").to_pylist() if t and "_grokparsefailure" in t
        )
    assert total == 2000  # every input row delivered exactly once
    assert quarantined > 0


def test_windowed_counts_on_static(spark, seq_data):
    """Window aggregation logic validated on a static frame (same plan
    shape Structured Streaming executes incrementally)."""
    from pyspark.sql import functions as F

    from logstash_filter_elasticsearch_spark.operators.parse import parse_doc_ids

    df = parse_doc_ids(spark.read.parquet(seq_data["seq_dir"])).withColumn(
        "ts", F.to_timestamp(F.from_unixtime(F.col("epoch")))
    ).filter(F.col("parse_ok"))
    out = windowed_source_counts(df, ts_col="ts", key_col="route_source", window="1 hour")
    rows = out.collect()
    assert sum(r["rows"] for r in rows) == df.count()
    assert all(r["window_end"] > r["window_start"] for r in rows)


def test_query_config_validation():
    QueryConfig(query_type="dsl", query="response:404").validate()
    QueryConfig(query_type="esql", query="FROM t | WHERE a == ?x",
                query_params={"x": 1}).validate()

    with pytest.raises(ConfigError, match="only one"):
        QueryConfig(query="a", query_template="b").validate()
    with pytest.raises(ConfigError, match="Either query or"):
        QueryConfig().validate()
    with pytest.raises(ConfigError, match="empty"):
        QueryConfig(query_template="   ").validate()
    with pytest.raises(ConfigError, match="ES\\|QL-only"):
        QueryConfig(query="a", query_params={"x": 1}).validate()
    with pytest.raises(ConfigError, match="not allowed with ES"):
        QueryConfig(query_type="esql", query="FROM t",
                    dsl_params={"index": "foo"}).validate()
    with pytest.raises(Exception, match="no matching query_params"):
        QueryConfig(query_type="esql", query="FROM t | WHERE a == ?x").validate()


def test_check_tables(spark, seq_data):
    check_tables(
        spark,
        {"sequences": seq_data["seq_dir"], "lookup": seq_data["lookup"]},
        required_cols={"sequences": ["doc_id", "tokens", "n_tok", "source"],
                       "lookup": ["join_key", "payload"]},
    )
    with pytest.raises(ConfigError, match="unreadable"):
        check_tables(spark, {"nope": "/nonexistent/path"})
    with pytest.raises(ConfigError, match="missing columns"):
        check_tables(spark, {"lookup": seq_data["lookup"]},
                     required_cols={"lookup": ["not_a_column"]})


def test_stateful_first_seen_dedup(spark, seq_data, tmp_path):
    """applyInPandasWithState dedup: exactly one output row per join_key
    across all micro-batches."""
    from pyspark.sql import functions as F

    from logstash_filter_elasticsearch_spark.operators.parse import parse_doc_ids
    from logstash_filter_elasticsearch_spark.streaming.pipeline import (
        stateful_first_seen,
    )

    schema = spark.read.parquet(seq_data["seq_dir"]).schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1  # force multiple micro-batches
    ).parquet(seq_data["seq_dir"])
    parsed = parse_doc_ids(stream).filter(F.col("parse_ok")).select(
        "doc_id", "join_key", "n_tok"
    )
    deduped = stateful_first_seen(parsed, "join_key")

    out = str(tmp_path / "dedup_out")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    import pyarrow.dataset as pads

    got = pads.dataset(out).to_table(columns=["join_key"]).column("join_key").to_pylist()
    n_keys = (
        parse_doc_ids(spark.read.parquet(seq_data["seq_dir"]))
        .filter(F.col("parse_ok"))
        .select("join_key")
        .distinct()
        .count()
    )
    assert len(got) == len(set(got)) == n_keys


def test_session_windows_on_static(spark, seq_data):
    """Session-window logic on a static frame: sessions split exactly at
    gaps > the threshold, and totals are preserved."""
    from pyspark.sql import functions as F

    from logstash_filter_elasticsearch_spark.operators.parse import parse_doc_ids
    from logstash_filter_elasticsearch_spark.streaming.pipeline import (
        sessionized_counts,
    )

    df = (
        parse_doc_ids(spark.read.parquet(seq_data["seq_dir"]))
        .filter(F.col("parse_ok"))
        .withColumn("ts", F.to_timestamp(F.from_unixtime(F.col("epoch"))))
    )
    out = sessionized_counts(df, ts_col="ts", key_col="route_source", gap="5 minutes")
    rows = out.collect()
    assert sum(r["rows"] for r in rows) == df.count()
    assert all(r["session_end"] > r["session_start"] for r in rows)
    # sessions for one key never overlap
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r["route_source"], []).append(
            (r["session_start"], r["session_end"])
        )
    for spans in by_key.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert s2 >= e1
