from logstash_filter_elasticsearch_spark.plans.esql import run_esql, validate_params

__all__ = ["run_esql", "validate_params"]
