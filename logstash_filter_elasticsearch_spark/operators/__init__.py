from logstash_filter_elasticsearch_spark.operators.enrich import EnrichSpec, Enricher

__all__ = ["EnrichSpec", "Enricher"]
