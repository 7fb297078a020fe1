from logstash_filter_elasticsearch_spark.sources.tables import TableCatalog

__all__ = ["TableCatalog"]
