"""PySpark-native analytics engine with the query/data-processing
capabilities of logstash-plugins/logstash-filter-elasticsearch.

The reference plugin runs one Elasticsearch RPC per Logstash event and
merges selected result fields back into the event
(/root/reference/lib/logstash/filters/elasticsearch/dsl_executor.rb:28-91).
This engine inverts that loop into set-oriented Spark dataflow:

    parse  -> vectorized regex extraction of join/route keys
    enrich -> broadcast hash join against a snapshot lookup table
    route  -> partitioned fan-out sinks + quarantine sink
    agg    -> per-sink aggregates (salted two-phase for skew)

Everything is DataFrame/SQL; zero per-row Python on the hot path.
"""

from logstash_filter_elasticsearch_spark.session import get_spark
from logstash_filter_elasticsearch_spark.operators.enrich import EnrichSpec, Enricher

__version__ = "0.1.0"

__all__ = ["get_spark", "EnrichSpec", "Enricher", "__version__"]
