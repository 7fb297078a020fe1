from logstash_filter_elasticsearch_spark.functions.fieldref import (
    field_ref_to_path,
    sprintf_expr,
    nest_dotted,
    mark_sub_elements,
)

__all__ = ["field_ref_to_path", "sprintf_expr", "nest_dotted", "mark_sub_elements"]
