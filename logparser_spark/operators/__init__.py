from logparser_spark.operators.mine import mine_templates
from logparser_spark.operators.assign import assign_templates
from logparser_spark.operators.enrich import enrich
from logparser_spark.operators.route import with_sink_id, route_write
from logparser_spark.operators.aggregate import salted_agg, sink_window_counts, turn_window_counts

__all__ = [
    "mine_templates",
    "assign_templates",
    "enrich",
    "with_sink_id",
    "route_write",
    "salted_agg",
    "sink_window_counts",
    "turn_window_counts",
]
