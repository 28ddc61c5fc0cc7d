from maston_spark.streaming.ops import (  # noqa: F401
    drop_duplicates_within_watermark,
    session_window_agg,
    sliding_window_agg,
    stream_static_join,
    stream_stream_join,
    tumbling_window_agg,
)
from maston_spark.streaming.runner import run_forever  # noqa: F401
from maston_spark.streaming.topology import (  # noqa: F401
    delta_topology,
    dynamic_avro_topology,
    simple_validated_topology,
)
