from conte_to_fresco_etl_spark.streaming.pipeline import (  # noqa: F401
    stream_dedup,
    stream_eav_source,
    stream_set3,
    start_continuous_rollup,
    start_set3_stream,
    stream_stream_attribution_join,
    windowed_event_rates,
)
from conte_to_fresco_etl_spark.streaming.stateful import (  # noqa: F401
    sessionize,
)
