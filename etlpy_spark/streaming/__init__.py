from etlpy_spark.streaming.incremental import (  # noqa: F401
    process_increment,
    stream_snapshot_table,
)
from etlpy_spark.streaming.windows import (  # noqa: F401
    crawl_log_event_time,
    running_host_totals,
    windowed_fetch_counts,
)
