from etlpy_spark.streaming.incremental import (  # noqa: F401
    process_increment,
    stream_snapshot_table,
)
