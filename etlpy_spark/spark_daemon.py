"""Python-worker daemon with pre-warmed heavy imports.

Spark forks one Python worker per concurrent task slot from a single
daemon process (``pyspark/daemon.py``; selected via the
``spark.python.daemon.module`` conf, see Spark's PythonWorkerFactory).
The stock daemon only imports pyspark core, so every FRESHLY FORKED
worker pays the numpy+pandas import (~0.4 s on this host) before its
first Arrow-UDF batch.  Importing the heavy modules HERE, in the
daemon parent, before ``manager()`` starts forking means every child
inherits them already-initialized via copy-on-write fork — the import
cost is paid once per executor instead of once per worker.

Measured effect, honestly: on the local bench it is NIL — the untimed
warm-up round forks and warms the whole pool, and in-UDF probes show
0.000 s import time in every worker (the Arrow serializer imports
pandas before the UDF body even runs, so reused workers never pay it
again).  The win is confined to each executor's FIRST task wave — a
real concern on a 1000-executor cluster with dynamic allocation
(every ramp-up forks cold pools on new executors), a non-event on a
long-lived local[N] session.  Kept because it is ~free and
production-shaped; not claimed as a local speedup.

Enabled by default in :func:`etlpy_spark.session.get_spark`
(``spark.python.daemon.module = etlpy_spark.spark_daemon``); set
``ETLPY_DAEMON_PRELOAD=0`` to fall back to the stock daemon.
"""

import importlib

for _m in (
    "numpy",
    "pandas",
    "pyarrow",
    "pyarrow.parquet",
    # lazily imported by the worker on the first Arrow-UDF task:
    "pyspark.sql.pandas.serializers",
    "pyspark.sql.pandas.types",
    # hot package modules used inside crawl/dedup UDFs (pure-python,
    # no SparkSession/UDF construction at module scope):
    "etlpy_spark.crawl.seen",
):
    try:
        importlib.import_module(_m)
    except Exception:  # pragma: no cover - preload is best-effort
        pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
