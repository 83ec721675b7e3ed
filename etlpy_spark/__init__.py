"""etlpy_spark — a from-scratch PySpark-native analytics/ETL engine with the
capabilities of richdevboston/etlpy (reference at /root/reference, read-only).

The reference is a pull-based generator pipeline over Python dicts
(reference etl.py:907-917); this package re-expresses the same stage
vocabulary as declarative specs compiled to Spark DataFrames, so Catalyst
handles pushdown/pruning/codegen, plus a distributed URL-frontier crawl
engine (frontier + seen-set + politeness + fetch + image merge) that the
reference only sketches (reference distributed.py, spider.py).

Layout:
  plans/      PipelineSpec + XML/JSON loaders + DataFrame compiler
  operators/  stage implementations (Column-expression builders) + large-scale
              training-data ops (dedup, similarity, text, multimodal)
  functions/  scalar/vector function library (url canonicalization, image codec)
  sources/    synthetic-world generators + snapshot table catalog
  crawl/      frontier scheduler, seen-set shards, politeness, parity oracle
"""

__version__ = "0.1.0"

from etlpy_spark.session import get_spark  # noqa: F401
