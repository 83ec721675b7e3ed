"""xxhash64_long must be bit-identical to Spark's builtin on LongType."""

import pytest

from etlpy_spark.functions.hashing import xxhash64_long


def test_xxhash64_long_matches_spark(spark):
    import random

    from pyspark.sql import functions as F

    rng = random.Random(99)
    vals = [0, 1, -1, 42, 2**63 - 1, -(2**63)]
    vals += [rng.getrandbits(64) - 2**63 for _ in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r.v: r.h for r in df.select("v", F.xxhash64("v").alias("h")).collect()}
    for v in vals:
        assert got[v] == xxhash64_long(v), v


def test_xxhash64_long_seed_chain_matches_spark(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i,) for i in range(64)], "v long")
    got = {
        r.v: r.h
        for r in df.select(
            "v", F.xxhash64(F.lit(7).cast("long"), "v").alias("h")
        ).collect()
    }
    # Spark folds extra args left-to-right: hash(v, seed=hash(7, seed=42))
    for v in range(64):
        assert got[v] == xxhash64_long(v, seed=xxhash64_long(7))
