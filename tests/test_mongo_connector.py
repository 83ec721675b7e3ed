"""MongoDB connector passthrough (sources/mongo.py; reference
etl.py:134-181): spec→plan construction only — the sandbox has no mongod
and no connector jar, so reads/writes cannot run live. What IS pinned:
URI parsing, the exact reader/writer options the v10 connector takes,
the OnlyInsert/InsertOrUpdate semantics mapping, and that DBGE/DbEX
route mongodb:// TableNames to the mongodb format."""

from __future__ import annotations

import pytest

from etlpy_spark.sources.mongo import (
    is_mongo_uri,
    mongo_read_spec,
    mongo_write_spec,
    parse_mongo_uri,
)

URI = "mongodb://db.example:27017/crawl.images"


def test_uri_parsing():
    assert parse_mongo_uri(URI) == ("mongodb://db.example:27017", "crawl", "images")
    base, db, coll = parse_mongo_uri(
        "mongodb+srv://u:p@cluster0.x.net/prod.docs?retryWrites=true"
    )
    assert base == "mongodb+srv://u:p@cluster0.x.net/?retryWrites=true"
    assert (db, coll) == ("prod", "docs")
    # dotted collection names: first dot splits db from collection
    assert parse_mongo_uri("mongodb://h/d.a.b")[1:] == ("d", "a.b")
    with pytest.raises(ValueError, match="db.collection"):
        parse_mongo_uri("mongodb://host:27017")
    assert is_mongo_uri(URI) and is_mongo_uri("mongodb+srv://x/d.c")
    assert not is_mongo_uri("/data/t.parquet") and not is_mongo_uri("t.csv")


def test_read_spec():
    fmt, opts = mongo_read_spec(URI)
    assert fmt == "mongodb"
    assert opts == {
        "connection.uri": "mongodb://db.example:27017",
        "database": "crawl",
        "collection": "images",
    }


def test_write_spec_only_insert_vs_upsert():
    fmt, mode, opts = mongo_write_spec(URI)  # default OnlyInsert
    assert (fmt, mode) == ("mongodb", "append")
    assert opts["operationType"] == "insert"
    assert "idFieldList" not in opts

    fmt, mode, opts = mongo_write_spec(URI, "InsertOrUpdate", key="image_id")
    assert (fmt, mode) == ("mongodb", "append")
    # reference table.save per-document upsert == v10 replace+upsert
    assert opts["operationType"] == "replace"
    assert opts["upsertDocument"] == "true"
    assert opts["idFieldList"] == "image_id"


def test_dbex_routes_mongo_sink(spark):
    from etlpy_spark.operators.complexops import dbex
    from etlpy_spark.plans.compiler import CompileContext
    from etlpy_spark.plans.spec import Stage

    ctx = CompileContext(spark=spark, execute=True)
    df = spark.createDataFrame([("a", 1)], "image_id string, v int")
    st = Stage("DbEX", {"TableName": URI, "ExecuteType": "InsertOrUpdate",
                        "Key": "image_id"})
    out = dbex(ctx, df, st)
    assert out is df  # executors pass rows through
    assert len(ctx.sinks) == 1 and ctx.sinks[0][0] == "DbEX"
    # running the sink must fail on the MISSING DATA SOURCE (proving the
    # writer was configured for the mongodb format), not on our code
    with pytest.raises(Exception, match="(?i)mongodb"):
        ctx.sinks[0][1](df)


def test_dbge_routes_mongo_source(spark):
    from etlpy_spark.operators.complexops import dbge
    from etlpy_spark.plans.compiler import CompileContext
    from etlpy_spark.plans.spec import Stage

    ctx = CompileContext(spark=spark)
    st = Stage("DBGE", {"TableName": URI})
    # no jar in the sandbox: plan construction reaches the mongodb format
    # resolution and fails THERE — the routing is what's under test
    with pytest.raises(Exception, match="(?i)mongodb"):
        dbge(ctx, None, st)
