"""MongoDB connector passthrough — the reference's primary DB connector
(reference etl.py:134-181: ``Connector.TypeName``, ``table.save`` with
``OnlyInsert`` append vs ``InsertOrUpdate`` upsert) re-expressed as the
MongoDB Spark Connector v10 surface (``spark.read/write.format("mongodb")``).

This sandbox has no mongod and no connector jar, so what is tested offline
is the spec construction: URI → (format, options[, mode]) exactly as they
would be applied to a DataFrameReader/Writer. On a real cluster, add
``org.mongodb.spark:mongo-spark-connector`` to ``spark.jars.packages`` and
the same specs execute unchanged. DBGE/DbEX route any ``mongodb://`` /
``mongodb+srv://`` TableName here (operators/complexops.py).
"""

from __future__ import annotations

MONGO_SCHEMES = ("mongodb://", "mongodb+srv://")


def is_mongo_uri(path: str) -> bool:
    return path.startswith(MONGO_SCHEMES)


def parse_mongo_uri(uri: str) -> tuple[str, str, str]:
    """``mongodb://host[:port]/db.collection[?params]`` →
    (connection_uri_without_path, database, collection). The db.collection
    path form is the reference's addressing (connection string + named
    collection per tool)."""
    scheme, rest = uri.split("://", 1)
    rest, _, params = rest.partition("?")
    netloc, _, path = rest.partition("/")
    if not path or "." not in path:
        raise ValueError(
            f"mongo uri needs a /db.collection path: {uri!r}"
        )
    db, coll = path.split(".", 1)
    base = f"{scheme}://{netloc}" + (f"/?{params}" if params else "")
    return base, db, coll


def mongo_read_spec(uri: str) -> tuple[str, dict]:
    """(format, reader options) for a DBGE source over a Mongo collection
    (reference etl.py:184-210 reads the connector's named table)."""
    base, db, coll = parse_mongo_uri(uri)
    return "mongodb", {
        "connection.uri": base,
        "database": db,
        "collection": coll,
    }


def mongo_write_spec(
    uri: str, execute_type: str = "OnlyInsert", key: str | None = None
) -> tuple[str, str, dict]:
    """(format, save mode, writer options) for a DbEX sink.

    Reference semantics (etl.py:149-181): ``OnlyInsert`` → plain inserts
    (append); ``InsertOrUpdate`` → ``table.save`` per-document upsert,
    which the v10 connector spells operationType=replace with the upsert
    flag, keyed by ``idFieldList`` (the stage's Key attr)."""
    base, db, coll = parse_mongo_uri(uri)
    opts = {
        "connection.uri": base,
        "database": db,
        "collection": coll,
    }
    if execute_type == "InsertOrUpdate":
        opts["operationType"] = "replace"
        opts["upsertDocument"] = "true"
        if key:
            opts["idFieldList"] = key
    else:
        opts["operationType"] = "insert"
    return "mongodb", "append", opts
