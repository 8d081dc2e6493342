"""Connector-layer tests: upsert SQL generation (pure), the custom
jsonl_tail streaming DataSource (live), namespace catalog expansion."""

from __future__ import annotations

import json
import time

import pytest

from transporter_spark.sources.catalog import expand_namespaces, list_dir_namespaces
from transporter_spark.sources.jdbc import delete_sql, upsert_sql


def test_upsert_sql_postgres():
    sql = upsert_sql("postgres", "users", ["id", "name", "bal"], ["id"])
    assert sql == (
        'INSERT INTO "users" ("id", "name", "bal") '
        'SELECT "id", "name", "bal" FROM "users_staging" '
        'ON CONFLICT ("id") DO UPDATE SET "name" = EXCLUDED."name", '
        '"bal" = EXCLUDED."bal"'
    )


def test_upsert_sql_postgres_all_key_columns():
    sql = upsert_sql("postgres", "m", ["a", "b"], ["a", "b"])
    assert sql.endswith("DO NOTHING")


def test_upsert_sql_mysql():
    sql = upsert_sql("mysql", "users", ["id", "name"], ["id"])
    assert sql == (
        "INSERT INTO `users` (`id`, `name`) "
        "SELECT `id`, `name` FROM `users_staging` "
        "ON DUPLICATE KEY UPDATE `name` = VALUES(`name`)"
    )


def test_delete_sql_dialects():
    pg = delete_sql("postgres", "users", ["id"], "stage")
    my = delete_sql("mysql", "users", ["id"], "stage")
    assert pg == 'DELETE FROM "users" USING "stage" s WHERE "users"."id" = s."id"'
    assert my == "DELETE `users` FROM `users` JOIN `stage` s ON `users`.`id` = s.`id`"


def test_unknown_dialect_rejected():
    with pytest.raises(ValueError, match="unknown dialect"):
        upsert_sql("oracle", "t", ["a"], ["a"])


def test_expand_namespaces_skips_system_and_filters():
    cands = ["users", "orders_2024", "system.profile", "audit"]
    assert expand_namespaces(cands, "users|orders") == ["users", "orders_2024"]
    assert expand_namespaces(cands, ".*") == ["users", "orders_2024", "audit"]


def test_list_dir_namespaces(sf_dir):
    names = list_dir_namespaces(sf_dir)
    assert "lineitem" in names and "events" in names


def test_jsonl_tail_datasource_streams_appends(spark, tmp_path):
    """The M5 custom streaming source: initial content read as batch 1,
    appended lines picked up by the next trigger, byte offsets
    checkpointed — tail-mode parity for connector-less sources."""
    from transporter_spark.sources.datasource import JsonlTailDataSource

    spark.dataSource.register(JsonlTailDataSource)
    feed = tmp_path / "feed.jsonl"
    feed.write_text(
        json.dumps({"op": "insert", "ns": "t", "data": {"id": 1}}) + "\n"
        + json.dumps({"op": "insert", "ns": "t", "data": {"id": 2}}) + "\n"
        + "NOT JSON AT ALL\n"  # poison line must be skipped, not fatal
    )
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("jsonl_tail")
            .option("path", str(feed))
            .load()
            .writeStream.format("json")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.json(out).collect()

    first = drain()
    assert len(first) == 2  # poison line skipped

    # append a line; the next run resumes from the checkpointed byte
    # offset and emits ONLY the new row (file sink appends across runs)
    with open(feed, "a") as f:
        f.write(json.dumps({"op": "delete", "ns": "t", "data": {"id": 1}}) + "\n")
    second = drain()
    assert len(second) == 3
    assert sorted(r.op for r in second) == ["delete", "insert", "insert"]


# ---------------------------------------------------------------------------
# bulk sink payload builders (ES _bulk / mongo bulkWrite / rabbitmq)
# ---------------------------------------------------------------------------

from transporter_spark.sources.bulk import (  # noqa: E402
    es_bulk_payloads,
    mongo_bulk_ops,
    rabbitmq_publish_payloads,
)


def _envelope_rows():
    return [
        {"op": "insert", "ns": "db.users", "data": {"_id": 1, "name": "a"}},
        {"op": "update", "ns": "db.users", "data": {"_id": 2, "name": "b"}},
        {"op": "delete", "ns": "db.users", "data": {"_id": 3}},
        {"op": "command", "ns": "db.users", "data": {}},  # passthrough, never fails
    ]


def test_es_bulk_payload_exact_ndjson():
    bodies = list(es_bulk_payloads(_envelope_rows()))
    assert len(bodies) == 1
    assert bodies[0] == (
        '{"index":{"_id":"1","_index":"db.users"}}\n'
        '{"_id":1,"name":"a"}\n'
        '{"index":{"_id":"2","_index":"db.users"}}\n'
        '{"_id":2,"name":"b"}\n'
        '{"delete":{"_id":"3","_index":"db.users"}}\n'
    )


def test_es_bulk_splits_at_max_actions_and_bytes():
    rows = [
        {"op": "insert", "ns": "i", "data": {"_id": i, "v": "x" * 10}}
        for i in range(10)
    ]
    by_actions = list(es_bulk_payloads(rows, max_actions=4))
    assert len(by_actions) == 3  # 4 + 4 + 2
    by_bytes = list(es_bulk_payloads(rows, max_bytes=100))
    assert len(by_bytes) > 1
    # every body stays under the cap (single oversized entries excepted)
    assert all(len(b) <= 100 or b.count("\n") == 2 for b in by_bytes)


def test_mongo_bulk_ops_replace_upsert_and_delete():
    batches = list(mongo_bulk_ops(_envelope_rows()))
    assert len(batches) == 1
    ops = batches[0]
    assert ops[0] == {
        "replaceOne": {
            "filter": {"_id": 1},
            "replacement": {"_id": 1, "name": "a"},
            "upsert": True,
        }
    }
    assert ops[2] == {"deleteOne": {"filter": {"_id": 3}}}
    assert len(ops) == 3  # command dropped


def test_mongo_bulk_splits_at_max_ops():
    rows = [{"op": "insert", "data": {"_id": i}} for i in range(2500)]
    batches = list(mongo_bulk_ops(rows, max_ops=1000))
    assert [len(b) for b in batches] == [1000, 1000, 500]


def test_rabbitmq_publish_contract():
    out = list(
        rabbitmq_publish_payloads(_envelope_rows(), key_field="name", routing_key="rk")
    )
    # delete + command silently ignored (reference writer.go:34-58)
    assert len(out) == 2
    exchange, rk, body = out[0]
    assert exchange == "db.users"
    assert rk == "a"  # routing key read from the data field
    assert json.loads(body) == {"_id": 1, "name": "a"}
