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
