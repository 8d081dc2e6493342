"""Graded queries: connector sink WIRE PATHS (new family, r13).

VERDICT r12 item 5: grade the elasticsearch and JDBC sink wire paths
the way mongo's `extended_json_ops` was graded in r12 — one CDC
epoch's events LWW-collapsed per key, pushed through the REAL payload
builders (`sources.bulk.es_bulk_payloads`, `sources.jdbc.upsert_sql` /
`delete_sql` / `split_epoch`), and compared STRING-EXACT against
oracle-built strings. This upgrades two more §2.2 connector rows from
pytest-pinned to driver-graded at their sandbox-attainable ceiling
(no live cluster/database exists — the bytes that would go on the
wire ARE the checkable artifact).

Round 14 (VERDICT r13 item 2) closes the family: `rethink_bulk_ops`
(the buffered insert-conflict-replace stream with update/delete flush
barriers, adaptor/rethinkdb/writer.go:48-146) and `amqp_publish_ops`
(publish frames — exchange from namespace, routing key from a data
field, Delete ignored, NO LWW collapse, adaptor/rabbitmq/
writer.go:34-58). With these, every §2.2 sink row either has a
driver-graded wire query or is the file sink.
"""

from __future__ import annotations

from transporter_spark.queries._base import (
    F,
    q,
    read_table,
)


@q(
    "es_bulk_ops",
    oracle="""
WITH latest AS (
  SELECT user_id, event_id, ts, value, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
),
e AS (SELECT user_id, event_id, event_type FROM latest WHERE rn = 1),
ops AS (
  SELECT user_id, event_id, event_type,
         CAST(row_number() OVER (ORDER BY user_id) - 1 AS BIGINT) AS seq
  FROM e
),
entries AS (
  SELECT seq,
         CAST(SUM(CASE WHEN event_id % 13 = 0 AND seq > 0
                       THEN 1 ELSE 0 END)
              OVER (ORDER BY seq) AS BIGINT) AS body_no,
         CASE WHEN event_id % 13 = 0 THEN
           json_object('delete', json_object(
             '_id', CAST(user_id AS VARCHAR),
             '_index', 'events', '_type', 'events'))::VARCHAR
         WHEN event_id % 7 = 0 THEN
           json_object('update', json_object(
             '_id', CAST(user_id AS VARCHAR),
             '_index', 'events', '_type', 'events'))::VARCHAR
           || chr(10) ||
           json_object('doc', json_object(
             'kind', event_type, 'n', user_id))::VARCHAR
         ELSE
           json_object('index', json_object(
             '_id', CAST(user_id AS VARCHAR),
             '_index', 'events', '_type', 'events'))::VARCHAR
           || chr(10) ||
           json_object('kind', event_type, 'n', user_id)::VARCHAR
         END AS entry
  FROM ops
)
SELECT body_no,
       string_agg(entry, chr(10) ORDER BY seq) || chr(10) AS body
FROM entries GROUP BY body_no ORDER BY body_no
""",
)
def q_es_bulk_ops(spark, sf_dir):
    """The elasticsearch sink's v5 `_bulk` WIRE PATH, graded
    end-to-end (VERDICT r12 item 5): one CDC epoch's events
    LWW-collapse per key (latest by ts, event_id — DISTRIBUTED, one
    window pass), and the collapsed op stream runs through the REAL
    `sources.bulk.es_bulk_payloads(version="v5")` — index action for
    inserts, a real partial `update` action with a `{"doc": ...}`
    body, delete actions that FLUSH pending writes into their own
    body first (the reference's >1-worker ordering guard,
    clients/v5/writer.go:99-101), `_type` = namespace, and `_id` read
    out of the doc and REMOVED from the body (v5/writer.go:86-89).
    The graded rows are the REQUEST BODIES byte-exactly: the oracle
    rebuilds every NDJSON line with DuckDB json_object in _dumps'
    sorted-key order and replays the flush-before-delete split as a
    running delete count (every delete after the first action starts
    a new body; the count/byte caps cannot fire below ~1000 collapsed
    keys per delete-to-delete run, and the graded epoch is 150 keys
    at sf0.01). Reference parity: elasticsearch/clients/v5/
    writer.go:76-168 op construction and BulkProcessor flush rules.

    Driver boundary (deliberate, the bounded-epoch class — the
    extended_json_ops precedent): the op stream is exactly what the
    sink flushes from foreachBatch per epoch — ∝ distinct keys after
    the distributed LWW collapse, never ∝ raw events; the production
    sink (`es_cdc_sink`) builds the same payloads per-partition on
    executors."""
    from transporter_spark.sources.bulk import es_bulk_payloads
    from transporter_spark.streaming.cdc import latest_per_key

    ev = read_table(spark, sf_dir, "events")
    # the REAL sink collapse (latest_per_key is what es_cdc_sink /
    # jdbc_cdc_sink run), tiebroken on event_id for determinism —
    # review r13: a hand-rolled window here could drift from the
    # sink's actual nulls/ordering semantics
    flat = ev.select(
        F.col("ts").cast("timestamp").alias("_ts"),
        "event_id",
        "user_id",
        "event_type",
    )
    latest = (
        latest_per_key(flat, ["user_id"], ["_ts", "event_id"])
        .select("user_id", "event_id", "event_type")
        .orderBy("user_id")
    )
    rows = []
    for r in latest.toLocalIterator():
        if r.event_id % 13 == 0:
            op = "delete"
        elif r.event_id % 7 == 0:
            op = "update"
        else:
            op = "insert"
        rows.append(
            {
                "op": op,
                "ns": "events",
                "data": {
                    "_id": int(r.user_id),
                    "kind": r.event_type,
                    "n": int(r.user_id),
                },
            }
        )
    out = list(enumerate(es_bulk_payloads(rows, version="v5")))
    return spark.createDataFrame(
        out, "body_no long, body string"
    ).orderBy("body_no")


# the exact statements sources.jdbc generates for the graded epoch —
# duplicated as oracle literals so any drift in the SQL builders
# hash-mismatches loudly (the wire-path analog of a pinned payload)
_PG_UPSERT = (
    'INSERT INTO "events_sink" ("amt", "at_ms", "kind", "user_id") '
    'SELECT "amt", "at_ms", "kind", "user_id" FROM "events_sink_staging" '
    'WHERE true ON CONFLICT ("user_id") DO UPDATE SET '
    '"amt" = EXCLUDED."amt", "at_ms" = EXCLUDED."at_ms", '
    '"kind" = EXCLUDED."kind"'
)
_PG_DELETE = (
    'DELETE FROM "events_sink" USING "events_sink_deletes" s '
    'WHERE "events_sink"."user_id" = s."user_id"'
)
_MYSQL_UPSERT = (
    "INSERT INTO `events_geo` (`user_id`, `kind`, `loc`) "
    "SELECT `user_id`, `kind`, ST_GeomFromText(`loc`) "
    "FROM `events_geo_staging` "
    "ON DUPLICATE KEY UPDATE `kind` = VALUES(`kind`), "
    "`loc` = VALUES(`loc`)"
)


@q(
    "jdbc_upsert_ops",
    oracle=f"""
WITH latest AS (
  SELECT user_id, event_id, ts, value, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
),
e AS (SELECT * FROM latest WHERE rn = 1),
up AS (
  SELECT 'row_upsert' AS kind,
         CAST(row_number() OVER (ORDER BY user_id) AS BIGINT) AS seq,
         json_object(
           'amt', CAST(CAST(CAST(value AS VARCHAR) AS DECIMAL(38,10))
                       AS VARCHAR),
           'at_ms', epoch_ms(ts),
           'kind', event_type,
           'user_id', user_id)::VARCHAR AS payload
  FROM e WHERE event_id % 13 <> 0
),
del AS (
  SELECT 'row_delete' AS kind,
         CAST(row_number() OVER (ORDER BY user_id) AS BIGINT) AS seq,
         json_object('user_id', user_id)::VARCHAR AS payload
  FROM e WHERE event_id % 13 = 0
),
sqls AS (
  SELECT * FROM (VALUES
    ('sql_upsert_pg', CAST(0 AS BIGINT), '{_PG_UPSERT}'),
    ('sql_delete_pg', CAST(0 AS BIGINT), '{_PG_DELETE}'),
    ('sql_upsert_mysql', CAST(0 AS BIGINT), '{_MYSQL_UPSERT}')
  ) AS t(kind, seq, payload)
)
SELECT kind, seq, payload FROM up
UNION ALL SELECT kind, seq, payload FROM del
UNION ALL SELECT kind, seq, payload FROM sqls
ORDER BY kind, seq
""",
)
def q_jdbc_upsert_ops(spark, sf_dir):
    """The JDBC sink's staging-upsert WIRE PATH, graded end-to-end
    (VERDICT r12 item 5): one CDC epoch's events collapse through the
    REAL sink helper chain — `streaming.cdc.latest_per_key` (the
    jdbc_cdc_sink LWW, tiebroken on event_id for determinism) →
    `sources.jdbc.split_epoch` (upserts carry full rows, deletes keys
    only, SEPARATE staging tables — the shared-staging footgun the
    helper exists to prevent) — and the epoch's statements come from
    the REAL `upsert_sql` / `delete_sql` generators: postgres
    INSERT..ON CONFLICT DO UPDATE (postgres/writer.go:33-116), the
    postgres staging delete (writer.go:118-160), and the mysql ON
    DUPLICATE KEY UPDATE form with ST_GeomFromText wrapping for WKT
    geometry columns (mysql/writer.go:36-150, :66-96). The oracle
    pins the generated statements as byte-exact literals (builder
    drift hash-mismatches loudly) and rebuilds the staged rows with
    DuckDB json_object in Spark to_json's field order.

    Everything row-shaped is DISTRIBUTED (window collapse, split,
    to_json render); the statement rows are three literals. The
    decimal rendering bound shared with extended_json_ops applies to
    `amt` (a |value| < 1e-6 fixture would render 0E-10 vs plain —
    min(value) is 0.01; a regeneration crossing it fails loudly)."""
    from pyspark.sql import Window as W

    from transporter_spark.sources.jdbc import (
        delete_sql,
        split_epoch,
        upsert_sql,
    )
    from transporter_spark.streaming.cdc import latest_per_key

    ev = read_table(spark, sf_dir, "events")
    flat = ev.select(
        F.when(F.col("event_id") % 13 == 0, "delete")
        .otherwise("update")
        .alias("_op"),
        F.col("ts").cast("timestamp").alias("_ts"),
        F.col("event_id").alias("_eid"),
        F.col("value").cast("string").cast("decimal(38,10)")
        .cast("string").alias("amt"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("at_ms"),
        F.col("event_type").alias("kind"),
        "user_id",
    )
    newest = latest_per_key(flat, ["user_id"], ["_ts", "_eid"]).drop("_eid")
    upserts, deletes = split_epoch(newest, ["user_id"])

    # epoch-render windows are unpartitioned on purpose: seq is the
    # grading determinism handle over a bounded epoch (∝ distinct
    # keys); the production sink stages the frames with no sequencing
    seq_w = W.orderBy("user_id")
    up_rows = upserts.select(
        F.lit("row_upsert").alias("kind"),
        F.row_number().over(seq_w).cast("long").alias("seq"),
        F.to_json(F.struct("amt", "at_ms", "kind", "user_id")).alias(
            "payload"
        ),
    )
    del_rows = deletes.select(
        F.lit("row_delete").alias("kind"),
        F.row_number().over(seq_w).cast("long").alias("seq"),
        F.to_json(F.struct("user_id")).alias("payload"),
    )
    cols = ["amt", "at_ms", "kind", "user_id"]
    sql_rows = spark.createDataFrame(
        [
            (
                "sql_upsert_pg",
                0,
                upsert_sql("postgres", "events_sink", cols, ["user_id"]),
            ),
            (
                "sql_delete_pg",
                0,
                delete_sql(
                    "postgres", "events_sink", ["user_id"],
                    "events_sink_deletes",
                ),
            ),
            (
                "sql_upsert_mysql",
                0,
                upsert_sql(
                    "mysql",
                    "events_geo",
                    ["user_id", "kind", "loc"],
                    ["user_id"],
                    geometry_cols=["loc"],
                ),
            ),
        ],
        "kind string, seq long, payload string",
    )
    return (
        sql_rows.unionByName(up_rows)
        .unionByName(del_rows)
        .orderBy("kind", "seq")
    )


@q(
    "rethink_bulk_ops",
    oracle="""
WITH latest AS (
  SELECT user_id, event_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
),
e AS (SELECT user_id, event_id, event_type FROM latest WHERE rn = 1),
ops AS (
  SELECT user_id, event_type,
         CASE WHEN event_id % 13 = 0 THEN 'delete'
              WHEN event_id % 7 = 0 THEN 'update'
              ELSE 'insert' END AS op,
         CAST(row_number() OVER (ORDER BY user_id) AS BIGINT) AS op_seq
  FROM e
),
barred AS (
  SELECT *,
         CAST(COALESCE(SUM(CASE WHEN op <> 'insert' THEN 1 END)
              OVER (ORDER BY op_seq
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              0) AS BIGINT) AS batch
  FROM ops
),
docs AS (
  SELECT *,
         json_object('id', user_id, 'kind', event_type,
                     'n', user_id)::VARCHAR AS doc
  FROM barred
),
units AS (
  SELECT 'insert' AS kind,
         '[' || string_agg(doc, ',' ORDER BY op_seq) || ']' AS payload,
         MIN(op_seq) AS unit_seq
  FROM docs WHERE op = 'insert' GROUP BY batch
  UNION ALL
  SELECT 'insert' AS kind, '[' || doc || ']' AS payload,
         op_seq AS unit_seq
  FROM docs WHERE op = 'update'
  UNION ALL
  SELECT 'delete' AS kind, CAST(user_id AS VARCHAR) AS payload,
         op_seq AS unit_seq
  FROM docs WHERE op = 'delete'
)
SELECT CAST(row_number() OVER (ORDER BY unit_seq) - 1 AS BIGINT) AS seq,
       kind, payload
FROM units ORDER BY seq
""",
)
def q_rethink_bulk_ops(spark, sf_dir):
    """The rethinkdb sink's buffered insert-replace WIRE PATH, graded
    end-to-end (VERDICT r13 item 2): one CDC epoch's events
    LWW-collapse per key through the REAL `latest_per_key` (the
    rethinkdb_cdc_sink collapse, tiebroken on event_id), and the
    collapsed op stream runs through the REAL
    `sources.bulk.rethinkdb_bulk_ops` — inserts buffer and flush as
    one insert-conflict-replace batch, an Update forces a flush then
    goes as its own single-doc batch, a Delete forces a flush then
    yields ("delete", id), and `_id` renames to `id` in
    prepareDocument order (adaptor/rethinkdb/writer.go:48-146,
    :70-83, :85-94, :96-106). The graded rows are the ordered
    (kind, payload) units with payloads JSON-rendered byte-exactly;
    the oracle replays the flush-barrier grouping as a running
    non-insert count (each buffered run groups by the number of
    barriers before it; a unit's emission position is its minimum
    constituent op_seq, because a flushed buffer always precedes its
    barrier). The 1000-doc buffer cap (writer.go:18) cannot fire
    below 1000 consecutive collapsed inserts; the graded epoch is 150
    keys at sf0.01 — the cap rule itself is pytest-pinned
    (tests/test_connectors.py).

    Driver boundary (deliberate, the bounded-epoch class — the
    es_bulk_ops precedent): the op stream is exactly what the sink
    flushes from foreachBatch per epoch — ∝ distinct keys after the
    DISTRIBUTED LWW collapse, never ∝ raw events; the production sink
    (`rethinkdb_cdc_sink`) streams the same ops per-partition on
    executors."""
    import json as _json

    from transporter_spark.sources.bulk import rethinkdb_bulk_ops
    from transporter_spark.streaming.cdc import latest_per_key

    ev = read_table(spark, sf_dir, "events")
    flat = ev.select(
        F.col("ts").cast("timestamp").alias("_ts"),
        "event_id",
        "user_id",
        "event_type",
    )
    latest = (
        latest_per_key(flat, ["user_id"], ["_ts", "event_id"])
        .select("user_id", "event_id", "event_type")
        .orderBy("user_id")
    )
    rows = []
    for r in latest.toLocalIterator():
        if r.event_id % 13 == 0:
            rows.append(
                {"op": "delete", "ns": "events",
                 "data": {"_id": int(r.user_id)}}
            )
        else:
            op = "update" if r.event_id % 7 == 0 else "insert"
            rows.append(
                {
                    "op": op,
                    "ns": "events",
                    "data": {
                        "_id": int(r.user_id),
                        "kind": r.event_type,
                        "n": int(r.user_id),
                    },
                }
            )
    out = [
        (i, kind, _json.dumps(payload, sort_keys=True,
                              separators=(",", ":")))
        for i, (kind, payload) in enumerate(rethinkdb_bulk_ops(rows))
    ]
    return spark.createDataFrame(
        out, "seq long, kind string, payload string"
    ).orderBy("seq")


@q(
    "amqp_publish_ops",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, ts, event_type,
         CASE WHEN event_id % 13 = 0 THEN 'delete'
              WHEN event_id % 7 = 0 THEN 'update'
              ELSE 'insert' END AS op
  FROM events
),
pub AS (SELECT * FROM e WHERE op <> 'delete')
SELECT CAST(row_number() OVER (ORDER BY ts, event_id) - 1 AS BIGINT)
         AS seq,
       'events' AS exchange,
       event_type AS routing_key,
       json_object('at_ms', epoch_ms(ts), 'kind', event_type,
                   'n', user_id)::VARCHAR AS body
FROM pub ORDER BY seq
""",
)
def q_amqp_publish_ops(spark, sf_dir):
    """The rabbitmq sink's publish WIRE PATH, graded end-to-end
    (VERDICT r13 item 2): one epoch's events run through the REAL
    `sources.bulk.rabbitmq_publish_payloads` with
    `key_field="kind"` — exchange = the message namespace, routing
    key read from the document's `kind` field, Insert/Update
    published as compact sorted-key JSON, Delete silently IGNORED
    (adaptor/rabbitmq/writer.go:34-58). Deliberately NO LWW collapse:
    RabbitMQ is a message feed and the reference publishes every
    Insert/Update — a downstream consumer is owed the intermediate
    states, so this grade feeds ALL 10k events (at sf0.01), not the
    150 collapsed keys, and the seq numbering skips the dropped
    deletes (pinning the ignore rule in the hash). The production
    sink's per-partition ts order is made TOTAL here — (ts, event_id)
    — purely as the grading determinism handle.

    Driver boundary (deliberate, the bounded-epoch class): the frame
    stream is exactly what the sink publishes from foreachBatch per
    epoch — ∝ the epoch's events by contract (a feed, not a keyed
    upsert); the production sink (`rabbitmq_sink`) publishes
    per-partition on executors."""
    from transporter_spark.sources.bulk import rabbitmq_publish_payloads

    ev = read_table(spark, sf_dir, "events")
    flat = ev.select(
        F.when(F.col("event_id") % 13 == 0, "delete")
        .when(F.col("event_id") % 7 == 0, "update")
        .otherwise("insert")
        .alias("op"),
        F.col("ts").cast("timestamp").alias("_ts"),
        "event_id",
        "user_id",
        "event_type",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("at_ms"),
    ).orderBy("_ts", "event_id")
    rows_iter = (
        {
            "op": r.op,
            "ns": "events",
            "data": {
                "at_ms": int(r.at_ms),
                "kind": r.event_type,
                "n": int(r.user_id),
            },
        }
        for r in flat.toLocalIterator()
    )
    out = [
        (i, exchange, rk, body)
        for i, (exchange, rk, body) in enumerate(
            rabbitmq_publish_payloads(rows_iter, key_field="kind")
        )
    ]
    return spark.createDataFrame(
        out, "seq long, exchange string, routing_key string, body string"
    ).orderBy("seq")
