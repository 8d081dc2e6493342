"""Graded queries: connector SOURCE parse paths (new family, r14).

The §2.2 sinks got driver-graded wire queries in r12-r14 (the bytes
the writer would put on the wire, byte-exact vs DuckDB-rebuilt
payloads); the §2.1 sources stopped at pytest-pinned fixtures — the
signal gap VERDICT r13's "what's missing" item 1 names. These queries
close what is closable without a live database: the REAL CDC parsers
(`sources.pgdecode.parse_test_decoding_line`,
`sources.binlog.map_rows_event` with its `backfill_columns` /
`casify_mysql` chain) run over a deterministic fixture stream derived
from the events table, and the parsed documents are graded byte-exact
against a DuckDB json_object replay of the typing policy. If a regex
group, quote-unescape, numeric coercion, after-image selection, or
positional-backfill rule drifts, the hash mismatches loudly.

Driver boundary (deliberate, the bounded-epoch class — the
amqp_publish_ops precedent): the fixture lines/events are parsed via
toLocalIterator on the driver, ∝ the epoch's rows; the production
paths run the SAME functions inside the streaming datasources
(PgDecodeTailDataSource.read, BinlogTailStreamReader.read), which is
where the executor-side story lives (pytest-pinned end-to-end through
readStream in tests/test_connectors.py).
"""

from __future__ import annotations

from transporter_spark.queries._base import (
    q,
    read_table,
)


@q(
    "pgdecode_parse_ops",
    oracle="""
WITH e AS (
  SELECT event_id, user_id,
         CASE WHEN event_id % 13 = 0 THEN 'delete'
              WHEN event_id % 7 = 0 THEN 'update'
              ELSE 'insert' END AS op
  FROM events
)
SELECT event_id,
       CASE WHEN op = 'update' THEN 'public.Events Hot'
            ELSE 'public.events' END AS ns,
       op,
       CASE WHEN op = 'delete' THEN
         json_object('event_id', event_id)::VARCHAR
       WHEN op = 'update' THEN
         json_object(
           'amt', user_id + 0.25,
           'event_id', event_id,
           'nm', 'O''Brien-' || event_id,
           'note', NULL,
           'ok', event_id % 2 = 0,
           'user id', user_id)::VARCHAR
       ELSE
         json_object(
           'amt', user_id + 0.25,
           'event_id', event_id,
           'nm', 'O''Brien-' || event_id,
           'note', NULL,
           'ok', event_id % 2 = 0)::VARCHAR
       END AS doc
FROM e ORDER BY event_id
""",
)
def q_pgdecode_parse_ops(spark, sf_dir):
    """The postgres CDC tail's test_decoding PARSER, graded end-to-end
    (VERDICT r13 "missing" item 1, the closable half): a
    test_decoding transcript is rendered from the events table —
    BEGIN/COMMIT noise lines, quoted identifiers with spaces
    (`"public"."Events Hot"` and a `"user id"` column on updates),
    `''`-escaped text values, bare nulls, bigint/numeric/boolean
    typed columns, key-only DELETE rows — and every line runs through
    the REAL `parse_test_decoding_line` (sources/pgdecode.py;
    reference parser adaptor/postgres/tailer.go:139-233, casify
    :236-290). The graded rows are the parsed (ns, op, doc) with the
    doc JSON-rendered sorted-key byte-exactly against a DuckDB
    json_object replay of the SAME typing policy: int for bigint,
    IEEE double for numeric, bool for boolean, None for bare null,
    quote-unescaped text. Noise lines must parse to None and drop
    (a parser that emitted them would crash the row builder)."""
    import json as _json

    from transporter_spark.sources.pgdecode import (
        parse_test_decoding_line,
    )

    ev = (
        read_table(spark, sf_dir, "events")
        .select("event_id", "user_id")
        .orderBy("event_id")
    )
    out = []
    for r in ev.toLocalIterator():
        eid, uid = int(r.event_id), int(r.user_id)
        ok = "true" if eid % 2 == 0 else "false"
        if eid % 13 == 0:
            lines = [
                f"BEGIN {eid}",
                f"table public.events: DELETE: event_id[bigint]:{eid}",
                f"COMMIT {eid}",
            ]
        elif eid % 7 == 0:
            lines = [
                f"BEGIN {eid}",
                f'table "public"."Events Hot": UPDATE: '
                f"event_id[bigint]:{eid}"
                f" amt[numeric(10,2)]:'{uid}.25'"
                f" nm[text]:'O''Brien-{eid}'"
                f" note[text]:null"
                f" ok[boolean]:{ok}"
                f' "user id"[integer]:{uid}',
                f"COMMIT {eid}",
            ]
        else:
            lines = [
                f"table public.events: INSERT: event_id[bigint]:{eid}"
                f" amt[double precision]:'{uid}.25'"
                f" nm[text]:'O''Brien-{eid}'"
                f" note[text]:null"
                f" ok[boolean]:{ok}",
            ]
        for line in lines:
            parsed = parse_test_decoding_line(line)
            if parsed is None:
                continue  # BEGIN/COMMIT noise — the reference skips too
            ns, op, doc = parsed
            out.append(
                (
                    int(doc["event_id"]),
                    ns,
                    op,
                    _json.dumps(doc, sort_keys=True, separators=(",", ":")),
                )
            )
    return spark.createDataFrame(
        out, "event_id long, ns string, op string, doc string"
    ).orderBy("event_id")


@q(
    "binlog_map_ops",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, event_type,
         CASE WHEN event_id % 13 = 0 THEN 'delete'
              WHEN event_id % 7 = 0 THEN 'update'
              ELSE 'insert' END AS op
  FROM events
)
SELECT event_id, 'shop.events' AS ns, op,
       CASE WHEN op = 'delete' THEN
         json_object('event_id', event_id)::VARCHAR
       ELSE
         json_object(
           '_col4', 'drift-' || event_id,
           'amt', user_id + 0.25,
           'event_id', event_id,
           'kind', event_type,
           'note', NULL)::VARCHAR
       END AS doc
FROM e ORDER BY event_id
""",
)
def q_binlog_map_ops(spark, sf_dir):
    """The mysql binlog tail's ROWS-EVENT mapper, graded end-to-end
    (the pgdecode_parse_ops twin for §2.1's mysql CDC row):
    RowsEvents are built from the events table and run through the
    REAL `map_rows_event` → `backfill_columns` → `casify_mysql` chain
    (sources/binlog.py; reference adaptor/mysql/tailer.go:339-400 row
    mapping, reader.go:205-262 casify). The hash pins: the op matrix
    (WRITE/UPDATE/DELETE_ROWS_EVENTv2 → insert/update/delete), the
    UPDATE after-image rule ([before, after] pairs — the before-image
    carries poison values that MUST NOT appear), string→int and
    string→float coercion, bytes→utf-8 text decode, None
    passthrough, and the positional `_colN` backfill for a value past
    the column metadata (mid-binlog schema drift). Key-only DELETE
    rows; XID noise events must raise BinlogSkip and drop."""
    import json as _json

    from transporter_spark.sources.binlog import (
        BinlogSkip,
        map_rows_event,
    )

    columns = [
        ("event_id", "bigint"),
        ("amt", "decimal"),
        ("kind", "varchar"),
        ("note", "varchar"),
    ]
    ev = (
        read_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    )
    # row-invariant pin, once per run (review r14: was per-row): XID
    # noise events must BinlogSkip, never map to ops
    try:
        map_rows_event(
            {"event_type": "XID_EVENT", "schema": "x", "table": "y"},
            columns,
        )
        raise AssertionError("XID noise must BinlogSkip")
    except BinlogSkip:
        pass
    out = []
    for r in ev.toLocalIterator():
        eid, uid = int(r.event_id), int(r.user_id)
        after = [
            str(eid),                     # bigint as binlog string
            f"{uid}.25",                  # decimal as string -> float
            r.event_type.encode(),        # bytes -> utf-8 text
            None,                         # NULL passthrough
            f"drift-{eid}",               # past metadata -> _col4
        ]
        if eid % 13 == 0:
            event = {
                "event_type": "DELETE_ROWS_EVENTv2",
                "schema": "shop", "table": "events",
                "rows": [[str(eid)]],
            }
            cols = columns[:1]
        elif eid % 7 == 0:
            before = ["-1", "poison", b"poison", "poison", "poison"]
            event = {
                "event_type": "UPDATE_ROWS_EVENTv2",
                "schema": "shop", "table": "events",
                "rows": [before, after],
            }
            cols = columns
        else:
            event = {
                "event_type": "WRITE_ROWS_EVENTv2",
                "schema": "shop", "table": "events",
                "rows": [after],
            }
            cols = columns
        for op, ns, doc in map_rows_event(event, cols):
            out.append(
                (
                    int(doc["event_id"]),
                    ns,
                    op,
                    _json.dumps(doc, sort_keys=True, separators=(",", ":")),
                )
            )
    return spark.createDataFrame(
        out, "event_id long, ns string, op string, doc string"
    ).orderBy("event_id")


@q(
    "oplog_classify_ops",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, event_type,
         CASE WHEN event_id % 13 = 0 THEN 'delete'
              WHEN event_id % 7 = 0 THEN 'update'
              ELSE 'insert' END AS op
  FROM events
),
kept AS (
  SELECT * FROM e
  WHERE NOT (op = 'update'
             AND (event_id % 14 = 0 OR event_id % 21 = 0))
)
SELECT event_id, op, event_id AS ts,
       CASE WHEN op = 'delete' THEN
         json_object('_id', event_id)::VARCHAR
       WHEN op = 'update' THEN
         json_object(
           '_id', event_id,
           'fq', '{"_id":' || event_id || ',"kind":{"$ne":"zzz"}}',
           'kind', event_type,
           'n', user_id)::VARCHAR
       ELSE
         json_object('_id', event_id, 'kind', event_type,
                     'n', user_id)::VARCHAR
       END AS doc
FROM kept ORDER BY event_id
""",
)
def q_oplog_classify_ops(spark, sf_dir):
    """The mongodb oplog tail's ENTRY CLASSIFIER, graded end-to-end
    (the third §2.1 CDC parse grade, completing the
    pgdecode/binlog/oplog set): oplog entries are built from the
    events table and run through the REAL `valid_op` +
    `classify_oplog_entry` chain (sources/mongo.py; reference
    adaptor/mongodb/reader.go:246-313). The hash pins: i/d/u → op
    mapping, the MongoTimestamp seconds-half extraction (entries
    carry (secs << 32) | 7 — a classifier reading the full value
    mismatches every ts), and above all the UPDATE RE-FETCH contract
    (getOriginalDoc, reader.go:296-313): the emitted update doc is
    the CURRENT full document from the injected `fetch_doc`, whose
    oplog delta carries poison that must never appear, and whose
    returned doc EMBEDS the find query it received — so the
    copy_query filter-merge (user filter + `_id` overwrite) is in
    the hash too. Skip rules land as row ABSENCE: u entries with a
    missing o2._id (reader.go:300-302) and failed re-fetches
    (reader.go:258-261, not fatal) drop their rows; noop/command and
    wrong-namespace entries are pinned once pre-loop via valid_op."""
    import json as _json

    from transporter_spark.sources.mongo import (
        classify_oplog_entry,
        copy_query,
        valid_op,
    )

    filters = {"events": {"kind": {"$ne": "zzz"}}}
    # row-invariant pins, once per run: noops/commands and foreign
    # namespaces never reach the classifier
    assert not valid_op({"op": "n", "ns": "db.events"}, "db.events")
    assert not valid_op({"op": "c", "ns": "db.events"}, "db.events")
    assert not valid_op({"op": "i", "ns": "db.other"}, "db.events")
    assert valid_op({"op": "i", "ns": "db.events"}, "db.events")

    ev = (
        read_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    )
    out = []
    for r in ev.toLocalIterator():
        eid, uid = int(r.event_id), int(r.user_id)
        ts_full = (eid << 32) | 7
        if eid % 13 == 0:
            entry = {"op": "d", "ns": "db.events", "ts": ts_full,
                     "o": {"_id": eid}}
            fetch = None
        elif eid % 7 == 0:
            o2 = {} if eid % 21 == 0 else {"_id": eid}
            entry = {"op": "u", "ns": "db.events", "ts": ts_full,
                     "o": {"$set": {"poison": 1}}, "o2": o2}

            def fetch(query, _eid=eid, _kind=r.event_type, _uid=uid):
                if _eid % 14 == 0:
                    return None  # dead doc: skip, not fatal
                return {
                    "_id": _eid,
                    "kind": _kind,
                    "n": _uid,
                    "fq": _json.dumps(
                        query, sort_keys=True, separators=(",", ":")
                    ),
                }
        else:
            entry = {"op": "i", "ns": "db.events", "ts": ts_full,
                     "o": {"_id": eid, "kind": r.event_type, "n": uid}}
            fetch = None
        classified = classify_oplog_entry(
            entry, "events", fetch or (lambda q: None), filters
        )
        if classified is None:
            continue  # missing o2._id / failed re-fetch: row absent
        op, doc, ts = classified
        out.append(
            (eid, op, int(ts),
             _json.dumps(doc, sort_keys=True, separators=(",", ":")))
        )
    return spark.createDataFrame(
        out, "event_id long, op string, ts long, doc string"
    ).orderBy("event_id")
