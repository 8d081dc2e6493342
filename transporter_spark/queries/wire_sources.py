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
    # namespaces never reach the classifier (explicit raises so the
    # pins survive -O)
    if valid_op({"op": "n", "ns": "db.events"}, "db.events") or valid_op(
        {"op": "c", "ns": "db.events"}, "db.events"
    ) or valid_op({"op": "i", "ns": "db.other"}, "db.events"):
        raise AssertionError("valid_op must reject noop/command/foreign-ns")
    if not valid_op({"op": "i", "ns": "db.events"}, "db.events"):
        raise AssertionError("valid_op must accept i on our namespace")

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


@q(
    "rethink_changes_ops",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, event_type,
         CASE WHEN event_id % 5 = 0 THEN 'copy'
              WHEN event_id % 13 = 0 THEN 'delete'
              WHEN event_id % 7 = 0 THEN 'update'
              WHEN event_id % 11 = 0 THEN 'barrier'
              ELSE 'insert' END AS cls
  FROM events
)
SELECT event_id,
       CASE WHEN cls = 'copy' THEN 'copy' ELSE 'tail' END AS phase,
       CASE WHEN cls = 'copy' THEN 'insert' ELSE cls END AS op,
       'events' AS ns,
       CASE WHEN cls = 'delete' THEN
         json_object('id', event_id, 'stale', true)::VARCHAR
       WHEN cls = 'update' THEN
         json_object('id', event_id, 'kind', event_type,
                     'n', user_id, 'rev', 2)::VARCHAR
       ELSE
         json_object('id', event_id, 'kind', event_type,
                     'n', user_id)::VARCHAR
       END AS doc
FROM e WHERE cls <> 'barrier' ORDER BY event_id
""",
)
def q_rethink_changes_ops(spark, sf_dir):
    """The rethinkdb SOURCE's copy-scan + changefeed classifier,
    graded end-to-end (the fourth §2.1 wire grade; with it every
    source row's parse/classify contract is driver-graded): events
    rows split into a copy-phase table (eid%5==0) scanned through the
    REAL `scan_rows` (whole-table ns pruning included — a poison
    `audit_tmp` table with id=-1 docs must be pruned by
    `filter_tables`, reference adaptor/rethinkdb/reader.go:83-105, or
    its rows appear and the hash mismatches) and a changefeed of
    notifications run through the REAL `classify_change`
    (reader.go:184-192). The hash pins the old_val/new_val presence
    matrix: update emits NEW_VAL (the old_val carries a 'stale'
    marker that may only ever surface on deletes), insert emits
    new_val, delete emits old_val, and the empty barrier notification
    (neither value) classifies to None = row ABSENCE. The error-field
    path (reader.go:181-182) is pinned once pre-loop as a raise. JSON
    is whitespace-normalized to DuckDB's compact rendering; key order
    and values are the classifier's own."""
    import json as _json

    from transporter_spark.sources.rethinkdb import (
        RethinkChangeError,
        classify_change,
        scan_rows,
    )

    # error notifications push on the error channel, never classify
    try:
        classify_change({"error": "boom"})
        raise AssertionError("error notification must raise")
    except RethinkChangeError:
        pass

    ev = (
        read_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    )
    copy_docs, changes = [], []
    for r in ev.toLocalIterator():
        eid, uid, et = int(r.event_id), int(r.user_id), r.event_type
        live = {"id": eid, "kind": et, "n": uid}
        if eid % 5 == 0:
            copy_docs.append(live)
        elif eid % 13 == 0:
            changes.append({"old_val": {"id": eid, "stale": True}})
        elif eid % 7 == 0:
            changes.append(
                {"old_val": {"id": eid, "stale": True},
                 "new_val": dict(live, rev=2)}
            )
        elif eid % 11 == 0:
            changes.append({"old_val": None, "new_val": None})
        else:
            changes.append({"new_val": live})

    class _Client:  # the injectable driver-session contract
        def table_list(self):
            return ["events", "audit_tmp"]

        def table_docs(self, name):
            if name == "audit_tmp":  # pruned — reaching here is the bug
                return iter([{"id": -1, "poison": True}])
            return iter(copy_docs)

    def dumps(d):
        return _json.dumps(d, sort_keys=True, separators=(",", ":"))

    out = []
    for op, _ts, ns, j in scan_rows(_Client(), "events"):
        doc = _json.loads(j)
        out.append((int(doc["id"]), "copy", op, ns, dumps(doc)))
    for change in changes:
        classified = classify_change(change)
        if classified is None:
            continue  # barrier: row absent
        op, doc = classified
        out.append((int(doc["id"]), "tail", op, "events", dumps(doc)))
    return spark.createDataFrame(
        out, "event_id long, phase string, op string, ns string, doc string"
    ).orderBy("event_id")


@q(
    "amqp_consume_ops",
    oracle="""
WITH e AS (
  SELECT event_id, user_id, event_type,
         row_number() OVER (ORDER BY event_id) AS rn,
         count(*) OVER () AS n
  FROM events
)
SELECT event_id,
       CASE WHEN rn <= n // 2 THEN 1 ELSE 2 END AS epoch,
       CASE WHEN event_id % 11 <> 0 AND event_id % 9 <> 0
                 AND event_id % 7 = 0
            THEN 'update' ELSE 'insert' END AS op,
       CASE WHEN event_id % 11 <> 0 AND event_id % 9 <> 0
                 AND event_id % 7 = 0
            THEN event_id::VARCHAR ELSE '' END AS ts,
       'rmq.events' AS ns,
       CASE WHEN event_id % 11 = 0 THEN
         json_object('_raw', '{oops' || event_id)::VARCHAR
       WHEN event_id % 9 = 0 THEN
         json_object('_value', event_id)::VARCHAR
       WHEN event_id % 7 = 0 THEN
         json_object('id', event_id, 'n', user_id)::VARCHAR
       ELSE
         json_object('id', event_id, 'kind', event_type)::VARCHAR
       END AS doc
FROM e ORDER BY event_id
""",
)
def q_amqp_consume_ops(spark, sf_dir):
    """The rabbitmq CONSUMER's decode policy + ack-after-commit state
    machine, graded end-to-end (the fifth §2.1 wire grade): every
    events row becomes a broker message and drains through the REAL
    `AmqpTailStreamReader` offset/buffer/commit cycle over TWO
    micro-batch epochs (reference adaptor/rabbitmq/reader.go:34-129;
    ack-after-emit at-least-once). The hash pins the decode matrix —
    valid envelope ({op, ts, data}) extracts op/ts and emits data
    only; a bare non-dict JSON body wraps as {_value}; a poison
    unparsable body wraps as {_raw} with replacement decode (never a
    crash, reader.go:96-101's json.Unmarshal fallback analog); ns =
    prefix + queue — and the `amq.*` internal-queue skip lands as row
    absence (its poison messages would hash-mismatch). The ack ledger
    is asserted engine-side per epoch: after each commit exactly that
    epoch's delivery tags are acked, exactly once, none from the
    internal queue, nothing left unacked at the end — the contract
    whose violation silently loses or double-acks messages. JSON is
    whitespace-normalized to DuckDB's compact rendering; content is
    the reader's own _decode output."""
    import json as _json

    from transporter_spark.sources.amqp import AmqpTailStreamReader

    ev = (
        read_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    )
    bodies = []  # (eid, body bytes) in event_id order
    for r in ev.toLocalIterator():
        eid, uid, et = int(r.event_id), int(r.user_id), r.event_type
        if eid % 11 == 0:
            body = ("{oops%d" % eid).encode()
        elif eid % 9 == 0:
            body = _json.dumps(eid).encode()
        elif eid % 7 == 0:
            body = _json.dumps(
                {"op": "update", "ts": eid, "data": {"id": eid, "n": uid}}
            ).encode()
        else:
            body = _json.dumps({"id": eid, "kind": et}).encode()
        bodies.append((eid, body))
    half = len(bodies) // 2

    class _Channel:  # the injectable pika-channel contract
        def __init__(self):
            self.pending = {"events": [], "amq.gen-internal": [(-1, b"{poison")]}
            self.acked = []

        def basic_get(self, queue):
            if not self.pending.get(queue):
                return None
            return self.pending[queue].pop(0)  # (delivery_tag=eid, body)

        def basic_ack(self, tag):
            self.acked.append(tag)

    ch = _Channel()
    reader = AmqpTailStreamReader(
        ["events", "amq.gen-internal"], ch, ns_prefix="rmq."
    )
    out = []
    start = reader.initialOffset()
    for epoch, chunk in enumerate((bodies[:half], bodies[half:]), start=1):
        ch.pending["events"].extend(chunk)
        # a big broker backlog drains through MULTIPLE bounded
        # micro-batches (latestOffset caps at max_per_batch per call
        # — the flow-control knob a 100k-message backlog needs); the
        # chunk label spans them, the ack assert lands after the last
        while True:
            end = reader.latestOffset()
            if end["seq"] == start["seq"]:
                break
            for part in reader.partitions(start, end):
                for op, ts, ns, j in reader.read(part):
                    doc = _json.loads(j)
                    # the graded key column, recovered from the decoded
                    # doc itself (the reader never sees event ids)
                    if "_raw" in doc:
                        eid = int(doc["_raw"][5:])
                    elif "_value" in doc:
                        eid = int(doc["_value"])
                    else:
                        eid = int(doc["id"])
                    out.append(
                        (eid, epoch, op, ts, ns,
                         _json.dumps(doc, sort_keys=True, separators=(",", ":")))
                    )
            reader.commit(end)
            start = end
        # ack-after-commit: exactly this prefix of tags, exactly once.
        # Explicit raises, not `assert` — these pins must survive -O.
        want = [eid for eid, _ in bodies[: half if epoch == 1 else None]]
        if sorted(ch.acked) != sorted(want):
            raise AssertionError("ack ledger drift")
    if reader._buffer:
        raise AssertionError("committed messages must leave the buffer")
    if not ch.pending["amq.gen-internal"]:
        raise AssertionError("internal queue must stay untouched")
    return spark.createDataFrame(
        out,
        "event_id long, epoch int, op string, ts string, ns string, doc string",
    ).orderBy("event_id")
