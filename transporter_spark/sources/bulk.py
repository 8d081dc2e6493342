"""Bulk document sinks — Elasticsearch `_bulk`, MongoDB bulkWrite,
RabbitMQ publish — re-expressed Spark-first.

Parity targets in the reference:

- elasticsearch v5 writer (adaptor/elasticsearch/clients/v5/writer.go:
  76-168): olivere BulkProcessor flushing at 1000 actions / 2 MB / 5 s;
  Insert/Update -> index doc with `_id`, Delete -> bulk delete.
- mongodb bulk writer (adaptor/mongodb/bulk.go:38-152): per-collection
  buffers flushed at maxWriteBatchSize (1000) or 16 MB BSON, 2 s ticker.
- rabbitmq publisher (adaptor/rabbitmq/writer.go:34-58): Insert/Update
  published as JSON to exchange=namespace with a configurable routing
  key (optionally read from a data field); Delete ignored.

Spark-first shape: the reference's count/size/timer flush triad is
subsumed by micro-batch epochs — `foreachBatch` hands each sink one
epoch; within it rows are collapsed last-writer-wins per key (so replay
is idempotent, upgrading at-least-once to exactly-once effect) and each
*partition* independently builds count/size-capped request payloads and
ships them. No driver-side collect at any scale: a 1000-executor
cluster produces 1000 concurrent bulk streams, which is exactly how the
ES/Mongo bulk APIs want to be fed.

No live backends exist in this container, so the payload builders are
pure functions over row iterators (unit-tested byte-for-byte) and the
network senders are reachability-gated.
"""

from __future__ import annotations

import json
from typing import Callable, Dict, Iterable, Iterator, List, Optional, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DELETE_OPS = ("delete",)


def _dumps(doc: dict) -> str:
    """Canonical compact JSON — sorted keys so payloads are
    deterministic (testable, diffable, retry-identical)."""
    return json.dumps(doc, sort_keys=True, separators=(",", ":"), default=str)


# ---------------------------------------------------------------------------
# Elasticsearch version autodetection (elasticsearch.go:84-175)
# ---------------------------------------------------------------------------

class EsVersionError(ValueError):
    """Version sniff failed or no client supports the cluster."""


def parse_es_version(info_body) -> str:
    """Extract the version from a `GET /` response body
    (determineVersion, elasticsearch.go:139-175): malformed JSON and a
    missing version.number are distinct, explicit errors."""
    if isinstance(info_body, (str, bytes)):
        try:
            info = json.loads(info_body)
        except json.JSONDecodeError:
            raise EsVersionError(f"malformed JSON: {info_body!r}")
    else:
        info = info_body
    number = (info or {}).get("version", {}).get("number", "")
    if not number:
        raise EsVersionError(f"missing version: {info_body!r}")
    return number


def pick_es_client(version: str) -> str:
    """Version -> client generation, the reference's constraint registry
    (clients/v1/writer.go:29 '>=1.4,<2.0', v2/writer.go:36 '>=2.0,<5.0',
    v5/writer.go:37 '>=5.0')."""
    try:
        parts = tuple(int(p) for p in version.split(".")[:2])
    except ValueError:
        raise EsVersionError(f"unparseable version: {version!r}")
    major, minor = (parts + (0, 0))[:2]
    if major >= 5:
        return "v5"
    if major >= 2:
        return "v2"
    if (major, minor) >= (1, 4):
        return "v1"
    raise EsVersionError(f"unsupported client for version {version}")


def sniff_es_client(url: str, timeout: float = 5.0) -> str:
    """GET / then dispatch — gated, needs a live cluster."""
    import urllib.request  # pragma: no cover - network

    with urllib.request.urlopen(url, timeout=timeout) as resp:  # pragma: no cover
        return pick_es_client(parse_es_version(resp.read()))


# ---------------------------------------------------------------------------
# Elasticsearch _bulk NDJSON
# ---------------------------------------------------------------------------

def es_bulk_payloads(
    rows: Iterable[dict],
    index: Optional[str] = None,
    id_field: str = "_id",
    op_field: str = "op",
    ns_field: str = "ns",
    max_actions: int = 1000,
    max_bytes: int = 2 * 1024 * 1024,
    version: str = "v5",
    parent_field: Optional[str] = None,
) -> Iterator[str]:
    """Build Elasticsearch `_bulk` NDJSON bodies from envelope rows.

    Each row is {op, ns, data: dict}. Shared contract across the bulk
    generations (clients/v5/writer.go:76-127, v2/writer.go:74-105):
    `_type` = namespace, `_id` is read out of the doc and REMOVED from
    the body, Insert is an `index` action (full replace by `_id`),
    Update is a real `update` action with a `{"doc": ...}` partial
    body, and a Delete flushes pending actions into their own body
    first (the reference flushes its 2-worker BulkProcessor before
    queueing deletes to preserve apply order). Unknown ops pass through
    silently (acked, never fail the pipeline). Bodies are capped at
    `max_actions` / `max_bytes` — the BulkProcessor thresholds
    (v5/writer.go:60-65); the 5 s timer is the micro-batch trigger.

    Version differences (pick with sniff_es_client / pick_es_client):

    - ``v5`` only: parent/child support — ``parent_field`` names a doc
      field whose value is popped and becomes `parent` + `routing` on
      index/update actions and `routing` on deletes
      (clients/v5/writer.go:91-119; `parent_id` conf at
      elasticsearch.go:47).
    - ``v1`` (clients/v1/writer.go:55-78): no bulk API at all —
      individual index/delete requests; each action is emitted as its
      own single-action body, `_id` stays in the document, Update is a
      full-replace Index call.
    """
    lines: List[str] = []
    actions = 0
    size = 0
    for row in rows:
        op = str(row.get(op_field, "insert")).lower()
        data = dict(row.get("data") or {})
        ns = row.get(ns_field)
        idx = index or ns
        doc_id = data.get(id_field, row.get(id_field))
        flush_first = False
        # every generation sets Type(namespace) and reads _id out of the
        # doc; v2/v5 additionally REMOVE _id from the body
        # (writer.go v5:86-89, v2:84-87; v1:58-61 keeps it)
        if id_field in data and version in ("v2", "v5"):
            del data[id_field]
        # v5 parent/child: pop the configured field; its value becomes
        # parent + routing on index/update, routing on delete
        # (clients/v5/writer.go:91-119; ParentID conf elasticsearch.go:47)
        pid = None
        if version == "v5" and parent_field and parent_field in data:
            v = data.pop(parent_field)
            # the reference guards every parent/routing emit with
            # pID != "" (v5/writer.go:103,109,117): an empty/absent
            # parent means DEFAULT routing, never routing to the ''
            # shard key
            pid = str(v) if v not in (None, "") else None
        if op in _DELETE_OPS:
            meta = {"delete": {"_index": idx, "_id": str(doc_id), "_type": ns}}
            if pid is not None:
                meta["delete"]["routing"] = pid
            entry = [_dumps(meta)]
            # both bulk generations flush pending writes before a delete
            # (the >1-worker ordering guard, v5:99-101, v2:92-94)
            flush_first = version in ("v2", "v5")
        elif op in ("insert", "update"):
            if version in ("v2", "v5") and op == "update":
                # a real partial-document update action
                # (NewBulkUpdateRequest().Doc, v5:115-121, v2:98-99)
                meta = {"update": {"_index": idx, "_type": ns}}
                if doc_id is not None:
                    meta["update"]["_id"] = str(doc_id)
                if pid is not None:
                    meta["update"]["parent"] = pid
                    meta["update"]["routing"] = pid
                entry = [_dumps(meta), _dumps({"doc": data})]
            else:
                meta = {"index": {"_index": idx, "_type": ns}}
                if doc_id is not None:
                    meta["index"]["_id"] = str(doc_id)
                if pid is not None:
                    meta["index"]["parent"] = pid
                    meta["index"]["routing"] = pid
                entry = [_dumps(meta), _dumps(data)]
        else:  # command/noop/unknown: pass through, never fail
            continue
        entry_bytes = sum(len(e) + 1 for e in entry)
        at_capacity = actions + 1 > max_actions or size + entry_bytes > max_bytes
        if lines and (at_capacity or flush_first or version == "v1"):
            yield "\n".join(lines) + "\n"
            lines, actions, size = [], 0, 0
        lines.extend(entry)
        actions += 1
        size += entry_bytes
        if version == "v1":  # one action per request
            yield "\n".join(lines) + "\n"
            lines, actions, size = [], 0, 0
    if lines:
        yield "\n".join(lines) + "\n"


def es_cdc_sink(
    url: str,
    index: Optional[str] = None,
    keys: Sequence[str] = ("_id",),
    timeout: float = 5.0,
    version: str = "auto",
    parent_field: Optional[str] = None,
    transport: Optional[Callable[[str, str], dict]] = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink: collapse the epoch last-writer-wins per key,
    then per-partition POST `_bulk` bodies to `{url}/_bulk`.

    version="auto" sniffs the cluster generation from `GET /` once
    (elasticsearch.go:84-137) and dispatches the matching payload
    variant; pass "v1"/"v2"/"v5" to pin it. parent_field is the
    `parent_id` config (elasticsearch.go:47) — v5 parent/child routing.

    `transport(bulk_url, ndjson_body) -> response dict` defaults to a
    urllib POST; injectable so the LWW-collapse -> payload -> flush
    composition is executable against a recording fake (the executed-
    composition test pattern). Must be picklable — it ships to
    executors. Gated on a reachable Elasticsearch otherwise. The write
    timeout mirrors the reference's per-write context timeout
    (pipeline/node.go:34).
    """
    from transporter_spark.streaming.cdc import latest_per_key

    if version == "auto":  # pragma: no cover - needs live cluster
        version = sniff_es_client(url, timeout)
    post = transport or _es_http_transport(timeout)

    def apply(batch: DataFrame, epoch_id: int) -> None:
        newest = latest_per_key(
            batch.select(
                F.lower("op").alias("op"), "ns", "ts", "data"
            ),
            [f"data.{k}" for k in keys],
            ["ts"],
        )

        def send_partition(it):
            def rows():
                for r in it:
                    d = r.asDict(recursive=True)
                    yield {"op": d["op"], "ns": d["ns"], "data": d["data"]}

            for body in es_bulk_payloads(
                rows(), index=index, version=version, parent_field=parent_field
            ):
                out = post(url.rstrip("/") + "/_bulk", body)
                if out.get("errors"):
                    raise RuntimeError(f"bulk errors in epoch {epoch_id}")

        newest.foreachPartition(send_partition)

    return apply


def _es_http_transport(timeout: float) -> Callable[[str, str], dict]:
    def post(bulk_url: str, body: str) -> dict:  # pragma: no cover - live ES
        # self-contained: imports inside (executors may not have the
        # repo on PYTHONPATH)
        import json as _json
        import urllib.request

        req = urllib.request.Request(
            bulk_url,
            data=body.encode(),
            headers={"Content-Type": "application/x-ndjson"},
        )
        resp = urllib.request.urlopen(req, timeout=timeout)
        return _json.loads(resp.read())

    return post


# ---------------------------------------------------------------------------
# MongoDB bulkWrite command documents
# ---------------------------------------------------------------------------

def mongo_bulk_ops(
    rows: Iterable[dict],
    id_field: str = "_id",
    op_field: str = "op",
    max_ops: int = 1000,
    max_bytes: int = 16 * 1024 * 1024,
    extended_json: bool = False,
) -> Iterator[List[dict]]:
    """Build MongoDB bulkWrite op batches from envelope rows.

    Insert/Update -> replaceOne with upsert=True (the reference's
    insert-falls-back-to-update + update-replaces-whole-doc contract,
    mongodb/writer.go:29-55 and reader.go:296-313: updates carry the
    full current document, never a delta). Delete -> deleteOne by id
    (:57-63). Batches split at `max_ops` (the server's
    maxWriteBatchSize the reference reads, client.go:33) or
    `max_bytes` (bulk.go:16's 16 MB BSON cap, approximated by JSON
    size). Ordered=false semantics (dup keys retried unordered,
    bulk.go:135-152) come from the driver's bulk_write(ordered=False).
    ``extended_json=True`` renders edge types as mejson v1 wrappers —
    for JSON-SERIALIZED consumers only (wire fixtures, commit logs,
    HTTP bridges, the reference's JS-transform boundary): the wrappers
    are not valid BSON values, so do NOT combine the flag with the
    pymongo bulk_write path (mongo_cdc_sink's default writer), which
    needs native datetime/Decimal128/bytes and would store literal
    '$numberLong' subdocuments and match nothing on wrapped id
    filters.
    """
    # extended_json=True renders BSON edge types (datetime/Decimal/
    # int64/bytes) as mejson v1 wrappers in both replacements AND id
    # filters — the reference's write-side round-trip
    # (function/gojajs/goja.go:97,144); see
    # functions/extended_json.mejson_wrap for the one conversion table
    batch: List[dict] = []
    size = 0
    if extended_json:
        from transporter_spark.functions.extended_json import mejson_wrap
    for row in rows:
        op = str(row.get(op_field, "insert")).lower()
        data = row.get("data") or {}
        doc_id = data.get(id_field, row.get(id_field))
        if extended_json:
            data = mejson_wrap(data)
            doc_id = mejson_wrap(doc_id)
        if op in _DELETE_OPS:
            entry = {"deleteOne": {"filter": {id_field: doc_id}}}
        elif op in ("insert", "update"):
            entry = {
                "replaceOne": {
                    "filter": {id_field: doc_id},
                    "replacement": data,
                    "upsert": True,
                }
            }
        else:
            continue
        entry_bytes = len(_dumps(entry))
        if batch and (len(batch) + 1 > max_ops or size + entry_bytes > max_bytes):
            yield batch
            batch, size = [], 0
        batch.append(entry)
        size += entry_bytes
    if batch:
        yield batch


def mongo_cdc_sink(
    uri: str,
    database: str,
    collection: Optional[str] = None,
    keys: Sequence[str] = ("_id",),
    bulk_writer: Optional[Callable[[str, str, List[dict]], None]] = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink: LWW-collapse the epoch, then per-partition
    bulk_write(ordered=False) via pymongo.

    `bulk_writer(database, collection, ops) -> None` receives each
    flushed op batch (the mongo_bulk_ops command documents) in order;
    it defaults to a pymongo bulk_write and is injectable so the
    LWW-collapse -> op-build -> flush composition executes against a
    recording fake. Must be picklable — it ships to executors. Gated
    on pymongo + a reachable server otherwise; the official
    mongo-spark connector is the preferred path when its jar is
    deployed — this sink is the dependency-free fallback with
    identical semantics."""
    from transporter_spark.streaming.cdc import latest_per_key

    write = bulk_writer or _pymongo_bulk_writer(uri)

    def apply(batch: DataFrame, epoch_id: int) -> None:
        newest = latest_per_key(
            batch.select(F.lower("op").alias("op"), "ns", "ts", "data"),
            [f"data.{k}" for k in keys],
            ["ts"],
        )

        def send_partition(it):
            def rows():
                for r in it:
                    d = r.asDict(recursive=True)
                    yield {"op": d["op"], "ns": d["ns"], "data": d["data"]}

            for ops in mongo_bulk_ops(rows()):
                write(database, collection or "default", ops)

        newest.foreachPartition(send_partition)

    return apply


def _pymongo_bulk_writer(uri: str) -> Callable[[str, str, List[dict]], None]:
    def write(database: str, collection: str, ops: List[dict]) -> None:  # pragma: no cover - live mongo
        try:
            import pymongo
        except ImportError as e:
            raise RuntimeError("mongo_cdc_sink needs pymongo") from e
        from pymongo import DeleteOne, ReplaceOne

        reqs = [
            DeleteOne(o["deleteOne"]["filter"])
            if "deleteOne" in o
            else ReplaceOne(
                o["replaceOne"]["filter"],
                o["replaceOne"]["replacement"],
                upsert=True,
            )
            for o in ops
        ]
        client = pymongo.MongoClient(uri)
        try:
            client[database][collection].bulk_write(reqs, ordered=False)
        finally:
            client.close()

    return write


# ---------------------------------------------------------------------------
# RabbitMQ publish payloads
# ---------------------------------------------------------------------------

def _make_rabbitmq_payloads(
    routing_key: str = "",
    key_field: Optional[str] = None,
    op_field: str = "op",
    ns_field: str = "ns",
) -> Callable[[Iterable[dict]], Iterator[Tuple[str, str, str]]]:
    """Factory building the payload generator as a CLOSURE so the sink's
    foreachPartition function captures it BY VALUE (worker-closure
    invariant, transforms._make_js_batch_runner): a module-level
    generator would cloudpickle as an import reference to this package,
    which breaks on executors without the repo on PYTHONPATH."""

    def payloads(rows: Iterable[dict]) -> Iterator[Tuple[str, str, str]]:
        import json as _json

        for row in rows:
            op = str(row.get(op_field, "insert")).lower()
            if op not in ("insert", "update"):
                continue
            data = row.get("data") or {}
            rk = str(data.get(key_field, routing_key)) if key_field else routing_key
            body = _json.dumps(
                data, sort_keys=True, separators=(",", ":"), default=str
            )
            yield (str(row.get(ns_field, "")), rk, body)

    return payloads


def rabbitmq_publish_payloads(
    rows: Iterable[dict],
    routing_key: str = "",
    key_field: Optional[str] = None,
    op_field: str = "op",
    ns_field: str = "ns",
) -> Iterator[Tuple[str, str, str]]:
    """(exchange, routing_key, body) triples for an AMQP publisher.

    Reference contract (rabbitmq/writer.go:34-58): exchange = the
    message namespace; routing key fixed, or read from a document
    field when `key_field` is set; Insert/Update published as JSON;
    Delete silently ignored (the one sink where parity means
    at-least-once publish, not exactly-once apply)."""
    return _make_rabbitmq_payloads(routing_key, key_field, op_field, ns_field)(
        rows
    )


def rabbitmq_sink(
    publisher: Callable[[str, str, str], None],
    routing_key: str = "",
    key_field: Optional[str] = None,
) -> Callable[["DataFrame", int], None]:
    """foreachBatch sink publishing an epoch to AMQP.

    Unlike the upsert sinks there is NO LWW collapse: RabbitMQ is a
    message feed, and the reference publishes every Insert/Update in
    arrival order (rabbitmq/writer.go:34-58, Delete ignored) —
    collapsing intermediate states would silently drop messages a
    downstream consumer is owed. Rows are ts-ordered within each
    partition (cross-partition order is undefined, exactly like the
    reference's concurrent sessions).

    `publisher(exchange, routing_key, body) -> None` must be picklable
    (ships to executors); inject a recording fake to execute the
    composition without a broker, or a pika-backed callable for real.
    """

    # built once, captured by the partition closure BY VALUE (nested
    # def from a factory — never a module-level name, which would need
    # this package importable on executors)
    payloads = _make_rabbitmq_payloads(routing_key=routing_key, key_field=key_field)

    def apply(batch: "DataFrame", epoch_id: int) -> None:
        staged = batch.select(
            F.lower("op").alias("op"), "ns", "ts", "data"
        ).sortWithinPartitions("ts")

        def send_partition(it):
            def rows():
                for r in it:
                    d = r.asDict(recursive=True)
                    yield {"op": d["op"], "ns": d["ns"], "data": d["data"]}

            for exchange, rk, body in payloads(rows()):
                publisher(exchange, rk, body)

        staged.foreachPartition(send_partition)

    return apply


# ---------------------------------------------------------------------------
# RethinkDB buffered insert-replace
# ---------------------------------------------------------------------------

def _make_rethinkdb_ops(
    id_field: str = "_id",
    op_field: str = "op",
    max_docs: int = 1000,
) -> Callable[[Iterable[dict]], Iterator[Tuple[str, object]]]:
    """Factory building the ops generator as a closure for by-value
    pickling into foreachPartition (same rationale as
    ``_make_rabbitmq_payloads``)."""

    def ops(rows: Iterable[dict]) -> Iterator[Tuple[str, object]]:
        def prepare(data: dict) -> dict:
            doc = dict(data)
            # prepareDocument (:96-106): a doc that already has `id` is
            # returned UNTOUCHED (even if `_id` is also present); only
            # when `id` is absent does `_id` rename to `id`
            if "id" not in doc and id_field in doc:
                doc["id"] = doc.pop(id_field)
            return doc

        buf: List[dict] = []
        for row in rows:
            op = str(row.get(op_field, "insert")).lower()
            data = row.get("data") or {}
            if op == "insert":
                buf.append(prepare(data))
                if len(buf) >= max_docs:
                    yield ("insert", buf)
                    buf = []
            elif op == "update":
                if buf:
                    yield ("insert", buf)
                    buf = []
                yield ("insert", [prepare(data)])
            elif op == "delete":
                if buf:
                    yield ("insert", buf)
                    buf = []
                doc_id = data.get(id_field, row.get(id_field))
                yield ("delete", doc_id)
        if buf:
            yield ("insert", buf)

    return ops


def rethinkdb_bulk_ops(
    rows: Iterable[dict],
    id_field: str = "_id",
    op_field: str = "op",
    max_docs: int = 1000,
) -> Iterator[Tuple[str, object]]:
    """Ordered (kind, payload) operations for a RethinkDB session.

    Reference contract (adaptor/rethinkdb/writer.go:48-146): Inserts
    buffer up to 1000 docs (writer.go:18) and flush as one
    ``insert(conflict="replace")``; an Update forces a flush first,
    then goes as its own insert-replace (:70-83); a Delete forces a
    flush, then ``get(id).delete()`` (:85-94) — updates and deletes
    are ordering barriers so a reordered buffer can't resurrect a
    deleted row. ``_id`` is renamed ``id`` (prepareDocument
    :96-106).

    Yields ("insert", [docs...]) and ("delete", id) in apply order.
    Pure function over an iterator: one instance per Spark partition
    inside foreachBatch, identical semantics, unit-testable without a
    server.
    """
    return _make_rethinkdb_ops(id_field, op_field, max_docs)(rows)


def rethinkdb_cdc_sink(
    database: str,
    table: str,
    keys: Sequence[str] = ("_id",),
    apply_op: Optional[Callable[[str, str, str, object], None]] = None,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink: LWW-collapse the epoch, then stream the
    collapsed rows through `rethinkdb_bulk_ops` per partition — the
    buffered insert-replace with update/delete flush barriers the
    reference writer implements (adaptor/rethinkdb/writer.go:48-146).

    `apply_op(database, table, kind, payload) -> None` receives each
    ("insert", [docs]) / ("delete", id) in apply order; must be
    picklable (ships to executors). Inject a recording fake to execute
    the composition serverless, or a rethinkdb-driver callable for
    real (gated: no server in this container)."""
    from transporter_spark.streaming.cdc import latest_per_key

    if apply_op is None:  # pragma: no cover - live rethinkdb
        raise RuntimeError(
            "rethinkdb_cdc_sink needs an apply_op callable (no rethinkdb "
            "driver in this environment)"
        )

    # by-value capture for the partition closure (worker-closure
    # invariant — see _make_rabbitmq_payloads)
    bulk_ops = _make_rethinkdb_ops()

    def apply(batch: DataFrame, epoch_id: int) -> None:
        newest = latest_per_key(
            batch.select(F.lower("op").alias("op"), "ns", "ts", "data"),
            [f"data.{k}" for k in keys],
            ["ts"],
        )

        def send_partition(it):
            def rows():
                for r in it:
                    d = r.asDict(recursive=True)
                    yield {"op": d["op"], "ns": d["ns"], "data": d["data"]}

            for kind, payload in bulk_ops(rows()):
                apply_op(database, table, kind, payload)

        newest.foreachPartition(send_partition)

    return apply
