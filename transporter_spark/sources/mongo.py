"""MongoDB copy-scan + oplog-tail contracts, payload level.

Production reads go through the official mongo-spark connector
(``spark.read.format("mongodb")``); what the connector does NOT encode
is the reference's query-shape contract. This module pins it, pure and
unit-testable, exactly like pgdecode.py does for logical decoding:

- copy scan (adaptor/mongodb/reader.go:172-179 catQuery): per-collection
  user filter (``collection_filters``) merged with the resumable
  ``{_id: {$gt: lastID}}`` predicate, sorted by ``_id``.
- resumability (reader.go:181-205 requeryable): a scan may re-issue its
  query after an error ONLY if the collection has an ``_id`` index whose
  sampled value is a sortable type (ObjectId, string, float, int,
  datetime) — otherwise resuming from lastID could skip or repeat rows.
- resume points (reader.go:58-66): the commit-log resume map yields the
  collection's lastID + mode; Copy mode re-enters the scan from lastID,
  Sync mode goes straight to the tail from the saved timestamp.
- oplog tail (reader.go:216-294): tail ``local.oplog.rs`` filtered to
  ``{ns, ts: {$gte: oplogTime}}``; op ``i``/``d`` carry the document in
  ``o``; op ``u`` RE-FETCHES the full current document by ``o2._id``
  (getOriginalDoc, reader.go:296-313) — transporter treats every update
  as a wholesale document replace, which is exactly what makes the
  downstream CDC apply a pure last-writer-wins upsert
  (streaming/cdc.py). A failed re-fetch skips the message (not fatal).

The Spark streaming equivalent is the connector's change-stream source
with ``publishFullDocumentOnly=true`` (same re-fetch semantics); these
builders exist so the contract is explicit, testable, and reusable by a
custom DataSource if the connector is unavailable.
"""

from __future__ import annotations

import datetime
import json
from typing import Any, Callable, Dict, List, Optional, Tuple

SYSTEM_PREFIX = "system."


def copy_query(
    collection: str,
    collection_filters: Optional[Dict[str, dict]] = None,
    last_id: Any = None,
) -> dict:
    """The copy-phase find query (catQuery, reader.go:172-179): the
    per-collection user filter merged with the resume predicate. The
    user filter can never un-filter the resume predicate — ``_id`` is
    overwritten, not merged."""
    query: dict = {}
    if collection_filters and collection in collection_filters:
        query = dict(collection_filters[collection])
    if last_id is not None:
        query["_id"] = {"$gt": last_id}
    return query


def copy_pipeline(
    collection: str,
    collection_filters: Optional[Dict[str, dict]] = None,
    last_id: Any = None,
) -> str:
    """The same query as a mongo-spark-connector option value:
    ``.option("aggregation.pipeline", copy_pipeline(...))`` — a $match
    (pushed down by the connector) followed by the reference's
    ``Sort("_id")`` for deterministic resumable order."""
    pipeline: List[dict] = []
    match = copy_query(collection, collection_filters, last_id)
    if match:
        pipeline.append({"$match": match})
    pipeline.append({"$sort": {"_id": 1}})
    return json.dumps(pipeline, default=str)


def sortable_id(value: Any) -> bool:
    """Reference sortable() (reader.go:199-205): only these _id types
    give a total order under {$gt} resume. bytes stands in for
    bson.ObjectId at the payload level."""
    return isinstance(
        value, (bytes, str, float, int, datetime.datetime)
    ) and not isinstance(value, bool)


def requeryable(has_id_index: bool, sampled_id: Any) -> bool:
    """reader.go:181-205: re-issuing the copy query after an error is
    safe only with an _id index AND a sortable sampled _id; otherwise
    any read error aborts the copy (no silent skips/repeats)."""
    return bool(has_id_index) and sortable_id(sampled_id)


def resume_point(
    resume_map: Optional[Dict[str, dict]], collection: str
) -> Tuple[Any, str, Optional[int]]:
    """reader.go:58-66: (last_id, mode, ts) for a collection from the
    commit-log resume map. mode 'copy' re-enters the scan from last_id;
    'sync' skips straight to the tail from ts."""
    if not resume_map or collection not in resume_map:
        return (None, "copy", None)
    entry = resume_map[collection]
    return (
        entry.get("last_id"),
        entry.get("mode", "copy"),
        entry.get("ts"),
    )


# ---------------------------------------------------------------------------
# oplog tail
# ---------------------------------------------------------------------------

class MongoOplogStreamReader:
    """Oplog tail as a driver-buffered streaming reader — the same
    at-least-once buffer contract as sources/amqp.py and
    sources/rethinkdb.py (DataSourceStreamReader-shaped: initialOffset/
    latestOffset/partitions/read/commit), with the reference's
    copy-then-tail startup (reader.go:58-73: Copy mode scans the
    collection from last_id, then the tail starts from the saved
    timestamp).

    Client contract (injectable; production = pymongo or the
    mongo-spark connector's change stream): ``scan_docs(collection,
    query) -> iter of dict`` (sorted by _id), ``next_oplog_entry() ->
    Optional[dict]``, ``fetch_doc(collection, query) ->
    Optional[dict]``.
    """

    def __init__(
        self,
        client,
        collection: str,
        ns: str,
        collection_filters: Optional[Dict[str, dict]] = None,
        resume: Optional[Tuple[Any, str, Optional[int]]] = None,
        max_per_batch: int = 10000,
    ):
        self.client = client
        self.collection = collection
        self.ns = ns
        self.filters = collection_filters
        self.max_per_batch = max_per_batch
        last_id, mode, _ts = resume or (None, "copy", None)
        self._scan_pending = mode == "copy"
        self._last_id = last_id
        self._seq = 0
        self._buffer: Dict[int, Tuple[str, str, str, str]] = {}

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def _push(self, op: str, doc: dict, ts: int) -> None:
        self._buffer[self._seq] = (
            op,
            str(ts or ""),
            self.collection,
            json.dumps(doc, sort_keys=True, default=str),
        )
        self._seq += 1

    def latestOffset(self) -> dict:
        if self._scan_pending:
            query = copy_query(self.collection, self.filters, self._last_id)
            for doc in self.client.scan_docs(self.collection, query):
                self._push("insert", doc, 0)
                if "_id" in doc:
                    self._last_id = doc["_id"]
            self._scan_pending = False
        drained = 0
        while drained < self.max_per_batch:
            entry = self.client.next_oplog_entry()
            if entry is None:
                break
            if not valid_op(entry, self.ns):
                continue
            classified = classify_oplog_entry(
                entry,
                self.collection,
                lambda q: self.client.fetch_doc(self.collection, q),
                self.filters,
            )
            if classified is None:
                continue
            op, doc, ts = classified
            self._push(op, doc, ts)
            drained += 1
        return {"seq": self._seq}

    def partitions(self, start: dict, end: dict):
        return [
            [self._buffer[s] for s in range(start["seq"], end["seq"]) if s in self._buffer]
        ]

    def read(self, partition):
        return iter(partition)

    def commit(self, end: dict) -> None:
        for s in [s for s in self._buffer if s < end["seq"]]:
            del self._buffer[s]


def oplog_query(ns: Optional[str], since_ts: int) -> dict:
    """Initial tail query {ns, ts: {$gte}} (reader.go:230); after a
    cursor death the re-query drops the ns clause and resumes from the
    last seen ts (reader.go:288 — the ns filter moves to validOp)."""
    query: dict = {"ts": {"$gte": since_ts}}
    if ns is not None:
        query["ns"] = ns
    return query


def valid_op(entry: dict, ns: str) -> bool:
    """Only i/u/d entries for our namespace flow; everything else
    (noops, commands, other collections) is skipped."""
    return entry.get("op") in ("i", "u", "d") and entry.get("ns") == ns


def classify_oplog_entry(
    entry: dict,
    collection: str,
    fetch_doc: Callable[[dict], Optional[dict]],
    collection_filters: Optional[Dict[str, dict]] = None,
) -> Optional[Tuple[str, dict, int]]:
    """One oplog entry -> (op, doc, ts_seconds), or None to skip.

    - ``i`` -> insert with the new document (entry.o)
    - ``d`` -> delete with the id document (entry.o)
    - ``u`` -> update, but the emitted doc is the CURRENT full document
      re-fetched by ``entry.o2._id`` (getOriginalDoc, reader.go:296-313)
      — never the oplog delta. fetch_doc receives the find query
      (user collection filter + _id) and returns the doc or None; a
      failed fetch skips the message (reader.go:258-261: not fatal).

    ts is the oplog MongoTimestamp's seconds half (ts >> 32,
    reader.go:268)."""
    op_code = entry.get("op")
    ts = int(entry.get("ts", 0)) >> 32
    if op_code == "i":
        return ("insert", entry["o"], ts)
    if op_code == "d":
        return ("delete", entry["o"], ts)
    if op_code == "u":
        o2 = entry.get("o2") or {}
        if "_id" not in o2:
            return None  # can't get _id from document (reader.go:300-302)
        query = copy_query(collection, collection_filters)
        query["_id"] = o2["_id"]
        doc = fetch_doc(query)
        if doc is None:
            return None  # fetch failed: skip, not fatal
        return ("update", doc, ts)
    return None
