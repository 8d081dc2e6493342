"""MySQL binlog RowsEvent -> envelope mapping, payload level.

Reference parity (adaptor/mysql/tailer.go:222-400): the binlog tail
receives go-mysql ``RowsEvent``s whose rows are POSITIONAL value lists
with no column names; the tailer

1. builds ``schema.table`` and applies the namespace filter FIRST —
   non-matching tables are skipped before any work (tailer.go:246-251);
2. maps the event type to an op (tailer.go:254-271):
       WRITE_ROWS  v1/v2 -> insert
       DELETE_ROWS v1/v2 -> delete
       UPDATE_ROWS v1/v2 -> update
   any other rows-event type is an error, non-rows events are skipped;
3. backfills column names from INFORMATION_SCHEMA.COLUMNS ordered by
   ORDINAL_POSITION (tailer.go:279-312);
4. for updates the binlog carries [before-image, after-image] row
   pairs and only the AFTER image is emitted (tailer.go:316-321) —
   full-row replace semantics, same contract as the Mongo oplog
   re-fetch, which keeps CDC apply a pure LWW upsert. (The reference
   skips only rows[0], which mishandles multi-row updates; this
   mapper emits every odd-indexed image — the stated intent.)
5. casifies each value by column type (reader.go:205-262): ints,
   floats/decimal, bit -> bit-string, geometry WKB -> WKT, else
   passthrough.

The Spark production path for binlog CDC is Debezium->Kafka->
``readStream.format("kafka")``; this mapper exists so the event
contract is pinned independent of that wiring, like pgdecode.py.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Dict, Iterable, List, Optional, Sequence, Tuple

# event-type name -> op; version suffixes as in go-mysql/replication
_WRITE = {"WRITE_ROWS_EVENTv1", "WRITE_ROWS_EVENTv2"}
_UPDATE = {"UPDATE_ROWS_EVENTv1", "UPDATE_ROWS_EVENTv2"}
_DELETE = {"DELETE_ROWS_EVENTv1", "DELETE_ROWS_EVENTv2"}
ROWS_EVENT_TYPES = _WRITE | _UPDATE | _DELETE

COLUMNS_QUERY = (
    "SELECT COLUMN_NAME AS column_name, DATA_TYPE as data_type "
    "FROM INFORMATION_SCHEMA.COLUMNS "
    "WHERE TABLE_SCHEMA = '{schema}' AND TABLE_NAME = '{table}' "
    "ORDER BY ORDINAL_POSITION"
)

_INT_TYPES = {"int", "smallint", "tinyint", "mediumint", "bigint"}
_FLOAT_TYPES = {"double", "float", "decimal"}
_GEOM_TYPES = {
    "geometry", "point", "linestring", "polygon",
    "multipoint", "multilinestring", "multipolygon", "geometrycollection",
}


def casify_mysql(value: Any, data_type: str) -> Any:
    """Per-value coercion (adaptor/mysql/reader.go:205-262). Binlog
    values arrive as bytes/str; typed Python values pass through."""
    if value is None or value == "null":
        return None
    if isinstance(value, bytes):
        if data_type in _GEOM_TYPES:
            from transporter_spark.functions.geometry import parse_wkb_hex

            # MySQL internal geometry = 4-byte SRID prefix + WKB
            return parse_wkb_hex(value.hex(), srid_prefix=True)
        if data_type == "bit":
            return bin(int.from_bytes(value, "big"))[2:]
        value = value.decode("utf-8", "replace")
    if isinstance(value, str):
        base = data_type.lower()
        try:
            if base in _INT_TYPES:
                return int(value)
            if base in _FLOAT_TYPES:
                return float(value)
        except ValueError:
            return value
        if base in _GEOM_TYPES:
            from transporter_spark.functions.geometry import parse_wkb_hex

            return parse_wkb_hex(value, srid_prefix=True)
        return value
    return value


def backfill_columns(row: Sequence[Any], columns: Sequence[Tuple[str, str]]) -> dict:
    """Positional binlog row + ordered (name, type) column metadata ->
    named document (parseEventRow, tailer.go:339-400). Extra trailing
    values (schema drift mid-binlog) keep positional names _colN."""
    doc: Dict[str, Any] = {}
    for i, value in enumerate(row):
        if i < len(columns):
            name, typ = columns[i]
        else:
            name, typ = f"_col{i}", ""
        doc[name] = casify_mysql(value, typ)
    return doc


class BinlogSkip(Exception):
    """Non-rows event or filtered namespace: skip, don't fail."""


class BinlogError(Exception):
    """Unknown rows-event subtype (tailer.go:268-271)."""


def map_rows_event(
    event: dict,
    columns: Sequence[Tuple[str, str]],
    ns_filter: Optional[Callable[[str], bool]] = None,
) -> List[Tuple[str, str, dict]]:
    """One RowsEvent -> [(op, ns, doc), ...].

    event: {"event_type": str, "schema": str, "table": str,
            "rows": [positional value list, ...]}.
    columns: ordered (name, data_type) from COLUMNS_QUERY.
    """
    etype = event.get("event_type", "")
    if etype not in ROWS_EVENT_TYPES:
        if etype.endswith("_ROWS_EVENT") or "ROWS" in etype.upper():
            raise BinlogError(f"unknown rows event subtype: {etype}")
        raise BinlogSkip(etype)
    ns = f"{event['schema']}.{event['table']}"
    if ns_filter is not None and not ns_filter(ns):
        raise BinlogSkip(ns)
    rows: Iterable[Sequence[Any]] = event.get("rows", [])
    if etype in _UPDATE:
        # [before, after] pairs: emit after-images only
        rows = [r for i, r in enumerate(rows) if i % 2 == 1]
        op = "update"
    elif etype in _WRITE:
        op = "insert"
    else:
        op = "delete"
    return [(op, ns, backfill_columns(r, columns)) for r in rows]


def binlog_offset(file: str, position: int) -> dict:
    """SHOW MASTER STATUS -> the tail's resume offset (tailer.go:41-77):
    monotone per (file, position), the streaming-source offset contract
    (same role as the jsonl_tail byte position)."""
    return {"file": file, "pos": int(position)}


def _offset_key(offset: dict) -> Tuple[str, int, int]:
    """Total order over binlog positions. File names rotate with a
    numeric suffix (mysql-bin.000001, .000002, ...) that MySQL WIDENS
    past 999999 instead of wrapping — plain lexicographic comparison
    would order mysql-bin.1000000 before mysql-bin.999999 and wedge
    the stream silently, so the suffix is compared numerically."""
    name = offset["file"]
    base, _, seq = name.rpartition(".")
    if seq.isdigit():
        return (base, int(seq), int(offset["pos"]))
    return (name, -1, int(offset["pos"]))


from pyspark.sql.datasource import (  # noqa: E402 - narrative header first
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class _Span(InputPartition):
    """Rows ride inside the partition (the binlog client lives on the
    driver, executors never open a replication socket). The binlog is a
    durable log, so a retried range re-reads identical events — the
    requeryable contract of sources/datasource.py."""

    def __init__(self, rows):
        self.rows = rows


class BinlogTailStreamReader(DataSourceStreamReader):
    """MySQL binlog tail with (file, pos) offsets — the engine side of
    the reference's mysql CDC tailer (adaptor/mysql/tailer.go:41-77
    resume bootstrap, :222-400 event mapping).

    Client contract (injectable; production wiring would sit on a
    replication client, none ships in this container):

    - ``master_status() -> (file, pos)`` — SHOW MASTER STATUS.
    - ``events_between(start, end) -> [((file, pos), event_dict), ...]``
      — every binlog event whose END offset falls in (start, end],
      in log order. Re-querying the same range yields identical
      events (the binlog is durable — this is what makes the offsets
      replayable where AMQP's are not).
    - ``columns(schema, table) -> [(name, data_type), ...]`` — the
      INFORMATION_SCHEMA backfill (COLUMNS_QUERY), cached per table
      for the reader's lifetime.

    ``resume=(file, pos)`` starts the tail at a saved offset; None
    tails from the current master status (changes from before the
    reader existed are the copy phase's job — the reference captures
    the status BEFORE the copy SELECT starts, so the copy/tail overlap
    re-delivers rather than loses, same as the mongo reader).
    """

    def __init__(self, client, ns_filter=None, resume=None):
        self.client = client
        self.ns_filter = ns_filter
        if resume is None:
            resume = client.master_status()
        self._start = binlog_offset(*resume)
        self._columns: Dict[Tuple[str, str], List[Tuple[str, str]]] = {}

    def initialOffset(self) -> dict:
        return dict(self._start)

    def latestOffset(self) -> dict:
        return binlog_offset(*self.client.master_status())

    def _table_columns(self, schema: str, table: str):
        key = (schema, table)
        if key not in self._columns:
            self._columns[key] = list(self.client.columns(schema, table))
        return self._columns[key]

    def partitions(self, start: dict, end: dict):
        rows: List[Tuple[str, str, str, str]] = []
        if _offset_key(end) > _offset_key(start):
            for (_file, _pos), event in self.client.events_between(
                (start["file"], start["pos"]), (end["file"], end["pos"])
            ):
                # classify/filter BEFORE any INFORMATION_SCHEMA work
                # (tailer.go:246-251): non-rows events (ROTATE, XID,
                # FORMAT_DESCRIPTION, QUERY) carry no schema/table, and
                # filtered tables must trigger no columns() lookup.
                # map_rows_event with empty columns performs exactly
                # those checks without touching the row payloads.
                try:
                    map_rows_event(
                        {**event, "rows": []}, (), self.ns_filter
                    )
                except BinlogSkip:
                    continue
                mapped = map_rows_event(
                    event,
                    self._table_columns(event["schema"], event["table"]),
                    self.ns_filter,
                )
                ts = str(event.get("ts", ""))
                for op, ns, doc in mapped:
                    rows.append(
                        (op, ts, ns, json.dumps(doc, sort_keys=True, default=str))
                    )
        return [_Span(rows)]

    def read(self, partition: _Span):
        return iter(partition.rows)

    def commit(self, end: dict) -> None:
        pass  # the binlog is the log; nothing buffered to forget


class BinlogDataSource(DataSource):
    """readStream.format("mysql_binlog") — format registration for the
    binlog tail.

    There is deliberately NO live wiring behind this format: the
    recommended Spark production path for MySQL CDC is Debezium ->
    Kafka -> ``readStream.format("kafka")`` (module header), and no
    replication client ships in this container. Deployments that want
    a direct tail implement the three-method client contract
    documented on ``BinlogTailStreamReader`` (master_status /
    events_between / columns — e.g. over the public
    pymysqlreplication package) and construct the reader directly;
    ``streamReader`` here raises with that guidance rather than
    pretending options it does not read. The offset, resume, rotation,
    and event-mapping semantics are fully exercised by the
    recording-fake lifecycle tests (tests/test_connectors.py).
    """

    @classmethod
    def name(cls) -> str:
        return "mysql_binlog"

    def schema(self) -> str:
        return "op string, ts string, ns string, json string"

    def streamReader(self, schema) -> BinlogTailStreamReader:
        raise RuntimeError(
            "mysql_binlog has no built-in live wiring: tail via "
            "Debezium->Kafka (readStream.format('kafka')), or build "
            "BinlogTailStreamReader with a client implementing "
            "master_status/events_between/columns"
        )
