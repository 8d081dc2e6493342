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
