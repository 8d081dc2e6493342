"""MongoDB extended-JSON normalization — the engine's policy for the
BSON edge types the reference round-trips via compose/mejson
(function/gojajs/goja.go:97,144; pipeline/node.go:461; SURVEY §7
'real custom' list).

Policy (EXTENDED_JSON_POLICY):
    {"$oid": "..."}           -> string (hex ObjectId)
    {"$date": millis|ISO}     -> timestamp
    {"$numberDecimal": "..."} -> decimal(38,10)
    {"$numberLong": "..."}    -> bigint
    {"$binary": {...}}        -> base64 payload string (binary opaque)

Everything is Column-level (get_json_object / casts) so a document
stream normalizes in one codegen'd projection — no per-row interpreter
like the reference's mejson marshal/unmarshal hop.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import Column
from pyspark.sql import functions as F

EXTENDED_JSON_POLICY: Dict[str, str] = {
    "$oid": "string",
    "$date": "timestamp",
    "$numberDecimal": "decimal(38,10)",
    "$numberLong": "bigint",
    "$binary": "string (base64 payload)",
}


def _json_path(field: str, key: str) -> str:
    # $-prefixed JSON keys need ['...'] quoting in JSONPath
    return f"$.{field}['{key}']"


def oid(json_col: str, field: str) -> Column:
    """Extract an ObjectId field to its hex string."""
    return F.coalesce(
        F.get_json_object(F.col(json_col), _json_path(field, "$oid")),
        F.get_json_object(F.col(json_col), f"$.{field}"),
    )


def date(json_col: str, field: str) -> Column:
    """Extract a $date (epoch-millis or ISO-8601 string) to timestamp."""
    raw = F.get_json_object(F.col(json_col), _json_path(field, "$date"))
    as_millis = F.timestamp_millis(raw.try_cast("long"))
    as_iso = raw.try_cast("timestamp")
    plain = F.get_json_object(F.col(json_col), f"$.{field}").try_cast("timestamp")
    return F.coalesce(as_millis, as_iso, plain)


def number_decimal(json_col: str, field: str) -> Column:
    raw = F.coalesce(
        F.get_json_object(F.col(json_col), _json_path(field, "$numberDecimal")),
        F.get_json_object(F.col(json_col), f"$.{field}"),
    )
    return raw.try_cast("decimal(38,10)")


def number_long(json_col: str, field: str) -> Column:
    raw = F.coalesce(
        F.get_json_object(F.col(json_col), _json_path(field, "$numberLong")),
        F.get_json_object(F.col(json_col), f"$.{field}"),
    )
    return raw.try_cast("bigint")


def binary_b64(json_col: str, field: str) -> Column:
    """$binary payload as its base64 string (binary stays opaque —
    the multimodal policy)."""
    return F.coalesce(
        F.get_json_object(F.col(json_col), _json_path(field, "$binary") + "['base64']"),
        F.get_json_object(F.col(json_col), _json_path(field, "$binary")),
    )


def normalize_extended_json(json_col: str, spec: Dict[str, str]):
    """Build typed columns from an extended-JSON string column.

    spec: field -> one of 'oid' | 'date' | 'decimal' | 'long' |
    'binary' | 'string'. Returns a list of aliased Columns.
    """
    builders = {
        "oid": oid,
        "date": date,
        "decimal": number_decimal,
        "long": number_long,
        "binary": binary_b64,
        "string": lambda c, f: F.get_json_object(F.col(c), f"$.{f}"),
    }
    return [builders[kind](json_col, field).alias(field) for field, kind in spec.items()]


# ---------------------------------------------------------------------------
# render-out (the write path): typed columns -> extended-JSON strings
# ---------------------------------------------------------------------------

#: inverse policy (VERDICT r10 item 7): what each kind renders as.
#: Matches mejson's v1 marshaling, which the reference re-emits
#: whenever docs cross into JS transforms or the commit log
#: (function/gojajs/goja.go:97,144; pipeline/node.go:461).
RENDER_POLICY: Dict[str, str] = {
    "oid": '{"$oid": "<hex>"}',
    "date": '{"$date": <epoch millis>}',
    "decimal": '{"$numberDecimal": "<digits>"}',
    "long": '{"$numberLong": "<digits>"}',
    "binary": '{"$binary": "<base64>", "$type": "00"}',
    "string": "plain JSON string",
}


def _render_field(field: str, kind: str) -> Column:
    c = F.col(field)
    if kind == "oid":
        return F.struct(c.cast("string").alias("$oid")).alias(field)
    if kind == "date":
        # epoch millis — mejson's canonical $date rendering; the cast
        # to LTZ is instant-preserving under the pinned UTC session tz
        return F.struct(
            F.unix_millis(c.cast("timestamp")).alias("$date")
        ).alias(field)
    if kind == "decimal":
        # decimal(38,10) renders with its full scale on both engines
        return F.struct(
            c.cast("decimal(38,10)").cast("string").alias("$numberDecimal")
        ).alias(field)
    if kind == "long":
        return F.struct(
            c.cast("long").cast("string").alias("$numberLong")
        ).alias(field)
    if kind == "binary":
        # subtype 00 (generic) — the only subtype this engine's opaque
        # binary policy produces
        return F.struct(
            F.base64(c).alias("$binary"), F.lit("00").alias("$type")
        ).alias(field)
    if kind == "string":
        return c.cast("string").alias(field)
    raise ValueError(
        f"to_extended_json: unknown kind {kind!r} for field {field!r} "
        f"(known: {sorted(RENDER_POLICY)})"
    )


def to_extended_json(spec: Dict[str, str]) -> Column:
    """Render typed columns INTO one extended-JSON document string —
    the inverse of `normalize_extended_json`, completing the
    round-trip the reference performs with mejson on its write path
    (goja.go:97,144): a Mongo-bound consumer of this engine's JSON
    output gets `{"$oid"...}`/`{"$date"...}` wrappers, not plain
    strings. spec is field -> kind ('oid' | 'date' | 'decimal' |
    'long' | 'binary' | 'string'), field order = output key order.

    One codegen'd `to_json(struct(...))` projection: escaping,
    unicode, and number rendering are the JSON writer's (identical in
    DuckDB's json_object — oracle-proven string-exact). NULL fields
    are OMITTED from the document (Spark's ignoreNullFields), which
    matches Mongo's absent-field semantics for the replace-style
    writes the sink performs."""
    return F.to_json(
        F.struct(*[_render_field(f, k) for f, k in spec.items()])
    )


def mejson_wrap(value):
    """Python-side twin of the render policy for the DICT path (the
    mongo bulk-op payload builder works on envelope dicts, not
    Columns): datetime -> {"$date": millis}, Decimal ->
    {"$numberDecimal": str}, int -> {"$numberLong": str}, bytes ->
    {"$binary": b64, "$type": "00"}; str/float/bool/None pass
    through; dicts/lists recurse. One conversion table for both
    surfaces — drift between the Column and dict renderers would
    corrupt the wire payloads the pytest contract pins."""
    import base64 as _b64
    import datetime as _dt
    import decimal as _dec

    if isinstance(value, bool) or value is None:
        return value
    if isinstance(value, _dt.datetime):
        epoch = (
            value
            if value.tzinfo is not None
            else value.replace(tzinfo=_dt.timezone.utc)
        )
        # exact integer floor-division via timedelta — int(timestamp()
        # * 1000) truncates toward zero, which renders pre-1970
        # fractional-second instants one millisecond HIGH vs BSON's
        # floor convention and the Column path's unix_millis (r11
        # review, empirically 1286/1288 sampled 1960 values drifted)
        delta = epoch - _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
        return {"$date": delta // _dt.timedelta(milliseconds=1)}
    if isinstance(value, _dec.Decimal):
        return {"$numberDecimal": str(value)}
    if isinstance(value, int):
        return {"$numberLong": str(value)}
    if isinstance(value, (bytes, bytearray)):
        return {
            "$binary": _b64.b64encode(bytes(value)).decode("ascii"),
            "$type": "00",
        }
    if isinstance(value, dict):
        return {k: mejson_wrap(v) for k, v in value.items()}
    if isinstance(value, (list, tuple)):
        return [mejson_wrap(v) for v in value]
    return value
