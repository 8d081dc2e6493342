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
