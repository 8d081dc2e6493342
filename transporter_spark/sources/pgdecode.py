"""PostgreSQL logical-decoding (`test_decoding`) parser + tail source.

The reference's postgres CDC tailer polls
``pg_logical_slot_get_changes(slot)`` every second and regex-parses the
`test_decoding` plugin's textual output into documents
(adaptor/postgres/tailer.go:35-73 poll loop, :139-233 parser). The
format (public, shipped with postgres contrib):

    BEGIN 701
    table public.users: INSERT: id[integer]:1 name[text]:'al''ice'
    table public.users: UPDATE: id[integer]:1 name[text]:'bob'
    table public.users: DELETE: id[integer]:1
    COMMIT 701

This module re-implements that contract Spark-first:

- ``parse_test_decoding_line`` — one line -> (ns, op, doc) or None.
  Pure function, byte-for-byte testable without a database.
- ``PgDecodeTailDataSource`` — a streaming source over a growing file
  of test_decoding output (offset = byte position, the LSN analog;
  same replay contract as sources/datasource.py). Production wiring
  against a live slot swaps the file read for the slot poll — offsets
  become LSNs — with the parser unchanged; gated here because no
  database runs in this container.

Typing policy mirrors the reference's casify (tailer.go:236-290):
integers/bigints -> int, numeric/double -> float, boolean -> bool,
everything else stays the decoded string. Values are emitted inside a
JSON document column (the engine's schema-on-read envelope), so a
column set that varies per table needs no DDL.
"""

from __future__ import annotations

import json
import os
import re
from typing import Iterator, Optional, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_SCHEMA = "op string, ts string, ns string, json string"

_LINE_RE = re.compile(
    r"^table\s+(?P<schema>(?:\"[^\"]+\"|[^.\s]+))\.(?P<table>(?:\"[^\"]+\"|[^:\s]+)):"
    r"\s+(?P<op>INSERT|UPDATE|DELETE):\s*(?P<rest>.*)$"
)

# col[type]:value — value is 'quoted' (with '' escapes) or a bare token.
# The type ends at the first `]:` (not the first `]`): array types print
# as e.g. integer[] and parametrized ones as numeric(10,2).
_COL_RE = re.compile(
    r"(?P<col>(?:\"[^\"]+\"|[^\[\s]+))\[(?P<typ>.+?)\]:"
    r"(?P<val>'(?:[^']|'')*'|[^\s]+)"
)

_INT_TYPES = {"smallint", "integer", "bigint", "int2", "int4", "int8", "oid"}
_FLOAT_TYPES = {
    "numeric", "decimal", "real", "double precision", "float4", "float8", "money",
}


def _unquote_ident(s: str) -> str:
    if s.startswith('"') and s.endswith('"'):
        return s[1:-1]
    return s


def _coerce(typ: str, raw: str):
    """The casify policy (postgres/tailer.go:236-290): numeric types to
    numbers, booleans to bool, null to None, strings dequoted with ''
    unescaped; arrays/json/compound types stay as their literal text
    (the engine's JSON envelope keeps them lossless)."""
    if raw == "null":
        return None
    if raw.startswith("'") and raw.endswith("'"):
        text = raw[1:-1].replace("''", "'")
    else:
        text = raw
    base = typ.split("(")[0].strip().lower()
    try:
        if base in _INT_TYPES:
            return int(text)
        if base in _FLOAT_TYPES:
            return float(text)
    except ValueError:
        return text
    if base == "boolean":
        return text == "true"
    return text


def parse_test_decoding_line(line: str) -> Optional[Tuple[str, str, dict]]:
    """One test_decoding line -> (ns, op, doc); None for non-row lines
    (BEGIN/COMMIT markers, empty lines, unknown ops — the reference
    skips those too, tailer.go:149-160)."""
    m = _LINE_RE.match(line.strip())
    if not m:
        return None
    ns = f"{_unquote_ident(m.group('schema'))}.{_unquote_ident(m.group('table'))}"
    op = m.group("op").lower()
    doc = {
        _unquote_ident(c.group("col")): _coerce(c.group("typ"), c.group("val"))
        for c in _COL_RE.finditer(m.group("rest"))
    }
    return (ns, op, doc)


class _Range(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


class PgDecodeTailStreamReader(DataSourceStreamReader):
    """Byte offsets over a test_decoding output file — the same
    monotone-replayable contract as an LSN: [start, end) always yields
    the same rows, so Spark's checkpoint replaces the reference's
    commitlog + per-sink offset log."""

    def __init__(self, schema: StructType, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pgdecode_tail requires option 'path'")

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        # never land mid-line: a record split across micro-batches would
        # be dropped by the parse-skip on both halves (see
        # datasource.last_complete_offset)
        from transporter_spark.sources.datasource import last_complete_offset

        return {"pos": last_complete_offset(self.path)}

    def partitions(self, start: dict, end: dict):
        return [_Range(self.path, start["pos"], end["pos"])]

    def read(self, partition: _Range) -> Iterator[Tuple]:
        if partition.end <= partition.start:
            return
        with open(partition.path, "rb") as f:
            f.seek(partition.start)
            buf = f.read(partition.end - partition.start)
        for raw in buf.decode("utf-8", "replace").splitlines():
            parsed = parse_test_decoding_line(raw)
            if parsed is None:
                continue
            ns, op, doc = parsed
            yield (op, "", ns, json.dumps(doc, sort_keys=True, default=str))

    def commit(self, end: dict) -> None:
        pass  # the file/slot is the log; nothing to clean


class PgDecodeTailDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "pgdecode_tail"

    def schema(self) -> str:
        return _SCHEMA

    def streamReader(self, schema: StructType) -> PgDecodeTailStreamReader:
        return PgDecodeTailStreamReader(schema, self.options)
