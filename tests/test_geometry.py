"""WKB-hex -> WKT parity (reference adaptor/mysql/reader.go:225-237:
strip 4-byte SRID, decode WKB, marshal WKT; writer re-wraps in
ST_GeomFromText, writer.go:66-96). WKB fixtures are built with struct
so the parser is tested against the spec, not against itself."""

from __future__ import annotations

import struct

from transporter_spark.functions.geometry import parse_wkb_hex, wkb_to_wkt
from transporter_spark.sources.jdbc import upsert_sql


def _wkb_point(x, y, srid=True):
    b = struct.pack("<BIdd", 1, 1, x, y)
    return ("00000000" if srid else "") + b.hex()


def _wkb_linestring(pts, srid=True):
    b = struct.pack("<BII", 1, 2, len(pts)) + b"".join(
        struct.pack("<dd", x, y) for x, y in pts
    )
    return ("00000000" if srid else "") + b.hex()


def _wkb_polygon(rings, srid=True):
    body = struct.pack("<BII", 1, 3, len(rings))
    for ring in rings:
        body += struct.pack("<I", len(ring)) + b"".join(
            struct.pack("<dd", x, y) for x, y in ring
        )
    return ("00000000" if srid else "") + body.hex()


def test_point_linestring_polygon():
    assert parse_wkb_hex(_wkb_point(15, 15)) == "POINT (15 15)"
    assert parse_wkb_hex(_wkb_point(1.5, -2.25)) == "POINT (1.5 -2.25)"
    assert (
        parse_wkb_hex(_wkb_linestring([(0, 0), (1, 1), (2, 2)]))
        == "LINESTRING (0 0, 1 1, 2 2)"
    )
    outer = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
    inner = [(5, 5), (7, 5), (7, 7), (5, 7), (5, 5)]
    assert parse_wkb_hex(_wkb_polygon([outer, inner])) == (
        "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (5 5, 7 5, 7 7, 5 7, 5 5))"
    )


def test_geometrycollection_and_multis():
    # GEOMETRYCOLLECTION(POINT(1 1), LINESTRING(0 0,1 1)) — the
    # reference test schema's collection case (adaptor_test.go:150)
    pt = struct.pack("<BIdd", 1, 1, 1.0, 1.0)
    ls = struct.pack("<BII", 1, 2, 2) + struct.pack("<dddd", 0, 0, 1, 1)
    gc = "00000000" + (struct.pack("<BII", 1, 7, 2) + pt + ls).hex()
    assert parse_wkb_hex(gc) == (
        "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 1 1))"
    )
    mp = "00000000" + (struct.pack("<BII", 1, 4, 2) + pt + pt).hex()
    assert parse_wkb_hex(mp) == "MULTIPOINT (1 1, 1 1)"


def test_big_endian_and_poison():
    be = "00000000" + (struct.pack(">BIdd", 0, 1, 3.0, 4.0)).hex()
    assert parse_wkb_hex(be) == "POINT (3 4)"
    assert parse_wkb_hex("zznothex") is None  # poison -> NULL, not a crash
    assert parse_wkb_hex(None) is None
    assert parse_wkb_hex("0101") is None  # truncated


def test_wkb_to_wkt_column(spark):
    df = spark.createDataFrame(
        [(1, _wkb_point(15, 15)), (2, None), (3, "garbage")], ["id", "wkb"]
    )
    rows = {r.id: r.wkt for r in df.select("id", wkb_to_wkt("wkb").alias("wkt")).collect()}
    assert rows == {1: "POINT (15 15)", 2: None, 3: None}


def test_upsert_sql_wraps_geometry_cols():
    sql = upsert_sql(
        "mysql", "t", ["id", "shape"], ["id"], geometry_cols=("shape",)
    )
    assert "SELECT `id`, ST_GeomFromText(`shape`) FROM `t_staging`" in sql
