"""WKB reader/writer — the on-the-wire geometry codec.

Geometry columns in Arrow blocks are WKB `binary` arrays; every stage
boundary round-trips through this module.  Replicates the observable
behaviour of the reference codec (reference: src/NetTopologySuite/IO/
WKBReader.cs:133 `Read`, IO/WKBWriter.cs:177 `Write`): both byte orders
on read, EWKB SRID flag, ISO and EWKB Z/M flags (Z/M ordinates parsed and
dropped — XY engine, SURVEY.md §1.3).  Writes little-endian XY WKB.
"""

from __future__ import annotations

import struct

import numpy as np

from .types import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    WKB_CODE,
    WKB_NAME,
    Geom,
)

_EWKB_Z = 0x80000000
_EWKB_M = 0x40000000
_EWKB_SRID = 0x20000000


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def geometry(self) -> Geom:
        bo = "<" if self.buf[self.pos] == 1 else ">"
        self.pos += 1
        (code,) = struct.unpack_from(bo + "I", self.buf, self.pos)
        self.pos += 4
        if code & _EWKB_SRID:
            self.pos += 4  # skip SRID
        ndim = 2
        if code & _EWKB_Z:
            ndim += 1
        if code & _EWKB_M:
            ndim += 1
        base = code & 0x0FFFFFFF
        # ISO WKB: 1000+ = Z, 2000+ = M, 3000+ = ZM
        iso = base // 1000
        if iso in (1, 2):
            ndim += 1
        elif iso == 3:
            ndim += 2
        base = base % 1000
        name = WKB_NAME.get(base)
        if name is None:
            raise ValueError(f"unknown WKB geometry code {code}")
        return getattr(self, "_" + name)(bo, ndim)

    def _coords(self, bo: str, n: int, ndim: int) -> np.ndarray:
        nbytes = n * ndim * 8
        arr = np.frombuffer(self.buf, dtype=bo + "f8", count=n * ndim, offset=self.pos)
        self.pos += nbytes
        arr = arr.reshape(n, ndim)[:, :2]
        return np.ascontiguousarray(arr, dtype=np.float64)

    def _count(self, bo: str) -> int:
        (n,) = struct.unpack_from(bo + "I", self.buf, self.pos)
        self.pos += 4
        return n

    def _Point(self, bo: str, ndim: int) -> Geom:
        pt = self._coords(bo, 1, ndim)[0]
        if np.isnan(pt).all():
            return Geom.empty(POINT)
        return Geom(POINT, pt.copy())

    def _LineString(self, bo: str, ndim: int) -> Geom:
        n = self._count(bo)
        return Geom(LINESTRING, self._coords(bo, n, ndim))

    def _Polygon(self, bo: str, ndim: int) -> Geom:
        nr = self._count(bo)
        rings = []
        for _ in range(nr):
            n = self._count(bo)
            rings.append(self._coords(bo, n, ndim))
        return Geom(POLYGON, rings)

    def _multi(self, n: int):
        return [self.geometry() for _ in range(n)]

    def _MultiPoint(self, bo: str, ndim: int) -> Geom:
        n = self._count(bo)
        return Geom(MULTIPOINT, [g.data for g in self._multi(n) if not g.is_empty])

    def _MultiLineString(self, bo: str, ndim: int) -> Geom:
        n = self._count(bo)
        return Geom(MULTILINESTRING, [g.data for g in self._multi(n)])

    def _MultiPolygon(self, bo: str, ndim: int) -> Geom:
        n = self._count(bo)
        return Geom(MULTIPOLYGON, [g.data for g in self._multi(n)])

    def _GeometryCollection(self, bo: str, ndim: int) -> Geom:
        n = self._count(bo)
        return Geom(GEOMETRYCOLLECTION, self._multi(n))


def from_wkb(buf) -> Geom:
    if buf is None:
        return Geom.empty(GEOMETRYCOLLECTION)
    return _Reader(bytes(buf)).geometry()


def to_wkb(g: Geom) -> bytes:
    out = bytearray()
    _write(g, out)
    return bytes(out)


def _hdr(out: bytearray, gtype: str):
    out += b"\x01"
    out += struct.pack("<I", WKB_CODE[gtype])


def _write_coords(out: bytearray, arr: np.ndarray, with_count: bool = True):
    arr = np.ascontiguousarray(arr, dtype="<f8")
    if with_count:
        out += struct.pack("<I", len(arr))
    out += arr.tobytes()


def _write(g: Geom, out: bytearray):
    t = g.gtype
    _hdr(out, t)
    if t == POINT:
        if g.is_empty:
            out += struct.pack("<dd", float("nan"), float("nan"))
        else:
            out += struct.pack("<dd", g.data[0], g.data[1])
    elif t == LINESTRING:
        _write_coords(out, g.data.reshape(-1, 2))
    elif t == POLYGON:
        out += struct.pack("<I", len(g.data))
        for r in g.data:
            _write_coords(out, r)
    elif t == MULTIPOINT:
        out += struct.pack("<I", len(g.data))
        for p in g.data:
            _hdr(out, POINT)
            out += struct.pack("<dd", p[0], p[1])
    elif t == MULTILINESTRING:
        out += struct.pack("<I", len(g.data))
        for ls in g.data:
            _hdr(out, LINESTRING)
            _write_coords(out, ls)
    elif t == MULTIPOLYGON:
        out += struct.pack("<I", len(g.data))
        for rings in g.data:
            _hdr(out, POLYGON)
            out += struct.pack("<I", len(rings))
            for r in rings:
                _write_coords(out, r)
    elif t == GEOMETRYCOLLECTION:
        out += struct.pack("<I", len(g.data))
        for c in g.data:
            _write(c, out)
    else:
        raise ValueError(t)


# ---------------------------------------------------------------------------
# batch helpers (used by map_batches stages)


def decode_column(col) -> list:
    """Decode an Arrow/numpy column of WKB binary into a list of Geoms."""
    return [from_wkb(b) for b in col]


def encode_column(geoms) -> list:
    return [to_wkb(g) for g in geoms]
