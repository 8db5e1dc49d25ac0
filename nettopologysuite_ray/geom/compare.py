"""Canonical geometry ordering (reference: Geometries/Geometry.cs:1880-1927
CompareTo + per-class CompareToSameClass — Point.cs:286, LineString.cs:474,
Polygon.cs:473, GeometryCollection.cs element-wise Compare; SortIndexValue
at Geometry.cs:129).

Two surfaces:
- ``compare_geoms(a, b) -> int``: the reference ordering as a comparator.
- ``geometry_sort_key(g) -> bytes``: an ORDER-PRESERVING byte key such
  that ``geometry_sort_key(a) < geometry_sort_key(b)`` iff
  ``compare_geoms(a, b) < 0`` — so ``ds.sort("geom_key")`` reproduces the
  reference's geometry ordering distributively (Ray Data sorts the byte
  column; no comparator callback crosses the wire).

Key encoding: one sort-index byte, then the coordinate stream as
order-preserving big-endian float64 words (sign-flip transform), with
content ``0x00`` escaped to ``0x00 0xFF`` and two-byte structural
separators ``0x00 0x01`` (next collection element) < ``0x00 0x02`` (next
polygon ring) that sort below every content byte — which makes byte
order coincide with the reference's element-wise / ring-wise recursion,
including its "shorter sequence sorts first" and "empty sorts below
non-empty of the same type" rules (both become strict-prefix cases).
"""

from __future__ import annotations

import numpy as np

from .types import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geom,
)

# SortIndexValue (Geometry.cs:129): Point=0, MultiPoint, LineString,
# LinearRing, MultiLineString, Polygon, MultiPolygon, GeometryCollection
_BASE_INDEX = {
    POINT: 0,
    MULTIPOINT: 1,
    LINESTRING: 2,
    MULTILINESTRING: 4,
    POLYGON: 5,
    MULTIPOLYGON: 6,
    GEOMETRYCOLLECTION: 7,
}


def sort_index(g: Geom) -> int:
    if g.gtype == LINESTRING and g.tag == "LinearRing":
        return 3
    return _BASE_INDEX[g.gtype]


def _cmp(x, y) -> int:
    return (x > y) - (x < y)


def _cmp_coord(a, b) -> int:
    c = _cmp(float(a[0]), float(b[0]))
    return c if c else _cmp(float(a[1]), float(b[1]))


def _cmp_seq(pa_, pb) -> int:
    """CoordinateSequence compare (LineString.cs:474): element-wise, the
    shorter sequence sorts first."""
    n = min(len(pa_), len(pb))
    for i in range(n):
        c = _cmp_coord(pa_[i], pb[i])
        if c:
            return c
    return _cmp(len(pa_), len(pb))


def compare_geoms(a: Geom, b: Geom) -> int:
    """Geometry.CompareTo(Geometry) (Geometry.cs:1912-1927)."""
    c = _cmp(sort_index(a), sort_index(b))
    if c:
        return c
    ea, eb = a.is_empty, b.is_empty
    if ea and eb:
        return 0
    if ea:
        return -1
    if eb:
        return 1
    t = a.gtype
    if t == POINT:
        return _cmp_coord(a.data, b.data)
    if t == LINESTRING:
        return _cmp_seq(a.data, b.data)
    if t == POLYGON:
        # shell, then holes in order, then hole count (Polygon.cs:473)
        n = min(len(a.data), len(b.data))
        for i in range(n):
            c = _cmp_seq(a.data[i], b.data[i])
            if c:
                return c
        return _cmp(len(a.data), len(b.data))
    # collections (incl. Multi*): element-wise full CompareTo (empty
    # components included), the shorter collection sorts first
    # (GeometryCollection.cs Compare)
    ga = list(a.geoms())
    gb = list(b.geoms())
    n = min(len(ga), len(gb))
    for i in range(n):
        c = compare_geoms(ga[i], gb[i])
        if c:
            return c
    return _cmp(len(ga), len(gb))


# ---------------------------------------------------------------------------
# order-preserving byte key

_SEP_ELEM = b"\x00\x01"  # next collection element
_SEP_RING = b"\x00\x02"  # next polygon ring
_ESC_ZERO = b"\x00\xff"  # escaped content 0x00


def _escape(raw: bytes) -> bytes:
    return raw.replace(b"\x00", _ESC_ZERO)


def _enc_seq(arr) -> bytes:
    """Vectorized order-preserving encoding of an (N, 2) coord array."""
    a = np.ascontiguousarray(np.asarray(arr, dtype=np.float64).reshape(-1, 2))
    a = a + 0.0  # canonicalize -0.0 to 0.0
    u = a.reshape(-1).view(np.uint64).copy()
    neg = (u & np.uint64(0x8000000000000000)) != 0
    u[neg] ^= np.uint64(0xFFFFFFFFFFFFFFFF)
    u[~neg] |= np.uint64(0x8000000000000000)
    return _escape(u.astype(">u8").tobytes())


def _key_body(g: Geom) -> bytes:
    if g.is_empty:
        return b""
    t = g.gtype
    if t == POINT:
        return _enc_seq(g.data.reshape(1, 2))
    if t == LINESTRING:
        return _enc_seq(g.data)
    if t == POLYGON:
        return _SEP_RING.join(_enc_seq(r) for r in g.data)
    return _SEP_ELEM.join(geometry_sort_key(p) for p in g.geoms())


def geometry_sort_key(g: Geom) -> bytes:
    """Byte key reproducing compare_geoms under plain bytes comparison."""
    return bytes([sort_index(g)]) + _key_body(g)


def sort_key_batch(batch, wkb_col: str = "wkb", out_col: str = "geom_key"):
    """map_batches helper: append the canonical sort-key column to a WKB
    batch, so ``ds.map_batches(sort_key_batch).sort("geom_key")`` yields
    reference CompareTo order distributively."""
    import pyarrow as pa

    from .wkb import from_wkb

    keys = [geometry_sort_key(from_wkb(w)) for w in batch[wkb_col].to_pylist()]
    return batch.append_column(out_col, pa.array(keys, type=pa.binary()))
