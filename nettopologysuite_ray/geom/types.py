"""Core geometry value types for the Ray-Data-native spatial engine.

A deliberately small, numpy-native object model covering the OGC Simple
Features type set that the reference implements as a class hierarchy
(reference: src/NetTopologySuite/Geometries/Geometry.cs:119 and the seven
concrete types).  Here a geometry is a tagged union over flat float64
coordinate arrays — the columnar layout the reference itself gestures at
with PackedDoubleCoordinateSequence
(Geometries/Implementation/PackedCoordinateSequence.cs:139).

Representation (XY only — v0 scope, see SURVEY.md §1.3):

  Point               data = (2,) float64 array, or (0,) when empty
  LineString          data = (N, 2) float64 array (N == 0 when empty)
  LinearRing          (represented as LineString rows; closed)
  Polygon             data = [ring0, ring1, ...] list of (N,2) arrays,
                      ring0 = shell, rest = holes; [] when empty
  MultiPoint          data = [Point-data, ...]
  MultiLineString     data = [(N,2) array, ...]
  MultiPolygon        data = [polygon-data(list of rings), ...]
  GeometryCollection  data = [Geom, ...]

On the wire (Arrow blocks in the Ray object store) geometries are WKB
`binary` columns — see wkb.py; this module is the in-batch parsed form.
"""

from __future__ import annotations

import numpy as np

POINT = "Point"
LINESTRING = "LineString"
POLYGON = "Polygon"
MULTIPOINT = "MultiPoint"
MULTILINESTRING = "MultiLineString"
MULTIPOLYGON = "MultiPolygon"
GEOMETRYCOLLECTION = "GeometryCollection"

_TYPES = (
    POINT,
    LINESTRING,
    POLYGON,
    MULTIPOINT,
    MULTILINESTRING,
    MULTIPOLYGON,
    GEOMETRYCOLLECTION,
)

# WKB geometry type integers (OGC) — shared by wkb.py.
WKB_CODE = {
    POINT: 1,
    LINESTRING: 2,
    POLYGON: 3,
    MULTIPOINT: 4,
    MULTILINESTRING: 5,
    MULTIPOLYGON: 6,
    GEOMETRYCOLLECTION: 7,
}
WKB_NAME = {v: k for k, v in WKB_CODE.items()}

_EMPTY2 = np.empty((0, 2), dtype=np.float64)


class Geom:
    """Immutable-by-convention geometry value.

    ``tag`` carries subtype info that affects semantics but not structure
    (currently only "LinearRing": parsed LINEARRING text — validity then
    requires simple-closed-ring rules, reference Geometries/LinearRing).

    ``extra`` carries Z/M ordinates OUT OF BAND for IO round-trip fidelity
    (reference round-trips Z/M: IO/WKBReader.cs:660-699): a dict
    {"dims": "Z"|"M"|"ZM", "ords": ...} whose ords mirror ``data``'s
    nesting with (N, e) float arrays.  The computational kernel is 2-D:
    operators build new Geoms without ``extra``, i.e. they drop Z/M —
    only the WKT/WKB/GML codecs read and write it."""

    __slots__ = ("gtype", "data", "tag", "extra", "_env")

    def __init__(self, gtype: str, data, tag: str | None = None, extra=None):
        if gtype not in _TYPES:
            raise ValueError(f"unknown geometry type {gtype!r}")
        self.gtype = gtype
        self.data = data
        self.tag = tag
        self.extra = extra
        # lazily-built per-ring envelope cache for the point-locate
        # kernels (never compared, never round-tripped; rebuilt on demand
        # after (de)serialization)
        self._env = None

    def __getstate__(self):
        return (self.gtype, self.data, self.tag, self.extra)

    def __setstate__(self, state):
        self.gtype, self.data, self.tag, self.extra = state
        self._env = None

    # ---- constructors -------------------------------------------------

    @staticmethod
    def point(x: float, y: float) -> "Geom":
        return Geom(POINT, np.array([x, y], dtype=np.float64))

    @staticmethod
    def empty(gtype: str = GEOMETRYCOLLECTION) -> "Geom":
        if gtype == POINT:
            return Geom(POINT, np.empty((0,), dtype=np.float64))
        if gtype == LINESTRING:
            return Geom(LINESTRING, _EMPTY2)
        return Geom(gtype, [])

    @staticmethod
    def linestring(coords) -> "Geom":
        return Geom(LINESTRING, _as_coords(coords))

    @staticmethod
    def polygon(shell, holes=()) -> "Geom":
        rings = [_close_ring(_as_coords(shell))]
        rings.extend(_close_ring(_as_coords(h)) for h in holes)
        return Geom(POLYGON, rings)

    @staticmethod
    def multipoint(coords) -> "Geom":
        arr = _as_coords(coords)
        return Geom(MULTIPOINT, [arr[i].copy() for i in range(len(arr))])

    @staticmethod
    def collection(geoms) -> "Geom":
        return Geom(GEOMETRYCOLLECTION, list(geoms))

    # ---- basic properties --------------------------------------------

    @property
    def is_empty(self) -> bool:
        if self.gtype == POINT:
            return self.data.size == 0
        if self.gtype == LINESTRING:
            return len(self.data) == 0
        if self.gtype == GEOMETRYCOLLECTION:
            return all(g.is_empty for g in self.data)
        return len(self.data) == 0

    def geoms(self):
        """Iterate component Geoms of a Multi*/collection (self if simple)."""
        t = self.gtype
        if t == GEOMETRYCOLLECTION:
            for g in self.data:
                yield g
        elif t == MULTIPOINT:
            for p in self.data:
                yield Geom(POINT, p)
        elif t == MULTILINESTRING:
            for ls in self.data:
                yield Geom(LINESTRING, ls)
        elif t == MULTIPOLYGON:
            for rings in self.data:
                yield Geom(POLYGON, rings)
        else:
            yield self

    def flatten(self):
        """Recursively yield simple (non-collection) components."""
        if self.gtype in (POINT, LINESTRING, POLYGON):
            if not self.is_empty:
                yield self
            return
        for g in self.geoms():
            yield from g.flatten()

    @property
    def dimension(self) -> int:
        """Topological dimension: P=0, L=1, A=2; collections = max; empty GC = -1
        (reference: Geometries/Dimension.cs:13)."""
        t = self.gtype
        if t == POINT or t == MULTIPOINT:
            return 0
        if t == LINESTRING or t == MULTILINESTRING:
            return 1
        if t == POLYGON or t == MULTIPOLYGON:
            return 2
        dims = [g.dimension for g in self.data if not g.is_empty]
        return max(dims) if dims else -1

    def coords_list(self):
        """All coordinate arrays (each (N,2)) in the geometry, flattened."""
        t = self.gtype
        if t == POINT:
            return [self.data.reshape(-1, 2)] if self.data.size else []
        if t == LINESTRING:
            return [self.data] if len(self.data) else []
        if t == POLYGON:
            return list(self.data)
        if t == MULTIPOINT:
            return [p.reshape(-1, 2) for p in self.data]
        if t == MULTILINESTRING:
            return list(self.data)
        if t == MULTIPOLYGON:
            return [r for rings in self.data for r in rings]
        out = []
        for g in self.data:
            out.extend(g.coords_list())
        return out

    def all_coords(self) -> np.ndarray:
        cs = self.coords_list()
        if not cs:
            return _EMPTY2
        return np.concatenate(cs, axis=0)

    @property
    def num_points(self) -> int:
        return sum(len(c) for c in self.coords_list())

    def __repr__(self) -> str:  # debug only
        from .wkt import to_wkt

        w = to_wkt(self)
        return w if len(w) <= 80 else w[:77] + "..."

    def __eq__(self, other) -> bool:
        """Structural exact equality (same type, same coords in order) —
        semantics of Geometry.EqualsExact(tol=0) (Geometries/Geometry.cs:1669)."""
        if not isinstance(other, Geom):
            return NotImplemented
        from .algorithms import equals_exact

        return equals_exact(self, other, 0.0)

    def __hash__(self):
        return hash((self.gtype, self.num_points))


def _as_coords(coords) -> np.ndarray:
    arr = np.asarray(coords, dtype=np.float64)
    if arr.size == 0:
        return _EMPTY2
    return arr.reshape(-1, 2)


def _close_ring(arr: np.ndarray) -> np.ndarray:
    if len(arr) >= 1 and (arr[0] != arr[-1]).any():
        arr = np.concatenate([arr, arr[:1]], axis=0)
    return arr
