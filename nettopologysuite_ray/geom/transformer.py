"""Structure-preserving per-component geometry rewriting.

GeometryTransformer mirrors the reference framework
(reference: Geometries/Utilities/GeometryTransformer.cs:46): subclasses
override ``transform_coordinates`` (or a per-type hook) and the base
class walks the geometry recursively, keeping the structure valid when
components change type or vanish —

- a transformed LinearRing that collapses to 1–3 points becomes a
  LineString (GeometryTransformer.cs:205 TransformLinearRing);
- a Polygon whose shell or any hole stops being a valid ring degrades to
  a GeometryCollection of its surviving linework
  (GeometryTransformer.cs:259 TransformPolygon);
- empty/None component results are pruned from Multi*/collections, and a
  single survivor is returned unwrapped — GeometryFactory.BuildGeometry
  semantics (GeometryTransformer.cs:172,236,310);
- a GeometryCollection stays a GeometryCollection
  (preserveGeometryCollectionType, GeometryTransformer.cs:71).

Z/M carry-through (the reference models XYZ/XYM/XYZM end to end via
CoordinateZ/CoordinateM/CoordinateZM; this engine stores them out of
band on ``Geom.extra``): when the input component carries extra
ordinates and ``transform_coordinates`` returns the SAME number of
vertices, the ordinates are carried through unchanged — exactly what a
2-D transform of 3-D data does in the reference (AffineTransformation
rewrites x/y and leaves z alone, Geometries/Utilities/
AffineTransformation.cs:71).  A transform that adds or drops vertices
cannot know which Z belongs where, so the carry is skipped for that
component (conservative: no silently wrong Z).  Subclasses doing
vertex-aware rewrites can override ``transform_extra_ords``.
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


def _ring_closed(arr: np.ndarray) -> bool:
    return len(arr) >= 4 and bool((arr[0] == arr[-1]).all())


def build_geometry(geoms: list[Geom]) -> Geom:
    """GeometryFactory.BuildGeometry: one geometry → itself; homogeneous
    simple types → the matching Multi*; mixed → GeometryCollection."""
    if not geoms:
        return Geom.empty(GEOMETRYCOLLECTION)
    if len(geoms) == 1:
        return geoms[0]
    kinds = {g.gtype for g in geoms}
    if kinds == {POINT}:
        return _with_child_extras(MULTIPOINT, geoms)
    if kinds == {LINESTRING}:
        return _with_child_extras(MULTILINESTRING, geoms)
    if kinds == {POLYGON}:
        return _with_child_extras(MULTIPOLYGON, geoms)
    return Geom(GEOMETRYCOLLECTION, list(geoms))


def _with_child_extras(gtype: str, children: list[Geom]) -> Geom:
    data = [g.data for g in children]
    if any(g.extra is not None for g in children):
        dims = next(g.extra["dims"] for g in children if g.extra is not None)
        ex = {"dims": dims, "ords": [g.extra["ords"] if g.extra else None for g in children]}
    else:
        ex = None
    return Geom(gtype, data, extra=ex)


class GeometryTransformer:
    """Override ``transform_coordinates(coords, parent)`` (coords is an
    (N, 2) float64 array; return the transformed (M, 2) array, or None /
    empty to drop the component) — or any of the per-type hooks — and
    call ``transform(geom)``.  See module docstring for the structural
    and Z/M-carry contract."""

    #: drop empty component results from Multi*/collection outputs
    prune_empty = True
    #: a GeometryCollection input always yields a GeometryCollection
    preserve_collection_type = True
    #: when True a degenerate transformed ring raises instead of
    #: degrading to a LineString (reference _preserveType)
    preserve_type = False

    # ---- the subclass surface -----------------------------------------

    def transform_coordinates(self, coords: np.ndarray, parent: Geom):
        """Default: identity copy (deep-copy-down-to-coordinates)."""
        return coords.copy()

    def transform_extra_ords(self, ords, coords_in, coords_out, parent: Geom):
        """Carry policy for out-of-band Z/M ordinates of one coordinate
        sequence: unchanged when the vertex count is preserved, dropped
        otherwise.  ``ords`` is (N, e) or None."""
        if ords is None or coords_out is None:
            return None
        if len(coords_out) == len(coords_in):
            return np.asarray(ords, dtype=np.float64).copy()
        return None

    # ---- driver --------------------------------------------------------

    def transform(self, g: Geom) -> Geom:
        t = g.gtype
        if t == POINT:
            return self.transform_point(g, None)
        if t == LINESTRING:
            return self.transform_linestring(g, None)
        if t == POLYGON:
            return self.transform_polygon(g, None)
        if t == MULTIPOINT:
            return self.transform_multipoint(g, None)
        if t == MULTILINESTRING:
            return self.transform_multilinestring(g, None)
        if t == MULTIPOLYGON:
            return self.transform_multipolygon(g, None)
        return self.transform_collection(g, None)

    # ---- helpers --------------------------------------------------------

    def _dims(self, g: Geom):
        return g.extra["dims"] if g.extra is not None else None

    def _mk_extra(self, dims, ords):
        if dims is None or ords is None:
            return None
        return {"dims": dims, "ords": ords}

    def _seq(self, coords, ords, parent: Geom):
        """Transform one coordinate sequence + its extra ordinates."""
        out = self.transform_coordinates(coords, parent)
        if out is None:
            return None, None
        out = np.asarray(out, dtype=np.float64).reshape(-1, 2)
        return out, self.transform_extra_ords(ords, coords, out, parent)

    # ---- per-type hooks (overridable) ------------------------------------

    def transform_point(self, g: Geom, parent) -> Geom:
        if g.is_empty:
            return Geom.empty(POINT)
        ords = g.extra["ords"] if g.extra is not None else None
        coords = g.data.reshape(1, 2)
        out, new_ords = self._seq(
            coords, None if ords is None else np.asarray(ords).reshape(1, -1), g
        )
        if out is None or len(out) == 0:
            return Geom.empty(POINT)
        ex = self._mk_extra(self._dims(g), new_ords[0].copy() if new_ords is not None else None)
        return Geom(POINT, out[0].copy(), extra=ex)

    def transform_linestring(self, g: Geom, parent) -> Geom:
        ords = g.extra["ords"] if g.extra is not None else None
        out, new_ords = self._seq(g.data, ords, g)
        if out is None:
            return Geom.empty(LINESTRING)
        return Geom(LINESTRING, out, extra=self._mk_extra(self._dims(g), new_ords))

    def _transform_ring(self, ring, ords, parent: Geom):
        """One polygon ring → ("ring"|"line"|"empty", coords, ords).
        Collapse to <4 points degrades ring→line (reference
        TransformLinearRing); with preserve_type that raises instead."""
        out, new_ords = self._seq(ring, ords, parent)
        if out is None or len(out) == 0:
            return "empty", None, None
        if len(out) < 4:
            if self.preserve_type:
                raise ValueError("transformed ring degenerated with preserve_type set")
            return "line", out, new_ords
        if not _ring_closed(out):
            return "line", out, new_ords
        return "ring", out, new_ords

    def transform_polygon(self, g: Geom, parent) -> Geom:
        if g.is_empty:
            return Geom.empty(POLYGON)
        ring_ords = g.extra["ords"] if g.extra is not None else [None] * len(g.data)
        dims = self._dims(g)
        results = [
            self._transform_ring(r, o, g) for r, o in zip(g.data, ring_ords)
        ]
        shell_kind = results[0][0]
        holes = [r for r in results[1:] if r[0] != "empty"]
        all_rings = shell_kind == "ring" and all(k == "ring" for k, _c, _o in holes)
        if all_rings:
            rings = [results[0][1]] + [c for _k, c, _o in holes]
            ords = [results[0][2]] + [o for _k, _c, o in holes]
            ex = self._mk_extra(dims, ords) if any(o is not None for o in ords) else None
            return Geom(POLYGON, rings, extra=ex)
        # degrade to the surviving linework (reference TransformPolygon
        # else-branch: BuildGeometry over shell + holes as LineStrings)
        comps = []
        if shell_kind != "empty":
            comps.append(
                Geom(LINESTRING, results[0][1], extra=self._mk_extra(dims, results[0][2]))
            )
        for _k, c, o in holes:
            comps.append(Geom(LINESTRING, c, extra=self._mk_extra(dims, o)))
        if not comps:
            return Geom.empty(POLYGON)
        return build_geometry(comps)

    def _child(self, g: Geom, i: int, ctype: str) -> Geom:
        """Component i of a Multi* WITH its slice of the extra record."""
        data = g.data[i]
        if g.extra is not None and g.extra["ords"][i] is not None:
            ex = {"dims": g.extra["dims"], "ords": g.extra["ords"][i]}
        else:
            ex = None
        return Geom(ctype, data, extra=ex)

    def transform_multipoint(self, g: Geom, parent) -> Geom:
        parts = [self._child(g, i, POINT) for i in range(len(g.data))]
        return self._transform_parts_list(parts, self.transform_point, g, MULTIPOINT)

    def transform_multilinestring(self, g: Geom, parent) -> Geom:
        parts = [self._child(g, i, LINESTRING) for i in range(len(g.data))]
        return self._transform_parts_list(parts, self.transform_linestring, g, MULTILINESTRING)

    def transform_multipolygon(self, g: Geom, parent) -> Geom:
        parts = [self._child(g, i, POLYGON) for i in range(len(g.data))]
        return self._transform_parts_list(parts, self.transform_polygon, g, MULTIPOLYGON)

    def _transform_parts_list(self, parts, fn, parent: Geom, empty_type: str) -> Geom:
        out = []
        for child in parts:
            res = fn(child, parent)
            if res is None or (self.prune_empty and res.is_empty):
                continue
            out.append(res)
        if not out:
            return Geom.empty(empty_type)
        return build_geometry(out)

    def transform_collection(self, g: Geom, parent) -> Geom:
        out = []
        for child in g.data:
            res = self.transform(child)
            if res is None or (self.prune_empty and res.is_empty):
                continue
            out.append(res)
        if self.preserve_collection_type:
            return Geom(GEOMETRYCOLLECTION, out)
        return build_geometry(out)


class AffineTransformer(GeometryTransformer):
    """x' = a·x + b·y + c ; y' = d·x + e·y + f per vertex (reference:
    Geometries/Utilities/AffineTransformation.cs:71).  Vertex counts are
    preserved, so Z/M ordinates carry through untouched — the same
    behavior as the reference transforming CoordinateZ sequences."""

    def __init__(self, a=1.0, b=0.0, c=0.0, d=0.0, e=1.0, f=0.0):
        self.row_x = (float(a), float(b), float(c))
        self.row_y = (float(d), float(e), float(f))

    def transform_coordinates(self, coords: np.ndarray, parent: Geom):
        a, b, c = self.row_x
        d, e, f = self.row_y
        out = np.empty_like(coords)
        out[:, 0] = a * coords[:, 0] + b * coords[:, 1] + c
        out[:, 1] = d * coords[:, 0] + e * coords[:, 1] + f
        return out


def transform_geometry(g: Geom, coord_fn) -> Geom:
    """One-shot functional form: apply ``coord_fn((N,2) array) -> (M,2)``
    to every coordinate sequence of ``g`` with full structural repair and
    Z/M carry — the UDF hook surface (SURVEY.md §2.11) in one call."""

    class _Fn(GeometryTransformer):
        def transform_coordinates(self, coords, parent):
            return coord_fn(coords)

    return _Fn().transform(g)


class GeometryEditor:
    """Structure-PRESERVING editor (reference:
    Geometries/Utilities/GeometryEditor.cs:62).

    Where GeometryTransformer may change the type structure, the editor
    keeps the component tree fixed: ``operation(component) -> Geom |
    None`` is applied to every Point/LineString component (polygon rings
    are passed as closed LineStrings) and to whole
    polygons/multis/collections before their members.  Returning None or
    an empty geometry deletes the component, and deletions propagate up
    exactly as the reference does: a deleted hole disappears, a deleted
    shell empties the whole polygon (GeometryEditor.cs:146), deleted
    members are dropped from Multi*/collections which KEEP their
    collection type (GeometryEditor.cs:160-186)."""

    def __init__(self, operation):
        self.operation = operation

    def edit(self, g: Geom) -> Geom:
        out = self._edit(g)
        return out if out is not None else Geom.empty(g.gtype)

    # ------------------------------------------------------------------
    def _edit(self, g: Geom):
        t = g.gtype
        if t in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
            return self._edit_collection(g)
        if t == POLYGON:
            return self._edit_polygon(g)
        res = self.operation(g)
        return None if res is None or res.is_empty else res

    def _edit_polygon(self, g: Geom):
        res = self.operation(g)
        if res is None or res.is_empty:
            return None
        shell = self._edit_ring(res.data[0])
        if shell is None:
            return None
        holes = []
        for ring in res.data[1:]:
            h = self._edit_ring(ring)
            if h is not None:
                holes.append(h)
        return Geom(POLYGON, [shell] + holes)

    def _edit_ring(self, ring):
        res = self.operation(Geom(LINESTRING, np.asarray(ring, dtype=np.float64)))
        if res is None or res.is_empty:
            return None
        arr = np.asarray(res.data, dtype=np.float64)
        if not _ring_closed(arr):
            raise ValueError(
                "GeometryEditor operation broke ring consistency "
                "(a LinearRing needs >= 4 coords with first == last); "
                "use GeometryTransformer for structure-changing rewrites"
            )
        return arr

    def _edit_collection(self, g: Geom):
        res = self.operation(g)
        if res is None:
            return None
        members = [self._edit(c) for c in res.geoms()]
        members = [m for m in members if m is not None]
        if g.gtype == GEOMETRYCOLLECTION:
            return Geom(GEOMETRYCOLLECTION, members)
        return Geom(g.gtype, [m.data for m in members])


def coordinate_operation(fn):
    """Adapter for GeometryEditor mirroring the reference
    CoordinateOperation (GeometryEditor.cs:228): ``fn(coords (N,2)
    ndarray, parent Geom) -> (M,2) ndarray`` is applied to the coordinate
    list of every Point/LineString/ring; other components pass through
    for the editor's own traversal.  Out-of-band Z/M ordinates
    (``Geom.extra``) carry through when the vertex count is preserved —
    the same conservative rule GeometryTransformer uses."""

    def op(g: Geom):
        if g.gtype == POINT:
            new = np.asarray(fn(g.data.reshape(1, 2), g), dtype=np.float64)
            if len(new) == 0:
                return None
            out = Geom(POINT, new[0].copy())
        elif g.gtype == LINESTRING:
            new = np.asarray(fn(g.data, g), dtype=np.float64)
            if len(new) == 0:
                return None
            out = Geom(LINESTRING, new)
        else:
            return g
        if g.extra is not None and g.num_points == out.num_points:
            out = Geom(out.gtype, out.data, extra=g.extra)
        return out

    return op


def geometry_map(g: Geom, op) -> Geom:
    """GeometryMapper.Map (reference:
    Geometries/Utilities/GeometryMapper.cs:26): apply ``op`` to each
    FIRST-LEVEL member of ``g`` (atomic geometry = itself), skip None
    results, and rebuild with BuildGeometry semantics."""
    members = list(g.geoms()) if g.gtype == GEOMETRYCOLLECTION else (
        [Geom(g.gtype[5:], d) for d in g.data]  # Multi* -> components
        if g.gtype in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON)
        else [g]
    )
    mapped = [r for r in (op(m) for m in members) if r is not None]
    return build_geometry(mapped)


def geometry_flat_map(g: Geom, op, empty_dim: int = 2) -> Geom:
    """GeometryMapper.FlatMap (GeometryMapper.cs:86): apply ``op`` to
    every ATOMIC component (recursing through nested collections), drop
    None/empty results, and rebuild; an all-dropped result is the empty
    geometry of ``empty_dim`` (0=point, 1=line, 2=polygon)."""
    mapped: list[Geom] = []

    def walk(x: Geom):
        for c in x.flatten():
            r = op(c)
            if r is not None and not r.is_empty:
                mapped.append(r)

    walk(g)
    if not mapped:
        return Geom.empty({0: POINT, 1: LINESTRING, 2: POLYGON}[empty_dim])
    return build_geometry(mapped)
