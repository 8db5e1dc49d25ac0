"""KML geometry reading and writing (reference: IO/KML/KMLReader.cs:16,
IO/KML/KMLWriter.cs:27).

KML coordinates are ``x,y[,z]`` tuples separated by whitespace; Polygon
uses outerBoundaryIs/innerBoundaryIs > LinearRing; collections are
MultiGeometry.  Placemark wrappers are tolerated on read.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np

from .gml import _local, _num
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


def _parse_coords(text: str) -> np.ndarray:
    pts = []
    for tup in (text or "").split():
        parts = tup.split(",")
        pts.append((float(parts[0]), float(parts[1])))
    return np.array(pts, dtype=np.float64) if pts else np.zeros((0, 2))


def _find_coords(el) -> np.ndarray:
    for child in el:
        if _local(child.tag) == "coordinates":
            return _parse_coords(child.text)
    return np.zeros((0, 2))


def _read(el) -> Geom:
    name = _local(el.tag)
    if name in ("kml", "Document", "Folder", "Placemark"):
        for child in el:
            cname = _local(child.tag)
            if cname in ("Point", "LineString", "LinearRing", "Polygon", "MultiGeometry",
                         "Document", "Folder", "Placemark"):
                return _read(child)
        raise ValueError(f"no geometry inside <{name}>")
    if name == "Point":
        arr = _find_coords(el)
        return Geom(POINT, arr[0]) if len(arr) else Geom.empty(POINT)
    if name in ("LineString", "LinearRing"):
        arr = _find_coords(el)
        return Geom(LINESTRING, arr, tag="LinearRing" if name == "LinearRing" else None)
    if name == "Polygon":
        shell = None
        holes = []
        for b in el:
            bname = _local(b.tag)
            if bname == "outerBoundaryIs":
                for r in b:
                    shell = _find_coords(r)
            elif bname == "innerBoundaryIs":
                for r in b:
                    holes.append(_find_coords(r))
        if shell is None or len(shell) == 0:
            return Geom.empty(POLYGON)
        return Geom(POLYGON, [shell] + holes)
    if name == "MultiGeometry":
        parts = [_read(c) for c in el if _local(c.tag) in
                 ("Point", "LineString", "LinearRing", "Polygon", "MultiGeometry")]
        if not parts:
            return Geom.empty(GEOMETRYCOLLECTION)
        kinds = {p.gtype for p in parts}
        if kinds == {POINT}:
            return Geom(MULTIPOINT, [p.data for p in parts])
        if kinds == {LINESTRING}:
            return Geom(MULTILINESTRING, [p.data for p in parts])
        if kinds == {POLYGON}:
            return Geom(MULTIPOLYGON, [p.data for p in parts])
        return Geom(GEOMETRYCOLLECTION, parts)
    raise ValueError(f"unsupported KML element: {name}")


def from_kml(text: str) -> Geom:
    return _read(ET.fromstring(text))


def _coords_text(arr) -> str:
    return " ".join(f"{_num(p[0])},{_num(p[1])}" for p in arr)


def _w(g: Geom, parts: list) -> None:
    t = g.gtype
    if t == POINT:
        if g.is_empty:
            parts.append("<Point><coordinates></coordinates></Point>")
        else:
            parts.append(f"<Point><coordinates>{_num(g.data[0])},{_num(g.data[1])}</coordinates></Point>")
    elif t == LINESTRING:
        parts.append(f"<LineString><coordinates>{_coords_text(g.data)}</coordinates></LineString>")
    elif t == POLYGON:
        buf = ["<Polygon>"]
        if not g.is_empty:
            for ri, r in enumerate(g.data):
                b = "outerBoundaryIs" if ri == 0 else "innerBoundaryIs"
                buf.append(f"<{b}><LinearRing><coordinates>{_coords_text(r)}</coordinates></LinearRing></{b}>")
        buf.append("</Polygon>")
        parts.append("".join(buf))
    elif t in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
        buf = ["<MultiGeometry>"]
        for c in g.geoms():
            sub: list = []
            _w(c, sub)
            buf.extend(sub)
        buf.append("</MultiGeometry>")
        parts.append("".join(buf))
    else:
        raise ValueError(t)


def to_kml(g: Geom) -> str:
    parts: list = []
    _w(g, parts)
    return "".join(parts)
