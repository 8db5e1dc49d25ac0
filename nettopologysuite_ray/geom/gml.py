"""GML 2/3 reading and writing (reference: IO/GML2/GMLReader.cs:17,
IO/GML2/GMLWriter.cs:20, IO/GML3/GML3Writer.cs:7).

GML2 coordinate text is comma-within-tuple, space-between-tuples
(``x,y x,y``); GML3 uses ``<gml:posList>``/``<gml:pos>`` with
space-separated ordinates.  The reader is namespace-agnostic and accepts
either dialect (coord / pos / coordinates / posList), like the
reference's GMLReader.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

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

GML_NS = "http://www.opengis.net/gml"


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _num(v: float) -> str:
    """Invariant-culture double formatting (shortest roundtrip, no
    trailing .0 for integers — matches the reference's NumberFormatter).
    NaN ordinates (corpus robustness inputs) print as NaN."""
    v = float(v)
    if v != v:
        return "NaN"
    if v == int(v) and abs(v) < 1e16:
        return str(int(v))
    return repr(v)


def _parse_coord_text(text: str) -> np.ndarray:
    """Parse the text of a coordinates/posList element into an (n,2) array.
    Handles both GML2 tuples (``x,y x,y``) and GML3 flat lists."""
    toks = text.replace("\n", " ").replace("\t", " ").strip()
    if not toks:
        return np.zeros((0, 2))
    if "," in toks:
        pts = []
        for tup in toks.split():
            parts = tup.split(",")
            pts.append((float(parts[0]), float(parts[1])))
        return np.array(pts, dtype=np.float64)
    flat = [float(t) for t in toks.split()]
    if len(flat) % 2:
        raise ValueError(f"odd ordinate count in GML coordinate list: {len(flat)}")
    return np.array(flat, dtype=np.float64).reshape(-1, 2)


def _read_posish(el) -> np.ndarray:
    """Collect coordinates from a geometry element's coord/pos/
    coordinates/posList children (any dialect)."""
    pts = []
    for child in el:
        name = _local(child.tag)
        if name in ("coordinates", "posList"):
            return _parse_coord_text(child.text or "")
        if name == "pos":
            flat = [float(t) for t in (child.text or "").split()]
            pts.append((flat[0], flat[1]))
        elif name == "coord":
            x = y = None
            for o in child:
                if _local(o.tag) == "X":
                    x = float(o.text)
                elif _local(o.tag) == "Y":
                    y = float(o.text)
            pts.append((x, y))
    return np.array(pts, dtype=np.float64) if pts else np.zeros((0, 2))


def _read_geom(el) -> Geom:
    name = _local(el.tag)
    if name == "Point":
        arr = _read_posish(el)
        return Geom(POINT, arr[0]) if len(arr) else Geom.empty(POINT)
    if name in ("LineString", "LinearRing"):
        arr = _read_posish(el)
        if len(arr) == 0:
            return Geom.empty(LINESTRING)
        return Geom(LINESTRING, arr, tag="LinearRing" if name == "LinearRing" else None)
    if name == "Polygon":
        shell = None
        holes = []
        for b in el:
            bname = _local(b.tag)
            if bname in ("outerBoundaryIs", "exterior"):
                for r in b:
                    shell = _read_posish(r)
            elif bname in ("innerBoundaryIs", "interior"):
                for r in b:
                    holes.append(_read_posish(r))
        if shell is None or len(shell) == 0:
            return Geom.empty(POLYGON)
        return Geom(POLYGON, [shell] + holes)
    if name in ("MultiPoint", "MultiLineString", "MultiCurve", "MultiPolygon", "MultiSurface", "MultiGeometry"):
        parts = []
        for m in el:
            for sub in m:
                parts.append(_read_geom(sub))
        if name == "MultiPoint":
            return Geom(MULTIPOINT, [p.data for p in parts]) if parts else Geom.empty(MULTIPOINT)
        if name in ("MultiLineString", "MultiCurve"):
            return Geom(MULTILINESTRING, [p.data for p in parts]) if parts else Geom.empty(MULTILINESTRING)
        if name in ("MultiPolygon", "MultiSurface"):
            return Geom(MULTIPOLYGON, [p.data for p in parts]) if parts else Geom.empty(MULTIPOLYGON)
        return Geom(GEOMETRYCOLLECTION, parts) if parts else Geom.empty(GEOMETRYCOLLECTION)
    raise ValueError(f"unsupported GML element: {name}")


def from_gml(text: str) -> Geom:
    return _read_geom(ET.fromstring(text))


# ---------------------------------------------------------------------------
# writing


def _coords_text(arr: np.ndarray, v2: bool) -> str:
    if v2:
        return " ".join(f"{_num(p[0])},{_num(p[1])}" for p in arr)
    return " ".join(f"{_num(p[0])} {_num(p[1])}" for p in arr)


def _w(g: Geom, v2: bool, parts: list) -> None:
    t = g.gtype
    coords_tag = "coordinates" if v2 else "posList"
    if t == POINT:
        if g.is_empty:
            parts.append("<gml:Point/>")
            return
        if v2:
            parts.append(f"<gml:Point><gml:coordinates>{_num(g.data[0])},{_num(g.data[1])}</gml:coordinates></gml:Point>")
        else:
            parts.append(f"<gml:Point><gml:pos>{_num(g.data[0])} {_num(g.data[1])}</gml:pos></gml:Point>")
    elif t == LINESTRING:
        parts.append(f"<gml:LineString><gml:{coords_tag}>{_coords_text(g.data, v2)}</gml:{coords_tag}></gml:LineString>")
    elif t == POLYGON:
        outer = "outerBoundaryIs" if v2 else "exterior"
        inner = "innerBoundaryIs" if v2 else "interior"
        buf = ["<gml:Polygon>"]
        if not g.is_empty:
            for ri, r in enumerate(g.data):
                b = outer if ri == 0 else inner
                buf.append(
                    f"<gml:{b}><gml:LinearRing><gml:{coords_tag}>{_coords_text(r, v2)}</gml:{coords_tag}></gml:LinearRing></gml:{b}>"
                )
        buf.append("</gml:Polygon>")
        parts.append("".join(buf))
    elif t in (MULTIPOINT, MULTILINESTRING, MULTIPOLYGON, GEOMETRYCOLLECTION):
        names = {
            MULTIPOINT: ("MultiPoint", "pointMember"),
            MULTILINESTRING: ("MultiLineString" if v2 else "MultiCurve", "lineStringMember" if v2 else "curveMember"),
            MULTIPOLYGON: ("MultiPolygon" if v2 else "MultiSurface", "polygonMember" if v2 else "surfaceMember"),
            GEOMETRYCOLLECTION: ("MultiGeometry", "geometryMember"),
        }
        outer_name, member = names[t]
        buf = [f"<gml:{outer_name}>"]
        for c in g.geoms():
            buf.append(f"<gml:{member}>")
            sub: list = []
            _w(c, v2, sub)
            buf.extend(sub)
            buf.append(f"</gml:{member}>")
        buf.append(f"</gml:{outer_name}>")
        parts.append("".join(buf))
    else:
        raise ValueError(t)


def to_gml2(g: Geom) -> str:
    parts: list = []
    _w(g, True, parts)
    out = "".join(parts)
    # namespace on the root element
    i = out.index(">")
    if out[i - 1] == "/":
        i -= 1
    return out[: i] + f' xmlns:gml="{GML_NS}"' + out[i:]


def to_gml3(g: Geom) -> str:
    parts: list = []
    _w(g, False, parts)
    out = "".join(parts)
    i = out.index(">")
    if out[i - 1] == "/":
        i -= 1
    return out[: i] + f' xmlns:gml="{GML_NS}"' + out[i:]
