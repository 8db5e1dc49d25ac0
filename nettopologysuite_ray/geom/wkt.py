"""WKT reader/writer.

Replicates the observable behaviour of the reference's WKT codec
(reference: src/NetTopologySuite/IO/WKTReader.cs:55 `Read`,
IO/WKTWriter.cs:22) for the XY subset: the seven OGC types, EMPTY
geometries, nested collections.  Not a port — a small recursive-descent
parser over a regex token stream.
"""

from __future__ import annotations

import re

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

_TOKEN = re.compile(
    r"\s*(?:"
    r"(?P<num>[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?)"
    r"|(?P<word>[A-Za-z]+)"
    r"|(?P<punct>[(),])"
    r")"
)


class _Tokens:
    __slots__ = ("toks", "i")

    def __init__(self, s: str):
        self.toks = []
        pos = 0
        n = len(s)
        while pos < n:
            m = _TOKEN.match(s, pos)
            if m is None:
                if s[pos:].strip() == "":
                    break
                raise ValueError(f"bad WKT at position {pos}: {s[pos:pos+20]!r}")
            pos = m.end()
            if m.lastgroup == "num":
                self.toks.append(float(m.group("num")))
            elif m.lastgroup == "word":
                self.toks.append(m.group("word").upper())
            else:
                self.toks.append(m.group("punct"))
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of WKT")
        self.i += 1
        return t

    def expect(self, tok):
        t = self.next()
        if t != tok:
            raise ValueError(f"expected {tok!r}, got {t!r}")


def from_wkt(s: str) -> Geom:
    tk = _Tokens(s)
    g = _geometry(tk)
    return g


def _maybe_dim_tag(tk: _Tokens) -> int:
    """Consume optional Z / M / ZM tag; return number of extra ordinates."""
    t = tk.peek()
    if t in ("Z", "M"):
        tk.next()
        return 1
    if t == "ZM":
        tk.next()
        return 2
    return 0


def _geometry(tk: _Tokens) -> Geom:
    tag = tk.next()
    if not isinstance(tag, str):
        raise ValueError(f"expected geometry tag, got {tag!r}")
    extra = _maybe_dim_tag(tk)
    if tag == "POINT":
        pts = _coordseq_or_empty(tk, extra)
        if pts is None or len(pts) == 0:
            return Geom.empty(POINT)
        return Geom(POINT, pts[0].copy())
    if tag == "LINESTRING" or tag == "LINEARRING":
        pts = _coordseq_or_empty(tk, extra)
        subtype = "LinearRing" if tag == "LINEARRING" else None
        if pts is None:
            return Geom.empty(LINESTRING)
        return Geom(LINESTRING, pts, tag=subtype)
    if tag == "POLYGON":
        rings = _ringseq_or_empty(tk, extra)
        if rings is None:
            return Geom.empty(POLYGON)
        return Geom(POLYGON, rings)
    if tag == "MULTIPOINT":
        if _is_empty(tk):
            return Geom.empty(MULTIPOINT)
        tk.expect("(")
        pts = []
        while True:
            if tk.peek() == "(":
                tk.expect("(")
                pts.append(_coords_row(tk, extra))
                tk.expect(")")
            elif tk.peek() == "EMPTY":
                tk.next()
            else:
                pts.append(_coords_row(tk, extra))
            t = tk.next()
            if t == ")":
                break
            if t != ",":
                raise ValueError(f"bad MULTIPOINT at {t!r}")
        return Geom(MULTIPOINT, pts)
    if tag == "MULTILINESTRING":
        if _is_empty(tk):
            return Geom.empty(MULTILINESTRING)
        tk.expect("(")
        parts = []
        while True:
            pts = _coordseq_or_empty(tk, extra)
            if pts is not None:
                parts.append(pts)
            t = tk.next()
            if t == ")":
                break
            if t != ",":
                raise ValueError(f"bad MULTILINESTRING at {t!r}")
        return Geom(MULTILINESTRING, parts)
    if tag == "MULTIPOLYGON":
        if _is_empty(tk):
            return Geom.empty(MULTIPOLYGON)
        tk.expect("(")
        polys = []
        while True:
            rings = _ringseq_or_empty(tk, extra)
            if rings is not None:
                polys.append(rings)
            t = tk.next()
            if t == ")":
                break
            if t != ",":
                raise ValueError(f"bad MULTIPOLYGON at {t!r}")
        return Geom(MULTIPOLYGON, polys)
    if tag == "GEOMETRYCOLLECTION":
        if _is_empty(tk):
            return Geom.empty(GEOMETRYCOLLECTION)
        tk.expect("(")
        geoms = []
        while True:
            geoms.append(_geometry(tk))
            t = tk.next()
            if t == ")":
                break
            if t != ",":
                raise ValueError(f"bad GEOMETRYCOLLECTION at {t!r}")
        return Geom(GEOMETRYCOLLECTION, geoms)
    raise ValueError(f"unknown geometry tag {tag!r}")


def _is_empty(tk: _Tokens) -> bool:
    if tk.peek() == "EMPTY":
        tk.next()
        return True
    return False


def _coords_row(tk: _Tokens, extra: int) -> np.ndarray:
    x = tk.next()
    if x == "NAN":
        x = float("nan")
    y = tk.next()
    if y == "NAN":
        y = float("nan")
    if not isinstance(x, float) or not isinstance(y, float):
        raise ValueError(f"expected coordinates, got {x!r} {y!r}")
    # consume (and drop) optional Z/M ordinates
    for _ in range(extra):
        if isinstance(tk.peek(), float):
            tk.next()
    # untagged Z/M: numbers still pending before , or )
    while isinstance(tk.peek(), float):
        tk.next()
    return np.array([x, y], dtype=np.float64)


def _coordseq_or_empty(tk: _Tokens, extra: int):
    if _is_empty(tk):
        return None
    tk.expect("(")
    rows = []
    while True:
        rows.append(_coords_row(tk, extra))
        t = tk.next()
        if t == ")":
            break
        if t != ",":
            raise ValueError(f"bad coordinate sequence at {t!r}")
    return np.array(rows, dtype=np.float64)


def _ringseq_or_empty(tk: _Tokens, extra: int):
    if _is_empty(tk):
        return None
    tk.expect("(")
    rings = []
    while True:
        pts = _coordseq_or_empty(tk, extra)
        if pts is not None:
            rings.append(pts)
        t = tk.next()
        if t == ")":
            break
        if t != ",":
            raise ValueError(f"bad ring sequence at {t!r}")
    return rings


# ---------------------------------------------------------------------------
# writer


def _num(v: float) -> str:
    v = float(v)
    if v != v:
        return "NaN"  # reference WKTWriter invariant-culture NaN
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _seq(arr) -> str:
    return ", ".join(f"{_num(p[0])} {_num(p[1])}" for p in arr)


def to_wkt(g: Geom) -> str:
    t = g.gtype
    if t == POINT:
        if g.is_empty:
            return "POINT EMPTY"
        return f"POINT ({_num(g.data[0])} {_num(g.data[1])})"
    if t == LINESTRING:
        if g.is_empty:
            return "LINESTRING EMPTY"
        return f"LINESTRING ({_seq(g.data)})"
    if t == POLYGON:
        if g.is_empty:
            return "POLYGON EMPTY"
        rings = ", ".join(f"({_seq(r)})" for r in g.data)
        return f"POLYGON ({rings})"
    if t == MULTIPOINT:
        if g.is_empty:
            return "MULTIPOINT EMPTY"
        pts = ", ".join(f"({_num(p[0])} {_num(p[1])})" for p in g.data)
        return f"MULTIPOINT ({pts})"
    if t == MULTILINESTRING:
        if g.is_empty:
            return "MULTILINESTRING EMPTY"
        parts = ", ".join(f"({_seq(ls)})" for ls in g.data)
        return f"MULTILINESTRING ({parts})"
    if t == MULTIPOLYGON:
        if g.is_empty:
            return "MULTIPOLYGON EMPTY"
        polys = ", ".join(
            "(" + ", ".join(f"({_seq(r)})" for r in rings) + ")" for rings in g.data
        )
        return f"MULTIPOLYGON ({polys})"
    if t == GEOMETRYCOLLECTION:
        if g.is_empty:
            return "GEOMETRYCOLLECTION EMPTY"
        return "GEOMETRYCOLLECTION (" + ", ".join(to_wkt(c) for c in g.data) + ")"
    raise ValueError(t)
