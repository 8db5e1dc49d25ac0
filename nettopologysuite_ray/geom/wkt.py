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


def _maybe_dim_tag(tk: _Tokens) -> str:
    """Consume optional Z / M / ZM tag; return it ("" if none)."""
    t = tk.peek()
    if t in ("Z", "M", "ZM"):
        tk.next()
        return t
    return ""


def _extra_count(dims: str) -> int:
    return len(dims)  # "Z"/"M" -> 1, "ZM" -> 2, "" -> 0


def _dims_for(dims: str, widths) -> str:
    """Resolve the dims tag: explicit tag wins; untagged extra ordinates
    read as Z (3rd) / ZM (3rd+4th), matching the reference WKTReader."""
    if dims:
        return dims
    w = max(widths, default=0)
    if w >= 2:
        return "ZM"
    if w == 1:
        return "Z"
    return ""


def _pack_ext(rows):
    """rows: list of [x, y, *extras] -> (coords (N,2), ext (N,e)|None)."""
    arr = np.array([r[:2] for r in rows], dtype=np.float64)
    e = max((len(r) - 2 for r in rows), default=0)
    if e <= 0:
        return arr, None
    ext = np.full((len(rows), e), np.nan)
    for i, r in enumerate(rows):
        for j, v in enumerate(r[2:]):
            ext[i, j] = v
    return arr, ext


def _geometry(tk: _Tokens) -> Geom:
    tag = tk.next()
    if not isinstance(tag, str):
        raise ValueError(f"expected geometry tag, got {tag!r}")
    dims = _maybe_dim_tag(tk)
    extra = _extra_count(dims)

    def mk_extra(ords, widths):
        """Build the out-of-band Z/M record when extras were present."""
        d = _dims_for(dims, widths)
        if not d:
            return None
        return {"dims": d, "ords": ords}

    if tag == "POINT":
        pts = _coordseq_or_empty(tk, extra)
        if pts is None or len(pts[0]) == 0:
            return Geom.empty(POINT)
        arr, ext = pts
        ex = mk_extra(ext[0].copy() if ext is not None else None,
                      [ext.shape[1]] if ext is not None else [])
        return Geom(POINT, arr[0].copy(), extra=ex)
    if tag == "LINESTRING" or tag == "LINEARRING":
        pts = _coordseq_or_empty(tk, extra)
        subtype = "LinearRing" if tag == "LINEARRING" else None
        if pts is None:
            return Geom.empty(LINESTRING)
        arr, ext = pts
        ex = mk_extra(ext, [ext.shape[1]] if ext is not None else [])
        return Geom(LINESTRING, arr, tag=subtype, extra=ex)
    if tag == "POLYGON":
        rs = _ringseq_or_empty(tk, extra)
        if rs is None:
            return Geom.empty(POLYGON)
        rings, exts = rs
        widths = [e.shape[1] for e in exts if e is not None]
        ex = mk_extra(exts, widths) if any(e is not None for e in exts) else None
        return Geom(POLYGON, rings, extra=ex)
    if tag == "MULTIPOINT":
        if _is_empty(tk):
            return Geom.empty(MULTIPOINT)
        tk.expect("(")
        rows = []
        while True:
            if tk.peek() == "(":
                tk.expect("(")
                rows.append(_coords_row(tk, extra))
                tk.expect(")")
            elif tk.peek() == "EMPTY":
                tk.next()
            else:
                rows.append(_coords_row(tk, extra))
            t = tk.next()
            if t == ")":
                break
            if t != ",":
                raise ValueError(f"bad MULTIPOINT at {t!r}")
        arr, ext = _pack_ext(rows)
        pts = [arr[i].copy() for i in range(len(arr))]
        ex = None
        if ext is not None:
            ex = mk_extra([ext[i].copy() for i in range(len(ext))], [ext.shape[1]])
        return Geom(MULTIPOINT, pts, extra=ex)
    if tag == "MULTILINESTRING":
        if _is_empty(tk):
            return Geom.empty(MULTILINESTRING)
        tk.expect("(")
        parts = []
        exts = []
        while True:
            pts = _coordseq_or_empty(tk, extra)
            if pts is not None:
                parts.append(pts[0])
                exts.append(pts[1])
            t = tk.next()
            if t == ")":
                break
            if t != ",":
                raise ValueError(f"bad MULTILINESTRING at {t!r}")
        widths = [e.shape[1] for e in exts if e is not None]
        ex = mk_extra(exts, widths) if any(e is not None for e in exts) else None
        return Geom(MULTILINESTRING, parts, extra=ex)
    if tag == "MULTIPOLYGON":
        if _is_empty(tk):
            return Geom.empty(MULTIPOLYGON)
        tk.expect("(")
        polys = []
        pexts = []
        while True:
            rs = _ringseq_or_empty(tk, extra)
            if rs is not None:
                polys.append(rs[0])
                pexts.append(rs[1])
            t = tk.next()
            if t == ")":
                break
            if t != ",":
                raise ValueError(f"bad MULTIPOLYGON at {t!r}")
        widths = [e.shape[1] for pe in pexts for e in pe if e is not None]
        any_ext = any(e is not None for pe in pexts for e in pe)
        ex = mk_extra(pexts, widths) if any_ext else None
        return Geom(MULTIPOLYGON, polys, extra=ex)
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


def _coords_row(tk: _Tokens, extra: int) -> list:
    x = tk.next()
    if x == "NAN":
        x = float("nan")
    y = tk.next()
    if y == "NAN":
        y = float("nan")
    if not isinstance(x, float) or not isinstance(y, float):
        raise ValueError(f"expected coordinates, got {x!r} {y!r}")
    row = [x, y]
    # optional Z/M ordinates (tagged count, plus any untagged trailing)
    for _ in range(extra):
        if isinstance(tk.peek(), float):
            row.append(tk.next())
    while isinstance(tk.peek(), float):
        row.append(tk.next())
    return row


def _coordseq_or_empty(tk: _Tokens, extra: int):
    """Returns (coords (N,2), ext (N,e)|None) or None when EMPTY."""
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
    return _pack_ext(rows)


def _ringseq_or_empty(tk: _Tokens, extra: int):
    """Returns (rings, exts) or None when EMPTY."""
    if _is_empty(tk):
        return None
    tk.expect("(")
    rings = []
    exts = []
    while True:
        pts = _coordseq_or_empty(tk, extra)
        if pts is not None:
            rings.append(pts[0])
            exts.append(pts[1])
        t = tk.next()
        if t == ")":
            break
        if t != ",":
            raise ValueError(f"bad ring sequence at {t!r}")
    return rings, exts


# ---------------------------------------------------------------------------
# writer


def _num(v: float) -> str:
    v = float(v)
    if v != v:
        return "NaN"  # reference WKTWriter invariant-culture NaN
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _row(p, e=None) -> str:
    s = f"{_num(p[0])} {_num(p[1])}"
    if e is not None:
        for v in np.atleast_1d(e):
            s += f" {_num(v)}"
    return s


def _seq(arr, ext=None) -> str:
    if ext is None:
        return ", ".join(_row(p) for p in arr)
    return ", ".join(_row(p, ext[i]) for i, p in enumerate(arr))


def to_wkt(g: Geom) -> str:
    t = g.gtype
    ex = g.extra
    dims = f" {ex['dims']}" if ex else ""
    ords = ex["ords"] if ex else None
    if t == POINT:
        if g.is_empty:
            return "POINT EMPTY"
        return f"POINT{dims} ({_row(g.data, ords)})"
    if t == LINESTRING:
        if g.is_empty:
            return "LINESTRING EMPTY"
        return f"LINESTRING{dims} ({_seq(g.data, ords)})"
    if t == POLYGON:
        if g.is_empty:
            return "POLYGON EMPTY"
        rings = ", ".join(
            f"({_seq(r, ords[i] if ords else None)})" for i, r in enumerate(g.data)
        )
        return f"POLYGON{dims} ({rings})"
    if t == MULTIPOINT:
        if g.is_empty:
            return "MULTIPOINT EMPTY"
        pts = ", ".join(
            f"({_row(p, ords[i] if ords else None)})" for i, p in enumerate(g.data)
        )
        return f"MULTIPOINT{dims} ({pts})"
    if t == MULTILINESTRING:
        if g.is_empty:
            return "MULTILINESTRING EMPTY"
        parts = ", ".join(
            f"({_seq(ls, ords[i] if ords else None)})" for i, ls in enumerate(g.data)
        )
        return f"MULTILINESTRING{dims} ({parts})"
    if t == MULTIPOLYGON:
        if g.is_empty:
            return "MULTIPOLYGON EMPTY"
        polys = ", ".join(
            "("
            + ", ".join(
                f"({_seq(r, ords[i][j] if ords else None)})"
                for j, r in enumerate(rings)
            )
            + ")"
            for i, rings in enumerate(g.data)
        )
        return f"MULTIPOLYGON{dims} ({polys})"
    if t == GEOMETRYCOLLECTION:
        if g.is_empty:
            return "GEOMETRYCOLLECTION EMPTY"
        return "GEOMETRYCOLLECTION (" + ", ".join(to_wkt(c) for c in g.data) + ")"
    raise ValueError(t)
