"""Location-based linear referencing (reference:
LinearReferencing/LinearLocation.cs:21, LocationIndexedLine.cs:10,
LocationIndexOfPoint.cs, LocationIndexOfLine.cs,
ExtractLineByLocation.cs, LinearGeometryBuilder.cs).

A LinearLocation is (component_index, segment_index, segment_fraction)
on a LineString / MultiLineString; LocationIndexedLine indexes a linear
geometry by location.
"""

from __future__ import annotations

import math
from functools import total_ordering

import numpy as np

from .types import LINESTRING, MULTILINESTRING, Geom


def _components(g: Geom) -> list[np.ndarray]:
    if g.gtype == LINESTRING:
        return [g.data]
    if g.gtype == MULTILINESTRING:
        return list(g.data)
    raise ValueError("linear geometry required")


@total_ordering
class LinearLocation:
    """reference: LinearReferencing/LinearLocation.cs:21."""

    __slots__ = ("component_index", "segment_index", "segment_fraction")

    def __init__(
        self,
        component_index: int = 0,
        segment_index: int = 0,
        segment_fraction: float = 0.0,
        normalize: bool = True,
    ):
        self.component_index = int(component_index)
        self.segment_index = int(segment_index)
        self.segment_fraction = float(segment_fraction)
        if normalize:
            self._normalize()

    def _normalize(self) -> None:
        if self.segment_fraction < 0.0:
            self.segment_fraction = 0.0
        if self.segment_fraction > 1.0:
            self.segment_fraction = 1.0
        if self.component_index < 0:
            self.component_index = 0
            self.segment_index = 0
            self.segment_fraction = 0.0
        if self.segment_index < 0:
            self.segment_index = 0
            self.segment_fraction = 0.0
        if self.segment_fraction == 1.0:
            self.segment_fraction = 0.0
            self.segment_index += 1

    # -- ordering ---------------------------------------------------------
    def _key(self):
        return (self.component_index, self.segment_index, self.segment_fraction)

    def __eq__(self, other):
        return self._key() == other._key()

    def __lt__(self, other):
        return self._key() < other._key()

    def compare_location_values(self, ci: int, si: int, frac: float) -> int:
        k = self._key()
        o = (int(ci), int(si), float(frac))
        return int(bool(k > o)) - int(bool(k < o))

    # -- geometry queries -------------------------------------------------
    @staticmethod
    def get_end_location(g: Geom) -> "LinearLocation":
        comps = _components(g)
        loc = LinearLocation(normalize=False)
        loc.component_index = len(comps) - 1
        loc.segment_index = len(comps[-1]) - 1
        loc.segment_fraction = 0.0
        return loc

    @staticmethod
    def point_along_fraction(p0, p1, frac: float):
        if frac <= 0.0:
            return (float(p0[0]), float(p0[1]))
        if frac >= 1.0:
            return (float(p1[0]), float(p1[1]))
        return (
            float((p1[0] - p0[0]) * frac + p0[0]),
            float((p1[1] - p0[1]) * frac + p0[1]),
        )

    @property
    def is_vertex(self) -> bool:
        return self.segment_fraction <= 0.0 or self.segment_fraction >= 1.0

    def get_coordinate(self, g: Geom):
        comp = _components(g)[self.component_index]
        p0 = comp[self.segment_index]
        if self.segment_index >= len(comp) - 1:
            return (float(p0[0]), float(p0[1]))
        p1 = comp[self.segment_index + 1]
        return self.point_along_fraction(p0, p1, self.segment_fraction)

    def get_segment(self, g: Geom):
        comp = _components(g)[self.component_index]
        p0 = comp[self.segment_index]
        if self.segment_index >= len(comp) - 1:
            prev = comp[len(comp) - 2]
            return (tuple(prev), tuple(p0))
        return (tuple(p0), tuple(comp[self.segment_index + 1]))

    def to_lowest(self, g: Geom) -> "LinearLocation":
        comp = _components(g)[self.component_index]
        nseg = len(comp) - 1
        if self.segment_index < nseg:
            return self
        return LinearLocation(self.component_index, nseg - 1, 1.0, normalize=False)

    def clamp(self, g: Geom) -> None:
        comps = _components(g)
        if self.component_index >= len(comps):
            loc = self.get_end_location(g)
            self.component_index = loc.component_index
            self.segment_index = loc.segment_index
            self.segment_fraction = 0.0
            return
        if self.segment_index >= len(comps[self.component_index]):
            self.segment_index = len(comps[self.component_index]) - 1
            self.segment_fraction = 1.0

    def snap_to_vertex(self, g: Geom, min_distance: float) -> None:
        if self.segment_fraction <= 0.0 or self.segment_fraction >= 1.0:
            return
        (x0, y0), (x1, y1) = self.get_segment(g)
        seg_len = math.hypot(x1 - x0, y1 - y0)
        to_start = self.segment_fraction * seg_len
        to_end = seg_len - to_start
        if to_start <= to_end and to_start < min_distance:
            self.segment_fraction = 0.0
        elif to_end <= to_start and to_end < min_distance:
            self.segment_fraction = 1.0


def _segment_fraction(p0, p1, pt) -> float:
    dx = p1[0] - p0[0]
    dy = p1[1] - p0[1]
    dd = dx * dx + dy * dy
    if dd == 0:
        return 0.0
    f = ((pt[0] - p0[0]) * dx + (pt[1] - p0[1]) * dy) / dd
    return min(max(f, 0.0), 1.0)


def _segment_distance(p0, p1, pt) -> float:
    f = _segment_fraction(p0, p1, pt)
    x = p0[0] + f * (p1[0] - p0[0])
    y = p0[1] + f * (p1[1] - p0[1])
    return math.hypot(pt[0] - x, pt[1] - y)


class LocationIndexedLine:
    """reference: LinearReferencing/LocationIndexedLine.cs:10."""

    def __init__(self, linear: Geom):
        self.g = linear
        self.comps = _components(linear)

    # -- point indexing (reference: LocationIndexOfPoint.cs) --------------
    def index_of(self, pt) -> LinearLocation:
        return self._index_from_start(pt, None)

    def index_of_after(self, pt, min_index: LinearLocation | None) -> LinearLocation:
        if min_index is None:
            return self.index_of(pt)
        end_loc = LinearLocation.get_end_location(self.g)
        if not (min_index < end_loc):
            return end_loc
        return self._index_from_start(pt, min_index)

    def _index_from_start(self, pt, min_index) -> LinearLocation:
        best = None
        best_d = float("inf")
        for ci, comp in enumerate(self.comps):
            for si in range(len(comp) - 1):
                d = _segment_distance(comp[si], comp[si + 1], pt)
                if d < best_d:
                    frac = _segment_fraction(comp[si], comp[si + 1], pt)
                    if (
                        min_index is None
                        or min_index.compare_location_values(ci, si, frac) < 0
                    ):
                        best = (ci, si, frac)
                        best_d = d
        if best is None:
            return LinearLocation(
                min_index.component_index,
                min_index.segment_index,
                min_index.segment_fraction,
            )
        return LinearLocation(*best)

    # -- subline indexing (reference: LocationIndexOfLine.cs) -------------
    def indices_of(self, sub_line: Geom):
        sub_comps = _components(sub_line)
        start_pt = tuple(sub_comps[0][0])
        end_pt = tuple(sub_comps[-1][-1])
        loc0 = self.index_of(start_pt)
        loc1 = self.index_of_after(end_pt, loc0)
        return [loc0, loc1]

    # -- extraction -------------------------------------------------------
    def extract_point(self, loc: LinearLocation, offset_distance: float = 0.0):
        if offset_distance == 0.0:
            return loc.get_coordinate(self.g)
        low = loc.to_lowest(self.g)
        (x0, y0), (x1, y1) = low.get_segment(self.g)
        return _point_along_offset(
            (x0, y0), (x1, y1), low.segment_fraction, offset_distance
        )

    def extract_line(self, start: LinearLocation, end: LinearLocation) -> Geom:
        """reference: ExtractLineByLocation.cs."""
        if end < start:
            g2 = self._compute_linear(end, start)
            if g2.gtype == LINESTRING:
                return Geom(LINESTRING, g2.data[::-1].copy())
            return Geom(
                MULTILINESTRING, [arr[::-1].copy() for arr in reversed(g2.data)]
            )
        return self._compute_linear(start, end)

    def _compute_linear(self, start: LinearLocation, end: LinearLocation) -> Geom:
        lines: list[list] = []
        cur: list = []

        def end_line():
            nonlocal cur
            if not cur:
                return
            if len(cur) == 1:
                cur = [cur[0], cur[0]]  # FixInvalidLines: duplicate point
            lines.append(cur)
            cur = []

        if not start.is_vertex:
            cur.append(start.get_coordinate(self.g))
        for ci in range(start.component_index, len(self.comps)):
            comp = self.comps[ci]
            # iteration begins at the segment END when start is mid-segment
            # (reference: LinearIterator.SegmentEndVertexIndex)
            si0 = 0
            if ci == start.component_index:
                si0 = start.segment_index + (1 if start.segment_fraction > 0.0 else 0)
            stop = False
            for si in range(si0, len(comp)):
                if end.compare_location_values(ci, si, 0.0) < 0:
                    stop = True
                    break
                cur.append((float(comp[si][0]), float(comp[si][1])))
                if si == len(comp) - 1:
                    end_line()
            if stop:
                break
        if not end.is_vertex:
            cur.append(end.get_coordinate(self.g))
        end_line()
        if len(lines) == 1:
            return Geom(LINESTRING, np.array(lines[0], dtype=np.float64))
        return Geom(
            MULTILINESTRING, [np.array(ln, dtype=np.float64) for ln in lines]
        )

    def start_index(self) -> LinearLocation:
        return LinearLocation()

    def end_index(self) -> LinearLocation:
        return LinearLocation.get_end_location(self.g)

    def is_valid_index(self, loc: LinearLocation) -> bool:
        ci, si, frac = loc.component_index, loc.segment_index, loc.segment_fraction
        if ci < 0 or ci >= len(self.comps):
            return False
        comp = self.comps[ci]
        if si < 0 or si > len(comp):
            return False
        if si == len(comp) and frac != 0.0:
            return False
        return 0.0 <= frac <= 1.0

    def clamp_index(self, loc: LinearLocation) -> LinearLocation:
        out = LinearLocation(
            loc.component_index, loc.segment_index, loc.segment_fraction, False
        )
        out.clamp(self.g)
        return out


class MeasureIndexedLine:
    """M-ordinate (measure) linear referencing (reference:
    Geometries/CoordinateM.cs:9 carries the M ordinate;
    LinearReferencing/LengthLocationMap.cs:17 is the length↔location
    resolver whose interpolation rule this applies to the M column —
    locate-along / interpolate-measure semantics for route-milepost data).

    The line must carry per-vertex measures out of band
    (``Geom.extra = {"dims": "M"|"ZM", "ords": (N, e)}``; M is the last
    ords column).  Measures are required monotonic non-decreasing along
    the line, the standard route-measure contract; queries clamp to the
    measure range exactly like LengthLocationMap clamps lengths.
    """

    def __init__(self, line: Geom):
        if line.gtype != LINESTRING:
            raise ValueError("MeasureIndexedLine requires a LineString")
        if line.extra is None or "M" not in line.extra["dims"]:
            raise ValueError("MeasureIndexedLine requires M ordinates")
        self.coords = np.asarray(line.data, dtype=np.float64)
        ords = np.asarray(line.extra["ords"], dtype=np.float64)
        if ords.ndim == 1:
            ords = ords[:, None]
        self.m = ords[:, -1].copy()
        if np.any(np.diff(self.m) < 0):
            raise ValueError("measures must be monotonic non-decreasing")
        d = np.diff(self.coords, axis=0)
        self.cum = np.concatenate([[0.0], np.cumsum(np.sqrt((d * d).sum(axis=1)))])

    @property
    def start_m(self) -> float:
        return float(self.m[0])

    @property
    def end_m(self) -> float:
        return float(self.m[-1])

    # -- length -> measure (LengthLocationMap.GetLocation rule on M) ------
    def m_at_length(self, index: float) -> float:
        """Interpolated measure at a length index (clamped)."""
        index = min(max(index, 0.0), float(self.cum[-1]))
        i = int(np.searchsorted(self.cum, index, side="right") - 1)
        i = min(i, len(self.coords) - 2)
        seg = self.cum[i + 1] - self.cum[i]
        t = (index - self.cum[i]) / seg if seg > 0 else 0.0
        return float(self.m[i] + t * (self.m[i + 1] - self.m[i]))

    # -- measure -> length / point (locate-along) --------------------------
    def length_at_m(self, m: float) -> float:
        """FIRST length index whose measure equals ``m`` (clamped to the
        measure range; constant-measure runs resolve to their start, the
        same first-match rule as LengthLocationMap.GetLength)."""
        m = min(max(m, self.start_m), self.end_m)
        i = int(np.searchsorted(self.m, m, side="left"))
        if i < len(self.m) and self.m[i] == m:
            return float(self.cum[i])
        i = max(1, i)
        dm = self.m[i] - self.m[i - 1]
        t = (m - self.m[i - 1]) / dm if dm > 0 else 0.0
        return float(self.cum[i - 1] + t * (self.cum[i] - self.cum[i - 1]))

    def extract_point(self, m: float) -> Geom:
        """Point at measure ``m``, carrying the (clamped) measure as its
        own M ordinate."""
        m_c = min(max(m, self.start_m), self.end_m)
        ln = self.length_at_m(m_c)
        i = int(np.searchsorted(self.cum, ln, side="right") - 1)
        i = min(i, len(self.coords) - 2)
        seg = self.cum[i + 1] - self.cum[i]
        t = (ln - self.cum[i]) / seg if seg > 0 else 0.0
        p = self.coords[i] + t * (self.coords[i + 1] - self.coords[i])
        return Geom(
            "Point",
            np.array([float(p[0]), float(p[1])]),
            extra={"dims": "M", "ords": np.array([m_c])},
        )

    def extract_line(self, m0: float, m1: float) -> Geom:
        """Sub-line between measures (locate-between), per-vertex measures
        interpolated and carried through as M ordinates."""
        if m1 < m0:
            m0, m1 = m1, m0
        l0 = self.length_at_m(m0)
        l1 = self.length_at_m(m1)
        pts = [self.extract_point(m0)]
        mask = (self.cum > l0) & (self.cum < l1)
        mids = [
            Geom(
                "Point",
                self.coords[i].copy(),
                extra={"dims": "M", "ords": np.array([self.m[i]])},
            )
            for i in np.nonzero(mask)[0]
        ]
        pts.extend(mids)
        pts.append(self.extract_point(m1))
        arr = np.array([p.data for p in pts])
        ms = np.array([float(p.extra["ords"][0]) for p in pts])
        keep = np.ones(len(arr), dtype=bool)
        keep[1:] = (arr[1:] != arr[:-1]).any(axis=1)
        arr, ms = arr[keep], ms[keep]
        if len(arr) < 2:
            arr = np.vstack([arr, arr]) if len(arr) else np.zeros((0, 2))
            ms = np.concatenate([ms, ms]) if len(ms) else np.zeros(0)
        return Geom(
            LINESTRING, arr, extra={"dims": "M", "ords": ms[:, None].copy()}
        )

    def project(self, x: float, y: float) -> float:
        """Interpolated measure of the closest point on the line."""
        best_d = float("inf")
        best_m = self.start_m
        for i in range(len(self.coords) - 1):
            a = self.coords[i]
            b = self.coords[i + 1]
            dx, dy = b[0] - a[0], b[1] - a[1]
            ll = dx * dx + dy * dy
            t = ((x - a[0]) * dx + (y - a[1]) * dy) / ll if ll else 0.0
            t = min(max(t, 0.0), 1.0)
            cx, cy = a[0] + t * dx, a[1] + t * dy
            dist = math.hypot(x - cx, y - cy)
            if dist < best_d:
                best_d = dist
                best_m = float(self.m[i] + t * (self.m[i + 1] - self.m[i]))
        return best_m


def _point_along_offset(p0, p1, frac: float, offset: float):
    """Point at frac along (p0,p1), offset perpendicular (positive = left)
    (reference: Geometries/LineSegment.cs PointAlongOffset)."""
    x = p0[0] + frac * (p1[0] - p0[0])
    y = p0[1] + frac * (p1[1] - p0[1])
    dx = p1[0] - p0[0]
    dy = p1[1] - p0[1]
    ux = uy = 0.0
    if offset != 0.0:
        ln = math.hypot(dx, dy)
        if ln <= 0:
            raise ValueError("cannot compute offset from zero-length segment")
        ux = offset * dx / ln
        uy = offset * dy / ln
    return (x - uy, y + ux)
