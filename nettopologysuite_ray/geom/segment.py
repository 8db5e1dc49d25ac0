"""LineSegment toolbox + coordinate-array utilities (reference:
Geometries/LineSegment.cs, Geometries/CoordinateArrays.cs).

Points are (x, y) tuples; arrays are (N, 2) float64 numpy arrays —
the scalar/array building blocks pipelines use inside UDF stages."""

from __future__ import annotations

import math

import numpy as np

from . import algorithms as alg
from .mathutil import line_intersection


class LineSegment:
    __slots__ = ("p0", "p1")

    def __init__(self, p0, p1=None, x1=None, y1=None):
        if p1 is None or x1 is not None:
            # LineSegment(x0, y0, x1, y1)
            self.p0 = (float(p0), float(p1))
            self.p1 = (float(x1), float(y1))
        else:
            self.p0 = (float(p0[0]), float(p0[1]))
            self.p1 = (float(p1[0]), float(p1[1]))

    # -- basic properties ---------------------------------------------------
    @property
    def length(self) -> float:
        return math.hypot(self.p1[0] - self.p0[0], self.p1[1] - self.p0[1])

    @property
    def is_horizontal(self) -> bool:
        return self.p0[1] == self.p1[1]

    @property
    def is_vertical(self) -> bool:
        return self.p0[0] == self.p1[0]

    @property
    def angle(self) -> float:
        return math.atan2(self.p1[1] - self.p0[1], self.p1[0] - self.p0[0])

    @property
    def mid_point(self):
        return ((self.p0[0] + self.p1[0]) / 2.0, (self.p0[1] + self.p1[1]) / 2.0)

    def reversed(self) -> "LineSegment":
        return LineSegment(self.p1, self.p0)

    def normalized(self) -> "LineSegment":
        """Direction-normalized copy: p0 <= p1 (reference Normalize)."""
        return self.reversed() if self.p1 < self.p0 else LineSegment(self.p0, self.p1)

    def orientation_index(self, p) -> int:
        """Orientation of p relative to the directed segment."""
        return alg.orient2d(
            self.p0[0], self.p0[1], self.p1[0], self.p1[1], p[0], p[1]
        )

    # -- distances ------------------------------------------------------------
    def distance(self, other) -> float:
        """Distance to a point or another LineSegment."""
        if isinstance(other, LineSegment):
            if (
                alg.segment_intersection(self.p0, self.p1, other.p0, other.p1)[0]
                != "none"
            ):
                return 0.0
            return min(
                other.distance(self.p0),
                other.distance(self.p1),
                self.distance(other.p0),
                self.distance(other.p1),
            )
        return math.dist(other, self.closest_point(other))

    def distance_perpendicular(self, p) -> float:
        """Distance from p to the INFINITE line (reference
        DistancePerpendicular; degenerate segment → point distance)."""
        if self.p0 == self.p1:
            return math.dist(self.p0, p)
        dx = self.p1[0] - self.p0[0]
        dy = self.p1[1] - self.p0[1]
        s = ((self.p0[1] - p[1]) * dx - (self.p0[0] - p[0]) * dy) / (
            dx * dx + dy * dy
        )
        return abs(s) * math.sqrt(dx * dx + dy * dy)

    def distance_perpendicular_oriented(self, p) -> float:
        """Signed perpendicular distance: negative when p lies right of
        the segment direction (reference DistancePerpendicularOriented)."""
        if self.p0 == self.p1:
            return math.dist(self.p0, p)
        dist = self.distance_perpendicular(p)
        return -dist if self.orientation_index(p) < 0 else dist

    # -- projection -----------------------------------------------------------
    def projection_factor(self, p) -> float:
        if p == self.p0:
            return 0.0
        if p == self.p1:
            return 1.0
        dx = self.p1[0] - self.p0[0]
        dy = self.p1[1] - self.p0[1]
        ln = dx * dx + dy * dy
        if ln <= 0.0:
            return math.nan
        return ((p[0] - self.p0[0]) * dx + (p[1] - self.p0[1]) * dy) / ln

    def segment_fraction(self, p) -> float:
        return min(1.0, max(0.0, self.projection_factor(p)))

    def point_along(self, frac: float):
        return (
            self.p0[0] + frac * (self.p1[0] - self.p0[0]),
            self.p0[1] + frac * (self.p1[1] - self.p0[1]),
        )

    def point_along_offset(self, frac: float, offset: float):
        """Point at fractional position, offset perpendicular-left
        (reference PointAlongOffset)."""
        segx = self.p0[0] + frac * (self.p1[0] - self.p0[0])
        segy = self.p0[1] + frac * (self.p1[1] - self.p0[1])
        dx = self.p1[0] - self.p0[0]
        dy = self.p1[1] - self.p0[1]
        ln = math.sqrt(dx * dx + dy * dy)
        ux = uy = 0.0
        if offset != 0.0:
            if ln <= 0.0:
                raise ValueError("Cannot compute offset from zero-length line segment")
            ux = offset * dx / ln
            uy = offset * dy / ln
        return (segx - uy, segy + ux)

    def offset(self, offset_distance: float) -> "LineSegment":
        return LineSegment(
            self.point_along_offset(0.0, offset_distance),
            self.point_along_offset(1.0, offset_distance),
        )

    def project_point(self, p):
        if p == self.p0 or p == self.p1:
            return p
        return self.point_along(self.projection_factor(p))

    def project_segment(self, seg: "LineSegment") -> "LineSegment | None":
        """Projection of another segment onto this one; None when it
        projects entirely outside (reference Project(LineSegment))."""
        pf0 = self.projection_factor(seg.p0)
        pf1 = self.projection_factor(seg.p1)
        if pf0 >= 1.0 and pf1 >= 1.0:
            return None
        if pf0 <= 0.0 and pf1 <= 0.0:
            return None
        q0 = self.point_along(pf0)
        if pf0 < 0.0:
            q0 = self.p0
        elif pf0 > 1.0:
            q0 = self.p1
        q1 = self.point_along(pf1)
        if pf1 < 0.0:
            q1 = self.p0
        elif pf1 > 1.0:
            q1 = self.p1
        return LineSegment(q0, q1)

    def closest_point(self, p):
        factor = self.projection_factor(p)
        if 0 < factor < 1:
            return self.point_along(factor)
        return self.p0 if math.dist(self.p0, p) < math.dist(self.p1, p) else self.p1

    def closest_points(self, other: "LineSegment"):
        """Closest pair of points between two segments (reference
        ClosestPoints: intersection short-circuit, else endpoint
        projections)."""
        kind, pts = alg.segment_intersection(self.p0, self.p1, other.p0, other.p1)
        if kind != "none":
            pt = (float(pts[0][0]), float(pts[0][1]))
            return (pt, pt)
        best = None
        for p, on in (
            (other.p0, self), (other.p1, self), (self.p0, other), (self.p1, other)
        ):
            q = on.closest_point(p)
            d = math.dist(p, q)
            if best is None or d < best[0]:
                best = (d, (q, p) if on is self else (p, q))
        return best[1]

    def intersection(self, other: "LineSegment"):
        """A segment intersection point, or None (reference Intersection)."""
        kind, pts = alg.segment_intersection(self.p0, self.p1, other.p0, other.p1)
        if kind == "none":
            return None
        return (float(pts[0][0]), float(pts[0][1]))

    def line_intersection(self, other: "LineSegment"):
        """Infinite-line intersection, or None for parallel lines
        (reference LineIntersection via HCoordinate)."""
        try:
            return line_intersection(self.p0, self.p1, other.p0, other.p1)
        except ValueError:
            return None

    def reflect(self, p):
        """Reflection of p across the segment's line (reference Reflect)."""
        A = self.p1[1] - self.p0[1]
        B = self.p0[0] - self.p1[0]
        C = self.p0[1] * (self.p1[0] - self.p0[0]) - self.p0[0] * (
            self.p1[1] - self.p0[1]
        )
        a2b2 = A * A + B * B
        a2sb2 = A * A - B * B
        x, y = p[0], p[1]
        return (
            (-a2sb2 * x - 2 * A * B * y - 2 * A * C) / a2b2,
            (a2sb2 * y - 2 * A * B * x - 2 * B * C) / a2b2,
        )

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, LineSegment)
            and self.p0 == other.p0
            and self.p1 == other.p1
        )

    def __hash__(self) -> int:
        return hash((self.p0, self.p1))

    def __lt__(self, other: "LineSegment") -> bool:
        return (self.p0, self.p1) < (other.p0, other.p1)

    def __repr__(self) -> str:
        return (
            f"LINESTRING({self.p0[0]} {self.p0[1]}, {self.p1[0]} {self.p1[1]})"
        )


# ---------------------------------------------------------------------------
# CoordinateArrays utilities (reference: Geometries/CoordinateArrays.cs)

def is_ring(arr: np.ndarray) -> bool:
    """Empty, or ≥4 points with first == last."""
    a = np.asarray(arr, dtype=np.float64).reshape(-1, 2)
    if len(a) == 0:
        return True
    return len(a) >= 4 and bool((a[0] == a[-1]).all())


def has_repeated_points(arr: np.ndarray) -> bool:
    a = np.asarray(arr, dtype=np.float64).reshape(-1, 2)
    return bool((a[1:] == a[:-1]).all(axis=1).any()) if len(a) > 1 else False


def remove_repeated_points(arr: np.ndarray) -> np.ndarray:
    a = np.asarray(arr, dtype=np.float64).reshape(-1, 2)
    if len(a) <= 1:
        return a.copy()
    keep = np.concatenate([[True], ~(a[1:] == a[:-1]).all(axis=1)])
    return a[keep].copy()


def reverse(arr: np.ndarray) -> np.ndarray:
    return np.asarray(arr, dtype=np.float64).reshape(-1, 2)[::-1].copy()


def min_coordinate(arr: np.ndarray):
    a = np.asarray(arr, dtype=np.float64).reshape(-1, 2)
    i = int(np.lexsort((a[:, 1], a[:, 0]))[0])
    return (float(a[i, 0]), float(a[i, 1]))


def scroll(arr: np.ndarray, first, ensure_ring: bool | None = None) -> np.ndarray:
    """Rotate so the ring/line starts at `first` (a point or an index);
    rings keep closure (reference Scroll)."""
    a = np.asarray(arr, dtype=np.float64).reshape(-1, 2)
    if isinstance(first, (int, np.integer)):
        idx = int(first)
    else:
        match = np.nonzero((a[:, 0] == first[0]) & (a[:, 1] == first[1]))[0]
        if len(match) == 0:
            return a.copy()
        idx = int(match[0])
    ring = is_ring(a) if ensure_ring is None else ensure_ring
    body = a[:-1] if ring else a
    out = np.concatenate([body[idx:], body[:idx]])
    if ring:
        out = np.concatenate([out, out[:1]])
    return out.copy()


def increasing_direction(arr: np.ndarray) -> int:
    """+1 if the array is lexicographically increasing front-to-back,
    -1 otherwise (reference IncreasingDirection: first unequal
    symmetric pair decides; palindromes +1)."""
    a = np.asarray(arr, dtype=np.float64).reshape(-1, 2)
    n = len(a)
    for i in range(n // 2):
        j = n - 1 - i
        c = _cmp_pt(a[i], a[j])
        if c != 0:
            return 1 if c < 0 else -1
    return 1


def _cmp_pt(p, q) -> int:
    if p[0] < q[0]:
        return -1
    if p[0] > q[0]:
        return 1
    if p[1] < q[1]:
        return -1
    if p[1] > q[1]:
        return 1
    return 0


def compare(a1: np.ndarray, a2: np.ndarray) -> int:
    """Lexicographic comparison of coordinate arrays (reference Compare)."""
    a = np.asarray(a1, dtype=np.float64).reshape(-1, 2)
    b = np.asarray(a2, dtype=np.float64).reshape(-1, 2)
    for i in range(min(len(a), len(b))):
        c = _cmp_pt(a[i], b[i])
        if c != 0:
            return c
    if len(a) < len(b):
        return -1
    if len(a) > len(b):
        return 1
    return 0


def point_not_in_list(test_pts: np.ndarray, pts: np.ndarray):
    """First point of test_pts not present in pts, or None (reference
    PointNotInList)."""
    t = np.asarray(test_pts, dtype=np.float64).reshape(-1, 2)
    p = np.asarray(pts, dtype=np.float64).reshape(-1, 2)
    have = {(float(x), float(y)) for x, y in p}
    for x, y in t:
        if (float(x), float(y)) not in have:
            return (float(x), float(y))
    return None
