"""Geometric shape factories (reference: Utilities/GeometricShapeFactory.cs:30,
Geometries/Utilities/SineStarFactory.cs:24) — fixture/test-data generators
for circles, ellipses, rectangles, arcs and sine stars."""

from __future__ import annotations

import math

import numpy as np

from .types import LINESTRING, POLYGON, Geom


class GeometricShapeFactory:
    """reference: Utilities/GeometricShapeFactory.cs:30.

    Set the extent with set_base (lower-left) or set_centre plus set_size
    (or width/height), and the vertex budget with num_points."""

    def __init__(self):
        self._base = None
        self._centre = None
        self._width = 1.0
        self._height = 1.0
        self.num_points = 100

    def set_base(self, x: float, y: float) -> None:
        self._base = (float(x), float(y))
        self._centre = None

    def set_centre(self, x: float, y: float) -> None:
        self._centre = (float(x), float(y))
        self._base = None

    def set_size(self, size: float) -> None:
        self._width = self._height = float(size)

    def set_width(self, w: float) -> None:
        self._width = float(w)

    def set_height(self, h: float) -> None:
        self._height = float(h)

    def _envelope(self):
        if self._base is not None:
            x0, y0 = self._base
            return x0, y0, x0 + self._width, y0 + self._height
        cx, cy = self._centre if self._centre is not None else (0.0, 0.0)
        return (
            cx - self._width / 2,
            cy - self._height / 2,
            cx + self._width / 2,
            cy + self._height / 2,
        )

    def create_rectangle(self) -> Geom:
        x0, y0, x1, y1 = self._envelope()
        nside = max(self.num_points // 4, 1)
        xs = (x1 - x0) / nside
        ys = (y1 - y0) / nside
        pts = []
        for i in range(nside):
            pts.append((x0 + i * xs, y0))
        for i in range(nside):
            pts.append((x1, y0 + i * ys))
        for i in range(nside):
            pts.append((x1 - i * xs, y1))
        for i in range(nside):
            pts.append((x0, y1 - i * ys))
        pts.append(pts[0])
        return Geom(POLYGON, [np.array(pts, dtype=np.float64)])

    def create_circle(self) -> Geom:
        return self.create_ellipse()

    def create_ellipse(self) -> Geom:
        x0, y0, x1, y1 = self._envelope()
        rx = (x1 - x0) / 2
        ry = (y1 - y0) / 2
        cx = x0 + rx
        cy = y0 + ry
        n = self.num_points
        ang = np.arange(n) * (2 * math.pi / n)
        pts = np.empty((n + 1, 2))
        pts[:n, 0] = rx * np.cos(ang) + cx
        pts[:n, 1] = ry * np.sin(ang) + cy
        pts[n] = pts[0]
        return Geom(POLYGON, [pts])

    def create_arc(self, start_ang: float, ang_extent: float) -> Geom:
        """Circular arc LineString (reference: CreateArc)."""
        x0, y0, x1, y1 = self._envelope()
        rx = (x1 - x0) / 2
        ry = (y1 - y0) / 2
        cx = x0 + rx
        cy = y0 + ry
        ext = min(abs(ang_extent), 2 * math.pi)
        n = self.num_points
        inc = ext / (n - 1)
        ang = start_ang + np.arange(n) * inc
        pts = np.stack([rx * np.cos(ang) + cx, ry * np.sin(ang) + cy], axis=1)
        return Geom(LINESTRING, pts)

    def create_arc_polygon(self, start_ang: float, ang_extent: float) -> Geom:
        """Pie slice: centre + arc (reference: CreateArcPolygon)."""
        x0, y0, x1, y1 = self._envelope()
        rx = (x1 - x0) / 2
        ry = (y1 - y0) / 2
        cx = x0 + rx
        cy = y0 + ry
        ext = min(abs(ang_extent), 2 * math.pi)
        n = self.num_points
        inc = ext / (n - 1)
        ang = start_ang + np.arange(n) * inc
        ring = np.empty((n + 2, 2))
        ring[0] = (cx, cy)
        ring[1 : n + 1, 0] = rx * np.cos(ang) + cx
        ring[1 : n + 1, 1] = ry * np.sin(ang) + cy
        ring[n + 1] = (cx, cy)
        return Geom(POLYGON, [ring])


def sine_star(
    centre=(0.0, 0.0),
    size: float = 1.0,
    num_points: int = 100,
    num_arms: int = 8,
    arm_length_ratio: float = 0.5,
) -> Geom:
    """reference: Geometries/Utilities/SineStarFactory.cs:24 CreateSineStar
    — the reference's standard overlay/buffer stress shape."""
    radius = size / 2.0
    arm_ratio = min(max(arm_length_ratio, 0.0), 1.0)
    arm_max = arm_ratio * radius
    inside = (1 - arm_ratio) * radius
    cx, cy = centre
    n = num_points
    i = np.arange(n)
    arc_frac = (i / n) * num_arms
    arm_ang = 2 * math.pi * (arc_frac - np.floor(arc_frac))
    curve_r = inside + arm_max * (np.cos(arm_ang) + 1.0) / 2.0
    ang = i * (2 * math.pi / n)
    pts = np.empty((n + 1, 2))
    pts[:n, 0] = curve_r * np.cos(ang) + cx
    pts[:n, 1] = curve_r * np.sin(ang) + cy
    pts[n] = pts[0]
    return Geom(POLYGON, [pts])


# ---------------------------------------------------------------------------
# Fractal + curve builders (reference: Shape/Fractal/KochSnowflakeBuilder.cs:8,
# SierpinskiCarpetBuilder.cs:7, HilbertCurveBuilder.cs, MortonCurveBuilder.cs,
# Shape/CubicBezierCurve.cs) and random point builders
# (Shape/Random/RandomPointsBuilder.cs:14, RandomPointsInGridBuilder.cs).


def _recursion_level_for_size(num_pts: int) -> int:
    # reference: KochSnowflakeBuilder.RecursionLevelForSize — numPts ~ 3*4^level
    return int(math.log(max(num_pts / 3.0, 1.0)) / math.log(4.0))


_KOCH_H = math.sin(math.pi / 3.0)


def koch_snowflake(origin=(0.0, 0.0), width: float = 1.0, num_points: int = 100) -> Geom:
    """Koch snowflake polygon (reference: KochSnowflakeBuilder.cs:8):
    recursion level = floor(log4(numPts/3)); level>0 shifts the base up by
    one arm height so the shape stays inside the square extent."""
    level = _recursion_level_for_size(num_points)
    ox, oy = float(origin[0]), float(origin[1])
    y = oy + (_KOCH_H / 3.0) * width if level > 0 else oy
    p0 = (ox, y)
    p1 = (ox + width / 2.0, y + width * _KOCH_H)
    p2 = (ox + width, y)
    pts: list = []

    def add_side(lv, a, b):
        if lv == 0:
            pts.append(b)
            return
        vx, vy = b[0] - a[0], b[1] - a[1]
        mid = (a[0] + 0.5 * vx, a[1] + 0.5 * vy)
        # height vector rotated a quarter circle CCW
        hx, hy = vx * (_KOCH_H / 3.0), vy * (_KOCH_H / 3.0)
        off = (mid[0] - hy, mid[1] + hx)
        third = (a[0] + vx / 3.0, a[1] + vy / 3.0)
        two_third = (a[0] + 2.0 * vx / 3.0, a[1] + 2.0 * vy / 3.0)
        add_side(lv - 1, a, third)
        add_side(lv - 1, third, off)
        add_side(lv - 1, off, two_third)
        add_side(lv - 1, two_third, b)

    add_side(level, p0, p1)
    add_side(level, p1, p2)
    add_side(level, p2, p0)
    ring = np.array([p0] + pts[:-1] + [p0]) if pts and pts[-1] == p0 else np.array([p0] + pts + [p0])
    return Geom(POLYGON, [ring])


def sierpinski_carpet(origin=(0.0, 0.0), width: float = 1.0, num_points: int = 100) -> Geom:
    """Sierpinski carpet polygon with square holes (reference:
    SierpinskiCarpetBuilder.cs:7)."""
    level = _recursion_level_for_size(num_points)
    ox, oy = float(origin[0]), float(origin[1])
    holes: list = []

    def add_holes(n, x, y, w):
        if n < 0:
            return
        t = w / 3.0
        for dx in (0.0, t, 2 * t):
            for dy in (0.0, t, 2 * t):
                if dx == t and dy == t:
                    continue
                add_holes(n - 1, x + dx, y + dy, t)
        holes.append(
            np.array(
                [
                    [x + t, y + t],
                    [x + 2 * t, y + t],
                    [x + 2 * t, y + 2 * t],
                    [x + t, y + 2 * t],
                    [x + t, y + t],
                ]
            )
        )

    add_holes(level, ox, oy, width)
    shell = np.array([[ox, oy], [ox + width, oy], [ox + width, oy + width], [ox, oy + width], [ox, oy]])
    return Geom(POLYGON, [shell] + holes)


def hilbert_curve(origin=(0.0, 0.0), width: float = 1.0, level: int = 3) -> Geom:
    """Space-filling Hilbert curve linestring over a 2^level grid
    (reference: HilbertCurveBuilder.cs — which, note, decodes with
    MortonCode upstream; here Hilbert ordering uses the engine's own
    hilbert_decode, the semantically intended curve)."""
    from .hilbert import hilbert_decode

    n = 1 << level
    d = np.arange(n * n, dtype=np.uint64)
    ix, iy = hilbert_decode(d, level)
    scale = width / max(n - 1, 1)
    pts = np.stack(
        [origin[0] + ix.astype(np.float64) * scale, origin[1] + iy.astype(np.float64) * scale],
        axis=1,
    )
    return Geom(LINESTRING, pts)


def morton_curve(origin=(0.0, 0.0), width: float = 1.0, level: int = 3) -> Geom:
    """Morton (Z-order) curve linestring (reference: MortonCurveBuilder.cs)."""
    n = 1 << level
    d = np.arange(n * n, dtype=np.uint64)
    # inverse of the bit-spread encode: compact alternating bits
    ix = np.zeros(n * n, dtype=np.uint64)
    iy = np.zeros(n * n, dtype=np.uint64)
    for b in range(level):
        ix |= ((d >> np.uint64(2 * b)) & np.uint64(1)) << np.uint64(b)
        iy |= ((d >> np.uint64(2 * b + 1)) & np.uint64(1)) << np.uint64(b)
    scale = width / max(n - 1, 1)
    pts = np.stack(
        [origin[0] + ix.astype(np.float64) * scale, origin[1] + iy.astype(np.float64) * scale],
        axis=1,
    )
    return Geom(LINESTRING, pts)


def cubic_bezier_curve(line: Geom, alpha: float = 1.0, n_seg: int = 16) -> Geom:
    """Smooth a linestring with per-segment cubic Bezier spans whose
    control points derive from neighbour tangents scaled by alpha
    (reference: Shape/CubicBezierCurve.cs semantics: alpha=1 circle-like
    curvature, larger alpha = tighter)."""
    arr = line.data
    n = len(arr)
    if n < 3:
        return line
    closed = bool((arr[0] == arr[-1]).all())
    # tangent at each interior vertex = direction between its neighbours
    ctrl_len = alpha / 3.0
    out = [arr[0]]
    tangents = np.zeros((n, 2))
    for i in range(n):
        if 0 < i < n - 1:
            t = arr[i + 1] - arr[i - 1]
        elif closed:
            t = arr[1 % n] - arr[n - 2]
        elif i == 0:
            t = arr[1] - arr[0]
        else:
            t = arr[-1] - arr[-2]
        norm = math.hypot(t[0], t[1])
        tangents[i] = t / norm if norm else t
    ts = np.linspace(0.0, 1.0, n_seg + 1)[1:]
    for i in range(n - 1):
        p0, p3 = arr[i], arr[i + 1]
        seg_len = math.hypot(*(p3 - p0))
        c1 = p0 + tangents[i] * ctrl_len * seg_len
        c2 = p3 - tangents[i + 1] * ctrl_len * seg_len
        for t in ts:
            u = 1.0 - t
            pt = (
                u**3 * p0 + 3 * u * u * t * c1 + 3 * u * t * t * c2 + t**3 * p3
            )
            out.append(pt)
    return Geom(LINESTRING, np.array(out))


def random_points(mask: Geom, n: int, seed: int = 0) -> Geom:
    """n uniform random points inside a polygonal mask (reference:
    Shape/Random/RandomPointsBuilder.cs:14 — rejection sampling from the
    envelope through a point-in-area locator; deterministic seed)."""
    from . import algorithms as alg
    from .types import MULTIPOINT

    minx, miny, maxx, maxy = alg.envelope(mask)
    ring_sets = [c.data for c in mask.flatten() if c.gtype == POLYGON]
    rng = np.random.default_rng(seed)
    exterior = alg.EXTERIOR if hasattr(alg, "EXTERIOR") else 2
    pts = []
    while len(pts) < n:
        m = max(n - len(pts), 16)
        xs = rng.uniform(minx, maxx, m)
        ys = rng.uniform(miny, maxy, m)
        for x, y in zip(xs, ys):
            if len(pts) >= n:
                break
            loc = min(
                alg.locate_point_in_rings(float(x), float(y), rs) for rs in ring_sets
            )
            if loc != exterior:
                pts.append((float(x), float(y)))
    return Geom(MULTIPOINT, [np.array(p) for p in pts])


def random_points_in_grid(
    extent, n_cells_side: int, seed: int = 0, gutter_fraction: float = 0.0
) -> Geom:
    """One random point per grid cell, optionally inset by a gutter
    (reference: Shape/Random/RandomPointsInGridBuilder.cs)."""
    from .types import MULTIPOINT

    minx, miny, maxx, maxy = (float(v) for v in extent)
    cw = (maxx - minx) / n_cells_side
    ch = (maxy - miny) / n_cells_side
    g = max(min(gutter_fraction, 1.0), 0.0) / 2.0
    rng = np.random.default_rng(seed)
    pts = []
    for j in range(n_cells_side):
        for i in range(n_cells_side):
            x0 = minx + i * cw + g * cw
            y0 = miny + j * ch + g * ch
            w = cw * (1 - 2 * g)
            h = ch * (1 - 2 * g)
            pts.append(np.array([x0 + rng.uniform(0, w), y0 + rng.uniform(0, h)]))
    return Geom(MULTIPOINT, pts)
