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
