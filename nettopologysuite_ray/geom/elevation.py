"""Elevation model + Z population for overlay results (reference:
Operation/OverlayNG/ElevationModel.cs, consumed at OverlayNG.cs:437-459).

A coarse 3×3 grid of averaged input Z values over the combined extent;
result coordinates that coincide with an input vertex carry that
vertex's Z exactly, everything else is filled from the model
(`get_z` = cell average, falling back to the global average of cell
averages).  Documented deviation from the reference's full OverlayNGZ
path: new intersection points get the MODEL Z, not the average of the
two generating edges' interpolated Zs (that interpolation lives inside
the reference's noder; the model fill is the documented public fallback
for coordinates with unknown Z, which is what this engine's 2D kernel
produces)."""

from __future__ import annotations

import math

import numpy as np

from .distance3d import _flatten_z, _component_coords3
from .types import Geom
from .overlay import overlay as _overlay_2d


class ElevationModel:
    DEFAULT_CELL_NUM = 3

    def __init__(self, extent, num_x: int = DEFAULT_CELL_NUM, num_y: int = DEFAULT_CELL_NUM):
        self.minx, self.miny, self.maxx, self.maxy = extent
        self.cell_x = (self.maxx - self.minx) / num_x
        self.cell_y = (self.maxy - self.miny) / num_y
        if self.cell_x <= 0.0:
            num_x = 1
        if self.cell_y <= 0.0:
            num_y = 1
        self.num_x, self.num_y = num_x, num_y
        self._sum = np.zeros((num_y, num_x))
        self._cnt = np.zeros((num_y, num_x), dtype=np.int64)
        self.has_z = False
        self._avg = None  # lazily computed global average of cell averages

    @classmethod
    def create(cls, g1: Geom | None, g2: Geom | None) -> "ElevationModel":
        pts = []
        for g in (g1, g2):
            if g is None:
                continue
            for comp in _flatten_z(g):
                for arr in _component_coords3(comp):
                    pts.append(arr[:, :2])
        if not pts:
            raise ValueError("Arguments don't have an extent!")
        allpt = np.concatenate(pts)
        model = cls(
            (
                float(allpt[:, 0].min()),
                float(allpt[:, 1].min()),
                float(allpt[:, 0].max()),
                float(allpt[:, 1].max()),
            )
        )
        for g in (g1, g2):
            if g is not None:
                model.add(g)
        return model

    def _cell_index(self, x: float, y: float):
        ix = 0
        if self.num_x > 1:
            ix = min(max(int((x - self.minx) / self.cell_x), 0), self.num_x - 1)
        iy = 0
        if self.num_y > 1:
            iy = min(max(int((y - self.miny) / self.cell_y), 0), self.num_y - 1)
        return iy, ix

    def add(self, g: Geom) -> None:
        """Accumulate every Z-bearing vertex (components without Z
        contribute nothing, as the reference's HasZ short-circuit)."""
        for comp in _flatten_z(g):
            for arr in _component_coords3(comp):
                zs = arr[:, 2]
                ok = ~np.isnan(zs)
                if not ok.any():
                    continue
                self.has_z = True
                for x, y, z in arr[ok]:
                    iy, ix = self._cell_index(x, y)
                    self._sum[iy, ix] += z
                    self._cnt[iy, ix] += 1
        self._avg = None

    def _init(self) -> None:
        used = self._cnt > 0
        if used.any():
            cell_avgs = self._sum[used] / self._cnt[used]
            self._avg = float(cell_avgs.mean())
        else:
            self._avg = math.nan

    def get_z(self, x: float, y: float) -> float:
        if self._avg is None:
            self._init()
        iy, ix = self._cell_index(x, y)
        if self._cnt[iy, ix] > 0:
            return float(self._sum[iy, ix] / self._cnt[iy, ix])
        return self._avg

    def populate_z(self, g: Geom) -> Geom:
        """Return a copy of g whose missing Z ordinates are filled from
        the model (reference: ElevationModel.PopulateZ).  A model with no
        Z values returns g unchanged."""
        if not self.has_z:
            return g
        exact: dict = {}
        return _rebuild_with_z(g, exact, self)


def _z_for(arr2: np.ndarray, old_ords, exact: dict, model: ElevationModel) -> np.ndarray:
    a = np.asarray(arr2, dtype=np.float64).reshape(-1, 2)
    z = np.full(len(a), np.nan)
    if old_ords is not None:
        o = np.asarray(old_ords, dtype=np.float64).reshape(len(a), -1)
        z = o[:, 0].copy()
    for i in range(len(a)):
        if math.isnan(z[i]):
            key = (float(a[i, 0]), float(a[i, 1]))
            if key in exact:
                z[i] = exact[key]
            else:
                z[i] = model.get_z(key[0], key[1])
    return z.reshape(-1, 1)


def _rebuild_with_z(g: Geom, exact: dict, model: ElevationModel) -> Geom:
    from .types import (
        GEOMETRYCOLLECTION,
        LINESTRING,
        MULTILINESTRING,
        MULTIPOINT,
        MULTIPOLYGON,
        POINT,
        POLYGON,
    )

    t = g.gtype
    old = g.extra["ords"] if (g.extra and "Z" in g.extra.get("dims", "")) else None

    def wrap(ords):
        return {"dims": "Z", "ords": ords}

    if g.is_empty:
        return g
    if t == POINT:
        return Geom(t, g.data, tag=g.tag, extra=wrap(_z_for(g.data.reshape(1, 2), old, exact, model).ravel()))
    if t == LINESTRING:
        return Geom(t, g.data, tag=g.tag, extra=wrap(_z_for(g.data, old, exact, model)))
    if t == POLYGON:
        ords = [
            _z_for(r, old[i] if old is not None else None, exact, model)
            for i, r in enumerate(g.data)
        ]
        return Geom(t, g.data, tag=g.tag, extra=wrap(ords))
    if t == GEOMETRYCOLLECTION:
        return Geom(t, [_rebuild_with_z(sub, exact, model) for sub in g.data], tag=g.tag)
    if t == MULTIPOINT:
        ords = [
            _z_for(np.asarray(p).reshape(1, 2), old[i] if old is not None else None, exact, model).ravel()
            for i, p in enumerate(g.data)
        ]
        return Geom(t, g.data, tag=g.tag, extra=wrap(ords))
    if t == MULTILINESTRING:
        ords = [
            _z_for(ls, old[i] if old is not None else None, exact, model)
            for i, ls in enumerate(g.data)
        ]
        return Geom(t, g.data, tag=g.tag, extra=wrap(ords))
    if t == MULTIPOLYGON:
        ords = [
            [
                _z_for(r, old[i][j] if old is not None else None, exact, model)
                for j, r in enumerate(rings)
            ]
            for i, rings in enumerate(g.data)
        ]
        return Geom(t, g.data, tag=g.tag, extra=wrap(ords))
    return g


def _exact_vertex_z(g: Geom, exact: dict, counts: dict) -> None:
    for comp in _flatten_z(g):
        for arr in _component_coords3(comp):
            zs = arr[:, 2]
            ok = ~np.isnan(zs)
            for x, y, z in arr[ok]:
                key = (float(x), float(y))
                # average duplicates (same location contributed twice)
                n = counts.get(key, 0)
                exact[key] = (exact.get(key, 0.0) * n + float(z)) / (n + 1)
                counts[key] = n + 1


def overlay_z(a: Geom, b: Geom, op: str, **kw) -> Geom:
    """2D overlay with Z population (reference: OverlayNG.cs:437-459):
    result vertices that coincide with an input vertex carry that
    vertex's Z (duplicates averaged); all other vertices are filled from
    the ElevationModel of the inputs.  Inputs without any Z produce the
    plain 2D result."""
    res = _overlay_2d(a, b, op, **kw)
    model = ElevationModel.create(a, b)
    if not model.has_z:
        return res
    exact: dict = {}
    counts: dict = {}
    _exact_vertex_z(a, exact, counts)
    _exact_vertex_z(b, exact, counts)
    return _rebuild_with_z(res, exact, model)
