"""Space-filling-curve cell keys: Hilbert and Morton codes.

These are the engine's partitioning keys (SURVEY.md §2.8): every geometry
gets an int64 cell id at a chosen level; the cell id is the groupby/sort
key for tile assignment, locality sort, large-large joins and salting.

Semantics match the reference encoders
(reference: src/NetTopologySuite/Shape/Fractal/HilbertCode.cs:42,111 —
level<=16, 4^level cells; MortonCode.cs:44) but are implemented as
vectorized numpy bit-twiddling over whole columns, not per-point calls.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 16

# World extent used for lon/lat cell assignment.
WORLD = (-180.0, -90.0, 180.0, 90.0)


def _spread_bits16(v: np.ndarray) -> np.ndarray:
    """Interleave zeros between bits of 16-bit ints (-> 32-bit)."""
    v = v.astype(np.uint64) & np.uint64(0xFFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
    return v


def morton_encode(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """Morton (Z-order) code of integer cell coords (vectorized).
    Matches Shape/Fractal/MortonCode.cs:44 `Encode` bit order (x in the
    even bits, y in the odd bits)."""
    return (_spread_bits16(np.asarray(ix)) | (_spread_bits16(np.asarray(iy)) << np.uint64(1))).astype(
        np.int64
    )


def _unspread_bits16(v: np.ndarray) -> np.ndarray:
    """Inverse of _spread_bits16: gather the even bits back to 16 bits."""
    v = v.astype(np.uint64) & np.uint64(0x55555555)
    v = (v | (v >> np.uint64(1))) & np.uint64(0x33333333)
    v = (v | (v >> np.uint64(2))) & np.uint64(0x0F0F0F0F)
    v = (v | (v >> np.uint64(4))) & np.uint64(0x00FF00FF)
    v = (v | (v >> np.uint64(8))) & np.uint64(0x0000FFFF)
    return v


def morton_decode(d) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of morton_encode (code→xy), vectorized.
    Matches Shape/Fractal/MortonCode.cs:73 `Decode` bit order."""
    d = np.asarray(d, dtype=np.uint64)
    ix = _unspread_bits16(d)
    iy = _unspread_bits16(d >> np.uint64(1))
    return ix.astype(np.int64), iy.astype(np.int64)


def hilbert_encode(ix, iy, level: int) -> np.ndarray:
    """Hilbert curve index of integer cell coords at `level` (vectorized).

    Standard Hilbert xy→d transform (public algorithm; same curve family as
    Shape/Fractal/HilbertCode.cs:111 `Encode`).
    """
    x = np.asarray(ix, dtype=np.uint64).copy()
    y = np.asarray(iy, dtype=np.uint64).copy()
    rx = np.zeros_like(x)
    ry = np.zeros_like(y)
    d = np.zeros_like(x)
    s = np.uint64(1) << np.uint64(level - 1)
    one = np.uint64(1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.uint64)
        ry = ((y & s) > 0).astype(np.uint64)
        d += s * s * ((np.uint64(3) * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        sm1 = s - one
        x_f = x.copy()
        x[flip] = sm1 - x_f[flip]
        y_f = y.copy()
        y[flip] = sm1 - y_f[flip]
        xs = x.copy()
        x[swap] = y[swap]
        y[swap] = xs[swap]
        s >>= one
    return d.astype(np.int64)


def cell_coords(
    lon: np.ndarray, lat: np.ndarray, level: int, extent=WORLD
) -> tuple[np.ndarray, np.ndarray]:
    """Quantize lon/lat to integer cell coords at `level` (2^level per axis).
    Half-open cells [x0, x1); the max edge folds into the last cell."""
    n = np.int64(1) << np.int64(level)
    minx, miny, maxx, maxy = extent
    fx = (np.asarray(lon, dtype=np.float64) - minx) / (maxx - minx)
    fy = (np.asarray(lat, dtype=np.float64) - miny) / (maxy - miny)
    ix = np.clip((fx * n).astype(np.int64), 0, n - 1)
    iy = np.clip((fy * n).astype(np.int64), 0, n - 1)
    return ix, iy


def hilbert_cell(lon, lat, level: int, extent=WORLD) -> np.ndarray:
    ix, iy = cell_coords(lon, lat, level, extent)
    return hilbert_encode(ix, iy, level)


def morton_cell(lon, lat, level: int, extent=WORLD) -> np.ndarray:
    ix, iy = cell_coords(lon, lat, level, extent)
    return morton_encode(ix, iy)


def hilbert_decode(d, level: int) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of hilbert_encode (d→xy), vectorized."""
    d = np.asarray(d, dtype=np.uint64).copy()
    t = d.copy()
    x = np.zeros_like(d)
    y = np.zeros_like(d)
    one = np.uint64(1)
    s = np.uint64(1)
    top = np.uint64(1) << np.uint64(level)
    while s < top:
        rx = one & (t // np.uint64(2))
        ry = one & (t ^ rx)
        # rotate
        swap = ry == 0
        flip = swap & (rx == 1)
        sm1 = s - one
        xf = x.copy()
        x[flip] = sm1 - xf[flip]
        yf = y.copy()
        y[flip] = sm1 - yf[flip]
        xs = x.copy()
        x[swap] = y[swap]
        y[swap] = xs[swap]
        x += s * rx
        y += s * ry
        t //= np.uint64(4)
        s <<= one
    return x.astype(np.int64), y.astype(np.int64)


def cover_envelope(minx, miny, maxx, maxy, level: int, extent=WORLD):
    """All (ix, iy) cells intersecting an envelope — the multiplexing set for
    geometries spanning cells (SURVEY.md §2.4 large-large join)."""
    n = np.int64(1) << np.int64(level)
    ex0, ey0, ex1, ey1 = extent
    sx = (ex1 - ex0) / float(n)
    sy = (ey1 - ey0) / float(n)
    ix0 = int(np.clip(np.floor((minx - ex0) / sx), 0, n - 1))
    ix1 = int(np.clip(np.floor((maxx - ex0) / sx), 0, n - 1))
    iy0 = int(np.clip(np.floor((miny - ey0) / sy), 0, n - 1))
    iy1 = int(np.clip(np.floor((maxy - ey0) / sy), 0, n - 1))
    ixs = np.arange(ix0, ix1 + 1, dtype=np.int64)
    iys = np.arange(iy0, iy1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(ixs, iys)
    return gx.ravel(), gy.ravel()
