"""Geometry / envelope combining aggregates (SURVEY.md §2.7/§2.8).

Reference parity:
- EnvelopeCombiner (Geometries/Utilities/EnvelopeCombiner.cs:12 —
  ``Combine(params Geometry[])`` returns the envelope union of the
  inputs) re-expressed as a MERGEABLE ``ray.data`` AggregateFn over a
  WKB column: each block contributes one running (minx, miny, maxx,
  maxy), partials merge associatively, so the extent of a 100-TB table
  is one map-combined aggregate with a 4-float result — no geometry
  ever leaves its block.
- GeometryCombiner (Geometries/Utilities/GeometryCombiner.cs:16 —
  ``Combine`` collects inputs via GeometryFactory.BuildGeometry:
  homogeneous inputs become the matching Multi*, mixed inputs a
  GeometryCollection, one input is returned as-is) as a plain function
  over ``Geom`` plus a ``groupby().map_groups`` helper that collects
  each group's geometries into one combined WKB.
"""

from __future__ import annotations

import numpy as np

from ..geom.types import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geom,
)

_EMPTY_ENV = (np.inf, np.inf, -np.inf, -np.inf)


def _env_of_wkb_block(wkbs) -> tuple[float, float, float, float]:
    from ..geom import algorithms as alg
    from ..geom.wkb import from_wkb

    minx, miny, maxx, maxy = _EMPTY_ENV
    for w in wkbs:
        if w is None:
            continue
        env = alg.envelope(from_wkb(w))
        if env is None:
            continue
        minx = min(minx, env[0])
        miny = min(miny, env[1])
        maxx = max(maxx, env[2])
        maxy = max(maxy, env[3])
    return (minx, miny, maxx, maxy)


def _env_merge(a, b):
    return (min(a[0], b[0]), min(a[1], b[1]), max(a[2], b[2]), max(a[3], b[3]))


def EnvelopeUnion(on: str = "wkb", name: str = "extent"):
    """AggregateFn: envelope union of a WKB geometry column.

    ``ds.aggregate(EnvelopeUnion("wkb"))`` / ``ds.groupby(k).aggregate(...)``
    yields a 4-list ``[minx, miny, maxx, maxy]`` per group (None-envelope
    groups — all inputs empty — yield ``None``, matching
    EnvelopeCombiner.cs returning a null envelope).
    """
    from ray.data.aggregate import AggregateFn

    def accumulate_block(acc, block):
        import pyarrow as pa

        col = (
            block[on].to_pylist() if isinstance(block, pa.Table) else list(block[on])
        )
        return _env_merge(acc, _env_of_wkb_block(col))

    def finalize(acc):
        if acc[0] > acc[2]:
            return None
        return [float(acc[0]), float(acc[1]), float(acc[2]), float(acc[3])]

    return AggregateFn(
        init=lambda k: _EMPTY_ENV,
        merge=_env_merge,
        accumulate_block=accumulate_block,
        finalize=finalize,
        name=name,
    )


_MULTI_OF = {POINT: MULTIPOINT, LINESTRING: MULTILINESTRING, POLYGON: MULTIPOLYGON}


def combine_geometries(geoms, skip_empty: bool = False) -> Geom:
    """GeometryCombiner.Combine (GeometryCombiner.cs:16) +
    GeometryFactory.BuildGeometry semantics: one input → returned as-is;
    homogeneous Point/LineString/Polygon inputs → the matching Multi*;
    anything else (mixed types, nested multis/collections) →
    GeometryCollection.  ``skip_empty`` mirrors the reference's
    SkipEmpty flag."""
    gs = [g for g in geoms if not (skip_empty and g.is_empty)]
    if not gs:
        return Geom.empty(GEOMETRYCOLLECTION)
    if len(gs) == 1:
        return gs[0]
    types = {g.gtype for g in gs}
    if len(types) == 1:
        t = next(iter(types))
        if t == POINT:
            return Geom(MULTIPOINT, [g.data.copy() for g in gs])
        if t == LINESTRING:
            return Geom(MULTILINESTRING, [g.data.copy() for g in gs])
        if t == POLYGON:
            return Geom(MULTIPOLYGON, [[r.copy() for r in g.data] for g in gs])
    return Geom.collection(gs)


def combine_wkb_groups(ds, key: str, wkb_col: str = "wkb"):
    """groupby(key).map_groups: collect each group's geometries into ONE
    combined geometry (GeometryCombiner semantics), emitting
    (key, combined_wkb, n_geoms).  The combine itself is per-group local —
    the only exchange is the key-colocating groupby shuffle."""
    import pandas as pd
    import pyarrow as pa2

    from ..geom.wkb import decode_column, to_wkb

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        geoms = decode_column(pa2.array(list(g[wkb_col]), type=pa2.binary()))
        out = combine_geometries(geoms)
        return pd.DataFrame(
            {
                key: [g[key].iloc[0]],
                "combined_wkb": [to_wkb(out)],
                "n_geoms": [len(geoms)],
            }
        )

    return ds.groupby(key).map_groups(combine, batch_format="pandas")
