"""nettopologysuite_ray — a Ray-Data-native spatial + web-text data engine.

Public surface, re-exported lazily (PEP 562) so importing the package —
which happens in every Ray worker — stays free until a symbol is used.

Three layers:

- **geometry kernel** (pure numpy/python, per-record): ``Geom``,
  WKT/WKB codecs, DE-9IM predicates, overlay/union, buffer, hulls,
  triangulation, simplification — the NetTopologySuite semantics.
- **stages** (Dataset -> Dataset transforms): broadcast PIP/kNN joins,
  cell-keyed large-large joins, tiling/rollups, window operators,
  multimodal decode.
- **functions** (web-text pipeline kernels): HTML text extraction,
  dedup (exact/MinHash-LSH/SimHash/embedding), ANN, sketches, sampling,
  fingerprints.

``import nettopologysuite_ray as nts`` then ``nts.buffer``,
``nts.within_distance_join``, ``nts.exact_dedup`` …
"""

from __future__ import annotations

import importlib

_EXPORTS = {
    # geometry model + IO
    "Geom": "geom.types",
    "from_wkt": "geom.wkt",
    "to_wkt": "geom.wkt",
    "from_wkb": "geom.wkb",
    "to_wkb": "geom.wkb",
    "decode_column": "geom.wkb",
    "encode_column": "geom.wkb",
    # predicates (DE-9IM family)
    "relate": "geom.predicates",
    "relate_pattern": "geom.predicates",
    "matrix_matches": "geom.predicates",
    "intersects": "geom.predicates",
    "disjoint": "geom.predicates",
    "contains": "geom.predicates",
    "within": "geom.predicates",
    "covers": "geom.predicates",
    "covered_by": "geom.predicates",
    "crosses": "geom.predicates",
    "overlaps": "geom.predicates",
    "touches": "geom.predicates",
    "equals_topo": "geom.predicates",
    # scalar math kernels (reference: Algorithm/Angle.cs, Geometries/
    # Triangle.cs, Mathematics/Vector2D.cs, Algorithm/HCoordinate.cs)
    "LineSegment": "geom.segment",
    "Triangle": "geom.mathutil",
    "Vector2D": "geom.mathutil",
    "Vector3D": "geom.mathutil",
    "HCoordinate": "geom.mathutil",
    "line_intersection": "geom.mathutil",
    # 3D distance ops
    "distance3d": "geom.distance3d",
    "nearest_points3d": "geom.distance3d",
    "is_within_distance3d": "geom.distance3d",
    # multi-row graph stages
    "distributed_polygonize": "stages.polygonize",
    "distributed_line_dissolve": "stages.linemerge",
    "distributed_node": "stages.noding",
    # structural rewrite hooks
    "GeometryTransformer": "geom.transformer",
    "AffineTransformer": "geom.transformer",
    "transform_geometry": "geom.transformer",
    "GeometryEditor": "geom.transformer",
    "coordinate_operation": "geom.transformer",
    "geometry_map": "geom.transformer",
    "geometry_flat_map": "geom.transformer",
    # overlay / union / precision
    "overlay": "geom.overlay",
    "union_all": "geom.overlay",
    "snap_to_grid": "geom.overlay",
    "snapping_noder": "geom.overlay",
    "segment_extracting_noder": "geom.overlay",
    "ElevationModel": "geom.elevation",
    "overlay_z": "geom.elevation",
    "buffer": "geom.buffer",
    # dataset stages — joins, tiles, windows
    "prepare_admin_state": "stages.spatial_join",
    "PIPJoin": "stages.spatial_join",
    "KnnJoin": "stages.spatial_join",
    "within_distance_join": "stages.cell_join",
    "BroadcastJoin": "stages.relational",
    "grouped_sum": "stages.relational",
    "top_k": "stages.relational",
    "distinct": "stages.relational",
    "assign_cells_batch": "stages.tiling",
    "tile_stats": "stages.tiling",
    "grouped_topk_min": "stages.tiling",
    "salt_hot_cells": "stages.tiling",
    "tumbling_window_agg": "stages.windows",
    "hopping_window_agg": "stages.windows",
    "sessionize_stats": "stages.windows",
    "as_of_join": "stages.windows",
    "grouped_quantiles": "stages.relational",
    "scalar_stage": "stages.geometry",
    "geometry_stage": "stages.geometry",
    # web-text functions
    "extract_text_batch": "functions.text",
    "parse_geo_entities_batch": "functions.text",
    "token_count_batch": "functions.text",
    "quality_score_batch": "functions.text",
    "winnow_fingerprints_batch": "functions.text",
    "MinHasher": "functions.dedup",
    "SimHasher": "functions.dedup",
    "exact_dedup": "functions.dedup",
    "lsh_candidate_pairs": "functions.dedup",
    "lsh_verified_pairs": "functions.dedup",
    "lsh_dedup": "functions.dedup",
    "near_dup_groups": "functions.dedup",
    "jaccard": "functions.dedup",
    "ann_topk": "functions.embed",
    "ivf_ann_topk": "functions.embed",
    "embed_near_dup": "functions.embed",
    "kmv_distinct": "functions.sketch",
    "bottom_k_sample": "functions.sketch",
    "hash_split": "functions.sketch",
    "top_tokens": "functions.text",
    "tfidf_top_terms": "functions.text",
    "PIIRedactor": "functions.text",
    # sources / state
    "shard_map_parquet": "sources.shards",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name: str):
    mod = _EXPORTS.get(name)
    if mod is None:
        raise AttributeError(f"module 'nettopologysuite_ray' has no attribute {name!r}")
    value = getattr(importlib.import_module(f".{mod}", __name__), name)
    globals()[name] = value  # cache for subsequent lookups
    return value


def __dir__():
    return __all__
