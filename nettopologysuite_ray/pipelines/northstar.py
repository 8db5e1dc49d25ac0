"""The flagship north-star pipeline (BASELINE.json north_star):

  pages(url, warc_ts, html, text, lang)
    → extract_text (pure, byte-identical per url)
    → parse geo entities (regex → lon/lat point columns; html dropped
      immediately after — wide binary never crosses a shuffle)
    → broadcast PIP join vs admin polygons (actor pool, prepared state)
    → Hilbert tile assignment at level L
    → skew-proof tile stats (combiner + groupby)

Every stage is a Dataset transform over Arrow batches; the only shuffle is
the final small groupby over pre-aggregated (cell, partial_count) rows.
"""

from __future__ import annotations

import pyarrow as pa

import ray

from ..functions.text import extract_text_batch, parse_geo_entities_batch
from ..sources.pages import admin_boundaries_table, read_pages
from ..stages.spatial_join import PIPJoin, prepare_admin_state
from ..stages.tiling import assign_cells_batch, tile_stats

DEFAULT_LEVEL = 12


def entity_dataset(sf_dir: str, concurrency: int | None = None):
    """pages → extracted text → exploded entity rows (doc_id, entity_idx,
    lon, lat, lon_1e2, lat_1e2)."""
    pages = read_pages(sf_dir)

    def prep(b: pa.Table) -> pa.Table:
        # the engine derives text from html itself (input `text` is the
        # oracle column, asserted byte-identical by tests — never used here)
        b = extract_text_batch(b.drop_columns(["text"]), out_col="text")
        # drop the wide html column before anything heavy (SURVEY.md §7.4)
        return parse_geo_entities_batch(b.drop_columns(["html"]), keys=("doc_id",))

    # Explicit remote args ≠ the downstream actor stages' (num_cpus=1), so
    # build+prep fuse with EACH OTHER (html never crosses the object store)
    # but NOT into the actor op — otherwise the actor's batch_size bundles
    # the whole small-SF input into one task and the pipeline runs serial.
    return pages.map_batches(prep, batch_format="pyarrow", batch_size=1024, num_cpus=0.5)


def northstar(
    sf_dir: str,
    level: int = DEFAULT_LEVEL,
    concurrency=(1, 4),
    fancy_admin: bool = False,
):
    """Full pipeline; returns (joined_entities_ds, tile_stats_ds)."""
    ents = entity_dataset(sf_dir)
    admin_ref = prepare_admin_state(admin_boundaries_table(fancy=fancy_admin))
    joined = ents.map_batches(
        PIPJoin,
        fn_constructor_kwargs={"admin_ref": admin_ref, "mode": "assign"},
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=concurrency,
        num_cpus=1,
    )
    tiled = joined.map_batches(
        lambda b: assign_cells_batch(b, level=level, kind="hilbert"),
        batch_format="pyarrow",
    )
    stats = tile_stats(tiled, "cell_id")
    return tiled, stats
