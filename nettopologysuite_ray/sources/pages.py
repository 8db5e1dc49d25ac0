"""Deterministic Common-Crawl-style `pages` fixture (BASELINE.json input_hint).

The driver mandates the input table shape
``pages(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
but supplies no such file — FIXTURES.md §1 specifies the deterministic
generation rule (pure function of row index, seed-free arithmetic).  We
derive pages from the driver's ``documents`` table so the SQL oracle can
re-derive every value from ``doc_id`` arithmetic:

* ``i``      = doc_id
* ``url``    = https://site{i%1000}.example/page/{i}
* ``warc_ts``= 2025-01-01T00:00:00 + i seconds
* ``lang``   = the documents row's lang
* entities   = k = i % 4 mentions ``@geo(lon,lat)``; integer cents:
    lon_1e2 = (i*7919 + j*131)  % 36000 - 18000
    lat_1e2 = (i*104729 + j*173) % 18000 - 9000
  skew: rows with i % 10 < 3 put all their entities in the hot urban cell
    lon_1e2 = 1320 + (i*7919 + j*131) % 40     (13.20..13.59)
    lat_1e2 = 5240 + (i*104729 + j*173) % 20   (52.40..52.59)
* ``text``   = documents.text, then one line per entity:
    "Visit @geo({lon:.2f},{lat:.2f}) now."
* ``html``   = <html><head><title>{first line}</title></head><body>
               one <p> per remaining line </body></html>

Invariant (north_rule): the engine's extract stage must reproduce ``text``
from ``html`` byte-identically per url at any parallelism level.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HOT_FRACTION_MOD = 10  # i % 10 < 3 → hot cell


def entity_cents(i: np.ndarray, j: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Integer lon/lat cents of entity j on page i (vectorized)."""
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    lon = (i * 7919 + j * 131) % 36000 - 18000
    lat = (i * 104729 + j * 173) % 18000 - 9000
    hot = (i % HOT_FRACTION_MOD) < 3
    lon = np.where(hot, 1320 + (i * 7919 + j * 131) % 40, lon)
    lat = np.where(hot, 5240 + (i * 104729 + j * 173) % 20, lat)
    return lon, lat


def _fmt_cents(c: int) -> str:
    sign = "-" if c < 0 else ""
    c = abs(c)
    return f"{sign}{c // 100}.{c % 100:02d}"


# Deterministic filler paragraphs so pages have Common-Crawl-like weight
# (~2 KB of html, not 200 B) — the extract stage's cost per page is then
# realistic and the docs/sec metric meaningful.  64 fixed ~140-char
# sentences; paragraph p of page i uses sentence (i + p) % 64 prefixed
# with the page number (keeps pages distinct for dedup stages).
_WORDS = (
    "stream shuffle batch merge index tile vector raster page crawl parse token "
    "filter reduce join scan block spill actor queue cell grid key range sort "
    "hash union buffer hull relate locate probe build broadcast salt skew"
).split()
_SENTS = [
    " ".join(_WORDS[(s * 7 + w * 3) % len(_WORDS)] for w in range(20)).capitalize() + "."
    for s in range(64)
]
FILLER_PARAS = 12


def build_pages_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id, text, lang) batch → pages batch (vector of rows).

    Pure per-row function — safe at any parallelism level.
    """
    ids = batch["doc_id"].to_numpy()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    urls = []
    htmls = []
    page_texts = []
    for i, base_text in zip(ids.tolist(), texts):
        k = i % 4
        lines = [base_text]
        for p in range(FILLER_PARAS):
            lines.append(f"p{i % 1000} {_SENTS[(i + p) % 64]}")
        if k:
            jj = np.arange(k)
            lon, lat = entity_cents(np.full(k, i), jj)
            for a, b in zip(lon.tolist(), lat.tolist()):
                lines.append(f"Visit @geo({_fmt_cents(a)},{_fmt_cents(b)}) now.")
        page_texts.append("\n".join(lines))
        urls.append(f"https://site{i % 1000}.example/page/{i}")
        body = "".join(f"<p>{ln}</p>" for ln in lines[1:])
        htmls.append(
            f"<html><head><title>{lines[0]}</title></head><body>{body}</body></html>".encode()
        )
    ts = (np.datetime64("2025-01-01T00:00:00") + ids.astype("timedelta64[s]")).astype(
        "datetime64[us]"
    )
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(page_texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
            "doc_id": pa.array(ids, type=pa.int64()),
        }
    )


def read_pages(sf_dir: str, include_doc_id: bool = True):
    """Dataset of pages derived from {sf_dir}/documents.parquet."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    # Same remote args as the downstream prep stage (northstar.entity_dataset)
    # so build+prep fuse into one task op and the wide html column never
    # crosses the object store.
    out = ds.map_batches(build_pages_batch, batch_format="pyarrow", batch_size=1024, num_cpus=0.5)
    if not include_doc_id:
        out = out.select_columns(["url", "warc_ts", "html", "text", "lang"])
    return out


# ---------------------------------------------------------------------------
# admin boundary build side (FIXTURES.md §2)

ADMIN_NX = 36  # 10-degree grid
ADMIN_NY = 18


def admin_boundaries_table(
    nx: int = ADMIN_NX, ny: int = ADMIN_NY, fancy: bool = True
) -> pa.Table:
    """Admin polygon grid tiling [-180,180]x[-90,90]; admin_id = iy*nx + ix.

    Every 17th polygon gets a hole and every 23rd is concave (L-shape) for
    PIP edge-case coverage (FIXTURES.md §2); holes/concavities are carved
    strictly inside the cell so point assignment on the 10-degree lattice
    is unaffected (points never fall in a hole: entity coords are cents and
    the carved regions sit on .25/.75 offsets... they CAN fall inside —
    the spatial-join oracle therefore uses ``fancy=False`` pure rectangles,
    while the fancy variants are exercised by the conformance/unit tests).
    """
    from ..geom.types import Geom
    from ..geom.wkb import to_wkb

    w = 360.0 / nx
    h = 180.0 / ny
    ids = []
    names = []
    levels = []
    wkbs = []
    bbox = {k: [] for k in ("minx", "miny", "maxx", "maxy")}
    for iy in range(ny):
        for ix in range(nx):
            aid = iy * nx + ix
            x0 = -180.0 + ix * w
            y0 = -90.0 + iy * h
            x1 = x0 + w
            y1 = y0 + h
            shell = [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]
            holes = []
            if fancy and aid % 17 == 3:
                hx0 = x0 + 0.30 * w
                hy0 = y0 + 0.30 * h
                hx1 = x0 + 0.45 * w
                hy1 = y0 + 0.45 * h
                holes = [[(hx0, hy0), (hx1, hy0), (hx1, hy1), (hx0, hy1), (hx0, hy0)]]
            if fancy and aid % 23 == 5:
                # concave L-shape: cut the top-right quarter out
                mx = x0 + 0.5 * w
                my = y0 + 0.5 * h
                shell = [
                    (x0, y0),
                    (x1, y0),
                    (x1, my),
                    (mx, my),
                    (mx, y1),
                    (x0, y1),
                    (x0, y0),
                ]
            g = Geom.polygon(shell, holes)
            ids.append(aid)
            names.append(f"admin-{aid}")
            levels.append(aid % 2)
            wkbs.append(to_wkb(g))
            bbox["minx"].append(x0)
            bbox["miny"].append(y0)
            bbox["maxx"].append(x1)
            bbox["maxy"].append(y1)
    return pa.table(
        {
            "admin_id": pa.array(ids, type=pa.int64()),
            "name": pa.array(names),
            "level": pa.array(levels, type=pa.int32()),
            "geometry_wkb": pa.array(wkbs, type=pa.binary()),
            "minx": pa.array(bbox["minx"]),
            "miny": pa.array(bbox["miny"]),
            "maxx": pa.array(bbox["maxx"]),
            "maxy": pa.array(bbox["maxy"]),
        }
    )
