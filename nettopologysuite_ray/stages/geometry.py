"""Geometry stages: per-record scalar ops and DE-9IM predicates as
map_batches transforms over WKB columns (SURVEY.md §2.2, §2.6).

Each stage factory returns a callable for ds.map_batches(...,
batch_format="pyarrow").  Geometry in/out is WKB binary; scalar results
are typed Arrow columns.  The conformance runner (pipelines/conformance)
uses these same stages — cases stream through the engine as Dataset rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import algorithms as alg
from ..geom import predicates as pred
from ..geom.types import Geom
from ..geom.wkb import decode_column, from_wkb, to_wkb
from ..geom.wkt import from_wkt, to_wkt


def _geoms(batch: pa.Table, col: str):
    # vectorized ragged-buffer batch decode (geom/wkb.py decode_column):
    # one gather per type class instead of a per-row reader walk
    return decode_column(batch[col])


def scalar_stage(fn, out_col: str, out_type):
    """Stage computing a scalar column from geometry column 'wkb'."""

    def stage(batch: pa.Table) -> pa.Table:
        vals = [fn(g) if g is not None else None for g in _geoms(batch, "wkb")]
        return batch.append_column(out_col, pa.array(vals, type=out_type))

    return stage


def geometry_stage(fn, in_col: str = "wkb", out_col: str = "result_wkb"):
    """Stage computing a geometry→geometry op, WKB in/out."""

    def stage(batch: pa.Table) -> pa.Table:
        out = []
        for g in _geoms(batch, in_col):
            out.append(to_wkb(fn(g)) if g is not None else None)
        return batch.append_column(out_col, pa.array(out, type=pa.binary()))

    return stage


def area_stage():
    return scalar_stage(alg.area, "area", pa.float64())


def length_stage():
    return scalar_stage(alg.length, "length", pa.float64())


def centroid_stage():
    return geometry_stage(alg.centroid, out_col="centroid_wkb")


def convex_hull_stage():
    return geometry_stage(alg.convex_hull, out_col="hull_wkb")


def envelope_stage():
    """Append bbox columns minx,miny,maxx,maxy (the Arrow-native envelope
    of SURVEY.md §1.3 — bbox pre-filters without WKB deserialization)."""

    def stage(batch: pa.Table) -> pa.Table:
        envs = [alg.envelope(g) if g is not None else None for g in _geoms(batch, "wkb")]
        cols = {"minx": [], "miny": [], "maxx": [], "maxy": []}
        for e in envs:
            for k, v in zip(cols, e if e else (None, None, None, None)):
                cols[k].append(v)
        for k, v in cols.items():
            batch = batch.append_column(k, pa.array(v, type=pa.float64()))
        return batch

    return stage


def affine_stage(a=1.0, b=0.0, c=0.0, d=0.0, e=1.0, f=0.0, in_col: str = "wkb", out_col: str = "affine_wkb"):
    """Affine transformation x' = a x + b y + c; y' = d x + e y + f, applied
    to flat coordinate arrays (reference: Geometries/Utilities/
    AffineTransformation.cs:71) — a zero-copy-friendly numpy kernel.

    Structure is preserved EXACTLY (no component pruning/unwrapping, so
    WKB output stays bit-stable for the oracle); out-of-band Z/M
    ordinates (`Geom.extra`) carry through untouched, matching the
    reference transforming CoordinateZ sequences (x/y rewritten, z
    kept).  For the reference's full structural-repair semantics use
    geom/transformer.py AffineTransformer."""
    import numpy as np

    def tx(arr):
        out = np.empty_like(arr)
        out[:, 0] = a * arr[:, 0] + b * arr[:, 1] + c
        out[:, 1] = d * arr[:, 0] + e * arr[:, 1] + f
        return out

    def apply(g):
        from ..geom.types import Geom

        t = g.gtype
        if t == "Point":
            return Geom(t, tx(g.data.reshape(1, 2))[0], extra=g.extra) if g.data.size else g
        if t == "LineString":
            return Geom(t, tx(g.data), tag=g.tag, extra=g.extra)
        if t == "Polygon":
            return Geom(t, [tx(r) for r in g.data], extra=g.extra)
        if t == "MultiPoint":
            return Geom(t, [tx(p.reshape(1, 2))[0] for p in g.data], extra=g.extra)
        if t == "MultiLineString":
            return Geom(t, [tx(ls) for ls in g.data], extra=g.extra)
        if t == "MultiPolygon":
            return Geom(t, [[tx(r) for r in rings] for rings in g.data], extra=g.extra)
        return Geom(t, [apply(c2) for c2 in g.data])

    return geometry_stage(apply, in_col=in_col, out_col=out_col)


def relate_stage(a_col: str = "a_wkb", b_col: str = "b_wkb", out_col: str = "de9im"):
    """Pairwise DE-9IM matrix column (reference: Operation/Relate/RelateOp.cs:26)."""

    def stage(batch: pa.Table) -> pa.Table:
        ga = _geoms(batch, a_col)
        gb = _geoms(batch, b_col)
        out = [
            pred.relate(x, y) if x is not None and y is not None else None
            for x, y in zip(ga, gb)
        ]
        return batch.append_column(out_col, pa.array(out, type=pa.string()))

    return stage


def predicate_stage(name: str, a_col: str = "a_wkb", b_col: str = "b_wkb"):
    fn = {
        "intersects": pred.intersects,
        "disjoint": pred.disjoint,
        "contains": pred.contains,
        "within": pred.within,
        "covers": pred.covers,
        "coveredBy": pred.covered_by,
        "crosses": pred.crosses,
        "overlaps": pred.overlaps,
        "touches": pred.touches,
        "equalsTopo": pred.equals_topo,
    }[name]

    def stage(batch: pa.Table) -> pa.Table:
        ga = _geoms(batch, a_col)
        gb = _geoms(batch, b_col)
        out = [
            fn(x, y) if x is not None and y is not None else None for x, y in zip(ga, gb)
        ]
        return batch.append_column(name, pa.array(out, type=pa.bool_()))

    return stage


# ---------------------------------------------------------------------------
# conformance runner stage: evaluates one XML test row per record


_BOOL_PREDICATES = {
    "intersects",
    "disjoint",
    "contains",
    "within",
    "covers",
    "coveredBy",
    "crosses",
    "overlaps",
    "touches",
    "equalsTopo",
}


_OVERLAY_OPS = {
    "intersection": "intersection",
    "intersectionng": "intersection",
    "intersectionsr": "intersection",
    "union": "union",
    "unionng": "union",
    "unionsr": "union",
    "difference": "difference",
    "differenceng": "difference",
    "differencesr": "difference",
    "symdifference": "symdifference",
    "symdifferenceng": "symdifference",
    "symdifferencesr": "symdifference",
}


_HEX_WKB = __import__("re").compile(r"^(?:0[01])(?:[0-9A-Fa-f]{2})+$")


def from_text(s: str):
    """Parse a conformance-corpus geometry literal: WKT, or hex WKB (the
    GEOS-imported robust/overlay files carry big-endian hex WKB in <a>)."""
    t = s.strip()
    if _HEX_WKB.match(t.replace("\n", "").replace(" ", "")):
        return from_wkb(bytes.fromhex(t.replace("\n", "").replace(" ", "")))
    return from_wkt(t)


def run_conformance_case(op, a, b, arg1, arg2, arg3, pm_scale=None):
    """Evaluate one conformance op → (result_str, supported: bool).

    Mirrors XmlTest.Run dispatch (reference:
    test/NetTopologySuite.TestRunner/XmlTest.cs:224,302).  The GEOS-
    imported ops of robust/overlay (unionArea, unionLength,
    overlayAreaTest, reducePrecision — no implementation exists in the
    reference's own TestRunner) are engine-defined: union scalars are the
    measure of the robust unary union; overlayAreaTest asserts the
    inclusion-exclusion identity area(A)+area(B) == area(A∪B)+area(A∩B)
    to 1e-6 relative — the invariant those GEOS regressions guard."""
    if (arg1 or "A").upper() == "B":
        a, b = b, a
        arg1 = "A"
    if op.lower() in _OVERLAY_OPS:
        from ..geom.overlay import overlay, union_all

        base = _OVERLAY_OPS[op.lower()]
        # SR ops carry the scale in arg3 (per-op precision); otherwise the
        # run-level precisionModel applies.  pandas nulls arrive as NaN.
        if op.lower().endswith("sr") and arg3:
            grid = 1.0 / float(arg3)
        else:
            grid = (1.0 / pm_scale) if (pm_scale and pm_scale == pm_scale) else None
        ng = op.lower().endswith("ng") or op.lower().endswith("sr")
        if b is None and base == "union":
            return to_wkt(union_all([a], grid)), True
        return to_wkt(overlay(a, b, base, grid, merge_line_output=not ng, ng=ng)), True
    if op == "relate":
        return str(pred.matrix_matches(pred.relate(a, b), arg3)).lower(), True
    if op in _BOOL_PREDICATES:
        fn = {
            "intersects": pred.intersects,
            "disjoint": pred.disjoint,
            "contains": pred.contains,
            "within": pred.within,
            "covers": pred.covers,
            "coveredBy": pred.covered_by,
            "crosses": pred.crosses,
            "overlaps": pred.overlaps,
            "touches": pred.touches,
            "equalsTopo": pred.equals_topo,
        }[op]
        return str(fn(a, b)).lower(), True
    if op == "isValid":
        from ..geom.validity import is_valid

        return str(is_valid(a)).lower(), True
    if op == "isSimple":
        from ..geom.validity import is_simple

        return str(is_simple(a)).lower(), True
    if op in ("buffer", "bufferMitredJoin"):
        from ..geom.buffer import buffer as buffer_fn

        d = float(arg2 if arg2 is not None else arg3)
        join = "mitre" if op == "bufferMitredJoin" else "round"
        return to_wkt(buffer_fn(a, d, join=join)), True
    if op in ("minClearance", "minClearanceLine"):
        from ..geom.construct import minimum_clearance

        d, line = minimum_clearance(a)
        if op == "minClearance":
            return repr(d), True
        return to_wkt(line), True
    if op == "polygonize":
        from ..geom.construct import polygonize

        return to_wkt(polygonize(a)), True
    if op == "simplifyDP":
        return to_wkt(alg.simplify_dp(a, float(arg2 if arg2 else arg3))), True
    if op == "simplifyTP":
        return to_wkt(alg.simplify_tp(a, float(arg2 if arg2 else arg3))), True
    if op == "getboundary":
        return to_wkt(alg.boundary(a)), True
    if op == "getCentroid":
        return to_wkt(alg.centroid(a)), True
    if op == "getInteriorPoint":
        return to_wkt(alg.interior_point(a)), True
    if op == "convexhull":
        return to_wkt(alg.convex_hull(a)), True
    if op == "distance":
        return repr(alg.distance(a, b)), True
    if op == "isWithinDistance":
        d = alg.distance(a, b)
        return str(bool(d <= float(arg3))).lower(), True
    if op == "densify":
        return to_wkt(alg.densify(a, float(arg2 if arg2 else arg3))), True
    if op == "equalsExact":
        return str(alg.equals_exact(a, b)).lower(), True
    if op == "equalsNorm":
        return str(alg.equals_exact(alg.normalize(a), alg.normalize(b))).lower(), True
    if op in ("unionArea", "unionLength"):
        from ..geom.overlay import overlay, union_all

        u = union_all(list(a.flatten())) if b is None else overlay(a, b, "union")
        return repr(alg.area(u) if op == "unionArea" else alg.length(u)), True
    if op.lower() == "overlayareatest":
        from ..geom.overlay import overlay

        inter = overlay(a, b, "intersection")
        uni = overlay(a, b, "union")
        lhs = alg.area(a) + alg.area(b)
        rhs = alg.area(uni) + alg.area(inter)
        ok = abs(lhs - rhs) <= 1e-6 * max(lhs, rhs, 1.0)
        return str(ok).lower(), True
    if op == "reducePrecision":
        from ..geom.precision import reduce_precision

        # negative scale sets the grid size directly
        # (reference: Geometries/PrecisionModel.cs:160-179)
        sc = float(arg2 if arg2 is not None else arg3)
        scale = 1.0 / abs(sc) if sc < 0 else sc
        return to_wkt(reduce_precision(a, scale)), True
    return "", False


class ConformanceRunner:
    """Actor stage: one conformance test per row → result/pass columns.

    Comparison uses the reference's normalized matcher for geometry
    results (normalize → equals-exact tol=0; NormalizedGeometryMatcher.cs:22),
    exact compare for booleans, 1e-9 tolerance for numbers."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols = {c: batch[c].to_pylist() for c in batch.column_names}
        results = []
        passes = []
        supported = []
        for i in range(len(batch)):
            op = cols["op"][i]
            try:
                a = from_wkt(cols["a_wkt"][i]) if cols["a_wkt"][i] else None
                b = from_wkt(cols["b_wkt"][i]) if cols["b_wkt"][i] else None
                res, sup = run_conformance_case(
                    op, a, b, cols["arg1"][i], cols["arg2"][i], cols["arg3"][i],
                    pm_scale=cols.get("pm_scale", [None] * len(batch))[i],
                )
            except Exception as ex:  # noqa: BLE001
                res, sup = f"ERR:{type(ex).__name__}", True
            results.append(res)
            supported.append(sup)
            if not sup:
                passes.append(None)
                continue
            exp = cols["expected"][i]
            if op in ("buffer", "bufferMitredJoin"):
                try:
                    d = float(cols["arg2"][i] if cols["arg2"][i] is not None else cols["arg3"][i])
                    passes.append(compare_buffer(res, exp, d))
                except (TypeError, ValueError):
                    passes.append(False)
            else:
                passes.append(_compare(res, exp))
        out = batch.append_column("result", pa.array(results, type=pa.string()))
        out = out.append_column("passed", pa.array(passes, type=pa.bool_()))
        out = out.append_column("supported", pa.array(supported, type=pa.bool_()))
        return out


def compare_buffer(result: str, expected: str, distance: float) -> bool:
    """Reference BufferResultMatcher: relative area diff < 1e-3 AND
    boundary discrete-Hausdorff < |d|/100 (Result/BufferResultMatcher.cs:43-50)."""
    try:
        rg = from_wkt(result)
        eg = from_wkt(expected)
    except ValueError:
        return False
    if rg.is_empty or eg.is_empty:
        return rg.is_empty and eg.is_empty
    a_r = alg.area(rg)
    a_e = alg.area(eg)
    if max(a_r, a_e) > 0:
        frac = abs(a_r - a_e) / ((a_r + a_e) / 2.0)
        if frac >= 1.0e-3:
            return False
    tol = max(abs(distance) / 100.0, 1.0e-8)
    h = alg.hausdorff(alg.boundary(rg), alg.boundary(eg), densify_frac=0.25)
    return h <= tol


def _compare(result: str, expected: str, tol: float | None = None) -> bool:
    """tol: run-level <tolerance> from the corpus file (absolute, also the
    coordinate tolerance of the normalized geometry compare); defaults to
    the 1e-9 exact-gate used for the general/validate dirs."""
    if expected is None:
        return result == ""
    e = expected.strip()
    t = 1e-9 if tol is None or tol != tol else float(tol)
    if e.lower() in ("true", "false"):
        return result == e.lower()
    # numeric?
    try:
        ev = float(e)
        return abs(float(result) - ev) <= t + 1e-9 * abs(ev)
    except ValueError:
        pass
    # geometry compare: normalize-then-equals-exact
    try:
        eg = alg.normalize(from_text(e))
        rg = alg.normalize(from_text(result))
        return alg.equals_exact(eg, rg, t)
    except ValueError:
        return False


class GmlKmlRoundtrip:
    """Actor stage: encode each geometry as GML2, GML3 and KML, parse it
    back, and report byte sizes + exact-equality per format (reference
    IO surface: IO/GML2/GMLReader.cs:17, IO/KML/KMLWriter.cs:27)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..geom.gml import from_gml, to_gml2, to_gml3
        from ..geom.kml import from_kml, to_kml

        def same_content(a, b):
            """Exact equality, or identical flattened components - KML has
            no collection typing (the reference's KMLReader rebuilds with
            BuildGeometry, promoting homogeneous collections), so a
            GC-of-polygons legitimately reads back as a MultiPolygon."""
            if alg.equals_exact(a, b):
                return True
            if to_wkt(a) == to_wkt(b):
                return True  # NaN ordinates: equal bytes, NaN != NaN
            ca = list(a.flatten())
            cb = list(b.flatten())
            if len(ca) != len(cb):
                return False
            return all(
                alg.equals_exact(x, y) or to_wkt(x) == to_wkt(y)
                for x, y in zip(ca, cb)
            )

        wkts = batch["a_wkt"].to_pylist()
        rows = {"fmt": [], "n": [], "n_ok": [], "bytes": []}
        stats = {"gml2": [0, 0, 0], "gml3": [0, 0, 0], "kml": [0, 0, 0]}
        for w in wkts:
            if not w:
                continue
            try:
                g = from_wkt(w)
            except ValueError:
                continue
            for name, enc, dec in (("gml2", to_gml2, from_gml), ("gml3", to_gml3, from_gml), ("kml", to_kml, from_kml)):
                try:
                    doc = enc(g)
                    ok = same_content(dec(doc), g)
                except ValueError:
                    doc, ok = "", False
                s = stats[name]
                s[0] += 1
                s[1] += int(bool(ok))
                s[2] += len(doc)
        for name, (n, n_ok, nbytes) in stats.items():
            rows["fmt"].append(name)
            rows["n"].append(n)
            rows["n_ok"].append(n_ok)
            rows["bytes"].append(nbytes)
        return pa.Table.from_pydict(rows)
