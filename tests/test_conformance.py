"""Conformance gates: the reference's XML corpus is the oracle.

Pass-rate assertions are exact for the supported op families — any
regression fails the build.  The distributed-pipeline variant runs a
sample through Ray; the full corpus runs in-process (fast, same code)."""

import pytest

from nettopologysuite_ray.geom.wkt import from_wkt
from nettopologysuite_ray.sources.conformance import load_cases
from nettopologysuite_ray.stages.geometry import _compare, run_conformance_case

RELATE_OPS = {
    "relate",
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
SCALAR_OPS = {
    "getCentroid",
    "getInteriorPoint",
    "convexhull",
    "distance",
    "isWithinDistance",
    "densify",
    "equalsExact",
    "equalsNorm",
}


def _run_ops(ops) -> tuple[int, int, list]:
    t = load_cases().to_pandas()
    sub = t[t.op.isin(ops)]
    fails = []
    for _, r in sub.iterrows():
        try:
            a = from_wkt(r.a_wkt) if r.a_wkt else None
            b = from_wkt(r.b_wkt) if r.b_wkt else None
            res, sup = run_conformance_case(r.op, a, b, r.arg1, r.arg2, r.arg3)
        except Exception as ex:  # noqa: BLE001
            res, sup = f"ERR:{type(ex).__name__}", True
        if sup and not _compare(res, r.expected):
            fails.append((r.case_id, r.op, res))
    return len(sub), len(fails), fails


def test_relate_family_100_percent():
    n, nf, fails = _run_ops(RELATE_OPS)
    assert n >= 5600
    assert nf == 0, fails[:10]


def test_scalar_ops_100_percent():
    n, nf, fails = _run_ops(SCALAR_OPS)
    assert n >= 160
    assert nf == 0, fails[:10]


def test_conformance_pipeline_distributed(ray_session):
    """A corpus slice through the actual Ray pipeline (cases as rows)."""
    from nettopologysuite_ray.pipelines.conformance import conformance_summary

    df = conformance_summary(files=["general/TestRelateAA.xml", "general/TestCentroid.xml"]).to_pandas()
    sup = df[df.n_supported > 0]
    assert (sup.n_passed == sup.n_supported).all(), df.to_string()


BUFFER_OPS = {"buffer", "bufferMitredJoin"}


def test_buffer_tolerance_match():
    """Buffer results match the reference's BufferResultMatcher tolerances
    (area + boundary Hausdorff) on ALL 34 corpus buffer cases — the gate
    is exact so a robustness regression cannot hide behind slack."""
    from nettopologysuite_ray.stages.geometry import compare_buffer

    t = load_cases().to_pandas()
    sub = t[t.op.isin(BUFFER_OPS)]
    n_ok = 0
    for _, r in sub.iterrows():
        try:
            a = from_wkt(r.a_wkt)
            res, _sup = run_conformance_case(r.op, a, None, r.arg1, r.arg2, r.arg3, r.pm_scale)
            d = float(r.arg2 if r.arg2 is not None else r.arg3)
            if compare_buffer(res, r.expected, d):
                n_ok += 1
        except Exception:  # noqa: BLE001
            pass
    assert n_ok == len(sub) == 34, (n_ok, len(sub))


def test_unary_union_floating_snap_fallback():
    """The TestUnaryUnionFloating robust case is reproduced bit-exact by the
    SnappingNoder-style vertex-snap retry (reference:
    OverlayNGRobust.cs:178 OverlaySnapTries; magnitude/1e12 tolerance)."""
    from nettopologysuite_ray.sources.conformance import load_cases
    from nettopologysuite_ray.geom.overlay import union_all
    from nettopologysuite_ray.geom.wkt import from_wkt, to_wkt
    from nettopologysuite_ray.stages.geometry import _compare

    rows = [
        r
        for r in load_cases(dirs=("general",)).to_pylist()
        if "UnaryUnionFloating" in r["file"] and r["op"] == "union"
    ]
    assert rows
    for r in rows:
        got = union_all(list(from_wkt(r["a_wkt"]).flatten()))
        assert _compare(to_wkt(got), r["expected"]), r["file"]
