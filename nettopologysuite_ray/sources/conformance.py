"""Loader for the reference's XML conformance corpus → Arrow table.

The corpus (reference: data/NetTopologySuite.TestRunner.Tests/, format per
general/TestRelateAA.xml; runner semantics in
test/NetTopologySuite.TestRunner/XmlTest.cs:224 Run) is DATA, not code:
2,200+ <case> elements with WKT inputs and per-op expected values.  We
load it into a table (FIXTURES.md §3 schema) and run the cases through
the engine's distributed stages; comparison follows the reference's
NormalizedGeometryMatcher (normalize → equals-exact-with-tolerance,
Operations/NormalizedGeometryMatcher.cs:22) and BufferResultMatcher
(area delta + boundary Hausdorff, Result/BufferResultMatcher.cs:67).
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

import pyarrow as pa

CORPUS_ROOT = "/root/reference/data/NetTopologySuite.TestRunner.Tests"
DEFAULT_DIRS = ("general", "validate")


def _clean(s: str | None) -> str | None:
    if s is None:
        return None
    s = s.strip()
    return s if s else None


def load_cases(dirs=DEFAULT_DIRS, root: str = CORPUS_ROOT, files=None) -> pa.Table:
    rows = {
        k: []
        for k in (
            "case_id",
            "file",
            "desc",
            "a_wkt",
            "b_wkt",
            "op",
            "arg1",
            "arg2",
            "arg3",
            "expected",
            "pm_scale",
            "tolerance",
        )
    }
    paths = []
    if files:
        paths = [os.path.join(root, f) for f in files]
    else:
        for d in dirs:
            full = os.path.join(root, d)
            for fn in sorted(os.listdir(full)):
                if fn.endswith(".xml"):
                    paths.append(os.path.join(full, fn))
    for path in paths:
        fname = os.path.relpath(path, root)
        try:
            tree = ET.parse(path)
        except ET.ParseError:
            # a few corpus files contain undeclared entities; patch minimally
            txt = open(path, encoding="utf-8", errors="replace").read()
            txt = re.sub(r"&(?!(amp|lt|gt|quot|apos);)", "&amp;", txt)
            tree = ET.ElementTree(ET.fromstring(txt))
        run = tree.getroot()
        tol = run.findtext("tolerance")
        tolerance = float(tol) if tol and tol.strip() else None
        pm_scale = None
        pm = run.find("precisionModel")
        if pm is not None:
            s = pm.get("scale")
            if s is not None:
                pm_scale = float(s)
            elif pm.get("type") == "FLOATING":
                pm_scale = None
        for ci, case in enumerate(run.findall("case")):
            desc = _clean(case.findtext("desc")) or ""
            a_wkt = _clean(case.findtext("a"))
            b_wkt = _clean(case.findtext("b"))
            for ti, test in enumerate(case.findall("test")):
                op = test.find("op")
                if op is None:
                    continue
                rows["case_id"].append(f"{fname}#{ci}#{ti}")
                rows["file"].append(fname)
                rows["desc"].append(desc)
                rows["a_wkt"].append(a_wkt)
                rows["b_wkt"].append(b_wkt)
                rows["op"].append(op.get("name"))
                rows["arg1"].append(_clean(op.get("arg1")))
                rows["arg2"].append(_clean(op.get("arg2")))
                rows["arg3"].append(_clean(op.get("arg3")))
                rows["expected"].append(_clean(op.text))
                rows["pm_scale"].append(pm_scale)
                rows["tolerance"].append(tolerance)
    return pa.table(
        {
            "case_id": pa.array(rows["case_id"]),
            "file": pa.array(rows["file"]),
            "desc": pa.array(rows["desc"]),
            "a_wkt": pa.array(rows["a_wkt"]),
            "b_wkt": pa.array(rows["b_wkt"]),
            "op": pa.array(rows["op"]),
            "arg1": pa.array(rows["arg1"]),
            "arg2": pa.array(rows["arg2"]),
            "arg3": pa.array(rows["arg3"]),
            "expected": pa.array(rows["expected"]),
            "pm_scale": pa.array(rows["pm_scale"], type=pa.float64()),
            "tolerance": pa.array(rows["tolerance"], type=pa.float64()),
        }
    )
