"""1-D interval indexes (reference: Index/Bintree/Bintree.cs:24,
Index/IntervalRTree/SortedPackedIntervalRTree.cs:17).

Fresh numpy/Python implementations of the reference's 1-D index roles:

* ``Interval`` — the value object (min/max normalization, centre, width,
  overlap/containment algebra; reference Index/Bintree/Interval.cs).
* ``Bintree`` — incremental binary interval tree: items land on the
  smallest dyadic node containing them (split at node centre), queries
  return a candidate superset exactly like the reference (callers
  re-filter with ``Interval.overlaps``).
* ``SortedPackedIntervalRTree`` — build-once packed binary tree over
  leaves sorted by interval centre, with subtree (min, max) bounds;
  the IndexedPointInAreaLocator-style query structure.  Empty-tree
  queries are safe (reference test SortedPackedIntervalRtreeTest.cs
  TestEmpty, JTS GH #19).

At engine scale these are PER-TASK structures: a `map_batches` stage
builds one per actor/batch over a bounded slice (e.g. the y-intervals of
one tile's edges); nothing here is a cluster-global index.
"""

from __future__ import annotations

import numpy as np


class Interval:
    """Closed 1-D interval; constructor normalizes min/max (reference:
    Index/Bintree/Interval.cs:9)."""

    __slots__ = ("min", "max")

    def __init__(self, v1: float = 0.0, v2: float = 0.0):
        self.init(v1, v2)

    def init(self, v1: float, v2: float) -> None:
        self.min = v1 if v1 <= v2 else v2
        self.max = v2 if v1 <= v2 else v1

    @property
    def width(self) -> float:
        return self.max - self.min

    @property
    def centre(self) -> float:
        return self.min + self.width * 0.5

    def expand_to_include(self, other: "Interval") -> None:
        if other.max > self.max:
            self.max = other.max
        if other.min < self.min:
            self.min = other.min

    def overlaps(self, other: "Interval") -> bool:
        return not (self.min > other.max or self.max < other.min)

    def contains(self, other: "Interval") -> bool:
        return other.min >= self.min and other.max <= self.max

    def __repr__(self) -> str:  # pragma: no cover
        return f"Interval({self.min}, {self.max})"


class _BinNode:
    __slots__ = ("lo", "hi", "items", "sub")

    def __init__(self, lo: float, hi: float):
        self.lo = lo
        self.hi = hi
        self.items: list = []
        self.sub: list = [None, None]  # below-centre / above-centre

    @property
    def centre(self) -> float:
        return (self.lo + self.hi) / 2.0


class Bintree:
    """Incremental 1-D interval tree (reference: Index/Bintree/Bintree.cs:24).

    Items are stored on the smallest node whose interval contains them
    without crossing the node centre; `query` returns every item whose
    node interval overlaps the search interval — a candidate superset,
    as in the reference (exact filtering is the caller's job)."""

    def __init__(self):
        self._root: _BinNode | None = None
        self._count = 0

    def insert(self, interval: Interval, item) -> None:
        lo, hi = float(interval.min), float(interval.max)
        if self._root is None:
            # seed with a power-of-two envelope around the first item
            w = max(hi - lo, 1e-9)
            self._root = _BinNode(lo, lo + 2.0 ** np.ceil(np.log2(w)))
        # expand the root upward until it covers the item
        while not (self._root.lo <= lo and hi <= self._root.hi):
            r = self._root
            w = r.hi - r.lo
            if lo < r.lo:
                parent = _BinNode(r.hi - 2 * w, r.hi)
                parent.sub[1] = r
            else:
                parent = _BinNode(r.lo, r.lo + 2 * w)
                parent.sub[0] = r
            self._root = parent
        node = self._root
        depth = 0
        while depth < 64:
            c = node.centre
            if hi <= c:
                side = 0
                nlo, nhi = node.lo, c
            elif lo >= c:
                side = 1
                nlo, nhi = c, node.hi
            else:
                break  # crosses the centre: lives here
            if node.sub[side] is None:
                node.sub[side] = _BinNode(nlo, nhi)
            node = node.sub[side]
            depth += 1
        node.items.append(item)
        self._count += 1

    @property
    def count(self) -> int:
        return self._count

    @property
    def depth(self) -> int:
        def d(n):
            if n is None:
                return 0
            return 1 + max(d(n.sub[0]), d(n.sub[1]))

        return d(self._root)

    def query(self, interval: Interval) -> list:
        out: list = []
        if self._root is None:
            return out
        lo, hi = float(interval.min), float(interval.max)
        stack = [self._root]
        while stack:
            n = stack.pop()
            if n.lo > hi or n.hi < lo:
                continue
            out.extend(n.items)
            if n.sub[0] is not None:
                stack.append(n.sub[0])
            if n.sub[1] is not None:
                stack.append(n.sub[1])
        return out


class SortedPackedIntervalRTree:
    """Build-once packed interval tree (reference:
    Index/IntervalRTree/SortedPackedIntervalRTree.cs:17): leaves sorted
    by interval centre, implicit binary hierarchy of (min, max) bounds
    queried iteratively.  Safe on an empty index (JTS GH #19)."""

    def __init__(self):
        self._lows: list = []
        self._highs: list = []
        self._items: list = []
        self._built = False

    def insert(self, low: float, high: float, item) -> None:
        if self._built:
            raise RuntimeError("index already built; inserts are build-time only")
        self._lows.append(float(low))
        self._highs.append(float(high))
        self._items.append(item)

    def _build(self) -> None:
        self._built = True
        n = len(self._items)
        self.n = n
        if n == 0:
            return
        lo = np.asarray(self._lows)
        hi = np.asarray(self._highs)
        order = np.argsort((lo + hi) * 0.5, kind="stable")
        self.lo = lo[order]
        self.hi = hi[order]
        self.items = [self._items[i] for i in order]
        # implicit segment-tree bounds over [l, r) leaf ranges
        size = 1
        while size < n:
            size *= 2
        self.size = size
        tmin = np.full(2 * size, np.inf)
        tmax = np.full(2 * size, -np.inf)
        tmin[size : size + n] = self.lo
        tmax[size : size + n] = self.hi
        for i in range(size - 1, 0, -1):
            tmin[i] = min(tmin[2 * i], tmin[2 * i + 1])
            tmax[i] = max(tmax[2 * i], tmax[2 * i + 1])
        self.tmin = tmin
        self.tmax = tmax

    def query(self, lo: float, hi: float, visitor) -> None:
        """Visit every item whose interval overlaps [lo, hi]; `visitor`
        is a callable (the reference's IItemVisitor.VisitItem role)."""
        if not self._built:
            self._build()
        if self.n == 0:
            return
        stack = [1]
        while stack:
            node = stack.pop()
            if self.tmin[node] > hi or self.tmax[node] < lo:
                continue
            if node >= self.size:
                idx = node - self.size
                if idx < self.n:
                    visitor(self.items[idx])
                continue
            stack.append(2 * node)
            stack.append(2 * node + 1)
