"""Quadtree spatial index (reference: Index/Quadtree/Quadtree.cs:29,
Root.cs, Node.cs, NodeBase.cs, Key.cs).

An origin-rooted MX-CIF quadtree for envelopes: each item is stored in
the smallest power-of-2-keyed node that contains its envelope; items
whose envelope crosses a split line stay at the parent (so queries are
candidate-supersets, exactly like the reference).  Zero-extent insert
envelopes are padded by the running minimum extent heuristic."""

from __future__ import annotations

import math


def _pow2_ceil(v: float) -> float:
    """Smallest power of two >= v (reference: Quadtree/DoubleBits powers)."""
    if v <= 0:
        return 0.0
    return 2.0 ** math.ceil(math.log2(v))


class _Node:
    """A square node keyed to the power-of-2 grid (reference: Node.cs)."""

    __slots__ = ("minx", "miny", "size", "items", "sub")

    def __init__(self, minx: float, miny: float, size: float):
        self.minx = minx
        self.miny = miny
        self.size = size
        self.items: list = []
        self.sub: list = [None, None, None, None]  # SW, SE, NW, NE

    @property
    def env(self):
        return (self.minx, self.miny, self.minx + self.size, self.miny + self.size)

    def contains(self, e) -> bool:
        x0, y0, x1, y1 = self.env
        return e[0] >= x0 and e[2] <= x1 and e[1] >= y0 and e[3] <= y1

    def intersects(self, e) -> bool:
        x0, y0, x1, y1 = self.env
        return not (e[2] < x0 or e[0] > x1 or e[3] < y0 or e[1] > y1)

    def _quadrant(self, e) -> int:
        """Quadrant wholly containing e, or -1 if it crosses a split line."""
        cx = self.minx + self.size / 2
        cy = self.miny + self.size / 2
        if e[2] <= cx:
            qx = 0
        elif e[0] >= cx:
            qx = 1
        else:
            return -1
        if e[3] <= cy:
            qy = 0
        elif e[1] >= cy:
            qy = 1
        else:
            return -1
        return qy * 2 + qx

    def insert(self, e, item, min_size: float) -> None:
        q = -1
        if self.size > min_size:
            q = self._quadrant(e)
        if q < 0:
            self.items.append((e, item))
            return
        if self.sub[q] is None:
            half = self.size / 2
            self.sub[q] = _Node(
                self.minx + (q % 2) * half, self.miny + (q // 2) * half, half
            )
        self.sub[q].insert(e, item, min_size)

    def query(self, e, visit) -> None:
        if not self.intersects(e):
            return
        for ie, item in self.items:
            if not (ie[2] < e[0] or ie[0] > e[2] or ie[3] < e[1] or ie[1] > e[3]):
                visit(item)
        for s in self.sub:
            if s is not None:
                s.query(e, visit)

    def remove(self, e, item) -> bool:
        if not self.intersects(e):
            return False
        for i, (ie, it) in enumerate(self.items):
            if it is item or it == item:
                del self.items[i]
                return True
        for s in self.sub:
            if s is not None and s.remove(e, item):
                return True
        return False

    def depth(self) -> int:
        return 1 + max((s.depth() for s in self.sub if s is not None), default=0)

    def count(self) -> int:
        return len(self.items) + sum(s.count() for s in self.sub if s is not None)


class Quadtree:
    """reference: Index/Quadtree/Quadtree.cs:29.

    Items kept at the root list are those crossing the origin axes
    (reference Root.cs keeps them on the root node)."""

    def __init__(self):
        self._root_items: list = []
        self._quads: dict[tuple[int, int], _Node] = {}  # quadrant sign -> node
        self._min_extent = 1.0

    @staticmethod
    def _ensure_extent(e, min_extent: float):
        x0, y0, x1, y1 = (float(v) for v in e)
        if x0 != x1 and y0 != y1:
            return (x0, y0, x1, y1)
        d = min_extent / 2.0
        if x0 == x1:
            x0 -= d
            x1 += d
        if y0 == y1:
            y0 -= d
            y1 += d
        return (x0, y0, x1, y1)

    def insert(self, env, item) -> None:
        e = tuple(float(v) for v in env)
        dx = e[2] - e[0]
        dy = e[3] - e[1]
        if 0 < dx < self._min_extent:
            self._min_extent = dx
        if 0 < dy < self._min_extent:
            self._min_extent = dy
        e = self._ensure_extent(e, self._min_extent)
        # quadrant around the origin; envelopes crossing an axis stay at root
        if (e[0] < 0 < e[2]) or (e[1] < 0 < e[3]):
            self._root_items.append((e, item))
            return
        sx = 0 if e[0] >= 0 else 1
        sy = 0 if e[1] >= 0 else 1
        size = _pow2_ceil(max(abs(e[0]), abs(e[2]), abs(e[1]), abs(e[3]), 1.0))
        key = (sx, sy)
        node = self._quads.get(key)
        if node is None or node.size < size:
            grown = _Node(-size if sx else 0.0, -size if sy else 0.0, size)
            if node is not None:
                # the old quadrant square is always the origin-corner
                # sub-square of the grown one: descend toward the origin
                # corner, creating the chain, and attach it
                q = (1 if sy else 0) * 2 + (1 if sx else 0)
                cur = grown
                while cur.size / 2 > node.size:
                    half = cur.size / 2
                    sub = _Node(
                        cur.minx + (q % 2) * half, cur.miny + (q // 2) * half, half
                    )
                    cur.sub[q] = sub
                    cur = sub
                cur.sub[q] = node
            self._quads[key] = grown
            node = grown
        node.insert(e, item, self._min_extent)

    def query(self, env) -> list:
        if env is None:
            return []
        e = tuple(float(v) for v in env)
        out: list = []
        for ie, item in self._root_items:
            if not (ie[2] < e[0] or ie[0] > e[2] or ie[3] < e[1] or ie[1] > e[3]):
                out.append(item)
        for node in self._quads.values():
            node.query(e, out.append)
        return out

    def remove(self, env, item) -> bool:
        e = self._ensure_extent(tuple(float(v) for v in env), self._min_extent)
        for i, (ie, it) in enumerate(self._root_items):
            if it is item or it == item:
                del self._root_items[i]
                return True
        for node in self._quads.values():
            if node.remove(e, item):
                return True
        return False

    @property
    def count(self) -> int:
        return len(self._root_items) + sum(n.count() for n in self._quads.values())

    @property
    def depth(self) -> int:
        return max((n.depth() for n in self._quads.values()), default=0)

    def is_empty(self) -> bool:
        return self.count == 0
