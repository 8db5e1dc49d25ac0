"""KdTree with snap-to-existing tolerance (reference: Index/KdTree/
KdTree.cs:31, KdNode.cs, KdTreeExtensions.cs NearestNeighbor).

The 2-d tree alternates x/y splits per level; inserting within
`tolerance` of an existing node snaps to the BEST (closest) match and
increments its count instead of creating a new node — the vertex
snap-dedup role used by snapping noders and point consolidation.
"""

from __future__ import annotations

import math


class KdNode:
    __slots__ = ("x", "y", "data", "count", "left", "right")

    def __init__(self, x: float, y: float, data=None):
        self.x = float(x)
        self.y = float(y)
        self.data = data
        self.count = 1
        self.left = None
        self.right = None

    @property
    def coordinate(self):
        return (self.x, self.y)

    @property
    def is_repeated(self) -> bool:
        return self.count > 1

    def distance(self, x: float, y: float) -> float:
        return math.hypot(self.x - x, self.y - y)


class KdTree:
    """reference: Index/KdTree/KdTree.cs:31."""

    def __init__(self, tolerance: float = 0.0):
        self.root: KdNode | None = None
        self.tolerance = float(tolerance)
        self._n_nodes = 0

    # -- insertion --------------------------------------------------------
    def insert(self, pt, data=None) -> KdNode:
        x, y = float(pt[0]), float(pt[1])
        if self.root is None:
            self.root = KdNode(x, y, data)
            self._n_nodes = 1
            return self.root
        if self.tolerance > 0:
            match = self._best_match(x, y)
            if match is not None:
                match.count += 1
                return match
        return self._insert_exact(x, y, data)

    def _best_match(self, x: float, y: float) -> KdNode | None:
        """Closest existing node within tolerance (reference:
        KdTree.FindBestMatchNode / BestMatchVisitor)."""
        tol = self.tolerance
        env = (x - tol, y - tol, x + tol, y + tol)
        best = [None, tol]  # node, min distance (first match wins on ties)

        def visit(node):
            d = node.distance(x, y)
            if d <= tol and (best[0] is None or d < best[1]):
                best[0] = node
                best[1] = d

        self._query_node(self.root, env, 0, visit)
        return best[0]

    def _insert_exact(self, x: float, y: float, data) -> KdNode:
        node = self.root
        level = 0
        while True:
            if node.x == x and node.y == y:
                node.count += 1
                return node
            if level % 2 == 0:
                less = x < node.x
            else:
                less = y < node.y
            if less:
                if node.left is None:
                    node.left = KdNode(x, y, data)
                    self._n_nodes += 1
                    return node.left
                node = node.left
            else:
                if node.right is None:
                    node.right = KdNode(x, y, data)
                    self._n_nodes += 1
                    return node.right
                node = node.right
            level += 1

    # -- queries ----------------------------------------------------------
    def query(self, env) -> list[KdNode]:
        """All nodes inside (minx, miny, maxx, maxy)."""
        out: list[KdNode] = []
        if self.root is not None:
            self._query_node(self.root, tuple(map(float, env)), 0, out.append)
        return out

    def _query_node(self, node, env, level, visit) -> None:
        minx, miny, maxx, maxy = env
        if level % 2 == 0:
            search_left = minx < node.x
            search_right = maxx >= node.x
        else:
            search_left = miny < node.y
            search_right = maxy >= node.y
        if node.left is not None and search_left:
            self._query_node(node.left, env, level + 1, visit)
        if minx <= node.x <= maxx and miny <= node.y <= maxy:
            visit(node)
        if node.right is not None and search_right:
            self._query_node(node.right, env, level + 1, visit)

    def nearest_neighbor(self, pt) -> KdNode | None:
        """reference: KdTreeExtensions.NearestNeighbor — branch and bound
        with split-plane pruning."""
        if self.root is None:
            return None
        x, y = float(pt[0]), float(pt[1])
        best = [None, math.inf]

        def search(node, level):
            if node is None:
                return
            d = node.distance(x, y)
            if d < best[1]:
                best[0] = node
                best[1] = d
            split = node.x if level % 2 == 0 else node.y
            q = x if level % 2 == 0 else y
            near, far = (node.left, node.right) if q < split else (node.right, node.left)
            search(near, level + 1)
            if abs(q - split) < best[1]:
                search(far, level + 1)

        search(self.root, 0)
        return best[0]

    # -- stats -------------------------------------------------------------
    @property
    def count(self) -> int:
        return self._n_nodes

    @property
    def depth(self) -> int:
        def d(node):
            if node is None:
                return 0
            return 1 + max(d(node.left), d(node.right))

        return d(self.root)

    def is_empty(self) -> bool:
        return self.root is None
