"""ContainsVertexQuery: semi-open-model vertex containment for
polygons with duplicate vertices.

Port of /root/reference/s2/ContainsVertexQuery.ts — tracks edges
entering/leaving the target vertex; exactly one of several polygons
tiling the region around a vertex contains it.
"""

from __future__ import annotations

from .point import Point, ordered_ccw


class ContainsVertexQuery:
    def __init__(self, target: Point):
        self.target = target
        self._edge_map: dict[tuple[float, float, float], int] = {}

    def add_edge(self, v: Point, direction: int) -> None:
        """+1 = outgoing, -1 = incoming, 0 = degenerate."""
        k = (v.x, v.y, v.z)
        self._edge_map[k] = self._edge_map.get(k, 0) + direction

    def contains_vertex(self) -> int:
        """+1 contained, -1 not contained, 0 if all edges are matched
        sibling pairs (ContainsVertexQuery.ts:45-62)."""
        ref_dir = self.target.reference_dir()
        best_point = ref_dir
        best_dir = 0
        for k, v in self._edge_map.items():
            if v == 0:
                continue
            p = Point(*k)
            if ordered_ccw(ref_dir, best_point, p, self.target):
                best_point = p
                best_dir = v
        return best_dir
