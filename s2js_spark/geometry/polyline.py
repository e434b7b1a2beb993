"""S2 Polyline (vertex chain region).

Subset of /root/reference/s2/Polyline.ts needed by the engine: bounds,
covering support, projection/interpolation, intersects.
"""

from __future__ import annotations

from .cap import Cap
from .cell import Cell
from .edge_crossings import DO_NOT_CROSS, EdgeCrosser
from .edge_distances import interpolate as _edge_interpolate
from .latlng import LatLng
from .loop import RectBounder
from .point import Point
from .rect import Rect


class Polyline:
    def __init__(self, points: list[Point] | None = None):
        self.points = points or []

    @staticmethod
    def from_latlngs(lls: list[LatLng]) -> "Polyline":
        return Polyline([ll.to_point() for ll in lls])

    def reverse(self) -> None:
        self.points.reverse()

    def num_edges(self) -> int:
        return max(0, len(self.points) - 1)

    def length(self) -> float:
        return sum(
            self.points[i - 1].angle(self.points[i]) for i in range(1, len(self.points))
        )

    def centroid(self) -> Point:
        """Length-scaled true centroid (Polyline.ts:83-93)."""
        import math

        centroid = Point(0.0, 0.0, 0.0)
        for i in range(1, len(self.points)):
            v_sum = self.points[i - 1].add(self.points[i])
            v_diff = self.points[i - 1].sub(self.points[i])
            centroid = centroid.add(
                v_sum.mul(math.sqrt(v_diff.norm2() / v_sum.norm2()))
            )
        return centroid

    def rect_bound(self) -> Rect:
        rb = RectBounder()
        for v in self.points:
            rb.add_point(v)
        return rb.rect_bound()

    def cap_bound(self) -> Cap:
        return self.rect_bound().cap_bound()

    def cell_union_bound(self) -> list[int]:
        return self.cap_bound().cell_union_bound()

    def contains_cell(self, _cell: Cell) -> bool:
        return False

    def intersects_cell(self, cell: Cell) -> bool:
        """(Polyline.ts intersectsCell semantics)."""
        if len(self.points) == 0:
            return False
        for p in self.points:
            if cell.contains_point(p):
                return True
        cell_vertices = [cell.vertex(i) for i in range(4)]
        for j in range(4):
            crosser = EdgeCrosser.new_chain_edge_crosser(
                cell_vertices[j], cell_vertices[(j + 1) & 3], self.points[0]
            )
            for i in range(1, len(self.points)):
                if crosser.chain_crossing_sign(self.points[i]) != DO_NOT_CROSS:
                    return True
        return False

    def contains_point(self, _p: Point) -> bool:
        return False

    def intersects(self, o: "Polyline") -> bool:
        if len(self.points) == 0 or len(o.points) == 0:
            return False
        if not self.rect_bound().intersects(o.rect_bound()):
            return False
        for i in range(1, len(self.points)):
            crosser = EdgeCrosser.new_chain_edge_crosser(
                self.points[i - 1], self.points[i], o.points[0]
            )
            for j in range(1, len(o.points)):
                if crosser.chain_crossing_sign(o.points[j]) != DO_NOT_CROSS:
                    return True
        return False

    def interpolate(self, fraction: float) -> tuple[Point, int]:
        """Point at the given fraction of total length (Polyline.ts:419-462)."""
        if fraction <= 0:
            return self.points[0], 1
        target = fraction * self.length()
        for i in range(1, len(self.points)):
            length = self.points[i - 1].angle(self.points[i])
            if target < length:
                return _edge_interpolate(target / length, self.points[i - 1], self.points[i]), i
            target -= length
        return self.points[-1], len(self.points)

    def uninterpolate(self, point: Point, next_vertex: int) -> float:
        """Inverse of interpolate: the length fraction at which ``point``
        (on edge next_vertex-1 -> next_vertex) sits (Polyline.ts
        uninterpolate tail)."""
        if len(self.points) < 2:
            return 0.0
        total = 0.0
        for i in range(1, next_vertex):
            total += self.points[i - 1].distance(self.points[i])
        length_to_point = total + self.points[next_vertex - 1].distance(point)
        for i in range(next_vertex, len(self.points)):
            total += self.points[i - 1].distance(self.points[i])
        return min(1.0, length_to_point / total)

    def project(self, point: Point) -> tuple[Point, int]:
        """Closest point on the polyline + next vertex index
        (Polyline.ts:323-341)."""
        from .edge_distances import distance_from_segment
        from .edge_distances import project as _project

        if len(self.points) == 1:
            return self.points[0], 1
        min_dist = 10.0
        min_index = -1
        for i in range(1, len(self.points)):
            dist = distance_from_segment(point, self.points[i - 1], self.points[i])
            if dist < min_dist:
                min_dist = dist
                min_index = i
        closest = _project(point, self.points[min_index - 1], self.points[min_index])
        if closest.equals(self.points[min_index]):
            min_index += 1
        return closest, min_index
