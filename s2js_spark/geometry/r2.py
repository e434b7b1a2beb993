"""Minimal r2 plane geometry (points/rects) used by Cell.

Semantics of /root/reference/r2/Point.ts and /root/reference/r2/Rect.ts.
"""

from __future__ import annotations

from dataclasses import dataclass

from .interval import R1Interval


@dataclass(frozen=True)
class R2Point:
    x: float
    y: float

    # r2/Point.ts vector algebra
    def add(self, o: "R2Point") -> "R2Point":
        return R2Point(self.x + o.x, self.y + o.y)

    def sub(self, o: "R2Point") -> "R2Point":
        return R2Point(self.x - o.x, self.y - o.y)

    def mul(self, m: float) -> "R2Point":
        return R2Point(m * self.x, m * self.y)

    def ortho(self) -> "R2Point":
        return R2Point(-self.y, self.x)

    def dot(self, o: "R2Point") -> float:
        return self.x * o.x + self.y * o.y

    def cross(self, o: "R2Point") -> float:
        return self.x * o.y - self.y * o.x

    def norm(self) -> float:
        import math

        return math.hypot(self.x, self.y)

    def normalize(self) -> "R2Point":
        n = self.norm()
        if n == 0:
            return R2Point(0.0, 0.0)
        return self.mul(1 / n)


@dataclass
class R2Rect:
    x: R1Interval
    y: R1Interval

    @staticmethod
    def empty() -> "R2Rect":
        return R2Rect(R1Interval.empty(), R1Interval.empty())

    @staticmethod
    def from_points(*pts: R2Point) -> "R2Rect":
        xs = [p.x for p in pts]
        ys = [p.y for p in pts]
        return R2Rect(R1Interval(min(xs), max(xs)), R1Interval(min(ys), max(ys)))

    def is_empty(self) -> bool:
        return self.x.is_empty()

    def center(self) -> R2Point:
        return R2Point(self.x.center(), self.y.center())

    def vertices(self) -> list[R2Point]:
        """CCW order starting from lower-left (r2/Rect.ts vertices)."""
        return [
            R2Point(self.x.lo, self.y.lo),
            R2Point(self.x.hi, self.y.lo),
            R2Point(self.x.hi, self.y.hi),
            R2Point(self.x.lo, self.y.hi),
        ]

    def vertex_ij(self, i: int, j: int) -> R2Point:
        """Vertex at (i,j) of {0=lo,1=hi} x {0=lo,1=hi} (r2/Rect.ts:51)."""
        return R2Point(
            self.x.hi if i == 1 else self.x.lo,
            self.y.hi if j == 1 else self.y.lo,
        )

    def contains_point(self, p: R2Point) -> bool:
        return self.x.contains(p.x) and self.y.contains(p.y)

    def intersects(self, o: "R2Rect") -> bool:
        return self.x.intersects(o.x) and self.y.intersects(o.y)

    def intersection(self, o: "R2Rect") -> "R2Rect":
        xx = self.x.intersection(o.x)
        yy = self.y.intersection(o.y)
        if xx.is_empty() or yy.is_empty():
            return R2Rect.empty()
        return R2Rect(xx, yy)

    def expanded_by_margin(self, margin: float) -> "R2Rect":
        xx = self.x.expanded(margin)
        yy = self.y.expanded(margin)
        if xx.is_empty() or yy.is_empty():
            return R2Rect.empty()
        return R2Rect(xx, yy)
