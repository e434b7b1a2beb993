"""Edge crossing tests and the chained EdgeCrosser.

Semantics of /root/reference/s2/edge_crossings.ts and
/root/reference/s2/EdgeCrosser.ts. These are the exactness core of
point-in-polygon and loop-relation tests.
"""

from __future__ import annotations

import math

from .point import Point, ordered_ccw
from .predicates import (
    DBL_EPSILON,
    INDETERMINATE,
    expensive_sign,
    robust_sign,
    triage_sign,
)

# Crossing kinds (edge_crossings.ts:14-16)
CROSS = 0
MAYBE_CROSS = 1
DO_NOT_CROSS = 2


def vertex_crossing(a: Point, b: Point, c: Point, d: Point) -> bool:
    """Shared-vertex crossing parity rule (edge_crossings.ts:69-84)."""
    if a.equals(b) or c.equals(d):
        return False
    if a.equals(c):
        return b.equals(d) or ordered_ccw(a.reference_dir(), d, b, a)
    if b.equals(d):
        return ordered_ccw(b.reference_dir(), c, a, b)
    if a.equals(d):
        return b.equals(c) or ordered_ccw(a.reference_dir(), c, b, a)
    if b.equals(c):
        return ordered_ccw(b.reference_dir(), d, a, b)
    return False


def angle_contains_vertex(a: Point, b: Point, c: Point) -> bool:
    """Tiling-exact vertex ownership (edge_crossings.ts:270-272)."""
    return not ordered_ccw(b.reference_dir(), c, a, b)


class EdgeCrosser:
    """Stateful crossing tester for a fixed edge AB (EdgeCrosser.ts:26-229)."""

    __slots__ = ("a", "b", "a_xb", "a_tangent", "b_tangent", "c", "acb")

    def __init__(self, a: Point, b: Point):
        norm = a.point_cross(b)
        self.a = a
        self.b = b
        self.a_xb = a.cross(b)
        self.a_tangent = a.cross(norm)
        self.b_tangent = norm.cross(b)
        self.c = Point(0.0, 0.0, 0.0)
        self.acb = CROSS

    @staticmethod
    def new_chain_edge_crosser(a: Point, b: Point, c: Point) -> "EdgeCrosser":
        e = EdgeCrosser(a, b)
        e.restart_at(c)
        return e

    def restart_at(self, c: Point) -> None:
        self.c = c
        self.acb = -triage_sign(self.a, self.b, self.c)

    def crossing_sign(self, c: Point, d: Point) -> int:
        if not c.equals(self.c):
            self.restart_at(c)
        return self.chain_crossing_sign(d)

    def edge_or_vertex_crossing(self, c: Point, d: Point) -> bool:
        if not c.equals(self.c):
            self.restart_at(c)
        return self.edge_or_vertex_chain_crossing(d)

    def chain_crossing_sign(self, d: Point) -> int:
        bda = triage_sign(self.a, self.b, d)
        if self.acb == -bda and bda != INDETERMINATE:
            self.c = d
            self.acb = -bda
            return DO_NOT_CROSS
        return self._crossing_sign(d, bda)

    def edge_or_vertex_chain_crossing(self, d: Point) -> bool:
        c = Point(self.c.x, self.c.y, self.c.z)
        s = self.chain_crossing_sign(d)
        if s == DO_NOT_CROSS:
            return False
        if s == CROSS:
            return True
        return vertex_crossing(self.a, self.b, c, d)

    def _crossing_sign(self, d: Point, bda: int) -> int:
        max_error = (1.5 + 1 / math.sqrt(3)) * DBL_EPSILON

        # Tangent-plane quick reject (EdgeCrosser.ts:157-182).
        if (self.c.dot(self.a_tangent) > max_error and d.dot(self.a_tangent) > max_error) or (
            self.c.dot(self.b_tangent) > max_error and d.dot(self.b_tangent) > max_error
        ):
            self.c = d
            self.acb = -bda
            return DO_NOT_CROSS

        if self.a.equals(self.c) or self.a.equals(d) or self.b.equals(self.c) or self.b.equals(d):
            self.c = d
            self.acb = -bda
            return MAYBE_CROSS

        if self.a.equals(self.b) or self.c.equals(d):
            self.c = d
            self.acb = -bda
            return DO_NOT_CROSS

        if self.acb == INDETERMINATE:
            self.acb = -expensive_sign(self.a, self.b, self.c)
        if bda == INDETERMINATE:
            bda = expensive_sign(self.a, self.b, d)

        if bda != self.acb:
            self.c = d
            self.acb = -bda
            return DO_NOT_CROSS

        cbd = -robust_sign(self.c, d, self.b)
        if cbd != self.acb:
            self.c = d
            self.acb = -bda
            return DO_NOT_CROSS

        dac = robust_sign(self.c, d, self.a)
        if dac != self.acb:
            self.c = d
            self.acb = -bda
            return DO_NOT_CROSS

        self.c = d
        self.acb = -bda
        return CROSS


def crossing_sign(a: Point, b: Point, c: Point, d: Point) -> int:
    """Edge AB x edge CD (edge_crossings.ts:39-42)."""
    crosser = EdgeCrosser.new_chain_edge_crosser(a, b, c)
    return crosser.chain_crossing_sign(d)


def edge_or_vertex_crossing(a: Point, b: Point, c: Point, d: Point) -> bool:
    """PIP-compatible crossing test (edge_crossings.ts:93-102)."""
    s = crossing_sign(a, b, c, d)
    if s == DO_NOT_CROSS:
        return False
    if s == CROSS:
        return True
    return vertex_crossing(a, b, c, d)
