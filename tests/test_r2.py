"""Ported r2.Point tests (/root/reference/r2/Point_test.ts)."""

from __future__ import annotations

import math

from s2js_spark.geometry.r2 import R2Point as P

MAX_FLOAT32 = 2**127 * (2 - 1 / 2**23)


def test_add_sub_mul():
    assert P(1, 1).add(P(4, 3)) == P(5, 4)
    assert P(-4, 7).add(P(1, 5)) == P(-3, 12)
    assert P(1, 1).sub(P(4, 3)) == P(-3, -2)
    assert P(-4, 7).sub(P(1, 5)) == P(-5, 2)
    assert P(1, 1).mul(5) == P(5, 5)


def test_ortho():
    assert P(0, 1).ortho() == P(-1, 0)
    assert P(1, 1).ortho() == P(-1, 1)
    assert P(-4, 7).ortho() == P(-7, -4)
    assert P(1, math.sqrt(3)).ortho() == P(-math.sqrt(3), 1)


def test_dot_cross():
    assert P(1, 1).dot(P(4, 3)) == 7
    assert P(-4, 7).dot(P(1, 5)) == 31
    assert P(1, 1).cross(P(-1, -1)) == 0
    assert P(1, 1).cross(P(4, 3)) == -1
    assert P(1, 5).cross(P(-2, 3)) == 13


def test_norm():
    assert P(3, 4).norm() == 5
    assert P(3, -4).norm() == 5
    assert P(2, 2).norm() == 2 * math.sqrt(2)
    assert P(1, math.sqrt(3)).norm() == 2
    assert P(1, 1e15).norm() == 1e15
    # hypot is overflow-safe (r2/Point_test.ts:62)
    assert P(1e14, MAX_FLOAT32 - 1).norm() == MAX_FLOAT32


def test_normalize():
    assert P(0, 0).normalize() == P(0, 0)
    assert P(0, 1).normalize() == P(0, 1)
    assert P(-1, 0).normalize() == P(-1, 0)
    n = P(3, 4).normalize()
    assert abs(n.x - 0.6) < 1e-12 and abs(n.y - 0.8) < 1e-12
    n = P(1e21, 1e21 * math.sqrt(3)).normalize()
    assert abs(n.x - 0.5) < 1e-12 and abs(n.y - math.sqrt(3) / 2) < 1e-12
    n = P(1e4, MAX_FLOAT32 - 1).normalize()
    assert abs(n.x) < 1e-12 and abs(n.y - 1) < 1e-12
