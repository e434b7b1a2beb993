"""Ported robust-predicate tests (/root/reference/s2/predicates_test.ts)."""

from __future__ import annotations

import math

import numpy as np

from s2js_spark.geometry.point import Point, get_frame
from s2js_spark.geometry.predicates import (
    CLOCKWISE,
    COUNTERCLOCKWISE,
    INDETERMINATE,
    exact_sign,
    expensive_sign,
    robust_sign,
    sign,
    stable_sign,
)

EARTH_RADIUS_KM = 6371.01

# Exactly collinear points nearly tangent to the sphere (C is the exact
# midpoint of AB) — predicates_test.ts:56-59.
poA = Point(0.72571927877036835, 0.46058825605889098, 0.51106749730504852)
poB = Point(0.7257192746638208, 0.46058826573818168, 0.51106749441312738)
poC = Point(0.72571927671709457, 0.46058826089853633, 0.51106749585908795)

x1 = Point(0.99999999999999989, 1.4901161193847655e-8, 0.0)
x2 = Point(1.0, 1.4901161193847656e-8, 0.0)
x3 = Point(1.0, 1.0, 1.0).normalize()
x4 = x3.mul(0.99999999999999989)
y0 = Point(1.0, 1.0, 0.0)
y1 = y0.normalize()
y2 = y1.normalize()


def test_sign():
    # predicates_test.ts:25-49
    cases = [
        ([1, 0, 0], [0, 1, 0], [0, 0, 1], True),
        ([0, 1, 0], [0, 0, 1], [1, 0, 0], True),
        ([0, 0, 1], [1, 0, 0], [0, 1, 0], True),
        ([1, 1, 0], [0, 1, 1], [1, 0, 1], True),
        ([-3, -1, 4], [2, -1, -3], [1, -2, 0], True),
        ([-3, -1, 0], [-2, 1, 0], [1, -2, 0], False),
        ([-6, 3, 3], [-4, 2, -1], [-2, 1, 4], False),
        ([0, -1, -1], [0, 1, -2], [0, 2, 1], False),
        ([-1, 2, 7], [2, 1, -4], [4, 2, -8], False),
        ([-4, -2, 7], [2, 1, -4], [4, 2, -8], False),
        ([0, -5, 7], [0, -4, 8], [0, -2, 4], False),
        ([-5, -2, 7], [0, 0, -2], [0, 0, -1], False),
        ([0, -2, 7], [0, 0, 1], [0, 0, 2], False),
    ]
    for p1, p2, p3, want in cases:
        a, b, c = Point(*map(float, p1)), Point(*map(float, p2)), Point(*map(float, p3))
        assert sign(a, b, c) == want
        if want:
            assert sign(c, b, a) == (not want)


def test_robust_sign_equalities():
    # predicates_test.ts:85-104
    assert poC.sub(poA).equals(poB.sub(poC))
    assert x1.equals(x1.normalize())
    assert x2.equals(x2.normalize())
    assert x3.equals(x3.normalize())
    assert x4.equals(x4.normalize())
    assert not x3.equals(x4)
    assert not y1.equals(y2)
    assert y2.equals(y2.normalize())


def test_robust_sign():
    # predicates_test.ts:106-169
    x = Point(1.0, 0.0, 0.0)
    y = Point(0.0, 1.0, 0.0)
    z = Point(0.0, 0.0, 1.0)
    cases = [
        (x, x, z, INDETERMINATE),
        (x, y, y, INDETERMINATE),
        (z, x, z, INDETERMINATE),
        (x, y, z, COUNTERCLOCKWISE),
        (z, y, x, CLOCKWISE),
        (poA, poB, poC, CLOCKWISE),
        (x1, x2, x1.mul(-1.0), COUNTERCLOCKWISE),
        (x3, x4, x3.mul(-1.0), CLOCKWISE),
        (y1, y2, y1.mul(-1.0), COUNTERCLOCKWISE),
    ]
    for p1, p2, p3, want in cases:
        result = robust_sign(p1, p2, p3)
        assert result == want, (p1, p2, p3)
        assert robust_sign(p2, p3, p1) == result
        reversed_want = (
            COUNTERCLOCKWISE if result == CLOCKWISE
            else CLOCKWISE if result == COUNTERCLOCKWISE
            else INDETERMINATE
        )
        assert robust_sign(p3, p2, p1) == reversed_want

    assert robust_sign(poA, poB, poC) != INDETERMINATE
    assert robust_sign(x1, x2, x1.mul(-1)) != INDETERMINATE
    assert robust_sign(x3, x4, x3.mul(-1)) != INDETERMINATE
    assert robust_sign(y1, y2, y1.mul(-1)) != INDETERMINATE


def test_stable_sign_failure_rate():
    # predicates_test.ts:171-215 (300 iterations; stableSign must agree
    # with exactSign whenever it is determinate)
    rng = np.random.RandomState(23)
    iters = 300
    spacing = 1.0
    m = math.tan(spacing / EARTH_RADIUS_KM)
    failures = 0
    for _ in range(iters):
        z = Point.from_coords(rng.uniform(-1, 1), rng.uniform(-1, 1), rng.uniform(-1, 1))
        f = get_frame(z)
        a = Point(f[0][0], f[1][0], f[2][0])
        x = Point(f[0][1], f[1][1], f[2][1])
        b = a.sub(x.mul(m)).normalize()
        c = a.add(x.mul(m)).normalize()
        s = stable_sign(a, b, c)
        if s != INDETERMINATE:
            assert exact_sign(a, b, c, True) == s
        else:
            failures += 1
    assert failures / iters < 0.014


_EXPENSIVE_CASES = [
    ([-3, -1, 0], [-2, 1, 0], [1, -2, 0], COUNTERCLOCKWISE),
    ([-6, 3, 3], [-4, 2, -1], [-2, 1, 4], COUNTERCLOCKWISE),
    ([0, -1, -1], [0, 1, -2], [0, 2, 1], COUNTERCLOCKWISE),
    ([-1, 2, 7], [2, 1, -4], [4, 2, -8], COUNTERCLOCKWISE),
    ([-4, -2, 7], [2, 1, -4], [4, 2, -8], COUNTERCLOCKWISE),
    ([0, -5, 7], [0, -4, 8], [0, -2, 4], COUNTERCLOCKWISE),
    ([-5, -2, 7], [0, 0, -2], [0, 0, -1], COUNTERCLOCKWISE),
    ([0, -2, 7], [0, 0, 1], [0, 0, 2], COUNTERCLOCKWISE),
    ([-3, 1, 7], [-1, -4, 1], [0, 0, 0], COUNTERCLOCKWISE),
    ([-6, -4, 7], [-3, -2, 1], [0, 0, 0], COUNTERCLOCKWISE),
    ([0, -4, 7], [0, -2, 1], [0, 0, 0], CLOCKWISE),
    ([-1, -4, 5], [0, 0, -3], [0, 0, 0], CLOCKWISE),
    ([0, -4, 5], [0, 0, -5], [0, 0, 0], COUNTERCLOCKWISE),
]


def test_expensive_sign_symbolic_perturbation():
    # predicates_test.ts:217-310 + 312-406 — all cases have an exactly
    # zero determinant and are resolved by Simulation of Simplicity.
    for pa, pb, pc, want in _EXPENSIVE_CASES:
        a, b, c = Point(*map(float, pa)), Point(*map(float, pb)), Point(*map(float, pc))
        assert a.cmp(b) == -1
        assert b.cmp(c) == -1
        assert a.dot(b.cross(c)) == 0
        assert expensive_sign(a, b, c) == want
        assert expensive_sign(b, c, a) == want
        assert expensive_sign(c, a, b) == want
        assert expensive_sign(c, b, a) == -want
        assert expensive_sign(b, a, c) == -want
        assert expensive_sign(a, c, b) == -want
