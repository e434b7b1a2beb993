"""Port of /root/reference/s2/edge_crossings_test.ts 'edge util
intersection error' (seeded; 1200 iterations instead of 5000 for CI
time) plus property checks on the stable/exact ladder."""

from __future__ import annotations

import math
import random

from s2js_spark.geometry.edge_crossings import (
    CROSS,
    EdgeCrosser,
    INTERSECTION_ERROR,
    intersection,
    intersection_exact,
    intersection_stable,
)
from s2js_spark.geometry.edge_distances import distance_from_segment
from s2js_spark.geometry.point import Point

DBL_EPSILON = 2.220446049250313e-16
DISTANCE_ABS_ERROR = 3 * DBL_EPSILON

rng = random.Random(77)


def _random_point() -> Point:
    return Point(
        rng.uniform(-1, 1), rng.uniform(-1, 1), rng.uniform(-1, 1)
    ).normalize()


def _random_frame() -> tuple[Point, Point, Point]:
    z = _random_point()
    x = z.cross(_random_point()).normalize()
    y = z.cross(x).normalize()
    return x, y, z


def _test_intersection_exact(a0, a1, b0, b1) -> Point:
    x = intersection_exact(a0, a1, b0, b1)
    if x.dot(a0.add(a1).add(b0.add(b1))) < 0:
        x = x.mul(-1)
    return x


def test_intersection_error():
    max_point_dist = 0.0
    max_edge_dist = 0.0
    for _ in range(1200):
        p, d1, d2 = _random_frame()

        slope = 1e-15 * math.pow(1e30, rng.random())
        d2 = d1.add(d2.mul(slope)).normalize()

        while True:
            ab_len = math.pow(1e-15, rng.random())
            cd_len = math.pow(1e-15, rng.random())
            a_fraction = math.pow(1e-5, rng.random())
            if rng.random() < 0.5:
                a_fraction = 1 - a_fraction
            c_fraction = math.pow(1e-5, rng.random())
            if rng.random() < 0.5:
                c_fraction = 1 - c_fraction
            a = p.sub(d1.mul(a_fraction * ab_len)).normalize()
            b = p.add(d1.mul((1 - a_fraction) * ab_len)).normalize()
            c = p.sub(d2.mul(c_fraction * cd_len)).normalize()
            d = p.add(d2.mul((1 - c_fraction) * cd_len)).normalize()
            if EdgeCrosser(a, b).crossing_sign(c, d) == CROSS:
                break

        assert distance_from_segment(p, a, b) <= 1.5 * DBL_EPSILON + DISTANCE_ABS_ERROR
        assert distance_from_segment(p, c, d) <= 1.5 * DBL_EPSILON + DISTANCE_ABS_ERROR

        expected = _test_intersection_exact(a, b, c, d)
        assert distance_from_segment(expected, a, b) <= 3 * DBL_EPSILON + DISTANCE_ABS_ERROR
        assert distance_from_segment(expected, c, d) <= 3 * DBL_EPSILON + DISTANCE_ABS_ERROR
        assert expected.distance(p) <= 3 * DBL_EPSILON / slope + INTERSECTION_ERROR

        actual = intersection(a, b, c, d)
        dist_ab = distance_from_segment(actual, a, b)
        dist_cd = distance_from_segment(actual, c, d)
        point_dist = expected.distance(actual)
        assert dist_ab <= INTERSECTION_ERROR + DISTANCE_ABS_ERROR
        assert dist_cd <= INTERSECTION_ERROR + DISTANCE_ABS_ERROR
        assert point_dist <= INTERSECTION_ERROR

        max_edge_dist = max(max_edge_dist, dist_ab, dist_cd)
        max_point_dist = max(max_point_dist, point_dist)


def test_intersection_symmetry_properties():
    """intersection(b,a,c,d) == intersection(a,b,d,c) ==
    intersection(a,b,c,d); intersection(c,d,a,b) == same
    (edge_crossings.ts:111-114)."""
    for _ in range(200):
        p, d1, d2 = _random_frame()
        a = p.sub(d1.mul(1e-4)).normalize()
        b = p.add(d1.mul(1e-4)).normalize()
        c = p.sub(d2.mul(1e-4)).normalize()
        d = p.add(d2.mul(1e-4)).normalize()
        if EdgeCrosser(a, b).crossing_sign(c, d) != CROSS:
            continue
        x = intersection(a, b, c, d)
        for alt in (
            intersection(b, a, c, d),
            intersection(a, b, d, c),
            intersection(c, d, a, b),
        ):
            assert x.distance(alt) <= INTERSECTION_ERROR


def test_intersection_stable_reference_quirk():
    """The TS reference's stable rung can never certify: its
    EPSILON (1e-15) exceeds INTERSECTION_ERROR (8.9e-16), so the
    (maxError - EPSILON) acceptance threshold is negative and every
    call escalates to exact arithmetic (edge_crossings.ts:19 vs :7 —
    the C++ original subtracts DBL_ERR instead). We port the reference
    behavior faithfully; results are still correct, via the exact
    rung."""
    a = Point.from_latlng_degrees(0.0, -1.0)
    b = Point.from_latlng_degrees(0.0, 1.0)
    c = Point.from_latlng_degrees(-1.0, 0.0)
    d = Point.from_latlng_degrees(1.0, 0.0)
    _pt, ok = intersection_stable(a, b, c, d)
    assert not ok  # reference parity: the stable rung never certifies
    x = intersection(a, b, c, d)
    # crossing of the equator and the prime meridian
    assert x.distance(Point(1, 0, 0)) <= INTERSECTION_ERROR
