"""Ported Polygon tests (/root/reference/s2/Polygon_test.ts, subset
compatible with the no-ShapeIndex design) + point_measures checks."""

from __future__ import annotations

import math

import numpy as np

from s2js_spark.geometry.loop import Loop
from s2js_spark.geometry.measures import girard_area, point_area
from s2js_spark.geometry.point import Point
from s2js_spark.geometry.polygon import Polygon
from tests.test_loop import parse_point, parse_points
from tests.test_rect import rect_from_degrees, rects_approx_equal

EARTH_RADIUS_KM = 6371.01


def make_loop(s: str) -> Loop:
    return Loop(parse_points(s))


def make_polygon(s: str, normalize: bool = True) -> Polygon:
    loops = []
    if s in ("empty", ""):
        return Polygon(loops)
    for chunk in s.split(";"):
        chunk = chunk.strip()
        if not chunk:
            continue
        loop = make_loop(chunk)
        if normalize and not loop.is_full():
            loop.normalize()
        loops.append(loop)
    return Polygon(loops)


NEAR_POINT = "0:0"
NEAR_LOOP_0 = "-1:0, 0:1, 1:0, 0:-1;"
NEAR_LOOP_1 = "-1:-1, -1:0, -1:1, 0:1, 1:1, 1:0, 1:-1, 0:-1;"
NEAR_LOOP_2 = "-1:-2, -2:5, 5:-2;"
NEAR_LOOP_3 = "-2:-2, -3:6, 6:-3;"
NEAR_LOOP_HEMI = "0:-90, -90:0, 0:90, 90:0;"
SOUTH_LOOP_POINT = "-89.9999:0.001"
SOUTH_LOOP_0A = "-90:0, -89.99:0.01, -89.99:0;"
SOUTH_LOOP_1 = "-90:0, -89.9:0.1, -89.9:-0.1;"
SOUTH_LOOP_HEMI = "0:-180, 0:60, 0:-60;"
FAR_HEMI_SOUTH_HEMI_LOOP = "0:-180, 0:90, -60:90, 0:-90;"
LOOP_CROSS_1 = "-2:1, -1:1, 1:1, 2:1, 2:-1, 1:-1, -1:-1, -2:-1;"
LOOP_CROSS_1_SIDE_HOLE = "-1.5:0.5, -1.2:0.5, -1.2:-0.5, -1.5:-0.5;"
LOOP_CROSS_CENTER_HOLE = "-0.5:0.5, 0.5:0.5, 0.5:-0.5, -0.5:-0.5;"


def test_init_single_loop():
    # Polygon_test.ts:164-169
    assert Polygon([Loop.empty_loop()]).is_empty()
    assert Polygon([Loop.full_loop()]).is_full()
    assert Polygon([make_loop("0:0, 0:10, 10:0")]).num_vertices == 3


def test_empty_full():
    # Polygon_test.ts:171-193
    empty = make_polygon("empty")
    assert empty.n_edges == 0 and empty.is_empty() and not empty.is_full()
    full = Polygon.full_polygon()
    assert full.n_edges == 0 and full.is_full() and not full.is_empty()


def test_init_loop_properties_bounds():
    # Polygon_test.ts:195-208
    p = Polygon(
        [
            make_loop("12.55:-70.05, 12.55:-70.02, 12.58:-70.02, 12.58:-70.05"),
            make_loop("12.56:-70.04, 12.56:-70.03, 12.58:-70.03, 12.58:-70.04"),
        ]
    )
    want = rect_from_degrees(12.55, -70.05, 12.58, -70.02)
    assert rects_approx_equal(p.rect_bound(), want, 1e-6, 1e-6)


def test_parent_last_descendant():
    # Polygon_test.ts:259-286
    full = Polygon.full_polygon()
    assert full.parent(0) == (-1, False)
    assert full.last_descendant(0) == 0
    assert full.last_descendant(-1) == 0


def test_contains_point():
    # Polygon_test.ts:288-304
    cases = [
        (NEAR_LOOP_0, NEAR_POINT),
        (NEAR_LOOP_1, NEAR_POINT),
        (NEAR_LOOP_2, NEAR_POINT),
        (NEAR_LOOP_3, NEAR_POINT),
        (NEAR_LOOP_HEMI, NEAR_POINT),
        (SOUTH_LOOP_0A, SOUTH_LOOP_POINT),
        (SOUTH_LOOP_1, SOUTH_LOOP_POINT),
    ]
    for polygon, point in cases:
        poly = make_polygon(polygon, True)
        pt = parse_point(point)
        assert poly.contains_point(pt), polygon


def test_nested_holes_containment():
    # near01: NEAR_LOOP_0 shell with NEAR_LOOP_1... (ring family
    # nesting; depths assigned by initNested)
    near0231 = make_polygon(NEAR_LOOP_0 + NEAR_LOOP_2 + NEAR_LOOP_3 + NEAR_LOOP_1, True)
    assert near0231.num_loops() == 4
    depths = sorted(l.depth for l in near0231.loops)
    assert depths == [0, 1, 2, 3]


def test_area():
    # Polygon_test.ts:409-432
    assert make_polygon("empty").area() == 0
    assert abs(Polygon.full_polygon().area() - 4 * math.pi) < 1e-10
    assert abs(make_polygon(SOUTH_LOOP_HEMI).area() - 2 * math.pi) < 1e-10
    assert abs(make_polygon(FAR_HEMI_SOUTH_HEMI_LOOP).area() - math.pi) < 1e-10

    have = make_polygon(LOOP_CROSS_1_SIDE_HOLE + LOOP_CROSS_CENTER_HOLE, True)
    want = (
        make_loop("-1.5:0.5, -1.2:0.5, -1.2:-0.5, -1.5:-0.5").area()
        + make_loop("-0.5:0.5, 0.5:0.5, 0.5:-0.5, -0.5:-0.5").area()
    )
    assert abs(have.area() - want) < 1e-10

    have = make_polygon(LOOP_CROSS_1 + LOOP_CROSS_CENTER_HOLE, True)
    want = (
        make_loop("-2:1, -1:1, 1:1, 2:1, 2:-1, 1:-1, -1:-1, -2:-1").area()
        - make_loop("-0.5:0.5, 0.5:0.5, 0.5:-0.5, -0.5:-0.5").area()
    )
    assert abs(have.area() - want) < 1e-10


def test_centroid():
    # Polygon_test.ts:434-459
    assert Polygon().centroid().equals(Point(0.0, 0.0, 0.0))

    have = make_polygon(LOOP_CROSS_1_SIDE_HOLE + LOOP_CROSS_CENTER_HOLE, True)
    want = (
        make_loop("-1.5:0.5, -1.2:0.5, -1.2:-0.5, -1.5:-0.5")
        .centroid()
        .add(make_loop("-0.5:0.5, 0.5:0.5, 0.5:-0.5, -0.5:-0.5").centroid())
    )
    assert have.centroid().cmp(want) == 0

    have = make_polygon(LOOP_CROSS_1 + LOOP_CROSS_CENTER_HOLE, True)
    want = (
        make_loop("-2:1, -1:1, 1:1, 2:1, 2:-1, 1:-1, -1:-1, -2:-1")
        .centroid()
        .sub(make_loop("-0.5:0.5, 0.5:0.5, 0.5:-0.5, -0.5:-0.5").centroid())
    )
    assert have.centroid().cmp(want) == 0


def test_invert():
    # Polygon_test.ts:461-471
    origin = Point.from_latlng_degrees(0, 0)
    pt = Point.from_latlng_degrees(30, 30)
    p = Polygon([Loop.regular_loop(origin, 1000 / EARTH_RADIUS_KM, 100)])
    assert not p.contains_point(pt)
    p.invert()
    assert p.contains_point(pt)


def test_point_area():
    # point_measures_test.ts:24-70
    PZ = Point(0.0, 0.0, 1.0)
    P000 = Point(1.0, 0.0, 0.0)
    P045 = Point(1.0, 1.0, 0.0).normalize()
    P090 = Point(0.0, 1.0, 0.0)
    P180 = Point(-1.0, 0.0, 0.0)
    PR = Point(0.257, -0.5723, 0.112)
    PQ = Point(-0.747, 0.401, 0.2235)
    EPS = 1e-10
    EXP1 = 0.5 * EPS * EPS
    EXP2 = 5.8578643762690495119753e-11

    cases = [
        (P000, P090, PZ, math.pi / 2.0, 0),
        (P045, PZ, P180, 3.0 * math.pi / 4.0, 0),
        (Point(EPS, 0, 1).normalize(), Point(0, EPS, 1).normalize(), PZ, EXP1, 1e-14 * EXP1),
        (PR, PR, PR, 0.0, 0),
        (PR, PQ, PR, 0.0, 1e-15),
        (P000, P045, P090, 0.0, 0),
        (P000, Point(1, 1, EPS).normalize(), P090, EXP2, 1e-9 * EXP2),
    ]
    for a, b, c, want, nearness in cases:
        got = point_area(a, b, c)
        assert abs(got - want) <= max(nearness, 0), (a, b, c, got, want)

    # near-degenerate random triangles stay tiny
    rng = np.random.RandomState(9)
    for _ in range(1000):
        p0 = Point.from_coords(rng.uniform(-1, 1), rng.uniform(-1, 1), rng.uniform(-1, 1))
        d1 = Point.from_coords(rng.uniform(-1, 1), rng.uniform(-1, 1), rng.uniform(-1, 1))
        d2 = Point.from_coords(rng.uniform(-1, 1), rng.uniform(-1, 1), rng.uniform(-1, 1))
        p1 = p0.add(d1.mul(1e-15)).normalize()
        p2 = p0.add(d2.mul(1e-15)).normalize()
        assert point_area(p0, p1, p2) <= 0.7e-30
