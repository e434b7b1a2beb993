"""Ported Rect tests (/root/reference/s2/Rect_test.ts)."""

from __future__ import annotations

import math

from s2js_spark.geometry import cellid_scalar as cs
from s2js_spark.geometry.cap import Cap
from s2js_spark.geometry.cell import Cell
from s2js_spark.geometry.interval import R1Interval, S1Interval
from s2js_spark.geometry.latlng import LatLng
from s2js_spark.geometry.point import Point
from s2js_spark.geometry.rect import Rect

D = math.pi / 180
EPSILON = 1e-15


def rect_from_degrees(lat_lo, lng_lo, lat_hi, lng_hi) -> Rect:
    # Matches the reference helper exactly (Rect_test.ts:936-941) —
    # raw degrees * DEGREE, no remainder normalization.
    return Rect(
        R1Interval(lat_lo * D, lat_hi * D),
        S1Interval.from_endpoints(lng_lo * D, lng_hi * D),
    )


def rects_approx_equal(a: Rect, b: Rect, lat_err=EPSILON, lng_err=EPSILON) -> bool:
    return a.lat.approx_equal(b.lat, lat_err) and abs(a.lng.lo - b.lng.lo) <= lng_err and abs(
        a.lng.hi - b.lng.hi
    ) <= lng_err if not (a.is_empty() and b.is_empty()) else True


def test_empty_and_full():
    # Rect_test.ts:19-31
    for rect, valid, empty, full, point in [
        (Rect.empty(), True, True, False, False),
        (Rect.full(), True, False, True, False),
    ]:
        assert rect.is_valid() == valid
        assert rect.is_empty() == empty
        assert rect.is_full() == full
        assert rect.is_point() == point


def test_area():
    # Rect_test.ts:33-43
    assert Rect(R1Interval(0, 0), S1Interval(0, 0)).area() == 0
    assert abs(Rect.full().area() - 4 * math.pi) < 1e-10
    assert abs(
        Rect(R1Interval(0, math.pi / 2), S1Interval(0, math.pi / 2)).area() - math.pi / 2
    ) < 1e-10


def test_from_latlng():
    # Rect_test.ts:50-55
    ll = LatLng.from_degrees(23, 47)
    got = Rect.from_latlng(ll)
    assert got.center() == ll
    assert got.is_point()


def test_from_center_size():
    # Rect_test.ts:57-80
    cases = [
        (LatLng.from_degrees(80, 170), LatLng.from_degrees(40, 60),
         rect_from_degrees(60, 140, 90, -160)),
        (LatLng.from_degrees(10, 40), LatLng.from_degrees(210, 400), Rect.full()),
        (LatLng.from_degrees(-90, 180), LatLng.from_degrees(20, 50),
         rect_from_degrees(-90, 155, -80, -155)),
    ]
    for center, size, want in cases:
        assert rects_approx_equal(Rect.from_center_size(center, size), want)


def test_add_point():
    # Rect_test.ts:82-109
    cases = [
        (Rect(R1Interval.empty(), S1Interval.empty()), LatLng.from_degrees(0, 0),
         rect_from_degrees(0, 0, 0, 0)),
        (rect_from_degrees(0, 0, 0, 0), LatLng(0, -math.pi / 2),
         rect_from_degrees(0, -90, 0, 0)),
        (rect_from_degrees(0, -90, 0, 0), LatLng(math.pi / 4, -math.pi),
         rect_from_degrees(0, -180, 45, 0)),
        (rect_from_degrees(0, -180, 45, 0), LatLng(math.pi / 2, 0),
         rect_from_degrees(0, -180, 90, 0)),
    ]
    for inp, point, want in cases:
        assert rects_approx_equal(inp.add_point(point), want)


def test_vertex():
    # Rect_test.ts:111-123
    r1 = Rect(R1Interval(0, math.pi / 2), S1Interval.from_endpoints(-math.pi, 0))
    assert r1.vertex(0) == LatLng(0, math.pi)
    assert r1.vertex(1) == LatLng(0, 0)
    assert r1.vertex(2) == LatLng(math.pi / 2, 0)
    assert r1.vertex(3) == LatLng(math.pi / 2, math.pi)


def test_vertex_ccw_order():
    # Rect_test.ts:125-144
    from s2js_spark.geometry.predicates import sign

    for i in range(4):
        lat = (math.pi / 4) * (i - 2)
        lng = (math.pi / 2) * (i - 2) + 0.2
        r = Rect(
            R1Interval(lat, lat + math.pi / 4),
            S1Interval(
                math.remainder(lng, 2 * math.pi),
                math.remainder(lng + math.pi / 2, 2 * math.pi),
            ),
        )
        for k in range(4):
            assert sign(
                r.vertex((k - 1) & 3).to_point(),
                r.vertex(k).to_point(),
                r.vertex((k + 1) & 3).to_point(),
            )


def test_contains_latlng():
    # Rect_test.ts:146-173
    r = rect_from_degrees(0, -180, 90, 0)
    assert r.contains_latlng(LatLng.from_degrees(30, -45))
    assert not r.contains_latlng(LatLng.from_degrees(30, 45))
    assert r.contains_latlng(LatLng.from_degrees(0, -180))
    assert r.contains_latlng(LatLng.from_degrees(90, 0))


def test_expanded():
    # Rect_test.ts:175-277
    cases = [
        (rect_from_degrees(70, 150, 80, 170), LatLng.from_degrees(20, 30),
         rect_from_degrees(50, 120, 90, -160)),
        (Rect.empty(), LatLng.from_degrees(20, 30), Rect.empty()),
        (Rect.full(), LatLng.from_degrees(500, 500), Rect.full()),
        (rect_from_degrees(-90, 170, 10, 20), LatLng.from_degrees(30, 80),
         rect_from_degrees(-90, -180, 40, 180)),
        (rect_from_degrees(10, -50, 60, 70), LatLng.from_degrees(-10, -10),
         rect_from_degrees(20, -40, 50, 60)),
        (rect_from_degrees(-20, -180, 20, 180), LatLng.from_degrees(-10, -10),
         rect_from_degrees(-10, -180, 10, 180)),
        (rect_from_degrees(-20, -180, 20, 180), LatLng.from_degrees(-30, -30), Rect.empty()),
        (rect_from_degrees(-90, 10, 90, 11), LatLng.from_degrees(-10, -10), Rect.empty()),
        (rect_from_degrees(-90, 10, 90, 100), LatLng.from_degrees(-10, -10),
         rect_from_degrees(-80, 20, 80, 90)),
        (Rect.empty(), LatLng.from_degrees(-50, -500), Rect.empty()),
        (Rect.full(), LatLng.from_degrees(-50, -50), rect_from_degrees(-40, -180, 40, 180)),
        (rect_from_degrees(10, -50, 60, 70), LatLng.from_degrees(-10, 30),
         rect_from_degrees(20, -80, 50, 100)),
        (rect_from_degrees(-20, -180, 20, 180), LatLng.from_degrees(10, -500),
         rect_from_degrees(-30, -180, 30, 180)),
        (rect_from_degrees(-90, -180, 80, 180), LatLng.from_degrees(-30, 500),
         rect_from_degrees(-60, -180, 50, 180)),
        (rect_from_degrees(-80, -100, 80, 150), LatLng.from_degrees(30, -50),
         rect_from_degrees(-90, -50, 90, 100)),
        (rect_from_degrees(0, -180, 50, 180), LatLng.from_degrees(-30, 500), Rect.empty()),
        (rect_from_degrees(-80, 10, 70, 20), LatLng.from_degrees(30, -200), Rect.empty()),
        (Rect.empty(), LatLng.from_degrees(100, -100), Rect.empty()),
        (Rect.full(), LatLng.from_degrees(100, -100), Rect.full()),
    ]
    for inp, margin, want in cases:
        got = inp.expanded(margin)
        if want.is_empty():
            assert got.is_empty(), (inp, margin)
        else:
            assert rects_approx_equal(got, want), (inp, margin)


def test_polar_closure():
    # Rect_test.ts:279-302
    assert rects_approx_equal(
        rect_from_degrees(-89, 0, 89, 1).polar_closure(), rect_from_degrees(-89, 0, 89, 1)
    )
    assert rects_approx_equal(
        rect_from_degrees(-90, -30, -45, 100).polar_closure(),
        rect_from_degrees(-90, -180, -45, 180),
    )
    assert rects_approx_equal(
        rect_from_degrees(89, 145, 90, 146).polar_closure(),
        rect_from_degrees(89, -180, 90, 180),
    )
    assert rect_from_degrees(-90, -145, 90, -144).polar_closure().is_full()


def test_cap_bound():
    # Rect_test.ts:304-323
    cases = [
        (rect_from_degrees(-45, -45, 45, 45), Cap.from_center_height(Point.from_coords(1, 0, 0), 0.5)),
        (rect_from_degrees(88, -80, 89, 80), Cap.from_center_angle(Point.from_coords(0, 0, 1), 2 * D)),
        (rect_from_degrees(-30, -150, -10, 50), Cap.from_center_angle(Point.from_coords(0, 0, -1), 80 * D)),
    ]
    for r, want in cases:
        assert want.approx_equal(r.cap_bound())


def test_interval_ops():
    # Rect_test.ts:325-420
    rect = rect_from_degrees(0, -180, 90, 0)
    rect_mid = rect_from_degrees(45, -90, 45, -90)
    rect180 = rect_from_degrees(0, -180, 0, -180)
    north_pole = rect_from_degrees(90, 0, 90, 0)
    cases = [
        (rect, rect_mid, True, True, rect, rect_mid),
        (rect, rect180, True, True, rect, rect180),
        (rect, north_pole, True, True, rect, north_pole),
        (rect, rect_from_degrees(-10, -1, 1, 20), False, True,
         rect_from_degrees(-10, 180, 90, 20), rect_from_degrees(0, -1, 1, 0)),
        (rect, rect_from_degrees(-10, -1, 0, 20), False, True,
         rect_from_degrees(-10, 180, 90, 20), rect_from_degrees(0, -1, 0, 0)),
        (rect, rect_from_degrees(-10, 0, 1, 20), False, True,
         rect_from_degrees(-10, 180, 90, 20), rect_from_degrees(0, 0, 1, 0)),
        (rect_from_degrees(-15, -160, -15, -150), rect_from_degrees(20, 145, 25, 155),
         False, False, rect_from_degrees(-15, 145, 25, -150), Rect.empty()),
        (rect_from_degrees(70, -10, 90, -140), rect_from_degrees(60, 175, 80, 5),
         False, True, rect_from_degrees(60, -180, 90, 180), rect_from_degrees(70, 175, 80, 5)),
        (rect_from_degrees(12, 30, 60, 60), rect_from_degrees(0, 0, 30, 18),
         False, False, rect_from_degrees(0, 0, 60, 60), Rect.empty()),
        (rect_from_degrees(0, 0, 18, 42), rect_from_degrees(30, 12, 42, 60),
         False, False, rect_from_degrees(0, 0, 42, 60), Rect.empty()),
    ]
    for r, other, contains, intersects, union, intersection in cases:
        assert r.contains(other) == contains
        assert r.intersects(other) == intersects
        assert r.union(other).equals(union)
        assert r.intersection(other).equals(intersection)


def test_cell_ops():
    # Rect_test.ts:422-542 — exact rect/cell tests incl. curved edges
    cell0 = Cell.from_point(Point.from_coords(1 + 1e-12, 1, 1))
    v0 = LatLng.from_point(cell0.vertex(0))
    cell202 = Cell.from_cellid(cs.from_face_pos_level(2, 0, 2))
    bound202 = cell202.rect_bound()

    cases = [
        (Rect.empty(), Cell.from_cellid(cs.from_face_pos_level(3, 0, 0)), False, False),
        (Rect.full(), Cell.from_cellid(cs.from_face_pos_level(2, 0, 0)), True, True),
        (Rect.full(), Cell.from_cellid(cs.from_face_pos_level(5, 0, 25)), True, True),
        (rect_from_degrees(-45.1, -45.1, 0.1, 0.1),
         Cell.from_cellid(cs.from_face_pos_level(0, 0, 0)), False, True),
        (rect_from_degrees(-45.1, -45.1, 0.1, 0.1),
         Cell.from_cellid(cs.from_face_pos_level(0, 0, 1)), True, True),
        (rect_from_degrees(-45.1, -45.1, 0.1, 0.1),
         Cell.from_cellid(cs.from_face_pos_level(1, 0, 1)), False, False),
        (rect_from_degrees(-10, -45, 10, 0),
         Cell.from_cellid(cs.from_face_pos_level(0, 0, 0)), False, True),
        (rect_from_degrees(-10, -45, 10, 0),
         Cell.from_cellid(cs.from_face_pos_level(0, 0, 1)), False, True),
        (rect_from_degrees(-10, -45, 10, 0),
         Cell.from_cellid(cs.from_face_pos_level(1, 0, 1)), False, False),
        (rect_from_degrees(4, 4, 4, 4), Cell.from_cellid(cs.from_face(0)), False, True),
        (rect_from_degrees(41, -87, 42, -79), Cell.from_cellid(cs.from_face(2)), False, False),
        (rect_from_degrees(-41, 160, -40, -160), Cell.from_cellid(cs.from_face(5)), False, False),
        (rect_from_degrees(
            v0.lat / D - 1e-8, v0.lng / D - 1e-8, v0.lat / D - 2e-10, v0.lng / D + 1e-10
        ), cell0, False, False),
        (rect_from_degrees(-37, -70, -36, -20), Cell.from_cellid(cs.from_face(5)), False, True),
        (rect_from_degrees(
            bound202.lo().lat / D + 3, bound202.lo().lng / D + 3,
            bound202.hi().lat / D - 3, bound202.hi().lng / D - 3,
        ), cell202, False, True),
        (rect_from_degrees(34.2572864, 135.2673642, 34.2707907, 135.2995742),
         Cell.from_cellid(0x6007500000000000), False, True),
    ]
    for r, c, contains, intersects in cases:
        assert r.contains_cell(c) == contains, (r.lat, r.lng, c.id)
        assert r.intersects_cell(c) == intersects, (r.lat, r.lng, c.id)


def test_contains_point():
    # Rect_test.ts:544-555
    r1 = rect_from_degrees(0, -180, 90, 0)
    assert r1.contains_point(Point(0.5, -0.3, 0.1))
    assert not r1.contains_point(Point(0.5, 0.2, 0.1))
