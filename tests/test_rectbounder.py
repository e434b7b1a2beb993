"""Ported RectBounder tests (/root/reference/s2/RectBounder_test.ts)
plus cellid bit-pattern spot checks (cellid_extra_test.ts)."""

from __future__ import annotations

import math

import numpy as np

from s2js_spark.geometry import cellid_scalar as cs
from s2js_spark.geometry.interval import R1Interval, S1Interval
from s2js_spark.geometry.latlng import LatLng
from s2js_spark.geometry.loop import RectBounder
from s2js_spark.geometry.point import Point
from s2js_spark.geometry.rect import Rect, VALID_RECT_LAT_RANGE

RECT_ERROR_LAT = 10 * 2.220446049250313e-16
RECT_ERROR_LNG = 2.220446049250313e-16
DBL_EPSILON = 2.220446049250313e-16


def rect_bound_for_points(a: Point, b: Point) -> Rect:
    bounder = RectBounder()
    bounder.add_point(a)
    bounder.add_point(b)
    return bounder.rect_bound()


def _rects_near(a: Rect, b: Rect, lat_err=RECT_ERROR_LAT, lng_err=RECT_ERROR_LNG) -> bool:
    return (
        abs(a.lat.lo - b.lat.lo) <= lat_err
        and abs(a.lat.hi - b.lat.hi) <= lat_err
        and abs(math.remainder(a.lng.lo - b.lng.lo, 2 * math.pi)) <= lng_err
        and abs(math.remainder(a.lng.hi - b.lng.hi, 2 * math.pi)) <= lng_err
    )


def test_max_latitude_simple():
    # RectBounder_test.ts:21-48
    cube_lat = math.asin(1 / math.sqrt(3))
    cube_lat_rect = Rect(
        R1Interval.from_point(-cube_lat).add_point(cube_lat),
        S1Interval.from_endpoints(-math.pi / 4, math.pi / 4),
    )
    for a, b in [
        (Point(1.0, 1.0, 1.0).normalize(), Point(1.0, -1.0, -1.0).normalize()),
        (Point(1.0, -1.0, 1.0).normalize(), Point(1.0, 1.0, -1.0).normalize()),
    ]:
        got = rect_bound_for_points(a, b)
        assert _rects_near(got, cube_lat_rect)


def test_max_latitude_edge_interior():
    # RectBounder_test.ts:50-84
    def pts(p1, p2):
        return Point(*map(float, p1)).normalize(), Point(*map(float, p2)).normalize()

    cases = [
        (math.pi / 4 + 0.5 * RECT_ERROR_LAT,
         rect_bound_for_points(*pts((1, 1, 1), (1, -1, 1))).lat.hi),
        (-math.pi / 4 - 0.5 * RECT_ERROR_LAT,
         rect_bound_for_points(*pts((1, -1, -1), (-1, -1, -1))).lat.lo),
        (math.pi / 4 + 0.5 * RECT_ERROR_LAT,
         rect_bound_for_points(*pts((1, -1, 1), (1, 1, 1))).lat.hi),
        (-math.pi / 4 - 0.5 * RECT_ERROR_LAT,
         rect_bound_for_points(*pts((-1, 1, -1), (-1, -1, -1))).lat.lo),
        (math.pi / 2, rect_bound_for_points(*pts((0.3, 0.4, 1), (-0.3, -0.4, 1))).lat.hi),
        (-math.pi / 2, rect_bound_for_points(*pts((0.3, 0.4, -1), (-0.3, -0.4, -1))).lat.lo),
    ]
    for want, got in cases:
        assert abs(want - got) <= 1e-10, (want, got)


def test_max_latitude_random():
    # RectBounder_test.ts:86-113 (50 iterations)
    rng = np.random.RandomState(47)
    for _ in range(50):
        u = Point.from_coords(rng.uniform(-1, 1), rng.uniform(-1, 1), rng.uniform(-1, 1))
        u = Point(u.x, u.y, DBL_EPSILON * 1e-6 * (1e12 ** rng.uniform())).normalize()
        v = Point.from_coords(0, 0, 1).point_cross(u).normalize()

        a = u.sub(v.mul(rng.uniform())).normalize()
        b = u.add(v.mul(rng.uniform())).normalize()
        ab_bound = rect_bound_for_points(a, b)
        assert abs(u.latitude() - ab_bound.lat.hi) <= RECT_ERROR_LAT


def test_expand_for_subregions():
    # RectBounder_test.ts:115-156
    assert RectBounder.expand_for_subregions(Rect.full()).is_full()
    assert RectBounder.expand_for_subregions(Rect.empty()).is_empty()

    cases = [
        (3e-16, 0, 1e-14, math.pi, True),
        (9e-16, 0, 1e-14, math.pi, False),
        (1e-16, 7e-16, 1e-14, math.pi, True),
        (3e-16, 14e-16, 1e-14, math.pi, False),
        (1e-100, 14e-16, 1e-14, math.pi, True),
        (1e-100, 22e-16, 1e-14, math.pi, False),
        (-math.pi / 2, -1e-15, math.pi / 2 - 7e-16, 0, True),
        (-math.pi / 2, -1e-15, math.pi / 2 - 30e-16, 0, False),
        (-math.pi / 2 + 4e-16, 0, math.pi / 2 - 2e-16, 1e-7, True),
        (-math.pi / 2 + 30e-16, 0, math.pi / 2, 1e-7, False),
        (-math.pi / 2 + 4e-16, 0, math.pi / 2 - 4e-16, math.pi / 2, True),
        (-math.pi / 2, 0, math.pi / 2 - 30e-16, math.pi / 2, False),
        (-math.pi / 2, 0, math.pi / 2 - 1e-8, math.pi - 1e-7, True),
        (-math.pi / 2, 0, math.pi / 2 - 1e-7, math.pi - 1e-7, False),
        (-math.pi / 2 + 1e-12, -math.pi + 1e-4, math.pi / 2, 0, True),
        (-math.pi / 2 + 1e-11, -math.pi + 1e-4, math.pi / 2, 0, True),
    ]
    for x_lat, x_lng, y_lat, y_lng, want_full in cases:
        in_rect = Rect.from_latlng(LatLng(x_lat, x_lng)).add_point(LatLng(y_lat, y_lng))
        got = RectBounder.expand_for_subregions(in_rect)
        assert got.contains(in_rect)
        assert got.is_full() == want_full, (x_lat, x_lng, y_lat, y_lng)

    rect_cases = [
        (1.5, -math.pi / 2, 1.5, math.pi / 2 - 2e-16,
         Rect(R1Interval(1.5, 1.5), S1Interval.full())),
        (1.5, -math.pi / 2, 1.5, math.pi / 2 - 7e-16,
         Rect(R1Interval(1.5, 1.5), S1Interval.from_endpoints(-math.pi / 2, math.pi / 2 - 7e-16))),
        (-math.pi / 2 + 1e-15, 0, -math.pi / 2 + 1e-15, 0,
         Rect(R1Interval(-math.pi / 2, -math.pi / 2 + 1e-15), S1Interval.full())),
        (math.pi / 2 - 1e-15, 0, math.pi / 2 - 1e-15, 0,
         Rect(R1Interval(math.pi / 2 - 1e-15, math.pi / 2), S1Interval.full())),
    ]
    for x_lat, x_lng, y_lat, y_lng, want in rect_cases:
        in_rect = Rect.from_latlng(LatLng(x_lat, x_lng)).add_point(LatLng(y_lat, y_lng))
        got = RectBounder.expand_for_subregions(in_rect)
        assert _rects_near(got, want), (x_lat, x_lng, y_lat, y_lng)


def test_cellid_bit_patterns():
    # cellid_extra_test.ts:6-47 — exhaustive face/level bit layouts
    for face in range(6):
        cid = (face << 61) | 0x1FFFFFFFFFFFFFFF
        assert cs.face(cid) == face
    for level in range(31):
        cid = 1 << (2 * (30 - level))
        assert cs.level(cid) == level

    c1 = 0b0011110000111100001111000011110000000000000000000000000000000000
    assert cs.parent(c1, 9) == 0b0011110000111100001111000000000000000000000000000000000000000000
    assert cs.parent(c1, 5) == 0b0011110000111100000000000000000000000000000000000000000000000000
    assert cs.parent(c1, 1) == 0b0011110000000000000000000000000000000000000000000000000000000000

    c2 = 0b0011110000111100001111000011110000111100001111000011110000111101
    assert cs.parent(c2, 30) == c2
    assert cs.parent(c2, 29) == 0b0011110000111100001111000011110000111100001111000011110000111100
    assert cs.parent(c2, 15) == 0b0011110000111100001111000011110001000000000000000000000000000000
    assert cs.parent(c2, 14) == 0b0011110000111100001111000011110100000000000000000000000000000000
