"""Ported Loop tests (/root/reference/s2/Loop_test.ts)."""

from __future__ import annotations

import math

import pytest

from s2js_spark.geometry import cellid_scalar as cs
from s2js_spark.geometry.cell import Cell
from s2js_spark.geometry.interval import R1Interval, S1Interval
from s2js_spark.geometry.latlng import LatLng
from s2js_spark.geometry.loop import Loop, RectBounder
from s2js_spark.geometry.point import Point
from s2js_spark.geometry.rect import Rect

D = math.pi / 180
EPSILON = 1e-15
DBL_EPSILON = 2.220446049250313e-16


def parse_points(s: str) -> list[Point]:
    out = []
    for chunk in s.split(","):
        chunk = chunk.strip()
        if not chunk:
            continue
        lat, lng = (float(x) for x in chunk.split(":"))
        out.append(Point.from_latlng_degrees(lat, lng))
    return out


def parse_point(s: str) -> Point:
    return parse_points(s)[0]


def rect_from_degrees(lat_lo, lng_lo, lat_hi, lng_hi) -> Rect:
    return Rect(
        R1Interval(lat_lo * D, lat_hi * D),
        S1Interval.from_endpoints(lng_lo * D, lng_hi * D),
    )


north_hemi = Loop(parse_points("0:-180, 0:-90, 0:0, 0:90"))
north_hemi3 = Loop(parse_points("0:-180, 0:-60, 0:60"))
south_hemi = Loop(parse_points("0:90, 0:0, 0:-90, 0:-180"))
west_hemi = Loop(parse_points("0:-180, -90:0, 0:0, 90:0"))
east_hemi = Loop(parse_points("90:0, 0:0, -90:0, 0:-180"))
near_hemi = Loop(parse_points("0:-90, -90:0, 0:90, 90:0"))
far_hemi = Loop(parse_points("90:0, 0:90, -90:0, 0:-90"))
candy_cane = Loop(parse_points("-20:150, -20:-70, 0:70, 10:-150, 10:70, -10:-70"))
small_necw = Loop(parse_points("35:20, 45:20, 40:25"))
arctic80 = Loop(parse_points("80:-150, 80:-30, 80:90"))
antarctic80 = Loop(parse_points("-80:120, -80:0, -80:-120"))
line_triangle = Loop(parse_points("0:1, 0:2, 0:3"))
skinny_chevron = Loop(parse_points("0:0, -1e-320:80, 0:1e-320, 1e-320:80"))
loop_a = Loop(parse_points("0:178, -1:180, 0:-179, 1:-180"))

ALL_LOOPS = [
    north_hemi, north_hemi3, south_hemi, west_hemi, east_hemi, near_hemi,
    far_hemi, candy_cane, small_necw, arctic80, antarctic80, line_triangle,
    skinny_chevron, loop_a,
]


def test_empty_full():
    # Loop_test.ts:180-202
    e = Loop.empty_loop()
    assert e.num_edges() == 0
    assert e.is_empty() and not e.is_full() and e.is_empty_or_full()
    f = Loop.full_loop()
    assert f.num_edges() == 0
    assert f.is_full() and not f.is_empty() and f.is_empty_or_full()


def test_hole_and_sign():
    # Loop_test.ts:221-234
    l = Loop(parse_points("0:-180, 0:-90, 0:0, 0:90"))
    assert not l.is_hole() and l.sign() == 1
    l.depth = 3
    assert l.is_hole() and l.sign() == -1
    l.depth = 2
    assert not l.is_hole() and l.sign() == 1


def _rects_approx_equal(a: Rect, b: Rect, lat_err: float, lng_err: float) -> bool:
    return (
        abs(a.lat.lo - b.lat.lo) <= lat_err
        and abs(a.lat.hi - b.lat.hi) <= lat_err
        and abs(math.remainder(a.lng.lo - b.lng.lo, 2 * math.pi)) <= lng_err
        and abs(math.remainder(a.lng.hi - b.lng.hi, 2 * math.pi)) <= lng_err
    )


def test_rect_bound():
    # Loop_test.ts:236-262
    lat_err, lng_err = 10 * DBL_EPSILON, 1 * DBL_EPSILON

    assert Loop.empty_loop().rect_bound().is_empty()
    assert Loop.full_loop().rect_bound().is_full()
    assert candy_cane.rect_bound().lng.is_full()
    assert candy_cane.rect_bound().lat.lo < -0.349066
    assert candy_cane.rect_bound().lat.hi > 0.174533
    assert small_necw.rect_bound().is_full()

    assert _rects_approx_equal(
        arctic80.rect_bound(), rect_from_degrees(80, -180, 90, 180), lat_err, lng_err
    )
    assert _rects_approx_equal(
        antarctic80.rect_bound(), rect_from_degrees(-90, -180, -80, 180), lat_err, lng_err
    )

    shb = south_hemi.rect_bound()
    assert shb.lng.is_full()
    assert shb.lat.approx_equal(R1Interval(-math.pi / 2, 0), lat_err)

    arctic80_inv = Loop(list(arctic80.vertices))
    arctic80_inv.invert()
    mid = arctic80_inv.vertices[0].add(arctic80_inv.vertices[1]).mul(0.5)
    assert abs(arctic80_inv.rect_bound().lat.hi - mid.latitude()) < 10 * DBL_EPSILON


def test_cap_bound():
    # Loop_test.ts:264-276
    assert Loop.empty_loop().cap_bound().is_empty()
    assert Loop.full_loop().cap_bound().is_full()
    assert small_necw.cap_bound().is_full()
    assert arctic80.cap_bound().approx_equal(rect_from_degrees(80, -180, 90, 180).cap_bound())
    assert antarctic80.cap_bound().approx_equal(
        rect_from_degrees(-90, -180, -80, 180).cap_bound()
    )


def test_origin_inside():
    # Loop_test.ts:278-291
    assert north_hemi.origin_inside
    assert north_hemi3.origin_inside
    assert not south_hemi.origin_inside
    assert not west_hemi.origin_inside
    assert east_hemi.origin_inside
    assert not near_hemi.origin_inside
    assert far_hemi.origin_inside
    assert not candy_cane.origin_inside
    assert small_necw.origin_inside
    assert arctic80.origin_inside
    assert not antarctic80.origin_inside
    assert not loop_a.origin_inside


def _rotate(l: Loop) -> Loop:
    return Loop(l.vertices[1:] + l.vertices[:1])


def test_contains_point():
    # Loop_test.ts:293-349
    north = Point(0.0, 0.0, 1.0)
    south = Point(0.0, 0.0, -1.0)
    east = Point.from_coords(0, 1, 0)
    west = Point.from_coords(0, -1, 0)

    assert not Loop.empty_loop().contains_point(north)
    assert Loop.full_loop().contains_point(south)

    cases = [
        (north_hemi, north, south),
        (south_hemi, south, north),
        (west_hemi, west, east),
        (east_hemi, east, west),
        (candy_cane, Point.from_latlng_degrees(5, 71), Point.from_latlng_degrees(-8, 71)),
    ]
    for loop, p_in, p_out in cases:
        cur = loop
        for _ in range(4):
            assert cur.contains_point(p_in)
            assert not cur.contains_point(p_out)
            cur = _rotate(cur)


def test_cell_ownership_partition():
    """Every cell center/vertex is contained by exactly one cell loop —
    the semi-open vertex model (Loop_test.ts:324-349), levels 0-2."""
    for level in range(3):
        points: dict[tuple, Point] = {}
        loops: list[Loop] = []
        cid = cs.child_begin_at_level(cs.from_face(0), level)
        end = cs.child_end_at_level(cs.from_face(5), level)
        while cid != end:
            cell = Cell.from_cellid(cid)
            c = cell.center()
            points[(c.x, c.y, c.z)] = c
            verts = []
            for k in range(4):
                v = cell.vertex(k)
                points[(v.x, v.y, v.z)] = v
                verts.append(v)
            loops.append(Loop(verts))
            cid = cs.next_cell(cid)
        for p in points.values():
            count = sum(1 for l in loops if l.contains_point(p))
            assert count == 1, (level, p, count)


def test_vertex_wrap():
    # Loop_test.ts:352-374
    assert Loop.empty_loop().vertex(0).equals(Point(0.0, 0.0, 1.0))
    assert Loop.full_loop().vertex(1).equals(Point(0.0, 0.0, -1.0))
    assert arctic80.vertex(2).approx_equal(arctic80.vertex(5), EPSILON)
    thrice = 2 + 3 * len(arctic80.vertices)
    assert arctic80.vertex(2).approx_equal(arctic80.vertex(thrice), EPSILON)


def test_num_edges():
    # Loop_test.ts:376-392
    for loop, want in [
        (Loop.empty_loop(), 0), (Loop.full_loop(), 0), (far_hemi, 4),
        (candy_cane, 6), (small_necw, 3), (arctic80, 3), (antarctic80, 3),
        (line_triangle, 3), (skinny_chevron, 4),
    ]:
        assert loop.num_edges() == want


def test_from_cell_bound():
    # Loop_test.ts:461-469
    cell = Cell.from_cellid(cs.from_latlng_degrees(40.565459, -74.645276))
    loop_from_cell = Loop.from_cell(cell)
    assert not loop_from_cell.rect_bound().contains(cell.rect_bound())


def test_regular_loop():
    # Loop_test.ts:471-475
    loop = Loop.regular_loop(Point.from_latlng_degrees(80, 135), 20 * D, 4)
    assert len(loop.vertices) == 4


def test_area_consistent_with_turning_angle():
    # Loop_test.ts:480-488 (Gauss-Bonnet)
    for i, loop in enumerate(ALL_LOOPS):
        area = loop.area()
        gauss = 2 * math.pi - loop.turning_angle()
        assert abs(area - gauss) <= 1e-9, (i, area, gauss)


def test_area_known_values():
    # hemispheres have area 2*pi
    for hemi in [north_hemi, south_hemi, west_hemi, east_hemi, near_hemi, far_hemi]:
        assert abs(hemi.area() - 2 * math.pi) < 1e-12
    assert abs(arctic80.area() + antarctic80.area() - 4 * math.pi) > 0  # sanity

    # loop relations that avoid shared vertices
    assert north_hemi.contains(arctic80)
    assert not north_hemi.contains(antarctic80)
    assert south_hemi.contains(antarctic80)
    assert not arctic80.intersects(antarctic80)
    assert north_hemi.intersects(candy_cane)
