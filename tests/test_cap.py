"""Ported Cap tests (/root/reference/s2/Cap_test.ts)."""

from __future__ import annotations

import math

import numpy as np

from s2js_spark.geometry import angle as ca
from s2js_spark.geometry import cellid_scalar as cs
from s2js_spark.geometry.cap import Cap
from s2js_spark.geometry.cell import Cell, face_uv_to_xyz, unit_norm
from s2js_spark.geometry.latlng import LatLng
from s2js_spark.geometry.metric import MIN_WIDTH_METRIC
from s2js_spark.geometry.point import Point

DEGREE = math.pi / 180
EPSILON = 1e-15
DBL_EPSILON = 2.220446049250313e-16
TINY_RAD = 1e-10

X_AXIS_PT = Point(1.0, 0.0, 0.0)
Y_AXIS_PT = Point(0.0, 1.0, 0.0)
x_axis = Cap.from_point(X_AXIS_PT)
y_axis = Cap.from_point(Y_AXIS_PT)
x_comp = x_axis.complement()
hemi = Cap.from_center_height(Point.from_coords(1, 0, 1), 1)
tiny = Cap.from_center_angle(Point.from_coords(1, 2, 3), TINY_RAD)

concave_center = Point.from_latlng_degrees(80, 10)
concave_radius = ca.chord_from_angle(150 * DEGREE)
max_cap_error = (
    ca.chord_max_point_error(concave_radius)
    + ca.chord_max_angle_error(concave_radius)
    + 3 * DBL_EPSILON
)
concave = Cap(concave_center, concave_radius)
concave_min = Cap(concave_center, ca.chord_expanded(concave_radius, -max_cap_error))
concave_max = Cap(concave_center, ca.chord_expanded(concave_radius, max_cap_error))


def test_basic_empty_full_valid():
    # Cap_test.ts:52-73
    cases = [
        (Cap(Point(0.0, 0.0, 0.0), 0.0), False, False, False),
        (Cap.empty(), True, False, True),
        (Cap.empty().complement(), False, True, True),
        (Cap.full(), False, True, True),
        (Cap.full().complement(), True, False, True),
        (x_comp, False, True, True),
        (x_comp.complement(), True, False, True),
        (tiny, False, False, True),
        (concave, False, False, True),
        (hemi, False, False, True),
    ]
    for cap, empty, full, valid in cases:
        assert cap.is_empty() == empty
        assert cap.is_full() == full
        assert cap.is_valid() == valid


def test_center_height_radius():
    # Cap_test.ts:75-91
    assert Cap.full().height() == 2.0
    assert abs(ca.degrees(Cap.full().radius()) - 180.0) == 0
    assert y_axis.height() == 0.0
    assert x_axis.height() == 0.0
    assert x_axis.radius() == 0.0
    hc = hemi.center.mul(-1.0)
    assert hc.approx_equal(hemi.complement().center, 1e-14)
    assert hemi.height() == 1.0


def test_contains():
    # Cap_test.ts:93-117
    cases = [
        (Cap.empty(), Cap.empty(), True),
        (Cap.full(), Cap.empty(), True),
        (Cap.full(), Cap.full(), True),
        (Cap.empty(), x_axis, False),
        (Cap.full(), x_axis, True),
        (x_axis, Cap.full(), False),
        (x_axis, x_axis, True),
        (x_axis, Cap.empty(), True),
        (hemi, tiny, True),
        (hemi, Cap.from_center_angle(X_AXIS_PT, math.pi / 4 - EPSILON), True),
        (hemi, Cap.from_center_angle(X_AXIS_PT, math.pi / 4 + EPSILON), False),
        (concave, hemi, True),
        (concave, Cap.from_center_height(concave.center.mul(-1.0), 0.1), False),
    ]
    for c1, c2, want in cases:
        assert c1.contains(c2) == want


def test_contains_point():
    # Cap_test.ts:119-141
    tangent = tiny.center.cross(Point(3.0, 2.0, 1.0)).normalize()
    cases = [
        (x_axis, X_AXIS_PT, True),
        (x_axis, Point(1.0, 1e-20, 0.0), False),
        (y_axis, x_axis.center, False),
        (x_comp, x_axis.center, True),
        (x_comp.complement(), x_axis.center, False),
        (tiny, tiny.center.add(tangent.mul(TINY_RAD * 0.99)), True),
        (tiny, tiny.center.add(tangent.mul(TINY_RAD * 1.01)), False),
        (hemi, Point.from_coords(1, 0, -(1 - EPSILON)), True),
        (hemi, X_AXIS_PT, True),
        (hemi.complement(), X_AXIS_PT, False),
        (concave_max, Point.from_latlng_degrees(-70 * (1 - EPSILON), 10), True),
        (concave_min, Point.from_latlng_degrees(-70 * (1 + EPSILON), 10), False),
        (concave_max, Point.from_latlng_degrees(-50 * (1 - EPSILON), -170), True),
        (concave_min, Point.from_latlng_degrees(-50 * (1 + EPSILON), -170), False),
    ]
    for c, p, want in cases:
        assert c.contains_point(p) == want


def test_interior_intersects():
    # Cap_test.ts:143-163
    cases = [
        (Cap.empty(), Cap.empty(), False),
        (Cap.empty(), x_axis, False),
        (Cap.full(), Cap.empty(), False),
        (Cap.full(), Cap.full(), True),
        (Cap.full(), x_axis, True),
        (x_axis, Cap.full(), False),
        (x_axis, x_axis, False),
        (x_axis, Cap.empty(), False),
        (concave, hemi.complement(), True),
    ]
    for c1, c2, want in cases:
        assert c1.interior_intersects(c2) == want


def test_cell_union_bound_level1_radius():
    # Cap_test.ts:169-179
    c = Cap.from_center_angle(Point.from_coords(1, 1, 1), MIN_WIDTH_METRIC.value(1))
    assert len(c.cell_union_bound()) == 3


def test_expanded():
    # Cap_test.ts:181-191
    cap50 = Cap.from_center_angle(X_AXIS_PT, 50.0 * DEGREE)
    cap51 = Cap.from_center_angle(X_AXIS_PT, 51.0 * DEGREE)
    assert Cap.empty().expanded(2.0).is_empty()
    assert Cap.full().expanded(2.0).is_full()
    assert cap50.expanded(0).approx_equal(cap50)
    assert cap50.expanded(1 * DEGREE).approx_equal(cap51)
    assert not cap50.expanded(129.99 * DEGREE).is_full()
    assert cap50.expanded(130.01 * DEGREE).is_full()


def test_radius_to_height():
    # Cap_test.ts:193-225
    cases = [
        (-0.5, -1.0), (0.0, 0.0), (math.pi, 2.0), (2 * math.pi, 2.0),
        (-7.0 * DEGREE, -1.0), (12.0 * DEGREE, 0.0218523992661943),
        (30.0 * DEGREE, 0.1339745962155613), (45.0 * DEGREE, 0.2928932188134525),
        (90.0 * DEGREE, 0.9999999999999998), (179.99 * DEGREE, 1.9999999847691292),
        (180.0 * DEGREE, 2.0), (270.0 * DEGREE, 2.0),
        (-1.0, -1.0), (1.0, 0.45969769413186), (math.pi / 2.0, 1.0),
        (2.0, 1.4161468365471424), (3.0, 1.9899924966004454), (4.0, 2.0),
    ]
    for r, want in cases:
        assert abs(Cap.radius_to_height(r) - want) <= EPSILON, r


def test_rect_bound():
    # Cap_test.ts:227-298
    eps = 1e-13
    cases = [
        (Cap.from_center_angle(Point.from_latlng_degrees(-45, 57), 50 * DEGREE),
         -90, 5, -180, 180, True),
        (Cap.from_center_angle(Point.from_coords(1, 0, 1), math.pi / 4 + 1e-16),
         0, 90, -180, 180, True),
        (Cap.from_center_angle(Point.from_coords(1, 0, 1), (45 + 5e-15) * DEGREE),
         0, 90, -180, 180, True),
        (Cap.from_center_angle(Point(0.0, 1.0, 0.0), math.pi / 2 + 2e-16),
         -90, 90, -180, 180, True),
        (Cap.from_center_angle(Point.from_latlng_degrees(0, 50), 20 * DEGREE),
         -20, 20, 30, 70, False),
        (Cap.from_center_angle(Point.from_latlng_degrees(90, 123), 10 * DEGREE),
         80, 90, -180, 180, True),
    ]
    for cap, lat_lo, lat_hi, lng_lo, lng_hi, is_full in cases:
        r = cap.rect_bound()
        assert abs(r.lat.lo / DEGREE - lat_lo) <= eps
        assert abs(r.lat.hi / DEGREE - lat_hi) <= eps
        assert abs(r.lng.lo / DEGREE - lng_lo) <= eps
        assert abs(r.lng.hi / DEGREE - lng_hi) <= eps
        assert r.lng.is_full() == is_full
    assert Cap.empty().rect_bound().is_empty()
    assert Cap.full().rect_bound().is_full()


def test_add_point():
    # Cap_test.ts:300-332
    cases = [
        (x_axis, X_AXIS_PT, x_axis),
        (y_axis, Y_AXIS_PT, y_axis),
        (x_axis, Point(-1.0, 0.0, 0.0), Cap.full()),
        (y_axis, Point(0.0, -1.0, 0.0), Cap.full()),
        (x_axis, Point(0.0, 0.0, 1.0), Cap.from_center_angle(X_AXIS_PT, math.pi / 2)),
        (x_axis, Point(0.0, 0.0, -1.0), Cap.from_center_angle(X_AXIS_PT, math.pi / 2)),
        (hemi, Point.from_coords(0, 1, -1),
         Cap.from_center_angle(Point(1.0, 0.0, 1.0), 120.0 * DEGREE)),
        (hemi, Point.from_coords(0, -1, -1),
         Cap.from_center_angle(Point(1.0, 0.0, 1.0), 120.0 * DEGREE)),
        (hemi, Point.from_coords(-1, -1, -1),
         Cap.from_center_angle(Point(1.0, 0.0, 1.0), math.acos(-math.sqrt(2.0 / 3.0)))),
        (hemi, Point(0.0, 1.0, 1.0), hemi),
        (hemi, Point(1.0, 0.0, 0.0), hemi),
    ]
    for have, p, want in cases:
        got = Cap(have.center, have.rad).add_point(p)
        assert got.approx_equal(want)
        assert got.contains_point(p)


def test_add_cap():
    # Cap_test.ts:334-352
    cases = [
        (Cap.empty(), Cap.empty(), Cap.empty()),
        (Cap.full(), Cap.full(), Cap.full()),
        (Cap.full(), Cap.empty(), Cap.full()),
        (Cap.empty(), Cap.full(), Cap.full()),
        (x_axis, Cap.empty(), x_axis),
        (Cap.empty(), x_axis, x_axis),
        (y_axis, Cap.empty(), y_axis),
        (Cap.empty(), y_axis, y_axis),
        (x_axis, x_comp, Cap.full()),
        (x_axis, y_axis, Cap.from_center_angle(X_AXIS_PT, math.pi / 2)),
    ]
    for have, other, want in cases:
        got = Cap(have.center, have.rad).add_cap(other)
        assert got.approx_equal(want)


def test_contains_cell_intersects_cell():
    # Cap_test.ts:354-487 (full matrix over faces)
    face_radius = math.atan(math.sqrt(2))
    for face in range(6):
        root_cell = Cell.from_cellid(cs.from_face(face))
        edge_p = face_uv_to_xyz(face, 0, 1 - EPSILON).normalize()
        corner_p = face_uv_to_xyz(face, 1 - EPSILON, 1 - EPSILON).normalize()
        edge_cell = Cell.from_point(edge_p)
        corner_cell = Cell.from_point(corner_p)

        assert Cap.full().contains_cell(root_cell)
        assert not Cap.empty().intersects_cell(root_cell)

        first = cs.advance(corner_cell.id, -3)
        cid = first
        for _ in range(7):
            c = Cell.from_cellid(cid).cap_bound()
            assert c.contains_cell(corner_cell) == (cid == corner_cell.id)
            assert c.intersects_cell(corner_cell) == cs.contains(
                cs.immediate_parent(cid), corner_cell.id
            )
            cid = cs.next_cell(cid)

        anti_face = (face + 3) % 6
        for cap_face in range(6):
            center = unit_norm(cap_face)
            covering = Cap.from_center_angle(center, face_radius + EPSILON)
            assert covering.contains_cell(root_cell) == (cap_face == face)
            edge_center = Point(*cs.to_point(edge_cell.id))
            assert covering.contains_cell(edge_cell) == (center.dot(edge_center) > 0.1)
            assert covering.contains_cell(edge_cell) == covering.intersects_cell(edge_cell)
            assert covering.contains_cell(corner_cell) == (cap_face == face)
            assert covering.intersects_cell(root_cell) == (cap_face != anti_face)
            corner_center = Point(*cs.to_point(corner_cell.id))
            assert covering.intersects_cell(corner_cell) == (center.dot(corner_center) > 0)

            bulging = Cap.from_center_angle(center, math.pi / 4 + EPSILON)
            assert not bulging.contains_cell(root_cell)
            assert bulging.contains_cell(edge_cell) == (cap_face == face)
            assert not bulging.contains_cell(corner_cell)
            assert bulging.intersects_cell(root_cell) == (cap_face != anti_face)
            assert bulging.intersects_cell(edge_cell) == (center.dot(edge_center) > 0.1)
            assert not bulging.intersects_cell(corner_cell)

            singleton = Cap.from_center_angle(center, 0)
            assert singleton.intersects_cell(root_cell) == (cap_face == face)
            assert not singleton.intersects_cell(edge_cell)
            assert not singleton.intersects_cell(corner_cell)


def test_centroid():
    # Cap_test.ts:489-501
    assert Cap.empty().centroid().approx_equal(Point(0.0, 0.0, 0.0), 1e-14) or Cap.empty().centroid().equals(Point(0.0, 0.0, 0.0))
    assert Cap.full().centroid().norm() <= 1e-15
    rng = np.random.RandomState(17)
    for _ in range(100):
        center = Point.from_coords(rng.uniform(-1, 1), rng.uniform(-1, 1), rng.uniform(-1, 1))
        height = rng.uniform(0.0, 2.0)
        c = Cap.from_center_height(center, height)
        got = c.centroid()
        want = center.mul((1.0 - height / 2.0) * c.area())
        assert got.sub(want).norm() <= 1e-15


def test_union():
    # Cap_test.ts:503-564
    a = Cap.from_center_angle(Point.from_latlng_degrees(50.0, 10.0), 0.2 * DEGREE)
    b = Cap.from_center_angle(Point.from_latlng_degrees(50.0, 10.0), 0.3 * DEGREE)
    assert b.contains(a)
    assert b.approx_equal(a.union(b))
    assert a.union(Cap.full()).is_full()
    assert a.union(Cap.empty()).approx_equal(a)

    c = Cap.from_center_angle(Point.from_latlng_degrees(51.0, 11.0), 1.5 * DEGREE)
    assert c.contains(a)
    assert a.union(c).center.approx_equal(c.center)
    assert abs(a.union(c).radius() - c.radius()) <= 1e-10

    d = Cap.from_center_angle(Point.from_latlng_degrees(51.0, 11.0), 0.1 * DEGREE)
    assert not d.contains(a)
    assert not d.intersects(a)
    assert a.union(d).approx_equal(d.union(a))
    assert abs(LatLng.from_point(a.union(d).center).lat / DEGREE - 50.4588) <= 0.001
    assert abs(LatLng.from_point(a.union(d).center).lng / DEGREE - 10.4525) <= 0.001
    assert abs(a.union(d).radius() / DEGREE - 0.7425) <= 0.001

    e = Cap.from_center_angle(Point.from_latlng_degrees(50.3, 10.3), 0.2 * DEGREE)
    assert not e.contains(a)
    assert e.intersects(a)
    assert a.union(e).approx_equal(e.union(a))
    assert abs(LatLng.from_point(a.union(e).center).lat / DEGREE - 50.15) <= 0.001
    assert abs(LatLng.from_point(a.union(e).center).lng / DEGREE - 10.1495) <= 0.001
    assert abs(a.union(e).radius() / DEGREE - 0.3781) <= 0.001

    p1 = Point(0.0, 0.0, 1.0)
    p2 = Point(0.0, 1.0, 0.0)
    f = Cap.from_center_angle(p1, 150 * DEGREE)
    g = Cap.from_center_angle(p2, 150 * DEGREE)
    assert f.union(g).is_full()
    hemi2 = Cap.from_center_height(p1, 1)
    assert hemi2.union(hemi2.complement()).is_full()


def test_equal():
    # Cap_test.ts:566-584
    cases = [
        (Cap.empty(), Cap.empty(), True),
        (Cap.empty(), Cap.full(), False),
        (Cap.full(), Cap.full(), True),
        (Cap.from_center_angle(Point.from_coords(0, 0, 1), 150 * DEGREE),
         Cap.from_center_angle(Point.from_coords(0, 0, 1), 151 * DEGREE), False),
        (x_axis, x_axis, True),
        (x_axis, y_axis, False),
        (x_comp, x_axis.complement(), True),
    ]
    for a, b, want in cases:
        assert a.equals(b) == want
