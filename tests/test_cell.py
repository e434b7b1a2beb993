"""Ported Cell tests (/root/reference/s2/Cell_test.ts)."""

from __future__ import annotations

import math

import numpy as np

from s2js_spark.geometry import cellid_scalar as cs
from s2js_spark.geometry.cap import Cap
from s2js_spark.geometry.cell import Cell
from s2js_spark.geometry.edge_distances import interpolate
from s2js_spark.geometry.latlng import LatLng
from s2js_spark.geometry.point import Point, get_frame, from_frame

DBL_EPSILON = 2.220446049250313e-16
EPSILON = 1e-15
RNG = np.random.RandomState(41)


def _f64eq(a, b):
    return abs(a - b) <= 1e-10


def test_faces():
    # Cell_test.ts:21-67
    edge_counts: dict[tuple, int] = {}
    vertex_counts: dict[tuple, int] = {}
    for face in range(6):
        cid = cs.from_face(face)
        cell = Cell.from_cellid(cid)
        assert cell.id == cid
        assert cell.face == face
        assert cell.level == 0
        assert cell.orientation == (face & 1)
        assert not cell.is_leaf()
        for k in range(4):
            edge = cell.edge(k)
            vertex = cell.vertex(k)
            ek = (round(edge.x, 12), round(edge.y, 12), round(edge.z, 12))
            vk = (round(vertex.x, 12), round(vertex.y, 12), round(vertex.z, 12))
            edge_counts[ek] = edge_counts.get(ek, 0) + 1
            vertex_counts[vk] = vertex_counts.get(vk, 0) + 1
            assert _f64eq(0.0, cell.vertex(k).dot(cell.edge(k)))
            assert _f64eq(0.0, cell.vertex((k + 1) & 3).dot(cell.edge(k)))
            assert _f64eq(
                1.0,
                cell.vertex(k).cross(cell.vertex((k + 1) & 3)).normalize().dot(cell.edge(k)),
            )
    assert all(v == 2 for v in edge_counts.values())
    assert all(v == 3 for v in vertex_counts.values())


def _test_children(cell: Cell, depth_left: int):
    # Cell_test.ts:75-178 (recursion depth capped for runtime)
    children = cell.children()
    if cell.is_leaf():
        assert children == []
        return
    assert len(children) == 4
    child_id = cs.child_begin(cell.id)
    for i, ci in enumerate(children):
        assert child_id == ci.id
        direct = Cell.from_cellid(child_id)
        center = Point(*cs.to_point(child_id))
        assert ci.center().approx_equal(center, 1e-14)
        assert ci.face == direct.face
        assert ci.level == direct.level
        assert ci.orientation == direct.orientation
        assert ci.center().approx_equal(direct.center(), 1e-14)
        for k in range(4):
            assert ci.vertex(k).approx_equal(direct.vertex(k), 1e-14)
            assert ci.edge(k).approx_equal(direct.edge(k), 1e-14)

        assert cell.contains_cell(ci)
        assert cell.intersects_cell(ci)
        assert not ci.contains_cell(cell)
        assert cell.contains_point(ci.center())
        for j in range(4):
            assert cell.contains_point(ci.vertex(j))
            if j != i:
                assert not ci.contains_point(children[j].center())
                assert not ci.intersects_cell(children[j])

        parent_cap = cell.cap_bound()
        parent_rect = cell.rect_bound()
        if cell.contains_point(Point.from_coords(0, 0, 1)) or cell.contains_point(
            Point.from_coords(0, 0, -1)
        ):
            assert parent_rect.lng.is_full()
        child_cap = ci.cap_bound()
        child_rect = ci.rect_bound()
        assert child_cap.contains_point(ci.center())
        assert child_rect.contains_point(ci.center())
        assert parent_cap.contains_point(ci.center())
        assert parent_rect.contains_point(ci.center())
        for j in range(4):
            assert child_cap.contains_point(ci.vertex(j))
            assert child_rect.contains_point(ci.vertex(j))
            assert parent_cap.contains_point(ci.vertex(j))
            assert parent_rect.contains_point(ci.vertex(j))
            if j != i:
                cap_count = sum(
                    child_cap.contains_point(children[j].vertex(k)) for k in range(4)
                )
                rect_count = sum(
                    child_rect.contains_point(children[j].vertex(k)) for k in range(4)
                )
                assert cap_count <= 2
                if child_rect.lat.lo > -math.pi / 2 and child_rect.lat.hi < math.pi / 2:
                    assert rect_count <= 2

        if depth_left > 0:
            _test_children(ci, depth_left - 1)
        child_id = cs.next_cell(child_id)


def test_children():
    # Cell_test.ts:69-73 (depth 2 instead of 5 for runtime)
    for face in (0, 3, 5):
        _test_children(Cell.from_cellid(cs.from_face(face)), 2)


def test_intersects_cell():
    # Cell_test.ts:220-242
    base = cs.child_begin_at_level(cs.from_face(0), 2)
    assert Cell.from_cellid(base).intersects_cell(Cell.from_cellid(base))
    assert Cell.from_cellid(base).intersects_cell(
        Cell.from_cellid(cs.child_begin_at_level(base, 5))
    )
    assert not Cell.from_cellid(base).intersects_cell(
        Cell.from_cellid(cs.next_cell(base))
    )


def test_contains_cell():
    # Cell_test.ts:244-277
    ci = cs.child_begin_at_level(cs.from_face(0), 2)
    assert Cell.from_cellid(ci).contains_cell(Cell.from_cellid(ci))
    assert Cell.from_cellid(ci).contains_cell(
        Cell.from_cellid(cs.child_begin_at_level(ci, 5))
    )
    assert not Cell.from_cellid(cs.child_begin_at_level(ci, 5)).contains_cell(
        Cell.from_cellid(ci)
    )
    assert not Cell.from_cellid(cs.next_cell(ci)).contains_cell(Cell.from_cellid(ci))
    assert not Cell.from_cellid(ci).contains_cell(Cell.from_cellid(cs.next_cell(ci)))


def test_rect_bound():
    # Cell_test.ts:279-297
    for lat, lng in [(50, 50), (-50, 50), (50, -50), (-50, -50), (0, 0), (0, 180), (0, -179)]:
        c = Cell.from_cellid(cs.from_latlng_degrees(lat, lng))
        rect = c.rect_bound()
        for i in range(4):
            assert rect.contains_latlng(LatLng.from_point(c.vertex(i)))


def test_rect_bound_pole_min_lat():
    # Cell_test.ts:299-327
    assert not Cell.from_cellid(cs.from_face_pos_level(2, 0, 0)).rect_bound().contains_latlng(
        LatLng.from_degrees(3, 0)
    )
    assert Cell.from_cellid(cs.from_face_pos_level(2, 0, 0)).rect_bound().contains_latlng(
        LatLng.from_degrees(50, 0)
    )
    assert not Cell.from_cellid(cs.from_face_pos_level(5, 0, 0)).rect_bound().contains_latlng(
        LatLng.from_degrees(-3, 0)
    )
    assert Cell.from_cellid(cs.from_face_pos_level(5, 0, 0)).rect_bound().contains_latlng(
        LatLng.from_degrees(-50, 0)
    )


def test_cap_bound():
    # Cell_test.ts:329-335
    c = Cell.from_cellid(cs.child_begin_at_level(cs.from_face(0), 20))
    cap = c.cap_bound()
    for i in range(4):
        assert cap.contains_point(c.vertex(i))


def test_contains_point():
    # Cell_test.ts:337-360
    ci = cs.child_begin_at_level(cs.from_face(0), 2)
    assert Cell.from_cellid(ci).contains_point(
        Cell.from_cellid(cs.child_begin_at_level(ci, 5)).vertex(1)
    )
    assert Cell.from_cellid(ci).contains_point(Cell.from_cellid(ci).vertex(1))
    assert not Cell.from_cellid(cs.child_begin_at_level(ci, 5)).contains_point(
        Cell.from_cellid(cs.child_begin_at_level(cs.next_cell(ci), 5)).vertex(1)
    )


def test_contains_point_consistent_with_from_point():
    # Cell_test.ts:362-372 (200 iterations)
    for _ in range(200):
        f = int(RNG.randint(0, 6))
        lvl = int(RNG.randint(0, 31))
        pos = int(RNG.randint(0, 1 << 61, dtype=np.int64))
        cell = Cell.from_cellid(cs.from_face_pos_level(f, pos, lvl))
        i1 = int(RNG.randint(0, 4))
        i2 = (i1 + 1) & 3
        v1 = cell.vertex(i1)
        # sample a point within EPSILON of vertex i2
        frame = get_frame(cell.vertex(i2))
        h = RNG.uniform() * (0.5 * EPSILON)
        theta = 2 * math.pi * RNG.uniform()
        r = math.sqrt(max(0.0, h * (2 - h)))
        v2 = from_frame(
            frame,
            Point(math.cos(theta) * r, math.sin(theta) * r, 1 - h),
        ).normalize()
        p = interpolate(RNG.uniform(), v1, v2)
        assert Cell.from_point(p).contains_point(p)


def test_contains_ambiguous_point():
    # Cell_test.ts:374-378
    p = Point.from_latlng_degrees(-2, 90)
    cell = Cell.from_cellid(cs.parent(cs.from_point(p.x, p.y, p.z), 1))
    assert cell.contains_point(p)
