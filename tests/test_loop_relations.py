"""Loop x loop relation semantics: shared-vertex wedge cases (the
reference's ContainsRelation / IntersectsRelation /
CompareBoundaryRelation), and bucketed-candidate vs brute parity on
loops large enough to take the indexed path."""

from __future__ import annotations

import math
import random

import pytest

from s2js_spark.geometry.edge_bucket_index import candidate_pairs, edge_cells
from s2js_spark.geometry.loop import Loop
from s2js_spark.geometry.point import Point

rng = random.Random(31337)


def _loop_from_latlngs(pts):
    return Loop([Point.from_latlng_degrees(lat, lng) for lat, lng in pts])


def _regular(lat, lng, radius_deg, n):
    return Loop(
        Point.regular_points(
            Point.from_latlng_degrees(lat, lng), math.radians(radius_deg), n
        )
    )


# --------------------------------------------------------- wedge semantics

def test_shared_edge_interior_disjoint():
    """Two squares sharing a full edge: neither contains the other,
    and (per the wedge model) they do not intersect."""
    left = _loop_from_latlngs([(0, 0), (0, 10), (10, 10), (10, 0)])
    right = _loop_from_latlngs([(0, -10), (0, 0), (10, 0), (10, -10)])
    assert not left.contains(right)
    assert not right.contains(left)
    assert not left.intersects(right)
    assert not right.intersects(left)


def test_shared_vertex_touching_diagonal():
    """Two squares touching only at one corner vertex."""
    a = _loop_from_latlngs([(0, 0), (0, 10), (10, 10), (10, 0)])
    b = _loop_from_latlngs([(-10, -10), (-10, 0), (0, 0), (0, -10)])
    assert not a.contains(b)
    assert not a.intersects(b)
    assert not b.intersects(a)


def test_loop_contains_itself_and_sub_loop_sharing_vertices():
    """A loop contains an identical copy; a big square contains a
    smaller one that SHARES two vertices with it (wedge containment at
    the shared vertices, no proper crossings)."""
    sq = _loop_from_latlngs([(0, 0), (0, 10), (10, 10), (10, 0)])
    sq2 = _loop_from_latlngs([(0, 0), (0, 10), (10, 10), (10, 0)])
    assert sq.contains(sq2) and sq2.contains(sq)
    assert sq.intersects(sq2)

    # triangle cut from the square's corner, sharing vertices (0,0),(0,10)
    tri = _loop_from_latlngs([(0, 0), (0, 10), (5, 5)])
    assert sq.contains(tri)
    assert not tri.contains(sq)
    assert sq.intersects(tri) and tri.intersects(sq)


def test_overlapping_squares_cross():
    a = _loop_from_latlngs([(0, 0), (0, 10), (10, 10), (10, 0)])
    b = _loop_from_latlngs([(5, 5), (5, 15), (15, 15), (15, 5)])
    assert not a.contains(b) and not b.contains(a)
    assert a.intersects(b) and b.intersects(a)


def test_nested_disjoint_basic():
    outer = _regular(40, 40, 10, 16)
    inner = _regular(40, 40, 3, 16)
    far = _regular(-40, -40, 3, 16)
    assert outer.contains(inner)
    assert not inner.contains(outer)
    assert outer.intersects(inner)
    assert not outer.intersects(far) and not outer.contains(far)


# ------------------------------------------------ bucketed path (big loops)

def test_bucketed_path_matches_brute_on_big_loops():
    """Loops big enough that n*m exceeds the brute limit: relation
    results must equal the brute double-loop results."""
    configs = [
        # overlapping rings
        (_regular(10, 10, 5, 96), _regular(12, 12, 5, 80)),
        # nested
        (_regular(10, 10, 8, 96), _regular(10, 10, 2, 80)),
        # disjoint but bound-overlapping (concentric thin crescents)
        (_regular(10, 10, 8, 96), _regular(10, 25, 5, 80)),
    ]
    for a, b in configs:
        assert len(a.vertices) * len(b.vertices) > Loop._BRUTE_PAIR_LIMIT

        def brute_relation(x, y, wedges_cross):
            saved = Loop._BRUTE_PAIR_LIMIT
            Loop._BRUTE_PAIR_LIMIT = 10**12
            try:
                return x._crossing_relation(y, wedges_cross)
            finally:
                Loop._BRUTE_PAIR_LIMIT = saved

        from s2js_spark.geometry.loop import wedge_intersects

        got = a._crossing_relation(b, wedge_intersects)
        want = brute_relation(a, b, wedge_intersects)
        assert got == want
        # and the public relations agree with bound-independent truths
        assert a.intersects(b) == b.intersects(a)


def test_candidate_pairs_superset_of_crossing_pairs():
    """Every properly-crossing edge pair must appear among bucket
    candidates (soundness of the pruning)."""
    from s2js_spark.geometry.edge_crossings import CROSS, crossing_sign

    a = _regular(0, 0, 6, 64)
    b = _regular(2, 3, 6, 48)
    cand = candidate_pairs(a, b)
    for i in range(len(a.vertices)):
        for j in range(len(b.vertices)):
            if (
                crossing_sign(
                    a.vertex(i), a.vertex(i + 1), b.vertex(j), b.vertex(j + 1)
                )
                == CROSS
            ):
                assert (i, j) in cand


def test_edge_cells_cover_both_endpoints_and_crossing_point():
    """edge_cells must cover the whole edge: its endpoints' cells are
    always included."""
    from s2js_spark.geometry import cellid_scalar as cs

    for _ in range(50):
        lat1, lng1 = rng.uniform(-80, 80), rng.uniform(-179, 179)
        lat2 = lat1 + rng.uniform(-5, 5)
        lng2 = lng1 + rng.uniform(-5, 5)
        a = Point.from_latlng_degrees(lat1, lng1)
        b = Point.from_latlng_degrees(lat2, lng2)
        level = rng.randint(4, 12)
        cells = edge_cells(a, b, level)
        assert cells
        ca = cs.parent(cs.from_point(a.x, a.y, a.z), level)
        cb = cs.parent(cs.from_point(b.x, b.y, b.z), level)
        assert ca in cells and cb in cells


def test_compare_boundary_shared_edge():
    """compareBoundary via the CompareBoundaryRelation wedge state."""
    from s2js_spark.geometry.polygon import _loop_compare_boundary

    sq = _loop_from_latlngs([(0, 0), (0, 10), (10, 10), (10, 0)])
    inner = _loop_from_latlngs([(2, 2), (2, 8), (8, 8), (8, 2)])
    outside = _loop_from_latlngs([(20, 20), (20, 30), (30, 30), (30, 20)])
    crossing = _loop_from_latlngs([(5, 5), (5, 15), (15, 15), (15, 5)])
    assert _loop_compare_boundary(sq, inner) == 1
    assert _loop_compare_boundary(sq, outside) == -1
    assert _loop_compare_boundary(sq, crossing) == 0
    # shared-edge neighbor: boundary of the neighbor is NOT contained
    right = _loop_from_latlngs([(0, -10), (0, 0), (10, 0), (10, -10)])
    assert _loop_compare_boundary(sq, right) == -1


def test_crossing_edge_query_matches_brute():
    """CrossingEdgeQuery candidates+crossings vs a brute scan over all
    edges, for interior-only and ALL crossing types."""
    from s2js_spark.geometry.edge_bucket_index import (
        CROSSING_TYPE_ALL,
        CROSSING_TYPE_INTERIOR,
        CrossingEdgeQuery,
    )
    from s2js_spark.geometry.edge_crossings import (
        CROSS,
        MAYBE_CROSS,
        EdgeCrosser,
    )

    loop = _regular(5, 5, 8, 64)
    q = CrossingEdgeQuery(loop)
    for _ in range(40):
        lat1, lng1 = rng.uniform(-6, 16), rng.uniform(-6, 16)
        lat2, lng2 = rng.uniform(-6, 16), rng.uniform(-6, 16)
        a = Point.from_latlng_degrees(lat1, lng1)
        b = Point.from_latlng_degrees(lat2, lng2)
        crosser = EdgeCrosser(a, b)
        brute_cross = [
            e
            for e in range(len(loop.vertices))
            if crosser.crossing_sign(loop.vertex(e), loop.vertex(e + 1)) == CROSS
        ]
        brute_all = [
            e
            for e in range(len(loop.vertices))
            if crosser.crossing_sign(loop.vertex(e), loop.vertex(e + 1))
            in (CROSS, MAYBE_CROSS)
        ]
        assert q.crossings(a, b, CROSSING_TYPE_INTERIOR) == brute_cross
        assert q.crossings(a, b, CROSSING_TYPE_ALL) == brute_all
