"""Ported ContainsVertexQuery tests
(/root/reference/s2/ContainsVertexQuery_test.ts incl. the
loop-containment consistency check the JS port left commented out)."""

from __future__ import annotations

import math

from s2js_spark.geometry.contains_vertex_query import ContainsVertexQuery
from s2js_spark.geometry.loop import Loop
from s2js_spark.geometry.point import Point
from tests.test_loop import parse_point

D = math.pi / 180


def test_undetermined():
    q = ContainsVertexQuery(parse_point("1:2"))
    q.add_edge(parse_point("3:4"), 1)
    q.add_edge(parse_point("3:4"), -1)
    assert q.contains_vertex() == 0


def test_contained_with_duplicates():
    q = ContainsVertexQuery(parse_point("0:0"))
    q.add_edge(parse_point("3:-3"), -1)
    q.add_edge(parse_point("1:-5"), 1)
    q.add_edge(parse_point("2:-4"), 1)
    q.add_edge(parse_point("1:-5"), -1)
    assert q.contains_vertex() == 1


def test_not_contained_with_duplicates():
    q = ContainsVertexQuery(parse_point("1:1"))
    q.add_edge(parse_point("1:-5"), 1)
    q.add_edge(parse_point("2:-4"), -1)
    q.add_edge(parse_point("3:-3"), 1)
    q.add_edge(parse_point("1:-5"), -1)
    assert q.contains_vertex() == -1


def test_matches_loop_containment():
    # ContainsVertexQuery_test.ts:35-50 (commented out in the JS port
    # because it needs regularLoop; ours works) — 100 vertices
    loop = Loop.regular_loop(parse_point("89:-179"), 10 * D, 100)
    for i in range(1, loop.num_vertices() + 1):
        q = ContainsVertexQuery(loop.vertex(i))
        q.add_edge(loop.vertex(i - 1), -1)
        q.add_edge(loop.vertex(i + 1), 1)
        assert (q.contains_vertex() > 0) == loop.contains_point(loop.vertex(i)), i
