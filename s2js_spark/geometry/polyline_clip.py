"""Polyline x polygon clipping: the boundary-producing operator built
on the ported edge machinery (edge clipping, robust crossings, the
stable->exact ``intersection``).

The reference exposes the ingredients (EdgeCrosser
/root/reference/s2/EdgeCrosser.ts, intersection
/root/reference/s2/edge_crossings.ts:116-128, CrossingEdgeQuery
/root/reference/s2/CrossingEdgeQuery.ts) but no assembled clip
operator; this composes them the way its users would: per polyline
edge, find boundary crossings via the cell-bucketed edge index,
compute exact crossing points, split, and keep the sub-arcs whose
midpoints the polygon contains.
"""

from __future__ import annotations

from .edge_bucket_index import CROSSING_TYPE_INTERIOR, CrossingEdgeQuery
from .edge_crossings import intersection
from .point import Point
from .polyline import Polyline


def _interp(a: Point, b: Point, t: float) -> Point:
    """Chord interpolation A + t(B-A), normalized to the sphere.
    Plane-sign tests are scale-invariant, so this parametrization
    sweeps the geodesic arc from A to B monotonically."""
    return Point(
        a.x + t * (b.x - a.x), a.y + t * (b.y - a.y), a.z + t * (b.z - a.z)
    ).normalize()


def _chord_param(a: Point, b: Point, x: Point) -> float:
    """Chord parameter t of the point on arc AB closest to X: project X
    onto the chord direction (exact enough for ORDERING crossing
    points, which is all it is used for)."""
    ab = b.sub(a)
    denom = ab.norm2()
    if denom == 0:
        return 0.0
    # scale X onto the chord's affine line through the arc: the arc
    # point at parameter t is normalize(A + t*AB), so t recovers as
    # the projection of the ray through X onto AB relative to A.
    # Solve (A + t*AB) x X = 0 along the dominant component.
    w = a.cross(x)
    d = ab.cross(x)
    # t = -(A x X)_i / (AB x X)_i for the largest-|.| component of d
    comps_d = (d.x, d.y, d.z)
    comps_w = (w.x, w.y, w.z)
    i = max(range(3), key=lambda k: abs(comps_d[k]))
    if comps_d[i] == 0:
        return 0.0
    return -comps_w[i] / comps_d[i]


def _polygon_crossings(polygon, a: Point, b: Point) -> list[Point]:
    """All proper crossing points of AB with the polygon boundary,
    via the per-loop cell-bucketed CrossingEdgeQuery + the certified
    ``intersection``."""
    queries = getattr(polygon, "_clip_queries", None)
    if queries is None:
        queries = [CrossingEdgeQuery(loop) for loop in polygon.loops]
        try:
            polygon._clip_queries = queries
        except AttributeError:  # pragma: no cover - frozen shapes
            pass
    pts = []
    for q in queries:
        loop = q.shape
        for e in q.crossings(a, b, CROSSING_TYPE_INTERIOR):
            pts.append(intersection(a, b, loop.vertex(e), loop.vertex(e + 1)))
    return pts


def clip_polyline_to_polygon(polyline: Polyline, polygon) -> list[Polyline]:
    """Sub-polylines of ``polyline`` inside ``polygon``.

    Per edge: boundary crossing points (robust sign + stable->exact
    intersection), ordered along the chord; sub-arcs classified by
    their midpoint via the polygon's exact containment; adjacent kept
    sub-arcs stitched across shared endpoints into maximal pieces.
    Degenerate touches (a vertex exactly on the boundary) follow the
    midpoint's side — consistent with the reference's interior
    crossing semantics.
    """
    pieces: list[list[Point]] = []
    current: list[Point] = []

    def flush():
        nonlocal current
        if len(current) >= 2:
            pieces.append(current)
        current = []

    verts = polyline.points
    for i in range(len(verts) - 1):
        a, b = verts[i], verts[i + 1]
        cuts = _polygon_crossings(polygon, a, b)
        ts = sorted({min(1.0, max(0.0, _chord_param(a, b, x))) for x in cuts})
        bounds = [0.0] + [t for t in ts if 0.0 < t < 1.0] + [1.0]
        for j in range(len(bounds) - 1):
            t0, t1 = bounds[j], bounds[j + 1]
            mid = _interp(a, b, 0.5 * (t0 + t1))
            inside = polygon.contains_point(mid)
            p0 = a if t0 == 0.0 else _interp(a, b, t0)
            p1 = b if t1 == 1.0 else _interp(a, b, t1)
            if inside:
                if current and current[-1].distance(p0) < 1e-15:
                    current.append(p1)
                else:
                    flush()
                    current = [p0, p1]
            else:
                flush()
    flush()
    return [Polyline(p) for p in pieces]
