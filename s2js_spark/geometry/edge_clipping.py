"""Edge clipping: geodesic edges against cube faces and 2D rectangles.

Port of /root/reference/s2/edge_clipping.ts:26-510 with its certified
error constants (:13-18). This is the correctness backstop for
cell<->edge relations: clipToFace guarantees clipped vertices lie
within the biunit face square and within FACE_CLIP_ERROR_UV_DIST of
the true line AB; faceSegments guarantees a continuous A->B path
consistent with robust Sign even for near-antipodal endpoints.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from .interval import R1Interval
from .point import Point
from .r2 import R2Point, R2Rect

DBL_EPSILON = 2.220446049250313e-16

# error constants (edge_clipping.ts:13-18)
EDGE_CLIP_ERROR_UV_COORD = 2.25 * DBL_EPSILON
EDGE_CLIP_ERROR_UV_DIST = 2.25 * DBL_EPSILON
FACE_CLIP_ERROR_RADIANS = 3 * DBL_EPSILON
FACE_CLIP_ERROR_UV_DIST = 9 * DBL_EPSILON
FACE_CLIP_ERROR_UV_COORD = 9.0 * (1.0 / math.sqrt(2.0)) * DBL_EPSILON
INTERSECTS_RECT_ERROR_UV_DIST = 3 * math.sqrt(2.0) * DBL_EPSILON

AXIS_U = 0
AXIS_V = 1

# The neighbors of each face in (u,v,w) coordinates (stuv.ts:388-412).
_UVW_FACES = [
    [[4, 1], [5, 2], [3, 0]],
    [[0, 3], [5, 2], [4, 1]],
    [[0, 3], [1, 4], [5, 2]],
    [[2, 5], [1, 4], [0, 3]],
    [[2, 5], [3, 0], [1, 4]],
    [[4, 1], [3, 0], [2, 5]],
]


def uvw_face(face: int, axis: int, direction: int) -> int:
    """Adjacent face along the given uvw axis/direction (stuv.ts:431)."""
    return _UVW_FACES[face][axis][direction]


# ---------------------------------------------------- scalar stuv helpers

def _face(p: Point) -> int:
    """Cube face containing direction p (stuv.ts:176-190)."""
    ax, ay, az = abs(p.x), abs(p.y), abs(p.z)
    if ax > ay and ax > az:
        f, comp = 0, p.x
    elif (not (ax > ay)) and ay > az:
        f, comp = 1, p.y
    else:
        f, comp = 2, p.z
    return f + 3 if comp < 0 else f


def _valid_face_xyz_to_uv(face: int, p: Point) -> tuple[float, float]:
    """Project p onto face (stuv.ts:196-211)."""
    if face == 0:
        return p.y / p.x, p.z / p.x
    if face == 1:
        return -p.x / p.y, p.z / p.y
    if face == 2:
        return -p.x / p.z, -p.y / p.z
    if face == 3:
        return p.z / p.x, p.y / p.x
    if face == 4:
        return p.z / p.y, -p.x / p.y
    return -p.y / p.z, -p.x / p.z


def _xyz_to_face_uv(p: Point) -> tuple[int, float, float]:
    f = _face(p)
    u, v = _valid_face_xyz_to_uv(f, p)
    return f, u, v


def _face_uv_to_xyz(face: int, u: float, v: float) -> Point:
    """(face,u,v) -> unnormalized xyz (stuv.ts:225-240)."""
    if face == 0:
        return Point(1, u, v)
    if face == 1:
        return Point(-u, 1, v)
    if face == 2:
        return Point(-u, -v, 1)
    if face == 3:
        return Point(-1, -v, -u)
    if face == 4:
        return Point(v, -1, -u)
    return Point(v, u, -1)


def face_xyz_to_uvw(face: int, v: Point) -> Point:
    """Rotate xyz into the (u,v,w) frame of ``face`` (stuv.ts:275-292)."""
    if face == 0:
        return Point(v.y, v.z, v.x)
    if face == 1:
        return Point(-v.x, v.z, v.y)
    if face == 2:
        return Point(-v.x, -v.y, v.z)
    if face == 3:
        return Point(-v.z, -v.y, -v.x)
    if face == 4:
        return Point(-v.z, v.x, -v.y)
    return Point(v.y, v.x, -v.z)


# -------------------------------------------------------------- PointUVW

class PointUVW(Point):
    """A point in the (u,v,w) frame of a cube face
    (edge_clipping.ts:123-168)."""

    def intersects_face(self) -> bool:
        """Whether the great circle with this normal intersects the
        face (ts:128-133)."""
        u, v, w = abs(self.x), abs(self.y), abs(self.z)
        return v >= w - u and u >= w - v

    def intersects_opposite_edges(self) -> bool:
        """Whether the circle intersects two opposite face edges
        (ts:135-143)."""
        u, v, w = abs(self.x), abs(self.y), abs(self.z)
        if abs(u - v) != w:
            return abs(u - v) >= w
        return (u - w >= v) if u >= v else (v - w >= u)

    def exit_axis(self) -> int:
        """Axis of the face edge where the circle exits (ts:145-158)."""
        if self.intersects_opposite_edges():
            return AXIS_V if abs(self.x) >= abs(self.y) else AXIS_U
        x = 1 if _sign(self.x) < 0 else 0
        y = 1 if _sign(self.y) < 0 else 0
        z = 1 if _sign(self.z) < 0 else 0
        return AXIS_V if (x ^ y ^ z) == 0 else AXIS_U

    def exit_point(self, axis: int) -> R2Point:
        """Exit point of the circle on the given axis edge
        (ts:160-167)."""
        if axis == AXIS_U:
            u = 1.0 if self.y > 0 else -1.0
            return R2Point(u, (-u * self.x - self.z) / self.y)
        v = 1.0 if self.x < 0 else -1.0
        return R2Point((-v * self.y - self.z) / self.x, v)


def _sign(x: float) -> int:
    # JS Math.sign semantics: sign(0) == 0, sign(-0.0) == -0 -> 0
    return (x > 0) - (x < 0)


def sum_equal(u: float, v: float, w: float) -> bool:
    """u + v == w EXACTLY (ts:112)."""
    return u + v == w and u == w - v and v == w - u


# ---------------------------------------------------------- face clipping

def clip_to_face(a: Point, b: Point, face: int):
    """(aUV, bUV, intersects) of edge AB clipped to a face (ts:26-28)."""
    return clip_to_padded_face(a, b, face, 0.0)


def clip_to_padded_face(a: Point, b: Point, f: int, padding: float):
    """Clip AB to [-R,R]x[-R,R], R = 1+padding (ts:35-92)."""
    if _face(a) == f and _face(b) == f:
        au, av = _valid_face_xyz_to_uv(f, a)
        bu, bv = _valid_face_xyz_to_uv(f, b)
        return R2Point(au, av), R2Point(bu, bv), True

    # The cross product MUST be computed in (x,y,z) first: pointCross's
    # symbolic perturbation is coordinate-system dependent (ts:48-53).
    norm_uvw = PointUVW(*_t(face_xyz_to_uvw(f, a.point_cross(b))))
    a_uvw = PointUVW(*_t(face_xyz_to_uvw(f, a)))
    b_uvw = PointUVW(*_t(face_xyz_to_uvw(f, b)))

    scale_uv = 1 + padding
    scaled_n = PointUVW(scale_uv * norm_uvw.x, scale_uv * norm_uvw.y, norm_uvw.z)
    if not scaled_n.intersects_face():
        return None, None, False

    # Rescale subnormal normals before normalize() (ts:68-73).
    if max(abs(norm_uvw.x), abs(norm_uvw.y), abs(norm_uvw.z)) < math.ldexp(1, -511):
        m = math.ldexp(1, 563)
        norm_uvw = PointUVW(norm_uvw.x * m, norm_uvw.y * m, norm_uvw.z * m)

    nn = norm_uvw.normalize()
    a_tan = PointUVW(*_t(nn.cross(a_uvw)))
    b_tan = PointUVW(*_t(b_uvw.cross(nn)))

    neg_n = PointUVW(-scaled_n.x, -scaled_n.y, -scaled_n.z)
    a_uv, a_score = clip_destination(b_uvw, a_uvw, neg_n, b_tan, a_tan, scale_uv)
    b_uv, b_score = clip_destination(a_uvw, b_uvw, scaled_n, a_tan, b_tan, scale_uv)
    return a_uv, b_uv, a_score + b_score < 3


def _t(p: Point) -> tuple[float, float, float]:
    return p.x, p.y, p.z


def clip_destination(
    a: PointUVW, b: PointUVW, scaled_n: PointUVW,
    a_tan: PointUVW, b_tan: PointUVW, scale_uv: float,
) -> tuple[R2Point, int]:
    """Clip endpoint B of AB onto the face; score 0 if interior, up to
    3 if the segment misses the face (ts:175-207)."""
    max_safe_uv = 1 - FACE_CLIP_ERROR_UV_COORD

    if b.z > 0:
        uv = R2Point(b.x / b.z, b.y / b.z)
        if max(abs(uv.x), abs(uv.y)) <= max_safe_uv:
            return uv, 0

    uv = scaled_n.exit_point(scaled_n.exit_axis()).mul(scale_uv)
    p = Point(uv.x, uv.y, 1.0)

    score = 0
    if p.sub(a).dot(a_tan) < 0:
        score = 2
    elif p.sub(b).dot(b_tan) < 0:
        score = 1

    if score > 0:
        if b.z <= 0:
            score = 3
        else:
            uv = R2Point(b.x / b.z, b.y / b.z)
    return uv, score


# ----------------------------------------------------------- 2D clipping

def update_endpoint(bound: R1Interval, high: bool, value: float) -> tuple[R1Interval, bool]:
    """Clamp one interval endpoint; False if beyond the other
    (ts:213-223)."""
    if not high:
        if bound.hi < value:
            return bound, False
        if bound.lo < value:
            bound = R1Interval(value, bound.hi)
        return bound, True
    if bound.lo > value:
        return bound, False
    if bound.hi > value:
        bound = R1Interval(bound.lo, value)
    return bound, True


def interpolate_float64(x: float, a: float, b: float, a1: float, b1: float) -> float:
    """Interpolate (a1,b1) at the position x holds in (a,b), from the
    nearer endpoint for accuracy (ts:305-306)."""
    if abs(a - x) <= abs(b - x):
        return a1 + ((b1 - a1) * (x - a)) / (b - a)
    return b1 + ((a1 - b1) * (x - b)) / (a - b)


def clip_bound_axis(
    a0: float, b0: float, bound0: R1Interval,
    a1: float, b1: float, bound1: R1Interval,
    neg_slope: bool, clip: R1Interval,
) -> tuple[R1Interval, R1Interval, bool]:
    """Clip the 2D bounding intervals along one axis (ts:230-257)."""
    if bound0.lo < clip.lo:
        if bound0.hi < clip.lo:
            return bound0, bound1, False
        bound0 = R1Interval(clip.lo, bound0.hi)
        bound1, updated = update_endpoint(
            bound1, neg_slope, interpolate_float64(clip.lo, a0, b0, a1, b1)
        )
        if not updated:
            return bound0, bound1, False

    if bound0.hi > clip.hi:
        if bound0.lo > clip.hi:
            return bound0, bound1, False
        bound0 = R1Interval(bound0.lo, clip.hi)
        bound1, updated = update_endpoint(
            bound1, not neg_slope, interpolate_float64(clip.hi, a0, b0, a1, b1)
        )
        if not updated:
            return bound0, bound1, False
    return bound0, bound1, True


def edge_intersects_rect(a: R2Point, b: R2Point, r: R2Rect) -> bool:
    """Whether segment AB intersects the closed rect (ts:262-274)."""
    if not r.intersects(R2Rect.from_points(a, b)):
        return False
    n = b.sub(a).ortho()
    i = 1 if n.x >= 0 else 0
    j = 1 if n.y >= 0 else 0
    mx = n.dot(r.vertex_ij(i, j).sub(a))
    mn = n.dot(r.vertex_ij(1 - i, 1 - j).sub(a))
    return mx >= 0 and mn <= 0


def clip_edge_bound(a: R2Point, b: R2Point, clip: R2Rect, bound: R2Rect) -> tuple[R2Rect, bool]:
    """Clip the bound of AB to ``clip`` (ts:290-300)."""
    neg_slope = (a.x > b.x) != (a.y > b.y)
    b0x, b0y, up1 = clip_bound_axis(a.x, b.x, bound.x, a.y, b.y, bound.y, neg_slope, clip.x)
    if not up1:
        return bound, False
    b1y, b1x, up2 = clip_bound_axis(a.y, b.y, b0y, a.x, b.x, b0x, neg_slope, clip.y)
    if not up2:
        return R2Rect(b0x, b0y), False
    return R2Rect(b1x, b1y), True


def clipped_edge_bound(a: R2Point, b: R2Point, clip: R2Rect) -> R2Rect:
    """Bounding rect of AB ∩ clip, empty if disjoint (ts:279-284)."""
    bound = R2Rect.from_points(a, b)
    b1, intersects = clip_edge_bound(a, b, clip, bound)
    return b1 if intersects else R2Rect.empty()


def clip_edge(a: R2Point, b: R2Point, clip: R2Rect):
    """(aClip, bClip, intersects) of segment AB ∩ clip (ts:98-107)."""
    bound = R2Rect.from_points(a, b)
    clipped, intersects = clip_edge_bound(a, b, clip, bound)
    if not intersects:
        return None, None, False
    ai = 1 if a.x > b.x else 0
    aj = 1 if a.y > b.y else 0
    return clipped.vertex_ij(ai, aj), clipped.vertex_ij(1 - ai, 1 - aj), True


# ---------------------------------------------------------- face segments

@dataclass
class FaceSegment:
    """Edge AB clipped to one cube face (ts:311-332)."""

    face: int
    a: R2Point
    b: R2Point


def move_origin_to_valid_face(face: int, a: Point, ab: Point, a_uv: R2Point) -> tuple[int, R2Point]:
    """Reproject origin A onto an adjacent face if the (inexact) line
    AB misses A's face or exits behind A (ts:421-460)."""
    max_safe_uv = 1 - FACE_CLIP_ERROR_UV_COORD
    if max(abs(a_uv.x), abs(a_uv.y)) <= max_safe_uv:
        return face, a_uv

    n = PointUVW(*_t(face_xyz_to_uvw(face, ab)))
    if n.intersects_face():
        uv = n.exit_point(n.exit_axis())
        exit_xyz = _face_uv_to_xyz(face, uv.x, uv.y)
        a_tangent = ab.normalize().cross(a)
        if exit_xyz.sub(a).dot(a_tangent) >= -FACE_CLIP_ERROR_RADIANS:
            return face, a_uv

    if abs(a_uv.x) >= abs(a_uv.y):
        face = uvw_face(face, 0, 1 if a_uv.x > 0 else 0)
    else:
        face = uvw_face(face, 1, 1 if a_uv.y > 0 else 0)

    ax, ay = _valid_face_xyz_to_uv(face, a)
    return face, R2Point(max(-1.0, min(1.0, ax)), max(-1.0, min(1.0, ay)))


def next_face(face: int, exit: R2Point, axis: int, n: PointUVW, target_face: int) -> int:
    """Next face visited by faceSegments (ts:469-510)."""
    exit_a, exit_1ma = (exit.y, exit.x) if axis == AXIS_V else (exit.x, exit.y)
    exit_a_pos = 1 if exit_a > 0 else 0
    exit_1ma_pos = 1 if exit_1ma > 0 else 0

    if (
        abs(exit_1ma) == 1
        and uvw_face(face, 1 - axis, exit_1ma_pos) == target_face
        and sum_equal(exit.x * n.x, exit.y * n.y, -n.z)
    ):
        return target_face
    return uvw_face(face, axis, exit_a_pos)


def face_segments(a: Point, b: Point) -> list[FaceSegment]:
    """Subdivide AB at every cube-face boundary crossing; continuous
    A->B path, all vertices in the biunit squares (ts:346-406)."""
    a_face, ax, ay = _xyz_to_face_uv(a)
    b_face, bx, by = _xyz_to_face_uv(b)
    seg_a = R2Point(ax, ay)
    seg_b = R2Point(bx, by)
    if a_face == b_face:
        return [FaceSegment(a_face, seg_a, seg_b)]

    ab = a.point_cross(b)
    a_face, seg_a = move_origin_to_valid_face(a_face, a, ab, seg_a)
    b_face, seg_b = move_origin_to_valid_face(b_face, b, ab.neg(), seg_b)

    segments: list[FaceSegment] = []
    face = a_face
    cur_a = seg_a
    while face != b_face:
        n = PointUVW(*_t(face_xyz_to_uvw(face, ab)))
        exit_axis = n.exit_axis()
        exit_uv = n.exit_point(exit_axis)
        segments.append(FaceSegment(face, cur_a, exit_uv))

        exit_xyz = _face_uv_to_xyz(face, exit_uv.x, exit_uv.y)
        face = next_face(face, exit_uv, exit_axis, n, b_face)
        exit_uvw = face_xyz_to_uvw(face, exit_xyz)
        cur_a = R2Point(exit_uvw.x, exit_uvw.y)

    segments.append(FaceSegment(face, cur_a, seg_b))
    return segments
