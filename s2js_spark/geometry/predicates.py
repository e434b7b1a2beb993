"""Robust geometric predicates: the triage -> stable -> exact -> symbolic
escalation ladder.

Semantics of /root/reference/s2/predicates.ts. The exact stage uses
Python ``fractions.Fraction`` (doubles are dyadic rationals, so cross
products and dot products evaluate exactly), mirroring the reference's
arbitrary-precision PreciseVector.
"""

from __future__ import annotations

import math
from fractions import Fraction

from .point import Point

CLOCKWISE = -1
INDETERMINATE = 0
COUNTERCLOCKWISE = 1

EPSILON = 1e-15
DBL_EPSILON = 2.220446049250313e-16
DBL_ERROR = 1.110223024625156e-16

MAX_DETERMINANT_ERROR = 1.8274 * DBL_EPSILON
DET_ERROR_MULTIPLIER = 3.2321 * DBL_EPSILON


def sign(a: Point, b: Point, c: Point) -> bool:
    """Strict CCW test (predicates.ts:75-85)."""
    return c.cross(a).dot(b) > 0


def triage_sign(a: Point, b: Point, c: Point) -> int:
    """Float64 determinant with certified error bound (predicates.ts:186-191)."""
    det = a.cross(b).dot(c)
    if det > MAX_DETERMINANT_ERROR:
        return COUNTERCLOCKWISE
    if det < -MAX_DETERMINANT_ERROR:
        return CLOCKWISE
    return INDETERMINATE


def stable_sign(a: Point, b: Point, c: Point) -> int:
    """Translated determinant, more stable for nearly-collinear points
    (predicates.ts:135-176)."""
    ab = b.sub(a)
    ab2 = ab.norm2()
    bc = c.sub(b)
    bc2 = bc.norm2()
    ca = a.sub(c)
    ca2 = ca.norm2()

    if ab2 >= bc2 and ab2 >= ca2:
        e1, e2, ov = ca, bc, c
    elif bc2 >= ca2:
        e1, e2, ov = ab, ca, a
    else:
        e1, e2, ov = bc, ab, b

    det = -e1.cross(e2).dot(ov)
    max_err = DET_ERROR_MULTIPLIER * math.sqrt(e1.norm2() * e2.norm2())
    if det > max_err:
        return COUNTERCLOCKWISE
    if det < -max_err:
        return CLOCKWISE
    return INDETERMINATE


def _frac(p: Point) -> tuple[Fraction, Fraction, Fraction]:
    return Fraction(p.x), Fraction(p.y), Fraction(p.z)


def _fcross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _fdot(a, b) -> Fraction:
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _fsign(x) -> int:
    if x > 0:
        return 1
    if x < 0:
        return -1
    return 0


def exact_sign(a: Point, b: Point, c: Point, perturb: bool) -> int:
    """Exact-arithmetic sign with optional symbolic perturbation
    (predicates.ts:221-260)."""
    perm_sign = COUNTERCLOCKWISE
    pa, pb, pc = a, b, c
    if pa.cmp(pb) > 0:
        pa, pb = pb, pa
        perm_sign = -perm_sign
    if pb.cmp(pc) > 0:
        pb, pc = pc, pb
        perm_sign = -perm_sign
    if pa.cmp(pb) > 0:
        pa, pb = pb, pa
        perm_sign = -perm_sign

    xa, xb, xc = _frac(pa), _frac(pb), _frac(pc)
    xb_cross_xc = _fcross(xb, xc)
    det = _fdot(xa, xb_cross_xc)

    det_sign = _fsign(det)
    if det_sign == INDETERMINATE and perturb:
        det_sign = symbolically_perturbed_sign(xa, xb, xc, xb_cross_xc)
    return perm_sign * det_sign


def symbolically_perturbed_sign(a, b, c, b_cross_c) -> int:
    """Simulation-of-Simplicity tie-break (predicates.ts:286-392).

    Requires points sorted lexicographically with an exactly-zero
    determinant; a, b, c are Fraction triples.
    """
    det_sign = _fsign(b_cross_c[2])  # da.Z
    if det_sign != 0:
        return det_sign
    det_sign = _fsign(b_cross_c[1])  # da.Y
    if det_sign != 0:
        return det_sign
    det_sign = _fsign(b_cross_c[0])  # da.X
    if det_sign != 0:
        return det_sign

    det_sign = _fsign(c[0] * a[1] - c[1] * a[0])  # db.Z
    if det_sign != 0:
        return det_sign
    det_sign = _fsign(c[0])  # db.Z * da.Y
    if det_sign != 0:
        return det_sign
    det_sign = -_fsign(c[1])  # db.Z * da.X
    if det_sign != 0:
        return det_sign
    det_sign = _fsign(c[2] * a[0] - c[0] * a[2])  # db.Y
    if det_sign != 0:
        return det_sign
    det_sign = _fsign(c[2])  # db.Y * da.X
    if det_sign != 0:
        return det_sign
    det_sign = _fsign(a[0] * b[1] - a[1] * b[0])  # dc.Z
    if det_sign != 0:
        return det_sign
    det_sign = -_fsign(b[0])  # dc.Z * da.Y
    if det_sign != 0:
        return det_sign
    det_sign = _fsign(b[1])  # dc.Z * da.X
    if det_sign != 0:
        return det_sign
    det_sign = _fsign(a[0])  # dc.Z * db.Y
    if det_sign != 0:
        return det_sign
    return COUNTERCLOCKWISE  # dc.Z * db.Y * da.X


def expensive_sign(a: Point, b: Point, c: Point) -> int:
    """Stable then exact escalation (predicates.ts:198-215)."""
    if a.equals(b) or b.equals(c) or c.equals(a):
        return INDETERMINATE
    det_sign = stable_sign(a, b, c)
    if det_sign != INDETERMINATE:
        return det_sign
    return exact_sign(a, b, c, True)


def robust_sign(a: Point, b: Point, c: Point) -> int:
    """Public entry (predicates.ts:113-119)."""
    s = triage_sign(a, b, c)
    if s == INDETERMINATE:
        s = expensive_sign(a, b, c)
    return s


# --------------------------------------------------------- distance compare

def cos_distance(x: Point, y: Point) -> tuple[float, float]:
    c = x.dot(y)
    return c, 9.5 * DBL_ERROR * abs(c) + 1.5 * DBL_ERROR


def sin2_distance(x: Point, y: Point) -> tuple[float, float]:
    n = x.sub(y).cross(x.add(y))
    sin2 = 0.25 * n.norm2()
    err = (
        (21 + 4 * math.sqrt(3)) * DBL_ERROR * sin2
        + 32 * math.sqrt(3) * DBL_ERROR * DBL_ERROR * math.sqrt(sin2)
        + 768 * DBL_ERROR * DBL_ERROR * DBL_ERROR * DBL_ERROR
    )
    return sin2, err


def triage_compare_cos_distances(x: Point, a: Point, b: Point) -> int:
    cos_ax, cos_ax_err = cos_distance(a, x)
    cos_bx, cos_bx_err = cos_distance(b, x)
    diff = cos_ax - cos_bx
    err = cos_ax_err + cos_bx_err
    if diff > err:
        return -1
    if diff < -err:
        return 1
    return 0


def triage_compare_sin2_distances(x: Point, a: Point, b: Point) -> int:
    sin2_ax, sin2_ax_err = sin2_distance(a, x)
    sin2_bx, sin2_bx_err = sin2_distance(b, x)
    diff = sin2_ax - sin2_bx
    err = sin2_ax_err + sin2_bx_err
    if diff > err:
        return 1
    if diff < -err:
        return -1
    return 0


def exact_compare_distances(x, a, b) -> int:
    """Exact comparison via Fractions (predicates.ts:502-524)."""
    cos_ax = _fdot(x, a)
    cos_bx = _fdot(x, b)
    a_sign = _fsign(cos_ax)
    b_sign = _fsign(cos_bx)
    if a_sign != b_sign:
        return -1 if a_sign > b_sign else 1
    cmp = cos_bx * cos_bx * _fdot(a, a) - cos_ax * cos_ax * _fdot(b, b)
    return a_sign * _fsign(cmp)


def symbolic_compare_distances(_x: Point, a: Point, b: Point) -> int:
    c = a.cmp(b)
    if c == -1:
        return 1
    if c == 1:
        return -1
    return 0


def compare_distances(x: Point, a: Point, b: Point) -> int:
    """-1/0/+1 as AX < / == / > BX (predicates.ts:404-442)."""
    s = triage_compare_cos_distances(x, a, b)
    if s != 0:
        return s
    if a.equals(b):
        return 0
    cos_ax = a.dot(x)
    if cos_ax > 1 / math.sqrt(2):
        s = triage_compare_sin2_distances(x, a, b)
    elif cos_ax < -1 / math.sqrt(2):
        s = -triage_compare_sin2_distances(x, a, b)
    if s != 0:
        return s
    s = exact_compare_distances(_frac(x), _frac(a), _frac(b))
    if s != 0:
        return s
    return symbolic_compare_distances(x, a, b)


_CA45_DEGREES = 2 - math.sqrt(2)


def triage_compare_cos_distance(x: Point, y: Point, r2: float) -> int:
    cos_xy, cos_xy_err = cos_distance(x, y)
    cos_r = 1.0 - 0.5 * r2
    cos_r_err = 2.0 * DBL_ERROR * cos_r
    diff = cos_xy - cos_r
    err = cos_xy_err + cos_r_err
    if diff > err:
        return -1
    if diff < -err:
        return 1
    return 0


def triage_compare_sin2_distance(x: Point, y: Point, r2: float) -> int:
    sin2_xy, sin2_xy_err = sin2_distance(x, y)
    sin2_r = r2 * (1.0 - 0.25 * r2)
    sin2_r_err = 3.0 * DBL_ERROR * sin2_r
    diff = sin2_xy - sin2_r
    err = sin2_xy_err + sin2_r_err
    if diff > err:
        return 1
    if diff < -err:
        return -1
    return 0


def exact_compare_distance(x, y, r2: Fraction) -> int:
    cos_xy = _fdot(x, y)
    cos_r = Fraction(1) - Fraction(1, 2) * r2
    xy_sign = _fsign(cos_xy)
    r_sign = _fsign(cos_r)
    if xy_sign != r_sign:
        return -1 if xy_sign > r_sign else 1
    cmp = cos_r * cos_r * _fdot(x, x) * _fdot(y, y) - cos_xy * cos_xy
    return xy_sign * _fsign(cmp)


def compare_distance(x: Point, y: Point, r: float) -> int:
    """-1/0/+1 as XY < / == / > chord angle r (predicates.ts:568-584)."""
    s = triage_compare_cos_distance(x, y, r)
    if s != 0:
        return s
    if r < _CA45_DEGREES:
        s = triage_compare_sin2_distance(x, y, r)
        if s != 0:
            return s
    return exact_compare_distance(_frac(x), _frac(y), Fraction(r))
