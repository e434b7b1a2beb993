"""Vectorized S2 CellID kernels over NumPy uint64 arrays.

Semantics match the reference CellID module
(/root/reference/s2/cellid.ts) bit-for-bit; each function cites the
lines it reproduces. These kernels are the per-document hot path and
run columnar inside Arrow-batched pandas UDFs.

Conventions
-----------
- cell ids are ``np.uint64`` arrays holding the raw S2 bit pattern.
  When stored in a Spark ``LongType`` column use ``to_int64``/
  ``from_int64`` (bit-pattern reinterpret). Unsigned ordering is
  recovered in the JVM by XOR-ing with 2**63 ("flipped key").
- all functions broadcast over arrays; scalars come back as 0-d
  arrays (call ``int()``/``float()`` as needed).
"""

from __future__ import annotations

import numpy as np

from .hilbert import INVERT_MASK, LOOKUP_BITS, LOOKUP_IJ, LOOKUP_POS, SWAP_MASK
from . import stuv

FACE_BITS = 3
NUM_FACES = 6
MAX_LEVEL = 30
POS_BITS = 2 * MAX_LEVEL + 1  # 61
MAX_SIZE = 1 << MAX_LEVEL

U64 = np.uint64
_ONE = U64(1)
_U64_MAX = U64(0xFFFFFFFFFFFFFFFF)
SENTINEL = _U64_MAX  # (1<<64)-1, cellid.ts:48
WRAP_OFFSET = NUM_FACES << POS_BITS  # python int; > 2**63, keep unsigned


def _u64(x) -> np.ndarray:
    a = np.asarray(x)
    if a.dtype == np.uint64:
        return a
    if a.dtype == np.int64:
        return a.view(np.uint64) if a.ndim else a.astype(np.int64).view(np.uint64)
    return a.astype(np.uint64)


def to_int64(ci) -> np.ndarray:
    """Reinterpret uint64 cell ids as int64 for Spark LongType storage."""
    return np.asarray(ci, dtype=np.uint64).view(np.int64)


def from_int64(v) -> np.ndarray:
    """Reinterpret int64 column values back to uint64 cell ids."""
    return np.asarray(v, dtype=np.int64).view(np.uint64)


def flip_key(v) -> np.ndarray:
    """XOR with 2**63: signed order of the result == unsigned S2 order."""
    return (_u64(v) ^ U64(1 << 63)).view(np.int64)


def _neg(x: np.ndarray) -> np.ndarray:
    """Two's-complement negation for uint64 arrays without warnings."""
    return ~x + _ONE


# ---------------------------------------------------------------- hierarchy

def lsb(ci) -> np.ndarray:
    """Least significant set bit (cellid.ts:118)."""
    ci = _u64(ci)
    return ci & _neg(ci)


def lsb_for_level(level) -> np.ndarray:
    """Lowest set bit for cells at ``level`` (cellid.ts:123-125)."""
    level = np.asarray(level, dtype=np.int64)
    return _ONE << (U64(2) * (U64(MAX_LEVEL) - level.astype(np.uint64)))


def level(ci) -> np.ndarray:
    """Subdivision level in [0,30] (cellid.ts:67-69).

    Trailing-zero count via exact log2 of the isolated LSB (powers of
    two convert to float64 exactly).
    """
    tz = np.log2(lsb(ci).astype(np.float64)).astype(np.int64)
    return MAX_LEVEL - (tz >> 1)


def parent(ci, lvl) -> np.ndarray:
    """Ancestor at ``lvl`` (cellid.ts:74-77)."""
    ci = _u64(ci)
    b = lsb_for_level(lvl)
    return (ci & _neg(b)) | b


def immediate_parent(ci) -> np.ndarray:
    """One level up; assumes not a face cell (cellid.ts:83-86)."""
    ci = _u64(ci)
    nlsb = lsb(ci) << U64(2)
    return (ci & _neg(nlsb)) | nlsb


def face(ci) -> np.ndarray:
    """Cube face 0-5 (cellid.ts:53-55)."""
    return (_u64(ci) >> U64(POS_BITS)).astype(np.int64)


def pos(ci) -> np.ndarray:
    """61-bit Hilbert position on the face (cellid.ts:60-62)."""
    return _u64(ci) & (SENTINEL >> U64(FACE_BITS))


def is_leaf(ci) -> np.ndarray:
    """Level-30 test (cellid.ts:102)."""
    return (_u64(ci) & _ONE) != 0


def is_face(ci) -> np.ndarray:
    """Top-level (face) cell test (cellid.ts:89)."""
    return (_u64(ci) & (lsb_for_level(0) - _ONE)) == 0


def valid(ci) -> np.ndarray:
    """Validity test (cellid.ts:94-97); face<=6 kept bug-compatible."""
    ci = _u64(ci)
    return (face(ci) <= NUM_FACES) & ((lsb(ci) & U64(0x1555555555555555)) != 0)


def child_position(ci, lvl) -> np.ndarray:
    """Child position (0..3) of the ancestor at ``lvl`` (cellid.ts:109-111)."""
    ci = _u64(ci)
    lvl = np.asarray(lvl, dtype=np.uint64)
    return ((ci >> (U64(2) * (U64(MAX_LEVEL) - lvl) + _ONE)) & U64(3)).astype(np.int64)


def children(ci) -> np.ndarray:
    """Four immediate children, shape (4,)+ci.shape (cellid.ts:131-140)."""
    ci = _u64(ci)
    b = lsb(ci)
    c0 = ci - b + (b >> U64(2))
    h = b >> U64(1)
    return np.stack([c0, c0 + h, c0 + h + h, c0 + h + h + h])


def range_min(ci) -> np.ndarray:
    """Minimum contained leaf id (cellid.ts:194-196)."""
    ci = _u64(ci)
    return ci - (lsb(ci) - _ONE)


def range_max(ci) -> np.ndarray:
    """Maximum contained leaf id (cellid.ts:201-203)."""
    ci = _u64(ci)
    return ci + (lsb(ci) - _ONE)


def contains(ci, oci) -> np.ndarray:
    """Hierarchy containment == range inclusion (cellid.ts:208-210)."""
    oci = _u64(oci)
    return (range_min(ci) <= oci) & (oci <= range_max(ci))


def intersects(ci, oci) -> np.ndarray:
    """Range overlap (cellid.ts:215-217)."""
    return (range_min(oci) <= range_max(ci)) & (range_max(oci) >= range_min(ci))


def child_begin(ci) -> np.ndarray:
    """First child in Hilbert order (cellid.ts:597-600)."""
    ci = _u64(ci)
    ol = lsb(ci)
    return ci - ol + (ol >> U64(2))


def child_begin_at_level(ci, lvl) -> np.ndarray:
    """First descendant at ``lvl`` (cellid.ts:607-609)."""
    ci = _u64(ci)
    return ci - lsb(ci) + lsb_for_level(lvl)


def child_end(ci) -> np.ndarray:
    """One past last child (cellid.ts:615-618)."""
    ci = _u64(ci)
    ol = lsb(ci)
    return ci + ol + (ol >> U64(2))


def child_end_at_level(ci, lvl) -> np.ndarray:
    """One past last descendant at ``lvl`` (cellid.ts:626-628)."""
    ci = _u64(ci)
    return ci + lsb(ci) + lsb_for_level(lvl)


def next_cell(ci) -> np.ndarray:
    """Next cell on the Hilbert curve at this level (cellid.ts:635-637)."""
    ci = _u64(ci)
    return (ci + (lsb(ci) << _ONE)) & SENTINEL


def prev_cell(ci) -> np.ndarray:
    """Previous cell at this level (cellid.ts:640-642)."""
    ci = _u64(ci)
    return (ci - (lsb(ci) << _ONE)) & SENTINEL


def distance_from_begin(ci) -> np.ndarray:
    """Hilbert steps from the curve start at own level (cellid.ts:500-502)."""
    ci = _u64(ci)
    lvl = level(ci).astype(np.uint64)
    return ci >> (U64(2) * (U64(MAX_LEVEL) - lvl) + _ONE)


def common_ancestor_level(ci, oci) -> tuple[np.ndarray, np.ndarray]:
    """(level, ok) of the common ancestor (cellid.ts:704-712)."""
    ci, oci = _u64(ci), _u64(oci)
    bits = ci ^ oci
    bits = np.maximum(bits, lsb(ci))
    bits = np.maximum(bits, lsb(oci))
    # MSB position via exact float64 log2 after isolating the top bit is
    # unsafe (non-powers of two); use 63 - clz via conversion per 32-bit halves.
    hi = (bits >> U64(32)).astype(np.int64)
    lo = (bits & U64(0xFFFFFFFF)).astype(np.int64)
    msb_hi = np.floor(np.log2(np.maximum(hi, 1).astype(np.float64))).astype(np.int64) + 32
    msb_lo = np.floor(np.log2(np.maximum(lo, 1).astype(np.float64))).astype(np.int64)
    msb = np.where(hi > 0, msb_hi, msb_lo)
    ok = msb <= 60
    return np.where(ok, (60 - msb) >> 1, 0), ok


# ------------------------------------------------------------ constructors

def from_face(f) -> np.ndarray:
    """Face cell id (cellid.ts:288-290)."""
    f = np.asarray(f, dtype=np.uint64)
    return (f << U64(POS_BITS)) + lsb_for_level(0)


def from_face_pos_level(f, p, lvl) -> np.ndarray:
    """(face, pos, level) -> cell id (cellid.ts:280-282)."""
    f = np.asarray(f, dtype=np.uint64)
    p = _u64(p)
    base = (f << U64(POS_BITS)) + np.where(p == 0, _ONE, p)
    return parent(base, lvl)


def from_face_ij(f, i, j) -> np.ndarray:
    """(face,i,j) -> leaf cell id via Hilbert encode (cellid.ts:360-386).

    8 rounds of 4-bit table gathers; vectorized with ``np.take``.
    """
    f = np.asarray(f, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    n = f.astype(np.uint64) << U64(POS_BITS - 1)
    bits = f & SWAP_MASK
    mask = (1 << LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        bits = bits + (((i >> (k * LOOKUP_BITS)) & mask) << (LOOKUP_BITS + 2))
        bits = bits + (((j >> (k * LOOKUP_BITS)) & mask) << 2)
        bits = np.take(LOOKUP_POS, bits)
        n |= (bits >> 2).astype(np.uint64) << U64(k * 2 * LOOKUP_BITS)
        bits = bits & (SWAP_MASK | INVERT_MASK)
    return (n << _ONE) | _ONE


def face_ij_orientation(ci) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """cell id -> (face, i, j, orientation) (cellid.ts:429-464)."""
    ci = _u64(ci)
    f = face(ci)
    orientation = (f & SWAP_MASK).astype(np.int64)
    nbits = MAX_LEVEL - 7 * LOOKUP_BITS  # first iteration: 2 bits
    i = np.zeros(ci.shape, dtype=np.int64)
    j = np.zeros(ci.shape, dtype=np.int64)
    for k in range(7, -1, -1):
        m = U64((1 << (2 * nbits)) - 1)
        orientation = orientation + (
            ((ci >> U64(k * 2 * LOOKUP_BITS + 1)) & m).astype(np.int64) << 2
        )
        orientation = np.take(LOOKUP_IJ, orientation)
        i = i + ((orientation >> (LOOKUP_BITS + 2)) << (k * LOOKUP_BITS))
        j = j + (((orientation >> 2) & ((1 << LOOKUP_BITS) - 1)) << (k * LOOKUP_BITS))
        orientation = orientation & (SWAP_MASK | INVERT_MASK)
        nbits = LOOKUP_BITS
    # Parity fix-up for non-leaf cells (cellid.ts:454-461).
    flip = (lsb(ci) & U64(0x1111111111111110)) != 0
    orientation = np.where(flip, orientation ^ SWAP_MASK, orientation)
    return f, i, j, orientation


def st_to_ij(s) -> np.ndarray:
    """(s,t) -> leaf (i,j) (cellid.ts:321-323)."""
    s = np.asarray(s, dtype=np.float64)
    return np.clip(np.floor(MAX_SIZE * s), 0, MAX_SIZE - 1).astype(np.int64)


def size_ij(lvl) -> np.ndarray:
    """Cell edge length in leaf (i,j) units (cellid.ts:325-327)."""
    lvl = np.asarray(lvl, dtype=np.int64)
    return np.int64(1) << np.clip(MAX_LEVEL - lvl, 0, MAX_LEVEL)


def ij_to_st_min(i) -> np.ndarray:
    """Leaf i -> minimum s of that column (cellid.ts:339)."""
    return np.asarray(i, dtype=np.float64) / MAX_SIZE


def size_st(lvl) -> np.ndarray:
    """Cell edge length in (s,t) space (cellid.ts:330-332)."""
    return ij_to_st_min(size_ij(lvl))


def from_point(x, y, z) -> np.ndarray:
    """Unit vector -> leaf cell id (cellid.ts:303-308)."""
    f, u, v = stuv.xyz_to_face_uv(x, y, z)
    i = st_to_ij(stuv.uv_to_st(u))
    j = st_to_ij(stuv.uv_to_st(v))
    return from_face_ij(f, i, j)


def from_latlng_radians(lat, lng) -> np.ndarray:
    """(lat,lng) radians -> leaf cell id (cellid.ts:314-316)."""
    x, y, z = stuv.latlng_to_xyz(lat, lng)
    return from_point(x, y, z)


def from_latlng_degrees(lat, lng) -> np.ndarray:
    """(lat,lng) degrees -> leaf cell id (LatLng.fromDegrees + fromLatLng)."""
    d = np.pi / 180.0
    return from_latlng_radians(np.asarray(lat, dtype=np.float64) * d,
                               np.asarray(lng, dtype=np.float64) * d)


# ------------------------------------------------------- centers & decode

def face_si_ti(ci) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Cell center in (face,si,ti) (cellid.ts:469-477)."""
    ci = _u64(ci)
    f, i, j, _ = face_ij_orientation(ci)
    delta = np.where(
        is_leaf(ci),
        np.int64(1),
        np.where(((i.astype(np.uint64) ^ (ci >> U64(2))) & _ONE) != 0,
                 np.int64(2), np.int64(0)),
    )
    return f, 2 * i + delta, 2 * j + delta


def raw_point(ci) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Unnormalized center vector (cellid.ts:508-511)."""
    f, si, ti = face_si_ti(ci)
    return stuv.face_si_ti_to_xyz(f, si, ti)


def to_latlng(ci) -> tuple[np.ndarray, np.ndarray]:
    """Cell center -> (lat,lng) radians (cellid.ts:526-528)."""
    x, y, z = raw_point(ci)
    return stuv.xyz_to_latlng(x, y, z)


def to_latlng_degrees(ci) -> tuple[np.ndarray, np.ndarray]:
    lat, lng = to_latlng(ci)
    r = 180.0 / np.pi
    return lat * r, lng * r


def center_st(ci) -> tuple[np.ndarray, np.ndarray]:
    """Cell center in (s,t) on its face."""
    _, si, ti = face_si_ti(ci)
    return stuv.si_ti_to_st(si), stuv.si_ti_to_st(ti)


def ij_level_to_bound_uv(i, j, lvl) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(u_lo, u_hi, v_lo, v_hi) of the cell at lvl containing leaf (i,j)
    (cellid.ts:483-492)."""
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    cell_size = size_ij(lvl)
    x_lo = i & -cell_size
    y_lo = j & -cell_size
    return (
        stuv.st_to_uv(ij_to_st_min(x_lo)),
        stuv.st_to_uv(ij_to_st_min(x_lo + cell_size)),
        stuv.st_to_uv(ij_to_st_min(y_lo)),
        stuv.st_to_uv(ij_to_st_min(y_lo + cell_size)),
    )


def bound_uv(ci) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(u,v) bounds of the cell (cellid.ts:351-354)."""
    _, i, j, _ = face_ij_orientation(ci)
    return ij_level_to_bound_uv(i, j, level(ci))


# ------------------------------------------------------------- neighbors

def from_face_ij_wrap(f, i, j) -> np.ndarray:
    """(face,i,j) possibly outside the face -> wrapped leaf id
    (cellid.ts:388-416)."""
    f = np.asarray(f, dtype=np.int64)
    i = np.clip(np.asarray(i, dtype=np.int64), -1, MAX_SIZE)
    j = np.clip(np.asarray(j, dtype=np.int64), -1, MAX_SIZE)
    scale = 1.0 / MAX_SIZE
    limit = np.nextafter(1.0, 2.0)
    u = np.maximum(-limit, np.minimum(limit, scale * ((i << 1) + 1 - MAX_SIZE)))
    v = np.maximum(-limit, np.minimum(limit, scale * ((j << 1) + 1 - MAX_SIZE)))
    x, y, z = stuv.face_uv_to_xyz(f, u, v)
    nf, nu, nv = stuv.xyz_to_face_uv(x, y, z)
    return from_face_ij(nf, st_to_ij(0.5 * (nu + 1)), st_to_ij(0.5 * (nv + 1)))


def from_face_ij_same(f, i, j, same_face) -> np.ndarray:
    """Dispatch between in-face and wrapped encode (cellid.ts:421-424)."""
    same_face = np.asarray(same_face, dtype=bool)
    return np.where(same_face, from_face_ij(f, i, j), from_face_ij_wrap(f, i, j))


def edge_neighbors(ci) -> np.ndarray:
    """Four edge-adjacent cells, shape (4,)+ci.shape (cellid.ts:535-546)."""
    ci = _u64(ci)
    lvl = level(ci)
    size = size_ij(lvl)
    f, i, j, _ = face_ij_orientation(ci)
    return np.stack(
        [
            parent(from_face_ij_wrap(f, i, j - size), lvl),
            parent(from_face_ij_wrap(f, i + size, j), lvl),
            parent(from_face_ij_wrap(f, i, j + size), lvl),
            parent(from_face_ij_wrap(f, i - size, j), lvl),
        ]
    )


def neighbors_3x3(ci, lvl) -> np.ndarray:
    """The cell at ``lvl`` containing each ci's leaf position plus its
    8 same-level neighbors, shape (9,)+ci.shape.

    Every offset goes through ``from_face_ij_wrap`` (the same
    cube-face-wrap primitive edge_neighbors uses, cellid.ts:388-416),
    so diagonal cells are exact across face boundaries — unlike
    composing edge-neighbors of edge-neighbors, whose i/j axes rotate
    between faces. At the 8 cube corners a diagonal offset lands on an
    already-included cell; callers dedup per row.
    """
    ci = _u64(ci)
    center = parent(ci, lvl)
    size = size_ij(lvl)
    f, i, j, _ = face_ij_orientation(center)
    rows = [center]
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            if di == 0 and dj == 0:
                continue
            rows.append(
                parent(from_face_ij_wrap(f, i + di * size, j + dj * size), lvl)
            )
    return np.stack(rows)


def vertex_neighbors(ci, lvl) -> tuple[np.ndarray, np.ndarray]:
    """Vertex neighbors at ``lvl`` (cellid.ts:553-588).

    Returns (ids, valid_mask) with shape (4,)+ci.shape; the 4th row is
    masked out for the 8 cube-corner cells that only have 3 neighbors.
    """
    ci = _u64(ci)
    half_size = size_ij(np.asarray(lvl) + 1)
    size = half_size << 1
    f, i, j, _ = face_ij_orientation(ci)

    i_half = (i & half_size) != 0
    ioffset = np.where(i_half, size, -size)
    isame = np.where(i_half, i + size < MAX_SIZE, i - size >= 0)
    j_half = (j & half_size) != 0
    joffset = np.where(j_half, size, -size)
    jsame = np.where(j_half, j + size < MAX_SIZE, j - size >= 0)

    ids = np.stack(
        [
            parent(ci, lvl),
            parent(from_face_ij_same(f, i + ioffset, j, isame), lvl),
            parent(from_face_ij_same(f, i, j + joffset, jsame), lvl),
            parent(from_face_ij_same(f, i + ioffset, j + joffset, isame & jsame), lvl),
        ]
    )
    mask = np.broadcast_to(np.ones(ci.shape, dtype=bool), ids.shape).copy()
    mask[3] = isame | jsame
    return ids, mask


# ---------------------------------------------------------------- tokens

def to_token(ci) -> np.ndarray:
    """Hex token, trailing zeros stripped, 'X' for 0 (cellid.ts:224-228)."""
    arr = np.atleast_1d(_u64(ci))
    out = np.array([format(int(x), "016x").rstrip("0") or "X" for x in arr],
                   dtype=object)
    return out if np.ndim(ci) else out[0]


def from_token(tokens) -> np.ndarray:
    """Token -> cell id; 0 for malformed (cellid.ts:234-240)."""
    arr = np.atleast_1d(np.asarray(tokens, dtype=object))
    out = np.zeros(arr.shape, dtype=np.uint64)
    for n, t in enumerate(arr):
        if not isinstance(t, str) or len(t) > 16 or len(t) == 0:
            continue
        try:
            v = int(t, 16)
        except ValueError:
            continue
        # Reject strings int() accepts but the reference regex rejects.
        if not all(c in "0123456789abcdefABCDEF" for c in t):
            continue
        out[n] = U64(v << (4 * (16 - len(t))))
    return out if np.ndim(tokens) else out[0]
