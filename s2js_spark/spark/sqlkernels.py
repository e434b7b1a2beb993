"""Pure-Spark-SQL (JVM, whole-stage-codegen) S2 cell kernels.

The round-1 hot path computed leaf cell ids inside an Arrow-batched
pandas UDF (kernels/cellid.py). A single local JVM's Python runners
cap out at ~6-7M rows/s regardless of thread count, so the flagship
pipeline could not demonstrate the north rule's >=0.8 scaling at
local[8] -> local[32]. This module re-expresses the entire
(lat,lng) -> face/(u,v) -> (s,t) -> (i,j) -> Hilbert-encode chain
(reference semantics /root/reference/s2/stuv.ts:158-220 and
/root/reference/s2/cellid.ts:360-386) as Spark SQL column expressions:

- trig + cube-face projection: CASE/arithmetic on doubles;
- the quadratic (u,v)->(s,t) projection: sqrt/branch;
- the 8-round Hilbert encode: bitwise ops + ``element_at`` gathers on
  the 1024-entry lookup table shipped as a literal array.

Everything runs inside whole-stage codegen — zero Python in the loop.

Parity with the NumPy kernel (kernels/cellid.py):

- every stage downstream of cos/sin (division, sqrt, multiply, floor,
  all bit logic) is IEEE correctly-rounded or exact in both engines
  and is bitwise-identical (tests/test_sqlkernels.py proves the
  (face,i,j)->id stage exhaustively and the full chain on real data);
- cos/sin themselves may differ by 1 ulp between Java's Math and
  NumPy/glibc (~0.2% of inputs). A 1-ulp input difference changes the
  leaf id only when a coordinate lies within ~2^-51 of a leaf-cell
  boundary (~1e-9 probability per point). The TS reference runs on
  V8's libm — a third implementation — so bit-for-bit trig parity
  across engines is unattainable for ANY port; the engine defines the
  JVM result as canonical for DataFrame cell assignment, and exact
  geometric refinement (tiles.py) makes join answers independent of
  ulp-level leaf placement.

Intermediate values are materialized as named projection columns
(chained ``withColumn``); Spark >=3.3 CollapseProject keeps non-cheap
expressions referenced more than once in separate Project nodes, so
each stage is evaluated exactly once per row inside one codegen span.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..kernels.hilbert import LOOKUP_BITS, LOOKUP_POS

MAX_LEVEL = 30
MAX_SIZE = 1 << MAX_LEVEL
POS_BITS = 2 * MAX_LEVEL + 1  # 61
_D = math.pi / 180.0

# The 1024-entry Hilbert lookup table as a plain int list -> shipped to
# executors once as an array literal (element_at is O(1) on literal
# array data).
_LOOKUP_POS_LIST = [int(v) for v in LOOKUP_POS]


def _lookup_lit() -> Column:
    return F.lit(_LOOKUP_POS_LIST)


# --------------------------------------------------------------- SQL stages

def xyz_cols(lat_deg: Column, lng_deg: Column) -> tuple[Column, Column, Column]:
    """(lat,lng) degrees -> unit-vector xyz, mirroring
    kernels/stuv.latlng_to_xyz operation order (multiply-by-constant
    then cos/sin then products — each step correctly rounded)."""
    lat_r = lat_deg * F.lit(_D)
    lng_r = lng_deg * F.lit(_D)
    cosphi = F.cos(lat_r)
    return F.cos(lng_r) * cosphi, F.sin(lng_r) * cosphi, F.sin(lat_r)


def _face_col(x: Column, y: Column, z: Column) -> Column:
    """Cube face 0-5 (stuv.ts:176-190 tie-breaks: strict >)."""
    ax, ay, az = F.abs(x), F.abs(y), F.abs(z)
    is_x = (ax > ay) & (ax > az)
    is_y = (~(ax > ay)) & (ay > az)
    f = F.when(is_x, F.lit(0)).when(is_y, F.lit(1)).otherwise(F.lit(2))
    comp = F.when(is_x, x).when(is_y, y).otherwise(z)
    return F.when(comp < 0, f + 3).otherwise(f).cast("int")


def _uv_cols(f: Column, x: Column, y: Column, z: Column) -> tuple[Column, Column]:
    """Project xyz onto face f -> (u,v) (stuv.ts:196-211)."""
    u = (
        F.when(f == 0, y / x)
        .when(f == 1, -x / y)
        .when(f == 2, -x / z)
        .when(f == 3, z / x)
        .when(f == 4, z / y)
        .otherwise(-y / z)
    )
    v = (
        F.when(f == 0, z / x)
        .when(f == 1, z / y)
        .when(f == 2, -y / z)
        .when(f == 3, y / x)
        .when(f == 4, -x / y)
        .otherwise(-x / z)
    )
    return u, v


def _uv_to_st(u: Column) -> Column:
    """Inverse quadratic projection (stuv.ts:167-170)."""
    pos = F.lit(0.5) * F.sqrt(F.lit(1.0) + F.lit(3.0) * u)
    neg = F.lit(1.0) - F.lit(0.5) * F.sqrt(F.lit(1.0) - F.lit(3.0) * u)
    return F.when(u >= 0.0, pos).otherwise(neg)


def _st_to_ij(s: Column) -> Column:
    """(s,t) -> clamped leaf (i,j) (cellid.ts:321-323)."""
    v = F.floor(F.lit(float(MAX_SIZE)) * s).cast("long")
    return F.least(F.greatest(v, F.lit(0)), F.lit(MAX_SIZE - 1))


# ----------------------------------------------------------- encode chain

def with_s2_cellid(
    df: DataFrame,
    lat_col: str = "lat",
    lng_col: str = "lng",
    out_col: str = "cellid",
) -> DataFrame:
    """Append the leaf S2 cell id (raw uint64 bits in a LongType column)
    computed entirely JVM-side.

    Null lat/lng rows get a null cell id. Stage columns are chained
    ``withColumn`` projections so each is computed once per row.
    """
    t = "_s2sql_"
    lat = F.col(lat_col)
    lng = F.col(lng_col)
    x, y, z = xyz_cols(lat, lng)
    df = df.withColumn(f"{t}x", x).withColumn(f"{t}y", y).withColumn(f"{t}z", z)
    xc, yc, zc = F.col(f"{t}x"), F.col(f"{t}y"), F.col(f"{t}z")
    df = df.withColumn(f"{t}f", _face_col(xc, yc, zc))
    fc = F.col(f"{t}f")
    u, v = _uv_cols(fc, xc, yc, zc)
    df = df.withColumn(f"{t}u", u).withColumn(f"{t}v", v)
    df = df.withColumn(f"{t}s", _uv_to_st(F.col(f"{t}u"))).withColumn(
        f"{t}t", _uv_to_st(F.col(f"{t}v"))
    )
    df = df.withColumn(f"{t}i", _st_to_ij(F.col(f"{t}s"))).withColumn(
        f"{t}j", _st_to_ij(F.col(f"{t}t"))
    )
    df = with_s2_cellid_from_face_ij(
        df, f"{t}f", f"{t}i", f"{t}j", out_col=out_col
    )
    keep_null = F.when(
        lat.isNotNull() & lng.isNotNull(), F.col(out_col)
    )
    df = df.withColumn(out_col, keep_null)
    return df.drop(*[c for c in df.columns if c.startswith(t)])


def with_s2_cellid_from_face_ij(
    df: DataFrame, f_col: str, i_col: str, j_col: str, out_col: str = "cellid"
) -> DataFrame:
    """(face,i,j) -> leaf id: the exact 8-round Hilbert encode
    (cellid.ts:360-386) in pure bitwise SQL. Bit-for-bit equal to
    kernels/cellid.from_face_ij (proven exhaustively in tests)."""
    t = "_s2hil_"
    lut = _lookup_lit()
    mask = (1 << LOOKUP_BITS) - 1

    fc = F.col(f_col).cast("long")
    df = df.withColumn(f"{t}n", F.shiftleft(fc, POS_BITS - 1))
    df = df.withColumn(f"{t}b", fc.bitwiseAND(F.lit(1)))

    for k in range(7, -1, -1):
        i_nib = F.shiftrightunsigned(F.col(i_col), k * LOOKUP_BITS).bitwiseAND(
            F.lit(mask)
        )
        j_nib = F.shiftrightunsigned(F.col(j_col), k * LOOKUP_BITS).bitwiseAND(
            F.lit(mask)
        )
        key = (
            F.col(f"{t}b")
            + F.shiftleft(i_nib, LOOKUP_BITS + 2)
            + F.shiftleft(j_nib, 2)
        )
        # element_at returns the literal array's element type (int);
        # cast to long BEFORE shifting or the shift wraps at 32 bits.
        df = df.withColumn(
            f"{t}v", F.element_at(lut, (key + 1).cast("int")).cast("long")
        )
        vc = F.col(f"{t}v")
        df = df.withColumn(
            f"{t}n",
            F.col(f"{t}n").bitwiseOR(
                F.shiftleft(F.shiftrightunsigned(vc, 2), k * 2 * LOOKUP_BITS)
            ),
        )
        df = df.withColumn(f"{t}b", vc.bitwiseAND(F.lit(3)))

    df = df.withColumn(
        out_col, F.shiftleft(F.col(f"{t}n"), 1).bitwiseOR(F.lit(1))
    )
    return df.drop(f"{t}n", f"{t}b", f"{t}v")


# ------------------------------------------------------- hierarchy columns

def s2_parent_sql(cellid: Column | str, level: int) -> Column:
    """Ancestor at ``level`` (cellid.ts:74-77) as pure bigint bit ops.

    Works on the raw uint64 bit pattern stored in LongType: AND/OR are
    bit-pattern operations, identical under the signed reinterpret.
    """
    c = F.col(cellid) if isinstance(cellid, str) else cellid
    lsb = 1 << (2 * (MAX_LEVEL - level))
    return c.bitwiseAND(F.lit(-lsb)).bitwiseOR(F.lit(lsb))


def s2_level_sql(cellid: Column | str) -> Column:
    """Level in [0,30]: 30 - ctz/2 with ctz = bit_count(lsb - 1)."""
    c = F.col(cellid) if isinstance(cellid, str) else cellid
    lsb = c.bitwiseAND(-c)
    ctz = F.bit_count(lsb - F.lit(1)).cast("int")
    return (F.lit(MAX_LEVEL) - F.shiftrightunsigned(ctz, 1)).cast("int")


def s2_flip_key_sql(cellid: Column | str) -> Column:
    """XOR with 2^63: signed order == unsigned S2 order."""
    c = F.col(cellid) if isinstance(cellid, str) else cellid
    return c.bitwiseXOR(F.lit(-(1 << 63)))


def s2_range_min_sql(cellid: Column | str) -> Column:
    """Minimum contained leaf id (cellid.ts:194-196)."""
    c = F.col(cellid) if isinstance(cellid, str) else cellid
    return c - (c.bitwiseAND(-c) - F.lit(1))


def s2_range_max_sql(cellid: Column | str) -> Column:
    """Maximum contained leaf id (cellid.ts:201-203).

    NOTE: compare ranges with flipped keys — raw bit patterns are
    SIGNED longs in SQL, so unsigned order only holds after
    ``s2_flip_key_sql``.
    """
    c = F.col(cellid) if isinstance(cellid, str) else cellid
    return c + (c.bitwiseAND(-c) - F.lit(1))


def s2_token_sql(cellid: Column | str) -> Column:
    """Hex token, trailing zeros stripped, 'X' for 0 (cellid.ts:224-228)."""
    c = F.col(cellid) if isinstance(cellid, str) else cellid
    h = F.regexp_replace(
        F.lower(F.lpad(F.hex(c), 16, "0")), "0+$", ""
    )
    return F.when(c == 0, F.lit("X")).otherwise(
        F.when(h == "", F.lit("X")).otherwise(h)
    )
