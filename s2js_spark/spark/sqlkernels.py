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

Intermediate values are lateral column aliases inside ONE
``selectExpr`` (single analysis pass — chained withColumn re-analyzes
the whole plan per stage, measured at seconds of driver time); the
analyzer rewrites them to nested Projects and Spark >=3.3
CollapseProject keeps non-cheap multi-referenced expressions in
separate nodes, so each stage is evaluated exactly once per row inside
one codegen span.
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


# ----------------------------------------------------------- encode chain

def pushdown_barrier(df: DataFrame, name: str = "_pd_barrier") -> DataFrame:
    """Append a nondeterministic column that blocks predicate pushdown.

    Catalyst's PushPredicateThroughNonJoin substitutes aliases into any
    predicate it pushes through a Project. Pushing a predicate through
    the 14-layer encode chain inlines the whole chain once per layer —
    a fixed-point blow-up measured in MINUTES of driver CPU on a
    475-row input. A Project containing one nondeterministic field is
    ineligible for pushdown (and for CollapseProject), so a cheap
    rand() column pins the boundary.

    CAVEAT (measured in round 3): the barrier only holds while the
    rand column is REFERENCED above it. ColumnPruning deletes an
    unreferenced nondeterministic column, the Project turns
    deterministic again, and every predicate above it is pushed with
    full alias substitution (a 530 KB executed plan and ~2s of
    per-execution overhead for pip_tag). Any filter meant to stay
    above the barrier must therefore AND in ``barrier_guard(name)`` —
    a nondeterministic always-true term referencing the column, which
    Spark 4's rand-bound folding does not simplify (plain
    ``rand() > -1`` IS folded; ``rand() + 1 > 0`` is not).
    """
    return df.withColumn(name, F.rand())


def barrier_guard(name: str = "_pd_barrier") -> Column:
    """Always-true nondeterministic predicate pinning ``name``'s
    pushdown_barrier: rand() ∈ [0,1) so rand()+1 > 0 for every row,
    but the reference keeps the barrier column alive and the
    containing Filter unpushable/unsplittable past the barrier."""
    return (F.col(name) + F.lit(1.0)) > F.lit(0.0)


def _hilbert_exprs(f: str, i: str, j: str, t: str, out_col: str) -> list[str]:
    """(face,i,j) -> leaf id as lateral-alias SQL text: the exact
    8-round Hilbert encode (cellid.ts:360-386). ``_lut`` must be a
    column holding the 1024-entry lookup literal.

    element_at returns the literal array's element type (int); cast to
    long BEFORE shifting or the shift wraps at 32 bits.
    """
    mask = (1 << LOOKUP_BITS) - 1
    exprs = [
        f"shiftleft(cast({f} as bigint), {POS_BITS - 1}) AS {t}n8",
        f"(cast({f} as bigint) & 1) AS {t}b8",
    ]
    for k in range(7, -1, -1):
        key = (
            f"({t}b{k + 1}"
            f" + shiftleft(shiftrightunsigned({i}, {k * LOOKUP_BITS}) & {mask},"
            f" {LOOKUP_BITS + 2})"
            f" + shiftleft(shiftrightunsigned({j}, {k * LOOKUP_BITS}) & {mask}, 2))"
        )
        exprs += [
            f"cast(element_at(_lut, cast({key} + 1 as int)) as bigint) AS {t}v{k}",
            f"({t}n{k + 1} | shiftleft(shiftrightunsigned({t}v{k}, 2),"
            f" {k * 2 * LOOKUP_BITS})) AS {t}n{k}",
            f"({t}v{k} & 3) AS {t}b{k}",
        ]
    exprs.append(f"(shiftleft({t}n0, 1) | 1) AS {out_col}")
    return exprs


def _latlng_exprs(lat: str, lng: str, t: str) -> list[str]:
    """(lat,lng) degrees -> (face,i,j) as lateral-alias SQL text,
    mirroring the kernel op order (stuv.ts:158-220)."""
    return [
        f"({lat} * {_D!r}D) AS {t}latr",
        f"({lng} * {_D!r}D) AS {t}lngr",
        f"cos({t}latr) AS {t}clat",
        f"(cos({t}lngr) * {t}clat) AS {t}x",
        f"(sin({t}lngr) * {t}clat) AS {t}y",
        f"sin({t}latr) AS {t}z",
        f"abs({t}x) AS {t}ax",
        f"abs({t}y) AS {t}ay",
        f"abs({t}z) AS {t}az",
        f"(({t}ax > {t}ay) AND ({t}ax > {t}az)) AS {t}isx",
        f"((NOT ({t}ax > {t}ay)) AND ({t}ay > {t}az)) AS {t}isy",
        f"(CASE WHEN {t}isx THEN {t}x WHEN {t}isy THEN {t}y ELSE {t}z END)"
        f" AS {t}comp",
        f"(CASE WHEN {t}isx THEN 0 WHEN {t}isy THEN 1 ELSE 2 END"
        f" + CASE WHEN {t}comp < 0.0D THEN 3 ELSE 0 END) AS {t}f",
        f"(CASE WHEN {t}f = 0 THEN {t}y / {t}x"
        f" WHEN {t}f = 1 THEN -{t}x / {t}y"
        f" WHEN {t}f = 2 THEN -{t}x / {t}z"
        f" WHEN {t}f = 3 THEN {t}z / {t}x"
        f" WHEN {t}f = 4 THEN {t}z / {t}y"
        f" ELSE -{t}y / {t}z END) AS {t}u",
        f"(CASE WHEN {t}f = 0 THEN {t}z / {t}x"
        f" WHEN {t}f = 1 THEN {t}z / {t}y"
        f" WHEN {t}f = 2 THEN -{t}y / {t}z"
        f" WHEN {t}f = 3 THEN {t}y / {t}x"
        f" WHEN {t}f = 4 THEN -{t}x / {t}y"
        f" ELSE -{t}x / {t}z END) AS {t}v",
        f"(CASE WHEN {t}u >= 0.0D THEN 0.5D * sqrt(1.0D + 3.0D * {t}u)"
        f" ELSE 1.0D - 0.5D * sqrt(1.0D - 3.0D * {t}u) END) AS {t}s",
        f"(CASE WHEN {t}v >= 0.0D THEN 0.5D * sqrt(1.0D + 3.0D * {t}v)"
        f" ELSE 1.0D - 0.5D * sqrt(1.0D - 3.0D * {t}v) END) AS {t}t",
        f"least(greatest(cast(floor({float(MAX_SIZE)!r}D * {t}s) as bigint), 0L),"
        f" {MAX_SIZE - 1}L) AS {t}i",
        f"least(greatest(cast(floor({float(MAX_SIZE)!r}D * {t}t) as bigint), 0L),"
        f" {MAX_SIZE - 1}L) AS {t}j",
    ]


def with_s2_cellid(
    df: DataFrame,
    lat_col: str = "lat",
    lng_col: str = "lng",
    out_col: str = "cellid",
    assume_nonnull: bool = False,
) -> DataFrame:
    """Append the leaf S2 cell id (raw uint64 bits in a LongType column)
    computed entirely JVM-side.

    Null lat/lng rows get a null cell id (``assume_nonnull`` skips the
    null guard; callers that pre-filter on the base columns should set
    it — filtering on the OUTPUT column instead triggers the pushdown
    blow-up described in ``pushdown_barrier``).

    The whole chain is ONE ``selectExpr`` of lateral column aliases:
    a single analysis pass (chained withColumn re-analyzes the full
    plan per stage — measured seconds of driver time per query), while
    the analyzer still rewrites it into nested Projects so every stage
    is evaluated exactly once per row inside one codegen span.
    """
    t = "_s2sql_"
    exprs = _latlng_exprs(lat_col, lng_col, t) + _hilbert_exprs(
        f"{t}f", f"{t}i", f"{t}j", t, out_col
    )
    out = df.withColumn("_lut", _lookup_lit()).selectExpr("*", *exprs)
    if not assume_nonnull:
        keep_null = F.when(
            F.col(lat_col).isNotNull() & F.col(lng_col).isNotNull(),
            F.col(out_col),
        )
        out = out.withColumn(out_col, keep_null)
    return out.select(*df.columns, out_col)


def with_s2_cellid_from_face_ij(
    df: DataFrame, f_col: str, i_col: str, j_col: str, out_col: str = "cellid"
) -> DataFrame:
    """(face,i,j) -> leaf id: the exact 8-round Hilbert encode
    (cellid.ts:360-386) in pure bitwise SQL. Bit-for-bit equal to
    kernels/cellid.from_face_ij (proven exhaustively in tests)."""
    t = "_s2hil_"
    exprs = _hilbert_exprs(f_col, i_col, j_col, t, out_col)
    out = df.withColumn("_lut", _lookup_lit()).selectExpr("*", *exprs)
    return out.select(*df.columns, out_col)


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
