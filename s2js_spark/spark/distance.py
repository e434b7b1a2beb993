"""Distance / buffer tag join: rows within chord distance d of a
convex polygon (inside it, or within d of its boundary) — pure SQL.

The per-edge point-to-segment distance is the reference's
interiorDist/updateMinDistance semantics
(/root/reference/s2/edge_distances.ts:239-333, ported in
geometry/edge_distances.py) specialised to plan-time edge literals:

- closest point interior to arc AB iff (A-X).(CxX) < 0 < (B-X).(CxX)
  with C = A x B (plain cross: the reference's robust point_cross is
  2(AxB) and every term below is scale-invariant in C);
- interior chord^2 distance = (X.C)^2/|C|^2 + (1 - sqrt(|CxX|^2/|C|^2))^2;
- otherwise min(|X-A|^2, |X-B|^2).

Everything is +,-,*,/ and sqrt over plan-time literals — the same
expression TEXT runs in Spark SQL and DuckDB (`lit` spells the double
literal per dialect), which is what makes the buffer_tag oracle
exact. The Spark side stages the computation behind pushdown barriers
(the clip_segments_convex pattern) so heavy upstream expressions are
never re-inlined into every edge term (janino 64 KB limit, round-3
verdict #2).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame

from .polyline_ops import _xyz_exprs, convex_planes

_D = math.pi / 180.0


def _ring_xyz(ring: list[list[float]]) -> np.ndarray:
    lngs = np.array([v[0] for v in ring[:-1]], dtype=np.float64) * _D
    lats = np.array([v[1] for v in ring[:-1]], dtype=np.float64) * _D
    return np.stack(
        [
            np.cos(lats) * np.cos(lngs),
            np.cos(lats) * np.sin(lngs),
            np.sin(lats),
        ],
        axis=1,
    )


def segment_chord2_exprs(
    ring: list[list[float]], px: str, py: str, pz: str, lit=lambda v: f"{v!r}"
) -> list[str]:
    """Per-edge chord^2 distance expressions from point columns
    (px, py, pz) to each boundary segment of the closed CCW ring."""
    v = _ring_xyz(ring)
    out = []
    n = v.shape[0]
    for k in range(n):
        a = v[k]
        b = v[(k + 1) % n]
        c = np.cross(a, b)
        c2 = float(c @ c)
        ax, ay, az = (float(t) for t in a)
        bx, by, bz = (float(t) for t in b)
        cx_, cy_, cz_ = (float(t) for t in c)
        xa2 = (
            f"(({px} - {lit(ax)}) * ({px} - {lit(ax)})"
            f" + ({py} - {lit(ay)}) * ({py} - {lit(ay)})"
            f" + ({pz} - {lit(az)}) * ({pz} - {lit(az)}))"
        )
        xb2 = (
            f"(({px} - {lit(bx)}) * ({px} - {lit(bx)})"
            f" + ({py} - {lit(by)}) * ({py} - {lit(by)})"
            f" + ({pz} - {lit(bz)}) * ({pz} - {lit(bz)}))"
        )
        xc = f"({lit(cx_)} * {px} + {lit(cy_)} * {py} + {lit(cz_)} * {pz})"
        # CX = C x X
        cxx = f"({lit(cy_)} * {pz} - {lit(cz_)} * {py})"
        cxy = f"({lit(cz_)} * {px} - {lit(cx_)} * {pz})"
        cxz = f"({lit(cx_)} * {py} - {lit(cy_)} * {px})"
        ia = (
            f"(({lit(ax)} - {px}) * {cxx} + ({lit(ay)} - {py}) * {cxy}"
            f" + ({lit(az)} - {pz}) * {cxz}) < {lit(0.0)}"
        )
        ib = (
            f"(({lit(bx)} - {px}) * {cxx} + ({lit(by)} - {py}) * {cxy}"
            f" + ({lit(bz)} - {pz}) * {cxz}) > {lit(0.0)}"
        )
        cx2 = f"({cxx} * {cxx} + {cxy} * {cxy} + {cxz} * {cxz})"
        qr = f"({lit(1.0)} - sqrt({cx2} / {lit(c2)}))"
        d_int = f"(({xc} * {xc}) / {lit(c2)} + {qr} * {qr})"
        out.append(
            f"(CASE WHEN {ia} AND {ib} THEN {d_int}"
            f" ELSE least({xa2}, {xb2}) END)"
        )
    return out


def buffer_exprs(
    ring: list[list[float]],
    lat: str,
    lng: str,
    lit=lambda v: f"{v!r}",
    px: str | None = None,
    py: str | None = None,
    pz: str | None = None,
) -> tuple[str, str]:
    """(inside_predicate, boundary_chord2) over degree columns (or
    pre-spelled unit-vector component expressions px/py/pz)."""
    if px is None:
        px, py, pz = _xyz_exprs(lat, lng, lit)
    planes = convex_planes(ring)
    inside = " AND ".join(
        f"({lit(float(nx))} * {px} + {lit(float(ny))} * {py}"
        f" + {lit(float(nz))} * {pz}) > {lit(0.0)}"
        for nx, ny, nz in planes
    )
    dists = segment_chord2_exprs(ring, px, py, pz, lit)
    return f"({inside})", f"least({', '.join(dists)})"


def chord2_limit(radius_deg: float) -> float:
    """chord^2 of an angular radius in degrees."""
    return (2.0 * math.sin(radius_deg * _D / 2.0)) ** 2


def buffered_covering(
    rings: list[tuple[str, list[list[float]]]],
    radius_deg: float,
    max_cells: int = 64,
    max_level_diff: int = 2,
) -> tuple[list[tuple[int, int]], list[int]]:
    """Driver-side prefilter index for the multi-polygon distance
    join: each ring's covering EXPANDED by the search radius
    (CellUnion.expand_by_radius, CellUnion.ts:420-427) — a superset of
    the buffer region, so the candidate equi-join can never drop a
    true match (the oracle certifies this end-to-end). Returns
    ((cell_int64, tile_i) rows, sorted covering levels)."""
    from ..geometry import cellid_scalar as cs
    from ..geometry.cellunion import CellUnion
    from ..geometry.geojson import GeoJSONRegionCoverer

    coverer = GeoJSONRegionCoverer(max_cells=max_cells)
    rows: list[tuple[int, int]] = []
    levels: set[int] = set()
    for idx, (_tid, ring) in enumerate(rings):
        cu = CellUnion(
            coverer.covering({"type": "Polygon", "coordinates": [ring]})
        )
        cu.expand_by_radius(radius_deg * _D, max_level_diff)
        for c in cu:
            rows.append((int(np.uint64(c).astype(np.int64)), idx))
            levels.add(cs.level(int(c)))
    return rows, sorted(levels)


def tag_within_distance_multi(
    df: DataFrame,
    rings: list[tuple[str, list[list[float]]]],
    radius_deg: float,
    lat_col: str = "lat",
    lng_col: str = "lng",
    dist_col: str = "bdist",
) -> DataFrame:
    """MANY-polygon distance/buffer join, the 100 TB shape: instead of
    evaluating every polygon's distance against every row (a full
    scan PER polygon), candidates come from a broadcast equi-join of
    the row's cell ancestors against the radius-EXPANDED coverings
    (tagjoin's covering-join mechanics), and only candidates run the
    exact inside-or-within-distance refinement. Output: df columns +
    (tile_i, ``dist_col``). All JVM; the only non-map stage is the
    broadcast of the covering index (O(tiles x cells))."""
    from pyspark.sql import functions as F

    from . import sqlkernels as sq

    spark = df.sparkSession
    cov_rows, levels = buffered_covering(rings, radius_deg)
    cov = spark.createDataFrame(cov_rows, "cell long, tile_i int")

    base = df.filter(
        F.col(lat_col).isNotNull() & F.col(lng_col).isNotNull()
    )
    pts = sq.with_s2_cellid(
        base, lat_col, lng_col, out_col="_leaf", assume_nonnull=True
    )
    # barrier 1 protects the encode chain (tagjoin.tag_candidates
    # pattern); explode_OUTER defeats InferFiltersFromGenerate.
    pts = sq.pushdown_barrier(pts, "_bufm_b1")
    anc = F.array(*[sq.s2_parent_sql("_leaf", lv) for lv in levels])
    cand = (
        pts.withColumn("_anc", F.explode_outer(anc))
        .join(F.broadcast(cov), F.col("_anc") == cov["cell"])
        .drop("cell", "_anc", "_leaf")
    )

    # staged refinement (tag_within_distance pattern): unit vector
    # once, per-tile inside/dist columns, then cheap CASE decisions.
    lit = lambda v: f"{v!r}D"  # noqa: E731
    ax, ay, az = _xyz_exprs(lat_col, lng_col, lit)
    staged = cand.selectExpr(
        "*", f"{ax} AS _bpx", f"{ay} AS _bpy", f"{az} AS _bpz"
    )
    staged = staged.withColumn("_bufm_b2", F.col("_bufm_b1") + F.rand())
    tile_cols = []
    for k, (_tid, ring) in enumerate(rings):
        inside, dist = buffer_exprs(
            ring, lat_col, lng_col, lit, px="_bpx", py="_bpy", pz="_bpz"
        )
        tile_cols.append(f"{inside} AS _bin{k}")
        tile_cols.append(f"{dist} AS _bd{k}")
    staged = staged.selectExpr("*", *tile_cols)
    limit = chord2_limit(radius_deg)
    keep = " ".join(
        f"WHEN {k} THEN (_bin{k} OR _bd{k} <= {lit(limit)})"
        for k in range(len(rings))
    )
    dist_case = " ".join(
        f"WHEN {k} THEN round(_bd{k}, 9)" for k in range(len(rings))
    )
    out = staged.filter(
        F.expr(f"CASE tile_i {keep} ELSE false END")
        & sq.barrier_guard("_bufm_b2")
    ).withColumn(dist_col, F.expr(f"CASE tile_i {dist_case} END"))
    drop = (
        ["_bpx", "_bpy", "_bpz", "_bufm_b1", "_bufm_b2"]
        + [f"_bin{k}" for k in range(len(rings))]
        + [f"_bd{k}" for k in range(len(rings))]
    )
    return out.drop(*drop)


def tag_within_distance(
    df: DataFrame,
    ring: list[list[float]],
    radius_deg: float,
    lat_col: str = "lat",
    lng_col: str = "lng",
    dist_col: str = "bdist",
) -> DataFrame:
    """Rows of ``df`` inside the convex CCW ring OR within
    ``radius_deg`` of its boundary, with ``dist_col`` = boundary
    chord^2 rounded to 1e-9 (cross-engine FMA drift ~ulp; see
    polyline_ops). Map-only, zero shuffle; staged behind pushdown
    barriers so whole-stage codegen always compiles."""
    from pyspark.sql import functions as F

    from . import sqlkernels as sq

    lit = lambda v: f"{v!r}D"  # noqa: E731 - Spark double literal
    ax, ay, az = _xyz_exprs(lat_col, lng_col, lit)
    base = df.selectExpr(
        "*", f"{ax} AS _bpx", f"{ay} AS _bpy", f"{az} AS _bpz"
    )
    base = sq.pushdown_barrier(base, "_buf_b1")
    inside, dist = buffer_exprs(
        ring, lat_col, lng_col, lit, px="_bpx", py="_bpy", pz="_bpz"
    )
    staged = base.selectExpr(
        "*", f"{inside} AS _binside", f"{dist} AS _bdist"
    ).withColumn("_buf_b2", F.col("_buf_b1") + F.rand())
    limit = chord2_limit(radius_deg)
    out = staged.filter(
        (F.col("_binside") | (F.col("_bdist") <= F.lit(limit)))
        & sq.barrier_guard("_buf_b2")
    )
    out = out.withColumn(dist_col, F.expr("round(_bdist, 9)"))
    return out.drop(
        "_bpx", "_bpy", "_bpz", "_binside", "_bdist", "_buf_b1", "_buf_b2"
    )
