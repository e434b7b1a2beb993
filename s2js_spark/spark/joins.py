"""Distributed spatial joins beyond the broadcast tile kernel.

``knn_join`` is the scale path for many-query nearest-neighbor joins
(SURVEY §2.5): both sides key by their cell at a chosen level, queries
fan out to their 3x3 cell neighborhood (edge+vertex neighbors via the
kernels), candidates equi-join on the cell key (a plain shuffle join —
AQE handles skew), and a window takes the top-k by chord^2. Queries
whose k-th neighbor cannot be certified inside the neighborhood
(k-th distance > the level's minimum cell width) are re-run brute
force — an escalation that is empty for well-chosen levels.

``polygon_pair_join`` joins two tile sets on covering-range overlap
(interval join on the Hilbert line) and refines with exact
polygon-polygon intersection.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from ..geometry.metric import MIN_WIDTH_METRIC
from ..kernels import cellid as kc


@F.pandas_udf(ArrayType(LongType()))
def _neighborhood_cells(lat: pd.Series, lng: pd.Series, level: pd.Series) -> pd.Series:
    """Cell at ``level`` + all 8 neighbors (vectorized, face-wrap-exact
    via kernels.cellid.neighbors_3x3; cube-corner duplicates dropped
    per row)."""
    lvl = int(level.iloc[0])
    leaf = kc.from_latlng_degrees(lat.to_numpy(np.float64), lng.to_numpy(np.float64))
    stack = kc.neighbors_3x3(leaf, lvl)
    out = kc.to_int64(stack).T  # (n, 9)
    return pd.Series([list(dict.fromkeys(row)) for row in out])


def _estimate_count(df: DataFrame, sample_partitions: int = 4) -> int:
    """Row-count estimate from at most ``sample_partitions`` partitions
    (sc.runJob on a partition subset — no full scan). Exact when the
    DataFrame has that few partitions."""
    rdd = df.rdd
    n_parts = rdd.getNumPartitions()
    if n_parts == 0:
        return 0
    take = min(sample_partitions, n_parts)
    counts = rdd.context.runJob(
        rdd, lambda it: [sum(1 for _ in it)], range(take)
    )
    total = sum(counts)
    if take == n_parts:
        return total
    return int(total / take * n_parts)


_PTS_CACHE: dict = {}
_PTS_CACHE_MAX = 16
# auto-level estimates, memoized per (session, points plan): the level
# is an index parameter — a property of the corpus, not of one query
# batch — so repeated-query workloads must not re-run the sampling job
# per call (it is the same prepared-index amortization as _PTS_CACHE).
_LEVEL_CACHE: dict = {}


def clear_knn_index_cache() -> None:
    """Invalidate the memoized kNN point indexes.

    The cache key is PLAN semantics (semanticHash), so rewriting the
    underlying files in place within a session would otherwise serve
    stale kNN results — call this after any in-place rewrite of an
    indexed corpus. Cluster note: the memoized index rides on
    ``localCheckpoint`` blocks, which are NOT reliable storage — on a
    real cluster an executor loss invalidates them and cached queries
    fail; set ``spark.sparkContext.setCheckpointDir`` and swap
    ``localCheckpoint`` for ``checkpoint`` in ``_cell_keyed_points``
    when executors are preemptible (same plan shape, reliable blocks).
    """
    _PTS_CACHE.clear()


def _cell_keyed_points(
    spark: SparkSession, points: DataFrame, level: int
) -> DataFrame:
    """The encoded, lineage-truncated point-side of the kNN join,
    memoized per (session, points plan, level) — the kNN service's
    stored index table. Catalyst analysis + physical planning of the
    14-layer encode chain is ~3.7s of FIXED driver cost per call
    (measured at sf0.1); repeated-query workloads re-key the same
    corpus, so this is the same prepared-statement pattern as
    tagjoin._PAIRS_CACHE. The memoized DataFrame also carries the
    materialized checkpoint blocks, amortizing the index build."""
    import weakref

    from . import sqlkernels as sq

    try:
        sem = points.semanticHash()
    except Exception:  # pragma: no cover - exotic plans
        sem = None
    key = (id(spark), sem, level)
    if sem is not None:
        hit = _PTS_CACHE.get(key)
        try:
            if (
                hit is not None
                and hit[0]() is spark
                and points.sameSemantics(hit[1])
            ):
                return hit[2]
        except Exception:  # pragma: no cover
            pass
    # assume_nonnull after a BASE-column filter: the null-guard CASE
    # makes the output nullable and downstream join analysis then
    # infers `_cell IS NOT NULL` through the chain (the pushdown
    # blow-up sqlkernels.pushdown_barrier documents).
    pts = points.filter(
        F.col("lat").isNotNull() & F.col("lng").isNotNull()
    )
    pts = sq.with_s2_cellid(
        pts, "lat", "lng", out_col="_leaf", assume_nonnull=True
    )
    pts = pts.withColumn(
        "_cell", sq.s2_parent_sql("_leaf", level)
    ).drop("_leaf")
    # Lineage truncation (lazy localCheckpoint): the equi-join makes
    # dynamic-partition-pruning track the `_cell` join key's lineage
    # down the encode chain with full alias substitution — measured
    # as a multi-minute optimizer hang (jstack:
    # PartitionPruning.prune rebuilding the inlined CaseWhen forest),
    # and unlike predicate pushdown it ignores nondeterministic
    # barriers. Truncating to an RDD leaf stops every such lineage
    # walk; the materialized NARROW key table (id, lat, lng, _cell)
    # is the index a kNN service stores anyway.
    pts = pts.localCheckpoint(eager=False)
    if sem is not None:
        for stale in [
            kk for kk, v in _PTS_CACHE.items() if v[0]() is None
        ]:
            del _PTS_CACHE[stale]
        while len(_PTS_CACHE) >= _PTS_CACHE_MAX:
            del _PTS_CACHE[next(iter(_PTS_CACHE))]
        _PTS_CACHE[key] = (weakref.ref(spark), points, pts)
    return pts


def _chord2_sql(lat1: str, lng1: str, lat2: str, lng2: str) -> F.Column:
    """Squared chord distance as a pure-SQL column (round 6): the
    pandas-UDF form (functions.s2_chord2) shipped EVERY candidate row
    through an ArrowEvalPython stage — the 100 TB anti-pattern this
    module's own docstring warns about, and ~0.3s of fixed Python
    stage cost per run locally. Same operation order as
    kernels.stuv.latlng_to_xyz + the minimum clamp
    (cos(lng)*cos(lat), sin(lng)*cos(lat), sin(lat); min(4, |d|^2));
    every post-trig op is IEEE correctly-rounded in both forms, and
    the JVM's trig is the engine's canonical choice for DataFrame
    geometry (sqlkernels' encode chain made the same call)."""
    d = math.pi / 180.0
    la1, ln1 = F.col(lat1) * d, F.col(lng1) * d
    la2, ln2 = F.col(lat2) * d, F.col(lng2) * d
    x1 = F.cos(ln1) * F.cos(la1)
    y1 = F.sin(ln1) * F.cos(la1)
    z1 = F.sin(la1)
    x2 = F.cos(ln2) * F.cos(la2)
    y2 = F.sin(ln2) * F.cos(la2)
    z2 = F.sin(la2)
    dx, dy, dz = x1 - x2, y1 - y2, z1 - z2
    return F.least(F.lit(4.0), dx * dx + dy * dy + dz * dz)


def _local_neighborhood_frame(
    spark: SparkSession,
    queries: DataFrame,
    level: int,
    query_id: str,
) -> DataFrame | None:
    """Driver-side (query_id, qlat, qlng, _cell) VALUES frame for a
    LocalRelation query batch, or None when the query side is a real
    distributed frame (falls back to the vectorized UDF path). Cell
    values are the same kernels.neighbors_3x3 the UDF computes."""
    try:
        # optimized (not analyzed) plan: ConvertToLocalRelation folds
        # the Project a `SELECT * FROM VALUES` wraps around the
        # LocalRelation
        plan = queries._jdf.queryExecution().optimizedPlan()
        if plan.getClass().getSimpleName() != "LocalRelation":
            return None
        rows = queries.collect()  # LocalRelation: driver-only, no job
    except Exception:  # pragma: no cover - exotic sessions
        return None
    if not rows or len(rows) > 10_000:
        return None
    cols = set(queries.columns)
    if not {query_id, "qlat", "qlng"} <= cols:
        return None

    def qid_sql(v) -> str | None:
        if isinstance(v, bool) or v is None:
            return None
        if isinstance(v, (int, np.integer)):
            return f"{int(v)}L"
        if isinstance(v, str) and "'" not in v and "\\" not in v:
            return f"'{v}'"
        return None

    lats = np.array([float(r["qlat"]) for r in rows], dtype=np.float64)
    lngs = np.array([float(r["qlng"]) for r in rows], dtype=np.float64)
    leaf = kc.from_latlng_degrees(lats, lngs)
    cells = kc.to_int64(kc.neighbors_3x3(leaf, level)).T  # (n, 9)
    vals = []
    for r, row9 in zip(rows, cells):
        qid = qid_sql(r[query_id])
        if qid is None:  # unsupported id type: use the UDF path
            return None
        for c in dict.fromkeys(int(v) for v in row9):
            vals.append(
                f"({qid}, CAST('{float(r['qlat'])!r}' AS DOUBLE),"
                f" CAST('{float(r['qlng'])!r}' AS DOUBLE), {c}L)"
            )
    out = spark.sql(
        "SELECT * FROM VALUES " + ", ".join(vals)
        + f" AS _q({query_id}, qlat, qlng, _cell)"
    )
    # match the incoming query_id type (entry uses int ids; VALUES
    # spelled them as longs)
    return out.withColumn(
        query_id, F.col(query_id).cast(queries.schema[query_id].dataType)
    )


def knn_join(
    spark: SparkSession,
    points: DataFrame,
    queries: DataFrame,
    k: int = 5,
    level: int | None = None,
    point_id: str = "id",
    query_id: str = "query_id",
) -> DataFrame:
    """k nearest points per query over (lat, lng) columns on both sides.

    Returns (query_id, id, chord2, rank). Exact: under-covered queries
    fall back to brute force automatically.
    """
    if level is None:
        # aim for ~4k points per cell-neighborhood; level from an
        # ESTIMATED point count — counting a handful of partitions and
        # extrapolating (round 2 ran a FULL points.count() pre-pass
        # here; at 100 TB that is an extra scan of the corpus before
        # the join even starts). The level only needs the right order
        # of magnitude: correctness is level-independent via the
        # certified brute-force escalation below. Memoized per
        # (session, points plan) — see _LEVEL_CACHE.
        import weakref

        try:
            psem = points.semanticHash()
        except Exception:  # pragma: no cover - exotic plans
            psem = None
        lkey = (id(spark), psem)
        lhit = _LEVEL_CACHE.get(lkey)
        if (
            psem is not None
            and lhit is not None
            and lhit[0]() is spark
            and points.sameSemantics(lhit[1])
        ):
            level = lhit[2]
        else:
            n = _estimate_count(points)
            level = max(2, min(16, int(math.log(max(n, 1) / 32.0 + 1, 4)) + 4))
            if psem is not None:
                while len(_LEVEL_CACHE) >= _PTS_CACHE_MAX:
                    del _LEVEL_CACHE[next(iter(_LEVEL_CACHE))]
                _LEVEL_CACHE[lkey] = (weakref.ref(spark), points, level)

    # Point-side cell key via the pure-SQL JVM encode (sqlkernels),
    # memoized + lineage-truncated: the corpus side must never cross
    # the Arrow boundary — the round-3 bench showed the pandas-UDF
    # encode alone cost ~1.8s of knn's wall at sf0.1 (an extra Python
    # roundtrip of every point; the 100 TB anti-pattern). The tiny
    # query side uses the kernels-backed neighborhood UDF — except
    # when the query frame is a LocalRelation (driver-literal query
    # batches, the interactive service shape): then the 3x3
    # neighborhoods are computed DRIVER-side with the same kernels and
    # inlined as a VALUES frame, removing the per-run Python
    # evaluation entirely (round 6 — the ArrowEvalPython stage cost
    # ~0.9s per run for a 5-row query batch at sf0.1).
    pts = _cell_keyed_points(spark, points, level)
    q = _local_neighborhood_frame(spark, queries, level, query_id)
    if q is None:
        q = queries.withColumn(
            "_cells",
            _neighborhood_cells(F.col("qlat"), F.col("qlng"), F.lit(level)),
        ).withColumn("_cell", F.explode("_cells")).drop("_cells")

    cand = q.join(pts, "_cell")
    chord2 = F.round(
        _chord2_sql("lat", "lng", "qlat", "qlng"), 12
    )
    w = Window.partitionBy(query_id).orderBy(F.col("chord2"), F.col(point_id))
    topk = (
        cand.withColumn("chord2", chord2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, point_id, "chord2", "rank")
    )

    # Certification: the 3x3 ring at `level` guarantees correctness iff
    # the k-th distance is below the minimum cell width at that level.
    #
    # Round 6: the whole certify-and-escalate decision is now ONE lazy
    # plan instead of an eager ``isEmpty`` probe + ``persist`` at build
    # time (which executed the full topk during DataFrame construction,
    # left a persisted result behind, and cost 2-3 extra jobs per
    # call). The brute branch streams the memoized NARROW index table
    # ``pts`` — the same rows as ``points`` with null coordinates
    # dropped (null-coordinate points can never be nearest neighbors;
    # the brute-force oracle filters them too) — so when every query
    # certifies, the escalation branch costs one scan of the
    # checkpointed (id, lat, lng) table joined against an empty
    # broadcast, not a second pass over the corpus pipeline. The
    # shared topk subtree's window exchange is reused across the
    # certified and escalation branches (ReuseExchange), so nothing is
    # computed twice at scale.
    min_width = MIN_WIDTH_METRIC.value(level)
    max_certified_chord2 = (2 * math.sin(min(math.pi, min_width) / 2)) ** 2
    per_q = topk.groupBy(query_id).agg(
        F.max("chord2").alias("_kth"), F.count("*").alias("_n")
    )
    certified = per_q.filter(
        (F.col("_n") >= k) & (F.col("_kth") <= F.lit(max_certified_chord2))
    ).select(query_id)
    # Escalations derive from QUERIES, not from topk: a query whose 3x3
    # neighborhood holds zero candidates never appears in per_q at all
    # and must still fall back to brute force.
    bad_q = queries.join(certified, query_id, "left_anti")
    brute = pts.drop("_cell").crossJoin(F.broadcast(bad_q))
    brute_topk = (
        brute.withColumn(
            "chord2",
            F.round(_chord2_sql("lat", "lng", "qlat", "qlng"), 12),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, point_id, "chord2", "rank")
    )
    good = topk.join(F.broadcast(certified), query_id, "left_semi")
    return good.unionByName(brute_topk)


def polygon_pair_join(
    spark: SparkSession, ts_a, ts_b
) -> list[tuple[object, object]]:
    """Candidate + exact pairs between two driver-side tile sets.

    Candidates via covering-range overlap on the Hilbert line (the
    reference's RangeIterator dual sweep, SURVEY §2.5), refined with
    exact polygon intersection. Tile sets are driver-sized objects; the
    sweep is O(cells log cells).
    """
    events = []  # (key, end, side, tile)
    for side, ts in ((0, ts_a), (1, ts_b)):
        seg = ts.seg_start
        for s in range(len(seg) - 1):
            for j in range(ts.csr_off[s], ts.csr_off[s + 1]):
                events.append((int(seg[s]), int(seg[s + 1]) - 1, side, int(ts.csr_tile[j])))
    events.sort()
    # sweep: active intervals per side
    candidates = set()
    active: list[tuple[int, int, int]] = []  # (end, side, tile)
    for start, end, side, tile in events:
        active = [a for a in active if a[0] >= start]
        for a_end, a_side, a_tile in active:
            if a_side != side:
                pair = (a_tile, tile) if side == 1 else (tile, a_tile)
                candidates.add(pair)
        active.append((end, side, tile))

    out = []
    for ia, ib in sorted(candidates):
        sa = ts_a.shapes[ia]
        sb = ts_b.shapes[ib]
        if _shapes_intersect(sa, sb):
            out.append((ts_a.tile_ids[ia], ts_b.tile_ids[ib]))
    return out


def rect_intersects_polygon(rect, poly) -> bool:
    """EXACT rect/polygon intersection, the same recipe as the
    reference's Rect.intersects(Cell) (Rect.ts:399-447) generalized to
    polygon loops: vertex containment both ways, then boundary
    crossings of every polygon edge against the rect's two meridian
    edges (geodesics, intersects_lng_edge) and two latitude edges
    (small circles — curved relative to geodesics,
    intersects_lat_edge)."""
    from ..geometry.interval import S1Interval
    from ..geometry.latlng import LatLng
    from ..geometry.rect import intersects_lat_edge, intersects_lng_edge

    if rect.is_empty():
        return False
    for loop in poly.loops:
        for v in loop.vertices:
            if rect.contains_latlng(LatLng.from_point(v)):
                return True
    for i in range(4):
        if poly.contains_point(rect.vertex(i).to_point()):
            return True
    if not rect.intersects(poly.rect_bound()):
        return False
    for loop in poly.loops:
        n = len(loop.vertices)
        for i in range(n):
            a = loop.vertices[i]
            b = loop.vertices[(i + 1) % n]
            lla = LatLng.from_point(a)
            llb = LatLng.from_point(b)
            edge_lng = S1Interval.from_endpoints(lla.lng, llb.lng)
            if not rect.lng.intersects(edge_lng):
                continue
            if edge_lng.contains(rect.lng.lo) and intersects_lng_edge(
                a, b, rect.lat, rect.lng.lo
            ):
                return True
            if edge_lng.contains(rect.lng.hi) and intersects_lng_edge(
                a, b, rect.lat, rect.lng.hi
            ):
                return True
            if intersects_lat_edge(a, b, rect.lat.lo, rect.lng):
                return True
            if intersects_lat_edge(a, b, rect.lat.hi, rect.lng):
                return True
    return False


def cap_intersects_polygon(cap, poly) -> bool:
    """EXACT cap/polygon intersection: center containment or any
    boundary edge within the cap's angular radius
    (edge_distances.distance_from_segment)."""
    from ..geometry.edge_distances import distance_from_segment

    if poly.contains_point(cap.center):
        return True
    r = cap.radius()
    for loop in poly.loops:
        n = len(loop.vertices)
        for i in range(n):
            if (
                distance_from_segment(
                    cap.center, loop.vertices[i], loop.vertices[(i + 1) % n]
                )
                <= r
            ):
                return True
    return False


def _shapes_intersect(a, b) -> bool:
    from ..geometry.cap import Cap
    from ..geometry.polygon import Polygon
    from ..geometry.rect import Rect

    if isinstance(a, Polygon) and isinstance(b, Polygon):
        return a.intersects(b)
    if isinstance(a, Rect) and isinstance(b, Rect):
        return a.intersects(b)
    if isinstance(a, Cap) and isinstance(b, Cap):
        return a.intersects(b)
    for x, y in ((a, b), (b, a)):
        if isinstance(x, Rect) and isinstance(y, Polygon):
            return rect_intersects_polygon(x, y)
        if isinstance(x, Cap) and isinstance(y, Polygon):
            return cap_intersects_polygon(x, y)
    # cap x rect: conservative bound check (APPROXIMATE — may report
    # touching bounds as intersecting; no exact cap/rect predicate in
    # the reference either)
    ra = a.rect_bound() if hasattr(a, "rect_bound") else None
    rb = b.rect_bound() if hasattr(b, "rect_bound") else None
    if ra is not None and rb is not None and not ra.intersects(rb):
        return False
    return True
