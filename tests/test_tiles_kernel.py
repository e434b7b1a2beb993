"""The broadcast tile index + refinement kernel must agree exactly
with the driver-side geometry objects (engine test plan, SURVEY §5)."""

from __future__ import annotations

import math

import numpy as np

from s2js_spark.geometry.cap import Cap
from s2js_spark.geometry.geojson import from_geojson
from s2js_spark.geometry.interval import R1Interval, S1Interval
from s2js_spark.geometry.latlng import LatLng
from s2js_spark.geometry.point import Point
from s2js_spark.geometry.rect import Rect
from s2js_spark.kernels import cellid as kc
from s2js_spark.spark.tiles import (
    build_tileset,
    candidates_for_leaves,
    refine_candidates,
)

D = math.pi / 180


def _polygon_geojson(center_lat, center_lng, r_deg, n=12, twist=0.0):
    pts = []
    for i in range(n):
        a = 2 * math.pi * i / n + twist
        pts.append([center_lng + r_deg * math.cos(a), center_lat + r_deg * math.sin(a)])
    pts.append(pts[0])
    return {"type": "Polygon", "coordinates": [pts]}


def _tag_exact(shapes, lat, lng):
    out = []
    for la, ln in zip(lat, lng):
        p = Point.from_latlng_degrees(la, ln)
        tags = []
        for t, s in enumerate(shapes):
            if isinstance(s, Rect):
                inside = s.contains_latlng(LatLng.from_degrees(la, ln))
            elif isinstance(s, Cap):
                inside = s.contains_point(p)
            else:
                inside = s.contains_point(p)
            if inside:
                tags.append(t)
        out.append(tags)
    return out


def test_tileset_matches_exact_geometry():
    tiles = [
        ("poly_geneva", _polygon_geojson(46.2, 6.1, 0.6)),
        ("poly_overlap", _polygon_geojson(46.4, 6.4, 0.5, n=7, twist=0.3)),
        (
            "rect_alps",
            Rect(
                R1Interval(45.8 * D, 46.3 * D),
                S1Interval.from_endpoints(5.9 * D, 6.6 * D),
            ),
        ),
        ("cap_lyon", Cap.from_center_angle(Point.from_latlng_degrees(45.75, 4.85), 0.02)),
    ]
    ts = build_tileset(tiles, max_cells=32)
    shapes = ts.shapes

    rng = np.random.RandomState(5)
    lat = 45.5 + rng.uniform(0, 1.2, 4000)
    lng = 4.5 + rng.uniform(0, 2.4, 4000)

    leaf = kc.from_latlng_degrees(lat, lng)
    doc_idx, tile, interior = candidates_for_leaves(ts, leaf)
    doc_idx, tile = refine_candidates(ts, doc_idx, tile, interior, lat, lng)

    got = [[] for _ in range(len(lat))]
    for di, ti in zip(doc_idx, tile):
        got[di].append(int(ti))
    got = [sorted(g) for g in got]

    want = [sorted(w) for w in _tag_exact(shapes, lat, lng)]
    n_bad = sum(1 for g, w in zip(got, want) if g != w)
    assert n_bad == 0, f"{n_bad} docs mismatch exact geometry"
    # sanity: each region caught a healthy number of docs
    counts = np.bincount(
        np.concatenate([np.array(w, dtype=int) for w in want if w]) if any(want) else np.array([], dtype=int),
        minlength=4,
    )
    assert (counts > 20).all(), counts


def test_tileset_interior_cells_marked():
    tiles = [("big", _polygon_geojson(10.0, 20.0, 3.0, n=16))]
    ts = build_tileset(tiles, max_cells=128)
    # a healthy chunk of a large polygon covering must be interior cells
    assert ts.csr_interior.sum() > 0


def test_antimeridian_rect():
    tiles = [
        (
            "fiji",
            Rect(
                R1Interval(-20 * D, -15 * D),
                S1Interval.from_endpoints(177 * D, -177 * D),  # wraps
            ),
        )
    ]
    ts = build_tileset(tiles, max_cells=32)
    lat = np.array([-17.0, -17.0, -17.0, -30.0])
    lng = np.array([179.5, -179.5, 170.0, 179.0])
    leaf = kc.from_latlng_degrees(lat, lng)
    doc_idx, tile, interior = candidates_for_leaves(ts, leaf)
    doc_idx, tile = refine_candidates(ts, doc_idx, tile, interior, lat, lng)
    hits = sorted(set(doc_idx.tolist()))
    assert hits == [0, 1], hits
