"""Parity of the all-JVM tag join (tagjoin.tag_tiles_pairs) with the
Arrow-kernel path (tiles.tag_tiles), including adversarial points on
polygon edges/vertices that exercise the triage-uncertified residual
path."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from s2js_spark.spark.session import get_session
from s2js_spark.spark.tagjoin import tag_candidates, tag_tiles_pairs
from s2js_spark.spark.tiles import build_tileset, tag_tiles

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = get_session("local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _tileset():
    import __spark_entry__ as e

    return build_tileset(e.PIP_TILES + e.RECT_TILES + e.CAP_TILES, max_cells=64)


def _pairs_set(df, key="url"):
    return {(r[key], int(r["tile_i"])) for r in df.collect()}


def test_pairs_match_kernel_on_corpus(spark):
    from s2js_spark.spark.pages import pages
    from s2js_spark.spark.pipeline import extract_geotags

    ts = _tileset()
    geo = extract_geotags(pages(spark, SF)).filter(F.col("lat").isNotNull())
    geo = geo.select("url", "lat", "lng")

    jvm = _pairs_set(tag_tiles_pairs(spark, geo, ts))
    kernel = _pairs_set(
        tag_tiles(spark, geo, ts).select(
            "url", F.explode("tile_idx").alias("tile_i")
        )
    )
    assert jvm == kernel
    assert len(jvm) > 0


def test_pairs_match_kernel_adversarial_boundary(spark):
    """Points exactly on / nanometers from polygon vertices and edge
    midpoints: the SQL triage must flag them and the exact residual job
    must reproduce the kernel's exact decision bit-for-bit."""
    import __spark_entry__ as e

    ts = build_tileset(e.PIP_TILES, max_cells=64)
    rows = []
    k = 0
    for _, geom in e.PIP_TILES:
        ring = geom["coordinates"][0]
        for lng, lat in ring:
            for dlat in (0.0, 1e-14, -1e-14):
                for dlng in (0.0, 1e-14, -1e-14):
                    rows.append((f"adv{k}", lat + dlat, lng + dlng))
                    k += 1
        for i in range(len(ring) - 1):
            mlng = (ring[i][0] + ring[i + 1][0]) / 2
            mlat = (ring[i][1] + ring[i + 1][1]) / 2
            rows.append((f"adv{k}", mlat, mlng))
            k += 1
    # plus clearly-inside / clearly-outside controls
    rows += [("in8", 1.0, 8.0), ("in9", 8.0, 29.0), ("out", 50.0, 50.0)]

    df = spark.createDataFrame(pd.DataFrame(rows, columns=["url", "lat", "lng"]))
    jvm = _pairs_set(tag_tiles_pairs(spark, df, ts))
    kernel = _pairs_set(
        tag_tiles(spark, df, ts).select("url", F.explode("tile_idx").alias("tile_i"))
    )
    assert jvm == kernel
    assert ("in8", 0) in jvm and ("in9", 1) in jvm
    assert not any(u == "out" for u, _ in jvm)


def test_certified_fraction_is_total_on_organic_data(spark):
    """On organic (non-adversarial) data zero lanes should need the
    exact residual pass — the certified one-pass plan is complete."""
    from s2js_spark.spark.pages import pages
    from s2js_spark.spark.pipeline import extract_geotags

    ts = _tileset()
    geo = extract_geotags(pages(spark, SF)).filter(F.col("lat").isNotNull())
    cand = tag_candidates(spark, geo.select("url", "lat", "lng"), ts)
    assert cand.filter(F.col("_uncert_poly")).count() == 0


def test_big_polygon_aggregate_path_matches_kernel(spark):
    """The 240-edge concave tile exceeds MAX_INLINE_EDGES, so its
    winding runs through the array-aggregate fallback — must agree
    with the Arrow-kernel path and need zero exact residuals on the
    organic corpus."""
    import __spark_entry__ as e
    from s2js_spark.spark.pages import pages
    from s2js_spark.spark.pipeline import extract_geotags
    from s2js_spark.spark.tagjoin import MAX_INLINE_EDGES

    ts = build_tileset(e.BIG_PIP_TILES, max_cells=64)
    n_edges = int(ts.edge_off[1] - ts.edge_off[0])
    assert n_edges > MAX_INLINE_EDGES  # really drives the fallback

    geo = extract_geotags(pages(spark, SF)).filter(F.col("lat").isNotNull())
    geo = geo.select("url", "lat", "lng")
    jvm = _pairs_set(tag_tiles_pairs(spark, geo, ts))
    kernel = _pairs_set(
        tag_tiles(spark, geo, ts).select("url", F.explode("tile_idx").alias("tile_i"))
    )
    assert jvm == kernel
    assert len(jvm) > 0
    cand = tag_candidates(spark, geo, ts)
    assert cand.filter(F.col("_uncert_poly")).count() == 0


def test_pairs_plan_stays_compact(spark):
    """Regression guard for the round-3 barrier fix: the refinement
    stack must appear ONCE in the executed plan (attribute references
    in the decision filter / residual UDF), not alias-substituted into
    the covering-join condition — that blow-up measured 530 KB of plan
    and ~2s of fixed per-execution cost."""
    from s2js_spark.spark.pages import pages
    from s2js_spark.spark.pipeline import extract_geotags

    ts = _tileset()
    geo = extract_geotags(pages(spark, SF)).filter(F.col("lat").isNotNull())
    pairs = tag_tiles_pairs(spark, geo.select("url", "lat", "lng"), ts)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert len(plan) < 200_000
    # decision inputs reach the residual UDF as attributes, not
    # re-inlined expressions
    udf_line = next(l for l in plan.splitlines() if "ArrowEvalPython" in l)
    assert len(udf_line) < 2_000


def test_rect_cap_sql_bitwise_vs_kernel(spark):
    """Dense sample near rect and cap boundaries: SQL refinement uses
    the same correctly-rounded op order as the kernel, so membership
    must agree everywhere (trig-input ulp caveat aside)."""
    import __spark_entry__ as e

    ts = build_tileset(e.RECT_TILES + e.CAP_TILES, max_cells=48)
    rng = np.random.default_rng(5)
    lat = np.concatenate(
        [
            rng.uniform(-27.6, -26.4, 3000),  # rect_c4 band
            rng.uniform(28.0, 30.0, 3000),  # cap_c12 band
        ]
    )
    lng = np.concatenate(
        [rng.uniform(-77.0, -75.0, 3000), rng.uniform(91.0, 93.0, 3000)]
    )
    pdf = pd.DataFrame(
        {"url": [f"p{i}" for i in range(len(lat))], "lat": lat, "lng": lng}
    )
    df = spark.createDataFrame(pdf)
    jvm = _pairs_set(tag_tiles_pairs(spark, df, ts))
    kernel = _pairs_set(
        tag_tiles(spark, df, ts).select("url", F.explode("tile_idx").alias("tile_i"))
    )
    assert jvm == kernel
    assert len(jvm) > 100


def test_registered_predicate_functions(spark):
    """SQL-callable s2_point_in_polygon / s2_rect_contains /
    s2_cap_contains agree with the tag-join decisions."""
    import json
    import pandas as pd
    from s2js_spark.spark.functions import register_all
    import __spark_entry__ as e

    register_all(spark)
    gj = json.dumps(e.PIP_TILES[0][1])
    df = spark.createDataFrame(
        pd.DataFrame({"lat": [1.0, 1.69, 50.0], "lng": [8.0, 8.0, 50.0]})
    )
    df.createOrReplaceTempView("pts")
    got = spark.sql(
        f"""SELECT
          s2_point_in_polygon(lat, lng, '{gj}') AS pip,
          s2_rect_contains(lat, lng, -27.4D, -26.6D, -76.8D, -75.2D) AS rc,
          s2_cap_contains(lat, lng, 29.0D, 92.0D, 0.8D) AS cc
        FROM pts"""
    ).collect()
    assert [r.pip for r in got] == [True, True, False]
    assert [r.rc for r in got] == [False, False, False]
    assert [r.cc for r in got] == [False, False, False]
    df2 = spark.createDataFrame(
        pd.DataFrame({"lat": [-27.0, 29.0], "lng": [-76.0, 92.0]})
    )
    df2.createOrReplaceTempView("pts2")
    got2 = spark.sql(
        """SELECT s2_rect_contains(lat, lng, -27.4D, -26.6D, -76.8D, -75.2D) AS rc,
                  s2_cap_contains(lat, lng, 29.0D, 92.0D, 0.8D) AS cc FROM pts2"""
    ).collect()
    assert [r.rc for r in got2] == [True, False]
    assert [r.cc for r in got2] == [False, True]
