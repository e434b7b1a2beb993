"""kNN ring-expansion join and polygon-pair join correctness."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from s2js_spark.spark import functions as s2f
from s2js_spark.spark.session import get_session


@pytest.fixture(scope="module")
def spark():
    s = get_session("local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_knn_join_matches_brute_force(spark):
    from s2js_spark.spark.joins import knn_join

    rng = np.random.RandomState(13)
    pts = [
        (int(i), float(46.0 + rng.uniform(-2, 2)), float(6.0 + rng.uniform(-3, 3)))
        for i in range(3000)
    ]
    # plus far-away outliers and a sparse region to force escalation paths
    pts += [(9000 + i, float(-45 + i), float(120.0)) for i in range(4)]
    points = spark.createDataFrame(pts, ["id", "lat", "lng"])
    queries = spark.createDataFrame(
        [(0, 46.0, 6.0), (1, 47.5, 8.5), (2, -44.0, 120.0), (3, 45.2, 4.1)],
        ["query_id", "qlat", "qlng"],
    )

    got = knn_join(spark, points, queries, k=5).toPandas()

    brute = points.crossJoin(F.broadcast(queries))
    chord2 = F.round(s2f.s2_chord2("lat", "lng", "qlat", "qlng"), 12)
    w = Window.partitionBy("query_id").orderBy(F.col("chord2"), F.col("id"))
    want = (
        brute.withColumn("chord2", chord2)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "id", "chord2", "rank")
        .toPandas()
    )

    g = got.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = want.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert g[["query_id", "id", "rank"]].equals(b[["query_id", "id", "rank"]])


def test_polygon_pair_join(spark):
    from s2js_spark.spark.joins import polygon_pair_join
    from s2js_spark.spark.tiles import build_tileset
    from tests.test_tiles_kernel import _polygon_geojson

    a = build_tileset(
        [
            ("a0", _polygon_geojson(10.0, 10.0, 1.0)),
            ("a1", _polygon_geojson(20.0, 20.0, 1.0)),
        ],
        max_cells=24,
    )
    b = build_tileset(
        [
            ("b0", _polygon_geojson(10.5, 10.5, 1.0)),  # overlaps a0
            ("b1", _polygon_geojson(-30.0, -30.0, 1.0)),  # disjoint
            ("b2", _polygon_geojson(20.0, 22.1, 0.8)),  # near a1 but disjoint
        ],
        max_cells=24,
    )
    pairs = polygon_pair_join(spark, a, b)
    assert ("a0", "b0") in pairs
    assert all(p[1] != "b1" for p in pairs)
    # b2's polygon is ~0.5 deg from a1's edge: candidate by covering,
    # must be refined away exactly
    assert ("a1", "b2") not in pairs
