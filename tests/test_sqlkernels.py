"""Parity of the pure-SQL (JVM) S2 kernels vs the NumPy kernels.

The (face,i,j) -> id Hilbert stage and all hierarchy bit-ops are exact
integer arithmetic — bitwise equality is asserted on dense random
inputs. The full (lat,lng) -> id chain shares every correctly-rounded
stage; only cos/sin can differ by 1 ulp between libms (see
sqlkernels.py docstring), which flips a leaf id only within ~2^-51 of
a cell boundary — asserted zero-mismatch on the real test corpus plus
a 200k-point deterministic sample.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from s2js_spark.kernels import cellid as kc
from s2js_spark.spark import sqlkernels as sq
from s2js_spark.spark.session import get_session

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = get_session("local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_hilbert_encode_exhaustive_random(spark):
    """(face,i,j) -> id bitwise equality on 50k random triples covering
    all faces and the full 30-bit i/j range (trig-free: exact)."""
    rng = np.random.default_rng(7)
    n = 50_000
    f = rng.integers(0, 6, n)
    i = rng.integers(0, 1 << 30, n)
    j = rng.integers(0, 1 << 30, n)
    # include the extreme corners on every face
    corners = np.array([0, (1 << 30) - 1], dtype=np.int64)
    for ff in range(6):
        for ci in corners:
            for cj in corners:
                f = np.append(f, ff)
                i = np.append(i, ci)
                j = np.append(j, cj)

    expected = kc.to_int64(kc.from_face_ij(f, i, j))

    pdf = pd.DataFrame({"f": f, "i": i, "j": j})
    df = spark.createDataFrame(pdf)
    out = sq.with_s2_cellid_from_face_ij(df, "f", "i", "j", out_col="cid")
    got = out.select("cid").toPandas()["cid"].to_numpy(np.int64)
    assert (got == expected).all()


def test_latlng_chain_parity_corpus(spark):
    """Full-chain equality on every geotag in the sf0.001 corpus."""
    from s2js_spark.spark.pages import pages
    from s2js_spark.spark.pipeline import extract_geotags

    df = extract_geotags(pages(spark, SF)).filter(F.col("lat").isNotNull())
    out = sq.with_s2_cellid(df, out_col="cid_sql").select("lat", "lng", "cid_sql")
    pdf = out.toPandas()
    expected = kc.to_int64(
        kc.from_latlng_degrees(pdf["lat"].to_numpy(), pdf["lng"].to_numpy())
    )
    assert (pdf["cid_sql"].to_numpy(np.int64) == expected).all()


def test_latlng_chain_parity_sample(spark):
    """200k deterministic pseudorandom points, global coverage."""
    rng = np.random.default_rng(1234)
    lat = np.concatenate(
        [rng.uniform(-90, 90, 100_000), np.linspace(-89.9, 89.9, 50_000)]
    )
    lng = np.concatenate(
        [rng.uniform(-180, 180, 100_000), np.linspace(-179.9, 179.9, 50_000)]
    )
    pdf = pd.DataFrame({"lat": lat, "lng": lng})
    df = spark.createDataFrame(pdf)
    out = sq.with_s2_cellid(df, out_col="cid_sql").select("lat", "lng", "cid_sql")
    res = out.toPandas()
    expected = kc.to_int64(
        kc.from_latlng_degrees(res["lat"].to_numpy(), res["lng"].to_numpy())
    )
    got = res["cid_sql"].to_numpy(np.int64)
    n_mismatch = int((got != expected).sum())
    assert n_mismatch == 0, f"{n_mismatch} / {len(got)} ids differ"


def test_null_latlng_gives_null(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"lat": [1.0, None, 3.0], "lng": [2.0, 5.0, None]})
    )
    out = sq.with_s2_cellid(df, out_col="cid").toPandas()
    assert out["cid"].isna().tolist() == [False, True, True]


def test_hierarchy_sql_columns(spark):
    """parent/level/flip/range/token SQL twins vs NumPy kernels."""
    rng = np.random.default_rng(99)
    lat = rng.uniform(-90, 90, 20_000)
    lng = rng.uniform(-180, 180, 20_000)
    ids = kc.from_latlng_degrees(lat, lng)
    pdf = pd.DataFrame({"cid": kc.to_int64(ids)})
    df = spark.createDataFrame(pdf)
    out = df.select(
        "cid",
        sq.s2_parent_sql("cid", 10).alias("p10"),
        sq.s2_parent_sql("cid", 0).alias("p0"),
        sq.s2_flip_key_sql("cid").alias("fk"),
        sq.s2_range_min_sql(sq.s2_parent_sql("cid", 12)).alias("rmin"),
        sq.s2_range_max_sql(sq.s2_parent_sql("cid", 12)).alias("rmax"),
        sq.s2_token_sql("cid").alias("tok"),
        sq.s2_token_sql(sq.s2_parent_sql("cid", 4)).alias("tok4"),
    ).toPandas()
    assert (out["p10"].to_numpy(np.int64) == kc.to_int64(kc.parent(ids, 10))).all()
    assert (out["p0"].to_numpy(np.int64) == kc.to_int64(kc.parent(ids, 0))).all()
    assert (out["fk"].to_numpy(np.int64) == kc.flip_key(ids)).all()
    p12 = kc.parent(ids, 12)
    assert (out["rmin"].to_numpy(np.int64) == kc.to_int64(kc.range_min(p12))).all()
    assert (out["rmax"].to_numpy(np.int64) == kc.to_int64(kc.range_max(p12))).all()
    assert (out["tok"].to_numpy() == kc.to_token(ids)).all()
    assert (out["tok4"].to_numpy() == kc.to_token(kc.parent(ids, 4))).all()


def test_level_sql_all_levels(spark):
    ids = kc.from_latlng_degrees(np.array([47.5]), np.array([8.5]))
    all_lv = np.concatenate([kc.parent(ids, lv) for lv in range(31)])
    df = spark.createDataFrame(pd.DataFrame({"cid": kc.to_int64(all_lv)}))
    out = df.select(sq.s2_level_sql("cid").alias("lv")).toPandas()
    assert out["lv"].tolist() == list(range(31))


def test_token_sql_zero_is_x(spark):
    df = spark.createDataFrame(pd.DataFrame({"cid": [0]}))
    out = df.select(sq.s2_token_sql("cid").alias("t")).toPandas()
    assert out["t"].tolist() == ["X"]
