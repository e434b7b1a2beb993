"""Streaming operator tests: the tag join runs incrementally on a
stream and reproduces the batch answer; sessionization via
applyInPandasWithState closes sessions at event-time gaps."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from s2js_spark.spark.session import get_session
from s2js_spark.spark.streaming import sessionize_events, streaming_tag_pairs
from s2js_spark.spark.tagjoin import tag_tiles_pairs
from s2js_spark.spark.tiles import build_tileset

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    s = get_session("local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_streaming_tag_pairs_equals_batch(spark, tmp_path):
    """File-source stream of geotagged pages -> tag pairs (availableNow)
    must equal the batch tag join on the same rows."""
    import __spark_entry__ as e
    from s2js_spark.spark.pages import pages
    from s2js_spark.spark.pipeline import extract_geotags

    ts = build_tileset(e.PIP_TILES + e.RECT_TILES, max_cells=48)
    geo = (
        extract_geotags(pages(spark, SF))
        .filter(F.col("lat").isNotNull())
        .select("url", "lat", "lng")
    )
    src = str(tmp_path / "geo_src")
    geo.write.mode("overwrite").parquet(src)

    batch = {
        (r.url, r.tile_i)
        for r in tag_tiles_pairs(
            spark, spark.read.parquet(src), ts, exact_residuals=False
        ).collect()
    }

    stream = spark.readStream.schema(geo.schema).parquet(src)
    tagged = streaming_tag_pairs(spark, stream, ts)
    out_dir = str(tmp_path / "out")
    q = (
        tagged.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.url, r.tile_i) for r in spark.read.parquet(out_dir).collect()}
    assert got == batch
    assert len(got) > 0


def test_sessionize_events_closed_sessions(spark, tmp_path):
    """applyInPandasWithState sessionization (streaming, availableNow):
    sessions split at >gap event-time silence; closed sessions are
    emitted immediately, open tails only via timeout (next test)."""
    rows = [
        ("click", 0.0, 1.0),
        ("click", 600.0, 1.0),
        ("click", 3000.0, 2.0),  # > 1800s after 600 -> new session
        ("click", 3300.0, 1.0),
        ("click", 9000.0, 5.0),  # third session (stays open)
        ("view", 100.0, 1.0),
        ("view", 5000.0, 1.0),  # second view session (stays open)
    ]
    pdf = pd.DataFrame(rows, columns=["event_type", "ts_sec", "value"])
    src = str(tmp_path / "ev_src_b")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        sessionize_events(stream, gap_seconds=1800.0)
        .writeStream.format("memory")
        .queryName("sess_closed")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    sessions = {
        (r.event_type, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM sess_closed").collect()
    }
    assert ("click", 0.0, 600.0, 2, 2.0) in sessions
    assert ("click", 3000.0, 3300.0, 2, 3.0) in sessions
    assert ("view", 100.0, 100.0, 1, 1.0) in sessions


def test_sessionize_vectorized_matches_scalar_reference(spark, tmp_path):
    """Fuzz the vectorized batch interior (cumulative gap split +
    reduceat) against a plain scalar sessionizer, across MULTIPLE
    micro-batches so the state/batch seam (carried-session merge and
    carried-session close) is exercised."""
    import numpy as np

    rng = np.random.RandomState(11)
    gap = 100.0
    rows = []
    for etype in ("a", "b"):
        t = 0.0
        for _ in range(300):
            t += float(rng.choice([1.0, 5.0, 250.0], p=[0.6, 0.3, 0.1]))
            rows.append((etype, t, float(rng.randint(1, 5))))
    pdf = pd.DataFrame(rows, columns=["event_type", "ts_sec", "value"])

    # scalar reference (closed sessions only — the open tail stays in
    # state because no timeout fires under availableNow)
    want = set()
    open_tail = {}
    for etype, grp in pdf.groupby("event_type"):
        g = grp.sort_values("ts_sec")
        s0 = s1 = None
        n, sv = 0, 0.0
        for t, v in zip(g["ts_sec"], g["value"]):
            if s0 is None:
                s0, s1, n, sv = t, t, 1, v
            elif t - s1 > gap:
                want.add((etype, s0, s1, n, sv))
                s0, s1, n, sv = t, t, 1, v
            else:
                s1, n, sv = t, n + 1, sv + v
        open_tail[etype] = (s0, s1, n, sv)

    # two files -> two micro-batches (maxFilesPerTrigger=1): the split
    # lands mid-stream, so batch 2 both merges into and closes carried
    # sessions
    src = str(tmp_path / "ev_fuzz")
    half = len(pdf) // 2
    pdf_sorted = pdf.sort_values("ts_sec").reset_index(drop=True)
    spark.createDataFrame(pdf_sorted.iloc[:half]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    spark.createDataFrame(pdf_sorted.iloc[half:]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        # huge timeout: open tails must NOT flush mid-test even when a
        # slow run spaces the micro-batches > the default 30s apart
        sessionize_events(stream, gap_seconds=gap, timeout_ms=3_600_000)
        .writeStream.format("memory")
        .queryName("sess_fuzz")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.event_type, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM sess_fuzz").collect()
    }
    assert got == want


def test_sessionize_late_within_gap_across_seam(spark, tmp_path):
    """Regression (round-4): an event arriving in a LATER micro-batch
    with ts <= the carried session's end but within the gap must merge
    into the carried session — gap decisions use the running max across
    the state seam, so the operator never emits an inverted session
    (end < start). Scenario from the round-3 review: carried
    (s0=100, s1=100), next batch [95, 128, 1000] with gap=30 must
    produce ONE closed session (100, 128, n=3), not an invalid
    (100, 95, n=2) plus a spurious session at 128."""
    src = str(tmp_path / "ev_late")
    b1 = pd.DataFrame(
        [("click", 100.0, 1.0)], columns=["event_type", "ts_sec", "value"]
    )
    b2 = pd.DataFrame(
        [("click", 95.0, 1.0), ("click", 128.0, 1.0), ("click", 1000.0, 9.0)],
        columns=["event_type", "ts_sec", "value"],
    )
    spark.createDataFrame(b1).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(b2).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        sessionize_events(stream, gap_seconds=30.0, timeout_ms=3_600_000)
        .writeStream.format("memory")
        .queryName("sess_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.event_type, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM sess_late").collect()
    }
    assert got == {("click", 100.0, 128.0, 3, 3.0)}
    for _, s0, s1, _, _ in got:
        assert s1 >= s0


def test_sessionize_events_streaming_with_timeout(spark, tmp_path):
    """On a stream, the final open session flushes via the processing
    -time timeout after the source runs dry."""
    rows = [("click", float(t), 1.0) for t in (0, 100, 5000)]
    pdf = pd.DataFrame(rows, columns=["event_type", "ts_sec", "value"])
    src = str(tmp_path / "ev_src")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    sessions = sessionize_events(stream, gap_seconds=1800.0, timeout_ms=2000)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time

        deadline = time.time() + 60
        want = {("click", 0.0, 100.0, 2, 2.0), ("click", 5000.0, 5000.0, 1, 1.0)}
        got = set()
        while time.time() < deadline and got != want:
            time.sleep(2)
            got = {
                (r.event_type, r.session_start, r.session_end, r.n_events, r.sum_value)
                for r in spark.sql("SELECT * FROM sess_out").collect()
            }
        assert got == want
    finally:
        q.stop()
