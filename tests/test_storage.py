"""Bucketed storage layout: exchange-free url-dedup (SURVEY §4.2).

The round-2 cluster scaling phase measured the flagship's one shuffle
(the url-dedup exchange) as the non-scaling term. These tests prove
the designed fix: a pages table stored hash-clustered by url makes
``dedup_latest``'s window run with ZERO Exchange in the physical plan
while producing exactly the unbucketed answer, and the layout survives
re-attachment from a fresh catalog (the multi-session scaling phase).
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from s2js_spark.spark.pipeline import dedup_latest, extract_geotags
from s2js_spark.spark.session import get_session
from s2js_spark.spark.storage import (
    ensure_bucketed,
    no_exchange_before_window,
    write_bucketed,
)


@pytest.fixture(scope="module")
def spark():
    s = get_session("local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def _pages_df(spark):
    return spark.range(2000).select(
        F.concat(F.lit("https://crawl.test/u"), (F.col("id") % 700).cast("string")).alias("url"),
        F.col("id").alias("doc_id"),
        F.timestamp_seconds(F.col("id") * 37 % 99991).alias("warc_ts"),
        F.encode(
            F.concat(
                F.lit('<html><meta name="geo.position" content="'),
                ((F.col("id") % 120) - 60.0).cast("double").cast("string"),
                F.lit(";"),
                ((F.col("id") % 300) - 150.0).cast("double").cast("string"),
                F.lit('"><body>t</body></html>'),
            ),
            "UTF-8",
        ).alias("html"),
        F.concat(F.lit("text-"), F.col("id").cast("string")).alias("text"),
        F.lit("en").alias("lang"),
    )


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bucketed") / "pages")
    shutil.rmtree(path, ignore_errors=True)
    df = _pages_df(spark)
    tbl = ensure_bucketed(spark, lambda: df, path, "pages_bucketed_test", "url", 8)
    yield tbl, path
    spark.sql("DROP TABLE IF EXISTS pages_bucketed_test")


def test_bucketed_dedup_has_no_exchange(spark, bucketed):
    tbl, _ = bucketed
    dd = dedup_latest(tbl)
    assert no_exchange_before_window(dd)
    # sanity: the unbucketed plan DOES have an exchange (the test means something)
    assert not no_exchange_before_window(dedup_latest(_pages_df(spark)))


def test_bucketed_dedup_matches_unbucketed(spark, bucketed):
    tbl, _ = bucketed
    got = sorted(
        (r["url"], r["doc_id"]) for r in dedup_latest(tbl).select("url", "doc_id").collect()
    )
    want = sorted(
        (r["url"], r["doc_id"])
        for r in dedup_latest(_pages_df(spark)).select("url", "doc_id").collect()
    )
    assert got == want
    assert len(got) == 700


def test_reattach_from_fresh_catalog(spark, bucketed):
    tbl, path = bucketed
    spark.sql("DROP TABLE pages_bucketed_test")  # simulate a fresh session
    tbl2 = ensure_bucketed(
        spark, lambda: 1 / 0, path, "pages_bucketed_test", "url", 8
    )  # df_builder must NOT be called: layout exists
    dd = dedup_latest(tbl2)
    assert no_exchange_before_window(dd)
    assert dd.count() == 700


def test_full_flagship_prefix_is_exchange_free(spark, bucketed):
    """scan -> geotag regex -> dedup window: zero shuffles end-to-end."""
    tbl, _ = bucketed
    dd = dedup_latest(extract_geotags(tbl))
    assert no_exchange_before_window(dd)
    n = dd.filter(F.col("lat").isNotNull()).count()
    assert n == 700


def test_bucketed_join_is_colocated(spark, bucketed, tmp_path):
    """Two tables bucketed by url join WITHOUT any shuffle Exchange —
    the co-located join the layout buys for free (page table x per-url
    metadata at 10^12 docs)."""
    tbl, _ = bucketed
    meta = spark.range(400).select(
        F.concat(F.lit("https://crawl.test/u"), F.col("id").cast("string")).alias("url"),
        (F.col("id") % 7).alias("score"),
    )
    path = str(tmp_path / "meta")
    ensure_bucketed(spark, lambda: meta, path, "meta_bucketed_test", "url", 8)
    joined = spark.table("pages_bucketed_test").join(
        spark.table("meta_bucketed_test").hint("merge"), "url"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert not any(
        line.strip().lstrip("+-:* ").startswith("Exchange")
        for line in plan.splitlines()
    ), plan
    assert joined.count() > 0
    spark.sql("DROP TABLE IF EXISTS meta_bucketed_test")


def test_write_bucketed_one_file_per_bucket(spark, tmp_path):
    path = str(tmp_path / "pg")
    write_bucketed(_pages_df(spark), path, "pages_bucket_files_test", "url", 8)
    import glob
    import os

    files = [
        f
        for f in glob.glob(os.path.join(path, "*.parquet"))
        if not os.path.basename(f).startswith("_")
    ]
    assert len(files) == 8
    spark.sql("DROP TABLE IF EXISTS pages_bucket_files_test")


def test_resumable_bucketed_write_crash_resume(spark, tmp_path):
    """Round-4: the resumable sink and the bucketed layout are ONE
    mechanism — crash-injected write into a hash-clustered table,
    resume skips committed buckets and cleans uncommitted leftovers,
    and the re-attached table serves the dedup window with zero
    Exchange (HashPartitioning from the scan)."""
    from s2js_spark.spark.checkpoint import (
        attach_stage_bucketed,
        completed_buckets,
        manifest,
        resumable_write_bucketed,
    )
    from s2js_spark.spark.storage import _schema_ddl

    df = _pages_df(spark)
    path = str(tmp_path / "stage_bucketed")
    tbl = "stage_bucketed_test"
    try:
        with pytest.raises(RuntimeError, match="injected failure"):
            resumable_write_bucketed(
                df, path, tbl, "stageX", "fp1", key_col="url",
                n_buckets=8, fail_after_bucket=3,
            )
        done = completed_buckets(path, "stageX", "fp1")
        assert done == {0, 1, 2, 3}

        rep = resumable_write_bucketed(
            df, path, tbl, "stageX", "fp1", key_col="url", n_buckets=8
        )
        assert rep.buckets_skipped == [0, 1, 2, 3]
        assert rep.buckets_written == [4, 5, 6, 7]

        # manifest row counts reflect exactly the persisted files
        per_bucket = {
            m["bucket"]: m["row_count"]
            for m in manifest(path)
            if m["stage"] == "stageX"
        }
        assert sum(per_bucket.values()) == 2000

        # idempotent: a third call writes nothing
        rep2 = resumable_write_bucketed(
            df, path, tbl, "stageX", "fp1", key_col="url", n_buckets=8
        )
        assert rep2.buckets_written == []

        attached = attach_stage_bucketed(
            spark, path, tbl, _schema_ddl(df), key_col="url", n_buckets=8
        )
        assert attached.count() == 2000  # no dups from the crashed attempt
        dd = dedup_latest(attached)
        assert no_exchange_before_window(dd)
        assert dd.count() == 700
        got = sorted(
            (r["url"], r["doc_id"])
            for r in dd.select("url", "doc_id").collect()
        )
        want = sorted(
            (r["url"], r["doc_id"])
            for r in dedup_latest(df).select("url", "doc_id").collect()
        )
        assert got == want
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_resumable_bucketed_filter_matches_writer_spec(spark, tmp_path):
    """The resume filter pmod(hash(key), n) must equal the bucket id
    Spark's bucketed writer stamps into file names — otherwise resume
    would mix committed and uncommitted rows in one file bucket."""
    import os

    from s2js_spark.spark.checkpoint import (
        _file_bucket,
        resumable_write_bucketed,
    )

    df = _pages_df(spark)
    path = str(tmp_path / "spec_check")
    tbl = "spec_check_test"
    try:
        resumable_write_bucketed(
            df, path, tbl, "s", "fp", key_col="url", n_buckets=8
        )
        checked = 0
        for fn in os.listdir(path):
            if not fn.endswith(".parquet"):
                continue
            b = _file_bucket(fn)
            rows = spark.read.parquet(os.path.join(path, fn)).select(
                F.pmod(F.hash(F.col("url")), F.lit(8)).alias("calc")
            ).distinct().collect()
            assert [r["calc"] for r in rows] == [b], fn
            checked += 1
        assert checked >= 4
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_manifest_tolerates_torn_trailing_line(tmp_path):
    """A crash mid-append can tear the FINAL manifest line; resume
    must self-heal (the torn bucket was never committed). A malformed
    line anywhere else is real corruption and still raises."""
    import json

    import pytest

    from s2js_spark.spark.checkpoint import MANIFEST, manifest

    path = str(tmp_path / "torn")
    (tmp_path / "torn").mkdir()
    good = {"stage": "s", "input_fingerprint": "fp", "bucket": 0,
            "row_count": 10, "wall_sec": 0.1, "written_at": "t"}
    mp = tmp_path / "torn" / MANIFEST
    mp.write_text(json.dumps(good) + "\n" + '{"stage": "s", "bu')
    rows = manifest(path)
    assert rows == [good]

    # torn line NOT at the end -> raise
    mp.write_text('{"stage": "s", "bu\n' + json.dumps(good) + "\n")
    with pytest.raises(json.JSONDecodeError):
        manifest(path)


def test_resumable_bucketed_table_spec_mismatch_raises(spark, tmp_path):
    """CREATE TABLE IF NOT EXISTS silently reuses a pre-existing
    catalog table; if its LOCATION or bucket spec differs from the
    requested one, the write must fail loudly instead of landing data
    outside the manifested location."""
    import pytest

    from s2js_spark.spark.checkpoint import resumable_write_bucketed

    df = _pages_df(spark)
    tbl = "spec_mismatch_test"
    try:
        resumable_write_bucketed(
            df, str(tmp_path / "a"), tbl, "s", "fp", key_col="url",
            n_buckets=8,
        )
        with pytest.raises(ValueError, match="LOCATION"):
            resumable_write_bucketed(
                df, str(tmp_path / "b"), tbl, "s", "fp", key_col="url",
                n_buckets=8,
            )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_resumable_bucketed_foreign_file_raises(spark, tmp_path):
    """A parquet data file with no parseable bucket id in its name
    (foreign committer) must abort the resumable write before any
    cleanup or data movement."""
    import pytest

    from s2js_spark.spark.checkpoint import resumable_write_bucketed

    df = _pages_df(spark)
    path = tmp_path / "foreign"
    path.mkdir()
    rogue = path / "data.parquet"
    rogue.write_bytes(b"PAR1 not really parquet")
    tbl = "foreign_file_test"
    try:
        with pytest.raises(ValueError, match="bucket id"):
            resumable_write_bucketed(
                df, str(path), tbl, "s", "fp", key_col="url", n_buckets=8
            )
        assert rogue.exists()  # nothing deleted before the abort
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
