"""Resumable, lineage-tracked stage outputs.

The north rule requires checkpointed stage outputs with per-partition
lineage and row-count metrics, resumable after failure. The design is
Iceberg-snapshot-shaped (this container has no Iceberg runtime jar, so
the same contract is implemented over partitioned parquet + a manifest
sidecar; swapping the writer for `.writeTo(table).append()` with
snapshot summary properties is a one-function change):

- stage outputs are written bucket-by-bucket, partitioned by a stable
  hash bucket of a key column (``pmod(xxhash64(key), n_buckets)``);
- every completed bucket gets a manifest row
  (stage, input_fingerprint, bucket, row_count, wall_sec, written_at);
- on restart with the same (stage, input_fingerprint), completed
  buckets are skipped — the anti-join resume of SURVEY §2.12;
- metrics are first-class: ``manifest(path)`` returns the per-bucket
  row counts for observability / invariant checks.
"""

from __future__ import annotations

import json
import os
import re
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_s2js_manifest.jsonl"


@dataclass
class WriteReport:
    stage: str
    input_fingerprint: str
    buckets_written: list[int]
    buckets_skipped: list[int]
    rows_written: int


def _manifest_path(path: str) -> str:
    return os.path.join(path, MANIFEST)


def manifest(path: str) -> list[dict]:
    """Parsed manifest rows. A crash mid-append can tear the FINAL
    line (partial JSON); tolerating exactly that line keeps resume
    self-healing — the torn bucket was never committed, so it simply
    rewrites. A malformed line anywhere else is real corruption and
    still raises."""
    mp = _manifest_path(path)
    if not os.path.exists(mp):
        return []
    with open(mp) as f:
        lines = [ln for ln in f if ln.strip()]
    out: list[dict] = []
    for i, line in enumerate(lines):
        try:
            out.append(json.loads(line))
        except json.JSONDecodeError:
            if i == len(lines) - 1:
                break  # torn trailing line from a crashed append
            raise
    return out


def _append_manifest(path: str, entry: dict) -> None:
    os.makedirs(path, exist_ok=True)
    with open(_manifest_path(path), "a") as f:
        f.write(json.dumps(entry) + "\n")


def completed_buckets(path: str, stage: str, input_fingerprint: str) -> set[int]:
    return {
        m["bucket"]
        for m in manifest(path)
        if m["stage"] == stage and m["input_fingerprint"] == input_fingerprint
    }


def _bucket_row_count(path: str, bucket: int) -> int:
    """Row count of a written bucket from parquet FOOTERS only (pure
    driver-side metadata read — no Spark job, no data scan)."""
    import pyarrow.parquet as pq

    bucket_dir = os.path.join(path, f"bucket={bucket}")
    total = 0
    for root, _dirs, files in os.walk(bucket_dir):
        for fn in files:
            if fn.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, fn)).metadata.num_rows
    return total


def resumable_write(
    df: DataFrame,
    path: str,
    stage: str,
    input_fingerprint: str,
    key_col: str,
    n_buckets: int = 16,
    fail_after_bucket: int | None = None,
) -> WriteReport:
    """Write df to ``path`` partitioned by hash bucket, resumably.

    ONE pass over the input: pending buckets (not in the manifest for
    this (stage, input_fingerprint)) are written by a single
    ``partitionBy`` job with dynamic partition overwrite — a crashed
    attempt's partial bucket files are replaced wholesale on resume,
    completed buckets are never touched. Row counts come from the
    written files' parquet footers (driver-side metadata read), so the
    manifest reflects exactly the persisted data and the input is
    never recomputed — at 100 TB the round-1 per-bucket loop cost
    2 x n_buckets full scans; this costs one.

    ``fail_after_bucket`` injects a crash for tests: the data job
    completes but manifest rows are recorded only for buckets <= the
    given bucket, simulating dying between commit and bookkeeping.
    """
    done = completed_buckets(path, stage, input_fingerprint)
    pending = [b for b in range(n_buckets) if b not in done]
    skipped = sorted(done)
    if not pending:
        return WriteReport(stage, input_fingerprint, [], skipped, 0)

    t0 = time.time()
    bucketed = df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")
    ).filter(F.col("bucket").isin(pending))
    (
        bucketed.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(path)
    )
    wall = round(time.time() - t0, 3)

    written: list[int] = []
    total_rows = 0
    for b in pending:
        n = _bucket_row_count(path, b)
        _append_manifest(
            path,
            {
                "stage": stage,
                "input_fingerprint": input_fingerprint,
                "bucket": b,
                "row_count": n,
                "wall_sec": wall,
                "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            },
        )
        written.append(b)
        total_rows += n
        if fail_after_bucket is not None and b >= fail_after_bucket:
            raise RuntimeError(f"injected failure after bucket {b}")
    return WriteReport(stage, input_fingerprint, written, skipped, total_rows)


def read_stage(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(path, "bucket=*"))


# ---------------------------------------------------------------------------
# Resumable sink over the BUCKETED storage layout (round-4): the
# scaling corpus lives as a parquet-bucketed table (storage.py) so the
# dedup window runs Exchange-free, but the round-3 resumable sink wrote
# a directory-partitioned layout — a 10^12-doc pipeline wants BOTH
# resume-by-bucket and exchange-free downstream reads from the same
# files. Here the unit of resume IS the murmur3 bucket Spark's
# bucketed writer assigns (F.hash == Murmur3Hash(seed 42);
# HashPartitioning.partitionIdExpression == pmod(hash, n) — asserted
# in tests), and the finished table re-attaches via storage.
# register_bucketed so downstream plans see HashPartitioning(key, n).
# ---------------------------------------------------------------------------

_BUCKET_FILE_RE = re.compile(r"_(\d{5})(?:\.|$)")


def _file_bucket(fn: str) -> int | None:
    """Bucket id from a bucketed parquet file name
    (part-00000-<uuid>_00003.c000.snappy.parquet -> 3)."""
    m = _BUCKET_FILE_RE.search(fn)
    return int(m.group(1)) if m else None


def _bucketed_file_counts(path: str) -> dict[int, int]:
    """Per-bucket row counts from parquet FOOTERS (driver-side
    metadata only, no Spark job).

    A data file whose name carries no parseable ``_NNNNN`` bucket id
    means the layout was written by a different committer than Spark's
    bucketed writer — silently skipping it would commit pending
    buckets with row_count 0 and leave stale files invisible to
    cleanup, so it raises instead."""
    import pyarrow.parquet as pq

    counts: dict[int, int] = {}
    if not os.path.isdir(path):
        return counts
    for fn in os.listdir(path):
        if not fn.endswith(".parquet"):
            continue
        b = _file_bucket(fn)
        if b is None:
            raise ValueError(
                f"parquet file without a bucket id in its name at the"
                f" bucketed table location: {os.path.join(path, fn)}"
                " (expected Spark bucketed-writer naming"
                " part-...-<uuid>_NNNNN...parquet)"
            )
        n = pq.ParquetFile(os.path.join(path, fn)).metadata.num_rows
        counts[b] = counts.get(b, 0) + n
    return counts


def _verify_table_spec(
    spark: SparkSession, table: str, path: str, key_col: str, n_buckets: int
) -> None:
    """Assert the catalog table's LOCATION and bucket spec match the
    requested ones (see the CREATE TABLE IF NOT EXISTS caveat at the
    call site)."""
    info = {
        r["col_name"].strip(): (r["data_type"] or "").strip()
        for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect()
        if r["col_name"]
    }
    loc = info.get("Location", "")
    loc_path = re.sub(r"^[a-z]+:(//)?", "", loc)
    if os.path.realpath(loc_path) != os.path.realpath(path):
        raise ValueError(
            f"catalog table {table} already exists with LOCATION"
            f" {loc!r}, not the requested path {path!r} — drop or"
            " rename the table (resumable writes would otherwise land"
            " outside the manifested location)"
        )
    buckets = info.get("Num Buckets", "")
    cols = info.get("Bucket Columns", "")
    if buckets != str(n_buckets) or key_col not in cols:
        raise ValueError(
            f"catalog table {table} bucket spec ({cols} INTO {buckets})"
            f" does not match the requested CLUSTERED BY ({key_col})"
            f" INTO {n_buckets} BUCKETS"
        )


def resumable_write_bucketed(
    df: DataFrame,
    path: str,
    table: str,
    stage: str,
    input_fingerprint: str,
    key_col: str = "url",
    n_buckets: int = 16,
    fail_after_bucket: int | None = None,
) -> WriteReport:
    """Resumable write INTO a hash-clustered (bucketed) table.

    Protocol (manifest = commit log, exactly like resumable_write):

    1. buckets already in the manifest for (stage, input_fingerprint)
       are committed — never touched again;
    2. files on disk whose bucket is NOT committed are leftovers of a
       crashed attempt (written, never manifested) — deleted before
       rewriting, giving wholesale-replacement semantics per bucket;
    3. one filtered pass writes only pending buckets
       (``pmod(hash(key), n)`` matches the writer's internal bucket
       spec bit-for-bit), appended as properly-named bucketed files;
    4. per-bucket row counts come from the written files' footers and
       land in the manifest.

    After the final attempt the table serves Exchange-free url-keyed
    windows/joins via ``attach_stage_bucketed`` (DDL re-attach; plan
    shows HashPartitioning — asserted in tests/test_storage.py).
    """
    from .storage import _schema_ddl

    spark = df.sparkSession
    done = completed_buckets(path, stage, input_fingerprint)
    pending = [b for b in range(n_buckets) if b not in done]
    skipped = sorted(done)
    if not pending:
        return WriteReport(stage, input_fingerprint, [], skipped, 0)

    # step 2: clean uncommitted leftovers of a crashed attempt. An
    # unparseable bucket filename raises (foreign committer layout —
    # see _bucketed_file_counts) BEFORE anything is deleted/written.
    if os.path.isdir(path):
        leftovers = []
        for fn in os.listdir(path):
            if fn.endswith(".parquet"):
                b = _file_bucket(fn)
                if b is None:
                    raise ValueError(
                        "parquet file without a bucket id at the"
                        f" bucketed table location: {os.path.join(path, fn)}"
                    )
                if b not in done:
                    leftovers.append(fn)
        for fn in leftovers:
            os.remove(os.path.join(path, fn))

    # The table is created via DDL with an explicit LOCATION — an
    # EXTERNAL table, so catalog drops (e.g. a later re-attach from a
    # fresh session) never purge the data files. saveAsTable was NOT
    # safe here: Spark treats it as managed and DROP TABLE deletes
    # the committed buckets AND the manifest.
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {table} ({_schema_ddl(df)})"
        f" USING PARQUET CLUSTERED BY ({key_col}) SORTED BY ({key_col})"
        f" INTO {n_buckets} BUCKETS LOCATION '{path}'"
    )
    # IF NOT EXISTS silently reuses a pre-existing catalog table: if
    # that table points elsewhere (or has a different bucket spec),
    # insertInto would write the data somewhere other than `path`
    # while the manifest at `path` commits buckets counted from
    # footers that never change — fail loudly instead.
    _verify_table_spec(spark, table, path, key_col, n_buckets)
    t0 = time.time()
    pend = df.filter(
        F.pmod(F.hash(F.col(key_col)), F.lit(n_buckets)).isin(pending)
    )
    (
        pend.repartition(n_buckets, F.col(key_col))
        .sortWithinPartitions(key_col)
        .write.insertInto(table)
    )
    wall = round(time.time() - t0, 3)

    counts = _bucketed_file_counts(path)
    written: list[int] = []
    total_rows = 0
    for b in pending:
        n = counts.get(b, 0)
        _append_manifest(
            path,
            {
                "stage": stage,
                "input_fingerprint": input_fingerprint,
                "bucket": b,
                "row_count": n,
                "wall_sec": wall,
                "written_at": time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                ),
            },
        )
        written.append(b)
        total_rows += n
        if fail_after_bucket is not None and b >= fail_after_bucket:
            raise RuntimeError(f"injected failure after bucket {b}")
    return WriteReport(stage, input_fingerprint, written, skipped, total_rows)


def attach_stage_bucketed(
    spark: SparkSession,
    path: str,
    table: str,
    schema_ddl: str,
    key_col: str = "url",
    n_buckets: int = 16,
) -> DataFrame:
    """Re-attach a completed resumable bucketed stage as a catalog
    table whose scans report HashPartitioning(key, n) — url-keyed
    windows and joins downstream need no Exchange."""
    from .storage import register_bucketed

    return register_bucketed(
        spark, table, path, schema_ddl, key=key_col, n_buckets=n_buckets
    )
