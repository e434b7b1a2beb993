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
    mp = _manifest_path(path)
    if not os.path.exists(mp):
        return []
    with open(mp) as f:
        return [json.loads(line) for line in f if line.strip()]


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

    ``fail_after_bucket`` injects a crash for tests. Buckets already in
    the manifest for this (stage, input_fingerprint) are not recomputed.
    """
    bucketed = df.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")
    )
    done = completed_buckets(path, stage, input_fingerprint)
    written, skipped = [], []
    total_rows = 0
    for b in range(n_buckets):
        if b in done:
            skipped.append(b)
            continue
        t0 = time.time()
        part = bucketed.filter(F.col("_bucket") == b).drop("_bucket")
        out_dir = os.path.join(path, f"bucket={b}")
        part.write.mode("overwrite").parquet(out_dir)
        n = part.count()
        _append_manifest(
            path,
            {
                "stage": stage,
                "input_fingerprint": input_fingerprint,
                "bucket": b,
                "row_count": n,
                "wall_sec": round(time.time() - t0, 3),
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
