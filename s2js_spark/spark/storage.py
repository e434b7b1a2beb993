"""Bucketed (hash-clustered) storage layout for the pages table.

The 100 TB design point stores the Common-Crawl-style page table
hash-clustered by ``url`` — the Iceberg `bucket(N, url)` partition
transform; this container has no Iceberg runtime jar, so the same
layout is realised with Spark's native parquet bucketing, which is
plan-equivalent: the scan reports ``HashPartitioning(url, N)``, so

- ``dedup_latest``'s window (partitionBy url) needs NO Exchange —
  the one shuffle in the flagship pipeline disappears entirely (the
  exchange was the measured non-scaling term in the round-2 cluster
  phase: ~10 GB re-shuffled per run at 10^8 pages, a guaranteed
  scale-killer at 10^12);
- any url-keyed join/aggregate downstream co-locates for free.

Bucketed metadata lives in the session catalog, so a table written
once is re-attached to any later session (other executors-count runs
of the scaling phase, a fresh driver) with one DDL statement over the
same files — `register_bucketed`. Spark derives the bucket id from
the writer's file names, so attach-after-the-fact is exact.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _schema_ddl(df: DataFrame) -> str:
    return ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )


def write_bucketed(
    df: DataFrame,
    path: str,
    table: str,
    key: str = "url",
    n_buckets: int = 64,
) -> None:
    """Write ``df`` hash-clustered by ``key`` into ``n_buckets``.

    The pre-write ``repartition(n_buckets, key)`` uses the same
    murmur3 ``pmod`` as the bucket-id expression, so every task holds
    exactly one bucket and the layout is one file per bucket — the
    compact shape a real table maintenance job would produce (without
    it, Spark writes tasks x buckets files).
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.repartition(n_buckets, F.col(key))
        .write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )


def register_bucketed(
    spark: SparkSession,
    table: str,
    path: str,
    schema_ddl: str,
    key: str = "url",
    n_buckets: int = 64,
) -> DataFrame:
    """Attach an existing bucketed layout to this session's catalog."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(
        f"CREATE TABLE {table} ({schema_ddl}) USING PARQUET"
        f" CLUSTERED BY ({key}) SORTED BY ({key})"
        f" INTO {n_buckets} BUCKETS LOCATION '{path}'"
    )
    return spark.table(table)


def ensure_bucketed(
    spark: SparkSession,
    df_builder,
    path: str,
    table: str,
    key: str = "url",
    n_buckets: int = 64,
) -> DataFrame:
    """Idempotent ingest: write ``df_builder()`` bucketed by ``key`` at
    ``path`` unless the layout already exists, then return the bucketed
    table DataFrame. The schema sidecar makes re-attach from a fresh
    session (the scaling phase's separate executor-count runs) exact.
    """
    marker = os.path.join(path, "_SCHEMA_DDL")
    if os.path.exists(marker):
        with open(marker) as fh:
            ddl = fh.read()
        return register_bucketed(spark, table, path, ddl, key, n_buckets)
    df = df_builder()
    write_bucketed(df, path, table, key, n_buckets)
    with open(marker, "w") as fh:
        fh.write(_schema_ddl(df))
    return spark.table(table)


def no_exchange_before_window(df: DataFrame) -> bool:
    """True iff the physical plan contains no shuffle Exchange — the
    proof obligation for the bucketed dedup path (broadcast exchanges
    don't count: they're map-side)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Tree-prefix charset includes ':' — operators under a join branch
    # render as ':  +- Exchange ...' and must not escape detection.
    return not any(
        line.strip().lstrip("+-*: ").startswith("Exchange")
        for line in plan.splitlines()
    )
