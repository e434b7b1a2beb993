"""Similarity search over embedding columns.

Brute-force cosine top-k is the correctness baseline (broadcast the
query side, JVM higher-order-function dot products — sequential
double sums so DuckDB reproduces them bitwise). The scale path buckets
vectors by deterministic random-hyperplane LSH signs so only matching
buckets join — the 100 TB plan (bucket join ≈ equi-join, prunable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " 0D, (acc, v) -> acc + v)"
)
NORM = "sqrt(aggregate({a}, 0D, (acc, v) -> acc + cast(v as double) * cast(v as double)))"


def cosine_expr(a: str, b: str) -> str:
    return (
        f"round(({DOT.format(a=a, b=b)}) / (({NORM.format(a=a)}) * ({NORM.format(a=b)})), 9)"
    )


def brute_force_topk(
    spark: SparkSession,
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries x all vectors, window rank.

    Scores are rounded to 1e-9 and ties broken by neighbor id, so the
    ranking is reproducible bit-for-bit across engines.
    """
    joined = vectors.crossJoin(F.broadcast(queries))
    sim = F.expr(cosine_expr(vec_col, query_vec_col))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.col(id_col))
    return (
        joined.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "sim", "rank")
    )


def lsh_signature_expr(vec_col: str, num_planes: int = 16) -> str:
    """Deterministic random-hyperplane sign signature.

    Plane p's component for dimension d is a fixed pseudo-random value
    derived from (p, d) by integer arithmetic — identical in any
    engine, no stored planes, no RNG:

        w(p, d) = ((1 + p) * 2654435761 * (1 + d) % 1000003) - 501501
    """
    bits = []
    for p in range(num_planes):
        proj = (
            f"aggregate(zip_with({vec_col}, sequence(1, size({vec_col})),"
            f" (x, d) -> cast(x as double) *"
            f" cast((({p + 1} * 2654435761 * cast(d as bigint)) % 1000003) - 501501 as double)),"
            f" 0D, (acc, v) -> acc + v)"
        )
        bits.append(f"case when ({proj}) >= 0 then '1' else '0' end")
    return "concat(" + ", ".join(bits) + ")"


def lsh_topk(
    spark: SparkSession,
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: equi-join on LSH bucket, rank within bucket.

    At scale this is a plain hash join on a low-cardinality-per-bucket
    key; multiprobe (flipping one bit) widens recall.
    """
    v = vectors.withColumn("bucket", F.expr(lsh_signature_expr(vec_col, num_planes)))
    q = queries.withColumn("bucket", F.expr(lsh_signature_expr(query_vec_col, num_planes)))
    joined = v.join(F.broadcast(q), "bucket")
    sim = F.expr(cosine_expr(vec_col, query_vec_col))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.col(id_col))
    return (
        joined.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "sim", "rank")
    )
