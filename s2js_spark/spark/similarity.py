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


def _band_keys(sig, rows_per_band: int, bands: int, multiprobe: bool):
    """Bucket keys "<band>:<bits>" for each band of the signature;
    with ``multiprobe``, each band also probes its rows_per_band
    Hamming-distance-1 variants (flip one bit per probe)."""
    keys = []
    for b in range(bands):
        bits = F.substring(sig, b * rows_per_band + 1, rows_per_band)
        keys.append(F.concat(F.lit(f"{b}:"), bits))
        if multiprobe:
            for p in range(rows_per_band):
                bit = F.substring(sig, b * rows_per_band + p + 1, 1)
                flipped = F.when(bit == "1", F.lit("0")).otherwise(F.lit("1"))
                keys.append(
                    F.concat(
                        F.lit(f"{b}:"),
                        F.substring(sig, b * rows_per_band + 1, p),
                        flipped,
                        F.substring(
                            sig, b * rows_per_band + p + 2, rows_per_band - p - 1
                        ),
                    )
                )
    return F.array(*keys)


def lsh_topk(
    spark: SparkSession,
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 36,
    bands: int = 12,
    multiprobe: bool = False,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate top-k via BANDED hyperplane LSH (OR-amplification).

    The num_planes sign bits split into ``bands`` bands of r =
    num_planes/bands bits; a vector/query pair becomes a candidate if
    ANY band matches exactly (recall 1-(1-p^r)^L for bit-agreement
    probability p = 1 - angle/pi). Each side emits ``bands`` rows and
    the join is a plain equi-join on the band key — linear, prunable,
    skew-handled by AQE. Optional per-band 1-bit multiprobe widens
    recall further at ~r x probe cost. A pair can match several bands,
    so candidates dedup on (query, vector) before ranking.

    Measured recall@5 >= 0.9 vs brute force on the synthetic
    embeddings (tests/test_similarity_recall.py) — which are
    near-random, the LSH worst case; clustered real embeddings sit at
    higher p where the same configuration prunes far harder.

    ``broadcast_queries`` picks the join strategy: True (default) for
    query workloads — a small query set broadcast against the corpus,
    map-side. False for corpus-scale self-joins (semantic dedup at
    10^12 docs, where queries ≈ vectors): a plain SHUFFLE equi-join on
    the band key — both sides hash-partition by bucket, linear in
    candidates, AQE handles band skew; nothing corpus-sized is ever
    collected or broadcast.
    """
    rows_per_band = num_planes // bands
    v_sig = F.expr(lsh_signature_expr(vec_col, num_planes))
    q_sig = F.expr(lsh_signature_expr(query_vec_col, num_planes))
    v = (
        vectors.withColumn("_sig", v_sig)
        .withColumn(
            "bucket", F.explode(_band_keys(F.col("_sig"), rows_per_band, bands, False))
        )
        .drop("_sig")
    )
    q = (
        queries.withColumn("_sig", q_sig)
        .withColumn(
            "bucket",
            F.explode(_band_keys(F.col("_sig"), rows_per_band, bands, multiprobe)),
        )
        .drop("_sig")
    )
    sim = F.expr(cosine_expr(vec_col, query_vec_col))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.col(id_col))
    if broadcast_queries:
        joined = v.join(F.broadcast(q), "bucket")
        # dedup pairs that matched in multiple bands
        w_dedup = Window.partitionBy(query_id_col, id_col).orderBy("bucket")
        cand = (
            joined.withColumn("_rn", F.row_number().over(w_dedup))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "bucket")
        )
    else:
        # Corpus-scale SELF-join (round 6, guide §2.3/§8: shuffle keys
        # and metadata, not payloads). The previous plan carried BOTH
        # embedding arrays through the band equi-join, the multi-band
        # dedup window's shuffle AND the top-k window's shuffle —
        # ~300 B of vector payload per candidate row, three times
        # (measured 23s at sf0.1: ~37M candidate rows x 2 vectors).
        # Here only (query_id, id) id pairs flow through the band join
        # and the dedup aggregate; the two embeddings re-attach by
        # plain equi-joins against the (narrow) vector tables before
        # the exact-cosine ranking. Nothing corpus-sized is broadcast
        # by construction — AQE may choose broadcast locally, but the
        # structural plan is id-keyed equi-joins, linear at 10^12
        # docs.
        pair_ids = (
            v.select(F.col(id_col), "bucket")
            .join(q.select(F.col(query_id_col), "bucket"), "bucket")
            .groupBy(query_id_col, id_col)
            .agg(F.lit(1).alias("_one"))
            .drop("_one")
        )
        cand = pair_ids.join(
            vectors.select(id_col, vec_col), id_col
        ).join(queries.select(query_id_col, query_vec_col), query_id_col)
    return (
        cand.withColumn("sim", sim)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "sim", "rank")
    )


def lsh_candidate_pairs(
    vectors: DataFrame,
    num_planes: int = 36,
    bands: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distinct unordered candidate pairs (id_a < id_b, sim) from the
    banded-LSH SELF-join: both sides explode into band buckets and
    shuffle-equi-join on the bucket key — linear in candidates,
    nothing corpus-sized broadcast. ``sim`` is the 1e-9-rounded cosine
    (reproducible across engines)."""
    sig = F.expr(lsh_signature_expr(vec_col, num_planes))
    rows_per_band = num_planes // bands
    # Round 6 (guide §2.3/§8): only (id, bucket) flows through the
    # self-join and the pair dedup — the previous plan shuffled both
    # embedding payloads through the band join AND dropDuplicates.
    # The two vectors re-attach by id equi-joins for the exact cosine.
    banded = (
        vectors.select(id_col, vec_col)
        .withColumn("_sig", sig)
        .withColumn(
            "bucket", F.explode(_band_keys(F.col("_sig"), rows_per_band, bands, False))
        )
        .select(id_col, "bucket")
    )
    left = banded.select(F.col(id_col).alias("_ida"), "bucket")
    right = banded.select(F.col(id_col).alias("_idb"), "bucket")
    pair_ids = (
        left.join(right, "bucket")
        .filter(F.col("_ida") < F.col("_idb"))
        .select("_ida", "_idb")
        .dropDuplicates(["_ida", "_idb"])
    )
    pairs = pair_ids.join(
        vectors.select(
            F.col(id_col).alias("_ida"), F.col(vec_col).alias("_va")
        ),
        "_ida",
    ).join(
        vectors.select(
            F.col(id_col).alias("_idb"), F.col(vec_col).alias("_vb")
        ),
        "_idb",
    )
    return pairs.select(
        "_ida", "_idb", F.expr(cosine_expr("_va", "_vb")).alias("sim")
    )


def semantic_dedup(
    spark: SparkSession,
    vectors: DataFrame,
    threshold: float = 0.3,
    num_planes: int = 36,
    bands: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 25,
) -> DataFrame:
    """Embedding-cosine near-dup DECISIONS: (id, rep, keep).

    The corpus-scale semantic-dedup pipeline: banded-LSH self-join
    candidates (lsh_candidate_pairs — approximate candidate recall,
    like every LSH dedup at 10^12 docs), exact cosine filter at
    ``threshold``, then connected components by min-label propagation
    (textops.min_label_components). Deterministic and SQL-expressible,
    so the DuckDB oracle (recursive-CTE transitive closure over the
    same edge set) verifies it hash-exactly."""
    from .textops import min_label_components

    edges = (
        lsh_candidate_pairs(
            vectors, num_planes=num_planes, bands=bands,
            id_col=id_col, vec_col=vec_col,
        )
        .filter(F.col("sim") >= threshold)
        .select(F.col("_ida").alias("_a"), F.col("_idb").alias("_b"))
    )
    nodes = vectors.select(id_col).distinct()
    return min_label_components(nodes, edges, id_col, max_iter)
