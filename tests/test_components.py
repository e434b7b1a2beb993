"""Connected-components convergence (round-4): pointer doubling makes
min-label propagation O(log diameter), so long chain components — the
shape near-dup graphs produce at scale — converge far inside the
default round budget, and exhaustion raises instead of silently
returning partial labels."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from s2js_spark.spark.session import get_session
from s2js_spark.spark.textops import min_label_components


@pytest.fixture(scope="module")
def spark():
    s = get_session("local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _nodes_edges(spark, n):
    nodes = spark.range(n).select(
        F.format_string("k%05d", F.col("id")).alias("key")
    )
    edges = spark.range(n - 1).select(
        F.format_string("k%05d", F.col("id")).alias("_a"),
        F.format_string("k%05d", F.col("id") + 1).alias("_b"),
    )
    return nodes, edges


def test_long_chain_converges_within_log_rounds(spark):
    """A 60-hop chain needs 60 rounds under plain propagation — more
    than the default max_iter=25. Pointer doubling must converge it
    (and label every node with the chain head) well inside the
    default budget."""
    nodes, edges = _nodes_edges(spark, 61)
    out = min_label_components(nodes, edges, "key", max_iter=25)
    rows = {r["key"]: (r["rep"], r["keep"]) for r in out.collect()}
    assert len(rows) == 61
    assert all(rep == "k00000" for rep, _ in rows.values())
    assert sum(keep for _, keep in rows.values()) == 1
    assert rows["k00000"][1] == 1


def test_exhaustion_raises_not_silent(spark):
    """If the round budget genuinely cannot reach the fixed point the
    operator must raise — silent non-convergence would return reps
    that disagree with the transitive-closure oracle."""
    nodes, edges = _nodes_edges(spark, 40)
    with pytest.raises(RuntimeError, match="no fixed point"):
        min_label_components(nodes, edges, "key", max_iter=2)
