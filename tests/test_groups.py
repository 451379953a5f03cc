"""Near-dup group resolution: connected components over pair graphs
(operators/groups.py — alternating large-star / small-star)."""

import pytest
from pyspark.sql import functions as F

from embulk_filter_column_spark.errors import EngineError
from embulk_filter_column_spark.operators.groups import (
    connected_components,
    dedup_groups,
)


def _labels(spark, edges, **kw):
    df = spark.createDataFrame(edges, "a long, b long")
    rows = connected_components(df, **kw).collect()
    return {r["doc_id"]: r["canonical_id"] for r in rows}


def test_multi_hop_chain(spark):
    """A~B, B~C ⇒ one component {A,B,C} even though A≁C was never a
    pair — the property pairs alone cannot express."""
    got = _labels(spark, [(1, 2), (2, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_two_components_and_cycle(spark):
    got = _labels(spark, [(10, 11), (11, 12), (12, 10),   # cycle
                          (20, 21)])
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_long_path_converges_in_log_rounds(spark):
    """A 64-node path graph has diameter 63; naive label propagation
    needs 63 rounds, large-star/small-star O(log n) — the max_rounds=8
    bound only passes with the fast algorithm."""
    edges = [(i, i + 1) for i in range(63)]
    got = _labels(spark, edges, max_rounds=8)
    assert got == {i: 0 for i in range(64)}


def test_self_loops_and_duplicates_tolerated(spark):
    got = _labels(spark, [(1, 2), (2, 1), (1, 1), (2, 2), (1, 2)])
    assert got == {1: 1, 2: 1}


def test_unordered_and_reversed_edges(spark):
    """Edge direction must not matter."""
    got = _labels(spark, [(5, 3), (3, 9), (9, 5), (2, 9)])
    assert got == {2: 2, 3: 2, 5: 2, 9: 2}


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "a long, b long")
    assert connected_components(df).count() == 0


def test_star_heavy_component(spark):
    """A hub with many spokes (the shape a viral near-dup cluster
    takes) resolves to the min id."""
    edges = [(100, i) for i in range(101, 140)]
    got = _labels(spark, edges)
    assert set(got.values()) == {100}
    assert len(got) == 40


def test_nonconvergence_raises(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(40)],
                               "a long, b long")
    with pytest.raises(EngineError, match="did not converge"):
        connected_components(df, max_rounds=1)


def test_dedup_groups_sizes(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "a long, b long")
    rows = dedup_groups(df).collect()
    got = {(r["doc_id"], r["canonical_id"], r["group_size"]) for r in rows}
    assert got == {(1, 1, 3), (2, 1, 3), (3, 1, 3), (7, 7, 2), (8, 7, 2)}
    # the delete list: everything but the canonical survivor
    deletes = {r["doc_id"] for r in rows
               if r["doc_id"] != r["canonical_id"]}
    assert deletes == {2, 3, 8}


def test_string_ids_supported(spark):
    """Ids keep their type — url-keyed pair graphs (this engine's own
    key type) must not be silently cast away."""
    df = spark.createDataFrame(
        [("https://a.com/", "https://b.com/"),
         ("https://b.com/", "https://c.com/"),
         ("https://x.com/", "https://y.com/")], "a string, b string")
    rows = connected_components(df).collect()
    got = {r["doc_id"]: r["canonical_id"] for r in rows}
    assert got == {
        "https://a.com/": "https://a.com/",
        "https://b.com/": "https://a.com/",
        "https://c.com/": "https://a.com/",
        "https://x.com/": "https://x.com/",
        "https://y.com/": "https://x.com/",
    }
