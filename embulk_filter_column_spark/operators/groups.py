"""Near-duplicate group resolution: connected components over a pair
graph, producing ``(id, canonical_id)`` labels — the last stage of every
dedup family (pairs alone can't drive a delete list: A~B and B~C must
collapse to ONE survivor even though A≁C was never emitted as a pair).

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the standard
O(log n)-round formulation for trillion-edge graphs. Each half-round is
expressed as ONE aggregation plus ONE co-partitioned join on the node id
(min-label per neighborhood, then re-pointing edges at it); there is no
``collect_set`` anywhere, so a viral node with 10⁸ neighbors costs a
streaming min + a streamed join, never an in-memory adjacency array.
The driver loop is over ROUNDS (O(log n) of them — it halves star
depth each time), not over data; every round is a distributed job.

Output contract: one row per node that appears in the pair graph,
``canonical_id`` = the smallest id in its component (the conventional
"keep the first-crawled document" survivor rule). Downstream, the
delete list is simply ``WHERE id != canonical_id``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import EngineError


def _large_star(edges: DataFrame) -> DataFrame:
    """Γ(u) for every node u (both directions), m = min(Γ(u) ∪ {u});
    connect every strictly-larger neighbor to m. Strictly decreases the
    depth of tall trees without collecting neighborhoods: the min is a
    map-side-combining aggregate, the re-pointing a join on u."""
    both = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (both.groupBy("u")
            .agg(F.min("v").alias("_mn"))
            .select("u", F.least("_mn", F.col("u")).alias("m")))
    return (both.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v")))


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient each edge (larger, smaller); for every node u, point u and
    all of its smaller neighbors at min(N(u) ∪ {u}). Flattens shallow
    trees into stars."""
    ed = (edges
          .select(F.greatest("u", "v").alias("u"),
                  F.least("u", "v").alias("v"))
          .where(F.col("u") != F.col("v"))
          .distinct())
    mins = ed.groupBy("u").agg(F.min("v").alias("m"))
    re_pointed = (ed.join(mins, "u")
                  .select(F.col("v").alias("u"), F.col("m").alias("v"))
                  .where(F.col("u") != F.col("v")))
    centers = mins.select(F.col("u"), F.col("m").alias("v"))
    return re_pointed.union(centers).distinct()


def connected_components(pairs: DataFrame, a_col: str = "a",
                         b_col: str = "b", id_out: str = "doc_id",
                         label_out: str = "canonical_id",
                         max_rounds: int = 25) -> DataFrame:
    """Label every node of the undirected pair graph with its component's
    minimum id. ``pairs`` is any DataFrame of (a, b) edges (self-loops
    and duplicates tolerated). Returns one row per distinct node:
    ``(id_out, label_out)``.

    Convergence is checked per round on the canonical edge set (star
    edges are stable under a further small-star pass exactly when the
    components are resolved). ``max_rounds`` bounds the driver loop —
    large-star/small-star needs O(log n) rounds, so 25 covers any
    realistic corpus (2^25 ≈ 3·10⁷ would be the DIAMETER, not the node
    count, and near-dup graphs are shallow); hitting the bound raises
    rather than silently returning partial components.
    """
    # ids keep their input type — the algorithm needs only a total
    # order (numeric ids, url strings, any orderable key). A cast here
    # would silently NULL-drop string ids, and urls ARE the id type of
    # this engine's own dedup pipelines.
    edges = (pairs
             .select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
             .where(F.col("u").isNotNull() & F.col("v").isNotNull())
             .where(F.col("u") != F.col("v"))
             .distinct())
    # each round references the previous round's result many times over;
    # localCheckpoint materializes it so lineage doesn't grow
    # exponentially across rounds (the standard iterative-algorithm
    # pattern — eager, reliable=False keeps blocks on executors)
    edges = edges.localCheckpoint(eager=True)
    for _ in range(max_rounds):
        nxt = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        # converged ⇔ the canonical edge sets are identical. Both sides
        # are DISTINCT canonical (larger, smaller) pairs, so their
        # symmetric difference is exactly the union-all rows whose
        # (u, v) count is 1 — ONE action per round (a count+anti-join
        # pair costs two driver round trips, and per-job overhead
        # dominates late rounds where the edge set is tiny)
        sym = (nxt.unionAll(edges).groupBy("u", "v")
               .agg(F.count(F.lit(1)).alias("_n"))
               .where(F.col("_n") == 1))
        if sym.isEmpty():
            edges = nxt
            break
        edges = nxt
    else:
        raise EngineError(
            "connected_components did not converge in %d rounds"
            % max_rounds)
    # stars: every non-root points at its component min; roots appear
    # only as targets (plus isolated self-pairs were dropped up front)
    roots = (edges.select(F.col("v").alias("u"))
             .distinct()
             .join(edges.select("u"), "u", "left_anti")
             .select("u", F.col("u").alias("v")))
    return (edges.union(roots)
            .select(F.col("u").alias(id_out), F.col("v").alias(label_out)))


def dedup_groups(pairs: DataFrame, a_col: str = "a", b_col: str = "b",
                 max_rounds: int = 25) -> DataFrame:
    """Pairs → duplicate groups: ``(doc_id, canonical_id, group_size)``
    for every document in the pair graph. The delete list of a dedup
    pipeline is ``where(doc_id != canonical_id)``."""
    labels = connected_components(pairs, a_col, b_col,
                                  max_rounds=max_rounds)
    sizes = (labels.groupBy("canonical_id")
             .agg(F.count(F.lit(1)).alias("group_size")))
    return labels.join(sizes, "canonical_id").select(
        "doc_id", "canonical_id", "group_size")
