"""Connected components over near-duplicate pair graphs.

The dedup pipeline (operators/dedup.py) emits *pairs* (minhash/simhash
candidates verified by exact Jaccard).  Turning pairs into keep-lists needs
the transitive closure: if A~B and B~C, then {A,B,C} is one duplicate
cluster and a pipeline keeps exactly one of them.  This module computes
cluster ids (= minimum doc_id in the component) with plain DataFrame ops.

Algorithm: iterative min-label propagation to a fixpoint —

    labels(v) <- min(labels(v), min over neighbors u of labels(u))

Each round is one join + one groupBy(min); convergence after D rounds where
D is the graph diameter.  Near-dup graphs are forests of tiny cliques/chains
(diameter ~ a few), so this converges in 2-4 rounds even at crawl scale.
Every round materializes via localCheckpoint to cut the lineage chain (on a
real cluster use `spark.sparkContext.setCheckpointDir` + `.checkpoint()` so
a lost executor replays one round, not all of them).

Scale notes (100 TB):
- The join is edges ⋈ labels on the node id — both sides hash-partition on
  the same key, so AQE keeps the exchange stable across rounds.
- For graphs with large components/diameter (NOT the dedup case), swap the
  propagation body for the large-star/small-star algorithm
  (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
  which converges in O(log^2 n) rounds; the driver loop and convergence
  check here stay unchanged.
- The convergence check is a `limit(1).count()` on the changed-label
  anti-condition join — it short-circuits and never collects the label
  table to the driver.

No reference counterpart: KnowledgeIR has no dedup stage (its corpora are
pre-deduplicated ClueWeb subsets); this is an engine addition for the
training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "dup_clusters"]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """(node, cluster_id) for every node appearing in `edges`.

    cluster_id is the minimum node id of the component.  Raises if the
    fixpoint is not reached within max_iter rounds (diameter bound blown —
    switch to large-star/small-star per the module docstring).  Pass a
    dict as `stats` to receive {"rounds": n} (bench/test introspection).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for round_no in range(1, max_iter + 1):
        prop = sym.join(labels, sym["a"] == labels["node"]).select(
            F.col("b").alias("node"), F.col("lbl")
        )
        new = (
            labels.union(prop)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            if stats is not None:
                stats["rounds"] = round_no
            return labels.select(F.col("node"), F.col("lbl").alias("cluster_id"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "use large-star/small-star for high-diameter graphs"
    )


def dup_clusters(pairs: DataFrame, a: str = "doc_a", b: str = "doc_b") -> DataFrame:
    """(doc_id, cluster_id, cluster_size) from a near-dup pair table.

    cluster_id doubles as the canonical keep-doc (minimum id); a pipeline
    drops every row with doc_id != cluster_id.  cluster_size comes from one
    extra groupBy on the (small: one row per duplicated doc) label table.
    """
    cc = connected_components(pairs, src=a, dst=b)
    sizes = cc.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return cc.join(sizes, "cluster_id").select(
        F.col("node").alias("doc_id"), "cluster_id", "cluster_size"
    )
