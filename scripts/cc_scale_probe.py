"""Connected-components scale probe: dedup-shaped pair graph at 1M+ nodes.

Evidence for the DESIGN_SCALE claim that near-dup graphs (forests of tiny
cliques/chains) converge in ~diameter rounds with the min-label-propagation
loop.  Synthesizes a graph shaped like real dedup output — mostly pairs and
small cliques, a tail of chains (the worst case for transitivity) — runs
connected_components, and reports rounds, wall time, and cluster-count
sanity vs the construction.

Usage: python scripts/cc_scale_probe.py [n_clusters] [cpus]
Writes one JSON line to stdout; numbers land in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_clusters = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import numpy as np

    from knowledgeir_spark.operators.graph import dup_clusters, connected_components  # noqa: F401
    from knowledgeir_spark.session import get_spark

    rng = np.random.default_rng(7)
    # cluster size distribution mirrors measured dedup output: 70% pairs,
    # 20% triangles/cliques-of-3, 9% size-5 cliques, 1% chains of 9
    # (diameter 8 -> the propagation's worst case here)
    sizes = rng.choice([2, 3, 5, 9], size=n_clusters, p=[0.70, 0.20, 0.09, 0.01])
    chain = sizes == 9
    starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    n_nodes = int(sizes.sum())

    srcs, dsts = [], []
    for sz, st, is_chain in zip(sizes, starts, chain):
        ids = np.arange(st, st + sz)
        if is_chain:  # path graph: a-b-c-...
            srcs.append(ids[:-1])
            dsts.append(ids[1:])
        else:  # star from the max id (so min-label must hop): b->a, c->a...
            srcs.append(ids[1:])
            dsts.append(np.full(sz - 1, ids[0]))
    src = np.concatenate(srcs)
    dst = np.concatenate(dsts)

    spark = get_spark(cpus=cpus, app_name="cc-probe", shuffle_partitions=cpus * 2)
    import pandas as pd

    edges = spark.createDataFrame(
        pd.DataFrame({"src": src, "dst": dst})
    ).repartition(cpus * 2)
    edges.persist().count()

    stats: dict = {}
    t0 = time.monotonic()
    cc = connected_components(edges, stats=stats)
    got_clusters = cc.select("cluster_id").distinct().count()
    wall = time.monotonic() - t0

    print(json.dumps({
        "metric": "cc_scale_probe",
        "n_nodes": n_nodes,
        "n_edges": int(len(src)),
        "n_clusters_expected": n_clusters,
        "n_clusters_found": got_clusters,
        "rounds": stats.get("rounds"),
        "wall_sec": round(wall, 2),
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
