"""Connected-components scale datum (VERDICT r4 #7): near_dup_clusters on
a 10^6-node planted-chain graph — the worst case for label propagation
(chain diameter 4095) and therefore the honest stress for the O(log n)
pointer-doubling claim the 100-TB story rests on.

Graph: 244 chains of length 4096 (999,424 chained nodes) + 576 singletons
= exactly 1,000,000 nodes, 999,180 edges, built JVM-side from
``spark.range`` (no driver materialization).  Ground truth is closed-form
(every chain node's label is its chain head, ``(id // 4096) * 4096``), so
correctness is verified with one Spark aggregation — no driver-side
union-find over a million nodes.

Protocol: ONE Spark app on local[$SPARK_GRAFT_CPUS] (default 32); NEVER
run concurrently with another Spark workload (CLAUDE.md timing rule).
Prints one JSON line; the datum is recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import time

CHAIN_LEN = 4096
N_CHAINS = 244
N_NODES = 1_000_000


def main() -> None:
    from pyspark.sql import functions as F

    from singer_tap_spark import get_spark
    from singer_tap_spark.ops.cluster import near_dup_clusters

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("cc_scale", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    chained = N_CHAINS * CHAIN_LEN
    ids = spark.range(N_NODES).select(F.col("id").alias("doc_id"))
    edges = (
        spark.range(chained)
        .where(F.col("id") % CHAIN_LEN != CHAIN_LEN - 1)
        .select(F.col("id").alias("a"), (F.col("id") + 1).alias("b"))
    )
    n_edges = chained - N_CHAINS

    t0 = time.monotonic()
    out = near_dup_clusters(ids, edges)
    rounds = out._cc_rounds
    # closed-form ground truth, checked distributed: chain nodes label to
    # their chain head, singletons to themselves
    expected = F.when(
        F.col("doc_id") < chained,
        (F.col("doc_id") / CHAIN_LEN).cast("long") * CHAIN_LEN,
    ).otherwise(F.col("doc_id"))
    bad = out.where(F.col("cluster_id") != expected).count()
    secs = time.monotonic() - t0

    assert bad == 0, f"{bad} mislabeled nodes"
    print(
        json.dumps(
            {
                "metric": "cc_chain_1M",
                "nodes": N_NODES,
                "edges": n_edges,
                "chain_len": CHAIN_LEN,
                "rounds": rounds,
                "seconds": round(secs, 2),
                "nodes_per_sec": round(N_NODES / secs, 1),
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
