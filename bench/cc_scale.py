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

Second phase — the INCREMENTAL datum (VERDICT r4 #1 at scale): the same
1M-node clustering seeded into a ClusterIndex (the full-recompute path,
timed), then a 50-doc batch arrives, each new doc pairing into a distinct
chain.  ``update`` pulls only the 50 affected chains (~205k members as
star edges, diameter 2 regardless of the original 4095-chain diameter —
the star-encoding payoff) and relabels in O(1) rounds.  Reported:
incremental seconds vs full-recompute seconds on identical hardware.
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

    # ---- incremental phase: seed a ClusterIndex with the full result,
    # then fold a 50-doc batch (one new doc per touched chain) ----
    import shutil
    import tempfile

    from singer_tap_spark.ops.incremental import ClusterIndex

    idx_path = tempfile.mkdtemp(prefix="cc_scale_idx_")
    try:
        cc = ClusterIndex(spark, idx_path)
        t1 = time.monotonic()
        cc.update(ids, edges, batch_id=0)  # full CC + state write, timed
        seed_secs = time.monotonic() - t1

        n_batch = 50
        batch_ids = spark.range(n_batch).select(
            (F.col("id") + N_NODES).alias("doc_id")
        )
        # new doc i pairs into chain i (its head is i * CHAIN_LEN)
        batch_pairs = spark.range(n_batch).select(
            (F.col("id") + N_NODES).alias("a"),
            (F.col("id") * CHAIN_LEN).alias("b"),
        )
        t2 = time.monotonic()
        out2 = cc.update(batch_ids, batch_pairs, batch_id=1)
        incr_rounds = getattr(out2, "_cc_rounds", None)
        # correctness: every new doc labels to its chain head; chain
        # members keep their labels (head is already the min)
        bad2 = cc.read_clusters().where(
            (F.col("doc_id") >= N_NODES)
            & (F.col("cluster_id")
               != (F.col("doc_id") - N_NODES) * CHAIN_LEN)
        ).count()
        incr_secs = time.monotonic() - t2
        assert bad2 == 0, f"{bad2} mislabeled batch docs"
    finally:
        shutil.rmtree(idx_path, ignore_errors=True)

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
                "seed_seconds": round(seed_secs, 2),
                "incremental_batch": n_batch,
                "incremental_affected_members": n_batch * CHAIN_LEN,
                "incremental_rounds": incr_rounds,
                "incremental_seconds": round(incr_secs, 2),
                "incremental_speedup_vs_full": round(seed_secs / incr_secs, 1),
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
