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

Third phase — the DELETE datum (VERDICT r5 next #5): 40 planted
deletions exercising both hard cases at scale — 20 chain HUBS (the
component min id leaves: every survivor must relabel to head+1) and 20
mid-chain BRIDGES (the component SPLITS: the tail half relabels to
mid+1).  ``delete`` relabels only the 40 affected chains' remaining
members (~164k nodes) from TRUE pairs re-derived by ``pairs_for`` — the
star encoding cannot answer post-delete connectivity, so unlike update's
O(1) star rounds this runs real pointer-doubling over the affected
chains: rounds ~ log2(chain diameter), asserted.  Correctness is
closed-form per case; timed against a full recompute over the remaining
corpus on identical hardware.
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

        # ---- delete phase: 20 hubs (chains 100..119) + 20 bridges
        # (chains 200..219, mid node head+2048) ----
        import math

        hub_chains = list(range(100, 120))
        bridge_chains = list(range(200, 220))
        mid_off = CHAIN_LEN // 2
        hubs = spark.createDataFrame(
            [(c * CHAIN_LEN,) for c in hub_chains], "doc_id long"
        )
        bridges = spark.createDataFrame(
            [(c * CHAIN_LEN + mid_off,) for c in bridge_chains],
            "doc_id long",
        )
        dele = hubs.unionByName(bridges)
        all_edges = edges.unionByName(batch_pairs)

        def pairs_for(remaining):
            # the TRUE pair set among exactly the remaining affected
            # members — the role a signature index's pairs_among plays
            return (
                all_edges.join(
                    remaining.select(F.col("id").alias("a")), "a", "left_semi"
                ).join(
                    remaining.select(F.col("id").alias("b")), "b", "left_semi"
                )
            )

        t3 = time.monotonic()
        out3 = cc.delete(dele, pairs_for, batch_id=2)
        del_secs = time.monotonic() - t3  # merges are eager: op complete
        del_rounds = getattr(out3, "_cc_rounds", None)
        # closed-form checks (UNtimed — the comparator below runs none),
        # all distributed aggregations:
        # hub-deleted chains: every survivor relabels to head+1
        bad_hub = cc.read_clusters().where(
            ((F.col("doc_id") / CHAIN_LEN).cast("long").isin(hub_chains))
            & (F.col("doc_id") < chained)
            & (F.col("cluster_id")
               != (F.col("doc_id") / CHAIN_LEN).cast("long") * CHAIN_LEN + 1)
        ).count()
        # bridge-deleted chains: head..mid-1 keep head, mid+1..end -> mid+1
        cid = (F.col("doc_id") / CHAIN_LEN).cast("long")
        pos = F.col("doc_id") % CHAIN_LEN
        want_bridge = F.when(
            pos < mid_off, cid * CHAIN_LEN
        ).otherwise(cid * CHAIN_LEN + mid_off + 1)
        bad_bridge = cc.read_clusters().where(
            cid.isin(bridge_chains)
            & (F.col("doc_id") < chained)
            & (F.col("cluster_id") != want_bridge)
        ).count()
        n_rows_after = cc.read_clusters().count()
        assert bad_hub == 0, f"{bad_hub} mislabeled hub-chain survivors"
        assert bad_bridge == 0, f"{bad_bridge} mislabeled bridge survivors"
        assert n_rows_after == N_NODES + n_batch - 40
        # delete relabels from TRUE pairs, so rounds follow the affected
        # chains' diameter (pointer doubling), not the star's O(1)
        assert del_rounds <= math.ceil(math.log2(CHAIN_LEN)) + 2, del_rounds

        # comparison: full recompute over the remaining corpus
        rem_ids = ids.unionByName(batch_ids).join(dele, "doc_id", "left_anti")
        rem_edges = pairs_for(
            rem_ids.select(F.col("doc_id").alias("id"))
        )
        t4 = time.monotonic()
        out4 = near_dup_clusters(
            rem_ids.select(F.col("doc_id").alias("id")),
            rem_edges,
            id_col="id",
            out_col="cluster_id",
        )
        out4.count()
        full_del_secs = time.monotonic() - t4
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
                "delete_batch": 40,
                "delete_affected_members": 40 * CHAIN_LEN - 40,
                "delete_rounds": del_rounds,
                "delete_seconds": round(del_secs, 2),
                "delete_full_recompute_seconds": round(full_del_secs, 2),
                "delete_speedup_vs_full": round(full_del_secs / del_secs, 1),
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
