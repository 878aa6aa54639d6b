"""spark-submit entrypoint — the sync/discover CLI (singer-tap main analogue).

PATHS: the default ParquetLakeTable sink and the JSON lineage store commit
via LOCAL-filesystem renames (os.rename/shutil) — changelog/checkpoint may
be any Hadoop-FS URI, but --target/--lineage must be local (or NFS) paths.
For object storage (s3://…) use the Iceberg sink (IcebergLakeTable, MERGE
INTO; requires iceberg-spark-runtime + a catalog), whose commits are
catalog-atomic — that is the intended cluster deployment.

Usage (cluster, Iceberg path wired in code; CLI drives the parquet sink):
    spark-submit --py-files singer_tap_spark.zip -m singer_tap_spark.job \\
        sync --changelog hdfs://…/log --target /mnt/lake/table \\
             --lineage /mnt/lake/lineage.json --checkpoint /mnt/ckpt --streaming

    python -m singer_tap_spark.job discover --root /data/lake --out catalog.json
    python -m singer_tap_spark.job bench-replay --events 2000000 --cpus 8

The reference's mode flags (cmd/singer-tap/main.go:57-95): ``--discover`` ->
the ``discover`` subcommand; sync default mode -> ``sync``; ``bench-replay``
generates a deterministic synthetic change log and measures end-to-end
events/sec (the BASELINE.json headline metric) at a chosen parallelism —
used by bench/scaling.py for the N-vs-4N evidence.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time


def _sync(args) -> None:
    from singer_tap_spark import CDCPipeline, PipelineConfig, get_spark

    spark = get_spark("singer-tap-spark-sync")
    specs = None
    if args.specs:
        from singer_tap_spark.decode import PropertySpec

        specs = {
            name: PropertySpec(
                types=body.get("type", body.get("types", ["null", "string"])),
                custom_format=body.get("format"),
            )
            for name, body in json.loads(args.specs).items()
        }
    cfg = PipelineConfig(
        changelog_path=args.changelog,
        target_path=args.target,
        lineage_path=args.lineage,
        checkpoint_dir=args.checkpoint,
        replication_method="FULL_TABLE" if args.full_table else "INCREMENTAL",
        n_buckets=args.buckets,
        selected_columns=args.columns.split(",") if args.columns else None,
        changelog_format=args.format,
        sink_mode=args.sink_mode,
        property_specs=specs,
        tinyint_as_boolean=args.tinyint_as_boolean,
        max_records_per_file=args.max_records_per_file,
        source_format=args.source_format,
        source_options=json.loads(args.source_options)
        if args.source_options
        else None,
        delta_feed_compact_every=args.delta_feed_compact_every,
        rejects_path=args.rejects_path,
        decode_errors=args.decode_errors,
        sink_compact_every=args.sink_compact_every,
        sink_tombstone_lateness=args.sink_tombstone_lateness,
        max_files_per_trigger=args.max_files_per_trigger,
    )
    p = CDCPipeline(spark, cfg)
    if args.bootstrap_snapshot:
        # copy-then-stream (planetscale_edge_database.go:175-186): load the
        # existing table as chunked seq=-1 INSERTs (resumable via the
        # persisted last_pk cursor), then the normal replay applies the
        # change log on top
        from singer_tap_spark.sync import bootstrap_from_snapshot

        snap = spark.read.parquet(args.bootstrap_snapshot)
        bootstrap_from_snapshot(
            p, snap, ts_col=args.bootstrap_ts_col, n_chunks=args.bootstrap_chunks
        )
    if args.reprocess_rejects:
        if args.delta_feed:
            raise SystemExit(
                "--reprocess-rejects drains into the MERGE TABLE; the "
                "delta-feed head has no reprocess path (recovered rows "
                "would silently bypass feed consumers) — run the drain "
                "against the table pipeline instead"
            )
        bm = p.reprocess_rejects(allow_cow=args.reprocess_allow_cow)
        print(json.dumps({
            "reprocessed": bm is not None,
            "applied_events": bm.events if bm else 0,
            "still_rejected": bm.n_rejects if bm else -1,
        }))
        return
    if args.delta_feed:
        fm = p.run_delta_feed(
            args.delta_feed,
            available_now=not args.continuous,
            impl=args.delta_feed_impl,
        )
        print(json.dumps({"delta_feed": args.delta_feed,
                          "impl": args.delta_feed_impl,
                          "metrics": json.loads(fm.to_json())}))
        return
    m = p.run_streaming(available_now=not args.continuous) if args.streaming else p.replay(
        n_batches=args.batches
    )
    print(m.to_json())


def _discover(args) -> None:
    from singer_tap_spark import get_spark
    from singer_tap_spark.catalog import discover

    spark = get_spark("singer-tap-spark-discover")
    keys = json.loads(args.keys) if args.keys else {}
    cat = discover(spark, args.root, key_properties=keys)
    cat.save(args.out)
    print(json.dumps({"streams": [s.name for s in cat.streams], "out": args.out}))


def _bench_replay(args) -> None:
    import os

    if args.cpus:
        os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)
    from singer_tap_spark import CDCPipeline, PipelineConfig, get_spark
    from singer_tap_spark.changelog import generate_changelog, write_changelog

    spark = get_spark(f"bench-replay-{args.cpus or 'env'}")
    spark.sparkContext.setLogLevel("ERROR")
    base = args.workdir
    shutil.rmtree(base, ignore_errors=True)
    log_path = f"{base}/log"
    gen_t0 = time.monotonic()
    df = generate_changelog(
        spark,
        args.events,
        seed=args.seed,
        update_frac=0.3,
        delete_frac=0.05,
        dup_frac=0.02,
        hot_conv_frac=args.hot_frac,
        n_shards=args.shards,
    )
    if args.shard_subset:
        # executor analogue (bench/scaling_multijvm.py): this process owns
        # shard i of every k — conversations are shard-local, so JVMs
        # partition the work exactly like bucketed executors on a cluster
        from pyspark.sql import functions as F

        i, k = (int(x) for x in args.shard_subset.split(":"))
        keep = [f"shard-{s}" for s in range(args.shards) if s % k == i]
        df = df.where(F.col("shard").isin(keep))
    if args.key_subset:
        # finer-grained executor analogue for the SKEW session: split on the
        # conversation key hash, not the source shard — the granularity a
        # real cluster's merge shuffle distributes on.  A single hot
        # conversation is still atomic under ANY conv-keyed partitioning
        # (the merge must co-locate a key's events), so the hot JVM's share
        # sets a structural cap the report quantifies.
        from pyspark.sql import functions as F

        i, k = (int(x) for x in args.key_subset.split(":"))
        df = df.where(F.pmod(F.xxhash64("conv_id"), F.lit(k)) == i)
    write_changelog(df, log_path, n_files_per_shard=args.files_per_shard)
    gen_s = time.monotonic() - gen_t0

    # several full replays in one JVM: rep 1 warms the JIT for the exact
    # plan; best-of captures uncontended capability on a noisy host
    runs = []
    rows = None
    for rep in range(max(1, args.reps)):
        for sub in ("tgt", "lineage.json", "ckpt"):
            path = f"{base}/{sub}"
            if os.path.isfile(path):
                os.remove(path)
            else:
                shutil.rmtree(path, ignore_errors=True)
        cfg = PipelineConfig(
            changelog_path=log_path,
            target_path=f"{base}/tgt",
            lineage_path=f"{base}/lineage.json",
            checkpoint_dir=f"{base}/ckpt",
            n_buckets=args.buckets,
        )
        p = CDCPipeline(spark, cfg)
        t0 = time.monotonic()
        m = p.run_streaming(available_now=True) if args.streaming else p.replay(
            n_batches=args.batches
        )
        apply_s = time.monotonic() - t0
        r = p.lake.read().count()
        assert rows is None or rows == r, "final state diverged across reps"
        rows = r
        runs.append(
            {"apply_seconds": round(apply_s, 2),
             "events_per_sec": round(m.total_events / apply_s, 1),
             "events": m.total_events}
        )
    best = min(runs, key=lambda r: r["apply_seconds"])
    out = {
        "events": best["events"],
        "gen_seconds": round(gen_s, 2),
        "apply_seconds": best["apply_seconds"],
        "events_per_sec": best["events_per_sec"],
        "final_rows": rows,
        "cpus": args.cpus,
        "runs": runs,
    }
    if not args.keep:
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out))


def _dedup_stream(args) -> None:
    """spark-submit surface for the ops streaming half: tail a parquet
    document stream, dedup every arriving doc against the persisted
    MinHash index, optionally fold each batch's pairs into the persisted
    near-dup clustering — see run_streaming_dedup for the exactly-once
    argument (no marker; every write idempotent, chaos-tested)."""
    from singer_tap_spark import get_spark
    from singer_tap_spark.ops.incremental import (
        ClusterIndex,
        MinHashIndex,
        SimHashIndex,
        run_streaming_dedup,
    )

    spark = get_spark("singer-tap-spark-dedup-stream")
    if args.index_kind == "simhash":
        idx = SimHashIndex(spark, args.index)
        mk = {"max_hamming": args.max_hamming}
    else:
        idx = MinHashIndex(spark, args.index)
        mk = {"verify_threshold": args.verify_threshold}
    cc = ClusterIndex(spark, args.clusters) if args.clusters else None
    run_streaming_dedup(
        spark,
        args.docs,
        idx,
        args.pairs,
        args.checkpoint,
        text_col=args.text_col,
        id_col=args.id_col,
        max_files_per_trigger=args.max_files_per_trigger,
        available_now=not args.follow,
        cluster_index=cc,
        op_col=args.op_col,
        match_kwargs=mk,
    )
    # a delete-only (or empty) feed legitimately never creates the pairs
    # dir or the cluster table — report zeros instead of crashing AFTER
    # the work committed (a non-zero exit here would make a supervisor
    # retry a run that already succeeded)
    n_pairs = (
        spark.read.parquet(args.pairs).count()
        if os.path.isdir(args.pairs) and os.listdir(args.pairs) else 0
    )
    print(json.dumps({
        "pairs_total": n_pairs,
        "index_docs": idx.read_signatures().count() if idx.exists() else 0,
        "clusters": (
            (cc.read_clusters().count() if cc.exists() else 0)
            if cc is not None else None
        ),
    }))


def _ann_stream(args) -> None:
    """spark-submit surface for the EMBEDDING streaming half: tail a
    parquet vector stream, near-dup every arriving vector against the
    persisted EmbeddingLSHIndex, optionally maintain the IVF index and the
    near-dup clustering in the same microbatch — see run_streaming_ann
    for the exactly-once argument (no marker; every write idempotent,
    chaos-tested)."""
    from singer_tap_spark import get_spark
    from singer_tap_spark.ops.incremental import (
        ClusterIndex,
        EmbeddingLSHIndex,
        IVFIndex,
        run_streaming_ann,
    )

    spark = get_spark("singer-tap-spark-ann-stream")
    idx = EmbeddingLSHIndex(
        spark, args.index, dim=args.dim,
        n_planes=args.n_planes, n_tables=args.n_tables,
    )
    cc = ClusterIndex(spark, args.clusters) if args.clusters else None
    ivf = IVFIndex(spark, args.ivf) if args.ivf else None
    run_streaming_ann(
        spark,
        args.vectors,
        idx,
        args.pairs,
        args.checkpoint,
        vec_col=args.vec_col,
        id_col=args.id_col,
        threshold=args.threshold,
        max_files_per_trigger=args.max_files_per_trigger,
        available_now=not args.follow,
        cluster_index=cc,
        ivf_index=ivf,
        op_col=args.op_col,
    )
    n_pairs = (
        spark.read.parquet(args.pairs).count()
        if os.path.isdir(args.pairs) and os.listdir(args.pairs) else 0
    )
    print(json.dumps({
        "pairs_total": n_pairs,
        "index_vecs": idx.read_signatures().count() if idx.exists() else 0,
        "ivf_vecs": (
            (ivf.read_assignments().count() if ivf.exists() else 0)
            if ivf is not None else None
        ),
        "clusters": (
            (cc.read_clusters().count() if cc.exists() else 0)
            if cc is not None else None
        ),
    }))


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="singer-tap-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("sync", help="apply the change log to the lake table")
    s.add_argument("--changelog", required=True)
    s.add_argument("--target", required=True)
    s.add_argument("--lineage", required=True)
    s.add_argument("--checkpoint", default=None)
    s.add_argument("--streaming", action="store_true")
    s.add_argument("--continuous", action="store_true")
    s.add_argument("--full-table", action="store_true")
    s.add_argument("--batches", type=int, default=1)
    s.add_argument("--buckets", type=int, default=16)
    s.add_argument("--columns", default=None, help="comma-separated payload selection")
    s.add_argument("--format", choices=["parquet", "jsonl"], default="parquet")
    s.add_argument("--sink-mode", choices=["cow", "mor"], default="cow")
    s.add_argument(
        "--max-records-per-file", type=int, default=0,
        help="cap rows per parquet file at the sink (O15 size-capped "
             "batches; 0 = Spark's own file sizing)",
    )
    s.add_argument(
        "--delta-feed", default=None, metavar="PATH",
        help="streaming head: write the stateful per-key UPSERT/DELETE "
             "delta feed to PATH instead of materializing the table",
    )
    s.add_argument(
        "--bootstrap-snapshot", default=None, metavar="PATH",
        help="stand up the table from an existing snapshot (parquet) before "
             "applying the change log — VStream's copy-then-stream phase; "
             "chunked + resumable via the persisted last_pk cursor",
    )
    s.add_argument(
        "--bootstrap-chunks", type=int, default=1,
        help="apply the snapshot in N contiguous PK-range chunks; a crash "
             "resumes after the last completed chunk",
    )
    s.add_argument(
        "--bootstrap-ts-col", default="ts",
        help="snapshot column holding the LWW timestamp",
    )
    s.add_argument(
        "--delta-feed-impl", choices=["merge", "stateful"], default="merge",
        help="delta-feed engine: 'merge' = JVM keyed-state table (scale "
             "path); 'stateful' = applyInPandasWithState operator",
    )
    s.add_argument(
        "--specs", default=None,
        help='JSON property specs for type normalization (O12), e.g. '
             '{"ts": {"type": ["null", "string"], "format": "date-time"}}',
    )
    s.add_argument(
        "--source-format", default=None, metavar="FMT",
        help="pluggable streaming source: route the stream through "
             "readStream.format(FMT) (e.g. kafka — cluster-only; file "
             "formats and the in-repo cdc_archive_tail Python source "
             "tested locally).  Default: the native file tail",
    )
    s.add_argument(
        "--source-options", default=None, metavar="JSON",
        help='options for --source-format, e.g. '
             '{"kafka.bootstrap.servers": "...", "subscribe": "binlog"}',
    )
    s.add_argument(
        "--delta-feed-compact-every", type=int, default=16,
        help="fold the delta feed's mor state deltas into its base every "
             "K microbatches (0 = never)",
    )
    s.add_argument(
        "--sink-compact-every", type=int, default=0,
        help="mor sink maintenance: fold the target table's delta files "
             "into its base every K applied batches (0 = never; cow "
             "ignores)",
    )
    s.add_argument(
        "--max-files-per-trigger", type=int, default=64,
        help="streaming micro-batch pacing: log files per trigger "
             "(the reference's batch-size knob analogue)",
    )
    s.add_argument(
        "--sink-tombstone-lateness", default=None, metavar="INTERVAL",
        help="GC bound for retained delete tombstones at cadenced "
             "compaction, e.g. '7 days': tombstones older than "
             "max(state ts) - INTERVAL are dropped (event-time watermark "
             "rule).  Default: retain forever",
    )
    s.add_argument(
        "--rejects-path", default=None, metavar="PATH",
        help="dead-letter queue for the jsonl/payload wire: undecodable "
             "lines land here as (value, reason) parquet instead of being "
             "dropped — idempotent per batch; the reference aborts the run "
             "instead (http-tap/main.go:59-61)",
    )
    s.add_argument(
        "--decode-errors", choices=["skip", "fail"], default="skip",
        help="'fail' restores the reference's abort-on-bad-line semantics",
    )
    s.add_argument(
        "--reprocess-allow-cow", action="store_true",
        help="acknowledge the cow-sink resurrection caveat when draining "
             "(quarantined keys must be never-deleted); default requires "
             "--sink-mode mor",
    )
    s.add_argument(
        "--reprocess-rejects", action="store_true",
        help="drain the DLQ: re-decode quarantined lines under the current "
             "wire schema, merge the now-good rows (idempotent), rewrite "
             "the quarantine with only the still-bad lines",
    )
    s.add_argument(
        "--tinyint-as-boolean", action=argparse.BooleanOptionalAction,
        default=True,
        help="treat boolean-typed properties as booleans vs 0/1 ints "
             "(singer-tap main.go:43)",
    )
    s.set_defaults(fn=_sync)

    d = sub.add_parser("discover", help="emit a catalog for a lake namespace")
    d.add_argument("--root", required=True)
    d.add_argument("--out", required=True)
    d.add_argument("--keys", default=None, help='JSON: {"table": ["pk", ...]}')
    d.set_defaults(fn=_discover)

    b = sub.add_parser("bench-replay", help="synthetic end-to-end throughput run")
    b.add_argument("--events", type=int, default=1_000_000)
    b.add_argument("--cpus", type=int, default=None)
    b.add_argument("--seed", type=int, default=42)
    b.add_argument("--shards", type=int, default=8)
    b.add_argument("--buckets", type=int, default=32)
    b.add_argument("--batches", type=int, default=1)
    b.add_argument("--files-per-shard", type=int, default=8)
    b.add_argument("--streaming", action="store_true")
    b.add_argument("--reps", type=int, default=1)
    b.add_argument(
        "--hot-frac", type=float, default=0.1,
        help="fraction of events funneled into one hot conversation "
             "(0 for the multi-JVM scaling protocol: isolated JVMs cannot "
             "rebalance source skew the way one app's shuffle does)",
    )
    b.add_argument(
        "--shard-subset", default=None, metavar="i:k",
        help="process only shards where shard_index %% k == i (multi-JVM "
             "executor-analogue scaling protocol)",
    )
    b.add_argument(
        "--key-subset", default=None, metavar="i:k",
        help="process only conversations where xxhash64(conv_id) %% k == i "
             "(key-hash executor analogue for the skewed scaling session)",
    )
    b.add_argument("--workdir", default="/tmp/singer_tap_spark_bench")
    b.add_argument("--keep", action="store_true")
    b.set_defaults(fn=_bench_replay)

    ds = sub.add_parser(
        "dedup-stream",
        help="streaming corpus dedup vs a persisted MinHash index "
             "(optionally maintaining the near-dup cluster index)",
    )
    ds.add_argument("--docs", required=True, help="parquet document stream dir")
    ds.add_argument("--index", required=True, help="MinHash index path")
    ds.add_argument("--pairs", required=True, help="pair output dir (batch=N)")
    ds.add_argument("--checkpoint", required=True)
    ds.add_argument("--clusters", default=None,
                    help="ClusterIndex path: fold each batch's pairs into "
                         "the persisted near-dup clustering")
    ds.add_argument("--text-col", default="text")
    ds.add_argument("--id-col", default="doc_id")
    ds.add_argument("--index-kind", choices=("minhash", "simhash"),
                    default="minhash",
                    help="signature flavor: MinHash+Jaccard verify or "
                         "SimHash+Hamming verify (same streaming machinery)")
    ds.add_argument("--verify-threshold", type=float, default=0.5,
                    help="minhash: exact-Jaccard verify threshold")
    ds.add_argument("--max-hamming", type=int, default=3,
                    help="simhash: Hamming distance bound")
    ds.add_argument("--max-files-per-trigger", type=int, default=64)
    ds.add_argument("--op-col", default=None,
                    help="CDC document feeds: rows with this column == "
                         "'DELETE' remove the doc from index + clustering "
                         "(deletes apply before the batch's upserts)")
    ds.add_argument("--follow", action="store_true",
                    help="keep tailing instead of drain-and-stop "
                         "(AvailableNow)")
    ds.set_defaults(fn=_dedup_stream)

    an = sub.add_parser(
        "ann-stream",
        help="streaming embedding dedup/ANN vs a persisted LSH index "
             "(optionally maintaining the IVF and near-dup cluster indexes)",
    )
    an.add_argument("--vectors", required=True,
                    help="parquet vector stream dir")
    an.add_argument("--index", required=True, help="EmbeddingLSHIndex path")
    an.add_argument("--dim", required=True, type=int,
                    help="embedding dimension (pinned in the index meta)")
    an.add_argument("--pairs", required=True, help="pair output dir (batch=N)")
    an.add_argument("--checkpoint", required=True)
    an.add_argument("--clusters", default=None,
                    help="ClusterIndex path: fold each batch's pairs into "
                         "the persisted near-dup clustering")
    an.add_argument("--ivf", default=None,
                    help="IVFIndex path: maintain inverted-list assignments "
                         "per batch (trained on the first batch)")
    an.add_argument("--vec-col", default="embedding")
    an.add_argument("--id-col", default="vec_id")
    an.add_argument("--threshold", type=float, default=0.9)
    an.add_argument("--n-planes", type=int, default=2)
    an.add_argument("--n-tables", type=int, default=16)
    an.add_argument("--max-files-per-trigger", type=int, default=64)
    an.add_argument("--op-col", default=None,
                    help="CDC vector feeds: rows with this column == "
                         "'DELETE' remove the vector from every index "
                         "(deletes apply before the batch's upserts)")
    an.add_argument("--follow", action="store_true",
                    help="keep tailing instead of drain-and-stop "
                         "(AvailableNow)")
    an.set_defaults(fn=_ann_stream)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    if __package__ in (None, ""):  # ran as a plain file: put the repo on path
        import os

        _root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys.path.insert(0, _root)
        # Python WORKERS inherit the driver's ENVIRONMENT, not its
        # sys.path: an Arrow UDF defined in this package (the embedding
        # GEMM signature kernels, the IVF assignment GEMV) pickles by
        # reference and must be importable inside the worker — without
        # this, `python job.py ann-stream` launched from outside the repo
        # dies with ModuleNotFoundError in its first UDF batch.  Must be
        # set BEFORE the JVM starts (workers fork from it).  On a real
        # cluster spark-submit --py-files ships the package instead.
        os.environ["PYTHONPATH"] = (
            _root + os.pathsep + os.environ.get("PYTHONPATH", "")
        ).rstrip(os.pathsep)
    main()
