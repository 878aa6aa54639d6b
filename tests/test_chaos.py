"""SIGKILL chaos: the exactly-once contract under uncooperative crashes.

The deterministic forced-replay tests cover each crash WINDOW precisely;
these tests cover crash BREADTH — a subprocess streaming sync is SIGKILLed
mid-run (no cleanup, no atexit, a real `kill -9`), restarted, killed
again, and run to completion through the spark-submit surface
(python -m singer_tap_spark.job).  The final table must equal the DuckDB
naive-LWW oracle and a further run must apply zero events.

Delivery-order contract exercised per sink mode:
- mor: retains the full event history as deltas (and keeps tombstones at
  in-stream compaction), so read-time LWW equals the global LWW under
  ARBITRARY cross-microbatch reordering — the salted multi-file log with
  one-file triggers scrambles per-key event order on purpose.
- cow: drops per-batch losers and deleted keys immediately, so it relies
  on the binlog contract the reference's sequential VStream tail also
  assumes — a key's DELETE is delivered no earlier than its other events
  (per-shard offset-ordered files here: one file per shard).
"""

import json
import os
import signal
import subprocess
import sys
import time

from singer_tap_spark import CDCPipeline, PipelineConfig
from singer_tap_spark.changelog import generate_changelog, write_changelog
from tests.conftest import assert_frames_equal, duck, lww_oracle_sql

KEYS = ["conv_id", "turn_idx"]
COLS = ["conv_id", "turn_idx", "text"]


def _spawn(base, sink_mode):
    env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
    return subprocess.Popen(
        [sys.executable, "-m", "singer_tap_spark.job", "sync",
         "--changelog", f"{base}/log", "--target", f"{base}/tgt",
         "--lineage", f"{base}/lin.json", "--checkpoint", f"{base}/ckpt",
         "--streaming", "--max-files-per-trigger", "1",
         "--sink-mode", sink_mode],
        cwd="/root/repo", env=env,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
    )


def _chaos_run(base, sink_mode):
    # two SIGKILLs mid-stream, then a run to completion.  Guards keep the
    # coverage honest on faster/slower hosts: each kill must actually
    # land (process still alive) and at least one kill must land AFTER
    # progress was committed (lineage exists) but BEFORE completion —
    # i.e. a genuine mid-stream crash, not a pre-boot or post-finish one.
    killed_mid_stream = 0
    for extra in (1.0, 2.5):
        p = _spawn(base, sink_mode)
        # poll until the FIRST batch commits (lineage file appears), then
        # let a little more work happen and kill — host-speed independent
        deadline = time.monotonic() + 120
        while (time.monotonic() < deadline and p.poll() is None
               and not os.path.exists(f"{base}/lin.json")):
            time.sleep(0.5)
        time.sleep(extra)
        if p.poll() is None:
            progressed = os.path.exists(f"{base}/lin.json")
            p.send_signal(signal.SIGKILL)
            p.wait()
            if progressed:
                killed_mid_stream += 1
    assert killed_mid_stream >= 1, (
        "chaos degenerated: no kill landed after first commit — retune "
        "the sleeps for this host"
    )
    p = _spawn(base, sink_mode)
    out, _ = p.communicate(timeout=600)
    assert p.returncode == 0, out[-2000:]
    # convergence: one more run applies zero events
    p2 = _spawn(base, sink_mode)
    out2, _ = p2.communicate(timeout=600)
    assert p2.returncode == 0
    m = json.loads(out2.decode().strip().splitlines()[-1])
    assert m["total_events"] == 0, m


def test_sigkill_chaos_mor_unordered_delivery(spark, tmp_path):
    """mor sink, salted multi-file log (per-key order scrambled across
    one-file microbatches) + two kill -9: still converges to the oracle."""
    base = str(tmp_path)
    df = generate_changelog(spark, 20000, update_frac=0.4, delete_frac=0.1,
                            dup_frac=0.05)
    write_changelog(df, f"{base}/log", n_files_per_shard=3)
    _chaos_run(base, "mor")
    cfg = PipelineConfig(
        changelog_path=f"{base}/log", target_path=f"{base}/tgt",
        lineage_path=f"{base}/lin.json", sink_mode="mor",
    )
    got = CDCPipeline(spark, cfg).lake.read().select(*COLS).toPandas()
    want = duck(lww_oracle_sql(f"{base}/log/*/*.parquet"))[COLS]
    assert_frames_equal(got, want, KEYS)


def test_sigkill_chaos_cow_ordered_delivery(spark, tmp_path):
    """cow sink under the binlog contract (one offset-ordered file per
    shard, so a key's delete never precedes its other events across
    batches) + two kill -9: converges to the oracle."""
    base = str(tmp_path)
    df = generate_changelog(spark, 20000, update_frac=0.4, delete_frac=0.1,
                            dup_frac=0.05)
    write_changelog(df, f"{base}/log", n_files_per_shard=1)
    _chaos_run(base, "cow")
    cfg = PipelineConfig(
        changelog_path=f"{base}/log", target_path=f"{base}/tgt",
        lineage_path=f"{base}/lin.json",
    )
    got = CDCPipeline(spark, cfg).lake.read().select(*COLS).toPandas()
    want = duck(lww_oracle_sql(f"{base}/log/*/*.parquet"))[COLS]
    assert_frames_equal(got, want, KEYS)


def test_sigkill_chaos_delta_feed(spark, tmp_path):
    """The delta feed's three-artifact crash contract (feed _SUCCESS ->
    mor state merge -> _last_batch marker) under real kill -9s: the
    resolved union of all emitted batch partitions equals the LWW oracle
    over the log, and a further run emits no new batches."""
    from singer_tap_spark.dedup import lww_latest

    base = str(tmp_path)
    df = generate_changelog(spark, 20000, update_frac=0.4, delete_frac=0.1,
                            dup_frac=0.05)
    write_changelog(df, f"{base}/log", n_files_per_shard=1)

    def spawn():
        env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
        return subprocess.Popen(
            [sys.executable, "-m", "singer_tap_spark.job", "sync",
             "--changelog", f"{base}/log", "--target", f"{base}/tgt",
             "--lineage", f"{base}/lin.json", "--checkpoint", f"{base}/ckpt",
             "--streaming", "--max-files-per-trigger", "1",
             "--delta-feed", f"{base}/feed", "--delta-feed-compact-every", "2"],
            cwd="/root/repo", env=env,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        )

    killed_mid_stream = 0
    for extra in (1.0, 2.5):
        p = spawn()
        deadline = time.monotonic() + 120
        while (time.monotonic() < deadline and p.poll() is None
               and not os.path.exists(f"{base}/feed_state/_last_batch.json")):
            time.sleep(0.5)
        time.sleep(extra)
        if p.poll() is None:
            progressed = os.path.exists(f"{base}/feed_state/_last_batch.json")
            p.send_signal(signal.SIGKILL)
            p.wait()
            if progressed:
                killed_mid_stream += 1
    assert killed_mid_stream >= 1
    p = spawn()
    out, _ = p.communicate(timeout=600)
    assert p.returncode == 0, out[-2000:]

    resolved = lww_latest(
        spark.read.parquet(f"{base}/feed"), ("conv_id", "turn_idx"),
        ("ts", "seq"), value_cols=["op", "text", "ts", "seq"],
    )
    got = (
        resolved.where("op <> 'DELETE'")
        .select("conv_id", "turn_idx", "text")
        .toPandas()
    )
    want = duck(lww_oracle_sql(f"{base}/log/*/*.parquet"))[COLS]
    assert_frames_equal(got, want, KEYS)

    # convergence: a further run emits no new feed partitions
    before = set(os.listdir(f"{base}/feed"))
    p2 = spawn()
    out2, _ = p2.communicate(timeout=600)
    assert p2.returncode == 0
    after = {e for e in os.listdir(f"{base}/feed") if e.startswith("batch=")}
    assert {e for e in before if e.startswith("batch=")} == after


def test_sigkill_chaos_streaming_dedup_clusters(spark, tmp_path):
    """The ops streaming half (run_streaming_dedup + ClusterIndex fold)
    under genuine kill -9 — the surface with NO marker protocol at all
    (every write idempotent by construction): after two mid-stream kills
    and a run to completion, the pair union, the signature index, and the
    persisted clustering must all equal the one-shot recompute, and a
    further run must emit no new batch partitions."""
    from pyspark.sql import functions as F

    from singer_tap_spark.ops.cluster import near_dup_clusters
    from singer_tap_spark.ops.dedup_text import minhash_lsh_candidates
    from singer_tap_spark.ops.incremental import ClusterIndex, MinHashIndex

    base = str(tmp_path)
    d = (
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .where(F.col("doc_id") < 100)
        .select("doc_id", "text")
    )
    d.repartition(10).write.parquet(f"{base}/docs")

    script = (
        "import os\n"
        "os.environ['SPARK_GRAFT_CPUS'] = '4'\n"
        "import singer_tap_spark as sts\n"
        "from singer_tap_spark.ops.incremental import (\n"
        "    ClusterIndex, MinHashIndex, run_streaming_dedup)\n"
        "spark = sts.get_spark('chaos_dedup')\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        f"idx = MinHashIndex(spark, '{base}/idx')\n"
        f"cc = ClusterIndex(spark, '{base}/cc')\n"
        f"run_streaming_dedup(spark, '{base}/docs', idx, '{base}/pairs',\n"
        f"                    '{base}/ckpt', max_files_per_trigger=1,\n"
        "                    cluster_index=cc)\n"
        "print('DEDUP-DONE')\n"
    )

    def spawn():
        env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
        return subprocess.Popen(
            [sys.executable, "-c", script], cwd="/root/repo", env=env,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        )

    killed_mid_stream = 0
    for extra in (1.0, 2.5):
        p = spawn()
        deadline = time.monotonic() + 120
        while (time.monotonic() < deadline and p.poll() is None
               and not os.path.exists(f"{base}/pairs")):
            time.sleep(0.5)
        time.sleep(extra)
        if p.poll() is None:
            progressed = os.path.exists(f"{base}/pairs")
            p.send_signal(signal.SIGKILL)
            p.wait()
            if progressed:
                killed_mid_stream += 1
    assert killed_mid_stream >= 1, (
        "chaos degenerated: no kill landed after first pair commit"
    )
    p = spawn()
    out, _ = p.communicate(timeout=600)
    assert p.returncode == 0 and b"DEDUP-DONE" in out, out[-2000:]

    # equality with the one-shot recompute on every persisted artifact
    idx = MinHashIndex(spark, f"{base}/idx")
    cc = ClusterIndex(spark, f"{base}/cc")
    got_pairs = {(r["a"], r["b"]) for r in
                 spark.read.parquet(f"{base}/pairs").select("a", "b").collect()}
    want_pairs_df = minhash_lsh_candidates(d, verify_threshold=0.5)
    want_pairs = {(r["a"], r["b"]) for r in want_pairs_df.select("a", "b").collect()}
    assert got_pairs == want_pairs
    assert idx.read_signatures().count() == d.count()
    got_cc = {(r["doc_id"], r["cluster_id"]) for r in cc.read_clusters().collect()}
    want_cc = {(r["doc_id"], r["cluster_id"]) for r in near_dup_clusters(
        d.select("doc_id"), want_pairs_df.select("a", "b")).collect()}
    assert got_cc == want_cc

    # convergence: a further run emits no new batch partitions
    before = {e for e in os.listdir(f"{base}/pairs") if e.startswith("batch=")}
    p2 = spawn()
    out2, _ = p2.communicate(timeout=600)
    assert p2.returncode == 0 and b"DEDUP-DONE" in out2
    after = {e for e in os.listdir(f"{base}/pairs") if e.startswith("batch=")}
    assert before == after


def test_sigkill_chaos_streaming_ann(spark, tmp_path):
    """run_streaming_ann (EmbeddingLSHIndex + IVFIndex + ClusterIndex per
    microbatch) under genuine kill -9 — the r6 embedding twin of the
    dedup-clusters chaos case, through the spark-submit `ann-stream`
    surface: after two mid-stream kills (one may land inside the IVF
    build window or the cluster plan->merge window) and a run to
    completion, the pair union, the LSH index, the IVF assignments, and
    the persisted clustering must all equal the one-shot recompute, and a
    further run must emit no new batch partitions."""
    from pyspark.sql import functions as F

    from singer_tap_spark.ops.cluster import near_dup_clusters
    from singer_tap_spark.ops.incremental import (
        ClusterIndex,
        EmbeddingLSHIndex,
        IVFIndex,
    )
    from singer_tap_spark.ops.similarity import embedding_near_dup_pairs

    base = str(tmp_path)
    emb = (
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .where(F.col("vec_id") < 200)
        .select("vec_id", "embedding")
    )
    dim = len(emb.select("embedding").first()[0])
    emb.repartition(10).write.parquet(f"{base}/vecs")

    def spawn():
        env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
        return subprocess.Popen(
            [sys.executable, "-m", "singer_tap_spark.job", "ann-stream",
             "--vectors", f"{base}/vecs", "--index", f"{base}/eidx",
             "--dim", str(dim), "--pairs", f"{base}/pairs",
             "--checkpoint", f"{base}/ckpt", "--clusters", f"{base}/cc",
             "--ivf", f"{base}/ivf", "--threshold", "0.35",
             "--max-files-per-trigger", "1"],
            cwd="/root/repo", env=env,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        )

    killed_mid_stream = 0
    for extra in (1.0, 2.5):
        p = spawn()
        deadline = time.monotonic() + 120
        while (time.monotonic() < deadline and p.poll() is None
               and not os.path.exists(f"{base}/pairs")):
            time.sleep(0.5)
        time.sleep(extra)
        if p.poll() is None:
            progressed = os.path.exists(f"{base}/pairs")
            p.send_signal(signal.SIGKILL)
            p.wait()
            if progressed:
                killed_mid_stream += 1
    assert killed_mid_stream >= 1, (
        "chaos degenerated: no kill landed after first pair commit"
    )
    p = spawn()
    out, _ = p.communicate(timeout=600)
    assert p.returncode == 0 and b"pairs_total" in out, out[-2000:]

    idx = EmbeddingLSHIndex(spark, f"{base}/eidx", dim=dim)
    cc = ClusterIndex(spark, f"{base}/cc")
    ivf = IVFIndex(spark, f"{base}/ivf")
    got_pairs = {
        (r["a"], r["b"]) for r in
        spark.read.parquet(f"{base}/pairs").select("a", "b").collect()
    }
    want_pairs_df = embedding_near_dup_pairs(
        emb, threshold=0.35, n_planes=idx.n_planes, n_tables=idx.n_tables
    )
    want_pairs = {
        (r["a"], r["b"]) for r in want_pairs_df.select("a", "b").collect()
    }
    assert got_pairs == want_pairs
    assert idx.read_signatures().count() == 200
    assert ivf.read_assignments().count() == 200
    got_cc = {
        (r["doc_id"], r["cluster_id"]) for r in cc.read_clusters().collect()
    }
    want_cc = {
        (r["doc_id"], r["cluster_id"]) for r in near_dup_clusters(
            emb.select(F.col("vec_id").alias("doc_id")),
            want_pairs_df.select("a", "b"),
        ).collect()
    }
    assert got_cc == want_cc
    # both mirrors still exactly track their primaries through the kills
    got_mirror = {
        (r["doc_id"], r["cluster_id"])
        for r in cc.mirror.read().select("doc_id", "cluster_id").collect()
    }
    assert got_mirror == got_cc
    ivf_prim = {(r["doc_id"], r["cid"]) for r in
                ivf.table.read().select("doc_id", "cid").collect()}
    ivf_mirr = {(r["doc_id"], r["cid"]) for r in
                ivf.mirror.read().select("doc_id", "cid").collect()}
    assert ivf_mirr == ivf_prim

    # convergence: a further run emits no new batch partitions
    before = {e for e in os.listdir(f"{base}/pairs") if e.startswith("batch=")}
    p2 = spawn()
    out2, _ = p2.communicate(timeout=600)
    assert p2.returncode == 0
    after = {e for e in os.listdir(f"{base}/pairs") if e.startswith("batch=")}
    assert before == after


def test_sigkill_chaos_pysource_archive_tail(spark, tmp_path):
    """The cdc_archive_tail Python DataSource feeding the CDC pipeline
    under genuine kill -9 (VERDICT r5 next #6): the non-file source must
    carry the same exactly-once evidence as the file source — checkpointed
    {file,row} offsets, maxEventsPerBatch pacing, partition-parallel
    slices — through two mid-stream kills and a run to completion.  Final
    state == the DuckDB naive-LWW oracle over the archive bytes; a further
    run applies zero events.

    Delivery-order contract (documented in pysource.py): slices fan out
    across tasks, so INTRA-batch row order is scrambled — mor's read-time
    LWW is order-independent, the honest sink match; CROSS-batch order
    follows segment commit order (write_archive appends in commit order),
    which is what cow would need."""
    from singer_tap_spark.pysource import write_archive

    base = str(tmp_path)
    df = generate_changelog(
        spark, 12000, delete_frac=0.1, update_frac=0.4, dup_frac=0.05
    )
    write_archive(df, f"{base}/log", max_records_per_file=1000)

    script = (
        "import os\n"
        "os.environ['SPARK_GRAFT_CPUS'] = '4'\n"
        "import singer_tap_spark as sts\n"
        "spark = sts.get_spark('chaos_pysource')\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        "cfg = sts.PipelineConfig(\n"
        f"    changelog_path='{base}/log', target_path='{base}/tgt',\n"
        f"    lineage_path='{base}/lin.json', checkpoint_dir='{base}/ckpt',\n"
        "    source_format='cdc_archive_tail', sink_mode='mor',\n"
        "    source_options={'maxEventsPerBatch': '1500',\n"
        "                    'rowsPerTask': '500'},\n"
        ")\n"
        "m = sts.CDCPipeline(spark, cfg).run_streaming(available_now=True)\n"
        "print('PYSOURCE-DONE', m.total_events)\n"
    )

    def spawn():
        env = {**os.environ, "SPARK_GRAFT_CPUS": "4"}
        return subprocess.Popen(
            [sys.executable, "-c", script], cwd="/root/repo", env=env,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        )

    killed_mid_stream = 0
    for extra in (1.0, 2.5):
        p = spawn()
        deadline = time.monotonic() + 120
        while (time.monotonic() < deadline and p.poll() is None
               and not os.path.exists(f"{base}/tgt")):
            time.sleep(0.5)
        time.sleep(extra)
        if p.poll() is None:
            progressed = os.path.exists(f"{base}/tgt")
            p.send_signal(signal.SIGKILL)
            p.wait()
            if progressed:
                killed_mid_stream += 1
    assert killed_mid_stream >= 1, (
        "chaos degenerated: no kill landed after first sink commit"
    )
    p = spawn()
    out, _ = p.communicate(timeout=600)
    assert p.returncode == 0 and b"PYSOURCE-DONE" in out, out[-2000:]

    cfg = PipelineConfig(
        changelog_path=f"{base}/log", target_path=f"{base}/tgt",
        lineage_path=f"{base}/lin.json", checkpoint_dir=f"{base}/ckpt",
        source_format="cdc_archive_tail", sink_mode="mor",
    )
    pipe = CDCPipeline(spark, cfg)
    got = pipe.lake.read().select(*COLS).toPandas()
    want = duck(
        lww_oracle_sql("__never__").replace(
            "read_parquet('__never__', hive_partitioning=1)",
            f"read_parquet('{base}/log/seg-*.parquet')",
        )
    )[COLS]
    assert_frames_equal(got, want, KEYS)

    # a further run applies zero events (offset cursor at archive end)
    p2 = spawn()
    out2, _ = p2.communicate(timeout=600)
    assert p2.returncode == 0 and b"PYSOURCE-DONE 0" in out2, out2[-2000:]
