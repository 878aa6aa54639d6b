"""CLI surface (job.py): sync with --specs / --sink-mode / --delta-feed and
discover — driving main() in-process (get_spark reuses the pytest session)."""

import json
import os

from pyspark.sql import functions as F

from singer_tap_spark.changelog import generate_changelog, write_changelog
from singer_tap_spark.job import main


def test_cli_sync_and_discover(spark, tmp_path, capsys):
    base = str(tmp_path)
    write_changelog(generate_changelog(spark, 2000, delete_frac=0.1), f"{base}/log")

    main([
        "sync", "--changelog", f"{base}/log", "--target", f"{base}/tgt",
        "--lineage", f"{base}/lineage.json",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["total_events"] > 0

    # rerun: cursor resume applies zero events
    main([
        "sync", "--changelog", f"{base}/log", "--target", f"{base}/tgt",
        "--lineage", f"{base}/lineage.json",
    ])
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["total_events"] == 0

    main(["discover", "--root", base, "--out", f"{base}/catalog.json"])
    cat = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "log" in cat["streams"]


def test_cli_sync_specs_normalizes(spark, tmp_path, capsys):
    base = str(tmp_path)
    write_changelog(generate_changelog(spark, 1500), f"{base}/log")
    specs = json.dumps({"ts": {"type": ["null", "string"], "format": "date-time"}})
    main([
        "sync", "--changelog", f"{base}/log", "--target", f"{base}/tgt",
        "--lineage", f"{base}/lineage.json", "--specs", specs,
    ])
    json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    got = spark.read.parquet(f"{base}/tgt/data")
    assert dict(got.dtypes)["ts"] == "string"
    one = got.select("ts").where(F.col("ts") != "").first()[0]
    assert one.endswith("Z") and "T" in one  # RFC3339 reformat applied


def test_cli_delta_feed(spark, tmp_path, capsys):
    base = str(tmp_path)
    write_changelog(generate_changelog(spark, 1500, delete_frac=0.1), f"{base}/log")
    main([
        "sync", "--changelog", f"{base}/log", "--target", f"{base}/tgt",
        "--lineage", f"{base}/lineage.json", "--checkpoint", f"{base}/ckpt",
        "--streaming", "--delta-feed", f"{base}/feed",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["delta_feed"] == f"{base}/feed"
    feed = spark.read.parquet(f"{base}/feed")
    assert feed.count() > 0
    assert "op" in feed.columns and os.path.isdir(f"{base}/ckpt")
    # per-batch emitted-row metrics (reference's record-count logging)
    m = out["metrics"]
    assert m["total_events"] == feed.count()
    assert all(b["events"] >= 0 for b in m["batches"]) and m["batches"]


def test_cli_bootstrap_snapshot_resumes_and_matches_oracle(
    spark, tmp_path, capsys, monkeypatch
):
    """VERDICT r2 #7: `sync --bootstrap-snapshot PATH --bootstrap-chunks N`
    stands up the table from an existing snapshot through the CLI, crash-
    resumes between chunks via the persisted last_pk cursor, and the final
    state equals snapshot-overlaid-with-log-LWW."""
    import pytest

    from singer_tap_spark.pipeline import CDCPipeline
    from conftest import duck, lww_oracle_sql

    base = str(tmp_path)
    write_changelog(
        generate_changelog(spark, 3000, update_frac=0.5, delete_frac=0.1),
        f"{base}/log",
    )
    snapshot = (
        spark.range(800)
        .selectExpr(
            "concat('snap-', lpad(cast(id as string), 6, '0')) AS conv_id",
            "cast(id % 3 AS int) AS turn_idx",
            "'user' AS role",
            "concat('text-', id) AS text",
            "cast(NULL as string) AS tool",
        )
        .withColumn("ts", F.to_timestamp(F.lit("2020-01-01 00:00:00")))
    )
    snapshot.write.parquet(f"{base}/snap")

    cli = [
        "sync", "--changelog", f"{base}/log", "--target", f"{base}/tgt",
        "--lineage", f"{base}/lineage.json",
        "--bootstrap-snapshot", f"{base}/snap", "--bootstrap-chunks", "5",
    ]

    # run 1: crash after 2 of 5 chunks (mid-bootstrap, before replay)
    real_apply = CDCPipeline.apply_batch
    calls = {"n": 0}

    def crashing(self, batch, batch_id):
        if calls["n"] == 2:
            raise RuntimeError("simulated crash mid-bootstrap")
        calls["n"] += 1
        return real_apply(self, batch, batch_id)

    monkeypatch.setattr(CDCPipeline, "apply_batch", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        main(cli)
    copied = spark.read.parquet(f"{base}/tgt/data").count()
    assert 0 < copied < 800  # partial progress persisted
    monkeypatch.setattr(CDCPipeline, "apply_batch", real_apply)

    # run 2: resumes the copy after the last COMPLETED chunk, then replays
    main(cli)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["total_events"] > 0

    final = spark.read.parquet(f"{base}/tgt/data")
    # snapshot keys are disjoint from log keys: all 800 survive untouched
    snap_rows = final.where(F.col("conv_id").startswith("snap-"))
    assert snap_rows.count() == 800
    # log keys follow the log's LWW outcome exactly
    want = duck(lww_oracle_sql(f"{base}/log/*/*.parquet"))
    got = (
        final.where(~F.col("conv_id").startswith("snap-"))
        .select("conv_id", "turn_idx", "text")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        want[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pyfiles_zip_imports_standalone(tmp_path):
    """The --py-files artifact must be importable on its own (what an
    executor does with a shipped zip): build it, put ONLY the zip on
    sys.path in a subprocess, import the package and touch key modules."""
    import importlib.util
    import subprocess
    import sys

    # bench.py at the repo root shadows the bench/ dir: load by path
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "make_pyfiles", os.path.join(repo, "bench", "make_pyfiles.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    build = mod.build

    out = build(str(tmp_path / "singer_tap_spark.zip"))
    # byte-stable artifact: two builds are identical
    out2 = build(str(tmp_path / "again.zip"))
    assert open(out, "rb").read() == open(out2, "rb").read()

    probe = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import singer_tap_spark; "
        "from singer_tap_spark import pipeline, lake, sync, job, decode; "
        "from singer_tap_spark.ops import dedup_text, similarity; "
        "print('zip-import-ok')"
    )
    r = subprocess.run(
        [sys.executable, "-c", probe, out],
        capture_output=True, text=True,
        env={"PATH": "/usr/bin:/bin"},  # no repo on PYTHONPATH
        cwd=str(tmp_path),              # not the repo dir
    )
    assert r.returncode == 0, r.stderr
    assert "zip-import-ok" in r.stdout


def test_cli_bench_replay_key_subset(spark, tmp_path, capsys):
    """--key-subset i:k must process exactly the conversations whose key
    hash lands in slice i — the four slices partition the corpus."""
    totals = []
    for i in range(2):
        main([
            "bench-replay", "--events", "3000", "--reps", "1",
            "--key-subset", f"{i}:2", "--workdir", str(tmp_path / f"w{i}"),
            "--keep",
        ])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        totals.append(out)
    main([
        "bench-replay", "--events", "3000", "--reps", "1",
        "--workdir", str(tmp_path / "all"), "--keep",
    ])
    full = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert totals[0]["events"] + totals[1]["events"] == full["events"]
    assert totals[0]["final_rows"] + totals[1]["final_rows"] == full["final_rows"]


def test_cli_generic_source_format(spark, tmp_path, capsys):
    """--source-format routes sync --streaming through the pluggable
    readStream.format(...) constructor from the CLI."""
    base = str(tmp_path)
    write_changelog(generate_changelog(spark, 1500, delete_frac=0.1), f"{base}/log")
    main([
        "sync", "--changelog", f"{base}/log", "--target", f"{base}/tgt",
        "--lineage", f"{base}/lineage.json", "--checkpoint", f"{base}/ckpt",
        "--streaming", "--source-format", "parquet",
        "--source-options", "{}",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["total_events"] == 1500
    assert spark.read.parquet(f"{base}/tgt/data").count() > 0


def test_cli_rejects_and_reprocess(spark, tmp_path, capsys):
    """--rejects-path quarantines on sync; --reprocess-rejects drains."""
    base = str(tmp_path)
    import os

    os.makedirs(f"{base}/log")
    good = json.dumps({"shard": "shard-0", "offset": 1, "seq": 1,
                       "op": "UPSERT", "ts": "2026-01-01T00:00:01.000Z",
                       "conv_id": "c1", "turn_idx": 0, "role": "u",
                       "text": "t", "tool": None, "schema_version": 1})
    with open(f"{base}/log/part-0.jsonl", "w") as f:
        f.write(good + "\n{broken\n")

    main([
        "sync", "--changelog", f"{base}/log", "--target", f"{base}/tgt",
        "--lineage", f"{base}/lin.json", "--format", "jsonl",
        "--rejects-path", f"{base}/rejects",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["batches"][0]["n_rejects"] == 1

    main([
        "sync", "--changelog", f"{base}/log", "--target", f"{base}/tgt",
        "--lineage", f"{base}/lin.json", "--format", "jsonl",
        "--rejects-path", f"{base}/rejects", "--reprocess-rejects",
        "--reprocess-allow-cow",
    ])
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["applied_events"] == 0  # still broken
    assert spark.read.parquet(f"{base}/rejects").count() == 1


def test_cli_dedup_stream(spark, tmp_path, capsys):
    """dedup-stream subcommand: drains the doc stream into pairs + index
    (+ clusters), idempotent on rerun, counts surfaced as JSON."""
    base = str(tmp_path)
    d = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .where(F.col("doc_id") < 60)
    )
    d.repartition(2).write.parquet(f"{base}/docs")
    argv = [
        "dedup-stream", "--docs", f"{base}/docs", "--index", f"{base}/idx",
        "--pairs", f"{base}/pairs", "--checkpoint", f"{base}/ckpt",
        "--clusters", f"{base}/cc", "--max-files-per-trigger", "1",
    ]
    main(argv)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["index_docs"] == 60
    assert out["clusters"] == 60
    assert out["pairs_total"] >= 0

    from singer_tap_spark.ops.cluster import near_dup_clusters
    from singer_tap_spark.ops.dedup_text import minhash_lsh_candidates
    from singer_tap_spark.ops.incremental import ClusterIndex

    want = {(r["doc_id"], r["cluster_id"]) for r in near_dup_clusters(
        d.select("doc_id"),
        minhash_lsh_candidates(d, verify_threshold=0.5).select("a", "b"),
    ).collect()}
    cc = ClusterIndex(spark, f"{base}/cc")
    assert {(r["doc_id"], r["cluster_id"])
            for r in cc.read_clusters().collect()} == want

    # rerun: nothing new to process, state unchanged
    main(argv)
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2 == out


def test_cli_dedup_stream_delete_only_feed(spark, tmp_path, capsys):
    """A feed whose only batches are DELETEs (a CDC purge replay) never
    creates the pairs dir or the cluster table — the CLI must exit 0 with
    zero counts AFTER the tombstones commit, not crash on the missing
    paths (a supervisor would retry a run that already succeeded)."""
    base = str(tmp_path)
    spark.createDataFrame(
        [(5, None, "DELETE"), (6, None, "DELETE")],
        "doc_id long, text string, op string",
    ).coalesce(1).write.parquet(f"{base}/docs")
    main([
        "dedup-stream", "--docs", f"{base}/docs", "--index", f"{base}/idx",
        "--pairs", f"{base}/pairs", "--checkpoint", f"{base}/ckpt",
        "--clusters", f"{base}/cc", "--op-col", "op",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"pairs_total": 0, "index_docs": 0, "clusters": 0}
