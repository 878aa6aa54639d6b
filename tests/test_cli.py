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
