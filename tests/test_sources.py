"""Source/sink coverage: JSON, seeds, Excel gating, store_failures,
freshness listing (SURVEY.md §2.1 rows not covered elsewhere)."""

from __future__ import annotations

import json

import pytest

from etl_hiscox_spark.quality.engine import QualityEngine
from etl_hiscox_spark.quality.rules import Range, RuleSet
from etl_hiscox_spark.sources.readers import latest_object, read_excel, read_json
from etl_hiscox_spark.sources.writers import seed_load


def test_read_json_lines(spark, tmp_path):
    p = tmp_path / "claims.jsonl"
    rows = [
        {"claim_id": "CLM001", "amount": 1500.5, "claim_type": "AUTO"},
        {"claim_id": "CLM002", "amount": 800.0, "claim_type": "HOME"},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    df = read_json(spark, str(p))
    assert df.count() == 2
    assert {r["claim_id"] for r in df.collect()} == {"CLM001", "CLM002"}


def test_seed_load_roundtrip(spark, tmp_path):
    csv = tmp_path / "seed.csv"
    csv.write_text("code,label\nA,alpha\nB,beta\n")
    target = str(tmp_path / "seed_table")
    df = seed_load(spark, str(csv), target)
    assert df.count() == 2
    back = spark.read.parquet(target)
    assert {(r["code"], r["label"]) for r in back.collect()} == {("A", "alpha"), ("B", "beta")}


def test_read_excel_gated_without_openpyxl(spark, tmp_path):
    # Environment has no openpyxl: the reader must raise a clear ImportError,
    # not crash obscurely (S5 is declared-tier; driver-side pandas path).
    fake = tmp_path / "wb.xlsx"
    fake.write_bytes(b"not really an excel file")
    try:
        import openpyxl  # noqa: F401

        has_openpyxl = True
    except ImportError:
        has_openpyxl = False
    if has_openpyxl:
        pytest.skip("openpyxl present; gating not exercised")
    with pytest.raises((ImportError, ValueError)):
        read_excel(spark, str(fake))


def test_store_failures_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, 5.0), (2, 500.0), (3, -1.0)], "id int, v double")
    rs = RuleSet("t", (Range("v", lo=0.0, hi=100.0),))
    path = str(tmp_path / "failures")
    QualityEngine().store_failures(df, rs, path)
    bad = spark.read.parquet(path)
    assert {r["id"] for r in bad.collect()} == {2, 3}
    assert all("range_v" in r["failed_rules"] for r in bad.collect())


def test_latest_object(spark, tmp_path):
    import os
    import time

    (tmp_path / "old.csv").write_text("a")
    time.sleep(0.05)
    (tmp_path / "new.csv").write_text("b")
    # ensure ordering even on coarse mtime filesystems
    now = time.time()
    os.utime(tmp_path / "old.csv", (now - 100, now - 100))
    os.utime(tmp_path / "new.csv", (now, now))
    blob = latest_object(spark, str(tmp_path), suffix=".csv")
    assert blob is not None and blob.path.endswith("new.csv")


def test_avro_gated_without_module(spark, tmp_path):
    # spark-avro is an external module not deployed here: both directions
    # must fail with actionable guidance (same policy as the Excel gate).
    from etl_hiscox_spark.sources.readers import read_avro, write_avro

    with pytest.raises(RuntimeError, match="spark-avro"):
        read_avro(spark, str(tmp_path / "in.avro"))
    with pytest.raises(RuntimeError, match="spark-avro"):
        write_avro(spark.range(3), str(tmp_path / "out.avro"))
