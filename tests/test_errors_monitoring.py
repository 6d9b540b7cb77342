"""Error-action semantics (Q4: skip/retry), config parity, health checks."""

from __future__ import annotations

import time

import pytest

from etl_hiscox_spark.config import EngineConfig
from etl_hiscox_spark.monitoring import HealthChecker, freshness_tier_of
from etl_hiscox_spark.plans.errors import retry_with_backoff, skip_and_continue
from etl_hiscox_spark.plans.models import bronze_model
from etl_hiscox_spark.plans.pipeline import Model, Pipeline


def test_retry_with_backoff_eventually_succeeds():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("transient")
        return "ok"

    assert retry_with_backoff(flaky, max_retries=3, delay_seconds=0.01) == "ok"
    assert calls["n"] == 3


def test_retry_with_backoff_exhausts():
    def always_fails():
        raise ConnectionError("down")

    with pytest.raises(ConnectionError):
        retry_with_backoff(always_fails, max_retries=2, delay_seconds=0.01)


def test_skip_and_continue_only_for_missing_sources():
    def missing():
        raise FileNotFoundError("[PATH_NOT_FOUND] /no/such/file")

    out, skipped = skip_and_continue(missing)
    assert out is None and skipped

    def real_bug():
        raise ValueError("actual logic error")

    with pytest.raises(ValueError):
        skip_and_continue(real_bug)


def test_pipeline_skips_missing_entity_and_downstream(spark, raw_csv_dir):
    # missing claims file: bronze.claims skips, downstream silver skips,
    # but the policies branch still completes (per-entity loop semantics,
    # ingestion.py:156-168 + skip_and_continue).
    p = Pipeline(spark)
    missing = bronze_model("claims", "/no/such/dir/claims.csv", key="claim_id")
    missing.on_missing_source = "skip"
    p.add(missing)
    p.add(bronze_model("policies", raw_csv_dir["policies"], key="policy_id"))
    p.add(
        Model(
            name="silver.claims",
            fn=lambda s, o: o["bronze.claims"],
            deps=("bronze.claims",),
        )
    )
    report = p.run()
    by_name = {s.name: s.status for s in report.steps}
    assert by_name["bronze.claims"] == "skipped"
    assert by_name["silver.claims"] == "skipped"
    assert by_name["bronze.policies"] == "success"
    assert report.success  # skips are not failures


def test_engine_config_env_parsing(monkeypatch):
    monkeypatch.setenv("ETL_MAX_NULL_PCT", "7.5")
    monkeypatch.setenv("ETL_MAX_RETRIES", "5")
    cfg = EngineConfig()
    assert cfg.max_null_percentage == 7.5
    assert cfg.max_retries == 5
    assert cfg.get_table_name("bronze", "claims") == "etl_bronze.claims"
    assert cfg.validate() == []
    bad = EngineConfig()
    bad.batch_size = -1
    assert "batch_size must be positive" in bad.validate()


def test_freshness_tiers_boundaries():
    assert freshness_tier_of(0.1) == "fresh"
    assert freshness_tier_of(13.0) == "aging"
    assert freshness_tier_of(36.0) == "stale"


def test_pipeline_alert_thresholds():
    from etl_hiscox_spark.monitoring import AlertThresholds, check_pipeline_alerts
    from etl_hiscox_spark.observability import PipelineMetrics

    slow = PipelineMetrics(step="ingest", records_processed=100, records_valid=98,
                           records_invalid=2, started_at=0.0)
    slow.finished_at = 3700.0  # 61.7 min
    dirty = PipelineMetrics(step="clean", records_processed=100, records_valid=90,
                            records_invalid=10, started_at=0.0)
    dirty.finished_at = 10.0
    alerts = check_pipeline_alerts([slow, dirty], AlertThresholds())
    names = {a.name for a in alerts}
    assert "pipeline_duration" in names       # > 60 min ceiling
    assert "error_rate:clean" in names        # 10% > 5%
    assert "error_rate:ingest" not in names   # 2% ok


def test_incremental_gold_via_stream(spark, tmp_path):
    # X7 + gold: new bronze files arrive -> streaming availableNow pass
    # upserts the gold per-key aggregate idempotently (the incremental
    # materialized-view pattern over the batch-id append of the reference).
    import pyspark.sql.functions as SF

    from etl_hiscox_spark.streaming.ops import (
        foreach_batch_upsert,
        stream_from_parquet,
    )
    from pyspark.sql import types as T

    bronze = str(tmp_path / "bronze")
    gold = str(tmp_path / "gold")
    schema = T.StructType(
        [
            T.StructField("claim_type", T.StringType()),
            T.StructField("amount", T.DoubleType()),
        ]
    )
    spark.createDataFrame([("AUTO", 100.0), ("HOME", 50.0)], schema).write.mode(
        "append"
    ).parquet(bronze)

    def run_refresh(checkpoint_suffix: str):
        agg = (
            stream_from_parquet(spark, bronze, schema)
            .groupBy("claim_type")
            .agg(SF.sum("amount").alias("total"), SF.count(SF.lit(1)).alias("n"))
        )
        q = (
            agg.writeStream.outputMode("complete")
            .foreachBatch(foreach_batch_upsert(gold, ["claim_type"], spark))
            .option("checkpointLocation", str(tmp_path / f"ckpt{checkpoint_suffix}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_refresh("1")
    got = {r["claim_type"]: (r["total"], r["n"]) for r in spark.read.parquet(gold).collect()}
    assert got == {"AUTO": (100.0, 1), "HOME": (50.0, 1)}
    # second batch of bronze data arrives
    spark.createDataFrame([("AUTO", 25.0)], schema).write.mode("append").parquet(bronze)
    run_refresh("2")
    got = {r["claim_type"]: (r["total"], r["n"]) for r in spark.read.parquet(gold).collect()}
    assert got == {"AUTO": (125.0, 2), "HOME": (50.0, 1)}


def test_health_checker(spark, tmp_path):
    good = str(tmp_path / "good")
    spark.range(500).write.parquet(good)
    small = str(tmp_path / "small")
    spark.range(5).write.parquet(small)
    (tmp_path / "src").mkdir()
    (tmp_path / "src" / "latest.csv").write_text("x")

    hc = HealthChecker(spark)
    report = hc.run(
        tables={"good": good, "small": small, "missing": str(tmp_path / "nope")},
        sources={"raw": str(tmp_path / "src")},
    )
    by = {c.name: c.status for c in report.checks}
    assert by["table:good"] == "pass"
    assert by["table:small"] == "warn"  # below min_row_count 100
    assert by["table:missing"] == "fail"
    assert by["source:raw"] == "pass"  # just written => fresh
    assert report.status == "unhealthy"  # any fail dominates
    # degraded when only warns
    report2 = hc.run(tables={"good": good, "small": small})
    assert report2.status == "degraded"
