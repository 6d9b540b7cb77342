"""Medallion models — the reference's declared bronze/silver/gold layers as
DataFrame models (SURVEY.md §2, §7 build plan).

bronze: raw + metadata + deterministic dedup (ingestion.py:63-98 semantics,
single pass). silver: cleaned/validated with quarantine (the transforms
pinned by test_ingestion.py:204-253). gold: claims_summary and per-policy
aggregates (dbt_project.yml:97, README.md:190-192 — declared, never
implemented in the reference).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_hiscox_spark.functions.cleaning import clean_claims, clean_policies
from etl_hiscox_spark.operators.aggregates import money_avg, money_sum
from etl_hiscox_spark.operators.windows import dedup_rank
from etl_hiscox_spark.plans.pipeline import Model, Pipeline
from etl_hiscox_spark.quality.engine import QualityEngine
from etl_hiscox_spark.quality.rules import insurance_rulesets
from etl_hiscox_spark.sources.readers import read_csv, with_ingest_metadata


def bronze_model(entity: str, raw_path: str, key: str, order_col: str = "updated_at") -> Model:
    """Raw CSV → bronze: metadata stamp + deterministic latest-row dedup.
    ONE job (vs. the reference's count/dedup/count/write triple scan,
    SURVEY.md §3.2)."""

    def fn(spark: SparkSession, _: dict[str, DataFrame]) -> DataFrame:
        df = read_csv(spark, raw_path)
        df = with_ingest_metadata(df, source_file=raw_path)
        cols = [order_col] if order_col in df.columns else []
        return dedup_rank(df, keys=[key], order_by=[*cols, key], descending=True)

    return Model(name=f"bronze.{entity}", fn=fn)


def silver_model(entity: str, cleaner) -> Model:
    def fn(spark: SparkSession, outputs: dict[str, DataFrame]) -> DataFrame:
        bronze = outputs[f"bronze.{entity}"]
        cleaned = cleaner(bronze)
        rs = insurance_rulesets().get(entity)
        if rs is None:
            return cleaned
        valid, _bad = QualityEngine().split(cleaned, rs)
        return valid

    return Model(name=f"silver.{entity}", fn=fn, deps=(f"bronze.{entity}",))


def gold_claims_summary() -> Model:
    """The declared-but-never-built gold aggregate: claims by type/status/
    month with count, total, avg settlement (dbt_project.yml:97)."""

    def fn(spark: SparkSession, outputs: dict[str, DataFrame]) -> DataFrame:
        claims = outputs["silver.claims"]
        return (
            claims.withColumn("claim_month", F.date_format("claim_date", "yyyy-MM"))
            .groupBy("claim_type", "claim_status", "claim_month")
            .agg(
                F.count(F.lit(1)).alias("n_claims"),
                money_sum("claim_amount", "total_claim_amount"),
                money_avg("settlement_amount", "avg_settlement_amount"),
            )
        )

    return Model(name="gold.claims_summary", fn=fn, deps=("silver.claims",))


def gold_policy_metrics() -> Model:
    """Per-policy gold metrics: left join keeps claim-free policies (J2)."""

    def fn(spark: SparkSession, outputs: dict[str, DataFrame]) -> DataFrame:
        policies = outputs["silver.policies"]
        claims = outputs["silver.claims"]
        per_policy = claims.groupBy("policy_id").agg(
            F.count(F.lit(1)).alias("n_claims"),
            money_sum("claim_amount", "total_claims"),
        )
        return (
            policies.join(per_policy, "policy_id", "left")
            .withColumn("n_claims", F.coalesce("n_claims", F.lit(0)))
            .withColumn("total_claims", F.coalesce("total_claims", F.lit(0.0)))
            .withColumn(
                "loss_ratio",
                F.when(
                    F.col("premium_amount") > 0,
                    F.col("total_claims") / F.col("premium_amount").cast("double"),
                ),
            )
        )

    return Model(name="gold.policy_metrics", fn=fn, deps=("silver.policies", "silver.claims"))


def quality_model(entity: str, threshold: float = 0.95) -> Model:
    """Orchestrator step-3 parity: profile the silver table against the
    declared ruleset; raise (-> 'warned' status, never an abort) when any
    rule scores below threshold. Returns the scores as a one-row frame."""

    def fn(spark: SparkSession, outputs: dict[str, DataFrame]) -> DataFrame:
        df = outputs[f"silver.{entity}"]
        rs = insurance_rulesets()[entity]
        engine = QualityEngine(default_threshold=threshold)
        report = engine.check(engine.profile(df, rs))
        row = report.to_row()
        out = spark.createDataFrame([tuple(row.values())], list(row.keys()))
        if any(a.severity == "critical" for a in report.alerts):
            raise RuntimeError(
                f"critical quality alerts on {entity}: "
                + ", ".join(f"{a.rule}={a.score:.3f}" for a in report.alerts)
            )
        return out

    return Model(name=f"quality.{entity}", fn=fn, deps=(f"silver.{entity}",))


def build_insurance_pipeline(
    spark: SparkSession, claims_csv: str, policies_csv: str, warehouse: str | None = None
) -> Pipeline:
    """Full medallion DAG for the insurance domain (orchestrator parity:
    ingestion → transform → quality, quality failures warn not abort —
    scripts/orchestrator.py:84-85)."""
    p = Pipeline(spark, quality_steps=("quality.claims", "quality.policies"))
    p.add(bronze_model("claims", claims_csv, key="claim_id"))
    p.add(bronze_model("policies", policies_csv, key="policy_id"))
    p.add(silver_model("claims", clean_claims))
    p.add(silver_model("policies", clean_policies))
    p.add(gold_claims_summary())
    p.add(gold_policy_metrics())
    p.add(quality_model("claims"))
    p.add(quality_model("policies"))
    if warehouse:
        for name, model in list(p.models.items()):
            layer, table = name.split(".", 1)
            model.materialize_path = os.path.join(warehouse, layer, table)
    return p
