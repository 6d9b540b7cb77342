"""The pinned testdata DDL schemas must equal Spark's own inference —
drift here would silently change column types under every declared query
(r18: pinning exists to skip the ~0.1-0.2 s per-call footer inference,
never to alter what a scan returns)."""

from __future__ import annotations

import os

import pytest

from etl_hiscox_spark.registry import (
    TESTDATA_TABLES,
    _pinned_schema,
    load_table,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", TESTDATA_TABLES)
def test_pinned_schema_matches_inference(spark, name):
    path = os.path.join(SF, f"{name}.parquet")
    inferred = spark.read.parquet(path).schema
    ddl = _pinned_schema(name, path)
    assert ddl is not None, f"{name} must have a pinned schema for local testdata"
    from pyspark.sql.types import StructType

    pinned = spark.createDataFrame([], ddl).schema
    assert isinstance(pinned, StructType)
    assert pinned == inferred, f"{name}: pinned {pinned} != inferred {inferred}"


def test_load_table_values_unchanged_by_pinning(spark):
    # the pinned-schema read and a bare inference read return identical
    # rows for the conversion-sensitive table (events carries the ts guard)
    pinned = load_table(spark, "events", SF)
    bare = spark.read.parquet(os.path.join(SF, "events.parquet"))
    assert pinned.schema == bare.schema
    assert pinned.exceptAll(bare).count() == 0
    assert bare.exceptAll(pinned).count() == 0


def test_events_nanos_footer_falls_back_to_inference(tmp_path):
    # a NANOS-stamped events file must take the inference path so the
    # nanosAsLong -> timestamp_micros conversion still applies
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            "event_id": pa.array([1], pa.int64()),
            "ts": pa.array([1], pa.timestamp("ns")),
            "user_id": pa.array([1], pa.int64()),
            "event_type": pa.array(["a"]),
            "value": pa.array([1.0]),
            "props": pa.array(["{}"]),
        }
    )
    dest = tmp_path / "events.parquet"
    pq.write_table(t, dest, coerce_timestamps=None)
    assert _pinned_schema("events", str(dest)) is None
    # the µs driver file keeps the pinned fast path
    assert _pinned_schema("events", os.path.join(SF, "events.parquet")) is not None
