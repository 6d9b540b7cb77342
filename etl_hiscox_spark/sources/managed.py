"""Managed-table facade: real Delta Lake when its runtime is deployed,
:class:`~etl_hiscox_spark.sources.txnlog.TxnTable` otherwise.

The reference writes managed tables with the one-liner
``df.write.format("delta")`` (``scripts/ingestion.py:94-98``) on a session
built with the Delta extensions (``:38-39``). This container has no delta
jar, so the repo ships a tested reimplementation of the semantics it needs
(atomic commits, time travel, schema widening — ``sources/txnlog.py``).
This module is the missing deployment seam: one class with one
write/read/history surface that binds to whichever backend exists, so a
Databricks/OSS-Delta user gets the real ``format("delta")`` path with zero
code changes and the sandbox keeps the tested fallback.

Backend choice is per-table and explicit-overridable; autodetection probes
both the delta-spark Python package and the JVM-side class (either alone is
not enough — pip can be present without the jar on the driver classpath).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def delta_session_conf() -> dict[str, str]:
    """The two session settings a Delta-enabled session needs
    (reference ``scripts/ingestion.py:38-39``). Merge into
    ``get_spark(extra_conf=...)`` BEFORE the session is created — SQL
    extensions cannot be added to a live session."""
    return {
        "spark.sql.extensions": "io.delta.sql.DeltaSparkSessionExtension",
        "spark.sql.catalog.spark_catalog": "org.apache.spark.sql.delta.catalog.DeltaCatalog",
    }


def delta_available(spark: SparkSession) -> bool:
    """True iff BOTH halves of the Delta runtime are loadable: the
    delta-spark Python package and the JVM classes on the driver
    classpath. (pip-installed delta-spark without the jar fails at first
    use with an opaque ClassNotFoundException — probe it up front.)"""
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    try:
        spark._jvm.java.lang.Class.forName("org.apache.spark.sql.delta.DeltaLog")
        return True
    except Exception:
        return False


class ManagedTable:
    """One managed-table surface over Delta or the TxnTable fallback.

    Methods mirror the subset of Delta the pipelines rely on:
    ``write(mode=append|overwrite)`` with schema widening, ``read`` with
    optional ``version`` time travel, ``history()``, ``vacuum()``, and
    ``erase_keys`` (GDPR purge across all retained versions).
    """

    def __init__(self, spark: SparkSession, path: str, backend: str | None = None):
        if backend is None:
            backend = "delta" if delta_available(spark) else "txnlog"
        if backend not in ("delta", "txnlog"):
            raise ValueError(f"backend must be 'delta' or 'txnlog', got {backend!r}")
        if backend == "delta" and not delta_available(spark):
            raise RuntimeError(
                "backend='delta' requested but the Delta runtime is not loadable "
                "(need the delta-spark package AND its jars on the session; "
                "build the session with extra_conf=delta_session_conf() and "
                "spark.jars.packages=io.delta:delta-spark_2.13:<version>)"
            )
        self.spark = spark
        self.path = path
        self.backend = backend
        if backend == "txnlog":
            from etl_hiscox_spark.sources.txnlog import TxnTable

            self._txn = TxnTable(spark, path)

    # -- write ----------------------------------------------------------
    def write(self, df: DataFrame, mode: str = "append") -> None:
        if self.backend == "delta":
            (
                df.write.format("delta")
                .mode(mode)
                .option("mergeSchema", "true")  # ingestion.py:97 parity
                .save(self.path)
            )
        else:
            self._txn.write(df, mode=mode)

    # -- read -----------------------------------------------------------
    def read(self, version: int | None = None) -> DataFrame:
        if self.backend == "delta":
            reader = self.spark.read.format("delta")
            if version is not None:
                reader = reader.option("versionAsOf", version)
            return reader.load(self.path)
        return self._txn.read(version=version)

    # -- maintenance ----------------------------------------------------
    def history(self) -> list[dict]:
        if self.backend == "delta":
            from delta.tables import DeltaTable

            rows = DeltaTable.forPath(self.spark, self.path).history().collect()
            return [r.asDict() for r in rows]
        return self._txn.history()

    def vacuum(self, retention_hours: float | None = None) -> int:
        """``retention_hours=None`` (default) keeps each backend's OWN
        safety default — Delta's 7-day retention, TxnTable's 600 s OCC
        window; an explicit 0.0 previously flowed through as
        min_age_seconds=0 and re-opened the staged-file-deletion hole the
        TxnTable default exists to close (r12 second review). Pass an
        explicit value only when no writer can be in flight."""
        if self.backend == "delta":
            from delta.tables import DeltaTable

            dt = DeltaTable.forPath(self.spark, self.path)
            if retention_hours is None:
                dt.vacuum()
            else:
                dt.vacuum(retention_hours)
            return 0  # Delta's vacuum doesn't report a file count
        if retention_hours is None:
            return self._txn.vacuum()
        return self._txn.vacuum(min_age_seconds=retention_hours * 3600.0)

    def erase_keys(self, key_col: str, keys: list) -> int:
        if not keys:
            return 0
        if self.backend == "delta":
            from delta.tables import DeltaTable
            from pyspark.sql import functions as F

            t = DeltaTable.forPath(self.spark, self.path)
            # one read() — two separate reads carry distinct attribute ids
            # and filtering one with the other's column throws
            # MISSING_ATTRIBUTES; and the predicate goes to delete() as a
            # Column, never an interpolated SQL string (repr() is not SQL
            # quoting — a key like O'Brien would mis-quote).
            current = self.read()
            n = current.filter(current[key_col].isin(keys)).count()
            t.delete(F.col(key_col).isin(keys))
            # NOTE: Delta DELETE removes rows from the CURRENT version only;
            # full history purge additionally needs VACUUM past the old
            # files' retention — the txnlog backend's erase_keys does the
            # all-versions purge natively.
            return n
        return self._txn.erase_keys(key_col, keys)
