"""Minimal transaction-log table format (SURVEY.md §2.1 S3 upgrade).

The reference writes Delta (``scripts/ingestion.py:94-98``: append +
mergeSchema); delta-spark is not deployable in this container, and the
plain-parquet emulation in :mod:`writers` loses the two properties Delta
actually provides — an atomic commit point and readable history. This
module restores both with the same public design Delta/Iceberg use
(an ordered log of versioned manifests; see the Delta Lake VLDB'20 paper):

- ``_txn_log/v{N}.json`` lists the ACTIVE data files + schema for
  version N. Readers resolve the latest version and read exactly those
  files — a half-written data file is invisible until its manifest commits.
- Commits are atomic via ``os.rename`` of a tmp manifest (POSIX rename
  atomicity; object stores use put-if-absent — same protocol point).
- ``mode="append"`` adds files (schema widened by union, missing columns
  read as NULL); ``mode="overwrite"`` starts a fresh file set. Old files
  are never mutated, so every prior version stays readable: time travel.
- Single-writer protocol (the reference's orchestrator is a single daily
  writer too). Multi-writer needs optimistic concurrency on the manifest
  name — the hook is the ``FileExistsError`` raised on version collision.

This is deliberately a few hundred lines, not a table format competitor:
it documents exactly which Delta semantics the pipeline relies on, and it
swaps out for real Delta/Iceberg by replacing TxnTable with
``spark.read.format("delta")`` at deployment.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_LOG_DIR = "_txn_log"


class TxnTable:
    """A parquet table with a versioned-manifest transaction log."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.log_dir = os.path.join(path, _LOG_DIR)

    # -- log plumbing --------------------------------------------------------

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        out = []
        for name in os.listdir(self.log_dir):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    out.append(int(name[1:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self._versions()
        return vs[-1] if vs else None

    def _read_manifest(self, version: int) -> dict:
        with open(os.path.join(self.log_dir, f"v{version}.json")) as f:
            return json.load(f)

    def _commit(self, version: int, manifest: dict) -> None:
        """Atomic commit: write the manifest to a tmp name, then
        ``os.link`` it to the versioned name.

        ``link`` is the POSIX create-if-absent that carries full content:
        it fails with FileExistsError if version N is already committed
        (two-writer race becomes loud, like Delta's optimistic concurrency)
        and readers can never observe a partially-written manifest
        (``rename`` over an existing name would silently replace; a probe
        file would expose an empty manifest for a moment).
        """
        os.makedirs(self.log_dir, exist_ok=True)
        final = os.path.join(self.log_dir, f"v{version}.json")
        tmp = final + f".{uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        try:
            os.link(tmp, final)  # FileExistsError on writer race
        finally:
            os.unlink(tmp)

    # -- write path ----------------------------------------------------------

    def _write_batch(self, df: DataFrame, prefix: str) -> list[str]:
        """Write ``df`` into a fresh uuid batch dir under ``data/`` and
        return the table-relative parquet file paths — the one place the
        physical file layout is defined (write and erase both use it)."""
        batch_dir = f"{prefix}-{uuid.uuid4().hex}"
        out_dir = os.path.join(self.path, "data", batch_dir)
        df.write.mode("error").parquet(out_dir)
        return sorted(
            os.path.join("data", batch_dir, f)
            for f in os.listdir(out_dir)
            if f.endswith(".parquet")
        )

    def write(
        self,
        df: DataFrame,
        mode: str = "append",
        txn: dict | None = None,
        operation: str | None = None,
    ) -> int:
        """Write ``df`` as a new committed version; returns the version.

        Data files land under ``data/`` with unique names BEFORE the
        manifest commits — a crash mid-write leaves orphan files (cleaned
        by vacuum), never a torn table. ``txn`` ({app_id: txn_version})
        rides the manifest for the idempotent-writer protocol
        (:meth:`write_txn`). ``operation`` labels the commit in history
        (e.g. ``OPTIMIZE`` from :meth:`compact`).
        """
        if mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append|overwrite, got {mode!r}")
        new_files = self._write_batch(df, "batch")
        prev = self.latest_version()
        if mode == "append" and prev is not None:
            old = self._read_manifest(prev)
            files = old["files"] + new_files
        else:
            files = new_files
        version = 0 if prev is None else prev + 1
        manifest = {
            "version": version,
            "mode": mode,
            "files": files,
            "schema": df.schema.json(),
            "committed_at": time.time(),
            "n_added": len(new_files),
        }
        if operation:
            manifest["operation"] = operation
        if txn:
            manifest["txn"] = {str(k): int(v) for k, v in txn.items()}
        self._commit(version, manifest)
        return version

    def compact(self, target_file_mb: int = 256) -> int | None:
        """Manifest-aware small-file compaction — Delta's ``OPTIMIZE``
        split, not an in-place rewrite: the LATEST version's row set is
        rewritten into ``ceil(bytes / target)`` files and committed as a
        NEW version (``operation: OPTIMIZE``) whose rows are identical by
        construction. No existing manifest is touched and no existing
        file is deleted, so EVERY prior time-travel version keeps reading
        byte-identical data — compaction is a commit, never a mutation
        (the x14 oracle + tests pin per-version equality across it).

        A streaming ``foreach_batch_txn_append`` sink adds one file set
        per micro-batch; readers of the head pay an open/LIST tax per
        file. After compact, HEAD reads open the compacted files only;
        the historical small files cost storage, not read performance,
        and are reclaimed by the retention pair :meth:`expire_versions`
        + :meth:`vacuum` — the same OPTIMIZE/VACUUM contract Delta
        documents. Returns the new version, or None when the head is
        already at or under the target file count (an empty OPTIMIZE
        commit would push every reader's manifest resolution forward for
        nothing).

        Idempotent under the writer protocol: a second compact on an
        already-compacted head sees n_files <= target and no-ops.

        The OPTIMIZE commit CARRIES FORWARD the newest txn watermark of
        every app_id (Delta retains SetTransaction actions across log
        cleanup for the same reason): :meth:`last_txn_version` scans
        manifests newest-first, so after the advertised retention
        sequence (compact → expire_versions → vacuum) the watermarks
        would otherwise vanish with the expired manifests and an
        at-least-once producer's replayed batch would land TWICE.
        """
        v = self.latest_version()
        if v is None:
            return None
        m = self._read_manifest(v)
        files = m["files"]
        total = sum(os.path.getsize(os.path.join(self.path, f)) for f in files)
        n_out = max(1, -(-total // (target_file_mb * 1024 * 1024)))
        if len(files) <= n_out:
            return None
        # newest watermark per app_id across ALL manifests (oldest-first
        # iteration, so later versions overwrite earlier ones)
        watermarks: dict[str, int] = {}
        for pv in self._versions():
            for app, tv in (self._read_manifest(pv).get("txn") or {}).items():
                watermarks[str(app)] = max(int(tv), watermarks.get(str(app), int(tv)))
        head = self.read(v)
        return self.write(
            head.repartition(int(n_out)),
            mode="overwrite",
            operation="OPTIMIZE",
            txn=watermarks or None,
        )

    def expire_versions(self, keep_last: int) -> int:
        """Retention: drop the manifests of all but the newest
        ``keep_last`` versions, so :meth:`vacuum` can reclaim the data
        files only they referenced (post-compaction history storage —
        Delta's log-retention half of OPTIMIZE/VACUUM). Time travel to
        expired versions becomes a LOUD FileNotFoundError (the manifest
        is gone), never a partial read. Returns the number of versions
        expired."""
        if keep_last < 1:
            raise ValueError(f"keep_last must be >= 1, got {keep_last}")
        victims = self._versions()[:-keep_last]
        for v in victims:
            os.remove(os.path.join(self.log_dir, f"v{v}.json"))
        return len(victims)

    def last_txn_version(self, app_id: str) -> int | None:
        """Highest writer-transaction id committed for ``app_id`` (scanning
        manifests newest-first), or None — Delta's txnAppId/txnVersion
        lookup."""
        for v in reversed(self._versions()):
            txn = self._read_manifest(v).get("txn") or {}
            if app_id in txn:
                return int(txn[app_id])
        return None

    def write_txn(self, df: DataFrame, app_id: str, txn_version: int, mode: str = "append") -> bool:
        """Idempotent write keyed by (``app_id``, ``txn_version``) — the
        Delta txnAppId/txnVersion protocol. Returns False without writing
        when ``txn_version`` (or a later one) is already committed for
        ``app_id``, so an at-least-once producer that replays a batch
        after a crash lands it exactly once. The check and the commit are
        same-writer serialized (single-writer protocol, as :mod:`txnlog`
        documents); multi-writer needs the manifest-collision hook."""
        last = self.last_txn_version(app_id)
        if last is not None and txn_version <= last:
            return False
        self.write(df, mode=mode, txn={app_id: txn_version})
        return True

    # -- read path -----------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot read of ``version`` (default: latest) — time travel.

        Schema evolution: every file group is read with its own footer
        schema and unioned by name with NULL fill, then projected to the
        manifest's (latest-write) column order.
        """
        v = self.latest_version() if version is None else version
        if v is None or v not in self._versions():
            raise FileNotFoundError(f"no committed version {version!r} at {self.path}")
        m = self._read_manifest(v)
        paths = [os.path.join(self.path, f) for f in m["files"]]
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        out: DataFrame | None = None
        for p in paths:
            part = self.spark.read.parquet(p)
            out = part if out is None else out.unionByName(part, allowMissingColumns=True)
        if out is None:
            return self.spark.createDataFrame([], schema)
        for field in schema.fieldNames():
            if field not in out.columns:
                import pyspark.sql.functions as F

                out = out.withColumn(field, F.lit(None).cast(schema[field].dataType))
        return out.select(*schema.fieldNames())

    def history(self) -> list[dict]:
        """Commit log, oldest first (Delta DESCRIBE HISTORY shape)."""
        return [self._read_manifest(v) for v in self._versions()]

    def vacuum(self) -> int:
        """Delete data files no longer referenced by ANY version's manifest.
        Returns the number removed. This reclaims both crash orphans
        (files written before a manifest commit that never landed) and —
        after :meth:`expire_versions` drops old manifests — the files only
        those expired versions referenced: the second half of the
        OPTIMIZE/VACUUM retention contract :meth:`compact` documents
        (compact → expire_versions → vacuum)."""
        live: set[str] = set()
        for v in self._versions():
            live.update(self._read_manifest(v)["files"])
        removed = 0
        data_root = os.path.join(self.path, "data")
        if not os.path.isdir(data_root):
            return 0
        for batch in os.listdir(data_root):
            bdir = os.path.join(data_root, batch)
            for f in os.listdir(bdir):
                rel = os.path.join("data", batch, f)
                if f.endswith(".parquet") and rel not in live:
                    os.remove(os.path.join(bdir, f))
                    removed += 1
            if not os.listdir(bdir):
                os.rmdir(bdir)
        return removed

    def erase_keys(self, key_col: str, keys: list) -> int:
        """Right-to-be-forgotten across ALL versions: rewrite every data
        file containing the subject's rows and repoint every manifest that
        references it, so the erased keys are unreadable at every
        time-travel version — not just the latest (erasing only the head
        while history stays readable is a compliance hole, Delta's
        REORG/VACUUM problem). Returns the number of files rewritten.

        Version numbering and all other rows are preserved. Work is
        proportional to the files that actually CONTAIN the subject
        (found with one input_file_name scan — the same file pruning a
        Delta deletion vector build does); each hit file is rewritten
        filtered, manifests update via atomic tmp+replace, and the old
        files are deleted last — a crash mid-way leaves both old and new
        files present and every manifest readable.
        """
        from urllib.parse import unquote, urlparse

        import pyspark.sql.functions as F

        versions = self._versions()
        all_files = sorted({f for v in versions for f in self._read_manifest(v)["files"]})
        if not all_files or not keys:
            return 0
        paths = [os.path.join(self.path, f) for f in all_files]
        # mergeSchema: the table supports schema widening, so key_col may be
        # absent from older files — the merged schema carries it as NULL
        # there (a file without the column can never be a hit). Without the
        # merge, Spark samples ONE footer and the scan either throws or
        # silently misses subject rows. input_file_name() is a URL-encoded
        # URI — decode before computing the table-relative path.
        hit_paths = {
            os.path.relpath(unquote(urlparse(r[0]).path), self.path)
            for r in self.spark.read.option("mergeSchema", "true")
            .parquet(*paths)
            .filter(F.col(key_col).isin(keys))
            .select(F.input_file_name())
            .distinct()
            .collect()
        }
        if not hit_paths:
            return 0
        replacement: dict[str, list[str]] = {}
        for rel in sorted(hit_paths):
            # NULL-safe keep: ~isin(...) is NULL (dropped) for NULL keys —
            # the subject filter must never erase anonymous rows (same rule
            # as writers.erase_keys' left_anti join).
            kept = self.spark.read.parquet(os.path.join(self.path, rel)).filter(
                F.col(key_col).isNull() | ~F.col(key_col).isin(keys)
            )
            replacement[rel] = self._write_batch(kept, "erase")
        for v in versions:
            m = self._read_manifest(v)
            if not any(f in replacement for f in m["files"]):
                continue
            m["files"] = [nf for f in m["files"] for nf in replacement.get(f, [f])]
            m["erased_at"] = time.time()
            tmp = os.path.join(self.log_dir, f".v{v}.erase.tmp")
            with open(tmp, "w") as fh:
                json.dump(m, fh)
            os.replace(tmp, os.path.join(self.log_dir, f"v{v}.json"))
        for rel in replacement:
            try:
                os.remove(os.path.join(self.path, rel))
            except FileNotFoundError:
                pass
        return len(replacement)
