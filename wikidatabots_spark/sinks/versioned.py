"""Versioned parquet table: snapshot log, time travel, rollback, vacuum.

``sinks.upsert`` gives one atomic CURRENT table; training-data
pipelines additionally need *history*: "which exact corpus did run X
train on?" (reproducibility), "read yesterday's table while today's
writes" (reader isolation), "that batch was poisoned — roll back"
(recovery). Delta/Iceberg answer this with a snapshot log over
immutable files; this module implements the same contract over plain
parquet with POSIX/HDFS rename atomicity — no table-format dependency.

Layout::

    table_dir/
      _versions/
        v00000001/   immutable parquet snapshot
        v00000002/
      _log.json      manifest: [{version, n_rows, parent, tag}]

Invariants:

- **Snapshots are immutable.** A committed ``v########`` directory is
  never modified — readers of any version are isolated from writers
  forever (no read lock, no refresh anomaly).
- **The log is the source of truth**, published by atomic rename:
  a crash mid-commit leaves a dangling staged dir (harmless garbage,
  removed by the next vacuum) but never a log entry pointing at a
  partial snapshot — the log is renamed into place only AFTER the
  snapshot dir rename completes.
- **Versions are dense integers** assigned at commit; ``parent``
  records lineage (a rollback's parent is the version it restored,
  so provenance survives).
- **Vacuum never breaks the log**: it deletes snapshot dirs older than
  the retention window and marks them ``pruned`` in the log — history
  METADATA (who committed what, row counts) outlives the data.

Scale: commit cost is one parquet write of the new table (the same
cost upsert already pays — snapshots add only the not-deleting of the
old dir); time travel and latest-read are O(1) manifest lookups; no
driver-side data movement anywhere. At 100 TB production would add
file-level manifests to share unchanged files between snapshots
(Iceberg's trick) — the API here is deliberately that shape (commit /
read(version) / rollback / vacuum), so the storage layer can be
swapped without touching callers.

No reference counterpart (the reference's only sink is stdout RDF;
north-star extension).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from wikidatabots_spark.sinks.upsert import merge_upsert

_LOG = "_log.json"
_VERSIONS = "_versions"


@dataclass(frozen=True)
class SnapshotInfo:
    version: int
    n_rows: int
    parent: int | None
    tag: str | None
    pruned: bool = False


class VersionedTable:
    """A keyed parquet table with an append-only snapshot log."""

    def __init__(self, table_dir: str):
        self.dir = os.path.abspath(table_dir)

    # -- manifest ----------------------------------------------------------

    def _log_path(self) -> str:
        return os.path.join(self.dir, _LOG)

    def history(self) -> list[SnapshotInfo]:
        """All snapshots, oldest first (including pruned metadata)."""
        if not os.path.exists(self._log_path()):
            return []
        with open(self._log_path()) as f:
            return [SnapshotInfo(**e) for e in json.load(f)]

    def latest_version(self) -> int | None:
        hist = [s for s in self.history() if not s.pruned]
        return hist[-1].version if hist else None

    def _snapshot_dir(self, version: int) -> str:
        return os.path.join(self.dir, _VERSIONS, f"v{version:08d}")

    def _publish_log(self, entries: list[SnapshotInfo]) -> None:
        os.makedirs(self.dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(prefix="_log_", dir=self.dir)
        with os.fdopen(fd, "w") as f:
            json.dump([e.__dict__ for e in entries], f, indent=1)
        os.rename(tmp, self._log_path())  # atomic publish

    # -- write path --------------------------------------------------------

    def commit(
        self,
        df: DataFrame,
        tag: str | None = None,
        parent: int | None = None,
    ) -> int:
        """Write ``df`` as the next immutable snapshot; returns its
        version. The snapshot dir is staged then renamed; the log entry
        is published (atomic rename) only after the data rename, so a
        crash at any point leaves the previous version intact and
        current."""
        hist = self.history()
        version = (hist[-1].version + 1) if hist else 1
        if parent is None:
            parent = self.latest_version()
        os.makedirs(os.path.join(self.dir, _VERSIONS), exist_ok=True)
        staged = tempfile.mkdtemp(
            prefix="_staged_", dir=os.path.join(self.dir, _VERSIONS)
        )
        data_dir = os.path.join(staged, "data")
        df.write.mode("overwrite").parquet(data_dir)
        # row count from what was actually written, not the input plan
        n_rows = df.sparkSession.read.parquet(data_dir).count()
        final = self._snapshot_dir(version)
        os.rename(data_dir, final)
        shutil.rmtree(staged, ignore_errors=True)
        self._publish_log(
            hist + [SnapshotInfo(version, n_rows, parent, tag)]
        )
        return version

    def upsert(
        self,
        spark: SparkSession,
        changes: DataFrame,
        key: str,
        version_col: str,
        tag: str | None = None,
    ) -> int:
        """Latest-wins keyed merge (sinks.upsert semantics: tombstones,
        deterministic ties) of ``changes`` into the latest snapshot,
        committed as a NEW version — history keeps the pre-merge table."""
        latest = self.latest_version()
        if latest is None:
            from wikidatabots_spark.sinks.upsert import DELETED_COL

            base = changes.limit(0)
            if DELETED_COL in changes.columns:
                base = base.drop(DELETED_COL)
            merged = merge_upsert(base, changes, key, version_col)
        else:
            merged = merge_upsert(
                self.read(spark), changes, key, version_col
            )
        return self.commit(merged, tag=tag)

    def rollback(self, spark: SparkSession, to_version: int) -> int:
        """Restore ``to_version``'s contents as a NEW head version (the
        bad intermediate versions stay in history for the post-mortem).
        """
        return self.commit(
            self.read(spark, version=to_version),
            tag=f"rollback_to_v{to_version}",
            parent=to_version,
        )

    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Delete snapshot DATA older than the newest ``keep_last``
        versions; log metadata survives with ``pruned=True``. Returns
        the pruned versions. Also sweeps dangling staged dirs from
        crashed commits."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        hist = self.history()
        live = [s for s in hist if not s.pruned]
        to_prune = live[:-keep_last] if len(live) > keep_last else []
        pruned_versions = []
        new_hist = []
        prune_set = {s.version for s in to_prune}
        for s in hist:
            if s.version in prune_set:
                shutil.rmtree(self._snapshot_dir(s.version), ignore_errors=True)
                new_hist.append(
                    SnapshotInfo(s.version, s.n_rows, s.parent, s.tag, True)
                )
                pruned_versions.append(s.version)
            else:
                new_hist.append(s)
        vdir = os.path.join(self.dir, _VERSIONS)
        if os.path.isdir(vdir):
            for d in os.listdir(vdir):
                if d.startswith("_staged_"):
                    shutil.rmtree(os.path.join(vdir, d), ignore_errors=True)
        if pruned_versions:
            self._publish_log(new_hist)
        return pruned_versions

    # -- read path ---------------------------------------------------------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Latest snapshot, or time-travel to ``version``."""
        if version is None:
            version = self.latest_version()
            if version is None:
                raise FileNotFoundError(f"no snapshots in {self.dir}")
        info = {s.version: s for s in self.history()}.get(version)
        if info is None:
            raise KeyError(f"version {version} never existed in {self.dir}")
        if info.pruned:
            raise KeyError(
                f"version {version} was vacuumed (metadata retained); "
                f"n_rows at prune time: {info.n_rows}"
            )
        return spark.read.parquet(self._snapshot_dir(version))

    def diff(
        self,
        spark: SparkSession,
        from_version: int,
        to_version: int,
        key: str,
    ) -> DataFrame:
        """Change data feed between two snapshots: one row per changed
        key with ``_change`` in ('insert', 'delete', 'update'), value
        columns taken from the NEW side for insert/update and the OLD
        side for delete — the Delta/Iceberg CDF contract derived from
        plain immutable snapshots. ``diff(v, v)`` is empty; applying
        the feed to ``from_version`` reproduces ``to_version`` exactly
        (tested), which is what makes the feed a valid downstream
        replication stream.

        Scale: ONE full-outer equi-join on the key; change detection is
        a null-safe struct comparison of the value columns (the structs
        already travel through the join for value projection, so the
        comparison adds no bytes and — unlike the r5 string-hash form —
        no collision risk for values containing separator bytes; ADVICE
        r5). Presence is the struct's own nullability: an unmatched
        full-outer side is a NULL struct, while a present row is
        non-null even when every field is null. Snapshots written
        bucketed by the key would make the join exchange-free; with
        plain snapshots it is two exchanges total.
        """
        from pyspark.sql import functions as F
        from pyspark.sql.types import ArrayType, MapType, StructType

        old = self.read(spark, from_version)
        new = self.read(spark, to_version)
        val_cols = [c for c in new.columns if c != key]
        if old.columns != new.columns:
            raise ValueError(
                f"schema changed between v{from_version} and v{to_version}: "
                f"{old.columns} vs {new.columns}"
            )

        def _contains_map(dt) -> bool:
            if isinstance(dt, MapType):
                return True
            if isinstance(dt, ArrayType):
                return _contains_map(dt.elementType)
            if isinstance(dt, StructType):
                return any(_contains_map(f.dataType) for f in dt.fields)
            return False

        # eqNullSafe cannot evaluate over MapType (maps are unordered,
        # Spark refuses equality at analysis time — ADVICE r6 low). A
        # TOP-LEVEL map column is canonicalized for the COMPARISON only:
        # sorted entry array, deterministic and equatable; the value
        # projection below still emits the raw map. Maps nested deeper
        # than one level get a clear error instead of an opaque
        # analysis failure.
        dtypes = {f.name: f.dataType for f in new.schema.fields}

        def _cmp_col(c: str):
            dt = dtypes[c]
            if isinstance(dt, MapType):
                if _contains_map(dt.keyType) or _contains_map(dt.valueType):
                    raise ValueError(
                        f"VersionedTable.diff cannot compare column {c!r}: "
                        f"map nested inside a map ({dt.simpleString()}); "
                        "flatten or drop it before diffing"
                    )
                return F.array_sort(F.map_entries(F.col(c)))
            if _contains_map(dt):
                raise ValueError(
                    f"VersionedTable.diff cannot compare column {c!r}: "
                    f"map nested inside {dt.simpleString()} is not "
                    "equatable; flatten or drop it before diffing"
                )
            return F.col(c)

        def sided(df: DataFrame, tag: str) -> DataFrame:
            return df.select(
                F.col(key),
                F.struct(*[F.col(c) for c in val_cols]).alias(f"__row_{tag}"),
                F.struct(*[_cmp_col(c).alias(c) for c in val_cols]).alias(
                    f"__cmp_{tag}"
                ),
            )

        j = sided(old, "old").join(sided(new, "new"), key, "full_outer")
        change = (
            F.when(F.col("__row_old").isNull(), F.lit("insert"))
            .when(F.col("__row_new").isNull(), F.lit("delete"))
            .when(
                ~F.col("__cmp_old").eqNullSafe(F.col("__cmp_new")),
                F.lit("update"),
            )
        )
        picked = F.when(
            F.col("__row_new").isNotNull(), F.col("__row_new")
        ).otherwise(F.col("__row_old"))
        return (
            j.withColumn("_change", change)
            .where(F.col("_change").isNotNull())
            .select(
                F.col(key),
                "_change",
                *[picked.getField(c).alias(c) for c in val_cols],
            )
        )
