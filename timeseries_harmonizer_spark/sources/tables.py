"""Table IO shim — Iceberg-like snapshot semantics over partitioned Parquet.

No Iceberg runtime jar ships in this sandbox, so the engine's storage layer
is a thin catalog over partitioned Parquet that preserves the properties the
design needs (SURVEY.md §1.2):

- atomic-enough snapshot commits: data lands under ``data/``, then a JSON
  snapshot record is appended to ``_snapshots.json`` via atomic rename; a
  reader only trusts files referenced by committed snapshots' watermarks,
- per-write snapshot ids recorded in the checkpoint manifest (lineage),
- dynamic partition overwrite for idempotent re-runs (the reference's
  overlap re-compute + last-write-wins storage, launcher.py:40-44).

On a real cluster this module is swapped for the Iceberg catalog: the
``Catalog`` API (write/append/overwrite_partitions/read/snapshots) matches
what ``df.writeTo(table)`` provides.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Snapshot:
    snapshot_id: int
    table: str
    mode: str               # "overwrite" | "append" | "overwrite_partitions"
    rows: int | None
    committed_at: float
    watermark: str | None = None  # max event time covered by this write


class Catalog:
    def __init__(self, base_path: str):
        self.base_path = base_path
        os.makedirs(base_path, exist_ok=True)

    # -- paths -------------------------------------------------------------
    def _table_dir(self, name: str) -> str:
        return os.path.join(self.base_path, name)

    def _data_dir(self, name: str) -> str:
        return os.path.join(self._table_dir(name), "data")

    def _snap_file(self, name: str) -> str:
        return os.path.join(self._table_dir(name), "_snapshots.json")

    # -- snapshot log ------------------------------------------------------
    def snapshots(self, name: str) -> list[Snapshot]:
        path = self._snap_file(name)
        if not os.path.exists(path):
            return []
        with open(path) as f:
            return [Snapshot(**rec) for rec in json.load(f)]

    def last_snapshot_id(self, name: str) -> int | None:
        snaps = self.snapshots(name)
        return snaps[-1].snapshot_id if snaps else None

    def _lock(self, name: str):
        """Exclusive advisory lock serializing commit critical sections for
        one table across PROCESSES (flock on a sidecar file). This is the
        local-filesystem stand-in for Iceberg's optimistic-concurrency
        metadata commit: two writers may stage data concurrently, but log
        mutation + snapshot-id assignment is single-writer. On a real
        cluster the Iceberg catalog provides this via atomic metadata-pointer
        swap + retry; an flock is the correct primitive for a shared local
        volume."""
        import fcntl
        from contextlib import contextmanager

        d = self._table_dir(name)
        os.makedirs(d, exist_ok=True)

        @contextmanager
        def held():
            with open(os.path.join(d, "_commit.lock"), "w") as lk:
                fcntl.flock(lk, fcntl.LOCK_EX)
                try:
                    yield
                finally:
                    fcntl.flock(lk, fcntl.LOCK_UN)

        return held()

    def _commit(self, snap: Snapshot) -> int:
        """Append a snapshot record under the table's commit lock, assigning
        the snapshot id INSIDE the critical section (read-modify-write of
        the log would otherwise lose a concurrent writer's record). Returns
        the assigned id; the os.replace is the atomic commit point — a
        reader sees either the old or the new complete log, never a torn
        one."""
        d = self._table_dir(snap.table)
        os.makedirs(d, exist_ok=True)
        with self._lock(snap.table):
            existing = self.snapshots(snap.table)
            snap.snapshot_id = (
                existing[-1].snapshot_id + 1 if existing else 1
            )
            snaps = [asdict(s) for s in existing] + [asdict(snap)]
            fd, tmp = tempfile.mkstemp(dir=d, suffix=".json.tmp")
            with os.fdopen(fd, "w") as f:
                json.dump(snaps, f, indent=1)
            os.replace(tmp, self._snap_file(snap.table))  # atomic commit point
        return snap.snapshot_id

    # -- writes ------------------------------------------------------------
    def write(
        self,
        name: str,
        df: DataFrame,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
        watermark: str | None = None,
        count_rows: bool = False,
    ) -> int:
        """Write a table; returns the committed snapshot id."""
        writer = df.write.mode("append" if mode == "append" else "overwrite")
        if mode == "overwrite_partitions":
            writer = writer.option("partitionOverwriteMode", "dynamic")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self._data_dir(name))
        return self._commit(
            Snapshot(
                snapshot_id=-1,  # assigned under the commit lock
                table=name,
                mode=mode,
                rows=df.count() if count_rows else None,
                committed_at=time.time(),
                watermark=watermark,
            )
        )

    def rewrite(
        self,
        name: str,
        df: DataFrame,
        partition_by: list[str] | None = None,
        watermark: str | None = None,
    ) -> int:
        """Full-table rewrite that is SAFE when ``df`` derives from this
        same table (Spark cannot overwrite a parquet dir it is reading):
        stage the new data to a sibling dir, swap directories, commit a
        'rewrite' snapshot. This is the delete/tombstone primitive (S10 —
        reference tools/remove_influx_data.py:10-21 drops a measurement
        range; here the table is rewritten without the dropped rows)."""
        import shutil
        import uuid

        # UNIQUE staging dir per rewriter: a shared staging path would let a
        # concurrent rewrite steal/delete another writer's half-staged data
        tmp = self._data_dir(name) + f".rewrite-{uuid.uuid4().hex[:12]}"
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(tmp)
        # the directory swap must be serialized with other rewriters (two
        # concurrent swaps could both back up the same live dir); the log
        # append then re-acquires the same lock in _commit (flock conflicts
        # between fds even in one process, so the two sections must not nest)
        with self._lock(name):
            live, bak = self._data_dir(name), self._data_dir(name) + ".old"
            shutil.rmtree(bak, ignore_errors=True)
            if os.path.exists(live):
                os.rename(live, bak)
            os.rename(tmp, live)  # commit point for the data
            shutil.rmtree(bak, ignore_errors=True)
        return self._commit(
            Snapshot(
                snapshot_id=-1,  # assigned under the commit lock
                table=name,
                mode="rewrite",
                rows=None,
                committed_at=time.time(),
                watermark=watermark,
            )
        )

    def compact(
        self,
        spark: SparkSession,
        name: str,
        target_file_mb: int = 128,
        partition_by: list[str] | None = None,
    ) -> int:
        """Small-files compaction (the Iceberg ``rewrite_data_files``
        analog): many appends leave a table as thousands of tiny part
        files, and at scale the scan's task-scheduling overhead then
        dominates I/O. Rewrites the table's current snapshot into files
        sized toward ``target_file_mb`` (file count estimated from on-disk
        bytes, floor 1 per partition dir) via the staged-swap rewrite path,
        so readers always see either the old or the new complete file set.
        Returns the committed snapshot id; row-identical by construction
        (same DataFrame, repartitioned only)."""
        total = 0
        for root, _, files in os.walk(self._data_dir(name)):
            total += sum(
                os.path.getsize(os.path.join(root, f))
                for f in files
                if f.endswith(".parquet")
            )
        n_files = max(1, round(total / (target_file_mb * 1024 * 1024)))
        df = self.read(spark, name)
        if partition_by:
            # spread within each partition dir without a global shuffle key
            df = df.repartition(n_files, *partition_by)
        else:
            df = df.coalesce(n_files)
        return self.rewrite(name, df, partition_by=partition_by)

    # -- reads ---------------------------------------------------------
    def read(self, spark: SparkSession, name: str) -> DataFrame:
        return spark.read.parquet(self._data_dir(name))

    def exists(self, name: str) -> bool:
        return os.path.exists(self._snap_file(name))


def write_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int = 64,
    bucket_cols: list[str] | tuple[str, ...] = ("url",),
    sort_cols: list[str] | tuple[str, ...] = ("url", "start"),
    mode: str = "overwrite",
) -> None:
    """Persist a table hash-bucketed (and sorted) on its series key — the
    cross-JOB co-location lever: a plain parquet file loses its partitioning
    the moment it's re-read, so every later job pays the url shuffle again,
    while a bucketed table read via the catalog satisfies ClusteredDistribution
    on the bucket columns directly (groupBy(url, ...) aggregates with ZERO
    exchanges, bucketed-bucketed equi-joins sort-merge without a shuffle on
    either side — pinned by tests/test_plan_quality.py). This is the
    Iceberg/Hive bucketing discipline expressed through Spark's managed-table
    API; n_buckets should match the engine's N_BUCKETS so in-job and at-rest
    partitioning agree."""
    import shutil

    spark = df.sparkSession
    if mode == "overwrite":
        # a managed-table LOCATION can outlive its catalog entry (fresh
        # session, old warehouse dir) — saveAsTable then refuses with
        # LOCATION_ALREADY_EXISTS; drop both the entry and any stale dir
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        wh = spark.conf.get("spark.sql.warehouse.dir", "")
        loc = os.path.join(wh.removeprefix("file:"), table.split(".")[-1])
        if wh and os.path.isdir(loc):
            shutil.rmtree(loc, ignore_errors=True)
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*sort_cols)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table THROUGH the catalog (spark.read.parquet on the
    underlying files would silently drop the bucket spec)."""
    return spark.table(table)
