"""Concurrent-writer isolation for the CAS snapshot catalog.

The commit point is the exclusive-create of `_snapshots/v{N}.json` (the
object-store-portable CAS — no flock, no POSIX rename ordering). These
tests storm it from multiple PROCESSES and assert:
 (a) no commit is ever lost (every writer's record survives),
 (b) snapshot ids are unique, gapless, monotonically increasing,
 (c) readers never see a torn state (version files are immutable and
     appear atomically),
 (d) data staged by one writer is never destroyed by another — the
     append-during-compact loss of the round-4 flock shim is structurally
     impossible because segments are immutable and rewrites abort on a
     moved head (CommitConflict) instead of swapping live directories.
"""

import glob
import json
import multiprocessing as mp
import os
import threading
import time

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from timeseries_harmonizer_spark.sources.tables import (
    Catalog,
    CommitConflict,
    Snapshot,
)

N_WRITERS = 4
COMMITS_EACH = 12


def _pandas_stage(cat: Catalog, table: str, pdf: pd.DataFrame) -> list[str]:
    """Stage a segment without Spark (the commit protocol is engine-agnostic:
    any writer that lands parquet in a fresh seg dir and CAS-commits the
    file list is a valid participant)."""
    import uuid

    seg = f"seg-{uuid.uuid4().hex[:16]}"
    seg_dir = os.path.join(cat._data_dir(table), seg)
    os.makedirs(seg_dir, exist_ok=True)
    path = os.path.join(seg_dir, "part-0.parquet")
    pdf.to_parquet(path)
    return [f"{seg}/part-0.parquet"]


def _append(cat: Catalog, table: str, pdf: pd.DataFrame, mark: str) -> int:
    return cat._commit_files(
        Snapshot(
            snapshot_id=-1, table=table, mode="append", rows=len(pdf),
            committed_at=time.time(), watermark=mark,
        ),
        _pandas_stage(cat, table, pdf),
    )


def _writer(base, wid):
    cat = Catalog(base)
    for i in range(COMMITS_EACH):
        _append(cat, "t", pd.DataFrame({"v": [wid * 1000 + i]}), f"w{wid}-{i}")


def _reader(base, stop_after, errors):
    cat = Catalog(base)
    t0 = time.time()
    while time.time() - t0 < stop_after:
        try:
            snaps = cat.snapshots("t")  # torn version file would fail to parse
        except json.JSONDecodeError as e:
            errors.append(f"torn state: {e}")
            return
        ids = [s.snapshot_id for s in snaps]
        if ids != sorted(ids) or len(set(ids)) != len(ids):
            errors.append(f"non-monotonic/duplicate ids: {ids}")
            return


def test_concurrent_commits_lose_nothing(tmp_path):
    base = str(tmp_path / "wh")
    mgr = mp.Manager()
    errors = mgr.list()
    reader = mp.Process(target=_reader, args=(base, 8.0, errors))
    reader.start()
    writers = [
        mp.Process(target=_writer, args=(base, w)) for w in range(N_WRITERS)
    ]
    for p in writers:
        p.start()
    for p in writers:
        p.join(timeout=60)
        assert p.exitcode == 0
    reader.join(timeout=20)
    assert not list(errors), list(errors)

    cat = Catalog(base)
    snaps = cat.snapshots("t")
    total = N_WRITERS * COMMITS_EACH
    ids = [s.snapshot_id for s in snaps]
    assert len(snaps) == total, f"lost {total - len(snaps)} commits"
    assert ids == list(range(1, total + 1)), ids  # unique, gapless, ordered
    # every writer's every record survived
    marks = {s.watermark for s in snaps}
    assert marks == {f"w{w}-{i}" for w in range(N_WRITERS) for i in range(COMMITS_EACH)}
    # ... and every writer's every ROW is tracked (one file per commit)
    assert len(cat.tracked_files("t")) == total


def test_rewrite_conflict_aborts_not_clobbers(tmp_path):
    """A rewrite staged against a stale head must abort (CommitConflict),
    discard its staged segment, and leave the concurrent append's data
    fully readable — the Iceberg rewrite_data_files contract the round-4
    flock shim could not honor."""
    base = str(tmp_path / "wh2")
    cat = Catalog(base)
    _append(cat, "t", pd.DataFrame({"v": [1]}), "base")

    # stage a rewrite against v1, then let an append win the race
    parent, _ = cat._head("t")
    staged = _pandas_stage(cat, "t", pd.DataFrame({"v": [99]}))
    _append(cat, "t", pd.DataFrame({"v": [2]}), "racer")
    with pytest.raises(CommitConflict):
        try:
            cat._commit_files(
                Snapshot(snapshot_id=-1, table="t", mode="rewrite", rows=None,
                         committed_at=time.time(), watermark="rw"),
                staged, expected_parent=parent,
            )
        finally:
            cat._discard_segment("t", staged)
    # the racer's commit and data are intact; the rewrite left no trace
    assert [s.watermark for s in cat.snapshots("t")] == ["base", "racer"]
    vals = sorted(
        pd.concat(
            pd.read_parquet(os.path.join(cat._data_dir("t"), f))
            for f in cat.tracked_files("t")
        )["v"].tolist()
    )
    assert vals == [1, 2]
    staged_seg = staged[0].split("/", 1)[0]
    assert not os.path.exists(os.path.join(cat._data_dir("t"), staged_seg))


def test_append_during_compact_never_loses_rows(spark, tmp_path):
    """The ADVICE-r4 scenario: a writer keeps appending while compactions
    run. Immutable segments + parent-pinned rewrite commits mean every
    appended row survives every compaction, with compact retrying (not
    silently dropping) on conflict."""
    base = str(tmp_path / "wh4")
    cat = Catalog(base)
    _append(cat, "t", pd.DataFrame({"v": [-1]}), "seed")

    appended, stop = [], threading.Event()

    def appender():
        i = 0
        while not stop.is_set() and i < 40:
            _append(cat, "t", pd.DataFrame({"v": [i]}), f"a{i}")
            appended.append(i)
            i += 1
            time.sleep(0.02)

    t = threading.Thread(target=appender)
    t.start()
    try:
        for _ in range(4):
            try:
                cat.compact(spark, "t", max_retries=5)
            except CommitConflict:
                pass  # fine: appender kept winning; nothing may be lost
    finally:
        stop.set()
        t.join(timeout=30)

    got = sorted(cat.read(spark, "t").toPandas()["v"].tolist())
    assert got == sorted([-1] + appended), (
        f"lost rows: {set([-1] + appended) - set(got)}"
    )


def test_compact_small_files(spark, tmp_path):
    """20 tiny appends -> one compaction: the TRACKED file count collapses,
    rows and values are identical, a 'rewrite' snapshot commits on top, and
    expire_snapshots reclaims the superseded tiny files from disk."""
    base = str(tmp_path / "wh3")
    cat = Catalog(base)
    for i in range(20):
        cat.write(
            "t",
            spark.createDataFrame(
                pd.DataFrame({"url": [f"u{i}"], "v": [float(i)]})
            ),
            mode="append",
        )
    assert len(cat.tracked_files("t")) >= 20
    orig = cat.read(spark, "t").toPandas().sort_values("url").reset_index(drop=True)

    snap = cat.compact(spark, "t")
    assert len(cat.tracked_files("t")) <= 2
    got = cat.read(spark, "t").toPandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, orig)
    snaps = cat.snapshots("t")
    assert snaps[-1].snapshot_id == snap and snaps[-1].mode == "rewrite"
    assert len(snaps) == 21

    # superseded segments stay on disk (time travel) until expiry
    on_disk = glob.glob(os.path.join(cat._data_dir("t"), "**", "*.parquet"),
                        recursive=True)
    assert len(on_disk) >= 20
    dropped = cat.expire_snapshots("t", keep_last=1)
    assert dropped >= 20
    on_disk = glob.glob(os.path.join(cat._data_dir("t"), "**", "*.parquet"),
                        recursive=True)
    assert len(on_disk) == len(cat.tracked_files("t"))
    pd.testing.assert_frame_equal(
        cat.read(spark, "t").toPandas().sort_values("url").reset_index(drop=True),
        orig,
    )


def test_compact_evens_out_skewed_files(spark, tmp_path):
    """compact uses repartition (a real shuffle), not coalesce, so wildly
    skewed input files still produce evenly-sized outputs (verdict r4)."""
    import numpy as np

    base = str(tmp_path / "wh5")
    cat = Catalog(base)
    rng = np.random.default_rng(7)
    # one fat file + many slivers; random hex strings defeat compression
    for n in [120_000] + [200] * 8:
        pdf = pd.DataFrame({
            "k": np.arange(n),
            "s": [bytes(x).hex() for x in rng.integers(0, 256, (n, 24), dtype=np.uint8)],
        })
        cat.write("t", spark.createDataFrame(pdf).coalesce(1), mode="append")
    cat.compact(spark, "t", target_file_mb=2)
    files = cat.tracked_files("t")
    assert len(files) >= 2, files
    sizes = sorted(
        os.path.getsize(os.path.join(cat._data_dir("t"), f)) for f in files
    )
    assert sizes[-1] <= 3 * sizes[0], sizes  # no inherited skew
    assert cat.read(spark, "t").count() == 120_000 + 8 * 200


def test_time_travel_and_dynamic_partition_overwrite(spark, tmp_path):
    base = str(tmp_path / "wh6")
    cat = Catalog(base)
    pdf = pd.DataFrame({"bucket": ["a", "a", "b"], "v": [1, 2, 3]})
    v1 = cat.write("t", spark.createDataFrame(pdf), partition_by=["bucket"])
    v2 = cat.write(
        "t",
        spark.createDataFrame(pd.DataFrame({"bucket": ["a"], "v": [10]})),
        mode="overwrite_partitions",
        partition_by=["bucket"],
    )
    # head: partition a replaced, partition b untouched
    got = cat.read(spark, "t").toPandas().sort_values("v")
    assert got["v"].tolist() == [3, 10]
    assert set(got["bucket"]) == {"a", "b"}
    # time travel to v1
    old = cat.read(spark, "t", version=v1).toPandas().sort_values("v")
    assert old["v"].tolist() == [1, 2, 3]
    # expiry drops v1's a-partition files but keeps the shared b files
    cat.expire_snapshots("t", keep_last=1)
    assert cat.read(spark, "t").count() == 2
    with pytest.raises(FileNotFoundError):
        cat._load_version("t", v1)
    assert cat.last_snapshot_id("t") == v2


def test_manifest_data_skipping(spark, tmp_path):
    """Per-file min/max stats land in the manifest at commit time and
    read(where=(col, lo, hi)) prunes non-intersecting files BEFORE Spark
    lists anything (the Iceberg data-skipping analog). Pruning is
    conservative: values are still exact after the real filter."""
    base = str(tmp_path / "wh7")
    cat = Catalog(base)
    # three appends covering disjoint day ranges -> three stat'd files
    for day in ("2024-01-01", "2024-02-01", "2024-03-01"):
        idx = pd.date_range(day, periods=24, freq="1h")
        cat.write(
            "t",
            spark.createDataFrame(
                pd.DataFrame({"start": idx, "v": np.arange(24.0)})
            ).coalesce(1),
            mode="append",
        )
    _, state = cat._head("t")
    assert len(state["files"]) == 3
    assert all(
        "start" in state["stats"][f] for f in state["files"]
    ), state["stats"]

    lo, hi = pd.Timestamp("2024-02-01"), pd.Timestamp("2024-02-02")
    pruned = cat.read(spark, "t", where=("start", lo, hi))
    assert len(pruned.inputFiles()) == 1  # two files skipped from the manifest
    got = (
        pruned.where(F.col("start").between(F.lit(lo), F.lit(hi)))
        .orderBy("start").toPandas()
    )
    full = (
        cat.read(spark, "t")
        .where(F.col("start").between(F.lit(lo), F.lit(hi)))
        .orderBy("start").toPandas()
    )
    pd.testing.assert_frame_equal(got, full)
    assert len(got) == 24
    # a range touching nothing prunes everything -> empty-read error
    with pytest.raises(FileNotFoundError):
        cat.read(spark, "t", where=("start", pd.Timestamp("2030-01-01"),
                                    pd.Timestamp("2030-01-02")))
