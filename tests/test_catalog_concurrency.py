"""Concurrent-writer isolation for the Catalog shim: the snapshot log is
the commit point, so N processes committing to one table must (a) never
lose a record (the read-modify-write is serialized by the table flock),
(b) assign unique, gapless, monotonically increasing snapshot ids, and
(c) never expose a torn log to readers (os.replace is atomic)."""

import json
import multiprocessing as mp
import os
import time

from timeseries_harmonizer_spark.sources.tables import Catalog, Snapshot

N_WRITERS = 4
COMMITS_EACH = 12


def _writer(base, wid):
    cat = Catalog(base)
    for i in range(COMMITS_EACH):
        cat._commit(
            Snapshot(
                snapshot_id=-1,
                table="t",
                mode="append",
                rows=wid * 1000 + i,
                committed_at=time.time(),
                watermark=f"w{wid}-{i}",
            )
        )


def _reader(base, stop_after, errors):
    cat = Catalog(base)
    t0 = time.time()
    while time.time() - t0 < stop_after:
        path = os.path.join(base, "t", "_snapshots.json")
        if not os.path.exists(path):
            continue
        try:
            with open(path) as f:
                recs = json.load(f)  # a torn write would fail to parse
        except json.JSONDecodeError as e:
            errors.append(f"torn log: {e}")
            return
        ids = [r["snapshot_id"] for r in recs]
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


def test_rewrite_swap_serialized(tmp_path):
    """Two processes doing staged-swap rewrites: both snapshots commit and
    the surviving data dir is exactly one writer's output (never a merge of
    both, never missing)."""
    base = str(tmp_path / "wh2")

    def rewriter(tag):
        import pandas as pd

        # stage data without Spark: the swap logic only touches directories
        cat = Catalog(base)
        tmp = cat._data_dir("t") + f".rewrite-{tag}"  # unique, like rewrite()
        os.makedirs(tmp, exist_ok=True)
        pd.DataFrame({"v": [tag]}).to_parquet(os.path.join(tmp, "part-0.parquet"))
        import shutil

        with cat._lock("t"):
            live, bak = cat._data_dir("t"), cat._data_dir("t") + ".old"
            shutil.rmtree(bak, ignore_errors=True)
            if os.path.exists(live):
                os.rename(live, bak)
            os.rename(tmp, live)
            shutil.rmtree(bak, ignore_errors=True)
        cat._commit(
            Snapshot(
                snapshot_id=-1, table="t", mode="rewrite", rows=None,
                committed_at=time.time(), watermark=str(tag),
            )
        )

    ps = [mp.Process(target=rewriter, args=(tag,)) for tag in (1, 2)]
    for p in ps:
        p.start()
    for p in ps:
        p.join(timeout=60)
        assert p.exitcode == 0

    import pandas as pd

    cat = Catalog(base)
    assert [s.snapshot_id for s in cat.snapshots("t")] == [1, 2]
    live = cat._data_dir("t")
    vals = pd.read_parquet(live)["v"].tolist()
    assert vals in ([1], [2]), vals  # exactly one consistent winner
    assert not os.path.exists(live + ".old")
    assert not any(p.startswith("data.rewrite") for p in os.listdir(os.path.dirname(live)))


def test_compact_small_files(spark, tmp_path):
    """20 tiny appends -> one compaction: file count collapses to the
    byte-size estimate (1 here), rows and values are identical, and a
    'rewrite' snapshot is committed on top of the appends."""
    import glob

    import pandas as pd

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
    before = glob.glob(os.path.join(cat._data_dir("t"), "**", "*.parquet"),
                       recursive=True)
    assert len(before) >= 20
    orig = cat.read(spark, "t").toPandas().sort_values("url").reset_index(drop=True)

    snap = cat.compact(spark, "t")
    after = glob.glob(os.path.join(cat._data_dir("t"), "**", "*.parquet"),
                      recursive=True)
    assert len(after) < len(before) and len(after) <= 2, (len(before), len(after))
    got = cat.read(spark, "t").toPandas().sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, orig)
    snaps = cat.snapshots("t")
    assert snaps[-1].snapshot_id == snap and snaps[-1].mode == "rewrite"
    assert len(snaps) == 21
