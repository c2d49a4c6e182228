"""Exactly-once upsert sink (VERDICT r2 next-step #10): replaying a
delivered batch must be a no-op, distinct batches must merge
last-writer-wins per key, and the versioned table must stay one row
per key through restarts."""

import pytest

from deepicedrain_spark.streaming.sink import (
    apply_upsert_batch,
    read_upsert_table,
    upsert_sink,
)


def _table(spark, out_dir):
    df = read_upsert_table(spark, out_dir)
    return {r["k"]: (r["v"], r["t"]) for r in df.collect()} if df is not None else {}


def test_upsert_replay_is_noop(spark, tmp_path):
    out = str(tmp_path / "tbl")
    b0 = spark.createDataFrame([(1, "a", 10), (2, "b", 11)], "k long, v string, t long")
    assert apply_upsert_batch(spark, out, b0, 0, ["k"], ["t"]) is True
    t1 = _table(spark, out)
    assert t1 == {1: ("a", 10), 2: ("b", 11)}
    # restart-replay: SAME batch id redelivered → no new version, no dupes
    assert apply_upsert_batch(spark, out, b0, 0, ["k"], ["t"]) is False
    assert _table(spark, out) == t1
    # and again with a shuffled duplicate of the frame
    assert apply_upsert_batch(spark, out, b0.repartition(8), 0, ["k"], ["t"]) is False
    assert _table(spark, out) == t1


def test_upsert_merges_and_dedups_within_batch(spark, tmp_path):
    out = str(tmp_path / "tbl")
    b0 = spark.createDataFrame([(1, "a", 10), (2, "b", 11)], "k long, v string, t long")
    apply_upsert_batch(spark, out, b0, 0, ["k"], ["t"])
    # batch 1: key 2 updated twice in-batch (t=12 then t=15 wins), key 3 new
    b1 = spark.createDataFrame(
        [(2, "b2", 12), (2, "b3", 15), (3, "c", 13)], "k long, v string, t long"
    )
    apply_upsert_batch(spark, out, b1, 1, ["k"], ["t"])
    assert _table(spark, out) == {1: ("a", 10), 2: ("b3", 15), 3: ("c", 13)}
    # replay of batch 1 after the merge → still a no-op
    assert apply_upsert_batch(spark, out, b1, 1, ["k"], ["t"]) is False
    assert _table(spark, out) == {1: ("a", 10), 2: ("b3", 15), 3: ("c", 13)}


def test_upsert_through_streaming_restart(spark, tmp_path):
    """Drive the sink through an actual Structured Streaming query,
    twice, from the same source with a FRESH checkpoint the second
    time (the worst-case restart: full source replay). The table must
    hold exactly one row per key with the latest value both times."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "tbl")
    events = spark.createDataFrame(
        [(k, f"v{k}_{t}", t) for k in range(20) for t in (1, 2, 3)],
        "k long, v string, t long",
    )
    events.coalesce(1).write.parquet(src)

    def run(checkpoint: str) -> None:
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            stream.writeStream.foreachBatch(upsert_sink(spark, out, ["k"], ["t"]))
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run(str(tmp_path / "ckpt1"))
    expect = {k: (f"v{k}_3", 3) for k in range(20)}
    assert _table(spark, out) == expect
    # "restart" with a fresh checkpoint: the file source redelivers
    # everything as batch 0 — already applied → sink no-ops, no dupes
    run(str(tmp_path / "ckpt2"))
    df = read_upsert_table(spark, out)
    assert df.count() == 20 and _table(spark, out) == expect


def test_vacuum_versions(spark, tmp_path):
    import os

    from deepicedrain_spark.streaming.sink import vacuum_versions

    out = str(tmp_path / "tbl")
    for bid in range(5):
        b = spark.createDataFrame([(1, f"v{bid}", bid)], "k long, v string, t long")
        apply_upsert_batch(spark, out, b, bid, ["k"], ["t"])
    assert sorted(os.listdir(out))[:1] == ["_manifest.json"]
    removed = vacuum_versions(out, keep_last=2)
    assert removed == [0, 1, 2]
    dirs = sorted(d for d in os.listdir(out) if d.startswith("v="))
    assert dirs == ["v=3", "v=4"]
    # table still reads the current version
    assert _table(spark, out) == {1: ("v4", 4)}
    # replay of an old, vacuumed batch is still a no-op (manifest rules)
    b0 = spark.createDataFrame([(1, "v0", 0)], "k long, v string, t long")
    assert apply_upsert_batch(spark, out, b0, 0, ["k"], ["t"]) is False


def test_concurrent_writers_no_lost_update(spark, tmp_path):
    """VERDICT r3 task 7: two interleaved apply_upsert_batch callers
    (distinct batch ids, disjoint keys) — the lock file serializes the
    read-merge-commit sections, so every batch's rows survive and the
    manifest records every id exactly once. Without the lock, both
    writers read version N, both write v=N+1, and one update vanishes."""
    import json
    import threading

    out = str(tmp_path / "tbl")
    n_threads, n_batches = 2, 8
    errors = []

    def writer(tid):
        try:
            for i in range(n_batches):
                bid = tid * 100 + i
                b = spark.createDataFrame(
                    [(tid * 1000 + i, f"w{tid}b{i}", i)], "k long, v string, t long"
                )
                assert apply_upsert_batch(spark, out, b, bid, ["k"], ["t"]) is True
        except Exception as e:  # surface thread failures to the test
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(t,)) for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []

    table = _table(spark, out)
    assert len(table) == n_threads * n_batches  # no lost update
    manifest = json.load(open(str(tmp_path / "tbl" / "_manifest.json")))
    assert manifest["version"] == n_threads * n_batches - 1
    assert sorted(manifest["applied"]) == sorted(
        t * 100 + i for t in range(n_threads) for i in range(n_batches)
    )


def test_concurrent_same_batch_applies_once(spark, tmp_path):
    """Two writers redelivering the SAME batch id: exactly one applies,
    the other sees it in the manifest and no-ops."""
    import threading

    out = str(tmp_path / "tbl")
    results = []

    def writer():
        b = spark.createDataFrame([(7, "dup", 1)], "k long, v string, t long")
        results.append(apply_upsert_batch(spark, out, b, 42, ["k"], ["t"]))

    threads = [threading.Thread(target=writer) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(results) == [False, True]
    assert _table(spark, out) == {7: ("dup", 1)}


def test_commit_fence_refuses_lost_update(spark, tmp_path):
    """The CAS fence: a writer whose lock was broken (crash recovery)
    must NOT overwrite a commit that landed in the meantime."""
    from deepicedrain_spark.streaming.sink import _commit_manifest

    out = str(tmp_path / "tbl")
    b = spark.createDataFrame([(1, "a", 1)], "k long, v string, t long")
    apply_upsert_batch(spark, out, b, 0, ["k"], ["t"])  # version -> 0
    with pytest.raises(RuntimeError, match="fence"):
        _commit_manifest(out, {"version": 1, "applied": [0, 1]}, expected_version=-1)


def test_compact_table_preserves_rows_and_replay(spark, tmp_path):
    """OPTIMIZE: compaction rewrites the current version into one file,
    values unchanged, applied-batch set carried over (replay of an old
    batch stays a no-op), and subsequent upserts continue normally."""
    import glob
    import os

    from deepicedrain_spark.streaming.sink import compact_table

    out = str(tmp_path / "tbl")
    assert compact_table(spark, out) is None  # empty table: no-op
    for bid in range(6):
        b = spark.createDataFrame(
            [(bid % 3, f"v{bid}", bid), (10 + bid, "x", bid)],
            "k long, v string, t long",
        )
        apply_upsert_batch(spark, out, b, bid, ["k"], ["t"])
    before = _table(spark, out)
    ver = compact_table(spark, out, target_files=1)
    assert ver == 6
    assert _table(spark, out) == before
    parts = glob.glob(os.path.join(out, "v=6", "part-*.parquet"))
    assert len(parts) == 1
    # replay of an applied batch is STILL a no-op after compaction
    b0 = spark.createDataFrame([(0, "stale", 0)], "k long, v string, t long")
    assert apply_upsert_batch(spark, out, b0, 0, ["k"], ["t"]) is False
    # and a genuinely new batch applies on top of the compacted version
    b9 = spark.createDataFrame([(0, "fresh", 99)], "k long, v string, t long")
    assert apply_upsert_batch(spark, out, b9, 9, ["k"], ["t"]) is True
    assert _table(spark, out)[0] == ("fresh", 99)


def test_bucketed_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    """The scale MERGE: a batch whose keys hash into K of N buckets
    rewrites exactly those K bucket dirs; every other bucket's data
    files carry over as hard links (same inode), proving O(touched)
    merge cost. Values match the plain sink's semantics."""
    import glob
    import os

    from deepicedrain_spark.streaming.sink import (
        apply_upsert_batch_bucketed,
        read_upsert_table_bucketed,
    )

    out = str(tmp_path / "tbl")
    n_buckets = 8
    # seed: 64 keys spread across all buckets
    seed = spark.createDataFrame(
        [(k, f"s{k}", 0) for k in range(64)], "k long, v string, t long"
    )
    assert apply_upsert_batch_bucketed(
        spark, out, seed, 0, ["k"], ["t"], n_buckets=n_buckets
    )

    def inodes(version):
        return {
            os.path.relpath(p, os.path.join(out, f"v={version}")): os.stat(p).st_ino
            for p in glob.glob(os.path.join(out, f"v={version}", "b=*", "*.parquet"))
        }

    before = inodes(0)
    # one-key batch: touches exactly 1 bucket
    upd = spark.createDataFrame([(7, "fresh", 9)], "k long, v string, t long")
    assert apply_upsert_batch_bucketed(
        spark, out, upd, 1, ["k"], ["t"], n_buckets=n_buckets
    )
    after = inodes(1)
    from pyspark.sql import functions as F

    touched = {
        r["b"]
        for r in spark.range(1)
        .select(F.pmod(F.xxhash64(F.lit(7).cast("long")), F.lit(n_buckets)).cast("int").alias("b"))
        .collect()
    }
    changed = {p.split(os.sep)[0] for p in set(after) - set(before)} | {
        p.split(os.sep)[0]
        for p in set(after) & set(before)
        if after[p] != before[p]
    }
    assert changed == {f"b={b}" for b in touched}
    # untouched buckets are the SAME inodes (hard links, zero bytes copied)
    same = [p for p in set(after) & set(before) if after[p] == before[p]]
    assert len(same) >= len(before) - len(touched) - 1

    # values: last-writer-wins, replay no-op
    table = {
        r["k"]: (r["v"], r["t"])
        for r in read_upsert_table_bucketed(spark, out).collect()
    }
    assert table[7] == ("fresh", 9) and table[3] == ("s3", 0) and len(table) == 64
    assert (
        apply_upsert_batch_bucketed(spark, out, upd, 1, ["k"], ["t"], n_buckets=n_buckets)
        is False
    )


def test_fenced_writer_cannot_clobber_committed_data(spark, tmp_path):
    """Review finding r4: data must be STAGED and published only after
    the CAS fence passes — a fenced-out writer (broken stale lock) may
    not overwrite the committed version's files. Simulated by calling
    _commit_manifest with a stale expected_version after another commit
    landed: the fence must raise AND the committed files must survive."""
    import glob
    import os

    from deepicedrain_spark.streaming.sink import (
        _commit_manifest,
        _staging_dir,
        read_upsert_table,
    )

    out = str(tmp_path / "tbl")
    b = spark.createDataFrame([(1, "committed", 1)], "k long, v string, t long")
    apply_upsert_batch(spark, out, b, 0, ["k"], ["t"])  # version 0 committed

    # a zombie writer that read version -1 stages its own v=0 payload
    staging = _staging_dir(out, 0)
    spark.createDataFrame([(1, "zombie", 9)], "k long, v string, t long").write.mode(
        "overwrite"
    ).parquet(staging)
    with pytest.raises(RuntimeError, match="fence"):
        _commit_manifest(
            out,
            {"version": 0, "applied": [99]},
            expected_version=-1,
            publish=(staging, os.path.join(out, "v=0")),
        )
    # committed data untouched, staging cleaned up
    assert _table(spark, out) == {1: ("committed", 1)}
    assert not os.path.exists(staging)
    assert glob.glob(os.path.join(out, ".staging.*")) == []


def test_lock_release_is_token_checked(tmp_path):
    """Review finding r4: a holder whose lock was broken must not
    delete the NEXT holder's lock on exit; stale-lock breaking itself
    is rename-based so only one breaker wins."""
    import os

    from deepicedrain_spark.streaming.sink import _SinkLock

    out = str(tmp_path)
    a = _SinkLock(out)
    a.__enter__()
    # simulate a steal: b breaks a's (pretend-stale) lock and acquires
    os.unlink(a.path)
    b = _SinkLock(out)
    b.__enter__()
    # a exits: must NOT remove b's lock (token mismatch)
    a.__exit__(None, None, None)
    assert os.path.exists(b.path)
    b.__exit__(None, None, None)
    assert not os.path.exists(b.path)


def test_compact_preserves_bucketed_layout(spark, tmp_path):
    """Review finding r4: compacting a bucket-partitioned table must
    keep the b=<k> layout (flattening it would make the next bucketed
    apply drop every pre-existing row)."""
    import os

    from deepicedrain_spark.streaming.sink import (
        apply_upsert_batch_bucketed,
        compact_table,
        read_upsert_table_bucketed,
    )

    out = str(tmp_path / "tbl")
    for bid in range(3):
        b = spark.createDataFrame(
            [(k, f"b{bid}", bid) for k in range(20)], "k long, v string, t long"
        )
        apply_upsert_batch_bucketed(spark, out, b, bid, ["k"], ["t"], n_buckets=4)
    before = {
        r["k"]: (r["v"], r["t"])
        for r in read_upsert_table_bucketed(spark, out).collect()
    }
    ver = compact_table(spark, out)
    assert ver == 3
    assert sorted(os.listdir(os.path.join(out, "v=3"))) == [
        "b=0", "b=1", "b=2", "b=3",
    ]
    after = {
        r["k"]: (r["v"], r["t"])
        for r in read_upsert_table_bucketed(spark, out).collect()
    }
    assert after == before
    # the next bucketed apply still sees the full table
    up = spark.createDataFrame([(5, "post", 7)], "k long, v string, t long")
    assert apply_upsert_batch_bucketed(spark, out, up, 9, ["k"], ["t"], n_buckets=4)
    final = {
        r["k"]: (r["v"], r["t"])
        for r in read_upsert_table_bucketed(spark, out).collect()
    }
    assert len(final) == 20 and final[5] == ("post", 7) and final[6] == ("b2", 2)


def test_bucketed_refuses_flat_layout(spark, tmp_path):
    """ADVICE r4 (medium): merging a bucketed batch on top of a FLAT
    (non-bucketed) current version would silently drop every existing
    row — the sink must refuse instead of committing a batch-only table."""
    from deepicedrain_spark.streaming.sink import apply_upsert_batch_bucketed

    out = str(tmp_path / "tbl")
    b0 = spark.createDataFrame([(1, "a", 10), (2, "b", 11)], "k long, v string, t long")
    assert apply_upsert_batch(spark, out, b0, 0, ["k"], ["t"]) is True  # flat v0
    b1 = spark.createDataFrame([(3, "c", 12)], "k long, v string, t long")
    with pytest.raises(ValueError, match="flat"):
        apply_upsert_batch_bucketed(spark, out, b1, 1, ["k"], ["t"], n_buckets=4)
    # table unchanged — still the flat v0 rows
    assert _table(spark, out) == {1: ("a", 10), 2: ("b", 11)}


def test_read_upsert_table_no_spurious_bucket_column(spark, tmp_path):
    """ADVICE r4 (low): read_upsert_table on a bucketed table must not
    surface a partition-discovery column 'b' — recursiveFileLookup."""
    from deepicedrain_spark.streaming.sink import apply_upsert_batch_bucketed

    out = str(tmp_path / "tbl")
    b0 = spark.createDataFrame([(1, "a", 10), (2, "b", 11)], "k long, v string, t long")
    assert apply_upsert_batch_bucketed(spark, out, b0, 0, ["k"], ["t"], n_buckets=4)
    df = read_upsert_table(spark, out)
    assert sorted(df.columns) == ["k", "t", "v"]
    assert _table(spark, out) == {1: ("a", 10), 2: ("b", 11)}


def test_time_travel_history_and_cdf(spark, tmp_path):
    """Round 8: read_upsert_table_at / table_history / diff_versions —
    snapshots are immutable, VERSION AS OF returns the exact historical
    state, the commit log matches applies, the CDF diff classifies
    insert/update/delete correctly, and vacuumed versions raise a clear
    error instead of reading garbage."""
    import pytest

    from deepicedrain_spark.streaming.sink import (
        diff_versions,
        read_upsert_table_at,
        table_history,
        vacuum_versions,
    )

    out = str(tmp_path / "tbl")
    b0 = spark.createDataFrame([(1, "a", 10), (2, "b", 11)], "k long, v string, t long")
    b1 = spark.createDataFrame([(2, "b2", 15), (3, "c", 13)], "k long, v string, t long")
    b2 = spark.createDataFrame([(1, "a2", 20)], "k long, v string, t long")
    for i, b in enumerate((b0, b1, b2)):
        apply_upsert_batch(spark, out, b, i, ["k"], ["t"])

    hist = table_history(out)
    assert [(h["version"], h["batch_id"]) for h in hist] == [(0, 0), (1, 1), (2, 2)]

    def snap(v):
        return {
            r["k"]: (r["v"], r["t"])
            for r in read_upsert_table_at(spark, out, v).collect()
        }

    assert snap(0) == {1: ("a", 10), 2: ("b", 11)}
    assert snap(1) == {1: ("a", 10), 2: ("b2", 15), 3: ("c", 13)}
    assert snap(2) == {1: ("a2", 20), 2: ("b2", 15), 3: ("c", 13)}
    with pytest.raises(ValueError, match="does not exist"):
        read_upsert_table_at(spark, out, 3)

    d01 = {
        r["k"]: r["change_type"]
        for r in diff_versions(spark, out, 0, 1, ["k"]).collect()
    }
    assert d01 == {2: "update", 3: "insert"}
    d12 = {
        r["k"]: (r["change_type"], r["v"])
        for r in diff_versions(spark, out, 1, 2, ["k"]).collect()
    }
    assert d12 == {1: ("update", "a2")}
    # reverse direction reads as deletes/pre-images
    d21 = {
        r["k"]: (r["change_type"], r["v"])
        for r in diff_versions(spark, out, 2, 1, ["k"]).collect()
    }
    assert d21 == {1: ("update", "a")}

    vacuum_versions(out, keep_last=1)
    with pytest.raises(ValueError, match="vacuumed"):
        read_upsert_table_at(spark, out, 0)
    assert snap(2) == {1: ("a2", 20), 2: ("b2", 15), 3: ("c", 13)}
