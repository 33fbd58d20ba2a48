"""Streaming upsert sink (streaming/upsert.py): keyed changelog →
Dataset via sequence-guarded DV merges with per-batch idempotency
tags — the Flink upsert-kafka / retract-sink contract."""

import os

from pyspark.sql import Row

from lance_flink_spark.sources.dataset import Dataset
from lance_flink_spark.streaming.upsert import UpsertDatasetSink


def _batch(spark, rows):
    return spark.createDataFrame(
        [Row(k=int(k), v=str(v), seq=int(s), _op=op) for k, v, s, op in rows],
        "k long, v string, seq long, _op string",
    )


def test_insert_update_delete_then_replay_noop(spark, tmp_path_str):
    sink = UpsertDatasetSink(tmp_path_str + "/t", key="k", seq_cols=["seq"])
    sink.write_batch(_batch(spark, [(1, "a", 1, "U"), (2, "b", 1, "U")]), 0)
    sink.write_batch(_batch(spark, [(1, "a2", 2, "U"), (3, "c", 2, "U")]), 1)
    sink.write_batch(_batch(spark, [(2, "ignored", 3, "D")]), 2)
    ds = Dataset(tmp_path_str + "/t")
    state = {(r["k"], r["v"]) for r in ds.read(spark).select("k", "v").collect()}
    assert state == {(1, "a2"), (3, "c")}
    # the op/seq columns never land in the table
    assert set(ds.read(spark).columns) == {"k", "v", "seq"}

    # replaying any batch is a no-op (tag recorded inside the commit)
    n_versions = len(ds.versions())
    sink.write_batch(_batch(spark, [(1, "a", 1, "U"), (2, "b", 1, "U")]), 0)
    sink.write_batch(_batch(spark, [(2, "ignored", 3, "D")]), 2)
    assert len(ds.versions()) == n_versions
    assert {
        (r["k"], r["v"]) for r in ds.read(spark).select("k", "v").collect()
    } == state


def test_sequence_guard_rejects_stale_changes(spark, tmp_path_str):
    """Out-of-order delivery: a later batch carrying OLDER sequence
    numbers must not clobber newer state (event-time
    last-writer-wins)."""
    sink = UpsertDatasetSink(tmp_path_str + "/t", key="k", seq_cols=["seq"])
    sink.write_batch(_batch(spark, [(1, "new", 10, "U")]), 0)
    sink.write_batch(_batch(spark, [(1, "old", 5, "U")]), 1)  # stale: ignored
    ds = Dataset(tmp_path_str + "/t")
    assert [
        (r["k"], r["v"]) for r in ds.read(spark).select("k", "v").collect()
    ] == [(1, "new")]
    # a stale DELETE is ignored too
    sink.write_batch(_batch(spark, [(1, "x", 7, "D")]), 2)
    assert ds.read(spark).count() == 1
    # a newer delete wins
    sink.write_batch(_batch(spark, [(1, "x", 11, "D")]), 3)
    assert ds.read(spark).count() == 0


def test_intra_batch_fold_newest_wins(spark, tmp_path_str):
    """Several changes for one key inside a single micro-batch: only
    the newest (by seq) applies — insert→update→delete folds to the
    delete, delete→reinsert folds to the reinsert."""
    sink = UpsertDatasetSink(tmp_path_str + "/t", key="k", seq_cols=["seq"])
    sink.write_batch(
        _batch(
            spark,
            [(1, "a", 1, "U"), (1, "b", 2, "U"), (1, "x", 3, "D"),
             (2, "x", 1, "D"), (2, "c", 2, "U")],
        ),
        0,
    )
    ds = Dataset(tmp_path_str + "/t")
    assert {
        (r["k"], r["v"]) for r in ds.read(spark).select("k", "v").collect()
    } == {(2, "c")}


def test_deletes_ride_the_dv_path_no_rewrites(spark, tmp_path_str):
    """Post-bootstrap batches commit as merge-dv: deletes tombstone
    positions, updates tombstone + append — no pre-existing data file
    is removed or rewritten."""
    sink = UpsertDatasetSink(tmp_path_str + "/t", key="k", seq_cols=["seq"])
    sink.write_batch(_batch(spark, [(i, f"v{i}", 1, "U") for i in range(20)]), 0)
    sink.write_batch(_batch(spark, [(3, "x", 2, "D"), (5, "nv", 2, "U")]), 1)
    man = Dataset(tmp_path_str + "/t")._load_manifest()
    v2 = man["versions"][-1]
    assert v2["mode"] == "merge-dv"
    assert v2.get("dv_rows") == 2 and not v2.get("removed_files")


def test_streaming_end_to_end_file_replay(spark, tmp_path_str):
    """True Structured Streaming run: 3 changelog files drained with
    maxFilesPerTrigger=1 (mtime-ordered micro-batches), then the WHOLE
    stream replayed against a fresh checkpoint — the second pass finds
    every batch tag and changes nothing."""
    src = tmp_path_str + "/src"
    os.makedirs(src)
    batches = [
        [(1, "a", 1, "U"), (2, "b", 1, "U")],
        [(1, "a2", 2, "U"), (3, "c", 2, "U")],
        [(2, "x", 3, "D"), (4, "d", 3, "U")],
    ]
    for i, rows in enumerate(batches):
        p = f"{src}/b{i}.parquet"
        _batch(spark, rows).coalesce(1).write.mode("overwrite").parquet(p)
        t = 1_700_000_000 + i * 100
        for root, _dirs, files in os.walk(p):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))
        os.utime(p, (t, t))

    schema = spark.read.parquet(src + "/b0.parquet").schema
    sink = UpsertDatasetSink(tmp_path_str + "/t", key="k", seq_cols=["seq"])

    def drain(ckpt):
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*.parquet")
        )
        sink.run_available(sdf, tmp_path_str + ckpt)

    drain("/ckpt1")
    ds = Dataset(tmp_path_str + "/t")
    want = {(1, "a2"), (3, "c"), (4, "d")}
    assert {
        (r["k"], r["v"]) for r in ds.read(spark).select("k", "v").collect()
    } == want
    n_versions = len(ds.versions())

    drain("/ckpt2")  # full replay, fresh checkpoint: all tags hit
    assert len(ds.versions()) == n_versions
    assert {
        (r["k"], r["v"]) for r in ds.read(spark).select("k", "v").collect()
    } == want


def test_stale_update_after_delete_stays_deleted(spark, tmp_path_str):
    """Tombstone memory: a delete physically removes the row, so a
    STALE update arriving in a later batch must not resurrect it via
    the NOT-MATCHED insert path — the retraction log blocks it."""
    sink = UpsertDatasetSink(tmp_path_str + "/t", key="k", seq_cols=["seq"])
    sink.write_batch(_batch(spark, [(1, "a", 10, "U"), (2, "b", 1, "U")]), 0)
    sink.write_batch(_batch(spark, [(1, "x", 20, "D")]), 1)   # delete, seq 20
    sink.write_batch(_batch(spark, [(1, "old", 15, "U")]), 2)  # stale: blocked
    ds = Dataset(tmp_path_str + "/t")
    assert {r["k"] for r in ds.read(spark).select("k").collect()} == {2}
    # a genuinely NEWER change legitimately re-creates the key
    sink.write_batch(_batch(spark, [(1, "new", 30, "U")]), 3)
    assert {(r["k"], r["v"]) for r in ds.read(spark).select("k", "v").collect()} == {
        (2, "b"), (1, "new")
    }
    # and a delete of a never-seen key in the BOOTSTRAP batch is
    # remembered too
    sink2 = UpsertDatasetSink(tmp_path_str + "/t2", key="k", seq_cols=["seq"])
    sink2.write_batch(_batch(spark, [(9, "x", 5, "D"), (8, "a", 1, "U")]), 0)
    sink2.write_batch(_batch(spark, [(9, "stale", 3, "U")]), 1)  # blocked
    got = {r["k"] for r in Dataset(tmp_path_str + "/t2").read(spark).collect()}
    assert got == {8}


def test_compact_log_folds_to_one_row_per_key(spark, tmp_path_str):
    sink = UpsertDatasetSink(tmp_path_str + "/t", key="k", seq_cols=["seq"])
    sink.write_batch(_batch(spark, [(1, "a", 1, "U"), (2, "b", 1, "U")]), 0)
    # delete/re-create cycles across batches: each delete is logged
    for i, s in enumerate([5, 8, 12], start=1):
        sink.write_batch(_batch(spark, [(1, "x", s, "D")]), 2 * i)
        if s != 12:
            sink.write_batch(_batch(spark, [(1, "r", s + 1, "U")]), 2 * i + 1)
    sink.write_batch(_batch(spark, [(2, "x", 20, "D")]), 9)
    assert sink.retractions.read(spark).count() == 4
    assert sink.compact_log(spark)
    log = {
        (r["k"], r["seq"]) for r in sink.retractions.read(spark).collect()
    }
    assert log == {(1, 12), (2, 20)}  # newest retraction per key only
    # semantics preserved: stale changes still blocked after compaction
    # (both keys' newest ops were deletes, so the state is empty and a
    # pre-retraction update must not repopulate it)
    sink.write_batch(_batch(spark, [(2, "stale", 15, "U")]), 10)
    ds = Dataset(tmp_path_str + "/t")
    assert ds.read(spark).count() == 0
    # a genuinely newer change still lands
    sink.write_batch(_batch(spark, [(2, "fresh", 25, "U")]), 11)
    assert {(r["k"], r["v"]) for r in ds.read(spark).select("k", "v").collect()} == {
        (2, "fresh")
    }


def test_bootstrap_without_seq_rejects_dup_keys(spark, tmp_path_str):
    """No seq_cols = no defined winner: duplicate keys are refused in
    the bootstrap batch exactly like the merge path refuses them."""
    import pytest as _pytest

    sink = UpsertDatasetSink(tmp_path_str + "/t", key="k")
    with _pytest.raises(ValueError, match="multiple rows"):
        sink.write_batch(_batch(spark, [(1, "a", 1, "U"), (1, "b", 2, "U")]), 0)


def test_property_random_changelogs_converge_to_keep_last(spark, tmp_path_str):
    """Randomized robustness (seeded, replayable): random U/D changes
    over a small key space with unique global sequences, split into
    random batches and applied through the sink — the final table must
    equal the reference fold: per key, the highest-seq change wins;
    a winning D means absent. Exercises intra-batch folds, cross-batch
    seq guards, delete memory, and bootstrap, under arrival orders the
    targeted tests don't enumerate."""
    import random

    for seed in (5, 17):
        rng = random.Random(seed)
        n_keys, n_changes = rng.randint(3, 6), rng.randint(15, 40)
        seqs = list(range(1, n_changes + 1))
        rng.shuffle(seqs)  # arrival order ≠ sequence order
        changes = [
            (
                rng.randrange(n_keys),
                f"v{s}",
                s,
                "D" if rng.random() < 0.25 else "U",
            )
            for s in seqs
        ]
        # reference fold: highest seq per key wins
        best = {}
        for k, v, s, op in changes:
            if k not in best or s > best[k][0]:
                best[k] = (s, v, op)
        want = {(k, v) for k, (s, v, op) in best.items() if op == "U"}
        # random batch split
        cuts = sorted(rng.sample(range(1, n_changes), min(3, n_changes - 1)))
        batches, prev = [], 0
        for c in [*cuts, n_changes]:
            if c > prev:
                batches.append(changes[prev:c])
            prev = c
        root = os.path.join(tmp_path_str, f"prop{seed}")
        sink = UpsertDatasetSink(root + "/t", key="k", seq_cols=["seq"])
        for i, b in enumerate(batches):
            sink.write_batch(_batch(spark, b), i)
        ds = Dataset(root + "/t")
        try:
            got = {
                (r["k"], r["v"])
                for r in ds.read(spark).select("k", "v").collect()
            }
        except FileNotFoundError:
            got = set()  # everything retracted before ever landing
        assert got == want, f"seed {seed}: {got} != {want}"
