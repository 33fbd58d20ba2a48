"""IVF_FLAT `_indices` payloads (round 15): build, decode, serve.

The reference builds vector indexes through the Lance library
(LanceIndexBuilder.java:40-95) and the payload lands under
``_indices/{uuid}/`` with a manifest IndexSection entry. These tests
cover the subset sources/native_index.py closes: the no-codebook
IVF_FLAT payload builds, registers, and SERVES vector_search —
exactly equal to brute force at full probes — while PQ/HNSW payloads
and stale fragment sets refuse/warn and brute-force."""

import os
import warnings

import numpy as np
import pytest

from lance_flink_spark.sources.lance_native import (
    UnsupportedLanceFeature,
)


def _mk_dataset(tmp, name="nix", rows=64, dim=4, per_file=16):
    import pyarrow as pa

    from lance_flink_spark.sources.lance_native import write_dataset

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(rows, dim)).astype("f4")
    root = os.path.join(tmp, name)
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array(range(rows), pa.int64()),
                "embedding": pa.array(
                    [v for v in vecs], pa.list_(pa.float32())
                ),
            }
        ),
        max_rows_per_file=per_file,
    )
    return root, vecs


def test_ivf_pb_roundtrip(tmp_path_str):
    from lance_flink_spark.sources.native_index import (
        read_ivf_pb,
        write_ivf_pb,
    )

    p = os.path.join(tmp_path_str, "ivf.pb")
    cents = np.arange(12, dtype="f4").reshape(3, 4)
    write_ivf_pb(p, cents, [0, 10, 25], [10, 15, 7])
    c, offs, lens = read_ivf_pb(p, 4)
    assert np.allclose(c, cents)
    assert offs == [0, 10, 25] and lens == [10, 15, 7]
    with pytest.raises(UnsupportedLanceFeature, match="factor"):
        read_ivf_pb(p, 5)


def test_build_registers_and_serves_exactly(spark, tmp_path_str):
    """Index-served == brute top-k at full probes (IVF_FLAT has no
    quantization), and the manifest carries the registration."""
    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        read_index_section,
    )
    from lance_flink_spark.sources.native_index import (
        build_ivf_flat_index,
        search_ivf_flat,
    )

    root, vecs = _mk_dataset(tmp_path_str)
    uid = build_ivf_flat_index(
        root, "embedding", spark, num_partitions=4
    )
    nds = LanceNativeDataset(root)
    assert nds.versions() == [1, 2]
    metas = read_index_section(
        os.path.join(root, "_versions", "2.manifest")
    )
    assert len(metas) == 1 and metas[0].uuid == uid
    assert metas[0].dataset_version == 2
    assert os.path.exists(
        os.path.join(root, "_indices", uid, "ivf.pb")
    )
    # direct payload search at full probes == brute argsort
    q = vecs[3].astype("f8")
    hits = search_ivf_flat(
        root, metas[0], q, 5, nprobes=4, metric="l2"
    )
    brute = np.argsort(((vecs.astype("f8") - q) ** 2).sum(axis=1))[:5]
    assert [h[0] for h in hits] == [int(i) for i in brute]
    # SQL surface: vector_search routes through the manifest index
    eng = SqlEngine(spark, Catalog(tmp_path_str + "/wh"))
    eng.execute(
        f"CREATE TABLE nix (id BIGINT, embedding ARRAY<FLOAT>) "
        f"WITH ('connector'='lance', 'path'='{root}', "
        f"'vector.nprobes'='4')"
    )
    qsql = ", ".join(f"{float(x)!r}" for x in q)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = eng.execute(
            f"SELECT * FROM vector_search('nix', 'embedding', "
            f"ARRAY[{qsql}], 5, 'L2')"
        ).collect()
    assert not any("brute-force" in str(x.message) for x in w)
    assert [r["id"] for r in got] == [int(i) for i in brute]
    assert got[0]["distance"] == 0.0
    # SHOW INDEXES reports it fresh
    r = eng.execute("SHOW INDEXES ON nix").first()
    assert r["fresh"] and r["version"] == 2


def test_deletion_drift_serves_with_masks(spark, tmp_path_str):
    """DELETE-only commits keep the index servable: deleted row
    addresses are masked at query time (Lance's DV model) and the
    result equals brute force over the LIVE rows."""
    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import delete_rows
    from lance_flink_spark.sources.native_index import (
        build_ivf_flat_index,
    )

    root, vecs = _mk_dataset(tmp_path_str, "nixd")
    build_ivf_flat_index(root, "embedding", spark, num_partitions=4)
    q = vecs[3].astype("f8")
    brute_all = np.argsort(((vecs.astype("f8") - q) ** 2).sum(axis=1))
    kill = [int(brute_all[0]), int(brute_all[2])]
    delete_rows(root, kill)  # v3: deletion-only drift
    eng = SqlEngine(spark, Catalog(tmp_path_str + "/whd"))
    eng.execute(
        f"CREATE TABLE nixd (id BIGINT, embedding ARRAY<FLOAT>) "
        f"WITH ('connector'='lance', 'path'='{root}', "
        f"'vector.nprobes'='4')"
    )
    qsql = ", ".join(f"{float(x)!r}" for x in q)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = eng.execute(
            f"SELECT * FROM vector_search('nixd', 'embedding', "
            f"ARRAY[{qsql}], 5, 'L2')"
        ).collect()
    assert not any("brute-force" in str(x.message) for x in w)
    expect = [int(i) for i in brute_all if int(i) not in kill][:5]
    assert [r["id"] for r in got] == expect


def test_fragment_drift_warns_and_brutes(spark, tmp_path_str):
    """INSERT appends a fragment: the fragment set drifts, the index
    warns stale and vector_search stays exact via brute force."""
    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.native_index import (
        build_ivf_flat_index,
    )

    root, vecs = _mk_dataset(tmp_path_str, "nixf")
    build_ivf_flat_index(root, "embedding", spark, num_partitions=4)
    eng = SqlEngine(spark, Catalog(tmp_path_str + "/whf"))
    eng.execute(
        f"CREATE TABLE nixf (id BIGINT, embedding ARRAY<FLOAT>) "
        f"WITH ('connector'='lance', 'path'='{root}')"
    )
    eng.execute(
        "INSERT INTO nixf VALUES (999, ARRAY[9.0, 9.0, 9.0, 9.0])"
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = eng.execute(
            "SELECT * FROM vector_search('nixf', 'embedding', "
            "ARRAY[9.0, 9.0, 9.0, 9.0], 1, 'L2')"
        ).collect()
    assert any("STALE" in str(x.message) for x in w)
    assert got[0]["id"] == 999  # brute sees the new row


def test_pq_payload_refuses_loudly_then_brutes(spark, tmp_path_str):
    """A payload carrying files outside the IVF_FLAT subset (a PQ
    codebook / library container) refuses with the feature named;
    vector_search warns WHY and stays exact."""
    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import (
        read_index_section,
    )
    from lance_flink_spark.sources.native_index import (
        build_ivf_flat_index,
        search_ivf_flat,
    )

    root, vecs = _mk_dataset(tmp_path_str, "nixp")
    uid = build_ivf_flat_index(
        root, "embedding", spark, num_partitions=4
    )
    with open(
        os.path.join(root, "_indices", uid, "auxiliary.idx"), "wb"
    ) as f:
        f.write(b"pq-codebook-bytes")
    meta = read_index_section(
        os.path.join(root, "_versions", "2.manifest")
    )[0]
    with pytest.raises(UnsupportedLanceFeature, match="auxiliary.idx"):
        search_ivf_flat(root, meta, vecs[0], 3, nprobes=4)
    eng = SqlEngine(spark, Catalog(tmp_path_str + "/whp"))
    eng.execute(
        f"CREATE TABLE nixp (id BIGINT, embedding ARRAY<FLOAT>) "
        f"WITH ('connector'='lance', 'path'='{root}')"
    )
    q = ", ".join(f"{float(x)!r}" for x in vecs[0])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = eng.execute(
            f"SELECT * FROM vector_search('nixp', 'embedding', "
            f"ARRAY[{q}], 1, 'L2')"
        ).collect()
    assert any("brute-force" in str(x.message) for x in w)
    assert got[0]["id"] == 0


def test_nprobes_limits_probed_partitions(spark, tmp_path_str):
    """nprobes=1 scans only the nearest centroid's list — results
    come solely from that partition (the locality the per-partition
    payload files exist for)."""
    from lance_flink_spark.sources.lance_native import (
        read_index_section,
    )
    from lance_flink_spark.sources.native_index import (
        build_ivf_flat_index,
        read_ivf_pb,
        search_ivf_flat,
    )

    root, vecs = _mk_dataset(tmp_path_str, "nixn", rows=128)
    uid = build_ivf_flat_index(
        root, "embedding", spark, num_partitions=8
    )
    meta = read_index_section(
        os.path.join(root, "_versions", "2.manifest")
    )[0]
    _c, _o, lens = read_ivf_pb(
        os.path.join(root, "_indices", uid, "ivf.pb"), 4
    )
    assert sum(lens) == 128
    q = vecs[10].astype("f8")
    hits = search_ivf_flat(root, meta, q, 200, nprobes=1)
    # one partition only: fewer rows than the dataset
    assert 0 < len(hits) < 128
    assert hits[0][0] == 10  # the query's own row still tops the list


def test_sql_create_native_payload_index(spark, tmp_path_str):
    """r15: CREATE INDEX ... WITH ('index.payload'='native') builds
    the manifest-registered `_indices` IVF_FLAT payload from SQL and
    vector_search serves from it; PQ payload build refuses."""
    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine

    root, vecs = _mk_dataset(tmp_path_str, "nsql")
    eng = SqlEngine(spark, Catalog(tmp_path_str + "/whs"))
    eng.execute(
        f"CREATE TABLE nsql (id BIGINT, embedding ARRAY<FLOAT>) "
        f"WITH ('connector'='lance', 'path'='{root}', "
        f"'vector.nprobes'='4')"
    )
    r = eng.execute(
        "CREATE INDEX ON nsql (embedding) USING IVF_FLAT "
        "WITH ('index.payload'='native', 'index.num-partitions'='4')"
    ).first()
    assert r["using"] == "IVF_FLAT_NATIVE" and r["version"] == 2
    assert os.path.exists(
        os.path.join(root, "_indices", r["uuid"], "ivf.pb")
    )
    q = vecs[7].astype("f8")
    qsql = ", ".join(f"{float(x)!r}" for x in q)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = eng.execute(
            f"SELECT * FROM vector_search('nsql', 'embedding', "
            f"ARRAY[{qsql}], 3, 'L2')"
        ).collect()
    assert not any("brute-force" in str(x.message) for x in w)
    assert got[0]["id"] == 7 and got[0]["distance"] == 0.0
    with pytest.raises(ValueError, match="IVF_FLAT only"):
        eng.execute(
            "CREATE INDEX ON nsql (embedding) USING IVF_PQ "
            "WITH ('index.payload'='native')"
        )


def test_fetch_prunes_to_hit_fragments(spark, tmp_path_str):
    """r15: the index-served row fetch decodes ONLY the fragments
    holding the hits — proven by corrupting every other fragment's
    data file; the search must still serve (a full-scan fetch would
    crash on the corrupted pages)."""
    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
    )
    from lance_flink_spark.sources.native_index import (
        build_ivf_flat_index,
    )

    root, vecs = _mk_dataset(tmp_path_str, "nixfp", rows=64, per_file=16)
    build_ivf_flat_index(root, "embedding", spark, num_partitions=4)
    q = vecs[3].astype("f8")  # row 3 lives in fragment 0
    brute = np.argsort(((vecs.astype("f8") - q) ** 2).sum(axis=1))[:2]
    _f, frags, _v = LanceNativeDataset(root)._manifest()
    hit_frag_ixs = {int(i) // 16 for i in brute}
    for ix, fr in enumerate(frags):
        if ix not in hit_frag_ixs:
            p = os.path.join(root, "data", fr.path)
            with open(p, "r+b") as f:
                f.write(b"\xff" * 64)  # clobber the data pages
    eng = SqlEngine(spark, Catalog(tmp_path_str + "/whfp"))
    eng.execute(
        f"CREATE TABLE nixfp (id BIGINT, embedding ARRAY<FLOAT>) "
        f"WITH ('connector'='lance', 'path'='{root}', "
        f"'vector.nprobes'='4')"
    )
    qsql = ", ".join(f"{float(x)!r}" for x in q)
    got = eng.execute(
        f"SELECT * FROM vector_search('nixfp', 'embedding', "
        f"ARRAY[{qsql}], 2, 'L2')"
    ).collect()
    assert [r["id"] for r in got] == [int(i) for i in brute]


def test_incremental_index_update_serves_appends(spark, tmp_path_str):
    """r15: update_ivf_flat_index assigns appended fragments' rows to
    the EXISTING centroids and extends the payload + IndexSection —
    vector_search serves again (no brute fallback) and equals brute
    force over the grown table at full probes."""
    import pyarrow as pa

    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        append_to_dataset,
        compact_dataset,
        read_index_section,
    )
    from lance_flink_spark.sources.native_index import (
        build_ivf_flat_index,
        update_ivf_flat_index,
    )

    root, vecs = _mk_dataset(tmp_path_str, "nixu")
    build_ivf_flat_index(root, "embedding", spark, num_partitions=4)  # v2
    extra = np.stack([vecs[3] + 0.01, vecs[9] + 0.01]).astype("f4")
    append_to_dataset(
        root,
        pa.table(
            {
                "id": pa.array([100, 101], pa.int64()),
                "embedding": pa.array(
                    [v for v in extra], pa.list_(pa.float32())
                ),
            }
        ),
    )  # v3: index stale by fragment drift
    v = update_ivf_flat_index(root, "embedding", spark)
    assert v == 4
    meta = read_index_section(
        os.path.join(root, "_versions", "4.manifest")
    )[0]
    assert meta.dataset_version == 4
    all_vecs = np.concatenate([vecs.astype("f8"), extra.astype("f8")])
    ids = list(range(64)) + [100, 101]
    q = vecs[3].astype("f8")
    brute = np.argsort(((all_vecs - q) ** 2).sum(axis=1))[:4]
    eng = SqlEngine(spark, Catalog(tmp_path_str + "/whu"))
    eng.execute(
        f"CREATE TABLE nixu (id BIGINT, embedding ARRAY<FLOAT>) "
        f"WITH ('connector'='lance', 'path'='{root}', "
        f"'vector.nprobes'='4')"
    )
    qsql = ", ".join(f"{float(x)!r}" for x in q)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = eng.execute(
            f"SELECT * FROM vector_search('nixu', 'embedding', "
            f"ARRAY[{qsql}], 4, 'L2')"
        ).collect()
    assert not any("brute-force" in str(x.message) for x in w)
    assert [r["id"] for r in got] == [ids[i] for i in brute]
    # idempotent: nothing new → same version, no commit
    assert update_ivf_flat_index(root, "embedding", spark) == 4
    # replaced fragments (compaction) refuse with a rebuild hint
    compact_dataset(root)
    with pytest.raises(UnsupportedLanceFeature, match="rebuild"):
        update_ivf_flat_index(root, "embedding", spark)


def test_sql_optimize_indexes(spark, tmp_path_str):
    """r15: OPTIMIZE t INDEXES folds appended fragments into every
    registered index from SQL — serving resumes without a rebuild."""
    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine

    root, vecs = _mk_dataset(tmp_path_str, "nopt")
    eng = SqlEngine(spark, Catalog(tmp_path_str + "/who"))
    eng.execute(
        f"CREATE TABLE nopt (id BIGINT, embedding ARRAY<FLOAT>) "
        f"WITH ('connector'='lance', 'path'='{root}', "
        f"'vector.nprobes'='4')"
    )
    eng.execute(
        "CREATE INDEX ON nopt (embedding) USING IVF_FLAT "
        "WITH ('index.payload'='native', 'index.num-partitions'='4')"
    )
    eng.execute(
        "INSERT INTO nopt VALUES (500, ARRAY[9.0, 9.0, 9.0, 9.0])"
    )
    eng.execute("OPTIMIZE nopt INDEXES")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = eng.execute(
            "SELECT * FROM vector_search('nopt', 'embedding', "
            "ARRAY[9.0, 9.0, 9.0, 9.0], 1, 'L2')"
        ).collect()
    assert not any("brute-force" in str(x.message) for x in w)
    assert got[0]["id"] == 500  # the appended row serves FROM the index
