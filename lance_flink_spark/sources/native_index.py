"""IVF_FLAT payloads under ``_indices/{uuid}/`` — build, decode, search.

Round 14 gave the native reader MANIFEST-level index awareness (the
IndexSection of the public table.proto); this module closes the
no-codebook case: an IVF_FLAT index whose payload we can write AND
serve, so ``vector_search`` on a native table routes through the
manifest-registered index instead of brute-forcing. Reference anchor:
LanceIndexBuilder.java:40-95 builds IVF_FLAT/IVF_PQ/IVF_HNSW_PQ
through com.lancedb.lance's IndexParams and the library persists the
payload under ``_indices/{uuid}/``; vector search then serves from it
(LanceVectorSearch.java).

Payload subset (documented deviation, same spirit as the r14
IndexSection fixtures):

- ``_indices/{uuid}/ivf.pb`` — the public index.proto ``IVF`` message
  serialized STANDALONE: field 1 = packed float32 centroids
  (flattened num_partitions x dim), field 2 = packed uint64 offsets
  (each partition's start row in concatenated partition order),
  field 3 = packed uint32 lengths. The library embeds this message
  inside its index container file, whose framing is
  library-version-specific — the MESSAGE layout here is spec-true,
  the container is not reproduced.
- ``_indices/{uuid}/part_{i}.idx`` — one 'Lance File 2.0' data file
  per NON-EMPTY partition (this repo's own codec) with columns
  ``__row_id int64`` (global physical offset, Lance's row-address
  model: deletion masks apply at query time) and
  ``__vector list<float>``. One file per partition is the byte-range
  locality the library gets from its in-container partition offsets:
  probing nprobes lists reads ONLY those partitions' bytes — at
  100 TB a search touches nprobes/num_partitions of the index, never
  the whole payload.

Anything else — a PQ codebook, an HNSW graph, a container file this
subset didn't write — refuses with :class:`UnsupportedLanceFeature`
naming the feature. Exactness gate: at nprobes == num_partitions the
index-served top-k EQUALS brute force (no quantization in IVF_FLAT).
"""

from __future__ import annotations

import os
import struct
import uuid as uuid_mod

import numpy as np
import pandas as pd

from lance_flink_spark.sources.lance_native import (
    LanceIndexMeta,
    LanceNativeDataset,
    UnsupportedLanceFeature,
    _enc_packed,
    _fields,
    _packed,
    _write_manifest,
    _schema_fields_of_existing,
    read_deletion_file,
    read_distributed,
    read_fragment_table,
    read_index_section,
    write_fragment_file,
    write_index_section,
)

_DETAILS_TYPE = "lance.table.VectorIndexDetails"


def _enc_packed_fixed(field: int, values, fmt: str) -> bytes:
    """Protobuf packed repeated fixed-width scalars (float/double) —
    wire type 2 length-delimited payload of little-endian values."""
    body = b"".join(struct.pack(fmt, v) for v in values)
    key = (field << 3) | 2
    out = b""
    k = key
    while True:
        b7 = k & 0x7F
        k >>= 7
        out += bytes([b7 | (0x80 if k else 0)])
        if not k:
            break
    n = len(body)
    while True:
        b7 = n & 0x7F
        n >>= 7
        out += bytes([b7 | (0x80 if n else 0)])
        if not n:
            break
    return out + body


def write_ivf_pb(
    path: str,
    centroids: np.ndarray,
    offsets: list[int],
    lengths: list[int],
) -> None:
    """Serialize the index.proto ``IVF`` message subset: centroids=1
    (packed float, flattened row-major), offsets=2 (packed uint64),
    lengths=3 (packed uint32)."""
    body = _enc_packed_fixed(1, centroids.ravel().astype("<f4"), "<f")
    body += _enc_packed(2, [int(o) for o in offsets])
    body += _enc_packed(3, [int(x) for x in lengths])
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(body)
    os.replace(tmp, path)


def read_ivf_pb(path: str, dim: int):
    """Decode the IVF message → (centroids [P, dim], offsets,
    lengths). The dimension comes from the indexed column (the
    flattened centroid field carries no shape)."""
    raw = open(path, "rb").read()
    cents = np.array([], dtype="f4")
    offsets: list[int] = []
    lengths: list[int] = []
    for f, wt, v in _fields(raw):
        if f == 1 and wt == 2:
            cents = np.frombuffer(v, dtype="<f4")
        elif f == 2:
            offsets = _packed(v) if wt == 2 else offsets + [v]
        elif f == 3:
            lengths = _packed(v) if wt == 2 else lengths + [v]
    if len(cents) == 0 or dim <= 0 or len(cents) % dim:
        raise UnsupportedLanceFeature(
            f"{path}: centroid payload of {len(cents)} floats does not "
            f"factor into dimension {dim}"
        )
    c = cents.reshape(-1, dim).astype("f8")
    if len(offsets) != len(c) or len(lengths) != len(c):
        raise UnsupportedLanceFeature(
            f"{path}: {len(c)} centroids but {len(offsets)} offsets / "
            f"{len(lengths)} lengths"
        )
    return c, offsets, lengths


def _index_dir(root: str, uid: str) -> str:
    return os.path.join(root, "_indices", uid)


_PART_FIELDS = None


def _part_schema():
    """The LanceField list every part_{i}.idx encodes/decodes with."""
    global _PART_FIELDS
    if _PART_FIELDS is None:
        import pyarrow as pa

        from lance_flink_spark.sources.lance_native import _schema_fields_of

        fields, _blob = _schema_fields_of(
            pa,
            pa.schema(
                [
                    ("__row_id", pa.int64()),
                    ("__vector", pa.list_(pa.float32())),
                ]
            ),
        )
        _PART_FIELDS = fields
    return _PART_FIELDS


def build_ivf_flat_index(
    root: str,
    column: str,
    spark,
    *,
    num_partitions: int = 16,
    metric: str = "l2",
    sample_size: int = 262_144,
    seed: int = 42,
) -> str:
    """Build an IVF_FLAT index over a native dataset's vector column
    and REGISTER it in the manifest (new version + IndexSection entry,
    the same commit shape Lance's create_index performs). Centroids
    train on a bounded sample (k-means, the same trainer the sidecar
    indexes use); every LIVE row is then assigned to its nearest
    centroid by an Arrow-batched pandas stage and each partition's
    (row_id, vector) rows land in ONE part file written by ONE task
    (hash repartition on the partition id — the executor-parallel
    write path, no row moves through the driver). Returns the index
    uuid. Cite: LanceIndexBuilder.java:40-95 (IVF_FLAT via
    IvfBuildParams; library persists + registers the payload)."""
    from pyspark.sql import functions as F

    from lance_flink_spark.index.ivf import _kmeans
    from lance_flink_spark.session import ship_package

    ship_package(spark)
    ds = LanceNativeDataset(root)
    fields, frags, version = ds._manifest()
    fld = next((f for f in fields if f.name == column), None)
    if fld is None or fld.logical != "list":
        raise ValueError(
            f"{root}: column {column!r} is not a list-typed vector "
            "column"
        )
    df = read_distributed(ds, spark, with_offsets=True, columns=[column])
    sample = np.stack(
        [
            np.asarray(r[column], dtype="f8")
            for r in df.select(column).limit(sample_size).collect()
        ]
    )
    dim = sample.shape[1]
    cents = _kmeans(sample, min(num_partitions, len(sample)), seed=seed)
    P = len(cents)
    cb = spark.sparkContext.broadcast(cents)

    @F.pandas_udf("int")
    def _assign(v: pd.Series) -> pd.Series:
        x = np.stack(v.to_numpy()).astype("f8")
        c = cb.value
        # argmin over squared L2 — cosine/dot route through the same
        # coarse L2 partitions (Lance trains IVF centroids once; the
        # metric applies at scan time)
        d = (
            (x * x).sum(axis=1)[:, None]
            - 2.0 * (x @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        return pd.Series(np.argmin(d, axis=1).astype("int32"))

    uid = uuid_mod.uuid4().hex
    idir = _index_dir(root, uid)
    os.makedirs(idir, exist_ok=True)

    def _write(batches):
        import pyarrow as pa

        acc: dict[int, list] = {}
        for pdf in batches:
            for pi, grp in pdf.groupby("__part"):
                acc.setdefault(int(pi), []).append(grp)
        if not acc:
            return
        out = {"part": [], "rows": []}
        for pi in sorted(acc):
            g = pd.concat(acc[pi], ignore_index=True)
            t = pa.table(
                {
                    "__row_id": pa.array(
                        g["__phys"].astype("int64"), pa.int64()
                    ),
                    "__vector": pa.array(
                        [np.asarray(v, dtype="f4") for v in g[column]],
                        pa.list_(pa.float32()),
                    ),
                }
            )
            write_fragment_file(
                os.path.join(idir, f"part_{pi}.idx"), t
            )
            out["part"].append(pi)
            out["rows"].append(len(g))
        yield pd.DataFrame(out)

    plates = (
        df.withColumn("__part", _assign(F.col(column)))
        .repartition(P, "__part")
        .mapInPandas(_write, "part long, rows long")
        .collect()
    )
    lengths = [0] * P
    for p in plates:
        lengths[int(p["part"])] = int(p["rows"])
    offsets, run = [], 0
    for n in lengths:
        offsets.append(run)
        run += n
    write_ivf_pb(os.path.join(idir, "ivf.pb"), cents, offsets, lengths)
    # register: new manifest version carrying the IndexSection entry
    # (prior entries preserved) — Lance's create_index commit shape
    prior = read_index_section(
        os.path.join(root, "_versions", f"{version}.manifest")
    )
    prior = [m for m in prior if m.field_ids != [fld.fid]]
    meta = LanceIndexMeta(
        uuid=uid,
        name=f"{column}_idx",
        field_ids=[fld.fid],
        dataset_version=version + 1,
        fragment_ids=sorted(fr.frag_id for fr in frags),
        details_type=_DETAILS_TYPE,
    )
    _write_manifest(
        root, version + 1, _schema_fields_of_existing(fields), frags
    )
    write_index_section(root, version + 1, prior + [meta])
    return uid


def _require_ivf_flat_payload(root: str, meta: LanceIndexMeta) -> str:
    """The payload directory must hold exactly this subset's IVF_FLAT
    shape — a PQ codebook, HNSW graph, or library container refuses
    with the feature named (vector_search falls back to brute force
    and says WHY)."""
    idir = _index_dir(root, meta.uuid)
    if not os.path.isdir(idir):
        raise UnsupportedLanceFeature(
            f"index {meta.name!r} ({meta.uuid}): no payload directory "
            f"{idir}"
        )
    names = set(os.listdir(idir))
    if "ivf.pb" not in names:
        raise UnsupportedLanceFeature(
            f"index {meta.name!r}: payload carries no ivf.pb — a "
            "library-written container (index.idx/auxiliary.idx) is "
            "outside the subset"
        )
    foreign = [
        n
        for n in names
        if n != "ivf.pb"
        and not (n.startswith("part_") and n.endswith(".idx"))
    ]
    if foreign:
        raise UnsupportedLanceFeature(
            f"index {meta.name!r}: payload files {sorted(foreign)} are "
            "outside the IVF_FLAT subset (PQ codebooks / HNSW graphs "
            "refuse loudly)"
        )
    return idir


def search_ivf_flat(
    root: str,
    meta: LanceIndexMeta,
    query,
    k: int,
    *,
    nprobes: int = 8,
    metric: str = "l2",
):
    """Serve one query from a manifest-registered IVF_FLAT payload:
    rank centroids by L2 to the query, decode ONLY the nprobes nearest
    partitions' part files, exact-score their rows under ``metric``
    and return the top-k [(row_id, score)] — score ascending for l2
    (distance), descending for cosine/dot (similarity). At
    nprobes == num_partitions this is EXACTLY brute force. Deleted
    rows are the CALLER's mask (Lance's model: the index stores row
    addresses; deletion vectors apply at query time)."""
    q = np.asarray(query, dtype="f8")
    cents, offsets, lengths = read_ivf_pb(
        os.path.join(_require_ivf_flat_payload(root, meta), "ivf.pb"),
        len(q),
    )
    order = np.argsort(((cents - q[None, :]) ** 2).sum(axis=1))
    probe = [int(p) for p in order[: max(1, nprobes)] if lengths[p] > 0]
    idir = _index_dir(root, meta.uuid)
    ids, scores = [], []
    for pi in probe:
        t = read_fragment_table(
            os.path.join(idir, f"part_{pi}.idx"), _part_schema(), None
        )
        rid = t.column("__row_id").to_numpy(zero_copy_only=False)
        x = np.stack(
            t.column("__vector").to_pylist()
        ).astype("f8")
        if metric == "l2":
            s = ((x - q[None, :]) ** 2).sum(axis=1)
        elif metric == "cosine":
            s = (x @ q) / (
                np.linalg.norm(x, axis=1) * np.linalg.norm(q) + 1e-30
            )
        elif metric == "dot":
            s = x @ q
        else:
            raise ValueError(f"metric {metric!r} (l2|cosine|dot)")
        ids.append(rid)
        scores.append(s)
    if not ids:
        return []
    rid = np.concatenate(ids)
    s = np.concatenate(scores)
    asc = metric == "l2"
    top = np.argsort(s if asc else -s, kind="stable")[:k]
    return [(int(rid[i]), float(s[i])) for i in top]


def dead_offsets(root: str, version: int | None = None) -> np.ndarray:
    """All deleted GLOBAL physical offsets at ``version`` — the query-
    time mask for index-served search (index rows are addresses into
    the fragment order at build time)."""
    ds = LanceNativeDataset(root)
    _f, frags, _v = ds._manifest(version)
    out, base = [], 0
    for fr in frags:
        if fr.deletion is not None:
            out.append(read_deletion_file(root, fr) + base)
        base += fr.physical_rows
    return (
        np.concatenate(out) if out else np.array([], dtype="int64")
    )


def update_ivf_flat_index(root: str, column: str, spark) -> int:
    """Incremental index maintenance — Lance's ``optimize_indices``
    shape: rows of fragments APPENDED since the index build are
    assigned to the EXISTING centroids (no retrain) and appended to
    their partitions' payload files; the manifest gains a version
    whose IndexSection covers the new fragments, so ``vector_search``
    keeps serving through appends instead of falling back to brute
    force. Work ∝ new-fragment bytes + touched partition files —
    never the whole index: each task merges one partition's file.
    Refuses when no index exists on ``column`` or when covered
    fragments were REPLACED (compaction/overwrite re-addresses rows —
    rebuild with build_ivf_flat_index). Returns the new manifest
    version."""
    from pyspark.sql import functions as F

    from lance_flink_spark.session import ship_package

    ship_package(spark)
    ds = LanceNativeDataset(root)
    fields, frags, version = ds._manifest()
    fld = next((f for f in fields if f.name == column), None)
    if fld is None:
        raise ValueError(f"{root}: no column {column!r}")
    mpath = os.path.join(root, "_versions", f"{version}.manifest")
    metas = read_index_section(mpath)
    mine = [m for m in metas if fld.fid in m.field_ids]
    if not mine:
        raise ValueError(
            f"{root}: no registered index on {column!r} — build one "
            "with build_ivf_flat_index"
        )
    meta = mine[-1]
    covered = set(meta.fragment_ids or [])
    current = {fr.frag_id for fr in frags}
    if not covered <= current:
        raise UnsupportedLanceFeature(
            f"index {meta.name!r}: covered fragments "
            f"{sorted(covered - current)} were replaced "
            "(compaction/overwrite re-addresses rows) — rebuild with "
            "build_ivf_flat_index"
        )
    new_ixs = [
        ix for ix, fr in enumerate(frags) if fr.frag_id not in covered
    ]
    idir = _require_ivf_flat_payload(root, meta)
    dim_probe = 1  # resolved from centroids below
    raw = open(os.path.join(idir, "ivf.pb"), "rb").read()
    # dimension from the flattened centroid count and any part file is
    # ambiguous; derive from the column's first live vector instead
    if not new_ixs:
        return version  # nothing new: index already covers the table
    df = read_distributed(
        ds, spark, with_offsets=True, columns=[column],
        frag_indices=new_ixs,
    )
    first = df.select(column).first()
    if first is None:
        return version  # appended fragments hold no live rows
    dim_probe = len(first[0])
    cents, offsets, lengths = read_ivf_pb(
        os.path.join(idir, "ivf.pb"), dim_probe
    )
    P = len(cents)
    cb = spark.sparkContext.broadcast(cents)

    @F.pandas_udf("int")
    def _assign(v: pd.Series) -> pd.Series:
        x = np.stack(v.to_numpy()).astype("f8")
        c = cb.value
        d = (
            (x * x).sum(axis=1)[:, None]
            - 2.0 * (x @ c.T)
            + (c * c).sum(axis=1)[None, :]
        )
        return pd.Series(np.argmin(d, axis=1).astype("int32"))

    def _merge(batches):
        import pyarrow as pa

        acc: dict[int, list] = {}
        for pdf in batches:
            for pi, grp in pdf.groupby("__part"):
                acc.setdefault(int(pi), []).append(grp)
        if not acc:
            return
        out = {"part": [], "added": []}
        for pi in sorted(acc):
            g = pd.concat(acc[pi], ignore_index=True)
            add = pa.table(
                {
                    "__row_id": pa.array(
                        g["__phys"].astype("int64"), pa.int64()
                    ),
                    "__vector": pa.array(
                        [np.asarray(v, dtype="f4") for v in g[column]],
                        pa.list_(pa.float32()),
                    ),
                }
            )
            ppath = os.path.join(idir, f"part_{pi}.idx")
            if os.path.exists(ppath):
                old = read_fragment_table(ppath, _part_schema(), None)
                # the decoder serves large_list/large_string for
                # varlen columns; conform the fresh rows to it
                add = pa.concat_tables(
                    [old, add.cast(old.schema)]
                ).combine_chunks()
            write_fragment_file(ppath, add)
            out["part"].append(pi)
            out["added"].append(len(g))
        yield pd.DataFrame(out)

    plates = (
        df.withColumn("__part", _assign(F.col(column)))
        .repartition(P, "__part")
        .mapInPandas(_merge, "part long, added long")
        .collect()
    )
    for p in plates:
        lengths[int(p["part"])] += int(p["added"])
    offsets, run = [], 0
    for n in lengths:
        offsets.append(run)
        run += n
    write_ivf_pb(os.path.join(idir, "ivf.pb"), cents, offsets, lengths)
    from lance_flink_spark.sources.lance_native import (
        _write_manifest as _wm,
    )

    meta2 = LanceIndexMeta(
        uuid=meta.uuid,
        name=meta.name,
        field_ids=list(meta.field_ids),
        dataset_version=version + 1,
        fragment_ids=sorted(fr.frag_id for fr in frags),
        details_type=meta.details_type,
    )
    others = [m for m in metas if m is not meta]
    _wm(root, version + 1, _schema_fields_of_existing(fields), frags)
    write_index_section(root, version + 1, others + [meta2])
    return version + 1
