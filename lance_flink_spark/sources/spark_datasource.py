"""Native Lance as a first-class Spark V2 data source (Python
DataSource API, Spark 4.x) — ``spark.read.format("lance_native")`` /
``df.write.format("lance_native")`` / ``writeStream``.

This is the Spark-idiomatic packaging of the reference connector's
whole surface: LanceInputFormat's one-split-per-fragment read model
becomes ``partitions()`` (one ``InputPartition`` per fragment, deletion
masks applied in-task), LanceSink.java:60-108's task-write/
coordinator-commit becomes ``DataSourceArrowWriter.write`` (executors
emit 'Lance File 2.0' fragment files) + ``commit`` (the driver writes
one manifest version), and the checkpointed streaming sink becomes
``DataSourceStreamArrowWriter`` with batchId-keyed idempotent commits
(exactly-once across restarts, the Flink checkpoint-commit contract).

Catalyst integration the mapInPandas path cannot offer:

- **Filter pushdown** (``pushFilters``, Spark 4.1): simple
  single-column comparisons are applied EXACTLY inside each fragment
  task via pyarrow.compute, so only matching rows cross the
  task→JVM Arrow boundary; everything else is returned to Spark for
  post-scan evaluation.
- **Column projection** via the ``columns`` read option: pruned
  columns' pages are never decoded (``read_fragment_table(columns=)``).

Everything decodes/encodes through ``sources/lance_native.py`` — the
same documented format subset, the same loud refusals. Timestamps
without a timezone surface as TIMESTAMP_NTZ (the format stores a wall
clock; the session-tz reinterpretation the Arrow bridge does is
exactly the ambiguity NTZ exists to avoid).
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualNullSafe,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql import types as T


def _dataset(root: str):
    from lance_flink_spark.sources.lance_native import LanceNativeDataset

    return LanceNativeDataset(root)


def _downcast_arrow_schema(fields):
    """The plain (non-large) arrow schema read() serves Spark."""
    import pyarrow as pa

    from lance_flink_spark.sources.lance_native import arrow_schema_of

    def down(tp):
        if pa.types.is_large_string(tp):
            return pa.string()
        if pa.types.is_large_binary(tp):
            return pa.binary()
        if pa.types.is_large_list(tp):
            return pa.list_(down(tp.value_type))
        if pa.types.is_struct(tp):
            return pa.struct([pa.field(f.name, down(f.type)) for f in tp])
        return tp

    base = arrow_schema_of(fields)
    return pa.schema([pa.field(f.name, down(f.type)) for f in base])


@dataclass
class LanceFragmentPartition(InputPartition):
    frag_path: str
    base: int


class LanceNativeDataSource(DataSource):
    """``format("lance_native")``. Options: ``path`` (dataset root,
    required), ``version`` (time travel), ``columns`` (comma-separated
    projection — Catalyst's own pruning can't reach inside a Python
    data source, so the knob is explicit like the reference's
    LanceOptions projection)."""

    @classmethod
    def name(cls) -> str:
        return "lance_native"

    def _root(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("lance_native requires a 'path' option")
        return path

    def _changes(self) -> bool:
        return str(self.options.get("readChanges", "")).lower() == "true"

    def schema(self):
        import pyarrow as pa

        from pyspark.sql.pandas.types import from_arrow_schema

        nds = _dataset(self._root())
        v = self.options.get("version")
        fields, _frags, _v = nds._manifest(int(v) if v is not None else None)
        arrow = _downcast_arrow_schema(fields)
        if self._changes():
            if self.options.get("columns"):
                raise ValueError(
                    "readChanges does not compose with 'columns' — the "
                    "changelog always carries the full row image"
                )
            return from_arrow_schema(
                arrow.append(pa.field("_change_type", pa.string())).append(
                    pa.field("_commit_version", pa.int64())
                )
            )
        cols = self.options.get("columns")
        if cols:
            want = [c.strip() for c in cols.split(",") if c.strip()]
            unknown = set(want) - set(arrow.names)
            if unknown:
                raise ValueError(
                    f"columns {sorted(unknown)} not in schema {arrow.names}"
                )
            import pyarrow as pa

            arrow = pa.schema([arrow.field(n) for n in want])
        return from_arrow_schema(arrow)

    def reader(self, schema: T.StructType) -> "LanceNativeReader":
        return LanceNativeReader(self._root(), self.options)

    def writer(self, schema: T.StructType, overwrite: bool) -> "LanceNativeWriter":
        return LanceNativeWriter(self._root(), schema, overwrite)

    def streamWriter(self, schema: T.StructType, overwrite: bool):
        return LanceNativeStreamWriter(self._root(), schema)

    def streamReader(self, schema: T.StructType):
        if self._changes():
            return LanceNativeChangesStreamReader(self._root(), self.options)
        return LanceNativeStreamReader(self._root(), self.options)


# supported exactly in-task; everything else returns to Spark
_SIMPLE_FILTERS = (
    EqualTo,
    EqualNullSafe,
    GreaterThan,
    GreaterThanOrEqual,
    LessThan,
    LessThanOrEqual,
    In,
    IsNull,
    IsNotNull,
)


def _apply_filter(pc, pa, table, f):
    col = table.column(f.attribute[0])
    if isinstance(f, EqualNullSafe):
        if f.value is None:
            return pc.is_null(col)  # x <=> NULL is exactly IS NULL
        return pc.fill_null(pc.equal(col, f.value), False)
    if isinstance(f, EqualTo):
        return pc.equal(col, f.value)
    if isinstance(f, GreaterThan):
        return pc.greater(col, f.value)
    if isinstance(f, GreaterThanOrEqual):
        return pc.greater_equal(col, f.value)
    if isinstance(f, LessThan):
        return pc.less(col, f.value)
    if isinstance(f, LessThanOrEqual):
        return pc.less_equal(col, f.value)
    if isinstance(f, In):
        # SQL IN is never TRUE for a NULL probe — a NULL in the value
        # set must not make pc.is_in match the column's nulls
        vals = [v for v in f.value if v is not None]
        return pc.fill_null(
            pc.is_in(col, value_set=pa.array(vals, type=col.type)), False
        )
    if isinstance(f, IsNull):
        return pc.is_null(col)
    if isinstance(f, IsNotNull):
        return pc.is_valid(col)
    raise AssertionError(f"unsupported filter slipped through: {f}")


class LanceNativeReader(DataSourceReader):
    def __init__(self, root: str, options):
        self.root = root
        v = options.get("version")
        # pin the snapshot at PLAN time: tasks run later, and a commit
        # landing in between must not change which manifest (fragment
        # set + deletion files) this query reads
        self.version = (
            int(v) if v is not None else _dataset(root).versions()[-1]
        )
        cols = options.get("columns")
        self.columns = (
            [c.strip() for c in cols.split(",") if c.strip()] if cols else None
        )
        self.filters: list = []

    def pushFilters(self, filters):
        rest = []
        cols = set(self.columns or ())
        for f in filters:
            ok = (
                isinstance(f, _SIMPLE_FILTERS)
                and len(f.attribute) == 1
                # with an explicit projection, only filter on projected
                # columns (the pruned ones aren't decoded)
                and (not cols or f.attribute[0] in cols)
            )
            if ok:
                self.filters.append(f)
            else:
                rest.append(f)
        return rest

    def partitions(self):
        nds = _dataset(self.root)
        _fields, frags, _v = nds._manifest(self.version)
        out, base = [], 0
        for fr in frags:
            out.append(LanceFragmentPartition(fr.path, base))
            base += fr.physical_rows
        return out

    def read(self, partition: LanceFragmentPartition):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        from lance_flink_spark.sources.lance_native import (
            read_deletion_file,
            read_fragment_table,
        )

        nds = _dataset(self.root)
        fields, frags, _v = nds._manifest(self.version)
        fr = next(f for f in frags if f.path == partition.frag_path)
        t = read_fragment_table(
            os.path.join(self.root, "data", fr.path),
            fields,
            fr,
            columns=self.columns,
        )
        if fr.deletion is not None:
            dead = read_deletion_file(self.root, fr)
            t = t.take(np.setdiff1d(np.arange(t.num_rows, dtype="int64"), dead))
        want = _downcast_arrow_schema(fields)
        if self.columns is not None:
            want = pa.schema([want.field(n) for n in self.columns])
        t = t.cast(want)
        for f in self.filters:
            t = t.filter(_apply_filter(pc, pa, t, f))
        yield from t.to_batches()


@dataclass
class LanceWriteCommit(WriterCommitMessage):
    plates: list  # [(task_sort_key, fragment file name, rows)]


def _target_arrow_schema(root: str, spark_schema: T.StructType):
    """(existing LanceFields|None, physical arrow schema to write).
    Appends conform to the EXISTING manifest (field ids preserved);
    fresh datasets derive fields from the Spark schema."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    from lance_flink_spark.sources.lance_native import (
        _schema_fields_of,
        arrow_schema_of,
    )

    if os.path.isdir(os.path.join(root, "_versions")):
        nds = _dataset(root)
        fields, _frags, _v = nds._manifest()
        return fields, arrow_schema_of(fields)
    fields, _blob = _schema_fields_of(pa, to_arrow_schema(spark_schema))
    return None, arrow_schema_of(fields)


def _write_task_fragments(
    root: str, target, it, max_rows: int = 1 << 20, max_bytes: int = 192 * 1024 * 1024
) -> list:
    """Executor side: stream Arrow batches into gate-sized fragment
    files (uuid names — retry-orphan-safe); returns (seq, name, rows)
    plates. Shared by the batch and streaming writers."""
    import pyarrow as pa

    from pyspark import TaskContext

    from lance_flink_spark.sources.lance_native import write_fragment_file

    data_dir = os.path.join(root, "data")
    os.makedirs(data_dir, exist_ok=True)
    part = TaskContext.get().partitionId() if TaskContext.get() else 0
    plates, buf, rows, nbytes, seq = [], [], 0, 0, 0

    def flush():
        nonlocal buf, rows, nbytes, seq
        t = pa.Table.from_batches(buf).cast(target)
        # split by BYTES too: one byte-heavy input batch (binary
        # media rows) must not emit a fragment past the reader's
        # per-fragment decode gate
        step = max_rows
        if t.nbytes > max_bytes and t.num_rows > 1:
            step = min(step, max(1, int(t.num_rows * max_bytes / t.nbytes)))
        for lo in range(0, t.num_rows, step):
            chunk = t.slice(lo, step)
            name = f"{uuid.uuid4()}.lance"
            write_fragment_file(os.path.join(data_dir, name), chunk)
            plates.append(((part, seq), name, chunk.num_rows))
            seq += 1
        buf, rows, nbytes = [], 0, 0

    for b in it:
        if b.num_rows == 0:
            continue
        buf.append(b)
        rows += b.num_rows
        nbytes += b.nbytes
        if rows >= max_rows or nbytes >= max_bytes:
            flush()
    if rows:
        flush()
    return plates


def _commit_fragments(
    root: str,
    spark_schema: T.StructType,
    messages,
    *,
    replace: bool,
    written_target=None,
) -> int:
    """Driver side: order the tasks' plates deterministically, assign
    fragment ids, write ONE new manifest version (or version 1).
    ``written_target`` is the physical arrow schema the task-side cast
    conformed the fragment files to — a manifest whose schema no
    longer matches it (concurrent ALTER TABLE, or a concurrent
    creator with a different layout) must refuse, not mis-plate."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_schema

    from lance_flink_spark.sources.lance_native import (
        LanceFragment,
        _carry_index_section,
        _column_indices_of,
        _depth_first_ids,
        _norm_signature,
        _schema_fields_of,
        _schema_fields_of_existing,
        _schema_signature,
        _write_manifest,
        write_fragment_file,
        arrow_schema_of,
    )

    from lance_flink_spark.sources.lance_native import NativeCommitConflict

    plates = sorted(
        (p for m in messages if m is not None for p in m.plates),
        key=lambda p: p[0],
    )
    written_sig = (
        _norm_signature(
            _schema_signature(_schema_fields_of(pa, written_target)[0])
        )
        if written_target is not None
        else None
    )
    # appends commute and an overwrite replaces whatever is latest, so
    # BOTH modes retry a lost commit race onto the fresh snapshot
    # (Lance's retry rule); only the version 1 bootstrap is exclusive
    for _attempt in range(5):
        exists = os.path.isdir(os.path.join(root, "_versions"))
        if exists:
            nds = _dataset(root)
            fields, frags, version = nds._manifest()
            if written_sig is not None and written_sig != _norm_signature(
                _schema_signature(fields)
            ):
                raise NativeCommitConflict(
                    f"{root}: dataset schema changed between write and "
                    "commit (fragment files hold the old column layout) "
                    "— retry the write"
                )
            fields_blob = _schema_fields_of_existing(fields)
        else:
            fields, fields_blob = _schema_fields_of(
                pa, to_arrow_schema(spark_schema)
            )
            frags, version = [], 0
        if replace:
            frags = []  # lance overwrite: a new version with only new fragments
        expected_ids = _depth_first_ids(fields)
        col_ix = _column_indices_of(fields)
        start = max((fr.frag_id for fr in frags), default=-1) + 1
        new = []
        for i, (_k, name, rows) in enumerate(plates):
            new.append(
                LanceFragment(
                    path=name,
                    frag_id=start + i,
                    field_ids=list(expected_ids),
                    column_indices=list(col_ix),
                    physical_rows=rows,
                )
            )
        if not frags and not new:
            name = f"{uuid.uuid4()}.lance"
            os.makedirs(os.path.join(root, "data"), exist_ok=True)
            write_fragment_file(
                os.path.join(root, "data", name),
                arrow_schema_of(fields).empty_table(),
            )
            new = [
                LanceFragment(
                    path=name,
                    frag_id=start,
                    field_ids=list(expected_ids),
                    column_indices=list(col_ix),
                    physical_rows=0,
                )
            ]
        try:
            _write_manifest(root, version + 1, fields_blob, frags + new)
        except NativeCommitConflict:
            if not exists:
                raise  # two writers both creating the dataset: exclusive
            continue
        if exists:
            _carry_index_section(root, version, version + 1)
        return version + 1
    raise NativeCommitConflict(
        f"{root}: write lost the commit race 5 times — retry later"
    )


def _abort_fragments(root: str, messages) -> None:
    for m in messages or ():
        if m is None:
            continue
        for _k, name, _rows in m.plates:
            try:
                os.remove(os.path.join(root, "data", name))
            except OSError:
                pass


class LanceNativeWriter(DataSourceArrowWriter):
    """Batch writer: mode('append') adds fragments to the existing
    dataset (or creates it); mode('overwrite') commits a version whose
    fragment set is only the new files — old versions stay
    time-travelable, Lance's overwrite semantics."""

    def __init__(self, root: str, schema: T.StructType, overwrite: bool):
        self.root = root
        self.schema = schema
        self.overwrite = overwrite
        _fields, self.target = _target_arrow_schema(root, schema)

    def write(self, iterator):
        return LanceWriteCommit(
            _write_task_fragments(self.root, self.target, iterator)
        )

    def commit(self, messages):
        _commit_fragments(
            self.root,
            self.schema,
            messages,
            replace=self.overwrite,
            written_target=self.target,
        )

    def abort(self, messages):
        _abort_fragments(self.root, messages)


class LanceNativeStreamWriter(DataSourceStreamArrowWriter):
    """Streaming sink with EXACTLY-ONCE manifest commits: each
    micro-batch appends one manifest version, and a sidecar
    ``_streaming_commits/<batchId>`` marker makes replayed batches
    (post-crash restarts) no-ops — LanceSink's checkpoint-commit
    contract."""

    def __init__(self, root: str, schema: T.StructType):
        self.root = root
        self.schema = schema
        _fields, self.target = _target_arrow_schema(root, schema)

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.root, "_streaming_commits", str(batch_id))

    def write(self, iterator):
        return LanceWriteCommit(
            _write_task_fragments(self.root, self.target, iterator)
        )

    def commit(self, messages, batchId: int) -> None:
        if os.path.exists(self._marker(batchId)):
            # replayed batch after a restart: drop its re-written
            # fragment files, keep the original commit
            _abort_fragments(self.root, messages)
            return
        v = _commit_fragments(
            self.root,
            self.schema,
            messages,
            replace=False,
            written_target=self.target,
        )
        os.makedirs(os.path.dirname(self._marker(batchId)), exist_ok=True)
        with open(self._marker(batchId), "w") as f:
            f.write(str(v))

    def abort(self, messages, batchId: int) -> None:
        _abort_fragments(self.root, messages)


class LanceNativeStreamReader(DataSourceStreamReader):
    """Streaming SOURCE over a native dataset — the reference's
    LanceSource streaming mode: micro-batches tail the MANIFEST CHAIN.
    The offset is the manifest version whose fragments have been
    emitted; each batch plans one InputPartition per fragment that
    APPEARED in (start, end] (by fragment id — appends and overwrites
    both surface as new fragments). The stream is append-only:
    fragments emit their physical rows as written; a later DELETE is a
    mutation of the table, not a retraction of already-emitted rows
    (deletion files are ignored here by design — the CDC source is
    the changelog-shaped surface). ``startingVersion`` replays from
    an old version (default: the full current snapshot on first
    start)."""

    def __init__(self, root: str, options):
        self.root = root
        sv = options.get("startingVersion")
        self.starting = int(sv) if sv is not None else 0
        # rows render in the schema captured at stream START: a
        # mid-stream ADD/DROP COLUMN changes later manifests, but the
        # query's schema is fixed — the field-id map reads old and new
        # fragments alike at this version's shape
        self.schema_version = _dataset(root).versions()[-1]

    def initialOffset(self) -> dict:
        # version 0 never exists: "nothing emitted yet"
        return {"version": self.starting}

    def latestOffset(self) -> dict:
        return {"version": _dataset(self.root).versions()[-1]}

    def _frag_ids(self, version: int) -> set:
        if version <= 0:
            return set()
        _f, frags, _v = _dataset(self.root)._manifest(version)
        return {fr.frag_id for fr in frags}

    def partitions(self, start: dict, end: dict):
        sv, ev = int(start["version"]), int(end["version"])
        if sv == ev:
            return []
        have = self._frag_ids(sv)
        _f, frags, _v = _dataset(self.root)._manifest(ev)
        out, base = [], 0
        for fr in frags:
            if fr.frag_id not in have:
                out.append(LanceStreamPartition(fr.path, ev))
            base += fr.physical_rows
        return out

    def read(self, partition: "LanceStreamPartition"):
        from lance_flink_spark.sources.lance_native import (
            read_fragment_table,
        )

        nds = _dataset(self.root)
        sfields, _sf, _sv = nds._manifest(self.schema_version)
        _f, frags, _v = nds._manifest(partition.version)
        fr = next(f for f in frags if f.path == partition.frag_path)
        t = read_fragment_table(
            os.path.join(self.root, "data", fr.path), sfields, fr
        )
        t = t.cast(_downcast_arrow_schema(sfields))
        yield from t.to_batches()

    def commit(self, end: dict) -> None:
        pass  # manifests are immutable; nothing to clean up

    def stop(self) -> None:
        pass


@dataclass
class LanceStreamPartition(InputPartition):
    frag_path: str
    version: int


class LanceNativeChangesStreamReader(DataSourceStreamReader):
    """CHANGELOG streaming source (``.option('readChanges', 'true')``)
    — the native change feed as micro-batches: each batch emits the
    commits in (start, end] as insert/delete rows (deletes carry their
    PRE-IMAGE values, an UPDATE commit carries its delete+insert pair
    under one ``_commit_version``) — Flink's retract-changelog shape,
    ready for a keyed upsert sink; with the lance_native batch sink on
    the other end this closes the fully-native replication loop. One
    InputPartition per changed fragment. Fragment-REPLACING commits
    (compaction / overwrite / truncate / restore) refuse loudly at
    planning time. Rows render in the schema captured at stream start
    (mid-stream evolution keeps old fragments readable through the
    field-id map). ``startingVersion`` defaults to 0 — the full
    history replays as inserts, the replication-bootstrap shape."""

    def __init__(self, root: str, options):
        self.root = root
        sv = options.get("startingVersion")
        self.starting = int(sv) if sv is not None else 0
        self.schema_version = _dataset(root).versions()[-1]

    def initialOffset(self) -> dict:
        return {"version": self.starting}

    def latestOffset(self) -> dict:
        return {"version": _dataset(self.root).versions()[-1]}

    def partitions(self, start: dict, end: dict):
        from lance_flink_spark.sources.lance_native import (
            UnsupportedLanceFeature,
        )

        sv, ev = int(start["version"]), int(end["version"])
        if sv == ev:
            return []
        nds = _dataset(self.root)
        if sv != 0 and sv not in nds._manifests:
            raise UnsupportedLanceFeature(
                f"checkpointed version {sv} was vacuumed away "
                f"(have {nds._manifests}) — the changelog can't diff "
                "from it; restart the stream with a fresh checkpoint"
            )
        out = []
        for v in [x for x in nds._manifests if sv < x <= ev]:
            _f, frags_v, _ = nds._manifest(v)
            i = nds._manifests.index(v)
            prev = nds._manifests[i - 1] if i > 0 else None
            pfrags = (
                {fr.frag_id: fr for fr in nds._manifest(prev)[1]}
                if prev is not None
                else {}
            )
            removed = set(pfrags) - {fr.frag_id for fr in frags_v}
            if removed:
                raise UnsupportedLanceFeature(
                    f"version {v} REPLACES fragments {sorted(removed)} "
                    "(compaction / overwrite / truncate / restore) — "
                    "the changelog is undefined across rewrites"
                )
            for fr in frags_v:
                if fr.frag_id not in pfrags:
                    if fr.physical_rows:
                        out.append(
                            LanceChangesPartition(
                                "insert", v, prev or 0, fr.path,
                                self.schema_version,
                            )
                        )
                else:
                    old = pfrags[fr.frag_id]
                    if [f.path for f in fr.all_files()] != [
                        f.path for f in old.all_files()
                    ]:
                        # add_columns backfill: row width changed with
                        # no row-level representation — refuse rather
                        # than silently desynchronize the stream
                        raise UnsupportedLanceFeature(
                            f"version {v} changes fragment "
                            f"{fr.frag_id}'s data-file list (a column "
                            "backfill) — the changelog is undefined "
                            "for width changes; restart the stream "
                            "with a fresh checkpoint"
                        )
                    nd, od = fr.deletion, old.deletion
                    if nd is not None and (
                        od is None
                        or (nd.id, nd.read_version)
                        != (od.id, od.read_version)
                    ):
                        out.append(
                            LanceChangesPartition(
                                "delete", v, prev, fr.path,
                                self.schema_version,
                            )
                        )
        return out

    def read(self, partition: "LanceChangesPartition"):
        import numpy as np
        import pyarrow as pa

        from lance_flink_spark.sources.lance_native import (
            read_deletion_file,
            read_fragment_table,
        )

        nds = _dataset(self.root)
        sfields, _sf, _sv = nds._manifest(partition.schema_version)
        _f, frags, _ = nds._manifest(partition.version)
        fr = next(f for f in frags if f.path == partition.frag_path)
        t = read_fragment_table(
            os.path.join(self.root, "data", fr.path), sfields, fr
        )
        new_dead = (
            read_deletion_file(self.root, fr)
            if fr.deletion is not None
            else np.array([], dtype="int64")
        )
        if partition.kind == "insert":
            t = t.take(
                np.setdiff1d(np.arange(t.num_rows, dtype="int64"), new_dead)
            )
        else:
            _pf, pfr_list, _ = nds._manifest(partition.prev)
            old = next(
                (f for f in pfr_list if f.frag_id == fr.frag_id), None
            )
            old_dead = (
                read_deletion_file(self.root, old)
                if old is not None and old.deletion is not None
                else np.array([], dtype="int64")
            )
            t = t.take(np.setdiff1d(new_dead, old_dead))
        t = t.cast(_downcast_arrow_schema(sfields))
        n = t.num_rows
        t = t.append_column(
            "_change_type", pa.array([partition.kind] * n, pa.string())
        ).append_column(
            "_commit_version",
            pa.array([partition.version] * n, pa.int64()),
        )
        yield from t.to_batches()

    def commit(self, end: dict) -> None:
        pass  # manifests are immutable

    def stop(self) -> None:
        pass


@dataclass
class LanceChangesPartition(InputPartition):
    kind: str
    version: int
    prev: int
    frag_path: str
    schema_version: int


def register(spark) -> None:
    """Register the data source on the session (idempotent):
    ``spark.read.format('lance_native')`` and friends. Ships the
    package so executor workers can import the decode path."""
    from lance_flink_spark.session import ship_package

    ship_package(spark)
    # Spark 4.1 gates Python-data-source filter pushdown behind a conf
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(LanceNativeDataSource)
