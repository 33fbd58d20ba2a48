"""Versioned columnar dataset: parquet fragments + JSON manifest.

Parity with the reference's source/sink surface
(LanceSource.java:1-410, LanceSink.java:1-345, LanceOptions.java:45-120):

- parallel split scan with column projection, predicate pushdown,
  limit pushdown, batch size,
- append / overwrite write modes, max-rows-per-file,
- dataset versioning (each write = new version; old fragments are kept,
  so reads can time-travel), mirroring Lance's manifest model.

Spark-first: the scan is ``spark.read.parquet`` over the fragment list
— projection and filters are *declared* on the DataFrame and Catalyst
pushes them into the parquet reader (visible as ``PushedFilters`` /
``ReadSchema`` in ``.explain``). Nothing is hand-scheduled. At cluster
scale each parquet row-group is an input split, giving the same
split-parallelism as the reference's LanceSplit enumeration.
"""

from __future__ import annotations

import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from lance_flink_spark.sources import fsio

MANIFEST = "_manifest.json"


def _version_ge_globs(k: int, width: int = 4) -> list[str]:
    """Digit glob patterns jointly matching every zero-padded integer
    ≥ k (e.g. k=7 → 0007, 000[8-9], 00[1-9][0-9], 0[1-9][0-9][0-9],
    [1-9][0-9][0-9][0-9]). Lets a file-stream source watch 'all
    versions from the last overwrite onward' as a single Hadoop glob —
    an open range that future appends keep matching.

    Versions past 10^width - 1 overflow the zero-pad and get longer
    names (v10000-...): the final width+1-digit prefix pattern catches
    all of them (its trailing ``*`` only ever extends digits — a
    width+1-digit prefix can't match a shorter zero-padded name, since
    position width would have to match the ``-`` separator)."""
    s = str(k).zfill(width)
    if len(s) > width:
        raise ValueError(f"version {k} exceeds {width}-digit manifest naming")
    pats = [s]
    for i in range(width):
        d = int(s[i])
        if d < 9:
            pats.append(s[:i] + f"[{d + 1}-9]" + "[0-9]" * (width - i - 1))
    pats.append("[1-9]" + "[0-9]" * width + "*")
    return pats


_Z_BITS = 6  # 64 equi-depth buckets per dimension


_Z_SAMPLE = 10_000  # split-point sample per non-numeric column (bounded collect)


def _zorder(df: DataFrame, cols: list[str]) -> DataFrame:
    """Cluster rows on a Z-order (Morton) curve over ``cols`` so
    parquet row-group min/max stats stay tight on EVERY listed column
    simultaneously — linear sort_by only skips on the leading column
    (the Delta OPTIMIZE ZORDER BY story, here at write time).

    Per column: 63 split points map values to 64 equi-depth buckets
    via a JVM-side filter-count over the broadcast splits array; NULLs
    sort first as bucket 0. Numeric columns get approxQuantile splits
    (one pass, no raw-row collect); other ORDERABLE columns (string /
    date / timestamp / boolean — Delta's ZORDER accepts these too) get
    rank-space splits from a bounded random sample, the RangePartitioner
    contract: a per-partition top-k of _Z_SAMPLE rows on a random key,
    driver merge of one small scalar list per column. The 6-bit bucket
    ids are bit-interleaved into one Z value, and the frame is
    range-partitioned + sorted on it. Equi-depth (rank-space) buckets
    make the curve robust to skewed value distributions."""
    from pyspark.sql import functions as F

    if len(cols) < 2:
        raise ValueError("zorder_by needs >= 2 columns (use sort_by for 1)")
    nb = 1 << _Z_BITS
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"zorder_by columns not in frame: {missing}")
    from pyspark.sql import types as T

    orderable = (
        T.NumericType, T.StringType, T.DateType,
        T.TimestampType, T.TimestampNTZType, T.BooleanType,
    )
    bad = [c for c in cols if not isinstance(df.schema[c].dataType, orderable)]
    if bad:
        raise ValueError(
            f"zorder_by needs orderable scalar columns (numeric/string/"
            f"date/timestamp/boolean); unsupported: {bad}"
        )
    bucket_cols = []
    for c in cols:
        if isinstance(df.schema[c].dataType, T.NumericType):
            splits = df.approxQuantile(c, [i / nb for i in range(1, nb)], 0.001)
            lits = [F.lit(float(s)) for s in splits]
            ref = F.col(c).cast("double")
        else:
            sample = sorted(
                r[0]
                for r in df.select(c)
                .filter(F.col(c).isNotNull())
                .orderBy(F.rand(42))
                .limit(_Z_SAMPLE)
                .collect()
            )
            splits = (
                [sample[(i * len(sample)) // nb] for i in range(1, nb)]
                if sample
                else []
            )
            lits = [F.lit(s) for s in splits]
            ref = F.col(c)
        if not lits:  # empty/all-NULL column: single bucket
            bucket_cols.append(F.lit(0))
            continue
        arr = F.array(*lits)
        bucket = F.when(
            F.col(c).isNull(), F.lit(0)
        ).otherwise(
            F.size(F.filter(arr, lambda s: s <= ref))
        )
        bucket_cols.append(bucket)
    z = F.lit(0).cast("long")
    for b in range(_Z_BITS):
        for i, bucket in enumerate(bucket_cols):
            bit = F.shiftright(bucket, b).bitwiseAND(F.lit(1)).cast("long")
            z = z + F.shiftleft(bit, b * len(cols) + i)
    tagged = df.withColumn("__z", z)
    return (
        tagged.repartitionByRange("__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


@dataclass
class DatasetOptions:
    """Mirror of the reference's LanceOptions keys (config/LanceOptions.java)."""

    path: str
    read_batch_size: int = 1024
    read_limit: int | None = None
    read_columns: list[str] | None = None
    read_filter: str | None = None
    write_batch_size: int = 1024
    write_mode: str = "append"
    write_max_rows_per_file: int = 1_000_000
    write_sort_by: list[str] | None = None
    write_zorder_by: list[str] | None = None
    write_compression: str | None = None
    extra: dict = field(default_factory=dict)
    # the option strings the user actually declared (everything except
    # path/connector) — SHOW CREATE TABLE emits exactly these, so DDL
    # round-trips with batch-size/write.* knobs intact
    declared: dict = field(default_factory=dict)

    @classmethod
    def from_options(cls, opts: dict) -> "DatasetOptions":
        """Build from a flat {'path': .., 'read.batch-size': ..} dict —
        the same option-string surface as the reference SQL WITH(...)."""
        cols = opts.get("read.columns")

        def _csv(key):
            v = opts.get(key)
            return [c.strip() for c in v.split(",")] if v else None

        return cls(
            declared={k: v for k, v in opts.items() if k not in ("path", "connector")},
            path=opts["path"],
            read_batch_size=int(opts.get("read.batch-size", 1024)),
            read_limit=int(opts["read.limit"]) if "read.limit" in opts else None,
            read_columns=[c.strip() for c in cols.split(",")] if cols else None,
            read_filter=opts.get("read.filter"),
            write_batch_size=int(opts.get("write.batch-size", 1024)),
            write_mode=opts.get("write.mode", "append"),
            write_max_rows_per_file=int(opts.get("write.max-rows-per-file", 1_000_000)),
            write_sort_by=_csv("write.sort-by"),
            write_zorder_by=_csv("write.zorder-by"),
            write_compression=opts.get("write.compression"),
            extra={k: v for k, v in opts.items() if k.startswith(("index.", "vector."))},
        )


class CommitConflict(RuntimeError):
    """Another writer committed between this writer's snapshot read and
    its manifest swap (optimistic concurrency — Lance/Delta conditional
    commit semantics). Appends retry automatically; mutations and
    overwrites surface the conflict because their rewrite was computed
    against a state that no longer exists."""


def _all_nullable(dt):
    """Recursively nullable-ize a Spark type — Spark's parquet schema
    converter surfaces every field/element/value as nullable, so the
    driver-side pyarrow inference must too (_infer_merged_schema)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(f.name, _all_nullable(f.dataType), True, f.metadata)
                for f in dt.fields
            ]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(_all_nullable(dt.elementType), True)
    if isinstance(dt, T.MapType):
        return T.MapType(
            _all_nullable(dt.keyType), _all_nullable(dt.valueType), True
        )
    return dt


#: merged-schema memo keyed by (path, manifest length, version):
#: Spark's mergeSchema option runs a DISTRIBUTED footer-merge job on
#: every DataFrame creation, which made one CDF refresh pay ~6 hidden
#: jobs before any data moved. Any commit changes the manifest length,
#: so staleness is impossible; entries are tiny (StructType).
_SCHEMA_CACHE: dict = {}


class Dataset:
    """A versioned parquet dataset rooted at ``path``.

    Layout::

        path/
          _manifest.json        # {"versions": [{version, mode, fragments, ts}]}
          data/v0001-<uuid>/    # fragment dir written by one commit
            part-*.parquet
    """

    def __init__(self, path: str):
        self.path = path

    # ---------- manifest ----------

    def _manifest_path(self) -> str:
        return fsio.join(self.path, MANIFEST)

    def _load_manifest(self) -> dict:
        if not fsio.exists(self._manifest_path()):
            return {"versions": []}
        return fsio.read_json(self._manifest_path())

    def _commit(
        self,
        mode: str,
        fragment: str,
        tag: str | None = None,
        removed_files: list[str] | None = None,
        dropped_columns: list[str] | None = None,
        expected_version: int | None = None,
        restore_of: int | None = None,
        extra: dict | None = None,
    ) -> int:
        man = self._load_manifest()
        if (
            expected_version is not None
            and len(man["versions"]) != expected_version
        ):
            # optimistic concurrency (Lance conditional-put / Delta
            # commit protocol analogue): the caller computed its change
            # against ``expected_version``; a commit that landed since
            # would be silently clobbered by appending on top of state
            # the caller never saw. Data files already written stay
            # invisible (only the manifest makes fragments live), so a
            # failed commit leaves no torn state behind.
            raise CommitConflict(
                f"dataset advanced to v{len(man['versions'])} "
                f"(expected v{expected_version})"
            )
        version = len(man["versions"]) + 1
        entry = {"version": version, "mode": mode, "fragment": fragment, "ts": time.time()}
        if tag is not None:
            entry["tag"] = tag
        if removed_files:
            entry["removed_files"] = sorted(removed_files)
        if dropped_columns:
            entry["dropped_columns"] = sorted(dropped_columns)
        if restore_of is not None:
            entry["restore_of"] = int(restore_of)
        if extra:
            entry.update(extra)
        man["versions"].append(entry)
        # tmp-write + rename commit, like Lance's manifest swap — local
        # and any Hadoop scheme (s3a://, hdfs://) via fsio
        fsio.write_json_atomic(self._manifest_path(), man)
        return version

    def versions(self) -> list[int]:
        return [v["version"] for v in self._load_manifest()["versions"]]

    def stats(self) -> dict | None:
        """ANALYZE-computed table statistics (rows, bytes,
        physical_rows, live_bytes, optional per-column stats) — or
        None when never analyzed OR when commits landed since the
        analysis (stale stats would mis-gate planners; re-run
        ``ANALYZE TABLE``). The ``live_bytes`` field scales file bytes
        by the live-row fraction, so a deletion-vector DELETE that
        shrank the table logically shrinks the estimate too — exactly
        what Catalyst's file-size-based sizeInBytes cannot see."""
        man = self._load_manifest()
        st = man.get("stats")
        if not st or st.get("version") != len(man.get("versions", [])):
            return None
        return dict(st)

    def _merged_schema(self, spark: SparkSession, version: int | None = None):
        """The union schema of the live fragments at ``version`` (add-
        column evolution: older files surface newer columns as null),
        inferred ONCE per commit and memoized (_SCHEMA_CACHE). Readers
        pass it explicitly instead of mergeSchema — an explicit schema
        fills a file's missing columns with nulls natively, so the
        supported (add-column) evolution reads identically, minus the
        per-DataFrame footer-merge job."""
        vs = self._load_manifest()["versions"]
        # the first commit's timestamp is a per-dataset identity: a
        # dataset dropped and re-created at the same path (possibly
        # with the same version count) gets a fresh creation ts, so a
        # stale schema from the old incarnation can never be served
        key = (self.path, vs[0]["ts"] if vs else 0.0, len(vs), version)
        s = _SCHEMA_CACHE.get(key)
        if s is None:
            frags = self._live_paths(version)
            s = self._infer_merged_schema(spark, frags)
            if len(_SCHEMA_CACHE) >= 4096:
                # one entry lands per commit per dataset: bound the memo
                # for very-long-lived sessions (entries are tiny, but
                # unbounded driver state is unbounded driver state).
                # Dropping the oldest half keeps current datasets warm.
                for k in list(_SCHEMA_CACHE)[:2048]:
                    _SCHEMA_CACHE.pop(k, None)
            _SCHEMA_CACHE[key] = s
        return s

    def _infer_merged_schema(self, spark: SparkSession, frags: list[str]):
        """Union-schema inference over fragment dirs. Local datasets
        with few files read footers DRIVER-SIDE via pyarrow (zero
        Spark jobs — the distributed footer-merge job costs ~0.1 s of
        scheduling per commit, which dominated small multi-commit
        pipelines); many-file or URI-scheme datasets keep Spark's
        distributed mergeSchema (at 100 TB the driver must not read
        thousands of footers). Any pyarrow surprise (exotic type,
        unreadable footer) falls back to the Spark path."""
        if not fsio.is_remote(self.path):
            files = []
            for frag in frags:
                # a "fragment" path may be a bare data FILE (callers
                # pass file lists through the same machinery)
                if frag.endswith(".parquet"):
                    files.append(frag)
                    continue
                for n in fsio.listdir(frag):
                    if n.endswith(".parquet"):
                        files.append(fsio.join(frag, n))
                if len(files) > 64:
                    break
            if files and len(files) <= 64:
                try:
                    import pyarrow as pa
                    import pyarrow.parquet as pq
                    from pyspark.sql.pandas.types import from_arrow_schema

                    unified = pa.unify_schemas(
                        [pq.read_schema(f) for f in files],
                        promote_options="permissive",
                    )
                    # parity with Spark's own reader, verified by
                    # tests/test_dataset.py: (a) naive-µs timestamps
                    # are NTZ (inferTimestampNTZ default) but naive-ns
                    # ones are INT96-written TimestampType — flip them
                    # back; (b) Spark's parquet converter surfaces
                    # everything nullable, pyarrow preserves required
                    # fields — nullable-ize recursively.
                    fields = []
                    for f in unified:
                        t = f.type
                        if (
                            pa.types.is_timestamp(t)
                            and t.tz is None
                            and t.unit == "ns"
                        ):
                            f = f.with_type(pa.timestamp("us", tz="UTC"))
                        fields.append(f)
                    s = from_arrow_schema(
                        pa.schema(fields), prefer_timestamp_ntz=True
                    )
                    return _all_nullable(s)
                except Exception:  # noqa: BLE001 - fall back to Spark
                    pass
        return (
            spark.read.option("mergeSchema", "true").parquet(*frags).schema
        )

    def _live_state(
        self, version: int | None = None
    ) -> tuple[list[str], set[str]]:
        """(fragment dirs, removed data files) visible at ``version``
        (latest if None). Row-level mutations (delete_where /
        update_where / merge_insert) commit a rewritten fragment plus
        the set of superseded files; overwrite resets both."""
        vs = self._load_manifest()["versions"]
        if version is not None:
            vs = [v for v in vs if v["version"] <= version]
        live: list[str] = []
        removed: set[str] = set()
        for v in vs:
            if v["mode"] == "restore":
                # metadata-only rollback (Delta RESTORE parity): the
                # state becomes exactly the restored version's state —
                # replayed through the SAME manifest prefix, so this
                # recursion is bounded by history depth and never
                # touches data files
                frags, removed_r = self._live_state(v["restore_of"])
                live = [self._relpath(f) for f in frags]
                removed = set(removed_r)
                continue
            if v["mode"] == "overwrite":
                live = []
                removed = set()
            if v.get("dv") or not v["fragment"]:
                # deletion-vector commits own a tombstone sidecar, not
                # a data fragment — tracked by _live_dvs, never scanned
                # as data (update/merge DV commits carry BOTH: their
                # data fragment lands here, their sidecar in _live_dvs)
                continue
            live.append(v["fragment"])
            removed.update(v.get("removed_files", ()))
        return [fsio.join(self.path, f) for f in live], removed

    def _dropped_cols(self, version: int | None = None) -> list[str]:
        """Columns logically dropped as of ``version`` (latest if
        None). Lance drop-column semantics: metadata-only — the commit
        records the names, reads project them away, and the bytes are
        physically removed only when a later mutation/compact rewrites
        the fragment. Overwrite resets the set (the new data defines
        the schema)."""
        vs = self._load_manifest()["versions"]
        if version is not None:
            vs = [v for v in vs if v["version"] <= version]
        dropped: list[str] = []
        for v in vs:
            if v["mode"] == "restore":
                dropped = self._dropped_cols(v["restore_of"])
                continue
            if v["mode"] == "overwrite":
                dropped = []
            for c in v.get("dropped_columns", ()):
                if c not in dropped:
                    dropped.append(c)
        return dropped

    def _live_fragments(self, version: int | None = None) -> list[str]:
        """Fragment dirs visible at ``version`` (latest if None).

        Overwrite truncates visibility of earlier fragments but keeps
        them on disk → time travel to any earlier version.
        """
        return self._live_state(version)[0]

    def _live_paths(self, version: int | None = None) -> list[str]:
        """Scan roots at ``version``: whole fragment dirs when no
        mutation has removed files (the common fast path — no listing
        round-trips), else the surviving per-file list."""
        frags, removed = self._live_state(version)
        if not removed:
            return frags
        paths: list[str] = []
        for frag in frags:
            for name in fsio.listdir(frag):
                if not name.endswith(".parquet"):
                    continue
                if self._relpath(fsio.join(frag, name)) in removed:
                    continue
                paths.append(fsio.join(frag, name))
        return paths

    @staticmethod
    def _relpath(file_path: str) -> str:
        """Manifest-stable identity of a data file: its path from the
        ``data/`` root (scheme/authority-independent, so manifests stay
        valid if the dataset is relocated or read via another URI)."""
        if "/data/" not in file_path:
            raise ValueError(f"not a dataset data file: {file_path}")
        # rsplit: the dataset root itself may live under a /data/ dir;
        # the fragment level is always the LAST /data/ component
        return "data/" + file_path.rsplit("/data/", 1)[1]

    # ---------- write (sink parity: LanceSink.java) ----------

    def write(
        self,
        df: DataFrame,
        mode: str = "append",
        max_rows_per_file: int = 1_000_000,
        tag: str | None = None,
        sort_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
        expected_version: int | None = None,
        compression: str | None = None,
        batch_size: int | None = None,
        row_group_bytes: int | None = None,
        skip_empty: bool = False,
    ) -> int:
        """Write ``df`` as a new dataset version. Returns the version.

        ``batch_size`` (the reference's write.batch-size,
        LanceOptions.java:95 — rows per write batch) maps to parquet's
        page row limit: pages are the finest unit a reader decodes, so
        this bounds the row-batch granularity of the written files the
        same way Lance's knob bounds its Arrow write batches.

        ``expected_version`` (optimistic concurrency): commit only if
        the dataset is still at that version, else raise
        ``CommitConflict``. Appends never need it — they commute, and
        the commit re-reads the manifest under the atomic swap — but an
        overwrite that was DERIVED from a snapshot (compact, a
        read-modify-write job) passes the snapshot version so a
        concurrent append cannot be silently erased by a stale rewrite.

        ``max_rows_per_file`` maps to spark.sql.files.maxRecordsPerFile
        so executors split large partitions into bounded files — the
        same contract as the reference's write.max-rows-per-file.

        ``tag`` is an idempotency token recorded atomically with the
        manifest commit: if a version with this tag already exists the
        write is a no-op (exactly-once for replayed micro-batches —
        data files written before a crash stay invisible because only
        the manifest makes fragments live).

        ``skip_empty=True`` rides an Observation on the write job and
        commits NO version when zero rows landed (the written empty
        fragment is deleted) — callers that would otherwise pay a
        separate emptiness-probe job (e.g. the upsert sink's per-batch
        retraction log) fold the check into the write itself.
        """
        if mode not in ("append", "overwrite"):
            raise ValueError(f"write mode must be append|overwrite, got {mode!r}")
        if tag is not None and self.find_tag(tag) is not None:
            return self.find_tag(tag)
        self._enforce_constraints(df)
        if zorder_by:
            if sort_by:
                raise ValueError("sort_by and zorder_by are mutually exclusive")
            df = _zorder(df, zorder_by)
        if sort_by:
            # range-partition + sort on the clustering keys: parquet
            # row-group min/max stats become disjoint, so range
            # predicates on these columns skip whole files/row-groups
            # at scan time (the file-skipping half of Lance's
            # scalar-index story)
            df = df.repartitionByRange(*sort_by).sortWithinPartitions(*sort_by)
        frag = f"data/v{len(self.versions()) + 1:04d}-{uuid.uuid4().hex[:8]}"
        out = fsio.join(self.path, frag)
        obs = None
        if skip_empty:
            from pyspark.sql import Observation
            from pyspark.sql import functions as F

            obs = Observation()
            df = df.observe(obs, F.count(F.lit(1)).alias("n"))
        writer = df.write.option("maxRecordsPerFile", max_rows_per_file)
        if batch_size is not None:
            writer = writer.option("parquet.page.row.count.limit", batch_size)
        if row_group_bytes is not None:
            # parquet row-group sizing (Lance max-rows-per-group
            # analogue, in bytes because that's parquet-mr's unit):
            # smaller groups = finer skip granularity for the
            # row-group scalar index, at footer-size cost
            writer = writer.option("parquet.block.size", row_group_bytes)
        if compression is not None:
            # parquet codec per write (write.compression option key):
            # snappy default; zstd for cold/archival fragments — mixed
            # codecs within one dataset read fine (per-file metadata)
            writer = writer.option("compression", compression)
        writer.mode("errorifexists").parquet(out)
        if obs is not None and int(obs.get["n"]) == 0:
            fsio.delete(out)  # nothing landed: no version, no orphan
            return len(self.versions())
        return self._commit(mode, frag, tag=tag, expected_version=expected_version)

    def drop_columns(self, spark: SparkSession, cols: list[str]) -> int:
        """Logically drop columns (Lance ``drop_columns`` parity):
        metadata-only commit — reads at or after the new version
        project the columns away; time travel to earlier versions
        still sees them; the bytes leave the disk when a mutation or
        ``compact()`` next rewrites the fragments (which read through
        ``read()`` and therefore write the reduced schema).

        Re-adding a dropped name later is refused by the SQL layer's
        ALTER ADD: with name-based parquet schema merging, the old
        bytes would resurface under the new column. (Restart any
        ``read_stream`` tails after schema changes — the raw-file
        stream glob predates the projection.)"""
        from pyspark.sql import types as T

        base = len(self.versions())
        schema = self.read(spark).schema
        missing = [c for c in cols if c not in schema.names]
        if missing:
            raise ValueError(f"cannot drop unknown columns {missing}")
        if len(cols) >= len(schema.names):
            raise ValueError("cannot drop every column of a dataset")
        reduced = T.StructType([f for f in schema.fields if f.name not in cols])
        frag = f"data/v{base + 1:04d}-{uuid.uuid4().hex[:8]}"
        spark.createDataFrame([], reduced).write.mode("errorifexists").parquet(
            fsio.join(self.path, frag)
        )
        return self._commit(
            "append", frag, dropped_columns=list(cols), expected_version=base
        )

    def find_tag(self, tag: str) -> int | None:
        for v in self._load_manifest()["versions"]:
            if v.get("tag") == tag:
                return v["version"]
        return None

    # ---------- read (source parity: LanceSource.java, LanceInputFormat.java) ----------

    def read(
        self,
        spark: SparkSession,
        columns: list[str] | None = None,
        filter: str | None = None,  # noqa: A002 - mirrors reference option name
        limit: int | None = None,
        version: int | None = None,
        batch_size: int | None = None,
    ) -> DataFrame:
        """Scan with projection/filter/limit declared for Catalyst pushdown."""
        if version is not None:
            for v in self._load_manifest()["versions"]:
                if v["version"] == version and v.get("expired"):
                    raise ValueError(
                        f"version {version} was expired by vacuum()"
                    )
        frags = self._live_paths(version)
        if not frags:
            raise FileNotFoundError(f"dataset {self.path} has no data")
        # explicit memoized union schema (≡ mergeSchema for the
        # supported add-column evolution: older fragments surface the
        # new columns as null) — see _merged_schema for why
        reader = spark.read.schema(self._merged_schema(spark, version))
        if batch_size:
            # columnar batch size for the vectorized parquet reader
            reader = reader.option("parquet.read.batch.size", batch_size)
        # single-column equality/range/BETWEEN filters route through a
        # FRESH scalar index when one exists: same declared-filter
        # surface (reference's read.filter), strictly fewer files
        # scanned. Any other shape, stale index, or time travel falls
        # through to the plain scan (the filter is still applied below
        # either way).
        routed = None
        if filter and version is None:
            routed = self._try_index_prune(spark, filter)
        if routed is not None:
            # conform the routed read to the dataset's FULL merged
            # schema: the matched files may all predate a schema-
            # evolving append, and a bare parquet read of them would
            # drop (or fail to select) the newer columns that the
            # unrouted scan of the same call surfaces
            # routed reads only happen for version=None (checked above),
            # so the live deletion vectors apply
            df = self._read_files(
                spark, [self._relpath(f) for f in routed], apply_dv=True
            )
        else:
            df = self._apply_dv(spark, reader.parquet(*frags), version=version)
        dropped = [c for c in self._dropped_cols(version) if c in df.columns]
        if dropped:
            # logical drop-column projection (metadata-only drops):
            # applied BEFORE filter/columns, so referencing a dropped
            # column fails analysis exactly like a never-existing one
            df = df.drop(*dropped)
        if filter:
            df = df.filter(filter)
        if columns:
            df = df.select(*columns)
        if limit is not None:
            df = df.limit(limit)
        return df

    def read_stream(
        self,
        spark: SparkSession,
        max_files_per_trigger: int | None = None,
        max_bytes_per_trigger: int | None = None,
    ) -> DataFrame:
        """Stream the dataset: new fragments written by appends become
        micro-batches (the reference's streaming LanceSource).

        ``max_files_per_trigger`` / ``max_bytes_per_trigger`` bound each
        micro-batch (Spark file-source admission control): a large
        append — one fragment, many parquet part-files via
        write.max-rows-per-file — is consumed across several
        micro-batches instead of one giant one, and a restart resumes
        from the checkpointed file offset mid-fragment. This is the
        Spark analogue of the reference's sub-fragment checkpointed
        resume (LanceSource offsets); granularity is the part-file, so
        size files accordingly at write time.

        - Schema comes from the MERGED batch read over all live
          fragments, not the first fragment — columns added by later
          appends are part of the stream (older files surface null).
        - The watched glob matches only versions at or after the last
          overwrite, so a fresh stream does NOT replay fragments hidden
          by overwrite history. Appends made after the stream starts
          keep matching (the glob is an open upper range). A running
          stream still can't retract an overwrite that happens mid-
          stream — the changelog-less file-source constraint, same as
          Flink CDC without a changelog; restart from a fresh
          checkpoint after such an overwrite (see compact()).
        - A row-level mutation committed MID-stream is invisible to the
          running stream: rewrite fragments are m-prefixed and excluded
          from the v* glob, so carried-forward rows are never fed twice
          (exactly-once on the original appends, pinned in
          tests/test_dataset.py). The stream keeps the pre-mutation
          view of already-fed rows; appends made after the mutation
          still arrive. Starting a FRESH stream on a mutated dataset
          raises (above) — compact() first."""
        man = self._load_manifest()["versions"]
        if not man:
            raise FileNotFoundError(f"dataset {self.path} has no data")
        if self._live_state()[1] or self._live_dvs():
            raise ValueError(
                "dataset has live row-level mutations (delete/update/"
                "merge/deletion-vectors); a file-stream glob cannot "
                "express file-level supersession or row tombstones — "
                "compact() first, then start the stream"
            )
        last_ow = max(
            (v["version"] for v in man if v["mode"] == "overwrite"), default=0
        )
        if any(v["mode"] == "restore" and v["version"] > last_ow for v in man):
            raise ValueError(
                "dataset state derives from a restore — its live files "
                "span arbitrary history and no version glob matches "
                "exactly them; compact() first, then start the stream"
            )
        schema = self.read(spark).schema
        last_ow = max(
            (v["version"] for v in man if v["mode"] == "overwrite"), default=1
        )
        if last_ow <= 1:
            glob = "data/v*"
        else:
            pats = _version_ge_globs(last_ow)
            glob = "data/{" + ",".join(f"v{p}-*" for p in pats) + "}"
        reader = spark.readStream.schema(schema)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        if max_bytes_per_trigger is not None:
            reader = reader.option("maxBytesPerTrigger", max_bytes_per_trigger)
        return reader.parquet(fsio.join(self.path, glob))

    def compact(
        self,
        spark: SparkSession,
        max_rows_per_file: int = 1_000_000,
        zorder_by: list[str] | None = None,
    ) -> int:
        """Rewrite the live data as one fresh overwrite version (small
        fragments from streaming appends → right-sized files),
        optionally Z-order-clustered (Delta OPTIMIZE ZORDER BY). Old
        versions stay readable (time travel); returns the new version.

        Caveat (observed in verification): an active ``read_stream``
        tailing this dataset will see the compacted fragment as NEW
        rows (duplicates) — same constraint as any file-stream source
        without a changelog. Don't compact datasets being tailed, or
        restart the stream from a fresh checkpoint after compaction."""
        base = len(self.versions())
        df = self.read(spark)
        # snapshot-derived overwrite: CAS on the snapshot version so a
        # concurrent append cannot be erased by this stale rewrite
        return self.write(
            df,
            mode="overwrite",
            max_rows_per_file=max_rows_per_file,
            zorder_by=zorder_by,
            expected_version=base,
        )

    def restore(self, version: int) -> int:
        """Roll the dataset back to ``version`` as a NEW commit (Delta
        RESTORE parity): metadata-only — no data read or written, the
        new version's live state IS the old version's, and the
        intervening history stays time-travelable (a restore can be
        restored away again). Refuses expired targets. Streams and
        change feeds treat a restore like an overwrite (no row
        lineage); CAS-protected like every snapshot-derived commit."""
        man = self._load_manifest()["versions"]
        base = len(man)
        target = next((v for v in man if v["version"] == version), None)
        if target is None:
            raise ValueError(f"no such version {version}")
        if target.get("expired"):
            raise ValueError(f"version {version} was expired by vacuum()")
        return self._commit(
            "restore", "", expected_version=base, restore_of=version
        )

    def compact_small(
        self,
        spark: SparkSession,
        small_bytes: int = 64 * 1024 * 1024,
        min_files: int = 2,
        max_rows_per_file: int = 1_000_000,
        tombstone_ratio: float = 0.2,
    ) -> int | None:
        """Incremental compaction (Delta OPTIMIZE / Lance
        compact_files parity): rewrite ONLY the live data files smaller
        than ``small_bytes`` into one right-sized fragment, committed
        with the small files as superseded — large files are never
        read, never rewritten, and stay byte-identical on disk. This is
        the compaction a 100 TB dataset actually runs: cost ∝ the small
        tail streaming appends left behind, not table size (the full
        ``compact()`` overwrite is for schema resets and
        mutation-glob recovery, not maintenance).

        A file is also selected when its DELETION-VECTOR tombstones
        exceed ``tombstone_ratio`` of its rows regardless of size —
        the "rewrite wins" threshold real lakehouse formats apply:
        past ~20% dead rows, every scan's anti-join and the wasted
        read bandwidth cost more than rewriting the file once. The
        rewrite MATERIALIZES those deletions (apply_dv), and any DV
        sidecar whose files are ALL superseded by this commit is
        folded away (``folded_dvs``) — subsequent scans broadcast
        strictly fewer tombstones. Pass ``tombstone_ratio=0`` wisely:
        it would rewrite on any tombstone; ``>1`` disables the
        trigger.

        No-op (returns None) unless at least ``min_files`` small files
        exist or a tombstone-heavy file does. Commits with mode
        ``compact`` — the same supersession mechanics as row
        mutations, so time travel, vacuum reachability and the CDF all
        compose (a compact emits ZERO change rows: the before/after
        key-payload sets are identical). CAS-protected against
        concurrent writers like any snapshot-derived rewrite."""
        from pyspark.sql import functions as F

        base = len(self.versions())
        frags, removed = self._live_state()
        small: list[str] = []
        live: list[str] = []
        for frag in frags:
            for name in fsio.listdir(frag):
                if not name.endswith(".parquet"):
                    continue
                p = fsio.join(frag, name)
                rel = self._relpath(p)
                if rel in removed:
                    continue
                live.append(rel)
                if fsio.file_size(p) < small_bytes:
                    small.append(rel)
        heavy: list[str] = []
        tomb = self._dv_tombstones(spark)
        if tomb is not None and 0 < tombstone_ratio <= 1:
            dead = {
                r["_file"]: r["n"]
                for r in tomb.groupBy("_file")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }  # bounded: tombstones are delete-sized (≤ broadcast cap)
            cands = [f for f in dead if f in set(live)]
            if cands:
                # total rows per tombstoned file: a zero-data-column
                # scan of ONLY those files (footer/metadata work —
                # cost ∝ mutation footprint, not table size)
                rows = {
                    r["f"]: r["n"]
                    for r in spark.read.parquet(
                        *[fsio.join(self.path, f) for f in cands]
                    )
                    .select(
                        F.expr(
                            "concat('data/', substring_index("
                            "_metadata.file_path, '/data/', -1))"
                        ).alias("f")
                    )
                    .groupBy("f")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                }
                heavy = [
                    f
                    for f in cands
                    if dead[f] >= tombstone_ratio * max(rows.get(f, 0), 1)
                ]
        pick = sorted(set(small) | set(heavy))
        if len(small) < min_files and not heavy:
            return None
        # apply_dv: a picked file's tombstoned rows must not ride into
        # the packed rewrite (the rewrite MATERIALIZES their deletion)
        packed = self._read_files(spark, pick, apply_dv=True).coalesce(
            max(1, len(pick) // 8)
        )
        frag = f"data/m{base + 1:04d}-{uuid.uuid4().hex[:8]}"
        out = fsio.join(self.path, frag)
        (
            packed.write.option("maxRecordsPerFile", max_rows_per_file)
            .mode("errorifexists")
            .parquet(out)
        )
        # fold away DV sidecars whose tombstones now ALL point at
        # superseded files — scans stop broadcasting them entirely; a
        # sidecar that still covers an untouched file stays live (its
        # stale entries are harmless: superseded files are never read)
        folded: list[str] = []
        superseded = set(removed) | set(pick)
        for d in self._live_dvs():
            files = {
                r["_file"]
                for r in spark.read.parquet(fsio.join(self.path, d))
                .select("_file")
                .distinct()
                .collect()
            }
            if files and files <= superseded:
                folded.append(d)
        extra = {"folded_dvs": sorted(folded)} if folded else None
        return self._commit(
            "compact", frag, removed_files=pick, expected_version=base,
            extra=extra,
        )

    # ---------- deletion vectors (Lance deletion-file parity) ----------
    #
    # Lance fragments carry DELETION FILES: a delete writes the row ids
    # it removed as a sidecar and the data files stay byte-identical —
    # at 100 TB, deleting 0.1% of rows must not rewrite (or even fully
    # read) the other 99.9%. Same model here: ``delete_where(dv=True)``
    # writes (_file, _pos) tombstones (parquet ``_metadata.row_index``
    # positions) under ``data/dvNNNN-*`` and commits a metadata-only
    # version; every scan anti-joins the live tombstones (broadcast —
    # they are delete-sized, not data-sized). compact()/overwrite
    # materializes and resets them, mirroring Lance's
    # "deletion files fold into the rewrite" rule.

    # Tombstones past this size would make every scan carry a
    # non-broadcastable join (and break input_file_name provenance in
    # mutation pruning): refuse and direct to compact(), the same
    # "DV too big → rewrite wins" threshold real lakehouse formats
    # apply at compaction time.
    _DV_BROADCAST_CAP = 128 * 1024 * 1024

    def _live_dvs(self, version: int | None = None) -> list[str]:
        """Deletion-vector sidecar dirs live at ``version`` (latest if
        None), replayed like _live_state: overwrite resets (the rewrite
        materialized the deletes), restore recurses."""
        vs = self._load_manifest()["versions"]
        if version is not None:
            vs = [v for v in vs if v["version"] <= version]
        dvs: list[str] = []
        for v in vs:
            if v["mode"] == "restore":
                dvs = self._live_dvs(v["restore_of"])
                continue
            if v["mode"] == "overwrite":
                dvs = []
            if v.get("folded_dvs"):
                # a compact superseded every file these sidecars
                # tombstoned — their deletions are materialized in the
                # rewrite, so scans stop loading them
                gone = set(v["folded_dvs"])
                dvs = [d for d in dvs if d not in gone]
            if v.get("dv"):
                dvs.append(v["fragment"])
            elif v.get("dv_fragment"):
                dvs.append(v["dv_fragment"])
        return dvs

    def _dv_tombstones(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame | None:
        """Union of live (_file, _pos) tombstones at ``version``, or
        None when the dataset has no live deletion vectors (the common
        case — callers skip the join entirely, so plans without DVs are
        byte-identical to pre-DV plans)."""
        dvs = self._live_dvs(version)
        if not dvs:
            return None
        total = 0
        for d in dvs:
            p = fsio.join(self.path, d)
            for n in fsio.listdir(p):
                if n.endswith(".parquet"):
                    total += fsio.file_size(fsio.join(p, n))
        if total > self._DV_BROADCAST_CAP:
            raise ValueError(
                f"live deletion vectors total {total} bytes (cap "
                f"{self._DV_BROADCAST_CAP}) — compact() to materialize "
                "them into rewritten files"
            )
        return spark.read.parquet(*[fsio.join(self.path, d) for d in dvs])

    def _apply_dv(
        self, spark: SparkSession, df: DataFrame, version: int | None = None
    ) -> DataFrame:
        """Drop tombstoned rows from a file-source scan. Must run on
        the scan output itself (``_metadata`` is a scan-relation
        pseudo-column — it does not survive a projection). The
        tombstones broadcast, so the anti-join stays in the scan's
        stage and downstream ``input_file_name()`` provenance keeps
        working; filters/projections a caller adds later still push
        through the join to the parquet reader."""
        from pyspark.sql import functions as F

        tomb = self._dv_tombstones(spark, version)
        if tomb is None:
            return df
        keyed = df.withColumns(
            {
                "__dv_file": F.expr(
                    "concat('data/', "
                    "substring_index(_metadata.file_path, '/data/', -1))"
                ),
                "__dv_pos": F.col("_metadata.row_index"),
            }
        )
        out = keyed.join(
            F.broadcast(
                tomb.withColumnsRenamed(
                    {"_file": "__dv_file", "_pos": "__dv_pos"}
                )
            ),
            ["__dv_file", "__dv_pos"],
            "left_anti",
        )
        return out.drop("__dv_file", "__dv_pos")

    def _keyed_live_scan(
        self, spark: SparkSession, paths: list[str] | None = None
    ) -> DataFrame:
        """Raw live scan carrying ``__dv_file``/``__dv_pos`` position
        keys, with existing tombstones already excluded and logically
        dropped columns hidden — the starting frame for every
        deletion-vector mutation (the keys of the rows it matches ARE
        the new tombstones). ``paths`` restricts the scan roots (must
        be a subset of the live paths — keyed_read's incremental path
        uses this to scan only fragments newer than a version)."""
        from pyspark.sql import functions as F

        frags = paths if paths is not None else self._live_paths()
        if not frags:
            raise FileNotFoundError(f"dataset {self.path} has no data")
        raw = spark.read.schema(self._merged_schema(spark)).parquet(*frags)
        keyed = raw.withColumns(
            {
                "__dv_file": F.expr(
                    "concat('data/', "
                    "substring_index(_metadata.file_path, '/data/', -1))"
                ),
                "__dv_pos": F.col("_metadata.row_index"),
            }
        )
        dropped = [c for c in self._dropped_cols() if c in raw.columns]
        if dropped:
            keyed = keyed.drop(*dropped)
        tomb = self._dv_tombstones(spark)
        if tomb is not None:
            keyed = keyed.join(
                F.broadcast(
                    tomb.withColumnsRenamed(
                        {"_file": "__dv_file", "_pos": "__dv_pos"}
                    )
                ),
                ["__dv_file", "__dv_pos"],
                "left_anti",
            )
        return keyed

    def keyed_read(
        self, spark: SparkSession, since_version: int | None = None
    ) -> DataFrame:
        """Live scan carrying stable row-ADDRESS columns ``_row_file``
        (manifest-relative ``data/...`` file path) and ``_row_pos``
        (row index within the file) — real projected columns, so they
        survive any downstream transform, unlike the ``_metadata``
        scan pseudo-column.

        This is the binding surface for secondary indexes (Lance
        parity: indexes store row addresses; deletion files mask them
        at query time — LanceIndexBuilder writes row-id-addressed
        indexes, scans apply _rowaddr deletes). ``IVFIndex.build(...,
        dataset=ds)`` indexes this frame so searches can anti-join
        candidates against the dataset's CURRENT tombstones.

        ``since_version`` restricts the scan to fragments committed
        AFTER that version (incremental index update: only new
        fragments' rows are read; cost ∝ delta, not dataset size).
        Rows already tombstoned are excluded either way."""
        paths = None
        if since_version is not None:
            old = set(self._live_fragments(since_version))
            paths = [
                p
                for p in self._live_paths()
                if not any(p == f or p.startswith(f + "/") for f in old)
            ]
            if not paths:
                # no fragments newer than since_version: empty frame
                # with the live schema (plan-only, nothing scanned)
                return (
                    self._keyed_live_scan(spark)
                    .withColumnsRenamed(
                        {"__dv_file": "_row_file", "__dv_pos": "_row_pos"}
                    )
                    .limit(0)
                )
        return self._keyed_live_scan(spark, paths=paths).withColumnsRenamed(
            {"__dv_file": "_row_file", "__dv_pos": "_row_pos"}
        )

    def live_file_relpaths(self) -> list[str]:
        """Manifest-relative (``data/...``) paths of every live DATA
        file right now — the identity space of ``_row_file`` keys and
        of deletion-vector ``_file`` tombstones. Index masking diffs
        this against the file set recorded at index build/add time to
        detect files removed by predicate-delete rewrites, compaction,
        or restore. Driver-side listing: cost ∝ file count (manifest
        scale), never row count."""
        out: list[str] = []
        for root in self._live_paths():
            if root.endswith(".parquet"):
                out.append(self._relpath(root))
                continue
            for name in fsio.listdir(root):
                if name.endswith(".parquet"):
                    out.append(self._relpath(fsio.join(root, name)))
        return sorted(out)

    def _mutate_dv_commit(
        self,
        spark: SparkSession,
        matched_keyed: DataFrame,
        new_rows: DataFrame | None,
        mode: str,
        tag: str | None = None,
        pre_commit=None,
    ) -> int | None:
        """Commit a deletion-vector mutation: tombstone the positions
        of ``matched_keyed`` (a _keyed_live_scan selection) and, for
        update/merge shapes, land ``new_rows`` as an appended fragment
        in the SAME version — Lance's deletion-file + new-fragment
        mutation model. No pre-existing data file is read beyond the
        matching scan or rewritten. Returns the new version, or None
        when nothing matched and there is nothing to insert."""
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        base = len(self.versions())
        # row counts ride the write jobs as observed metrics — no
        # read-back count job per fragment (2 fewer jobs per mutation;
        # at 100 TB the saved job would also re-open every written
        # footer)
        obs_t = Observation()
        tomb = matched_keyed.select(
            F.col("__dv_file").alias("_file"), F.col("__dv_pos").alias("_pos")
        ).observe(obs_t, F.count(F.lit(1)).alias("n"))
        dv_frag = f"data/dv{base + 1:04d}-{uuid.uuid4().hex[:8]}"
        dv_out = fsio.join(self.path, dv_frag)

        def _write_tomb() -> int:
            tomb.coalesce(1).write.mode("errorifexists").parquet(dv_out)
            return int(obs_t.get["n"])

        if new_rows is not None:
            self._enforce_constraints(new_rows)
            # materialize BEFORE deciding emptiness: new_rows may be
            # derived from the same matched scan
            frag = f"data/m{base + 1:04d}-{uuid.uuid4().hex[:8]}"
            out = fsio.join(self.path, frag)
            obs_n = Observation()

            def _write_new() -> int:
                new_rows.observe(obs_n, F.count(F.lit(1)).alias("n")).write.mode(
                    "errorifexists"
                ).parquet(out)
                return int(obs_n.get["n"])

            # the two write jobs are independent (both read the cached
            # matched join); submit them concurrently so a mutation's
            # wall time is max(job, job), not the sum — the classic
            # multi-sink Spark pattern. Commit ordering is unaffected:
            # nothing is visible until the single manifest swap below.
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(2) as pool:
                fut_t = pool.submit(_write_tomb)
                fut_n = pool.submit(_write_new)
                n, n_new = fut_t.result(), fut_n.result()
        else:
            frag, n_new = None, 0
            n = _write_tomb()
        if pre_commit is not None:
            # durability barrier: side-effects that must be on disk
            # before this mutation becomes visible (see merge_when)
            pre_commit()
        if n == 0 and n_new == 0:
            fsio.delete(dv_out)
            if frag:
                fsio.delete(fsio.join(self.path, frag))
            return None
        if n == 0:
            # pure insert (merge with no matches): drop the empty
            # sidecar, commit a plain append of the new fragment
            fsio.delete(dv_out)
            return self._commit(mode, frag, expected_version=base, tag=tag)
        return self._commit(
            mode,
            frag or "",
            expected_version=base,
            tag=tag,
            extra={"dv_fragment": dv_frag, "dv_rows": int(n)},
        )

    def _dv_files(self, spark: SparkSession, dv_frag: str, tomb) -> list[str]:
        """Distinct data files a DV sidecar names. Local paths read the
        sidecar's ``_file`` column driver-side with pyarrow (bounded by
        the 128 MB DV broadcast cap) — zero Spark jobs; URI-scheme
        paths fall back to a distinct().collect() job."""
        base = fsio.join(self.path, dv_frag)
        if not fsio.is_remote(base):
            import pyarrow.parquet as pq

            names = set()
            for n in fsio.listdir(base):
                if n.endswith(".parquet"):
                    col = pq.read_table(
                        fsio.join(base, n), columns=["_file"]
                    ).column("_file")
                    names.update(col.to_pylist())
            return sorted(names)
        return sorted(
            r["_file"] for r in tomb.select("_file").distinct().collect()
        )

    def _dv_preimages(self, spark: SparkSession, dv_frag: str) -> DataFrame:
        """The full rows a deletion-vector sidecar tombstoned,
        conformed to the dataset's merged schema — read from exactly
        the files the sidecar names (bounded by the mutation's own
        footprint, never a table scan). The CDF's pre-image source for
        every dv commit."""
        from pyspark.sql import functions as F

        tomb = spark.read.parquet(fsio.join(self.path, dv_frag))
        files = self._dv_files(spark, dv_frag, tomb)
        raw = spark.read.schema(self._merged_schema(spark)).parquet(
            *[fsio.join(self.path, f) for f in files]
        )
        keyed = raw.withColumns(
            {
                "__dv_file": F.expr(
                    "concat('data/', "
                    "substring_index(_metadata.file_path, '/data/', -1))"
                ),
                "__dv_pos": F.col("_metadata.row_index"),
            }
        )
        picked = keyed.join(
            F.broadcast(
                tomb.withColumnsRenamed({"_file": "__dv_file", "_pos": "__dv_pos"})
            ),
            ["__dv_file", "__dv_pos"],
            "left_semi",
        ).drop("__dv_file", "__dv_pos")
        target = self.read(spark).schema
        for f in target.fields:
            if f.name not in picked.columns:
                picked = picked.withColumn(f.name, F.lit(None).cast(f.dataType))
        return picked.select(*[f.name for f in target.fields])

    def _delete_where_dv(self, spark: SparkSession, predicate: str) -> int | None:
        """Predicate delete WITHOUT rewriting data: write the matched
        row positions as a deletion-vector sidecar and commit a
        metadata-only version. Cost ∝ one pruned scan (the predicate
        pushes to the parquet reader) + a tombstone write the size of
        the DELETED rows. Returns the new version, or None when nothing
        matched (no commit — idempotent no-op, same contract as the
        rewrite path)."""
        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        base = len(self.versions())
        # _keyed_live_scan excludes already-tombstoned rows, so the new
        # sidecar records only NEW deletions — CDF emits each row's
        # delete exactly once
        keyed = self._keyed_live_scan(spark)
        obs = Observation()
        matched = (
            keyed.filter(f"coalesce(({predicate}), false)")
            .select(
                F.col("__dv_file").alias("_file"),
                F.col("__dv_pos").alias("_pos"),
            )
            .observe(obs, F.count(F.lit(1)).alias("n"))
        )
        frag = f"data/dv{base + 1:04d}-{uuid.uuid4().hex[:8]}"
        out = fsio.join(self.path, frag)
        # tombstones are delete-sized: one file keeps the every-scan
        # broadcast read a single round-trip; the count rides the write
        # job as an observed metric (no read-back job)
        matched.coalesce(1).write.mode("errorifexists").parquet(out)
        n = int(obs.get["n"])
        if n == 0:
            fsio.delete(out)
            return None
        return self._commit(
            "delete-dv",
            frag,
            expected_version=base,
            extra={"dv": True, "dv_rows": int(n)},
        )

    # ---------- row-level mutations (Lance delete / merge_insert parity) ----------
    #
    # Lance datasets support predicate deletes and key-based merge-insert
    # (upsert) as new manifest versions that rewrite only the fragments
    # holding affected rows. Same model here, at parquet-file
    # granularity: ONE pruned scan finds the files that actually contain
    # affected rows (the predicate pushes into the parquet reader, so
    # row-group stats skip clean files before they are ever read), only
    # those files are rewritten into a fresh fragment, and the commit
    # records them as superseded. Untouched files — at 100 TB, almost
    # all of them — are never read or rewritten, and time travel to any
    # pre-mutation version still sees them.

    def _tagged_scan(self, spark: SparkSession) -> DataFrame:
        """The live scan with a ``_file`` provenance column. The column
        must be computed AT the scan — ``_metadata.file_path`` is a
        scan-relation pseudo-column (and unlike input_file_name() it
        stays legal when the deletion-vector anti-join makes the plan
        multi-source) — so it is attached before the DV filter and any
        filter/join a caller adds."""
        from pyspark.sql import functions as F

        frags = self._live_paths()
        if not frags:
            raise FileNotFoundError(f"dataset {self.path} has no data")
        raw = spark.read.schema(self._merged_schema(spark)).parquet(*frags)
        tagged = raw.withColumn("_file", F.col("_metadata.file_path"))
        tagged = self._apply_dv(spark, tagged)
        dropped = [c for c in self._dropped_cols() if c in raw.columns]
        if dropped:
            tagged = tagged.drop(*dropped)
        return tagged

    def _affected_files(self, tagged_matches: DataFrame) -> list[str]:
        """Distinct data files containing the matched rows. The
        collect() is bounded by the FILE count (the same magnitude as
        Spark's own driver-side file index), never the row count."""
        rows = tagged_matches.select("_file").distinct().collect()
        return [self._relpath(r["_file"]) for r in rows]

    def _mutate_commit(
        self,
        survivors: DataFrame,
        affected: list[str],
        mode: str,
        base_version: int | None = None,
        tag: str | None = None,
    ) -> int:
        # 'm' prefix (vs append/overwrite's 'v'): mutation REWRITE
        # fragments must stay invisible to read_stream's v* file glob —
        # a running stream has already fed the superseded files, and
        # feeding the rewrite would double-count every carried-forward
        # row. Batch reads resolve fragments through the manifest, so
        # the prefix only matters to the glob.
        self._enforce_constraints(survivors)
        frag = f"data/m{len(self.versions()) + 1:04d}-{uuid.uuid4().hex[:8]}"
        out = fsio.join(self.path, frag)
        survivors.write.mode("errorifexists").parquet(out)
        # CAS against the version the rewrite was COMPUTED from: a
        # commit that landed mid-mutation (another writer's append or
        # mutation) would make this rewrite stale — its survivors were
        # derived from files that are no longer the whole story
        return self._commit(
            mode, frag, removed_files=affected, expected_version=base_version, tag=tag
        )

    def delete_where(
        self, spark: SparkSession, predicate: str, dv: bool = False
    ) -> int | None:
        """Delete rows matching ``predicate``; returns the new version,
        or None if nothing matched (no commit — idempotent no-op).

        ``dv=True`` writes a deletion-vector sidecar instead of
        rewriting the affected files (Lance deletion-file semantics) —
        cost ∝ deleted rows, not affected-file bytes; see
        _delete_where_dv.

        An active ``read_stream`` cannot observe a delete (file sources
        have no changelog — same caveat as compact()); restart streams
        after mutations."""
        if dv:
            return self._delete_where_dv(spark, predicate)
        base = len(self.versions())
        affected = self._affected_files(
            self._tagged_scan(spark).filter(predicate)
        )
        if not affected:
            return None
        # coalesce: a row where the predicate evaluates NULL is NOT
        # matched and must survive (NOT(NULL) is NULL, which filter
        # would drop — the classic SQL delete footgun)
        keep = self._read_files(spark, affected, apply_dv=True).filter(
            f"NOT coalesce(({predicate}), false)"
        )
        return self._mutate_commit(keep, affected, "delete", base_version=base)

    def update_where(
        self,
        spark: SparkSession,
        predicate: str,
        assignments: dict[str, str],
        dv: bool = False,
    ) -> int | None:
        """UPDATE ... SET col = expr WHERE predicate. Returns the new
        version, or None if nothing matched. ``assignments`` maps
        column name → SQL expression (evaluated on the matched row).

        ``dv=True`` takes Lance's deletion-file + new-fragment update
        model: matched positions are tombstoned and the updated copies
        land as an appended fragment — unmatched rows of affected
        files are never rewritten (cost ∝ matched rows, not
        affected-file bytes)."""
        from pyspark.sql import functions as F

        base = len(self.versions())
        scan = self.read(spark)
        for col in assignments:
            if col not in scan.columns:
                raise ValueError(f"unknown column {col!r}")
        if dv:
            matched = self._keyed_live_scan(spark).filter(
                f"coalesce(({predicate}), false)"
            )
            updated = matched.select(
                *[
                    (
                        F.expr(assignments[f.name]).cast(f.dataType).alias(f.name)
                        if f.name in assignments
                        else F.col(f.name)
                    )
                    for f in scan.schema.fields
                ]
            )
            return self._mutate_dv_commit(spark, matched, updated, "update-dv")
        affected = self._affected_files(
            self._tagged_scan(spark).filter(predicate)
        )
        if not affected:
            return None
        df = self._read_files(spark, affected, apply_dv=True)
        cond = F.expr(predicate)
        updated = df.select(
            *[
                (
                    F.when(cond, F.expr(assignments[c])).otherwise(F.col(c)).alias(c)
                    if c in assignments
                    else F.col(c)
                )
                for c in df.columns
            ]
        )
        return self._mutate_commit(updated, affected, "update", base_version=base)

    def merge_insert(
        self, spark: SparkSession, source: DataFrame, on: str, dv: bool = False
    ) -> int:
        """Upsert (Lance merge_insert: when-matched-update-all +
        when-not-matched-insert-all, keyed on ``on``): source rows
        replace same-key rows; new keys append. Returns the new version.

        Only files that actually hold a matched key are rewritten — the
        key probe is a semi-join against the source's distinct keys
        (broadcast when small), pruned the same way as delete_where.
        Never a full-dataset rewrite, and the source is scanned twice at
        most (keys + payload).

        ``dv=True`` rewrites NOTHING: matched old rows are tombstoned
        by position and the whole source lands as one appended
        fragment (Lance's deletion-file merge). Cost ∝ source size —
        the shape CDC upsert ingestion needs at 100 TB, where every
        batch touches a sliver of most files."""
        base = len(self.versions())
        scan = self.read(spark)
        if set(source.columns) != set(scan.columns):
            raise ValueError(
                f"merge source schema {sorted(source.columns)} != "
                f"dataset schema {sorted(scan.columns)}"
            )
        from pyspark.sql import functions as F

        # conform source TYPES to the dataset schema, not just names: a
        # source int column unioned into a double fragment would silently
        # fork the fragment schema (long-vs-double merges later fail)
        source = source.select(
            *[F.col(f.name).cast(f.dataType) for f in scan.schema.fields]
        )

        dup = (
            source.groupBy(on)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter("n > 1")
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"merge source has multiple rows for key {dup[0][0]!r} — "
                "deduplicate the source first (ambiguous when-matched row)"
            )
        keys = source.select(on).distinct()
        if dv:
            matched = self._keyed_live_scan(spark).join(keys, on, "left_semi")
            v = self._mutate_dv_commit(spark, matched, source, "merge-dv")
            # a merge always lands its source (empty source → no-op
            # returns base, matching the rewrite path's contract)
            return base if v is None else v
        affected = self._affected_files(
            self._tagged_scan(spark).join(keys, on, "left_semi")
        )
        if affected:
            keep = self._read_files(spark, affected, apply_dv=True).join(
                keys, on, "left_anti"
            )
            merged = keep.unionByName(source)
            return self._mutate_commit(merged, affected, "merge", base_version=base)
        # no matched keys anywhere: pure insert — a plain append version
        return self.write(source, mode="append")

    def _read_files(
        self,
        spark: SparkSession,
        rel_files: list[str],
        apply_dv: bool = False,
        dv_as_of: int | None = None,
    ) -> DataFrame:
        """Read specific data files, conformed to the dataset's FULL
        merged schema: files written before a schema-evolving append
        lack the newer columns, and a mutation rewrite that read only
        old files would otherwise silently drop assignments to (or
        values of) those columns.

        ``apply_dv`` drops rows tombstoned by live deletion vectors
        (``dv_as_of`` pins the DV state to a version — the CDF's
        "live as of the previous commit" reads). Every caller that
        REWRITES surviving rows must pass it, or a rewrite would
        resurrect DV-deleted rows."""
        from pyspark.sql import functions as F

        df = spark.read.schema(self._merged_schema(spark)).parquet(
            *[fsio.join(self.path, f) for f in rel_files]
        )
        if apply_dv or dv_as_of is not None:
            # before the conformance select: _metadata is only
            # resolvable on the raw scan output
            df = self._apply_dv(spark, df, version=dv_as_of)
        target = self.read(spark).schema
        for f in target.fields:
            if f.name not in df.columns:
                df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
        return df.select(*[f.name for f in target.fields])

    def read_changes(
        self,
        spark: SparkSession,
        key: str,
        since_version: int = 0,
        version: int | None = None,
        checkpoint_every: int = 16,
        update_preimages: bool = False,
        suppress_unchanged: bool = True,
    ) -> DataFrame:
        """Change data feed (Delta CDF / Flink CDC analogue): row-level
        changes between ``since_version`` (exclusive) and ``version``
        (inclusive, latest if None), keyed on ``key``. Returns the full
        row plus ``_change_type`` ('insert' | 'update' | 'delete') and
        ``_version``; deletes carry the pre-image.

        Per changed version the diff compares ONLY that commit's new
        fragment against the files it superseded — never a full-table
        diff: appends emit their fragment as inserts outright, and a
        mutation's superseded files are exactly where its deletes and
        update pre-images live. An overwrite in the range raises (it
        has no per-file lineage — the file-source changelog constraint;
        consumers restart from the overwrite, as with read_stream).

        Plan growth over LONG histories is capped: each mutation diff
        contributes two anti-joins plus an intersect/exceptAll to the
        union, so every ``checkpoint_every`` versions the accumulated
        feed is localCheckpoint-ed (lineage truncated, partial results
        pinned to executor storage) — a 500-version history builds ~30
        bounded plans instead of one 500-segment plan that chokes the
        optimizer. Set ``checkpoint_every=0`` to disable (bounded
        feeds / pure-append histories don't need it).

        ``update_preimages=True`` switches to Delta CDF's four-type
        contract: changed rows emit BOTH an ``update_preimage`` (the
        old payload) and an ``update_postimage`` row, which is what
        incremental aggregate maintenance needs (subtract the old,
        add the new — see sources/matview.py).

        ``suppress_unchanged=False`` skips the payload-diff set
        operations and emits an update pair for EVERY matched key,
        including rows a mutation carried forward byte-identical —
        the pairs cancel in any delta-algebra consumer (subtract old,
        add new), so incremental aggregates take this mode to save
        two wide shuffles per mutation version. Row-level consumers
        that display or route updates keep the default (an unchanged
        row is not a change)."""
        from pyspark.sql import functions as F

        man = self._load_manifest()["versions"]
        hi = version if version is not None else (man[-1]["version"] if man else 0)
        picked = [
            v for v in man if since_version < v["version"] <= hi
        ]
        pieces: list[DataFrame] = []
        for v in picked:
            if v.get("expired"):
                raise ValueError(f"version {v['version']} was expired by vacuum()")
            if v.get("dv"):
                # pure delete-dv commit: the change set IS the newly
                # tombstoned rows. The sidecar holds only NEW deletions
                # (the delete excluded already-tombstoned rows), so no
                # row's delete is emitted twice.
                pieces.append(
                    self._dv_preimages(spark, v["fragment"])
                    .withColumn("_change_type", F.lit("delete"))
                    .withColumn("_version", F.lit(v["version"]))
                )
                continue
            if v["mode"] in ("overwrite", "restore"):
                raise ValueError(
                    f"version {v['version']} is an {v['mode']} — no row "
                    "lineage; read the snapshot and restart the feed there"
                )
            frag_files = [
                self._relpath(fsio.join(self.path, v["fragment"], n))
                for n in fsio.listdir(fsio.join(self.path, v["fragment"]))
                if n.endswith(".parquet")
            ]
            new = (
                self._read_files(spark, frag_files)
                if frag_files
                else self.read(spark, version=v["version"]).limit(0)
            )
            removed = v.get("removed_files")
            dvf = v.get("dv_fragment")
            if not removed and not dvf:
                pieces.append(
                    new.withColumn("_change_type", F.lit("insert"))
                    .withColumn("_version", F.lit(v["version"]))
                )
                continue
            if dvf and v["mode"] == "update-dv":
                # update-dv fast diff: keys are BIJECTIVE by
                # construction (every tombstoned row has exactly its
                # updated copy in the new fragment — update_where dv
                # appends one copy per matched row), so no key-diff
                # anti-joins are needed: changed payloads are the
                # multiset differences of the two sides. Same output
                # as the general algebra below (identical-payload
                # pairs cancel; no inserts/deletes possible), at two
                # exceptAll shuffles instead of six set operations.
                old = self._dv_preimages(spark, dvf)
                cols = [f.name for f in old.schema.fields]
                new_c = new.select(*cols)
                if suppress_unchanged:
                    updates = new_c.exceptAll(old)
                    pre = old.exceptAll(new_c)
                else:
                    updates, pre = new_c, old
                piece = updates.withColumn(
                    "_change_type",
                    F.lit("update_postimage" if update_preimages else "update"),
                )
                if update_preimages:
                    piece = piece.unionByName(
                        pre.withColumn(
                            "_change_type", F.lit("update_preimage")
                        )
                    )
                pieces.append(piece.withColumn("_version", F.lit(v["version"])))
                continue
            if dvf:
                # merge-dv: the old side IS the rows this commit
                # tombstoned (its pre-images by construction) — the
                # general deletes/inserts/updates algebra applies (the
                # new fragment also carries NOT-MATCHED inserts)
                old = self._dv_preimages(spark, dvf)
            else:
                # old side = the files' LIVE rows as of the commit
                # before this mutation: rows already tombstoned by an
                # earlier DV delete emitted their delete then —
                # counting them as "old" here would re-emit it
                old = self._read_files(
                    spark, removed, dv_as_of=v["version"] - 1
                )
            old_keys = old.select(key).distinct()
            new_keys = new.select(key).distinct()
            deletes = old.join(new_keys, key, "left_anti").withColumn(
                "_change_type", F.lit("delete")
            )
            inserts = new.join(old_keys, key, "left_anti").withColumn(
                "_change_type", F.lit("insert")
            )
            # rows present on both sides: emit as update only when the
            # payload actually changed (a mutation rewrite carries
            # untouched rows of affected files forward unchanged);
            # suppress_unchanged=False emits every matched pair (the
            # delta-algebra consumers cancel them — two fewer shuffles)
            survivors = new.join(old_keys, key, "left_semi")
            if suppress_unchanged:
                unchanged = survivors.intersect(old)
                changed = survivors.exceptAll(unchanged)
            else:
                changed = survivors
            updates = changed.withColumn(
                "_change_type",
                F.lit("update_postimage" if update_preimages else "update"),
            )
            piece = deletes.unionByName(inserts).unionByName(updates)
            if update_preimages:
                # the old payloads of exactly the keys whose payload
                # changed — pre-image rows old-side, mirroring the
                # postimages new-side
                if suppress_unchanged:
                    pre_rows = old.join(
                        changed.select(key).distinct(), key, "left_semi"
                    )
                else:
                    pre_rows = old.join(new_keys, key, "left_semi")
                piece = piece.unionByName(
                    pre_rows.withColumn(
                        "_change_type", F.lit("update_preimage")
                    )
                )
            pieces.append(piece.withColumn("_version", F.lit(v["version"])))
        if not pieces:
            return self.read(spark).limit(0).withColumn(
                "_change_type", F.lit("")
            ).withColumn("_version", F.lit(0))
        out = pieces[0]
        for i, p in enumerate(pieces[1:], start=2):
            out = out.unionByName(p)
            if checkpoint_every and i % checkpoint_every == 0:
                out = out.localCheckpoint(eager=True)
        return out

    # ---------- scalar index (Lance BTREE/BITMAP scalar-index analogue) ----------

    def build_scalar_index(self, spark: SparkSession, col: str) -> int:
        """Build a value → data-file inverted index PLUS a per-file
        min/max range sidecar for ``col`` (the Lance BTREE/BITMAP
        scalar-index story at file granularity): equality/IN lookups
        scan ONLY the files containing the value, and range predicates
        (< > <= >= BETWEEN) scan only files whose span overlaps —
        regardless of how the data is clustered. The complement of zone
        maps, which need the data sorted on the column.

        The sidecar is one small parquet (distinct (value, file) pairs
        — bounded by files × per-file distinct values) written under
        ``_scalar_index/<col>/`` with the dataset version it indexed;
        lookups on a moved-on dataset raise until rebuilt. Returns the
        indexed version."""
        from pyspark.sql import functions as F

        if col not in self.read(spark).columns:
            raise ValueError(f"unknown column {col!r}")
        version = self.versions()[-1]
        tagged = self._tagged_scan(spark)
        # (value, file) plus the row count per pair: the count column
        # upgrades the sidecar from a router to an AGGREGATE answer
        # source — COUNT(*) WHERE col = v sums it without touching data
        # (the reference's AggregateExecutor-near-the-scan idea)
        pairs = tagged.groupBy(F.col(col).alias("value"), "_file").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        out = fsio.join(self.path, "_scalar_index", col, f"v{version:04d}")
        pairs.write.mode("overwrite").parquet(out)
        # per-file min/max sidecar (the BTREE half of the story): lets
        # range predicates (< > <= >= BETWEEN) prune to overlapping
        # files no matter how the data is clustered. One row per file;
        # all-NULL files get NULL bounds and are correctly skipped by
        # range probes (SQL range predicates never match NULL).
        ranges = tagged.groupBy("_file").agg(
            F.min(col).alias("lo"), F.max(col).alias("hi")
        )
        ranges.write.mode("overwrite").parquet(out + "_ranges")
        # per-ROW-GROUP min/max sidecar (Lance BTREE granularity): a
        # selective range predicate inside a large file skips row
        # groups, not just whole files. Footer-only scan, distributed
        # over the file list; skipped (file granularity still works)
        # when footers aren't reachable with pyarrow (non-local FS).
        rg = self._rowgroup_stats(spark, col, ranges.select("_file"))
        if rg is not None:
            rg.write.mode("overwrite").parquet(out + "_rowgroups")
        fsio.write_json_atomic(
            fsio.join(self.path, "_scalar_index", col, "META.json"),
            {"version": version, "col": col},
        )
        return version

    def _rowgroup_stats(self, spark: SparkSession, col: str, files_df: DataFrame):
        """(_file, rg, n_rows, lo, hi) per parquet row group of the
        given files — min/max from footer STATISTICS only (no data
        pages read). The footer scan is distributed: each task opens
        its batch of files with pyarrow. Returns None when the first
        footer isn't pyarrow-reachable (remote FS without fsspec) —
        callers then stay at file granularity."""
        import pandas as _pd

        from lance_flink_spark.session import ship_package

        dtype = self.read(spark).schema[col].dataType.simpleString()
        schema = f"_file string, rg int, n_rows long, lo {dtype}, hi {dtype}"
        ship_package(spark)

        def scan(it):
            import pyarrow.parquet as pq

            for pdf in it:
                out = {"_file": [], "rg": [], "n_rows": [], "lo": [], "hi": []}
                for f in pdf["_file"]:
                    local = f
                    for pref in ("file://", "file:"):
                        if local.startswith(pref):
                            local = local[len(pref):]
                    md = pq.ParquetFile(local).metadata
                    if md.num_row_groups == 0:
                        continue
                    j = next(
                        (
                            i
                            for i in range(md.num_columns)
                            if md.row_group(0).column(i).path_in_schema == col
                        ),
                        None,
                    )
                    for r in range(md.num_row_groups):
                        g = md.row_group(r)
                        st = g.column(j).statistics if j is not None else None
                        ok = st is not None and st.has_min_max
                        out["_file"].append(f)
                        out["rg"].append(r)
                        out["n_rows"].append(g.num_rows)
                        out["lo"].append(st.min if ok else None)
                        out["hi"].append(st.max if ok else None)
                yield _pd.DataFrame(out)

        try:
            # probe one footer driver-side so an unreachable FS fails
            # here (→ None, documented fallback) instead of inside a
            # task at read time
            first = files_df.limit(1).collect()
            if first:
                import pyarrow.parquet as pq

                p = first[0]["_file"]
                for pref in ("file://", "file:"):
                    if p.startswith(pref):
                        p = p[len(pref):]
                pq.ParquetFile(p).metadata  # noqa: B018 - reachability probe
        except Exception:  # noqa: BLE001
            return None
        return files_df.mapInPandas(scan, schema=schema)

    def update_scalar_index(self, spark: SparkSession, col: str) -> int:
        """Catch the scalar index up to the latest version by scanning
        ONLY fragments committed since it was built (Lance's
        optimize_indices delta path): append-only histories index just
        the new files and union the delta into a new version-stamped
        sidecar — the data-scan cost is proportional to NEW data, the
        sidecar rewrite to index size (metadata-scale). Any mutation
        or overwrite in the gap invalidates per-file entries, so those
        fall back to a full ``build_scalar_index`` (correct, just not
        incremental). Returns the indexed version."""
        from pyspark.sql import functions as F

        meta_path = fsio.join(self.path, "_scalar_index", col, "META.json")
        if not fsio.exists(meta_path):
            return self.build_scalar_index(spark, col)
        meta = fsio.read_json(meta_path)
        old_v = int(meta["version"])
        latest = self.versions()[-1]
        if latest == old_v:
            return old_v
        gap = [
            v
            for v in self._load_manifest()["versions"]
            if old_v < v["version"] <= latest
        ]
        # Foldable gap commits: appends ADD per-(value, file) counts;
        # deletion-vector commits SUBTRACT exactly the tombstoned
        # rows' counts (the sidecar names them — cost ∝ the mutation's
        # own footprint, never the corpus) and update/merge-dv data
        # fragments add like appends. Only rewrite mutations
        # (removed_files), overwrite, restore still force the full
        # rebuild: they change surviving file contents in ways no
        # delta describes.
        foldable = all(
            not v.get("removed_files")
            and v["mode"] in ("append", "delete-dv", "update-dv", "merge-dv")
            for v in gap
        )
        if not foldable:
            return self.build_scalar_index(spark, col)
        new_files: list[str] = []
        dv_frags: list[str] = []
        for v in gap:
            if v.get("dv"):
                dv_frags.append(v["fragment"])
                continue
            if v.get("dv_fragment"):
                dv_frags.append(v["dv_fragment"])
            if v["fragment"]:
                frag = fsio.join(self.path, v["fragment"])
                new_files += [
                    self._relpath(fsio.join(frag, n))
                    for n in fsio.listdir(frag)
                    if n.endswith(".parquet")
                ]
        base_old = fsio.join(self.path, "_scalar_index", col, f"v{old_v:04d}")
        out = fsio.join(self.path, "_scalar_index", col, f"v{latest:04d}")
        # (value, relpath, count) of rows the gap's sidecars tombstoned
        sub = None
        for dvf in dv_frags:
            tomb = spark.read.parquet(fsio.join(self.path, dvf))
            files = self._dv_files(spark, dvf, tomb)
            raw = spark.read.schema(self._merged_schema(spark)).parquet(
                *[fsio.join(self.path, f) for f in files]
            )
            keyed = raw.withColumns(
                {
                    "__dv_file": F.expr(
                        "concat('data/', "
                        "substring_index(_metadata.file_path, '/data/', -1))"
                    ),
                    "__dv_pos": F.col("_metadata.row_index"),
                }
            )
            hit = keyed.join(
                F.broadcast(
                    tomb.withColumnsRenamed(
                        {"_file": "__dv_file", "_pos": "__dv_pos"}
                    )
                ),
                ["__dv_file", "__dv_pos"],
                "left_semi",
            )
            piece = hit.groupBy(
                F.col(col).alias("__v"), F.col("__dv_file").alias("__srel")
            ).agg(F.count(F.lit(1)).alias("__sub"))
            sub = piece if sub is None else sub.unionByName(piece)
        if sub is not None:
            sub = sub.groupBy("__v", "__srel").agg(F.sum("__sub").alias("__sub"))
        if not new_files and sub is None:
            # metadata-only versions (e.g. a widening empty fragment):
            # carry the sidecar forward under the new version stamp
            spark.read.parquet(base_old).write.mode("overwrite").parquet(out)
            spark.read.parquet(base_old + "_ranges").write.mode(
                "overwrite"
            ).parquet(out + "_ranges")
            if fsio.exists(base_old + "_rowgroups"):
                spark.read.parquet(base_old + "_rowgroups").write.mode(
                    "overwrite"
                ).parquet(out + "_rowgroups")
            fsio.write_json_atomic(meta_path, {"version": latest, "col": col})
            return latest
        idx = spark.read.parquet(base_old)
        ranges = spark.read.parquet(base_old + "_ranges")
        delta_ranges = None
        if new_files:
            tagged = self._read_files(spark, new_files).withColumn(
                "_file", F.input_file_name()
            )
            idx = idx.unionByName(
                tagged.groupBy(F.col(col).alias("value"), "_file").agg(
                    F.count(F.lit(1)).alias("cnt")
                )
            )
            delta_ranges = tagged.groupBy("_file").agg(
                F.min(col).alias("lo"), F.max(col).alias("hi")
            )
            ranges = ranges.unionByName(delta_ranges)
        rel_of = F.expr("concat('data/', substring_index(_file, '/data/', -1))")
        if sub is not None:
            # decrement the tombstoned counts; a (value, file) posting
            # that reaches zero disappears — count_eq/count_by stay
            # EXACT from the sidecar alone
            idx = (
                idx.withColumn("__rel", rel_of)
                .join(
                    sub,
                    F.col("value").eqNullSafe(F.col("__v"))
                    & (F.col("__rel") == F.col("__srel")),
                    "left",
                )
                .withColumn(
                    "cnt", F.col("cnt") - F.coalesce(F.col("__sub"), F.lit(0))
                )
                .filter(F.col("cnt") > 0)
                .drop("__rel", "__v", "__srel", "__sub")
            )
        idx.write.mode("overwrite").parquet(out)
        if sub is not None:
            # exact per-file bounds for the tombstone-affected files:
            # rescan ONLY them (column-pruned, DV-aware), so minmax()
            # stays exact and range pruning stays tight; a fully-
            # tombstoned file drops out of the ranges sidecar entirely
            affected = sorted(
                r["__srel"] for r in sub.select("__srel").distinct().collect()
            )
            raw = spark.read.schema(self._merged_schema(spark)).parquet(
                *[fsio.join(self.path, f) for f in affected]
            )
            keyed = raw.withColumns(
                {
                    "__dv_file": F.expr(
                        "concat('data/', "
                        "substring_index(_metadata.file_path, '/data/', -1))"
                    ),
                    "__dv_pos": F.col("_metadata.row_index"),
                    "__full": F.col("_metadata.file_path"),
                }
            )
            live_tomb = self._dv_tombstones(spark)
            if live_tomb is not None:
                keyed = keyed.join(
                    F.broadcast(
                        live_tomb.withColumnsRenamed(
                            {"_file": "__dv_file", "_pos": "__dv_pos"}
                        )
                    ),
                    ["__dv_file", "__dv_pos"],
                    "left_anti",
                )
            rec = keyed.groupBy(F.col("__full").alias("_file")).agg(
                F.min(col).alias("lo"), F.max(col).alias("hi")
            )
            ranges = (
                ranges.withColumn("__rel", rel_of)
                .filter(~F.col("__rel").isin(affected))
                .drop("__rel")
                .unionByName(rec)
            )
        ranges.write.mode("overwrite").parquet(out + "_ranges")
        if fsio.exists(base_old + "_rowgroups"):
            # footer stats of existing files are unchanged by DV
            # commits (the bytes are) — stale-but-safe over-
            # approximations for pruning; only new files append
            rg = spark.read.parquet(base_old + "_rowgroups")
            if delta_ranges is not None:
                delta_rg = self._rowgroup_stats(
                    spark, col, delta_ranges.select("_file")
                )
                if delta_rg is not None:
                    rg = rg.unionByName(delta_rg)
            rg.write.mode("overwrite").parquet(out + "_rowgroups")
        fsio.write_json_atomic(meta_path, {"version": latest, "col": col})
        return latest

    _CMP_RE = (
        r"^\s*(\w+)\s*(==|=|<=|>=|<|>)\s*('([^']*)'|-?\d+(?:\.\d+)?)\s*$"
    )
    _BTW_RE = (
        r"^\s*(\w+)\s+between\s+('([^']*)'|-?\d+(?:\.\d+)?)"
        r"\s+and\s+('([^']*)'|-?\d+(?:\.\d+)?)\s*$"
    )
    _LIKE_RE = r"^\s*(\w+)\s+like\s+'([^']*)'\s*$"

    @staticmethod
    def _like_conjuncts(pattern: str) -> list[tuple[str, str]] | None:
        """Range conjuncts that over-approximate ``LIKE pattern`` for
        index pruning (the exact LIKE still filters rows afterward;
        parity with the reference's LIKE pushdown,
        LanceDynamicTableSource.java:260). Only prefix shapes are
        rangeable: ``'abc%'`` → ``>= 'abc' AND < 'abd'``; a pattern
        with interior wildcards prunes on its literal prefix alone; no
        leading-literal prefix (``'%x'``) → not routable."""
        cut = len(pattern)
        for i, ch in enumerate(pattern):
            if ch in "%_":
                cut = i
                break
        prefix = pattern[:cut]
        if not prefix:
            return None
        if cut == len(pattern):  # no wildcard at all: exact equality
            return [("=", prefix)]
        out: list[tuple[str, str]] = [(">=", prefix)]
        # smallest string > every prefix-extension: bump the rightmost
        # non-max char, dropping any trailing U+10FFFF chars
        for i in range(len(prefix) - 1, -1, -1):
            if ord(prefix[i]) < 0x10FFFF:
                out.append(("<", prefix[:i] + chr(ord(prefix[i]) + 1)))
                break
        return out

    @staticmethod
    def _parse_index_filter(filter: str):  # noqa: A002 - mirrors reference option name
        """Parse a declared filter into per-column (op, literal)
        conjuncts routable through scalar indexes: ``col = lit``,
        ``col <op> lit``, ``col BETWEEN a AND b``, ``col LIKE
        'prefix%'``, and AND-chains of those over ANY number of
        columns (the time-range shape ``ts >= a AND ts < b``, and
        multi-column shapes like ``type = 'x' AND ts >= a``). Returns
        ``{col: [(op, value), ...]}`` or None for any shape the
        indexes can't answer (OR, non-literal rhs, ...)."""
        import re as _re

        def lit(raw, s):
            return s if s is not None else (float(raw) if "." in raw else int(raw))

        m = _re.match(Dataset._BTW_RE, filter, _re.IGNORECASE)
        if m:
            return {
                m.group(1): [
                    (">=", lit(m.group(2), m.group(3))),
                    ("<=", lit(m.group(4), m.group(5))),
                ]
            }
        by_col: dict[str, list[tuple[str, object]]] = {}
        for part in _re.split(r"\s+and\s+", filter.strip(), flags=_re.IGNORECASE):
            lk = _re.match(Dataset._LIKE_RE, part, _re.IGNORECASE)
            if lk:
                ranged = Dataset._like_conjuncts(lk.group(2))
                if ranged is None:
                    return None
                by_col.setdefault(lk.group(1), []).extend(ranged)
                continue
            m = _re.match(Dataset._CMP_RE, part)
            if not m:
                return None
            by_col.setdefault(m.group(1), []).append(
                (m.group(2), lit(m.group(3), m.group(4)))
            )
        return by_col or None

    def _column_candidate_files(
        self, spark: SparkSession, col: str, conjuncts
    ) -> set | None:
        """Candidate file set for ONE column's conjuncts via its fresh
        scalar index (equality postings + [lo, hi] range spans) or, for
        a single equality without a scalar index, its bloom sidecar.
        None = this column cannot prune (no/stale index, unroutable
        op) — never an error, the exact filter reapplies regardless."""
        meta_path = fsio.join(self.path, "_scalar_index", col, "META.json")
        if not fsio.exists(meta_path):
            # no scalar index — a bloom sidecar can still answer a
            # single-equality conjunct (the high-cardinality case the
            # scalar sidecar is too big for)
            eqs = [v for op, v in conjuncts if op in ("=", "==")]
            if len(eqs) == len(conjuncts) == 1:
                bmeta = fsio.join(self.path, "_bloom_index", col, "META.json")
                if fsio.exists(bmeta) and self._index_version_usable(
                    fsio.read_json(bmeta)["version"]
                ):
                    from lance_flink_spark.sources.bloom import (
                        bloom_candidate_files,
                    )

                    return set(bloom_candidate_files(self, spark, col, eqs[0]))
            return None
        meta = fsio.read_json(meta_path)
        if not self._index_version_usable(meta["version"]):
            return None
        from pyspark.sql import functions as F

        base = fsio.join(self.path, "_scalar_index", col, f"v{meta['version']:04d}")
        file_sets: list[set] = []
        eqs = [v for op, v in conjuncts if op in ("=", "==")]
        rngs = [(op, v) for op, v in conjuncts if op not in ("=", "==")]
        if eqs:
            idx = spark.read.parquet(base)
            cond = F.lit(True)
            for v in eqs:
                cond = cond & (F.col("value") == F.lit(v))
            file_sets.append(
                {r["_file"] for r in idx.filter(cond).select("_file").distinct().collect()}
            )
        if rngs:
            ranges_path = base + "_ranges"
            if not fsio.exists(ranges_path):
                return None  # index predates range support — rebuild to enable
            ranges = spark.read.parquet(ranges_path)
            # a file overlaps the predicate iff its [lo, hi] span can
            # contain a qualifying value; NULL bounds (all-NULL files)
            # compare to NULL and are pruned, matching SQL range
            # semantics
            cond = F.lit(True)
            for op, v in rngs:
                if op == "<":
                    cond = cond & (F.col("lo") < F.lit(v))
                elif op == "<=":
                    cond = cond & (F.col("lo") <= F.lit(v))
                elif op == ">":
                    cond = cond & (F.col("hi") > F.lit(v))
                elif op == ">=":
                    cond = cond & (F.col("hi") >= F.lit(v))
                else:
                    return None
            file_sets.append(
                {r["_file"] for r in ranges.filter(cond).select("_file").collect()}
            )
        if not file_sets:
            return None
        return set.intersection(*file_sets)

    def _try_index_prune(self, spark: SparkSession, filter: str) -> list[str] | None:
        """File list for an index-routable declared filter (equality,
        IN-able equality chains, range comparisons, BETWEEN, LIKE
        prefixes — AND-chains over any number of columns) by
        INTERSECTING each indexed column's candidate file set: a
        conjunction can only match a file every conjunct's index
        admits. Columns without a fresh index simply don't prune
        (over-approximation is safe — the exact filter reapplies).
        Returns None when no column can prune. Never raises —
        declarative reads must not start failing because an index
        went stale."""
        parsed = self._parse_index_filter(filter)
        if parsed is None:
            return None
        try:
            col_sets = [
                s
                for s in (
                    self._column_candidate_files(spark, col, conjuncts)
                    for col, conjuncts in parsed.items()
                )
                if s is not None
            ]
            if not col_sets:
                return None
            files = set.intersection(*col_sets)
            return [
                fsio.join(self.path, self._relpath(f)) for f in sorted(files)
            ] or None  # empty: let the plain scan return the empty result
        except Exception:  # noqa: BLE001 - index is an optimization, never a failure
            return None

    def _index_version_usable(self, indexed_version: int) -> bool:
        """A sidecar built at ``indexed_version`` still yields a
        correct CANDIDATE file set when every later commit is a pure
        deletion-vector delete: removals only shrink the truth (the
        exact predicate and the DV anti-join re-apply on read), so
        pruning keeps working between a delete and the next index
        refresh. Any other commit (append, update/merge, rewrite,
        overwrite, restore) can hold rows the sidecar never saw —
        false negatives — so it is unusable for pruning."""
        current = self.versions()[-1]
        if indexed_version == current:
            return True
        return all(
            v.get("dv")
            for v in self._load_manifest()["versions"]
            if indexed_version < v["version"] <= current
        )

    def _fresh_index_meta(self, col: str, prune_only: bool = False) -> dict:
        """META for the scalar index on ``col``; raises if absent or
        stale (explicit lookups fail loudly, unlike read()-routing).
        ``prune_only=True`` — for reads that only use the sidecar to
        pick candidate FILES — additionally accepts delete-dv-only
        staleness (see _index_version_usable); sidecar-ANSWERED
        aggregates (count_eq/count_by/minmax) must never pass it, a
        stale count is simply wrong."""
        meta_path = fsio.join(self.path, "_scalar_index", col, "META.json")
        if not fsio.exists(meta_path):
            raise ValueError(f"no scalar index on {col!r} — build_scalar_index first")
        meta = fsio.read_json(meta_path)
        current = self.versions()[-1]
        if meta["version"] != current:
            if prune_only and self._index_version_usable(meta["version"]):
                return meta
            raise ValueError(
                f"scalar index on {col!r} is stale (indexed v{meta['version']}, "
                f"dataset at v{current}) — rebuild"
            )
        return meta

    def read_range(
        self,
        spark: SparkSession,
        col: str,
        lower=None,
        upper=None,
        include_lower: bool = True,
        include_upper: bool = False,
        columns: list[str] | None = None,
    ) -> DataFrame:
        """BTREE-style range lookup through the scalar index: prune to
        the files whose per-file [min, max] span overlaps
        [lower, upper), scan only those, then apply the exact
        predicate. Default bounds are half-open (the time-range idiom);
        pass None to leave a side unbounded. The index probe reads one
        tiny parquet of (file, lo, hi) rows — bounded by file count."""
        from pyspark.sql import functions as F

        if lower is None and upper is None:
            raise ValueError("read_range needs at least one bound")
        meta = self._fresh_index_meta(col, prune_only=True)
        ranges = spark.read.parquet(
            fsio.join(self.path, "_scalar_index", col, f"v{meta['version']:04d}")
            + "_ranges"
        )
        cond = F.lit(True)
        pred = F.lit(True)
        if lower is not None:
            cond = cond & (
                F.col("hi") >= F.lit(lower) if include_lower else F.col("hi") > F.lit(lower)
            )
            pred = pred & (
                F.col(col) >= F.lit(lower) if include_lower else F.col(col) > F.lit(lower)
            )
        if upper is not None:
            cond = cond & (
                F.col("lo") <= F.lit(upper) if include_upper else F.col("lo") < F.lit(upper)
            )
            pred = pred & (
                F.col(col) <= F.lit(upper) if include_upper else F.col(col) < F.lit(upper)
            )
        files = [r["_file"] for r in ranges.filter(cond).select("_file").collect()]
        if not files:
            return self.read(spark).filter(pred).limit(0)
        # ROW-GROUP refinement (Lance BTREE granularity): when the
        # index carries per-row-group stats and they prune strictly
        # more than the file-level bound, read ONLY the qualifying row
        # groups (pyarrow read_row_groups inside mapInPandas). A
        # selective predicate inside a large file stops paying for the
        # whole file. Falls through to the Spark-native file scan when
        # row groups don't prune further — that path keeps codegen +
        # parquet pushdown and is the right default.
        rg_path = (
            fsio.join(self.path, "_scalar_index", col, f"v{meta['version']:04d}")
            + "_rowgroups"
        )
        # the pyarrow row-group path yields raw file contents with no
        # _metadata to anti-join tombstones against — with live
        # deletion vectors, stay on the Spark-native file scan below
        # (still file-pruned, DV-aware, just row-group-coarser)
        if fsio.exists(rg_path) and not self._live_dvs():
            rgs = spark.read.parquet(rg_path).filter(F.col("_file").isin(files))
            # NULL lo/hi = the footer had no usable min/max for this row
            # group (NaN-bearing doubles, truncated binary stats): must
            # READ it — cond alone evaluates NULL -> pruned -> lost rows
            sel = rgs.filter(cond | F.col("lo").isNull())
            # both counts are metadata-parquet-sized (rows = row-group
            # count of the matched files), not data-sized
            n_sel, n_tot = sel.count(), rgs.count()
            if n_sel == 0:
                return self.read(spark).filter(pred).limit(0)
            if n_sel < n_tot:
                # prune columns at the pyarrow read: the predicate col
                # plus the requested projection (everything, if none)
                need = (
                    sorted({col, *columns}) if columns else None
                )
                df = self._read_rowgroups(spark, sel, columns=need).filter(pred)
                return df.select(*columns) if columns else df
        df = self._read_files(
            spark, [self._relpath(f) for f in files], apply_dv=True
        ).filter(pred)
        return df.select(*columns) if columns else df

    def range_rowgroups(
        self,
        spark: SparkSession,
        col: str,
        lower=None,
        upper=None,
        include_lower: bool = True,
        include_upper: bool = False,
    ) -> list[tuple[str, int]]:
        """The (file, row_group) pairs a range probe would read —
        introspection surface for tests and EXPLAIN-style tooling.
        Bounded by the index's row-group count, not data size."""
        from pyspark.sql import functions as F

        meta = self._fresh_index_meta(col)
        rg_path = (
            fsio.join(self.path, "_scalar_index", col, f"v{meta['version']:04d}")
            + "_rowgroups"
        )
        if not fsio.exists(rg_path):
            raise ValueError(f"scalar index on {col!r} has no row-group sidecar")
        cond = F.lit(True)
        if lower is not None:
            cond = cond & (
                F.col("hi") >= F.lit(lower) if include_lower else F.col("hi") > F.lit(lower)
            )
        if upper is not None:
            cond = cond & (
                F.col("lo") <= F.lit(upper) if include_upper else F.col("lo") < F.lit(upper)
            )
        return sorted(
            (r["_file"], r["rg"])
            for r in spark.read.parquet(rg_path)
            .filter(cond | F.col("lo").isNull())  # NULL stats = must-read
            .select("_file", "rg")
            .collect()
        )

    def _read_rowgroups(
        self,
        spark: SparkSession,
        sel: DataFrame,
        columns: list[str] | None = None,
    ) -> DataFrame:
        """Scan ONLY the row groups named by ``sel`` (_file, rg rows):
        group per file, pyarrow read_row_groups per task, one yielded
        batch per row group (memory bounded by row-group size). Output
        conformed to the dataset's full merged schema (projected to
        ``columns`` when given — the pruning reaches the pyarrow read,
        so unneeded column chunks are never decoded), same contract as
        ``_read_files``."""
        import pandas as _pd
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        from lance_flink_spark.session import ship_package

        ship_package(spark)
        target = self.read(spark).schema
        if columns:
            target = T.StructType([f for f in target.fields if f.name in columns])
        names = [f.name for f in target.fields]
        pairs = (
            sel.groupBy("_file")
            .agg(F.sort_array(F.collect_list("rg")).alias("rgs"))
            .repartition(int(spark.conf.get("spark.sql.shuffle.partitions", "32")))
        )

        def scan(it):
            import pyarrow.parquet as pq

            for pdf in it:
                for f, rg_list in zip(pdf["_file"], pdf["rgs"]):
                    local = f
                    for pref in ("file://", "file:"):
                        if local.startswith(pref):
                            local = local[len(pref):]
                    pf = pq.ParquetFile(local)
                    have = set(pf.schema_arrow.names)
                    want = [n for n in names if n in have]
                    for r in rg_list:
                        p = pf.read_row_group(int(r), columns=want).to_pandas()
                        for n in names:
                            if n not in have:
                                p[n] = None
                        yield p[names]

        return pairs.mapInPandas(scan, schema=target)

    def read_in(
        self,
        spark: SparkSession,
        col: str,
        values: list,
        columns: list[str] | None = None,
    ) -> DataFrame:
        """IN-list lookup through the scalar index (bitmap-index union):
        prune to the files containing ANY of ``values``, scan, filter."""
        from pyspark.sql import functions as F

        meta = self._fresh_index_meta(col, prune_only=True)
        idx = spark.read.parquet(
            fsio.join(self.path, "_scalar_index", col, f"v{meta['version']:04d}")
        )
        files = [
            r["_file"]
            for r in idx.filter(F.col("value").isin(values))
            .select("_file")
            .distinct()
            .collect()
        ]
        if not files:
            return self.read(spark).filter(F.col(col).isin(values)).limit(0)
        df = self._read_files(
            spark, [self._relpath(f) for f in files], apply_dv=True
        ).filter(F.col(col).isin(values))
        return df.select(*columns) if columns else df

    def read_eq(
        self,
        spark: SparkSession,
        col: str,
        value,
        columns: list[str] | None = None,
    ) -> DataFrame:
        """Equality lookup through the scalar index: prune to the files
        containing ``value``, scan those, filter. The index probe is
        one tiny parquet read with the value pushed down; the collect
        is bounded by the FILE count for that value."""
        from pyspark.sql import functions as F

        meta = self._fresh_index_meta(col, prune_only=True)
        idx = spark.read.parquet(
            fsio.join(self.path, "_scalar_index", col, f"v{meta['version']:04d}")
        )
        files = [
            r["_file"]
            for r in idx.filter(F.col("value") == F.lit(value)).select("_file").distinct().collect()
        ]
        if not files:
            return self.read(spark).filter(F.col(col) == F.lit(value)).limit(0)
        df = self._read_files(
            spark, [self._relpath(f) for f in files], apply_dv=True
        ).filter(F.col(col) == F.lit(value))
        return df.select(*columns) if columns else df

    def merge_when(
        self,
        spark: SparkSession,
        source: DataFrame,
        on: str,
        clauses: list[dict],
        dv: bool = False,
        tag: str | None = None,
        assume_unique_keys: bool = False,
        new_fragment_partitions: int | None = None,
        pre_commit=None,
    ) -> int:
        """Conditional MERGE (Delta WHEN-clause semantics): ``clauses``
        is an ordered list of
        ``{"matched": bool, "cond": str|None, "action": "update"|
        "delete"|"insert", "sets": dict[str, str]|None}`` — the FIRST
        clause whose condition holds wins per row. Conditions and SET
        expressions reference target columns as ``t.<col>`` and source
        columns as ``s.<col>`` (both sides carry the full schema, so
        qualification is required, as in Delta).

        Pruning matches merge_insert: only files holding a matched key
        are rewritten; NOT MATCHED inserts append. Returns the new
        version.

        ``dv=True``: rows a clause updates or deletes are tombstoned
        by position and the updated copies + admitted inserts land as
        one appended fragment — rows no clause fires on (and every
        unmatched target row) are never read past the key probe or
        rewritten.

        ``tag`` is the write()/streaming-sink idempotency token,
        recorded atomically with the merge commit: a merge whose tag
        already exists is a no-op returning that version (exactly-once
        for replayed micro-batches of a keyed changelog — the
        streaming upsert sink's contract).

        The source may carry EXTRA columns beyond the target schema
        (e.g. a changelog op/sequence column): clause conditions can
        reference them via ``s.<col>``; they are projected away before
        any insert/update lands.

        ``assume_unique_keys=True`` skips the duplicate-key probe (one
        shuffle + driver round-trip per call) — ONLY for callers that
        structurally guarantee one source row per key, e.g. the
        streaming upsert sink's per-batch keep-newest fold; a violated
        promise means multiple clauses fire per target row
        (nondeterministic winner), exactly the ambiguity the probe
        exists to refuse.

        ``new_fragment_partitions`` coalesces the dv-path's appended
        fragment before it lands: a broadcast-joined merge source keeps
        the scan's full partitioning, so a SMALL batch (a streaming
        micro-batch) would otherwise shed dozens of near-empty files
        per commit — the classic small-files tax every later scan and
        schema read pays. Size it to batch volume (the upsert sink
        defaults to 8); leave None for batch-sized merges.

        ``pre_commit`` (dv path): zero-arg callable invoked AFTER the
        merge's write jobs but BEFORE the manifest swap — a durability
        barrier for side-effects that must land before the merge
        becomes visible (the upsert sink's retraction log runs
        concurrently with the write jobs and joins here). If it
        raises, nothing is committed (written files stay invisible)."""
        from pyspark.sql import functions as F

        if tag is not None:
            prev = self.find_tag(tag)
            if prev is not None:
                return prev
        base = len(self.versions())
        scan = self.read(spark)
        missing = [f.name for f in scan.schema.fields if f.name not in source.columns]
        if missing:
            raise ValueError(f"merge source lacks target columns {missing}")
        # conform the key's type for the equi-join; other columns cast
        # per-use (insert/update projections) so extra source columns
        # survive for clause conditions
        source = source.withColumn(
            on, F.col(on).cast(scan.schema[on].dataType)
        )
        if not assume_unique_keys:
            dup = (
                source.groupBy(on).agg(F.count(F.lit(1)).alias("n")).filter("n > 1")
                .limit(1).collect()
            )
            if dup:
                raise ValueError(
                    f"merge source has multiple rows for key {dup[0][0]!r}"
                )
        keys = source.select(on).distinct()
        matched_clauses = [c for c in clauses if c["matched"]]
        insert_clauses = [c for c in clauses if not c["matched"]]
        if dv:
            keyed = self._keyed_live_scan(spark)
            # ONE keyed-state scan per merge: the matched-pair join is
            # persisted (bounded by the matched-row count ≤ source
            # size) and feeds the tombstone write, the updated-copy
            # write AND the not-matched key set — previously the
            # insert anti-join re-scanned the whole state table
            j = keyed.alias("t").join(
                source.alias("s"),
                F.col(f"t.`{on}`") == F.col(f"s.`{on}`"),
                "inner",
            ).persist()
            prior = F.lit(False)
            fired = []  # (clause, fires_cond) — conds pairwise disjoint
            for c in matched_clauses:
                cond = ~prior
                if c.get("cond"):
                    cond = cond & F.expr(c["cond"])
                fired.append((c, cond))
                prior = prior | cond
            # every row SOME clause fires on gets tombstoned (deletes
            # stop there; updates also land their new copy below);
            # matched rows no clause fires on stay untouched on disk
            hit = j.filter(prior)
            tomb = hit.select(
                F.col("t.`__dv_file`").alias("__dv_file"),
                F.col("t.`__dv_pos`").alias("__dv_pos"),
            )
            upd_cond = F.lit(False)
            for c, cond in fired:
                if c["action"] == "update":
                    upd_cond = upd_cond | cond
            out_cols = []
            for f in scan.schema.fields:
                cur = F.col(f"t.`{f.name}`")
                for c, cond in fired:
                    if c["action"] == "update" and f.name in (c.get("sets") or {}):
                        cur = F.when(
                            cond, F.expr(c["sets"][f.name]).cast(f.dataType)
                        ).otherwise(cur)
                out_cols.append(cur.alias(f.name))
            # update conds are pairwise-disjoint refinements of the hit
            # predicate, so filtering the CACHED hit set is identical
            # to re-filtering the join
            new_rows = hit.filter(upd_cond).select(*out_cols)
            if insert_clauses:
                # "not in the state table" ≡ "not among the matched
                # pairs" for source rows — read from the cached join
                # instead of re-scanning state for its full key set
                matched_keys = j.select(F.col(f"s.`{on}`").alias(on)).distinct()
                # no forced broadcast: matched keys scale with the
                # source batch; AQE broadcasts small ones on its own
                inserts = source.join(matched_keys, on, "left_anti")
                fires = F.lit(False)
                for c in insert_clauses:
                    fires = fires | (
                        F.expr(c["cond"]) if c.get("cond") else F.lit(True)
                    )
                new_rows = new_rows.unionByName(
                    inserts.alias("s")
                    .filter(fires)
                    .select(
                        *[
                            F.col(f.name).cast(f.dataType).alias(f.name)
                            for f in scan.schema.fields
                        ]
                    )
                )
            if new_fragment_partitions is not None:
                new_rows = new_rows.coalesce(int(new_fragment_partitions))
            try:
                v = self._mutate_dv_commit(
                    spark, tomb, new_rows, "merge-dv", tag=tag,
                    pre_commit=pre_commit,
                )
            finally:
                j.unpersist()
            return base if v is None else v
        affected = self._affected_files(
            self._tagged_scan(spark).join(keys, on, "left_semi")
        )

        pieces = []
        if affected:
            tgt = self._read_files(spark, affected, apply_dv=True)
            j = tgt.alias("t").join(
                source.alias("s"),
                F.col(f"t.`{on}`") == F.col(f"s.`{on}`"),
                "left",
            )
            is_matched = F.col(f"s.`{on}`").isNotNull()
            prior = F.lit(False)
            fired = []  # (clause, fires_cond)
            for c in matched_clauses:
                cond = is_matched & ~prior
                if c.get("cond"):
                    cond = cond & F.expr(c["cond"])
                fired.append((c, cond))
                prior = prior | cond
            drop = F.lit(False)
            for c, cond in fired:
                if c["action"] == "delete":
                    drop = drop | cond
            survivors = j.filter(~drop)
            out_cols = []
            for f in scan.schema.fields:
                cur = F.col(f"t.`{f.name}`")
                for c, cond in fired:
                    if c["action"] == "update" and f.name in (c.get("sets") or {}):
                        cur = F.when(
                            cond, F.expr(c["sets"][f.name]).cast(f.dataType)
                        ).otherwise(cur)
                out_cols.append(cur.alias(f.name))
            pieces.append(survivors.select(*out_cols))
        if insert_clauses:
            inserts = source.join(
                scan.select(on).distinct(), on, "left_anti"
            )
            # first-match-wins over EVERY NOT MATCHED clause: all insert
            # actions are insert-all here, so the row is inserted iff
            # any clause fires (an unconditional clause fires always) —
            # honoring only clause[0] would silently drop rows admitted
            # by later clauses
            fires = F.lit(False)
            for c in insert_clauses:
                fires = fires | (F.expr(c["cond"]) if c.get("cond") else F.lit(True))
            inserts = inserts.alias("s").filter(fires)
            pieces.append(
                inserts.select(
                    *[
                        F.col(f.name).cast(f.dataType).alias(f.name)
                        for f in scan.schema.fields
                    ]
                )
            )
        if affected:
            merged = pieces[0]
            for p in pieces[1:]:
                merged = merged.unionByName(p)
            return self._mutate_commit(
                merged, affected, "merge", base_version=base, tag=tag
            )
        if pieces:
            return self.write(pieces[-1], mode="append", tag=tag)
        return base

    # ---------- CHECK constraints (Delta constraint parity) ----------

    def constraints(self) -> dict:
        """{name: boolean SQL expr} currently enforced on writes."""
        return dict(self._load_manifest().get("constraints", {}))

    def add_constraint(self, spark: SparkSession, name: str, expr: str) -> None:
        """Add a CHECK constraint (Delta `ALTER TABLE ADD CONSTRAINT`
        semantics): EXISTING data is validated first — a constraint the
        current table violates is refused — then the expr is persisted
        in the manifest and every subsequent ``write`` enforces it.
        SQL-standard CHECK: a row violates only when the expr is
        FALSE (NULL passes)."""
        bad = self.read(spark).filter(f"not coalesce(({expr}), true)").limit(1)
        if bad.count() > 0:
            raise ValueError(
                f"cannot add constraint {name!r}: existing rows violate ({expr})"
            )
        man = self._load_manifest()
        man.setdefault("constraints", {})[name] = expr
        fsio.write_json_atomic(self._manifest_path(), man)

    def drop_constraint(self, name: str) -> None:
        man = self._load_manifest()
        if name not in man.get("constraints", {}):
            raise ValueError(f"no constraint {name!r}")
        del man["constraints"][name]
        fsio.write_json_atomic(self._manifest_path(), man)

    def _enforce_constraints(self, df: DataFrame) -> None:
        """Fail a write whose frame violates any CHECK constraint.
        Fail-fast (limit 1) per constraint — the write's own scan does
        the full pass; this probe only proves a violation exists."""
        for name, expr in self.constraints().items():
            bad = df.filter(f"not coalesce(({expr}), true)").limit(1)
            if bad.count() > 0:
                raise ValueError(
                    f"write violates CHECK constraint {name!r} ({expr})"
                )

    def count_by(self, spark: SparkSession, col: str) -> DataFrame:
        """The ENTIRE ``GROUP BY col COUNT(*)`` answered from the
        scalar-index sidecar — zero data files opened (count_eq's
        single-value fast path generalized to the full aggregate: the
        sidecar's per-(value, file) counts sum per value). The
        reference's AggregateExecutor-near-the-scan idea at its
        limit."""
        from pyspark.sql import functions as F

        meta = self._fresh_index_meta(col)
        idx = spark.read.parquet(
            fsio.join(self.path, "_scalar_index", col, f"v{meta['version']:04d}")
        )
        if "cnt" not in idx.columns:
            raise ValueError(
                f"scalar index on {col!r} predates count support — rebuild"
            )
        return idx.groupBy(F.col("value").alias(col)).agg(
            F.sum("cnt").alias("cnt")
        )

    def minmax(self, spark: SparkSession, col: str) -> tuple:
        """Global (min, max) of an indexed column from the per-file
        ranges sidecar — file-count rows scanned, zero data reads."""
        from pyspark.sql import functions as F

        meta = self._fresh_index_meta(col)
        ranges = spark.read.parquet(
            fsio.join(self.path, "_scalar_index", col, f"v{meta['version']:04d}")
            + "_ranges"
        )
        row = ranges.agg(F.min("lo").alias("lo"), F.max("hi").alias("hi")).first()
        return row["lo"], row["hi"]

    # ---------- bloom sidecar (high-cardinality equality; sources/bloom.py) ----------

    def build_bloom_index(self, spark: SparkSession, col: str, fpp: float = 0.01) -> int:
        from lance_flink_spark.sources.bloom import build_bloom_index

        return build_bloom_index(self, spark, col, fpp)

    def read_eq_bloom(
        self, spark: SparkSession, col: str, value, columns: list[str] | None = None
    ) -> DataFrame:
        from lance_flink_spark.sources.bloom import read_eq_bloom

        return read_eq_bloom(self, spark, col, value, columns)

    def count_eq(self, spark: SparkSession, col: str, value) -> int:
        """``COUNT(*) WHERE col = value`` answered ENTIRELY from the
        scalar-index sidecar — zero data files opened (the reference's
        aggregate-pushdown-near-the-scan idea taken to its limit: the
        sidecar's per-(value, file) row counts ARE the aggregate).
        Requires a fresh index built with count support; raises the
        same staleness error as the other indexed lookups."""
        from pyspark.sql import functions as F

        meta = self._fresh_index_meta(col)
        idx = spark.read.parquet(
            fsio.join(self.path, "_scalar_index", col, f"v{meta['version']:04d}")
        )
        if "cnt" not in idx.columns:
            raise ValueError(
                f"scalar index on {col!r} predates count support — rebuild "
                "with build_scalar_index to enable index-answered counts"
            )
        row = (
            idx.filter(F.col("value") == F.lit(value))
            .agg(F.sum("cnt").alias("n"))
            .first()
        )
        return int(row["n"] or 0)

    def vacuum(
        self,
        keep_versions: int = 1,
        orphan_grace_seconds: float = 24 * 3600,
    ) -> list[str]:
        """Lance cleanup_old_versions parity: physically delete data
        files unreachable from every one of the newest
        ``keep_versions`` versions, and mark older versions expired
        (their manifest entries STAY — later versions' live sets are
        replayed through them — but time travel to them now raises).
        Returns the deleted file paths.

        A file survives if ANY retained version can still read it —
        including files of an old fragment that a retained append
        chain carries forward, minus files a retained mutation has
        superseded in all retained states. O(#fragments) driver-side
        metadata work plus one delete per dead file; no Spark job.

        Also sweeps ORPHAN fragments — directories under ``data/``
        that no manifest version references, left behind when a writer
        crashed between its parquet write and the manifest swap (the
        commit protocol makes them invisible, but the bytes stay).
        Only orphans older than ``orphan_grace_seconds`` go (default
        24 h — an IN-FLIGHT writer's fragment is also unreferenced
        until its commit lands; the grace window is what keeps vacuum
        safe to run concurrently with writers, same rule as Delta
        VACUUM's retention check)."""
        if keep_versions < 1:
            raise ValueError("keep_versions must be >= 1")
        man = self._load_manifest()
        vs = man["versions"]
        # cut <= 0 keeps every version; the orphan sweep below still runs
        cut = max(0, len(vs) - keep_versions)
        keep_files: set[str] = set()
        live_frags: set[str] = set()
        for v in vs[cut:]:
            frags, removed = self._live_state(v["version"])
            for frag in frags:
                live_frags.add(self._relpath(frag))
                for name in fsio.listdir(frag):
                    rel = self._relpath(fsio.join(frag, name))
                    if name.endswith(".parquet") and rel in removed:
                        continue
                    keep_files.add(rel)
            # deletion-vector sidecars a retained version still applies
            # are load-bearing metadata — without them the version
            # would resurrect deleted rows
            for dvfrag in self._live_dvs(v["version"]):
                live_frags.add(dvfrag)
                dvp = fsio.join(self.path, dvfrag)
                if fsio.exists(dvp):
                    for name in fsio.listdir(dvp):
                        keep_files.add(self._relpath(fsio.join(dvp, name)))
        deleted: list[str] = []
        for v in vs:
            owned = [v["fragment"]]
            if v.get("dv_fragment"):
                owned.append(v["dv_fragment"])
            for frag in owned:
                if v["mode"] == "restore" or not frag:
                    continue  # metadata-only commits own no fragment dir
                frag_path = fsio.join(self.path, frag)
                if not fsio.exists(frag_path):
                    continue
                names = fsio.listdir(frag_path)
                dead = [
                    n
                    for n in names
                    if self._relpath(fsio.join(frag_path, n)) not in keep_files
                ]
                # whole-dir delete ONLY for fragments no retained
                # version lists as live: a live fragment whose parquet
                # files were all superseded by a mutation must keep its
                # directory — _live_paths listdirs every live fragment,
                # and with _SUCCESS markers disabled (common on object
                # stores) nothing else would save the dir
                if len(dead) == len(names) and frag not in live_frags:
                    fsio.delete(frag_path)
                    deleted.extend(fsio.join(frag, n) for n in dead)
                else:
                    for n in dead:
                        if n.endswith(".parquet"):
                            fsio.delete(fsio.join(frag_path, n))
                            deleted.append(fsio.join(frag, n))
        known = {v["fragment"] for v in vs} | {
            v["dv_fragment"] for v in vs if v.get("dv_fragment")
        }
        data_dir = fsio.join(self.path, "data")
        if fsio.exists(data_dir):
            for name in fsio.listdir(data_dir):
                rel = f"data/{name}"
                if rel in known:
                    continue
                p = fsio.join(data_dir, name)
                if time.time() - fsio.mtime(p) < orphan_grace_seconds:
                    continue
                fsio.delete(p)
                deleted.append(rel)
        for v in vs[:cut]:
            v["expired"] = True
        fsio.write_json_atomic(self._manifest_path(), man)
        return deleted

    @classmethod
    def open(cls, opts: DatasetOptions) -> "Dataset":
        return cls(opts.path)

    def read_with_options(self, spark: SparkSession, opts: DatasetOptions) -> DataFrame:
        return self.read(
            spark,
            columns=opts.read_columns,
            filter=opts.read_filter,
            limit=opts.read_limit,
            batch_size=opts.read_batch_size,
        )

    def count_rows(self, spark: SparkSession, version: int | None = None) -> int:
        """COUNT(*) — Spark answers this from parquet footers
        (metadata-only), matching the reference's isSimpleCountStar
        fast path (AggregateExecutor.java:218)."""
        return self.read(spark, version=version).count()
