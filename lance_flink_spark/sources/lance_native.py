"""Native Lance dataset reader — pure Python + pyarrow, no Lance lib.

The reference delegates ALL storage to ``com.lancedb.lance.Dataset``
(LanceSink.java:32, LanceInputFormat.java), and this repo's Dataset
emulates those semantics over parquet — the one gap SURVEY §6 lists is
the native FORMAT itself. This module closes the read side for the
format subset the reference's own committed test datasets use
(``/root/reference/test-data/*``: manifest-versioned datasets with
"Lance File 2.0" data files, flat *value* page encodings over
int64/int32/float/double/string/list<primitive>, no nulls, no deletion
files). Everything else raises :class:`UnsupportedLanceFeature` LOUDLY
— a partial reader that guessed at unknown encodings would be silent
corruption.

Layout knowledge comes from the public Lance format specification
(lancedb/lance ``format.proto`` / file-format docs):

- ``_versions/N.manifest``: u32-length-prefixed protobuf. Field 1 =
  schema fields (name=2, id=3, parent_id=4 (-1 top-level),
  logical_type=5 e.g. 'int64'/'string'/'list', nullable=6), field 2 =
  fragments (files: path=1, field ids=2 packed, column indices=3
  packed; physical_rows=4), field 3 = version, field 15 = data
  storage format ('lance', '2.0').
- ``data/*.lance`` (file v2): 40-byte footer ``<QQQIIHH4s`` =
  (column_meta_start, column_meta_offsets_start,
  global_buff_offsets_start, n_global_buffers, n_columns, major,
  minor, b'LANC'); per-column metadata protobuf: field 2 = pages
  (buffer_offsets=1 packed, buffer_sizes=2 packed, length=3 rows,
  encoding=4).
- Flat value pages: primitives are one raw little-endian buffer;
  strings are (end-offsets int64, utf8 bytes); a list field occupies
  one column of end-offsets with its child's values in the following
  column — Arrow's offsets are the same array with a leading 0.

Spark-first: fragments decode to Arrow tables and land via
``spark.createDataFrame`` — on a cluster, list the fragments and
parallelize per-fragment decode (each fragment is independent); the
reference datasets are single-fragment.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass, field as dc_field

import numpy as np

FOOTER = struct.Struct("<QQQIIHH4s")
MAGIC = b"LANC"


class UnsupportedLanceFeature(NotImplementedError):
    """The dataset uses a Lance feature outside the documented subset
    (nulls, non-value encodings, deletion files, multi-page varlen
    columns, exotic types). Refusing beats silently-wrong rows."""


# ---------- minimal protobuf ----------


def _varint(b: bytes, i: int) -> tuple[int, int]:
    x = s = 0
    while True:
        x |= (b[i] & 0x7F) << s
        s += 7
        if not b[i] & 0x80:
            return x, i + 1
        i += 1


def _fields(b: bytes):
    """Yield (field_no, wire_type, value) triplets of one message."""
    i = 0
    while i < len(b):
        key, i = _varint(b, i)
        f, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _varint(b, i)
        elif wt == 1:
            v = struct.unpack_from("<Q", b, i)[0]
            i += 8
        elif wt == 5:
            v = struct.unpack_from("<I", b, i)[0]
            i += 4
        elif wt == 2:
            n, i = _varint(b, i)
            v = b[i : i + n]
            i += n
        else:
            raise UnsupportedLanceFeature(f"protobuf wire type {wt}")
        yield f, wt, v


def _packed(b: bytes) -> list[int]:
    out, i = [], 0
    while i < len(b):
        v, i = _varint(b, i)
        out.append(v)
    return out


# ---------- manifest ----------

_TOP = (1 << 64) - 1  # parent_id of top-level fields (-1 as uint64)


@dataclass
class LanceField:
    name: str
    fid: int = 0
    parent: int = _TOP
    logical: str = ""
    children: list = dc_field(default_factory=list)


@dataclass
class LanceFragment:
    path: str
    field_ids: list[int] = dc_field(default_factory=list)
    column_indices: list[int] = dc_field(default_factory=list)
    physical_rows: int = 0


def parse_manifest(raw: bytes):
    """(top-level LanceFields, LanceFragments, version). The manifest
    is u32-length-prefixed."""
    (n,) = struct.unpack_from("<I", raw, 0)
    body = raw[4 : 4 + n]
    flat: list[LanceField] = []
    frags: list[LanceFragment] = []
    version = 0
    for f, _wt, v in _fields(body):
        if f == 1:  # Field
            lf = LanceField(name="")
            for ff, _w, fv in _fields(v):
                if ff == 2:
                    lf.name = fv.decode()
                elif ff == 3:
                    lf.fid = fv
                elif ff == 4:
                    lf.parent = fv
                elif ff == 5:
                    lf.logical = fv.decode()
            flat.append(lf)
        elif f == 2:  # DataFragment
            fr = LanceFragment(path="")
            for ff, _w, fv in _fields(v):
                if ff == 2:  # DataFile
                    for df, _x, dv in _fields(fv):
                        if df == 1:
                            fr.path = dv.decode()
                        elif df == 2:
                            fr.field_ids = _packed(dv)
                        elif df == 3:
                            fr.column_indices = _packed(dv)
                elif ff == 3:
                    raise UnsupportedLanceFeature(
                        "fragment carries a deletion file"
                    )
                elif ff == 4:
                    fr.physical_rows = fv
            frags.append(fr)
        elif f == 3:
            version = v
    # nest children under their parents
    by_id = {lf.fid: lf for lf in flat}
    top = []
    for lf in flat:
        if lf.parent == _TOP:
            top.append(lf)
        else:
            by_id[lf.parent].children.append(lf)
    return top, frags, version


# ---------- data file ----------


def _column_pages(blob: bytes, pos: int, size: int):
    """[(buffer_offsets, buffer_sizes, rows)] for one column."""
    pages = []
    for f, _wt, v in _fields(blob[pos : pos + size]):
        if f != 2:
            continue
        offs, sizes, rows = [], [], 0
        for pf, _w, pv in _fields(v):
            if pf == 1:
                offs = _packed(pv)
            elif pf == 2:
                sizes = _packed(pv)
            elif pf == 3:
                rows = pv
        pages.append((offs, sizes, rows))
    return pages


_PRIM = {
    "int64": ("<i8", 8),
    "int32": ("<i4", 4),
    "float": ("<f4", 4),
    "double": ("<f8", 8),
}


def _read_primitive(blob, pages, dtype, width):
    parts = []
    for offs, sizes, rows in pages:
        if len(offs) != 1 or sizes[0] != rows * width:
            raise UnsupportedLanceFeature(
                f"non-flat primitive page (buffers={len(offs)}, "
                f"size={sizes} rows={rows} width={width}) — likely a "
                "nullable or compressed encoding"
            )
        parts.append(
            np.frombuffer(blob, dtype=dtype, count=rows, offset=offs[0])
        )
    return np.concatenate(parts) if len(parts) != 1 else parts[0]


def _read_varlen(blob, pages):
    """(end_offsets int64, payload bytes) of a single-page varlen
    column (string offsets+bytes, or list offsets alone)."""
    if len(pages) != 1:
        raise UnsupportedLanceFeature("multi-page varlen column")
    return pages[0]


def read_fragment_table(path: str, top_fields: list[LanceField]):
    """Decode one .lance data file into a pyarrow.Table."""
    import pyarrow as pa

    size = os.path.getsize(path)
    if size > 256 * 1024 * 1024:
        raise UnsupportedLanceFeature(
            f"{path} is {size} bytes — this reader decodes one fragment "
            "in memory (the documented subset covers the reference's "
            "committed test data); production-scale fragments need the "
            "Lance library's streaming reader"
        )
    blob = open(path, "rb").read()
    (
        _cms,
        cmos,
        _gbos,
        _ngb,
        ncol,
        _major,
        _minor,
        magic,
    ) = FOOTER.unpack(blob[-FOOTER.size :])
    if magic != MAGIC:
        raise UnsupportedLanceFeature(f"bad magic {magic!r} in {path}")
    col_pages = []
    for c in range(ncol):
        pos, size = struct.unpack_from("<QQ", blob, cmos + 16 * c)
        col_pages.append(_column_pages(blob, pos, size))

    # columns are laid out depth-first over the schema fields
    ci = 0
    names, arrays = [], []
    for lf in top_fields:
        if lf.logical in _PRIM:
            dtype, width = _PRIM[lf.logical]
            arrays.append(pa.array(_read_primitive(blob, col_pages[ci], dtype, width)))
            ci += 1
        elif lf.logical.startswith("timestamp:"):
            # 'timestamp:<unit>:<tz|->' — int64 ticks of <unit>
            _t, unit, tz = lf.logical.split(":", 2)
            if unit not in ("s", "ms", "us", "ns"):
                raise UnsupportedLanceFeature(lf.logical)
            vals = _read_primitive(blob, col_pages[ci], "<i8", 8)
            arrays.append(
                pa.array(
                    vals,
                    type=pa.timestamp(unit, None if tz == "-" else tz),
                )
            )
            ci += 1
        elif lf.logical == "string":
            offs, sizes, rows = _read_varlen(blob, col_pages[ci])
            if len(offs) != 2 or sizes[0] != rows * 8:
                raise UnsupportedLanceFeature(
                    f"string column with buffers={len(offs)} sizes={sizes}"
                )
            ends = np.frombuffer(blob, "<i8", count=rows, offset=offs[0])
            data = blob[offs[1] : offs[1] + sizes[1]]
            if rows and ends[-1] != sizes[1]:
                raise UnsupportedLanceFeature(
                    f"string ends {ends[-1]} != payload {sizes[1]}"
                )
            arro = np.concatenate([[0], ends]).astype("<i8")
            arrays.append(
                pa.LargeStringArray.from_buffers(
                    rows, pa.py_buffer(arro.tobytes()), pa.py_buffer(data)
                )
            )
            ci += 1
        elif lf.logical == "list" and len(lf.children) == 1 and lf.children[0].logical in _PRIM:
            offs, sizes, rows = _read_varlen(blob, col_pages[ci])
            if len(offs) != 1 or sizes[0] != rows * 8:
                raise UnsupportedLanceFeature(
                    f"list-offsets column with buffers={len(offs)}"
                )
            ends = np.frombuffer(blob, "<i8", count=rows, offset=offs[0])
            ci += 1
            dtype, width = _PRIM[lf.children[0].logical]
            child = _read_primitive(blob, col_pages[ci], dtype, width)
            ci += 1
            if rows and ends[-1] != len(child):
                raise UnsupportedLanceFeature(
                    f"list ends {ends[-1]} != child length {len(child)}"
                )
            arro = np.concatenate([[0], ends]).astype("<i8")
            arrays.append(
                pa.LargeListArray.from_arrays(
                    pa.array(arro, type=pa.int64()), pa.array(child)
                )
            )
        else:
            raise UnsupportedLanceFeature(
                f"field {lf.name!r}: logical type {lf.logical!r}"
            )
        names.append(lf.name)
    return pa.table(dict(zip(names, arrays)))


# ---------- dataset ----------


class LanceNativeDataset:
    """Read-only native Lance dataset: versions, schema, Arrow and
    Spark reads. Writes stay on this repo's parquet-backed Dataset —
    the reference's write path needs the Lance library itself."""

    def __init__(self, root: str):
        self.root = root
        vdir = os.path.join(root, "_versions")
        if not os.path.isdir(vdir):
            raise FileNotFoundError(f"{root} has no _versions/ directory")
        self._manifests = sorted(
            int(f.split(".")[0])
            for f in os.listdir(vdir)
            if f.endswith(".manifest")
        )
        if not self._manifests:
            raise FileNotFoundError(f"{root} has no manifests")

    def versions(self) -> list[int]:
        return list(self._manifests)

    def _manifest(self, version: int | None = None):
        v = version if version is not None else self._manifests[-1]
        raw = open(
            os.path.join(self.root, "_versions", f"{v}.manifest"), "rb"
        ).read()
        return parse_manifest(raw)

    def to_arrow(self, version: int | None = None):
        import pyarrow as pa

        fields, frags, _v = self._manifest(version)
        tables = [
            read_fragment_table(
                os.path.join(self.root, "data", fr.path), fields
            )
            for fr in frags
        ]
        t = pa.concat_tables(tables)
        total = sum(fr.physical_rows for fr in frags)
        if total and t.num_rows != total:
            raise UnsupportedLanceFeature(
                f"decoded {t.num_rows} rows, manifest says {total}"
            )
        return t

    def read(self, spark, version: int | None = None):
        """Spark DataFrame of the dataset (Arrow-bridged; large_*
        types downcast so Spark sees plain string / array<float>)."""
        import pyarrow as pa

        t = self.to_arrow(version)
        cast = []
        for f in t.schema:
            if pa.types.is_large_string(f.type):
                cast.append(pa.field(f.name, pa.string()))
            elif pa.types.is_large_list(f.type):
                cast.append(pa.field(f.name, pa.list_(f.type.value_type)))
            else:
                cast.append(f)
        t = t.cast(pa.schema(cast))
        return spark.createDataFrame(t.to_pandas())
