"""Property-based tests (hypothesis) — independent implementations as
oracles on randomized inputs."""

import pandas as pd
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from lance_flink_spark.operators.dedup import exact_dedup
from lance_flink_spark.operators.temporal import asof_join

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from lance_flink_spark.session import get_spark

        _spark = get_spark("props", shuffle_partitions=4)
        _spark.sparkContext.setLogLevel("ERROR")
    return _spark


ts_strategy = st.integers(min_value=0, max_value=10_000)


@settings(max_examples=15, deadline=None)
@given(
    left=st.lists(st.tuples(st.integers(1, 3), ts_strategy), min_size=1, max_size=12),
    right=st.lists(st.tuples(st.integers(1, 3), ts_strategy), min_size=1, max_size=12),
)
def test_asof_join_matches_pandas_merge_asof(left, right):
    """Our union+window asof join vs pandas.merge_asof (an entirely
    independent implementation) on random keyed event sequences.
    Unique timestamps per key on the right side (merge_asof picks the
    last among right ties arbitrarily wrt a secondary payload)."""
    right = list({(k, t): None for k, t in right})  # dedupe exact (k,t)
    spark = _get_spark()
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "id long, k long, ts long"
    ).withColumn("ts", F.timestamp_seconds("ts"))
    rdf = spark.createDataFrame(
        [(k, t, t * 10 + k) for (k, t) in right], "k long, ts long, payload long"
    ).withColumn("ts", F.timestamp_seconds("ts"))
    got = {
        r["id"]: r["payload"]
        for r in asof_join(ldf, rdf, on="k", right_payload=["payload"]).collect()
    }

    lp = pd.DataFrame(
        {"id": range(len(left)), "k": [k for k, _ in left], "ts": [t for _, t in left]}
    ).sort_values("ts", kind="stable")
    rp = pd.DataFrame(
        {"k": [k for k, _ in right], "ts": [t for _, t in right],
         "payload": [t * 10 + k for k, t in right]}
    ).sort_values("ts", kind="stable")
    merged = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    want = {
        int(r.id): (None if pd.isna(r.payload) else int(r.payload))
        for r in merged.itertuples()
    }
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    events=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 20000)), min_size=1, max_size=25
    )
)
def test_sessionize_matches_python_reference(events):
    """Gap-based sessionization vs a direct per-user Python scan."""
    spark = _get_spark()
    rows = [(i, k, t) for i, (k, t) in enumerate(events)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts long").withColumn(
        "ts", F.timestamp_seconds("ts")
    )
    from lance_flink_spark.streaming.windows import sessionize

    got = {
        r["user_id"]: (r["n_sessions"], r["n_events"], r["max_session_events"])
        for r in sessionize(df, gap_seconds=1800).collect()
    }
    by_user: dict = {}
    for i, k, t in rows:
        by_user.setdefault(k, []).append((t, i))
    want = {}
    for k, ts in by_user.items():
        ts.sort()
        sessions, cur = [], [ts[0]]
        for prev, nxt in zip(ts, ts[1:]):
            if nxt[0] - prev[0] > 1800:
                sessions.append(cur)
                cur = []
            cur.append(nxt)
        sessions.append(cur)
        want[k] = (len(sessions), len(ts), max(len(s) for s in sessions))
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    left=st.lists(st.tuples(st.integers(1, 2), st.integers(0, 5000)), min_size=1, max_size=10),
    right=st.lists(st.tuples(st.integers(1, 2), st.integers(0, 5000)), min_size=1, max_size=10),
)
def test_interval_join_matches_quadratic_reference(left, right):
    """interval_join vs brute-force pair enumeration (600s bound)."""
    spark = _get_spark()
    from lance_flink_spark.operators.temporal import interval_join

    ldf = spark.createDataFrame(left, "k long, ts long").withColumn(
        "ts", F.timestamp_seconds("ts")
    )
    rdf = spark.createDataFrame(right, "k long, ts long").withColumn(
        "ts", F.timestamp_seconds("ts")
    )
    got = interval_join(ldf, rdf, on="k", upper="600 seconds").count()
    want = sum(
        1
        for lk, lt in left
        for rk, rt in right
        if lk == rk and lt <= rt <= lt + 600
    )
    assert got == want


@settings(max_examples=15, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="abc XY.,", min_size=0, max_size=20), min_size=1, max_size=15
    )
)
def test_exact_dedup_partitions_by_normalized_text(texts):
    """exact_dedup emits one keeper per normalized-text class, keeper
    is the min id, and copy counts sum to the input size."""
    import re

    spark = _get_spark()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = exact_dedup(df).collect()

    def norm(t):
        return re.sub(r"[^a-z0-9]+", " ", t.lower()).strip()

    classes = {}
    for i, t in enumerate(texts):
        classes.setdefault(norm(t), []).append(i)
    assert len(out) == len(classes)
    got = {r["keep_id"]: r["n_copies"] for r in out}
    want = {min(v): len(v) for v in classes.values()}
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    docs=st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 40)),  # (partition, n_tokens)
        min_size=1,
        max_size=15,
    ),
    budget=st.integers(3, 17),
)
def test_pack_spans_matches_python_packer(docs, budget):
    """pack_spans (window prefix-sum + sequence explode) vs a direct
    sequential concat-and-chop packer on random corpora: identical
    (doc, seq, slice) rows — every token placed exactly once, in
    order."""
    spark = _get_spark()
    from lance_flink_spark.operators.packing import pack_spans

    rows = [
        (i, " ".join(f"w{j}" for j in range(n)), f"p{p}")
        for i, (p, n) in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        (r["doc_id"], r["lang"], r["seq_id"], r["tok_from"], r["tok_to"])
        for r in pack_spans(df, budget=budget).collect()
    }
    want = set()
    for part in sorted({f"p{p}" for p, _ in docs}):
        pos = 0
        for i, (p, n) in enumerate(docs):
            if f"p{p}" != part or n == 0:
                continue
            start, end = pos, pos + n
            for s in range(start // budget, (end - 1) // budget + 1):
                want.add(
                    (i, part, s, max(start, s * budget) - start, min(end, (s + 1) * budget) - start)
                )
            pos = end
    assert got == want


@settings(max_examples=10, deadline=None)
@given(
    corpus=st.lists(st.lists(st.integers(0, 5), min_size=0, max_size=8), min_size=1, max_size=8),
    evals=st.lists(st.lists(st.integers(0, 5), min_size=0, max_size=8), min_size=1, max_size=4),
)
def test_decontaminate_matches_python_sets(corpus, evals):
    """decontaminate vs brute-force Python 3-gram set intersection on
    random token sequences."""
    spark = _get_spark()
    from lance_flink_spark.operators.dedup import decontaminate

    def text(toks):
        return " ".join(f"t{x}" for x in toks)

    def grams(toks):
        return {tuple(toks[i : i + 3]) for i in range(len(toks) - 2)}

    cdf = spark.createDataFrame(
        [(i, text(t)) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    edf = spark.createDataFrame(
        [(1000 + i, text(t)) for i, t in enumerate(evals)], "doc_id long, text string"
    )
    ev = set().union(*(grams(t) for t in evals)) if evals else set()
    want = {
        i: len(grams(t) & ev) for i, t in enumerate(corpus) if len(grams(t) & ev) > 0
    }
    got = {r["doc_id"]: r["n_hits"] for r in decontaminate(cdf, edf).collect()}
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    base=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 100)),
        min_size=1, max_size=20, unique_by=lambda t: t[0],
    ),
    ops=st.lists(
        st.one_of(
            st.tuples(st.just("delete"), st.integers(0, 100)),
            st.tuples(st.just("update"), st.integers(0, 100)),
            st.tuples(
                st.just("merge"),
                st.lists(
                    st.tuples(st.integers(0, 40), st.integers(200, 300)),
                    min_size=1, max_size=5, unique_by=lambda t: t[0],
                ),
            ),
        ),
        min_size=1, max_size=4,
    ),
)
def test_mutation_sequence_matches_pandas_model(tmp_path_factory, base, ops):
    """Random delete/update/merge sequences on a Dataset vs a plain
    pandas model of the same semantics."""
    from lance_flink_spark.sources.dataset import Dataset

    spark = _get_spark()
    root = str(tmp_path_factory.mktemp("mutprop")) + "/ds"
    ds = Dataset(root)
    ds.write(
        spark.createDataFrame(base, "id long, val long"), max_rows_per_file=5
    )
    model = pd.DataFrame(base, columns=["id", "val"])
    for op in ops:
        if op[0] == "delete":
            thr = op[1]
            ds.delete_where(spark, f"val > {thr}")
            model = model[~(model["val"] > thr)]
        elif op[0] == "update":
            thr = op[1]
            ds.update_where(spark, f"val <= {thr}", {"val": "val + 1000"})
            model.loc[model["val"] <= thr, "val"] += 1000
        else:
            rows = op[1]
            src = spark.createDataFrame(rows, "id long, val long")
            ds.merge_insert(spark, src, on="id")
            srcdf = pd.DataFrame(rows, columns=["id", "val"])
            model = pd.concat(
                [model[~model["id"].isin(srcdf["id"])], srcdf]
            )
    got = sorted(map(tuple, ds.read(spark).select("id", "val").collect()))
    want = sorted(map(tuple, model.itertuples(index=False)))
    assert got == want


@settings(max_examples=12, deadline=None)
@given(
    vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=60),
    n=st.integers(2, 9),
    descending=st.booleans(),
)
def test_distributed_ntile_matches_window_ntile(vals, n, descending):
    """Property pin for operators/quantiles.py: on arbitrary integer
    frames (duplicates, negatives, tiny N) the distributed NTILE is
    bit-identical to ntile().over(global window)."""
    from pyspark.sql import Row, Window

    from lance_flink_spark.operators.quantiles import with_distributed_ntile

    spark = _get_spark()
    df = spark.createDataFrame(
        [Row(id=i, v=float(v)) for i, v in enumerate(vals)]
    )
    key = F.col("v").desc() if descending else F.col("v").asc()
    w = Window.orderBy(key, F.col("id").asc())
    want = {
        (r["id"], r["t"]) for r in df.withColumn("t", F.ntile(n).over(w)).collect()
    }
    got = {
        (r["id"], r["t"])
        for r in with_distributed_ntile(
            df, n, "v", "id", "t", descending=descending, buckets=7
        ).collect()
    }
    assert got == want


@settings(max_examples=12, deadline=None)
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 2), st.integers(-1000, 1000)),
        min_size=1,
        max_size=60,
    ),
    ps=st.lists(
        st.sampled_from([0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]),
        min_size=1,
        max_size=3,
        unique=True,
    ),
    buckets=st.sampled_from([2, 5, 64]),
)
def test_grouped_percentiles_matches_numpy_reference(vals, ps, buckets):
    """grouped_percentiles vs numpy.percentile(linear) — an entirely
    independent implementation of the same interpolation — on random
    grouped integers, across degenerate bucket counts (2 buckets force
    multi-row buckets; 64 >> n forces singleton/empty buckets)."""
    import numpy as np

    from lance_flink_spark.operators.quantiles import grouped_percentiles

    spark = _get_spark()
    df = spark.createDataFrame(
        [(g, float(v)) for g, v in vals], "g int, v double"
    )
    names = {f"p{int(p*100)}": p for p in ps}
    got = {
        r["g"]: [r[a] for a in names]
        for r in grouped_percentiles(
            df, "v", names, group_cols=["g"], buckets=buckets
        ).collect()
    }
    want = {}
    for g in {g for g, _ in vals}:
        arr = np.array([float(v) for gg, v in vals if gg == g])
        want[g] = [float(np.percentile(arr, p * 100, method="linear")) for p in ps]
    assert set(got) == set(want)
    for g in want:
        for a, b in zip(got[g], want[g]):
            assert abs(a - b) < 1e-9, (g, got[g], want[g])


@settings(max_examples=10, deadline=None)
@given(
    ops=st.lists(
        st.tuples(
            st.integers(0, 3),            # key
            st.integers(0, 99),           # value payload
            st.booleans(),                # is_delete
        ),
        min_size=1,
        max_size=25,
    ),
    n_batches=st.integers(1, 4),
)
def test_upsert_sink_matches_dict_fold(tmp_path_factory, ops, n_batches):
    """UpsertDatasetSink vs a plain python dict fold: the same
    changelog (sequenced by position) split into arbitrary batch
    boundaries must materialize to the dict's final state — batch
    boundaries and intra-batch folding must never change the answer."""
    from lance_flink_spark.sources.dataset import Dataset
    from lance_flink_spark.streaming.upsert import UpsertDatasetSink

    spark = _get_spark()
    path = str(tmp_path_factory.mktemp("ups"))
    sink = UpsertDatasetSink(path + "/t", key="k", seq_cols=["seq"])
    seqd = [(k, v, i, "D" if d else "U") for i, (k, v, d) in enumerate(ops)]
    # arbitrary batch boundaries
    size = max(1, len(seqd) // n_batches)
    for b in range(0, len(seqd), size):
        batch = spark.createDataFrame(
            seqd[b : b + size], "k long, v long, seq long, _op string"
        )
        sink.write_batch(batch, b)
    ref: dict[int, int] = {}
    for k, v, _i, op in seqd:
        if op == "D":
            ref.pop(k, None)
        else:
            ref[k] = v
    ds = Dataset(path + "/t")
    if not ref:
        got = {}
        try:
            got = {
                r["k"]: r["v"] for r in ds.read(spark).select("k", "v").collect()
            }
        except FileNotFoundError:
            pass  # nothing ever landed (all-delete changelog)
    else:
        got = {r["k"]: r["v"] for r in ds.read(spark).select("k", "v").collect()}
    assert got == ref


@settings(max_examples=60, deadline=None)
@given(
    vals=st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=200_000),
            # values spanning several 64K containers, incl. dense runs
            st.integers(min_value=0, max_value=2**32 - 1),
        ),
        max_size=400,
    ),
    dense_block=st.one_of(
        st.none(), st.integers(min_value=0, max_value=2**16 - 5000)
    ),
    use_runs=st.booleans(),
)
def test_roaring_roundtrip_property(vals, dense_block, use_runs):
    """encode_roaring ∘ decode_roaring is identity on ANY uint32 set —
    array, bitmap (>4096 per container), and run containers all
    exercised; trailing bytes always refuse."""
    import numpy as np
    import pytest

    from lance_flink_spark.sources.lance_native import (
        UnsupportedLanceFeature,
        decode_roaring,
        encode_roaring,
    )

    values = list(vals)
    if dense_block is not None:
        # force a bitmap container: >4096 values in one 64K key space
        values += list(range(dense_block, dense_block + 4500))
    expect = np.unique(np.asarray(values, dtype="uint64")).astype("uint32")
    blob = encode_roaring(expect, use_runs=use_runs)
    got = decode_roaring(blob)
    assert np.array_equal(got, expect)
    if len(blob) >= 8:
        with pytest.raises(UnsupportedLanceFeature, match="trailing"):
            decode_roaring(blob + b"\x00")


_frag_cols = st.dictionaries(
    keys=st.sampled_from(["a", "b", "c", "d", "e"]),
    values=st.sampled_from(["int64", "float64", "string", "list", "struct"]),
    min_size=1,
    max_size=4,
)


@settings(max_examples=40, deadline=None)
@given(
    cols=_frag_cols,
    n=st.integers(min_value=0, max_value=60),
    page_rows=st.integers(min_value=1, max_value=17),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_fragment_file_roundtrip_property(tmp_path_factory, cols, n, page_rows, seed):
    """write_fragment_file ∘ read_fragment_table is identity on ANY
    table in the subset — nullable primitives, strings, lists and flat
    structs, across arbitrary page splits (multi-page validity and
    varlen assembly are where the bytes can lie)."""
    import os
    import uuid as _uuid

    import numpy as np
    import pyarrow as pa

    from lance_flink_spark.sources.lance_native import (
        _schema_fields_of,
        read_fragment_table,
        write_fragment_file,
    )

    rng = np.random.default_rng(seed)

    def col_of(kind):
        def nully(xs):
            return [
                None if rng.random() < 0.25 else x for x in xs
            ]

        if kind == "int64":
            return pa.array(
                nully(rng.integers(-(2**62), 2**62, n).tolist()), pa.int64()
            )
        if kind == "float64":
            return pa.array(nully(rng.normal(size=n).tolist()), pa.float64())
        if kind == "string":
            return pa.array(
                nully(["s" * int(k % 7) + str(k) for k in range(n)]),
                pa.large_utf8(),
            )
        if kind == "list":
            return pa.array(
                nully(
                    [
                        rng.integers(0, 100, int(k % 5)).tolist()
                        for k in range(n)
                    ]
                ),
                pa.large_list(pa.int64()),
            )
        return pa.array(
            [
                {
                    "x": None if rng.random() < 0.3 else int(k),
                    "y": None if rng.random() < 0.3 else float(k) / 3,
                }
                for k in range(n)
            ],
            pa.struct([("x", pa.int64()), ("y", pa.float64())]),
        )

    t = pa.table({name: col_of(kind) for name, kind in cols.items()})
    fields, _blob = _schema_fields_of(pa, t.schema)
    d = tmp_path_factory.mktemp("fragprop")
    path = os.path.join(str(d), f"{_uuid.uuid4()}.lance")
    write_fragment_file(path, t, max_rows_per_page=page_rows)
    got = read_fragment_table(path, fields)
    assert got.num_rows == n
    for name in t.column_names:
        assert got.column(name).to_pylist() == t.column(name).to_pylist(), name


@settings(max_examples=25, deadline=None)
@given(
    ops=st.lists(
        st.sampled_from(
            [
                "append", "add", "backfill", "udfbf", "merge", "rename",
                "cast", "drop", "delete", "compact",
            ]
        ),
        max_size=8,
    )
)
def test_native_evolution_sequence_matches_model(tmp_path_factory, ops):
    """ANY interleaving of append / ADD COLUMN / backfill (ADD COLUMN
    ... AS expr — one extra data file per fragment, zipped at physical
    offsets) / DROP COLUMN / delete / compact on a STRUCT-bearing
    native dataset matches a pure-Python row model: physical offsets
    stay addressable across evolution, pre-ADD fragments read NULL,
    backfilled values align row-for-row even under deletions and
    later compaction, dropped columns never leak back, and compaction
    preserves surviving-row order."""
    import itertools
    import os

    import pyarrow as pa

    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        add_column,
        add_column_backfill,
        append_to_dataset,
        arrow_schema_of,
        compact_dataset,
        delete_rows,
        drop_column,
        write_dataset,
    )

    d = tmp_path_factory.mktemp("evoprop")
    root = os.path.join(str(d), "ds")
    schema = [("id", "int64"), ("meta", "struct")]
    counter = itertools.count(1)

    def mk_rows(k):
        rows = []
        for _ in range(k):
            i = next(counter)
            r = {}
            for name, kind in schema:
                if kind == "int64":
                    r[name] = i * 7
                elif kind == "float64":
                    r[name] = float(i) / 2 if i % 3 else None
                else:
                    r[name] = {"x": i if i % 4 else None}
            rows.append(r)
        return rows

    def arrow_of(rows):
        arrays, names = [], []
        for name, kind in schema:
            vals = [r[name] for r in rows]
            if kind == "int64":
                arrays.append(pa.array(vals, pa.int64()))
            elif kind == "float64":
                arrays.append(pa.array(vals, pa.float64()))
            else:
                arrays.append(
                    pa.array(vals, pa.struct([("x", pa.int64())]))
                )
            names.append(name)
        return pa.table(dict(zip(names, arrays)))

    rows0 = mk_rows(4)
    write_dataset(root, arrow_of(rows0), max_rows_per_file=3)
    live = [[r, True] for r in rows0]  # physical order incl. dead rows
    addable = ["q1", "q2", "q3"]

    def snapshot():
        v = LanceNativeDataset(root).versions()[-1]
        return (
            v,
            [n for n, _k in schema],
            [dict(e[0]) for e in live if e[1]],
        )

    history = [snapshot()]
    n_del = 0
    for op in ops:
        if op == "append":
            rows = mk_rows(3)
            fields, _f, _v = LanceNativeDataset(root)._manifest()
            append_to_dataset(root, arrow_of(rows).cast(arrow_schema_of(fields)))
            live += [[r, True] for r in rows]
        elif op == "add":
            if not addable:
                continue
            name = addable.pop(0)
            add_column(root, name, pa.float64())
            schema.append((name, "float64"))
            for e in live:  # pre-ADD rows read NULL
                e[0] = dict(e[0])
                e[0][name] = None
        elif op == "backfill":
            if not addable:
                continue
            name = addable.pop(0)
            add_column_backfill(
                root, name, pa.float64(), "id * 3.0 + 1", _get_spark()
            )
            schema.append((name, "float64"))
            for e in live:  # every physical row computes from its id
                e[0] = dict(e[0])
                e[0][name] = float(e[0]["id"] * 3 + 1)
        elif op == "udfbf":
            if not addable:
                continue
            name = addable.pop(0)
            from lance_flink_spark.sources.lance_native import (
                add_column_backfill_udf,
            )

            def _fn(pdf):
                return [float(int(x) * 5 + 1) for x in pdf["id"]]

            add_column_backfill_udf(
                root, name, pa.float64(), ["id"], _fn, _get_spark()
            )
            schema.append((name, "float64"))
            for e in live:  # Python-batch compute from each row's id
                e[0] = dict(e[0])
                e[0][name] = float(e[0]["id"] * 5 + 1)
        elif op == "merge":
            if not addable:
                continue
            name = addable.pop(0)
            from lance_flink_spark.sources.lance_native import (
                merge_columns,
            )

            chosen = {e[0]["id"] for e in live if e[0]["id"] % 2 == 0}
            spark = _get_spark()
            src = spark.createDataFrame(
                [(i, float(i % 13)) for i in sorted(chosen)],
                f"id long, {name} double",
            )
            merge_columns(root, src, "id", spark)
            schema.append((name, "float64"))
            for e in live:  # matched keys land, the rest read NULL
                e[0] = dict(e[0])
                e[0][name] = (
                    float(e[0]["id"] % 13)
                    if e[0]["id"] in chosen
                    else None
                )
        elif op == "cast":
            from lance_flink_spark.sources.lance_native import (
                cast_column,
            )

            castable = [n for n, k in schema if k == "float64"]
            if not castable:
                continue
            name = castable[0]
            cast_column(root, name, pa.int64(), _get_spark())
            schema = [
                (n, "int64" if n == name else k) for n, k in schema
            ]
            for e in live:  # Spark cast truncates toward zero
                e[0] = dict(e[0])
                e[0][name] = (
                    int(e[0][name]) if e[0][name] is not None else None
                )
        elif op == "rename":
            from lance_flink_spark.sources.lance_native import (
                rename_column,
            )

            renameable = [n for n, _k in schema if n != "id"]
            if not renameable:
                continue
            old_name = renameable[-1]
            new_name = old_name + "_r"
            rename_column(root, old_name, new_name)
            schema = [
                (new_name if n == old_name else n, k) for n, k in schema
            ]
            for e in live:
                e[0] = {
                    (new_name if k2 == old_name else k2): v2
                    for k2, v2 in e[0].items()
                }
        elif op == "drop":
            droppable = [n for n, _k in schema if n != "id"]
            if not droppable:
                continue
            name = droppable[0]  # meta first, then the added columns
            drop_column(root, name)
            schema = [(n, k) for n, k in schema if n != name]
            for e in live:
                e[0] = {k2: v for k2, v in e[0].items() if k2 != name}
        elif op == "delete":
            doomed = [i for i, e in enumerate(live) if e[1]][::3][:2]
            if not doomed:
                continue
            n_del += 1
            delete_rows(  # indices ARE physical offsets
                root,
                doomed,
                deletion_format="bitmap" if n_del % 2 else "arrow",
            )
            for i in doomed:
                live[i][1] = False
        else:  # compact
            compact_dataset(root, target_rows=5)
            live = [e for e in live if e[1]]  # dead rows materialize away
        history.append(snapshot())

    # every committed version still time-travels to its own snapshot
    nds = LanceNativeDataset(root)
    for v, names, expect in history:
        got = nds.to_arrow(version=v)
        assert got.column_names == names, f"v{v}"
        assert got.num_rows == len(expect), f"v{v}"
        for name in names:
            assert got.column(name).to_pylist() == [
                r[name] for r in expect
            ], f"v{v}.{name}"


@settings(max_examples=6, deadline=None)
@given(
    ops=st.lists(
        st.sampled_from(["insert", "update", "delete", "merge", "optimize"]),
        max_size=5,
    )
)
def test_native_sql_mutation_sequence_matches_model(tmp_path_factory, ops):
    """ANY interleaving of SQL INSERT / UPDATE / DELETE / MERGE /
    OPTIMIZE on a native Lance table matches a dict model — the ddl
    layer's offset resolution, one-commit tombstone+append mutations,
    and view re-registration compose correctly in sequence."""
    import itertools
    import os

    import pyarrow as pa

    from lance_flink_spark.sources.catalog import Catalog
    from lance_flink_spark.sources.ddl import SqlEngine
    from lance_flink_spark.sources.lance_native import write_dataset

    spark = _get_spark()
    d = tmp_path_factory.mktemp("sqlmodel")
    root = os.path.join(str(d), "t")
    write_dataset(
        root,
        pa.table(
            {
                "id": pa.array(range(1, 7), pa.int64()),
                "v": pa.array([i * 10 for i in range(1, 7)], pa.int64()),
            }
        ),
        max_rows_per_file=4,
    )
    model = {i: i * 10 for i in range(1, 7)}
    eng = SqlEngine(spark, Catalog(os.path.join(str(d), "wh")))
    eng.execute(
        f"CREATE TABLE m (id BIGINT, v BIGINT) "
        f"WITH ('connector' = 'lance', 'path' = '{root}')"
    )
    fresh = itertools.count(100)
    for op in ops:
        if op == "insert":
            ks = [next(fresh) for _ in range(2)]
            eng.execute(
                "INSERT INTO m VALUES "
                + ", ".join(f"({k}, {k * 10})" for k in ks)
            )
            model.update({k: k * 10 for k in ks})
        elif op == "update":
            eng.execute("UPDATE m SET v = v + 7 WHERE id % 3 = 1")
            model.update(
                {k: v + 7 for k, v in model.items() if k % 3 == 1}
            )
        elif op == "delete":
            eng.execute("DELETE FROM m WHERE id % 4 = 2")
            model = {k: v for k, v in model.items() if k % 4 != 2}
        elif op == "merge":
            hit = min(model) if model else next(fresh)
            new = next(fresh)
            eng.execute(
                f"MERGE INTO m USING (SELECT {hit} AS id, 1 AS v "
                f"UNION ALL SELECT {new}, 2) ON id"
            )
            model[hit], model[new] = 1, 2
        else:
            eng.execute("OPTIMIZE m")
    got = {
        r["id"]: r["v"] for r in eng.execute("SELECT * FROM m").collect()
    }
    assert got == model


@settings(max_examples=8, deadline=None)
@given(
    ops=st.lists(
        st.tuples(st.sampled_from(["append", "delete"]), st.integers(1, 4)),
        max_size=6,
    )
)
def test_native_changelog_folds_to_live_rows(tmp_path_factory, ops):
    """Changelog completeness: for ANY append/delete history, the
    change feed's inserts minus its deletes (by row id, with pre-image
    values) reproduce exactly the final live rows, and each commit's
    emissions carry its own _commit_version."""
    import itertools
    import os

    import pyarrow as pa

    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        append_to_dataset,
        delete_rows,
        read_changes_distributed,
        write_dataset,
    )

    spark = _get_spark()
    d = tmp_path_factory.mktemp("cdcprop")
    root = os.path.join(str(d), "ds")
    fresh = itertools.count(0)

    def rows(k):
        ids = [next(fresh) for _ in range(k)]
        return pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "v": pa.array([i * 11 for i in ids], pa.int64()),
            }
        )

    write_dataset(root, rows(3), max_rows_per_file=2)
    n_dels = 0
    for kind, k in ops:
        if kind == "append":
            append_to_dataset(root, rows(k))
        else:
            nds = LanceNativeDataset(root)
            t = nds.to_arrow(with_offsets=True)
            if not t.num_rows:
                continue
            doomed = t.column("__phys").to_pylist()[:: max(k, 2)][:3]
            if not doomed:
                continue
            n_dels += 1
            delete_rows(
                root,
                doomed,
                deletion_format="bitmap" if n_dels % 2 else "arrow",
                expected_version=nds.versions()[-1],
            )
    feed = read_changes_distributed(root, spark, 0).collect()
    # collect order is arbitrary across tasks: replay in commit order,
    # inserts before deletes within a commit (the UPDATE-pair shape)
    feed.sort(
        key=lambda r: (r["_commit_version"], r["_change_type"] != "insert")
    )
    folded: dict = {}
    for r in feed:
        if r["_change_type"] == "insert":
            assert r["id"] not in folded
            folded[r["id"]] = r["v"]
        else:
            assert folded.pop(r["id"]) == r["v"]  # pre-image value
    live = LanceNativeDataset(root).to_arrow()
    want = dict(
        zip(live.column("id").to_pylist(), live.column("v").to_pylist())
    )
    assert folded == want


@settings(max_examples=25, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=-(2**62), max_value=2**62),
        min_size=1,
        max_size=200,
    ),
)
def test_bitpack_roundtrip_random(vals):
    """r15: the 2.1 bitpack codec round-trips arbitrary int64 pages at
    the writer's own minimal-width choice (signed and unsigned), the
    same pairing write_fragment_file_21 uses."""
    import numpy as np

    from lance_flink_spark.sources.lance_native import (
        _bitpack,
        _bitunpack,
    )

    a = np.array(vals, dtype="<i8")
    vmin, vmax = int(a.min()), int(a.max())
    if vmin >= 0:
        bits, signed = max(1, vmax.bit_length()), False
    else:
        bits = 1 + max(vmax.bit_length(), (-vmin - 1).bit_length())
        signed = True
    bits = min(bits, 64)
    got = _bitunpack(_bitpack(a, bits), len(a), bits, signed, "<i8")
    assert got.tolist() == a.tolist()


@settings(max_examples=6, deadline=None)
@given(
    rows=st.integers(min_value=5, max_value=60),
    per_file=st.integers(min_value=3, max_value=20),
    dels=st.lists(st.integers(0, 59), max_size=25),
    upd_mod=st.integers(min_value=2, max_value=7),
)
def test_distributed_mutations_match_row_model(rows, per_file, dels, upd_mod):
    """r15: mutate_rows_distributed (per-fragment task-side deletion
    files) vs a pure-Python row model on random delete/update
    sequences — delete a random offset set, then update a residue
    class of the SURVIVORS; the final table must equal the model
    exactly."""
    import os
    import shutil
    import tempfile

    import pyarrow as pa

    from lance_flink_spark.sources.lance_native import (
        LanceNativeDataset,
        mutate_rows_distributed,
        read_distributed,
        write_dataset,
    )

    spark = _get_spark()
    dels = sorted({d for d in dels if d < rows})
    tmp = tempfile.mkdtemp(prefix="dmut")
    try:
        root = os.path.join(tmp, "ds")
        write_dataset(
            root,
            pa.table(
                {
                    "id": pa.array(range(rows), pa.int64()),
                    "v": pa.array([float(i) for i in range(rows)]),
                }
            ),
            max_rows_per_file=per_file,
        )
        # model state: id -> v (physical offset == id at version 1)
        model = {i: float(i) for i in range(rows)}
        for d in dels:
            model.pop(d, None)
        nds = LanceNativeDataset(root)
        if dels:
            offs = spark.createDataFrame(
                [(int(d),) for d in dels], "__phys long"
            )
            mutate_rows_distributed(root, offs)
        # UPDATE survivors in a residue class: v -> v * 10
        full = read_distributed(
            LanceNativeDataset(root), spark, with_offsets=True
        )
        matched = full.filter(F.col("id") % upd_mod == 0)
        updated = matched.select("id", (F.col("v") * 10).alias("v"))
        mutate_rows_distributed(
            root, matched.select("__phys"), updated
        )
        for i in list(model):
            if i % upd_mod == 0:
                model[i] = model[i] * 10
        got = {
            r["id"]: r["v"]
            for r in read_distributed(
                LanceNativeDataset(root), spark
            ).collect()
        }
        assert got == model
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
