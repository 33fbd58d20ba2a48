"""Incrementally-maintained materialized aggregate (sources/matview.py):
refresh folds only CDF deltas into the stored SUM/COUNT state; parity
is pinned against a full recompute after every mutation kind."""

import pytest
from pyspark.sql import Row

from lance_flink_spark.sources.dataset import Dataset
from lance_flink_spark.sources.matview import MaterializedAggregate


def _df(spark, rows):
    return spark.createDataFrame([Row(id=i, grp=g, v=v) for i, g, v in rows])


def _expected(spark, ds):
    from pyspark.sql import functions as F

    return {
        (r["grp"],): (r["s"], r["c"])
        for r in ds.read(spark)
        .groupBy("grp")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    }


def _state(spark, mv):
    return {
        (r["grp"],): (r["sum_v"], r["cnt"]) for r in mv.read(spark).collect()
    }


@pytest.fixture()
def setup(spark, tmp_path_str):
    ds = Dataset(tmp_path_str + "/src")
    ds.write(_df(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 5)]))
    mv = MaterializedAggregate(
        ds, tmp_path_str + "/mv", row_key="id", group_cols=["grp"], value_col="v"
    )
    return ds, mv


def test_initial_full_compute_and_noop(spark, setup):
    ds, mv = setup
    v = mv.refresh(spark)
    assert v == 1
    assert _state(spark, mv) == _expected(spark, ds)
    # no new source versions: refresh is a metadata no-op
    assert mv.refresh(spark) == 1


def test_incremental_across_append_update_delete_merge(spark, setup):
    ds, mv = setup
    mv.refresh(spark)
    # append
    ds.write(_df(spark, [(4, "b", 7), (5, "c", 1)]), mode="append")
    assert mv.refresh(spark) == 2
    assert _state(spark, mv) == _expected(spark, ds)
    # update (pre-image subtracted, post-image added)
    ds.update_where(spark, "id = 2", {"v": "100"})
    assert mv.refresh(spark) == 3
    assert _state(spark, mv) == _expected(spark, ds)
    # delete (group 'c' disappears entirely — cnt=0 rows are dropped)
    ds.delete_where(spark, "grp = 'c'")
    mv.refresh(spark)
    st = _state(spark, mv)
    assert st == _expected(spark, ds)
    assert ("c",) not in st
    # merge upsert: replaces id=1 (a,10 -> a,50) and inserts id=9
    ds.merge_insert(
        spark, _df(spark, [(1, "a", 50), (9, "b", 3)]), on="id"
    )
    mv.refresh(spark)
    assert _state(spark, mv) == _expected(spark, ds)


def test_overwrite_falls_back_to_rebuild(spark, setup):
    ds, mv = setup
    mv.refresh(spark)
    ds.write(_df(spark, [(1, "z", 42)]), mode="overwrite")
    v = mv.refresh(spark)
    assert v == 2
    assert _state(spark, mv) == {("z",): (42, 1)}


def test_cdf_update_preimages_contract(spark, setup):
    ds, _ = setup
    ds.update_where(spark, "id = 3", {"v": "6"})
    rows = ds.read_changes(
        spark, key="id", since_version=1, update_preimages=True
    ).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["_change_type"], []).append(r)
    assert len(by_type["update_preimage"]) == 1
    assert by_type["update_preimage"][0]["v"] == 5
    assert len(by_type["update_postimage"]) == 1
    assert by_type["update_postimage"][0]["v"] == 6
    assert "update" not in by_type


def _expected_mm(spark, ds):
    from pyspark.sql import functions as F

    return {
        (r["grp"],): (r["s"], r["c"], r["lo"], r["hi"])
        for r in ds.read(spark)
        .groupBy("grp")
        .agg(
            F.sum("v").alias("s"),
            F.count(F.lit(1)).alias("c"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
        .collect()
    }


def _state_mm(spark, mv):
    return {
        (r["grp"],): (r["sum_v"], r["cnt"], r["min_v"], r["max_v"])
        for r in mv.read(spark).collect()
    }


def test_minmax_maintained_across_extremum_deletion(spark, tmp_path_str):
    """MIN/MAX incremental maintenance with the retract-extremum
    fallback: parity vs full recompute across a history where the
    stored minimum AND maximum are deleted/updated away."""
    ds = Dataset(tmp_path_str + "/src")
    ds.write(_df(spark, [(1, "a", 10), (2, "a", 20), (3, "a", 30), (4, "b", 5)]))
    mv = MaterializedAggregate(
        ds, tmp_path_str + "/mv", row_key="id", group_cols=["grp"], value_col="v"
    )
    mv.refresh(spark)
    assert _state_mm(spark, mv) == _expected_mm(spark, ds)

    # insert-only fold: extrema extend without any rescan
    ds.write(_df(spark, [(5, "a", 1), (6, "b", 99)]), mode="append")
    mv.refresh(spark)
    assert _state_mm(spark, mv) == _expected_mm(spark, ds)

    # delete the CURRENT minimum of group a (v=1) -> rescan path
    ds.delete_where(spark, "id = 5")
    mv.refresh(spark)
    assert _state_mm(spark, mv) == _expected_mm(spark, ds)
    assert _state_mm(spark, mv)[("a",)][2] == 10  # min recovered

    # update the current maximum of group a DOWNWARD (30 -> 15):
    # retracts the stored max, post-image doesn't dominate -> rescan
    ds.update_where(spark, "id = 3", {"v": "15"})
    mv.refresh(spark)
    assert _state_mm(spark, mv) == _expected_mm(spark, ds)
    assert _state_mm(spark, mv)[("a",)][3] == 20  # max recovered

    # deletion of a NON-extremum folds without touching extrema
    ds.delete_where(spark, "id = 2")
    mv.refresh(spark)
    assert _state_mm(spark, mv) == _expected_mm(spark, ds)

    # simultaneous retract-of-min + dominating insert: no rescan
    # needed semantically; result must still be exact
    ds.merge_insert(spark, _df(spark, [(1, "a", 2), (7, "a", 0)]), on="id")
    mv.refresh(spark)
    assert _state_mm(spark, mv) == _expected_mm(spark, ds)
    assert _state_mm(spark, mv)[("a",)][2] == 0


def test_minmax_group_vanishes_and_returns(spark, tmp_path_str):
    ds = Dataset(tmp_path_str + "/src")
    ds.write(_df(spark, [(1, "a", 10), (2, "b", 7)]))
    mv = MaterializedAggregate(
        ds, tmp_path_str + "/mv", row_key="id", group_cols=["grp"], value_col="v"
    )
    mv.refresh(spark)
    ds.delete_where(spark, "grp = 'a'")
    mv.refresh(spark)
    assert ("a",) not in _state_mm(spark, mv)
    ds.write(_df(spark, [(3, "a", 42)]), mode="append")
    mv.refresh(spark)
    assert _state_mm(spark, mv)[("a",)] == (42, 1, 42, 42)


# ---------- incremental percentile state (DDSketch bins) ----------


def _q_state(spark, mvq):
    return {
        (r["grp"], r["__sign"], r["__bin"]): r["__cnt"]
        for r in mvq.state.read(spark).collect()
    }


def _q_direct(spark, ds, acc=0.01):
    """Bin state recomputed from the current snapshot — the parity
    oracle for every incremental fold."""
    from pyspark.sql import functions as F

    from lance_flink_spark.operators.sketches import value_bins

    sign, binc = value_bins("v", acc)
    return {
        (r["grp"], r["__sign"], r["__bin"]): r["__cnt"]
        for r in ds.read(spark)
        .select("grp", sign.alias("__sign"), binc.alias("__bin"))
        .groupBy("grp", "__sign", "__bin")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .collect()
    }


def test_quantile_matview_incremental_parity(spark, tmp_path_str):
    """Insert, update, and delete all fold incrementally into the bin
    state — after every mutation the state equals a from-scratch
    recompute EXACTLY (bin counts are self-maintainable under
    retraction, unlike MIN/MAX), and quantiles read off state only."""
    import numpy as np

    from lance_flink_spark.sources.matview import MaterializedQuantileSketch

    rng = np.random.default_rng(5)
    rows = [
        (i, "a" if i % 3 else "b", float(v))
        for i, v in enumerate(rng.lognormal(2, 1, 400))
    ]
    ds = Dataset(tmp_path_str + "/qsrc")
    ds.write(_df(spark, rows))
    mvq = MaterializedQuantileSketch(
        ds, tmp_path_str + "/mvq", row_key="id", group_cols=["grp"], value_col="v"
    )
    mvq.refresh(spark)
    assert _q_state(spark, mvq) == _q_direct(spark, ds)

    last = mvq.last_refreshed_version()
    ds.write(_df(spark, [(1000 + i, "a", float(10 * i + 1)) for i in range(20)]),
             mode="append")
    mvq.refresh(spark)
    assert _q_state(spark, mvq) == _q_direct(spark, ds)
    assert mvq.last_refreshed_version() > last  # incremental path ran

    ds.update_where(spark, "id % 7 = 1", {"v": "v * 3"})
    mvq.refresh(spark)
    assert _q_state(spark, mvq) == _q_direct(spark, ds)

    ds.delete_where(spark, "id % 5 = 2")
    mvq.refresh(spark)
    assert _q_state(spark, mvq) == _q_direct(spark, ds)

    # quantile accuracy straight off the maintained state
    est = {
        (r["grp"], r["q"]): r["estimate"]
        for r in mvq.quantiles(spark, [0.5, 0.95]).collect()
    }
    vals = {
        g: sorted(r["v"] for r in ds.read(spark).filter(f"grp = '{g}'").collect())
        for g in ("a", "b")
    }
    for (g, q), e in est.items():
        srt = vals[g]
        exact = srt[min(max(int(np.ceil(q * len(srt))) - 1, 0), len(srt) - 1)]
        assert abs(e - exact) <= 0.01 * abs(exact) + 1e-9, (g, q, e, exact)


def test_quantile_matview_noop_and_overwrite(spark, tmp_path_str):
    """A refresh with no new versions is a no-op; an overwrite (no
    lineage) falls back to a correct full rebuild."""
    from lance_flink_spark.sources.matview import MaterializedQuantileSketch

    ds = Dataset(tmp_path_str + "/qsrc2")
    ds.write(_df(spark, [(1, "a", 4.0), (2, "a", 9.0), (3, "b", 1.0)]))
    mvq = MaterializedQuantileSketch(
        ds, tmp_path_str + "/mvq2", row_key="id", group_cols=["grp"], value_col="v"
    )
    v1 = mvq.refresh(spark)
    assert mvq.refresh(spark) == v1  # current -> no-op
    ds.write(_df(spark, [(1, "a", 100.0), (2, "b", 0.0)]), mode="overwrite")
    mvq.refresh(spark)
    assert _q_state(spark, mvq) == _q_direct(spark, ds)


def test_property_random_mutation_histories(spark, tmp_path_str):
    """Seeded random histories over the full mutation surface —
    append / update-dv / delete-dv / merge-dv — with refreshes after
    RANDOM subsets of commits (so one refresh often folds several
    versions at once): after every refresh the maintained aggregate
    must equal the direct groupBy over the live data. Stresses the CDF
    delta algebra, the one-shuffle fold, the extremum-rescan branch,
    and multi-version read_changes in combinations the targeted tests
    don't enumerate."""
    import os
    import random

    from pyspark.sql import functions as F

    for seed in (7, 31):
        rng = random.Random(seed)
        root = os.path.join(tmp_path_str, f"prop{seed}")
        ds = Dataset(root + "/src")
        next_k = [0]

        def rows(n, grp_pool, vlo=-50, vhi=100):
            out = []
            for _ in range(n):
                out.append(
                    Row(
                        k=next_k[0],
                        grp=rng.choice(grp_pool),
                        vc=rng.randint(vlo, vhi),
                    )
                )
                next_k[0] += 1
            return out

        grps = ["a", "b", "c"]
        ds.write(
            spark.createDataFrame(rows(40, grps), "k long, grp string, vc long")
        )
        mv = MaterializedAggregate(
            ds, root + "/mv", row_key="k", group_cols=["grp"], value_col="vc"
        )
        mv.refresh(spark)
        for _step in range(6):
            n_ops = rng.randint(1, 3)
            for _ in range(n_ops):
                op = rng.choice(["append", "update", "delete", "merge"])
                if op == "append":
                    ds.write(
                        spark.createDataFrame(
                            rows(rng.randint(3, 10), grps),
                            "k long, grp string, vc long",
                        ),
                        mode="append",
                    )
                elif op == "update":
                    m = rng.randint(2, 9)
                    ds.update_where(
                        spark, f"k % {m} = 1", {"vc": f"vc + {rng.randint(-30, 30)}"}, dv=True
                    )
                elif op == "delete":
                    m = rng.randint(3, 11)
                    ds.delete_where(spark, f"k % {m} = 2", dv=True)
                else:
                    src = spark.createDataFrame(
                        rows(rng.randint(2, 6), grps)
                        + [
                            Row(k=rng.randrange(max(next_k[0] - 1, 1)), grp=rng.choice(grps), vc=rng.randint(-50, 100))
                        ],
                        "k long, grp string, vc long",
                    ).dropDuplicates(["k"])
                    ds.merge_insert(spark, src, on="k", dv=True)
            mv.refresh(spark)
            got = {
                r["grp"]: (r["sum_v"], r["cnt"], r["min_v"], r["max_v"])
                for r in mv.read(spark).collect()
            }
            want = {
                r["grp"]: (r["sum_v"], r["cnt"], r["min_v"], r["max_v"])
                for r in ds.read(spark)
                .groupBy("grp")
                .agg(
                    F.sum("vc").alias("sum_v"),
                    F.count(F.lit(1)).alias("cnt"),
                    F.min("vc").alias("min_v"),
                    F.max("vc").alias("max_v"),
                )
                .collect()
            }
            assert got == want, f"seed {seed} step {_step}: {got} != {want}"
