"""Incrementally-maintained materialized aggregate over a versioned
Dataset — the batch analogue of a Flink continuous query / Delta MV.

The reference's Flink jobs keep SUM/COUNT-style aggregates current by
consuming a changelog; here the changelog is the Dataset's change data
feed (``read_changes`` with Delta-CDF four-type semantics), and each
``refresh()`` folds only the rows that changed since the last refresh
into the stored aggregate:

    insert / update_postimage  →  +value, +1
    delete / update_preimage   →  -value, -1

which is exactly the retraction stream Flink's GroupAggFunction applies
per record — replayed in one batch join instead of per-event state
access.

Scale: a refresh reads ONLY the changed versions' fragments plus their
superseded files (the CDF contract — never a full-table diff), reduces
them to one delta row per touched group (partial aggregation map-side),
and outer-joins that delta against the stored aggregate — whose size is
the GROUP cardinality, not the fact cardinality. A 100 TB fact table
with 1M groups refreshes by shuffling the delta (bounded by rows
changed) against a 1M-row state table.

SUM/COUNT/AVG are self-maintainable under retraction; MIN/MAX are not
(a deleted minimum needs a rescan) — the restriction Flink documents
for retract-mode aggregates. This module maintains sum/count (avg
derived at read time) and MIN/MAX with the standard fallback:
inserts fold incrementally (least/greatest against stored extrema);
a retraction that touches a group's stored extremum — and isn't
dominated by a simultaneous insert — marks THAT group for rescan, and
the refresh recomputes only the marked groups from the source (a
semi-joined scan bounded by affected-group count, never a full
recompute)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from lance_flink_spark.sources import fsio
from lance_flink_spark.sources.dataset import Dataset


class MaterializedAggregate:
    """``SELECT group_cols, SUM(value_col), COUNT(*) GROUP BY
    group_cols`` over ``source``, stored at ``path`` and caught up
    incrementally from the change feed.

    ``row_key`` is the source's row identity (the CDF join key).
    """

    def __init__(
        self,
        source: Dataset,
        path: str,
        row_key: str,
        group_cols: list[str],
        value_col: str,
    ):
        self.source = source
        self.path = path
        self.row_key = row_key
        self.group_cols = list(group_cols)
        self.value_col = value_col
        self.state = Dataset(fsio.join(path, "state"))

    def _meta_path(self) -> str:
        return fsio.join(self.path, "MV_META.json")

    def last_refreshed_version(self) -> int:
        if not fsio.exists(self._meta_path()):
            return 0
        return int(fsio.read_json(self._meta_path())["source_version"])

    def _full_compute(self, spark: SparkSession, version: int) -> DataFrame:
        return (
            self.source.read(spark, version=version)
            .groupBy(*self.group_cols)
            .agg(
                F.sum(self.value_col).alias("sum_v"),
                F.count(F.lit(1)).alias("cnt"),
                F.min(self.value_col).alias("min_v"),
                F.max(self.value_col).alias("max_v"),
            )
        )

    def refresh(self, spark: SparkSession) -> int:
        """Catch the stored aggregate up to the source's latest version;
        returns that version. Incremental when the history since the
        last refresh has row lineage; falls back to a full recompute
        when it contains an overwrite (no lineage — the same restart
        rule as every other CDF consumer)."""
        versions = self.source.versions()
        latest = versions[-1] if versions else 0
        last = self.last_refreshed_version()
        if latest == last:
            return last  # already current — no scan at all
        if last == 0:
            state = self._full_compute(spark, latest)
        else:
            try:
                changes = self.source.read_changes(
                    spark,
                    key=self.row_key,
                    since_version=last,
                    version=latest,
                    update_preimages=True,
                    # unchanged pre/post pairs cancel in the delta
                    # algebra below — skip the payload-diff shuffles
                    suppress_unchanged=False,
                )
            except ValueError:
                # overwrite in range: no lineage — rebuild from the
                # snapshot (correct, just not incremental)
                changes = None
            prev = self.state.read(spark) if changes is not None else None
            if changes is None or "min_v" not in prev.columns:
                # overwrite in range, or a pre-MIN/MAX state layout:
                # rebuild from the snapshot (correct, just not
                # incremental)
                state = self._full_compute(spark, latest)
            else:
                is_ins = F.col("_change_type").isin("insert", "update_postimage")
                sign = F.when(is_ins, F.lit(1)).otherwise(F.lit(-1))
                v = F.col(self.value_col)
                # ONE-SHUFFLE fold: prev state rows and raw change rows
                # union into a single groupBy (map-side partial agg
                # compresses the fact-sized delta before it shuffles) —
                # vs the former delta-groupBy + full_outer join, which
                # paid two shuffles and double the tiny-stage AQE jobs.
                # Prev rows carry their sums/extrema; change rows carry
                # signed contributions and their insert/retract values.
                null_v = F.lit(None).cast(prev.schema["min_v"].dataType)
                prev_part = prev.select(
                    *self.group_cols,
                    F.col("sum_v").alias("c_sum"),
                    F.col("cnt").alias("c_cnt"),
                    F.col("min_v").alias("p_min"),
                    F.col("max_v").alias("p_max"),
                    null_v.alias("i_v"),
                    null_v.alias("r_v"),
                )
                chg_part = changes.select(
                    *self.group_cols,
                    (sign * v).alias("c_sum"),
                    sign.cast("long").alias("c_cnt"),
                    null_v.alias("p_min"),
                    null_v.alias("p_max"),
                    F.when(is_ins, v).alias("i_v"),
                    F.when(~is_ins, v).alias("r_v"),
                )
                combined = prev_part.unionByName(chg_part).groupBy(
                    *self.group_cols
                ).agg(
                    F.sum("c_sum").alias("sum_v_new"),
                    F.sum("c_cnt").alias("__cnt_new"),
                    # ≤1 prev row per group: min/max are identity picks
                    F.min("p_min").alias("p_min"),
                    F.max("p_max").alias("p_max"),
                    F.min("i_v").alias("i_min"),
                    F.max("i_v").alias("i_max"),
                    F.min("r_v").alias("r_min"),
                    F.max("r_v").alias("r_max"),
                )
                # a retraction invalidates a stored extremum only when
                # it HITS it (retracted values always lie inside the
                # group's range, so == is the hit test) AND no insert
                # in the same delta dominates the stored bound — then
                # the true new extremum is unknowable from state alone
                min_hit = (
                    F.col("r_min").isNotNull()
                    & (F.col("r_min") <= F.col("p_min"))
                    & (F.col("i_min").isNull() | (F.col("i_min") > F.col("p_min")))
                )
                max_hit = (
                    F.col("r_max").isNotNull()
                    & (F.col("r_max") >= F.col("p_max"))
                    & (F.col("i_max").isNull() | (F.col("i_max") < F.col("p_max")))
                )
                needs_rescan = (
                    F.col("p_min").isNotNull() & (min_hit | max_hit)
                )
                # localCheckpoint, not persist (r16): ``merged`` is
                # GROUP-sized but its lineage is the whole CDF plan
                # (one union piece per changed version, each with its
                # own parquet relations). Every consumer — the probe,
                # the folded state write, the rescan branch — was
                # re-ANALYZING that plan (~0.9-1.1 s of driver gap per
                # refresh, profiled) and the state-write tasks shipped
                # it as a fat task binary (~6.8 s of task-deser over
                # one 42-task write stage). The eager checkpoint pays
                # the one materialization job the probe ran anyway and
                # truncates the lineage to the pinned group-sized
                # blocks. Same non-fault-tolerant contract read_changes
                # itself uses for long histories (checkpoint_every).
                #
                # The rescan probe rides the SAME job as Observation
                # metrics (r16): count + exact key bytes of the
                # extremum-hit groups accumulate while the checkpoint
                # materializes, so the gate below costs zero extra
                # jobs (it was one probe job per refresh).
                key_bytes = sum(
                    (
                        F.coalesce(
                            F.octet_length(F.col(c).cast("string")), F.lit(0)
                        )
                        + F.lit(16)  # per-column object/offset overhead
                        for c in self.group_cols
                    ),
                    F.lit(0),
                )
                probe_obs = Observation()
                merged = (
                    combined.filter(F.col("__cnt_new") > 0)
                    .withColumn("__rescan", needs_rescan)
                    .observe(
                        probe_obs,
                        F.sum(
                            F.when(F.col("__rescan"), 1).otherwise(0)
                        ).alias("n"),
                        F.sum(
                            F.when(F.col("__rescan"), key_bytes).otherwise(0)
                        ).alias("b"),
                    )
                    .localCheckpoint(eager=True)
                )
                folded = merged.filter(~F.coalesce(F.col("__rescan"), F.lit(False))).select(
                    *self.group_cols,
                    F.col("sum_v_new").alias("sum_v"),
                    F.col("__cnt_new").alias("cnt"),
                    # least/greatest skip NULLs: new groups take i_min,
                    # untouched groups keep p_min
                    F.least(F.col("p_min"), F.col("i_min")).alias("min_v"),
                    F.greatest(F.col("p_max"), F.col("i_max")).alias("max_v"),
                )
                # the probe decides the rescan branch: most refreshes
                # retract no extremum, and skipping the branch entirely
                # saves a source scan + aggregate inside the state write
                # (the branch is unioned lazily, so without the probe it
                # executes even when it contributes zero rows). The
                # metrics yield the exact row count AND an exact
                # key-byte total, so the broadcast gate below is
                # byte-aware (r15 advice: 4M rows of wide string keys
                # replicated everywhere is an OOM, not a win) —
                # F.broadcast bypasses AQE's size checks, so the gate
                # must do its own byte accounting.
                probe = probe_obs.get
                n_rescan = int(probe["n"] or 0)
                if n_rescan:
                    rescan_keys = merged.filter(F.col("__rescan")).select(
                        *self.group_cols
                    )
                    # one row per extremum-hit group; derived from the
                    # persisted merge, so Catalyst has no size estimate
                    # and plans a SortMergeJoin that shuffles the WHOLE
                    # source on a group-cardinality key (measured: the
                    # matview bench's rescan refresh shuffled 150k rows
                    # on a 5-value key, skew included). Broadcast under
                    # an exact byte gate instead (guide §3.1: a few
                    # hundred MB is the sane ceiling for an executor-
                    # replicated hash relation); bigger key sets fall
                    # back to the AQE-planned join.
                    if int(probe["b"] or 0) <= 64 * 1024 * 1024:
                        rescan_keys = F.broadcast(rescan_keys)
                    # per-group rescan: ONLY the groups whose extremum
                    # was retracted. The semi-join must land BELOW the
                    # aggregate (filter source rows, then groupBy) —
                    # Catalyst will not push a semi-join through a
                    # finished aggregate, and the post-agg form pays a
                    # full recompute on every extremum-touching refresh
                    rescanned = (
                        self.source.read(spark, version=latest)
                        .join(rescan_keys, self.group_cols, "left_semi")
                        .groupBy(*self.group_cols)
                        .agg(
                            F.sum(self.value_col).alias("sum_v"),
                            F.count(F.lit(1)).alias("cnt"),
                            F.min(self.value_col).alias("min_v"),
                            F.max(self.value_col).alias("max_v"),
                        )
                    )
                    state = folded.unionByName(rescanned)
                else:
                    state = folded
                # materialize before unpersisting the plan input
                # the state IS the aggregate (one row per group): writing it at
                # full shuffle parallelism produces dozens of near-empty
                # files each refresh that the NEXT refresh pays to list and
                # open — 8 files bounds that while still scaling to
                # many-group MVs
                self.state.write(state.coalesce(8), mode="overwrite")
                merged.unpersist()
                fsio.write_json_atomic(
                    self._meta_path(), {"source_version": latest}
                )
                return latest
        # state overwrite + meta update; the state table is
        # single-writer (the refresher), so no CAS is needed here
        self.state.write(state.coalesce(8), mode="overwrite")
        fsio.write_json_atomic(
            self._meta_path(), {"source_version": latest}
        )
        return latest

    def read(self, spark: SparkSession) -> DataFrame:
        """The current aggregate: group_cols, sum_v, cnt, min_v,
        max_v, avg_v."""
        return self.state.read(spark).withColumn(
            "avg_v", F.col("sum_v") / F.col("cnt")
        )


class MaterializedQuantileSketch:
    """Incrementally-maintained PERCENTILE state over a versioned
    Dataset — the aggregate class the plain MaterializedAggregate
    cannot self-maintain (an exact percentile needs the data; MIN/MAX
    need rescans on retraction). DDSketch bin counts (operators/
    sketches.py) ARE self-maintainable under retraction: an insert is
    +1 on the value's (sign, bin) cell, a delete/preimage is −1 —
    exactly the SUM/COUNT folding rule, applied to bin cells. So a
    refresh folds only the changed rows' bin deltas, state stays
    O(groups × bins), and any quantile reads off the maintained state
    with the sketch's ≤a relative-error guarantee — never a source
    rescan, not even for deletes hitting the extremes.

    State table: (group_cols..., __sign, __bin, __cnt) bin-granular
    rows (mergeable by addition; cells that fold to zero are
    dropped)."""

    def __init__(
        self,
        source: Dataset,
        path: str,
        row_key: str,
        group_cols: list[str],
        value_col: str,
        relative_accuracy: float = 0.01,
    ):
        self.source = source
        self.path = path
        self.row_key = row_key
        self.group_cols = list(group_cols)
        self.value_col = value_col
        self.relative_accuracy = relative_accuracy
        self.state = Dataset(fsio.join(path, "state"))

    def _meta_path(self) -> str:
        return fsio.join(self.path, "MVQ_META.json")

    def last_refreshed_version(self) -> int:
        if not fsio.exists(self._meta_path()):
            return 0
        return int(fsio.read_json(self._meta_path())["source_version"])

    def _bin_rows(self, df: DataFrame, sign_mult) -> DataFrame:
        from lance_flink_spark.operators.sketches import value_bins

        sign, binc = value_bins(self.value_col, self.relative_accuracy)
        return (
            df.select(
                *self.group_cols,
                sign.alias("__sign"),
                binc.alias("__bin"),
                sign_mult.alias("__d"),
            )
            .groupBy(*self.group_cols, "__sign", "__bin")
            .agg(F.sum("__d").alias("__cnt"))
        )

    def refresh(self, spark: SparkSession) -> int:
        """Fold the change feed since the last refresh into the bin
        state; full rebuild only on first refresh or lineage loss
        (overwrite in range) — the same CDF contract as
        MaterializedAggregate."""
        versions = self.source.versions()
        latest = versions[-1] if versions else 0
        last = self.last_refreshed_version()
        if latest == last:
            return last
        state = None
        if last != 0:
            try:
                changes = self.source.read_changes(
                    spark,
                    key=self.row_key,
                    since_version=last,
                    version=latest,
                    update_preimages=True,
                    # unchanged pairs cancel in the signed bin algebra
                    suppress_unchanged=False,
                )
            except ValueError:
                changes = None
            if changes is not None:
                is_ins = F.col("_change_type").isin(
                    "insert", "update_postimage"
                )
                delta = self._bin_rows(
                    changes, F.when(is_ins, 1).otherwise(-1)
                )
                state = (
                    self.state.read(spark)
                    .unionByName(delta)
                    .groupBy(*self.group_cols, "__sign", "__bin")
                    .agg(F.sum("__cnt").alias("__cnt"))
                    .filter(F.col("__cnt") != 0)
                )
        if state is None:  # first build, or overwrite broke lineage
            state = self._bin_rows(
                self.source.read(spark, version=latest), F.lit(1)
            )
        self.state.write(state.coalesce(8), mode="overwrite")
        fsio.write_json_atomic(self._meta_path(), {"source_version": latest})
        return latest

    def quantiles(self, spark: SparkSession, qs: list[float]) -> DataFrame:
        """(group_cols..., q, estimate) from the maintained state —
        sketch-state-sized work, facts never touched."""
        from pyspark.sql import Window as W

        from lance_flink_spark.operators.sketches import (
            estimate_quantiles_from_bins,
        )

        st = self.state.read(spark)
        n_w = (
            W.partitionBy(*self.group_cols)
            if self.group_cols
            else W.partitionBy()
        )
        with_n = st.withColumn("n", F.sum("__cnt").over(n_w))
        return estimate_quantiles_from_bins(
            with_n, self.group_cols, qs, self.relative_accuracy
        )
