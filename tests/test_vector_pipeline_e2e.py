"""Streaming-vector lifecycle end-to-end — the reference's flagship
use (Flink writes vectors into Lance, the index keeps up, searches
see fresh data): exactly-once appends into a Dataset, a CDC consumer
folds each batch into the IVF index incrementally, searches return
newly-streamed nearest neighbors without any rebuild."""

import numpy as np
from pyspark.sql import Row

from lance_flink_spark.index.ivf import IVFIndex
from lance_flink_spark.sources.cdc import ChangeFeedConsumer
from lance_flink_spark.sources.dataset import Dataset


def _vecs(spark, ids, center):
    rng = np.random.default_rng(7)
    rows = [
        Row(
            vec_id=int(i),
            embedding=[float(x) for x in (np.array(center) + rng.normal(0, 0.05, 4))],
        )
        for i in ids
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_stream_append_cdc_index_search(spark, tmp_path_str):
    ds = Dataset(tmp_path_str + "/vecs")
    # initial corpus around two centers
    ds.write(_vecs(spark, range(100), [0.0, 0.0, 0.0, 0.0]))
    ds.write(_vecs(spark, range(100, 200), [5.0, 5.0, 5.0, 5.0]), mode="append")
    # dataset-BOUND build: index entries carry row addresses, so later
    # DV deletes mask search results without touching the index
    idx = IVFIndex.build(
        spark, None, tmp_path_str + "/idx", nlist=4, sample_size=512, dataset=ds
    )

    # streamed micro-batches land exactly-once (idempotency tags), in a
    # REMOTE region of the space the index has never seen
    ds.write(_vecs(spark, range(200, 220), [20.0, 20.0, 20.0, 20.0]),
             mode="append", tag="batch-1")
    ds.write(_vecs(spark, range(200, 220), [20.0, 20.0, 20.0, 20.0]),
             mode="append", tag="batch-1")  # replay: no-op
    ds.write(_vecs(spark, range(220, 240), [20.0, 20.0, 20.0, 20.0]),
             mode="append", tag="batch-2")

    # the CDC loop folds ONLY the delta into the index
    c = ChangeFeedConsumer(ds, tmp_path_str + "/ckpt", key="vec_id")
    c.reset_to(2)  # index was built at v2 (two initial writes)
    folded = []

    def fold(df, lo, hi):
        ins = df.filter("_change_type = 'insert'").select("vec_id")
        folded.append(ins.count())
        # re-key the delta through keyed_read so the appended index
        # entries carry row ADDRESSES (stay maskable by later deletes);
        # semi-join restricts to this window's inserts — fragments past
        # ``lo`` that a later window owns are excluded by the id match
        new = ds.keyed_read(spark, since_version=lo).join(
            ins, "vec_id", "left_semi"
        )
        idx.add(spark, new)

    assert c.process_available(spark, fold) >= 1
    assert sum(folded) == 40  # the replayed tag batch arrived once

    # a query at the new center finds the streamed vectors
    hits = idx.search(spark, [20.0, 20.0, 20.0, 20.0], k=5, nprobes=4).collect()
    assert len(hits) == 5
    assert all(200 <= r["vec_id"] < 240 for r in hits)
    # and the old space still answers correctly
    old = idx.search(spark, [0.0, 0.0, 0.0, 0.0], k=5, nprobes=4).collect()
    assert all(r["vec_id"] < 100 for r in old)

    # DELETE step: DV-tombstone half the streamed region — searches
    # must never return a deleted id again, with no index rewrite
    # (Lance deletion-file semantics: the mask is applied at query
    # time), and k results still come back from the survivors
    assert ds.delete_where(spark, "vec_id >= 220", dv=True)
    hits2 = idx.search(spark, [20.0, 20.0, 20.0, 20.0], k=10, nprobes=4).collect()
    assert len(hits2) == 10
    assert all(200 <= r["vec_id"] < 220 for r in hits2)
    # replaying the delete is an idempotent no-op (nothing matches)
    assert ds.delete_where(spark, "vec_id >= 220", dv=True) is None
