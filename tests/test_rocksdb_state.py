"""RocksDB state-store provider: the disk-backed streaming state the
reference runs on (Flink's RocksDBStateBackend is its production
state backend — flink-statebackend-rocksdb). Spark ships the same
engine as ``RocksDBStateStoreProvider``; at 100 TB a streaming
aggregation's keyed state cannot live on the executor heap, so this
gate proves the provider (a) computes the same answers as the default
HDFS-backed provider, (b) actually persists RocksDB artifacts, and
(c) restores across a query restart from the checkpoint."""

from __future__ import annotations

import os
import tempfile

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def _run_counts(spark, src: str, ckpt: str) -> dict[str, int]:
    final: dict[str, int] = {}

    def sink(df, _bid):
        for r in df.collect():
            final[r["k"]] = r["count"]

    q = (
        spark.readStream.schema("id long, k string")
        .json(src)
        .groupBy("k")
        .count()
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return final


def test_rocksdb_state_store_counts_and_restore(spark):
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    src = tempfile.mkdtemp(prefix="rocks_src_")
    ckpt = tempfile.mkdtemp(prefix="rocks_ckpt_")
    try:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB
        )
        spark.createDataFrame(
            [(i, f"k{i % 5}") for i in range(100)], "id long, k string"
        ).write.mode("append").json(src)
        got = _run_counts(spark, src, ckpt)
        assert got == {f"k{i}": 20 for i in range(5)}

        # real RocksDB artifacts in the checkpoint
        exts = set()
        for root, _dirs, files in os.walk(os.path.join(ckpt, "state")):
            exts.update(f.rsplit(".", 1)[-1] for f in files if "." in f)
        assert "sst" in exts or "zip" in exts, exts

        # restart from checkpoint: only the delta is re-aggregated,
        # counts continue from the RocksDB-restored state
        spark.createDataFrame(
            [(1000 + i, "k0") for i in range(7)], "id long, k string"
        ).write.mode("append").json(src)
        got2 = _run_counts(spark, src, ckpt)
        assert got2["k0"] == 27

        # same answers as the default provider from scratch
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        default_got = _run_counts(
            spark, src, tempfile.mkdtemp(prefix="rocks_ckpt2_")
        )
        assert default_got["k0"] == 27
        assert all(default_got[f"k{i}"] == 20 for i in range(1, 5))
    finally:
        if prev is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass"
            )
