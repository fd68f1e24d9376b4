"""REST row-service connector (sources/restds.py) — the Python
DataSource API surface the reference serves with its Kafka/ES
connector factories: partitioned batch reads, filter pushdown over
the wire, offset-contract streaming reads (both the driver-prefetch
and the executor-side range-partition form), and exactly-once writes
(two-phase batch commit; epoch-deduped streaming commit).
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from flink_tpcds_spark.sources import restds

DDL = "event_id bigint, event_type string, value double"


def _rows(n: int, base: int = 0) -> list[dict]:
    return [
        {
            "event_id": base + i,
            "event_type": f"t{(base + i) % 3}",
            "value": (base + i) * 1.7 + 0.123456789,
        }
        for i in range(n)
    ]


@pytest.fixture()
def service():
    srv, url = restds.start_row_service(DDL, _rows(600))
    yield url
    srv.shutdown()


@pytest.fixture()
def sink_service():
    srv, url = restds.start_row_service(DDL, [])
    yield url
    srv.shutdown()


def _read(spark, url, **opts):
    restds.register(spark)
    r = spark.read.format("flinkrest").option("url", url)
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_batch_read_parity_and_partitioning(spark, service):
    df = _read(spark, service, numpartitions=5)
    assert df.schema.simpleString() == (
        "struct<event_id:bigint,event_type:string,value:double>"
    )
    assert df.rdd.getNumPartitions() == 5
    got = sorted((r.event_id, r.event_type, r.value) for r in df.collect())
    want = sorted(
        (d["event_id"], d["event_type"], d["value"]) for d in _rows(600)
    )
    assert got == want  # doubles exact through the JSON wire


def test_filter_pushdown_absorbed_and_exact(spark, service):
    df = _read(spark, service, numpartitions=3)
    flt = df.filter(
        (F.col("event_type") == "t1")
        & (F.col("value") > 100.0)
        & F.col("event_id").isNotNull()
    )
    plan = flt._jdf.queryExecution().executedPlan().toString()
    # every conjunct is a supported pushdown class ⇒ no Spark-side Filter
    assert "Filter (" not in plan, plan
    want = [
        d
        for d in _rows(600)
        if d["event_type"] == "t1" and d["value"] > 100.0
    ]
    assert flt.count() == len(want)
    hits = restds._get(service + "/meta")["pushed_filter_hits"]
    assert hits >= 3  # one filtered fetch per partition


def test_unsupported_predicate_stays_spark_side(spark, service):
    df = _read(spark, service, numpartitions=2)
    flt = df.filter(F.col("value") * 2 > 500.0)  # arithmetic: not pushable
    plan = flt._jdf.queryExecution().executedPlan().toString()
    assert "Filter (" in plan
    want = sum(1 for d in _rows(600) if d["value"] * 2 > 500.0)
    assert flt.count() == want


def test_in_and_prefix_pushdown(spark, service):
    df = _read(spark, service, numpartitions=2)
    flt = df.filter(
        F.col("event_type").isin("t0", "t2")
        & F.col("event_type").startswith("t")
    )
    plan = flt._jdf.queryExecution().executedPlan().toString()
    assert "Filter (" not in plan, plan
    want = sum(1 for d in _rows(600) if d["event_type"] in ("t0", "t2"))
    assert flt.count() == want


def test_batch_write_two_phase_commit(spark, service):
    restds.register(spark)
    before = restds._get(service + "/latest")["offset"]
    out = spark.createDataFrame(
        [(10_000 + i, "w", float(i)) for i in range(57)], DDL
    ).repartition(4)
    out.write.format("flinkrest").option("url", service).mode(
        "append"
    ).save()
    after = restds._get(service + "/latest")["offset"]
    assert after == before + 57
    # commit() drained every staging buffer — nothing left behind
    df = _read(spark, service, numpartitions=2)
    assert df.filter(F.col("event_type") == "w").count() == 57


def test_batch_write_overwrite_rejected(spark, service):
    restds.register(spark)
    out = spark.createDataFrame([(1, "x", 1.0)], DDL)
    with pytest.raises(Exception, match="append-only"):
        out.write.format("flinkrest").option("url", service).mode(
            "overwrite"
        ).save()


def _run_available_now(spark, src_url, sink_url, ckpt, mode=None):
    reader = spark.readStream.format("flinkrest").option("url", src_url)
    if mode:
        reader = reader.option("mode", mode).option("numpartitions", "3")
    q = (
        reader.load()
        .writeStream.format("flinkrest")
        .option("url", sink_url)
        .option("queryname", "restds-test")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


@pytest.mark.parametrize("mode", [None, "scalable"])
def test_stream_incremental_offsets(spark, service, sink_service, mode):
    """Two availableNow runs over one checkpoint: the second run must
    read exactly the rows appended after the first — the Kafka offset
    contract (monotone latest, no re-read of committed ranges)."""
    ckpt = tempfile.mkdtemp(prefix="restds_ckpt_")
    _run_available_now(spark, service, sink_service, ckpt, mode)
    assert restds._get(sink_service + "/latest")["offset"] == 600
    restds._post(service + "/append", ndjson=_rows(40, base=600))
    _run_available_now(spark, service, sink_service, ckpt, mode)
    assert restds._get(sink_service + "/latest")["offset"] == 640
    got = sorted(
        r.event_id
        for r in _read(spark, sink_service, numpartitions=2).collect()
    )
    assert got == list(range(640))  # exactly once, no gaps


def test_stream_replay_between_offsets(spark, service):
    """readBetweenOffsets re-serves a planned range byte-identically —
    what a restarted query calls for a batch that was planned but not
    committed."""
    reader = restds.RestSimpleStreamReader(
        spark.createDataFrame([], DDL).schema, {"url": service}
    )
    a = list(
        reader.readBetweenOffsets({"offset": 10}, {"offset": 25})
    )
    b = list(
        reader.readBetweenOffsets({"offset": 10}, {"offset": 25})
    )
    assert a == b and len(a) == 15
    assert a[0][0] == 10 and a[-1][0] == 24


def test_stream_writer_epoch_dedup(spark, service, sink_service):
    """A replayed micro-batch commit (same queryname+epoch) is a
    server-side no-op; a different query's epoch 0 is NOT deduped."""
    ckpt = tempfile.mkdtemp(prefix="restds_ckpt_")
    _run_available_now(spark, service, sink_service, ckpt)
    n = restds._get(sink_service + "/latest")["offset"]
    # replay epoch 0 of the same query — deduped
    r = restds._post(
        sink_service + "/commit?epoch=restds-test-0", obj={"ids": []}
    )
    assert r.get("dedup") is True
    assert restds._get(sink_service + "/latest")["offset"] == n
    # a different query's epoch 0 with a fresh staged id — lands
    restds._post(
        sink_service + "/stage?id=probe", ndjson=_rows(3, base=9000)
    )
    r2 = restds._post(
        sink_service + "/commit?epoch=other-query-0",
        obj={"ids": ["probe"]},
    )
    assert r2.get("dedup") is None
    assert restds._get(sink_service + "/latest")["offset"] == n + 3


def test_commit_unknown_stage_id_is_conflict(spark, sink_service):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        restds._post(
            sink_service + "/commit", obj={"ids": ["never-staged"]}
        )
    assert ei.value.code == 409


def test_batch_write_chunked_staging(spark, sink_service, monkeypatch):
    """A partition larger than the stage chunk is streamed in bounded
    chunks — every chunk id lands in the commit, memory stays
    O(chunk)."""
    monkeypatch.setattr(restds, "_STAGE_CHUNK_ROWS", 100)
    restds.register(spark)
    out = spark.createDataFrame(
        [(i, "c", float(i)) for i in range(1050)], DDL
    ).coalesce(2)
    out.write.format("flinkrest").option("url", sink_service).mode(
        "append"
    ).save()
    assert restds._get(sink_service + "/latest")["offset"] == 1050
    got = sorted(
        r.event_id
        for r in _read(spark, sink_service, numpartitions=2).collect()
    )
    assert got == list(range(1050))
