"""Source/sink layer tests: dsdgen CSV round-trip (null handling,
projection pushdown), partitioned sink, bucketed shuffle-free join.
Scratch space lives under the repo (gitignored) — nothing outside
/root/repo is written.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_tpcds_spark.schemas import load_table
from flink_tpcds_spark.sources import (
    bucket_table,
    bucketed_join_ready,
    read_dsdgen_csv,
    write_csv,
    write_partitioned,
)

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".scratch")


@pytest.fixture(scope="module", autouse=True)
def scratch_dir():
    os.makedirs(SCRATCH, exist_ok=True)
    yield SCRATCH
    shutil.rmtree(SCRATCH, ignore_errors=True)


def test_dsdgen_csv_roundtrip_nulls(spark, scratch_dir):
    path = os.path.join(scratch_dir, "csv_rt")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    src = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, None, None), (3, "gamma", 2.25)], schema
    )
    write_csv(src, path)
    back = read_dsdgen_csv(spark, path, schema)
    rows = {r.id: (r.name, r.price) for r in back.collect()}
    # dsdgen convention: empty string → NULL (CsvTableSource2 behavior)
    assert rows[2] == (None, None)
    assert rows[1] == ("alpha", 1.5)
    assert rows[3] == ("gamma", 2.25)


def test_csv_projection_prunes(spark, scratch_dir, sf_dir):
    path = os.path.join(scratch_dir, "csv_lineitem")
    li = load_table(spark, sf_dir, "lineitem").limit(100)
    write_csv(li, path)
    back = read_dsdgen_csv(
        spark, path, load_table(spark, sf_dir, "lineitem").schema
    )
    # projectable source: selecting 2 columns must not error and must
    # produce exactly those columns (CsvTableSource2's projection)
    sel = back.select("l_orderkey", "l_quantity")
    assert sel.columns == ["l_orderkey", "l_quantity"]
    assert sel.count() == 100


def test_partitioned_sink_layout(spark, scratch_dir, sf_dir):
    path = os.path.join(scratch_dir, "part_out")
    orders = load_table(spark, sf_dir, "orders")
    write_partitioned(orders, path, ["o_orderstatus"])
    subdirs = {d for d in os.listdir(path) if d.startswith("o_orderstatus=")}
    assert subdirs == {
        "o_orderstatus=F",
        "o_orderstatus=O",
        "o_orderstatus=P",
    }
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    # partition pruning: filtering on the partition column reads 1 dir
    pruned = back.filter(F.col("o_orderstatus") == "F")
    assert pruned.count() == orders.filter(F.col("o_orderstatus") == "F").count()


def test_bucketed_join_has_no_exchange(spark, scratch_dir, sf_dir):
    # tables land in ./spark-warehouse (repo-local, gitignored);
    # warehouse.dir is a static conf and cannot move mid-session
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    l = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o_orderkey"), "l_quantity")
    )
    bucket_table(o, "b_orders", ["o_orderkey"], n_buckets=8)
    bucket_table(l, "b_lineitem", ["o_orderkey"], n_buckets=8)
    joined = bucketed_join_ready(spark, "b_orders", "b_lineitem", "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, (
        "bucketed join must be shuffle-free"
    )
    assert joined.count() > 0
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_json_format_roundtrip(spark, scratch_dir, sf_dir):
    """§2.1 formats: JSON sink/source with explicit schema (the
    reference's flink-json format module)."""
    path = os.path.join(scratch_dir, "json_rt")
    src = load_table(spark, sf_dir, "nation")
    src.write.mode("overwrite").json(path)
    back = spark.read.schema(src.schema).json(path)
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in src.collect()
    }


def test_orc_format_roundtrip(spark, scratch_dir, sf_dir):
    """§2.1 formats: ORC sink/source (the reference's flink-orc)."""
    path = os.path.join(scratch_dir, "orc_rt")
    src = load_table(spark, sf_dir, "region")
    src.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in src.collect()
    }
    # ORC scans support predicate pushdown too
    from flink_tpcds_spark.plans import explain_text

    assert "PushedFilters" in explain_text(
        back.filter(F.col("r_regionkey") > 2)
    )


def test_avro_roundtrip(spark, sf_dir, tmp_path):
    """Pure-python Avro OCF sink + source (reference flink-avro): a
    multi-partition write must round-trip values, nulls and types
    exactly, through both deflate and null codecs."""
    from flink_tpcds_spark.sources.avro import read_avro, write_avro

    df = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("price"),
            "o_orderpriority",
            (F.col("o_orderkey") % 2 == 0).alias("even"),
            # exercise nulls in every type family
            F.when(F.col("o_orderkey") % 7 != 0, F.col("o_custkey")).alias(
                "custkey_or_null"
            ),
            F.when(
                F.col("o_orderkey") % 5 != 0, F.col("o_orderstatus")
            ).alias("status_or_null"),
        )
        .repartition(4)
    )
    for codec in ("deflate", "null"):
        path = str(tmp_path / f"avro_{codec}")
        write_avro(df, path, codec=codec)
        import os

        files = [f for f in os.listdir(path) if f.endswith(".avro")]
        assert len(files) == 4  # one OCF file per partition
        back = read_avro(spark, path)
        assert back.schema == df.schema
        assert {tuple(r) for r in back.collect()} == {
            tuple(r) for r in df.collect()
        }


def test_avro_logical_types_roundtrip(spark, sf_dir, tmp_path):
    """Avro logical types (reference AvroSchemaConverter surface):
    decimal (TPC-H money columns, exact — no double detour),
    timestamp-micros, and date must round-trip values + nulls with
    the exact Spark schema preserved."""
    from flink_tpcds_spark.sources.avro import read_avro, write_avro

    df = (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_totalprice",  # decimal(15,2) as generated
            (F.col("o_totalprice") % 1000).cast("decimal(7,2)").alias("price7"),
            "o_orderdate",  # date
            F.when(F.col("o_orderkey") % 3 != 0, F.col("o_totalprice")).alias(
                "price_or_null"
            ),
        )
        .limit(200)
        .repartition(2)
    )
    ts = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts")
        .limit(100)
        .repartition(2)
    )
    for frame, tag in ((df, "orders"), (ts, "events")):
        path = str(tmp_path / f"avro_logical_{tag}")
        write_avro(frame, path)
        back = read_avro(spark, path)
        assert back.schema == frame.schema
        assert {tuple(r) for r in back.collect()} == {
            tuple(r) for r in frame.collect()
        }


def test_avro_rejects_unsupported_type(spark, sf_dir, tmp_path):
    from flink_tpcds_spark.sources.avro import write_avro

    df = (
        load_table(spark, sf_dir, "documents")
        .select(F.split("text", " ").alias("words"))  # array<string>
    )
    with pytest.raises(TypeError):
        write_avro(df, str(tmp_path / "x"))


def test_compact_parquet_reduces_files_preserves_rows(spark, sf_dir, tmp_path):
    from flink_tpcds_spark.schemas import load_table
    from flink_tpcds_spark.sources.compact import compact_parquet

    docs = load_table(spark, sf_dir, "documents")
    src = str(tmp_path / "fragmented")
    # simulate a micro-batch-accumulated table: 40 tiny files
    docs.repartition(40).write.parquet(src)
    dst = str(tmp_path / "compacted")
    manifest = compact_parquet(
        spark, src, dst, target_file_bytes=64 * 1024 * 1024
    )
    assert manifest["src_files"] >= 40
    assert manifest["dst_files"] < manifest["src_files"]
    assert manifest["dst_files"] == manifest["tasks"]
    # row-exact rewrite
    a = sorted(map(tuple, spark.read.parquet(src).collect()))
    b = sorted(map(tuple, spark.read.parquet(dst).collect()))
    assert a == b


def test_compact_parquet_rejects_in_place_overwrite(spark, sf_dir, tmp_path):
    """dst == src would truncate the source mid-scan — refused."""
    from flink_tpcds_spark.schemas import load_table
    from flink_tpcds_spark.sources.compact import compact_parquet

    src = str(tmp_path / "table")
    load_table(spark, sf_dir, "region").write.parquet(src)
    with pytest.raises(ValueError, match="dst_path == src_path"):
        compact_parquet(spark, src, str(tmp_path / "." / "table"))


def test_zorder_layout_skips_on_both_columns(spark, sf_dir, tmp_path):
    """Data-skipping property: after a Z-order rewrite on (user_id,
    value), per-file min/max spans are narrow on BOTH columns, where
    a single-column sort leaves the second column unclustered
    (per-file span ≈ full range → zero skipping)."""
    import glob

    import pyarrow.parquet as pq

    from flink_tpcds_spark.schemas import load_table
    from flink_tpcds_spark.sources.zorder import write_zordered

    e = load_table(spark, sf_dir, "events").select("user_id", "value")
    zpath = str(tmp_path / "zordered")
    lpath = str(tmp_path / "linear")
    write_zordered(e, zpath, ["user_id", "value"], n_files=8)
    (
        e.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.parquet(lpath)
    )

    def coverage(path, col):
        spans, lo, hi = [], None, None
        for f in glob.glob(path + "/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.to_arrow_schema().get_field_index(col)
            fmin = min(
                md.row_group(i).column(idx).statistics.min
                for i in range(md.num_row_groups)
            )
            fmax = max(
                md.row_group(i).column(idx).statistics.max
                for i in range(md.num_row_groups)
            )
            spans.append((fmin, fmax))
            lo = fmin if lo is None else min(lo, fmin)
            hi = fmax if hi is None else max(hi, fmax)
        rng = (hi - lo) or 1
        return sum((b - a) for a, b in spans) / (len(spans) * rng)

    # rows preserved exactly
    assert sorted(map(tuple, spark.read.parquet(zpath).collect())) == sorted(
        map(tuple, e.collect())
    )
    # the single-column layout cannot skip on the second column
    l_value = coverage(lpath, "value")
    assert l_value > 0.6, l_value
    # the z-ordered layout skips on both (measured: ~0.56 / ~0.27)
    z_user, z_value = coverage(zpath, "user_id"), coverage(zpath, "value")
    assert z_user < 0.65, z_user
    assert z_value < 0.45, z_value
    assert z_value < l_value - 0.15


def test_incremental_agg_matches_full_recompute(spark, sf_dir, tmp_path):
    """Batch-incremental rollup: feeding the events table in 4
    arbitrary batches must yield EXACTLY the single-pass aggregation
    (decimal-bridged sums make the merge associative), and each
    update must only scan the new batch plus the state."""
    from flink_tpcds_spark.schemas import load_table
    from flink_tpcds_spark.sources.incremental import IncrementalAggState

    e = load_table(spark, sf_dir, "events")
    state = IncrementalAggState(
        str(tmp_path / "rollup"), ["event_type"], "value"
    )
    # 4 deterministic, uneven batches covering every row exactly once
    for i in range(4):
        state.update(spark, e.filter(F.pmod(F.col("event_id"), F.lit(4)) == i))
    got = {
        r.event_type: (r.cnt, r.total, r.min_value, r.max_value, r.avg_value)
        for r in state.result(spark).collect()
    }
    full = {
        r.event_type: (r.cnt, r.total, r.min_value, r.max_value, r.avg_value)
        for r in e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            (
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_value"),
        )
        .collect()
    }
    assert got == full
    # a key appearing only in a later batch merges via the outer join
    extra = spark.createDataFrame(
        [(999999, "brand_new_type", 5.0)],
        "event_id long, event_type string, value double",
    )
    state.update(spark, extra)
    got2 = {r.event_type: r.cnt for r in state.result(spark).collect()}
    assert got2["brand_new_type"] == 1
    assert got2[max(full)] == full[max(full)][0]


def test_docgen_datasource_deterministic_and_partitioned(spark):
    """Custom Python DataSource: registered format plans one
    InputPartition per shard, generates the full id range exactly
    once, and is bit-deterministic across reads and shard counts."""
    from flink_tpcds_spark.sources.docgen import DocGenDataSource

    spark.dataSource.register(DocGenDataSource)
    df = (
        spark.read.format("docgen")
        .option("n_docs", 200)
        .option("n_shards", 4)
        .option("seed", "s1")
        .load()
    )
    rows = df.collect()
    assert len(rows) == 200
    assert sorted(r.doc_id for r in rows) == list(range(200))
    assert df.rdd.getNumPartitions() == 4
    # deterministic across reads AND across partitioning choices
    again = (
        spark.read.format("docgen")
        .option("n_docs", 200)
        .option("n_shards", 7)
        .option("seed", "s1")
        .load()
        .collect()
    )
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # a different seed generates different text
    other = (
        spark.read.format("docgen")
        .option("n_docs", 200)
        .option("seed", "s2")
        .load()
        .collect()
    )
    assert sorted(map(tuple, rows)) != sorted(map(tuple, other))
    # generated corpus feeds the normal pipeline (smoke: token stats)
    from flink_tpcds_spark.datapipe.text import token_stats

    assert token_stats(df).filter(F.col("n_tokens") >= 10).count() == 200


def test_docgen_filter_pushdown_narrows_partitions(spark):
    """doc_id range predicates reach the source: the generator plans
    partitions over only the surviving id range (the custom-source
    analog of parquet PushedFilters), and results are identical to
    post-scan filtering."""
    from flink_tpcds_spark.sources.docgen import DocGenDataSource

    spark.dataSource.register(DocGenDataSource)

    def rd():
        return (
            spark.read.format("docgen")
            .option("n_docs", 1000)
            .option("n_shards", 8)
            .option("seed", "pf")
            .load()
        )

    full = rd().collect()
    pushed = rd().filter("doc_id >= 900")
    rows = pushed.collect()
    assert sorted(r.doc_id for r in rows) == list(range(900, 1000))
    assert sorted(map(tuple, rows)) == sorted(
        tuple(r) for r in full if r.doc_id >= 900
    )
    # 100 surviving ids over 8 requested shards -> planned over the
    # narrow range only; a non-pushed scan would keep 8 full shards
    # of 125 ids each and generate all 1000
    assert pushed.rdd.getNumPartitions() <= 8
    sliver = rd().filter("doc_id = 42")
    assert [r.doc_id for r in sliver.collect()] == [42]
    assert sliver.rdd.getNumPartitions() == 1
    # unsupported predicates still evaluate correctly post-scan
    mixed = rd().filter("doc_id < 10 and lang = 'en'").collect()
    assert all(r.lang == "en" and r.doc_id < 10 for r in mixed)


def test_bucketed_posture_removes_fact_join_exchanges(spark, sf_dir):
    """VERDICT r7 item 4: the bucketed POSTURE — install the redirect
    and every registry query inherits shuffle-free fact⋈fact joins.
    Gate: h21 (EXISTS/NOT-EXISTS lineitem self-join, the steepest
    ×100 scaler) must lose its l_orderkey exchanges and keep its
    result identical to the plain-parquet run."""
    from flink_tpcds_spark.queries import all_queries
    from flink_tpcds_spark.sources.bucketing import (
        install_bucketed_posture,
        uninstall_bucketed_posture,
    )

    q = all_queries()["h21_suppliers_waiting"]
    # Pin the corpus-sized regime: at sf0.1 every join side broadcasts
    # and there is no exchange to remove — the posture exists for the
    # scale where lineitem⋈lineitem must sort-merge (the ×100
    # measurement in BENCH_NOTES). Forcing SMJ reproduces that plan
    # shape on micro data.
    prev = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        plain = q(spark, sf_dir)
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        plain_rows = {tuple(r) for r in plain.collect()}
        assert "Exchange hashpartitioning(l_orderkey" in plain_plan

        try:
            install_bucketed_posture(spark, sf_dir)
            bkt = q(spark, sf_dir)
            bkt_plan = bkt._jdf.queryExecution().executedPlan().toString()
            assert (
                "Exchange hashpartitioning(l_orderkey" not in bkt_plan
            ), "bucketed posture must not shuffle lineitem on its bucket key"
            assert bkt_plan.count("Exchange") < plain_plan.count("Exchange")
            assert {tuple(r) for r in bkt.collect()} == plain_rows
        finally:
            uninstall_bucketed_posture()
        # and the redirect is really gone
        again = q(spark, sf_dir)
        assert {tuple(r) for r in again.collect()} == plain_rows
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_returns_pair_bucket_spec_removes_ticket_exchanges(spark):
    """The TPC-DS analog of the order-key posture: store_sales ⋈
    store_returns on (ticket, item) — the q24/q17-class join CBO
    correctly refuses to broadcast at SF10 (BENCH_NOTES "Round 8:
    SF10": q24a 80.7 → 31.7 s from this spec). Gate: bucketing both
    facts per TPCDS_RETURNS_BUCKET_SPEC removes the ticket-key
    exchanges in the forced-SMJ regime and keeps results identical."""
    from flink_tpcds_spark.sources.bucketing import (
        TPCDS_RETURNS_BUCKET_SPEC,
        bucket_table,
    )
    from flink_tpcds_spark.tpcds import datagen

    data_dir = datagen.generate()
    ss = spark.read.parquet(os.path.join(data_dir, "store_sales.parquet"))
    sr = spark.read.parquet(os.path.join(data_dir, "store_returns.parquet"))
    on = [
        ss["ss_ticket_number"] == sr["sr_ticket_number"],
        ss["ss_item_sk"] == sr["sr_item_sk"],
    ]
    prev = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        plain = ss.join(sr, on).select("ss_ticket_number", "ss_item_sk", "sr_return_amt")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(ss_ticket_number" in plain_plan
        plain_rows = sorted(tuple(r) for r in plain.collect())

        for t, cols in TPCDS_RETURNS_BUCKET_SPEC.items():
            df = spark.read.parquet(os.path.join(data_dir, f"{t}.parquet"))
            bucket_table(df, f"b_{t}", cols, n_buckets=8, sort_cols=cols)
        bss, bsr = spark.table("b_store_sales"), spark.table("b_store_returns")
        bkt = bss.join(
            bsr,
            [
                bss["ss_ticket_number"] == bsr["sr_ticket_number"],
                bss["ss_item_sk"] == bsr["sr_item_sk"],
            ],
        ).select("ss_ticket_number", "ss_item_sk", "sr_return_amt")
        bkt_plan = bkt._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(ss_ticket_number" not in bkt_plan, (
            "returns-pair posture must not shuffle on its bucket keys"
        )
        assert bkt_plan.count("Exchange") < plain_plan.count("Exchange")
        assert sorted(tuple(r) for r in bkt.collect()) == plain_rows
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        spark.sql("DROP TABLE IF EXISTS b_store_sales")
        spark.sql("DROP TABLE IF EXISTS b_store_returns")


# ---------------------------------------------------------------------------
# SQLite connector (sources/sqlite.py) — the JDBC-connector contract
# against a real SQL database
# ---------------------------------------------------------------------------
def _sqlite_events(spark, sf_dir, db, n=2000):
    from flink_tpcds_spark.sources.sqlite import SQLiteDataSource

    spark.dataSource.register(SQLiteDataSource)
    ev = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .select("event_id", "user_id", "event_type", "value")
        .withColumn("value", F.col("value").cast("double"))
        .limit(n)
    )
    ev.write.format("sqlitedb").option("path", db).option(
        "table", "events"
    ).mode("append").save()
    return ev


def test_sqlite_connector_roundtrip_and_schema(spark, sf_dir, tmp_path):
    """Write → catalog schema discovery → partitioned read back:
    value-exact round trip through a real SQL database, types mapped
    from declared affinities."""
    db = str(tmp_path / "rt.db")
    ev = _sqlite_events(spark, sf_dir, db)
    back = (
        spark.read.format("sqlitedb")
        .option("path", db)
        .option("table", "events")
        .option("num_partitions", 5)
        .load()
    )
    assert back.schema.simpleString() == (
        "struct<event_id:bigint,user_id:bigint,"
        "event_type:string,value:double>"
    )
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, ev.collect())
    )


def test_sqlite_connector_filter_pushdown(spark, sf_dir, tmp_path):
    """Pushable predicates are ABSORBED into the database query (no
    Spark-side Filter over the scan) and a range on the partition
    column narrows the planned stride to fewer tasks."""
    db = str(tmp_path / "pd.db")
    ev = _sqlite_events(spark, sf_dir, db)
    back = (
        spark.read.format("sqlitedb")
        .option("path", db)
        .option("table", "events")
        .option("partition_column", "event_id")
        .option("num_partitions", 8)
        .load()
    )
    flt = back.filter(
        (F.col("event_type") == "click") & (F.col("value") > 50.0)
    )
    plan = flt._jdf.queryExecution().executedPlan().toString()
    assert "Filter " not in plan, f"pushable filters must be absorbed:\n{plan}"
    want = [
        t
        for t in map(tuple, ev.collect())
        if t[2] == "click" and t[3] > 50.0
    ]
    assert sorted(map(tuple, flt.collect())) == sorted(want)
    # partition-column range pushdown narrows PLANNING, not just rows:
    # a point lookup plans exactly ONE task (stride = min(parts, range))
    full_parts = back.rdd.getNumPartitions()
    some_id = ev.agg(F.min("event_id")).first()[0]
    pt = back.filter(F.col("event_id") == some_id)
    assert pt.rdd.getNumPartitions() == 1 < full_parts
    assert pt.count() == 1


def test_sqlite_connector_commit_protocol(spark, sf_dir, tmp_path):
    """Two-phase commit: a job that fails mid-write leaves the target
    table untouched (staged files never applied); overwrite applies
    truncate + all task batches in one transaction."""
    db = str(tmp_path / "tp.db")
    ev = _sqlite_events(spark, sf_dir, db, n=500)
    import sqlite3

    con = sqlite3.connect(db)
    assert con.execute("select count(*) from events").fetchone() == (500,)

    @F.udf("double")
    def boom(v):
        raise RuntimeError("mid-write failure")

    bad = ev.withColumn("value", boom("value"))
    try:
        bad.write.format("sqlitedb").option("path", db).option(
            "table", "events"
        ).mode("append").save()
        raise AssertionError("job should have failed")
    except Exception:
        pass
    assert con.execute("select count(*) from events").fetchone() == (500,)

    ev.limit(50).write.format("sqlitedb").option("path", db).option(
        "table", "events"
    ).mode("overwrite").save()
    assert con.execute("select count(*) from events").fetchone() == (50,)
    import glob

    assert glob.glob(db + ".staging*") == []
    # failed job leaves no staging-table bloat in the database either
    assert con.execute(
        "select count(*) from sqlite_master where name like '__staging%'"
    ).fetchone() == (0,)


def test_sqlite_upsert_sink_exactly_once(spark, sf_dir, tmp_path):
    """JDBCUpsertTableSink analog: update-mode batches land as keyed
    INSERT OR REPLACE; a replayed batch_id is a transactional no-op
    (the applied-batch marker commits WITH the data); the table holds
    the keep-last snapshot."""
    from flink_tpcds_spark.sources.sqlite import (
        SQLiteDataSource,
        SQLiteUpsertSink,
    )

    spark.dataSource.register(SQLiteDataSource)
    db = str(tmp_path / "ups.db")
    sink = SQLiteUpsertSink(db, "agg", ["event_type"])
    ev = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .select("event_id", "event_type", F.col("value").cast("double"))
    )
    # 3 cumulative update-mode batches over growing prefixes (the
    # shape an update-mode agg emits), batch 1 replayed
    for b, cut in enumerate((1000, 2000, 3000)):
        batch = (
            ev.filter(F.col("event_id") < cut)
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum(F.col("value").cast("decimal(18,6)"))
                .cast("double")
                .alias("total"),
            )
        )
        sink.foreach_batch(batch, b)
        if b == 1:
            stale = batch.withColumn("cnt", F.lit(-1).cast("bigint"))
            sink.foreach_batch(stale, 1)  # replay: must be skipped
    want = sorted(
        tuple(r)
        for r in ev.filter(F.col("event_id") < 3000)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total"),
        )
        .collect()
    )
    got = sorted(tuple(r) for r in sink.snapshot(spark).collect())
    assert got == want
    assert all(r[1] > 0 for r in got)  # the stale replay never landed


def test_sqlite_connector_review_regressions(spark, sf_dir, tmp_path):
    """Round-8 review fixes: (1) >10 write tasks survive SQLite's
    10-ATTACH cap; (2) string-match predicates are NOT pushed (SQLite
    LIKE is case-insensitive and wildcard-leaky) — Spark semantics
    win; (3) NULL partition-column rows ride the first stride instead
    of silently vanishing."""
    import sqlite3

    from flink_tpcds_spark.sources.sqlite import SQLiteDataSource

    spark.dataSource.register(SQLiteDataSource)

    # (1) 16 tasks > SQLITE_MAX_ATTACHED=10
    db = str(tmp_path / "many.db")
    big = spark.range(0, 4000).select(
        F.col("id").alias("k"), F.concat(F.lit("v"), F.col("id")).alias("s")
    ).repartition(16)
    big.write.format("sqlitedb").option("path", db).option(
        "table", "t"
    ).mode("append").save()
    con = sqlite3.connect(db)
    assert con.execute("select count(*), count(distinct k) from t").fetchone() == (
        4000,
        4000,
    )
    assert con.execute(
        "select count(*) from sqlite_master where name like '__staging%'"
    ).fetchone() == (0,)

    # (2) case-sensitive startswith through the connector
    db2 = str(tmp_path / "case.db")
    spark.createDataFrame(
        [(1, "Click"), (2, "click"), (3, "c%lick"), (4, None)],
        "k long, s string",
    ).coalesce(1).write.format("sqlitedb").option("path", db2).option(
        "table", "t"
    ).mode("append").save()
    t2 = (
        spark.read.format("sqlitedb")
        .option("path", db2)
        .option("table", "t")
        .load()
    )
    assert [r.k for r in t2.filter(F.col("s").startswith("cl")).collect()] == [2]
    assert [r.k for r in t2.filter(F.col("s").contains("%")).collect()] == [3]

    # (3) NULL partition-column rows are read (first stride), and a
    # range predicate on the partition column still excludes them
    t3 = (
        spark.read.format("sqlitedb")
        .option("path", db2)
        .option("table", "t")
        .option("partition_column", "k")
        .option("num_partitions", 3)
        .load()
    )
    db3 = str(tmp_path / "nullpc.db")
    spark.createDataFrame(
        [(None, "a"), (None, "b"), (5, "c")], "k long, s string"
    ).coalesce(1).write.format("sqlitedb").option("path", db3).option(
        "table", "t"
    ).mode("append").save()
    t4 = (
        spark.read.format("sqlitedb")
        .option("path", db3)
        .option("table", "t")
        .option("partition_column", "k")
        .option("num_partitions", 3)
        .load()
    )
    assert t4.count() == 3  # NULL rows not dropped
    assert t4.filter(F.col("k") >= 0).count() == 1  # predicate excludes NULLs
    assert t3.count() == 4


# ---------------------------------------------------------------------------
# MERGE INTO (sources/merge.py — lakehouse upsert on plain parquet)
# ---------------------------------------------------------------------------
def _merge_target(spark, tmp_path, rows):
    path = str(tmp_path / "merge_target")
    spark.createDataFrame(rows, "k long, v string").write.parquet(path)
    return path


def test_merge_into_update_insert(spark, tmp_path):
    from flink_tpcds_spark.sources.merge import merge_into

    tgt = _merge_target(spark, tmp_path, [(1, "a"), (2, "b"), (3, "c")])
    src = spark.createDataFrame([(2, "B"), (4, "D")], "k long, v string")
    m = merge_into(spark, tgt, src, ["k"], when_matched="update")
    got = {(r.k, r.v) for r in spark.read.parquet(tgt).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (4, "D")}
    assert m["rows_after"] == 4
    # swap is clean: no .old / .merge-* leftovers next to the table
    parent = os.path.dirname(tgt)
    leftovers = [d for d in os.listdir(parent) if ".merge-" in d or d.endswith(".old")]
    assert leftovers == []


def test_merge_into_update_without_insert(spark, tmp_path):
    from flink_tpcds_spark.sources.merge import merge_into

    tgt = _merge_target(spark, tmp_path, [(1, "a"), (2, "b")])
    src = spark.createDataFrame([(2, "B"), (9, "X")], "k long, v string")
    merge_into(
        spark, tgt, src, ["k"], when_matched="update", insert_not_matched=False
    )
    got = {(r.k, r.v) for r in spark.read.parquet(tgt).collect()}
    assert got == {(1, "a"), (2, "B")}


def test_merge_into_delete_modes(spark, tmp_path):
    from flink_tpcds_spark.sources.merge import merge_into

    tgt = _merge_target(spark, tmp_path, [(1, "a"), (2, "b"), (3, "c")])
    # delete matched, insert unmatched
    src = spark.createDataFrame([(2, "ignored"), (5, "E")], "k long, v string")
    merge_into(spark, tgt, src, ["k"], when_matched="delete")
    got = {(r.k, r.v) for r in spark.read.parquet(tgt).collect()}
    assert got == {(1, "a"), (3, "c"), (5, "E")}
    # pure delete: key-only source is accepted
    dels = spark.createDataFrame([(1,)], "k long")
    merge_into(
        spark, tgt, dels, ["k"], when_matched="delete", insert_not_matched=False
    )
    got = {(r.k, r.v) for r in spark.read.parquet(tgt).collect()}
    assert got == {(3, "c"), (5, "E")}


def test_merge_into_rejects_duplicate_source_keys(spark, tmp_path):
    from flink_tpcds_spark.sources.merge import merge_into

    tgt = _merge_target(spark, tmp_path, [(1, "a")])
    src = spark.createDataFrame(
        [(1, "x"), (1, "y")], "k long, v string"
    )
    with pytest.raises(ValueError, match="not key-unique"):
        merge_into(spark, tgt, src, ["k"], validate=True)
    # target untouched after the failed merge
    assert spark.read.parquet(tgt).count() == 1


def test_merge_into_rejects_schema_drift_on_update(spark, tmp_path):
    from flink_tpcds_spark.sources.merge import merge_into

    tgt = _merge_target(spark, tmp_path, [(1, "a")])
    src = spark.createDataFrame([(1, "x", 0.5)], "k long, v string, w double")
    with pytest.raises(ValueError, match="schemas differ"):
        merge_into(spark, tgt, src, ["k"], when_matched="update")


# ---------------------------------------------------------------------------
# Incremental join-view maintenance (sources/ivm.py)
# ---------------------------------------------------------------------------
def test_join_view_matches_batch_join_any_arrival_order(spark, tmp_path):
    from flink_tpcds_spark.sources.ivm import JoinViewState

    a_rows = [(k, f"p{k % 3}") for k in range(20)]
    b_rows = [(k % 10, i, float(k)) for i, k in enumerate(range(30))]
    a = spark.createDataFrame(a_rows, "k long, attr string")
    b = spark.createDataFrame(b_rows, "k long, line long, qty double")
    st = JoinViewState(str(tmp_path / "jv"), ["k"])
    # adversarial split: a by k%3, b by line%3 — every arrival order
    for i in range(3):
        st.update(
            spark,
            a.filter(F.col("k") % 3 == i),
            b.filter(F.col("line") % 3 == i),
            i,
        )
    got = sorted(map(tuple, st.view(spark).collect()))
    want = sorted(map(tuple, a.join(b, "k").collect()))
    assert got == want


def test_join_view_replay_is_idempotent(spark, tmp_path):
    from flink_tpcds_spark.sources.ivm import JoinViewState

    a = spark.createDataFrame([(1, "x"), (2, "y")], "k long, attr string")
    b = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, qty double")
    st = JoinViewState(str(tmp_path / "jv"), ["k"])
    st.update(spark, a.filter("k = 1"), b.filter("k = 2"), 0)
    st.update(spark, a.filter("k = 2"), b.filter("k = 1"), 1)
    before = sorted(map(tuple, st.view(spark).collect()))
    # replay both batches in any order — pure overwrite, no growth
    st.update(spark, a.filter("k = 2"), b.filter("k = 1"), 1)
    st.update(spark, a.filter("k = 1"), b.filter("k = 2"), 0)
    after = sorted(map(tuple, st.view(spark).collect()))
    assert before == after == sorted(
        map(tuple, a.join(b, "k").collect())
    )


def test_join_view_rejects_overlapping_value_columns(spark, tmp_path):
    from flink_tpcds_spark.sources.ivm import JoinViewState

    a = spark.createDataFrame([(1, "x")], "k long, v string")
    b = spark.createDataFrame([(1, "y")], "k long, v string")
    st = JoinViewState(str(tmp_path / "jv"), ["k"])
    with pytest.raises(ValueError, match="disjoint"):
        st.update(spark, a, b, 0)


def test_join_view_random_batches_match_model():
    """Property test: JoinViewState against the batch join over
    RANDOM both-side delta sequences — random key multiplicities
    (bag semantics), uneven side arrival, and random batch REPLAYS
    injected mid-sequence. After every sequence the maintained view
    must equal the plain join of everything delivered exactly once."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from flink_tpcds_spark.session import get_spark
    from flink_tpcds_spark.sources.ivm import JoinViewState

    spark = get_spark("ivm-prop")

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(  # per batch: (a-side keys, b-side keys) w/ dup keys
            st.tuples(
                st.lists(st.integers(0, 3), max_size=3),
                st.lists(st.integers(0, 3), max_size=3),
            ),
            min_size=1,
            max_size=4,
        ),
        st.integers(0, 3),  # index of the batch to replay (mod len)
    )
    def check(batches, replay_at):
        import shutil
        import tempfile

        work = tempfile.mkdtemp(prefix="ivm_prop_")
        try:
            st_view = JoinViewState(work, ["k"])
            all_a, all_b = [], []
            seq = 0
            for i, (aks, bks) in enumerate(batches):
                a_rows = [(k, f"a{seq}_{j}") for j, k in enumerate(aks)]
                b_rows = [(k, float(seq * 10 + j)) for j, k in enumerate(bks)]
                seq += 1
                da = spark.createDataFrame(
                    a_rows, "k long, attr string"
                )
                db = spark.createDataFrame(b_rows, "k long, qty double")
                st_view.update(spark, da, db, i)
                if i == replay_at % len(batches):
                    st_view.update(spark, da, db, i)  # at-least-once
                all_a += a_rows
                all_b += b_rows
            got = sorted(map(tuple, st_view.view(spark).collect()))
            want = sorted(
                (k, attr, qty)
                for k, attr in all_a
                for k2, qty in all_b
                if k == k2
            )
            assert got == want
        finally:
            shutil.rmtree(work, ignore_errors=True)

    check()


def test_merge_into_random_sequences_match_model():
    """Property test: merge_into against a dict reference model over
    random merge sequences — random key overlap, update vs delete,
    insert on/off — applied to the same evolving parquet target."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from flink_tpcds_spark.session import get_spark
    from flink_tpcds_spark.sources.merge import merge_into

    spark = get_spark("merge-prop")

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        st.lists(  # merges: (key->value source, mode, insert?)
            st.tuples(
                st.dictionaries(
                    st.integers(0, 5), st.integers(0, 9),
                    min_size=1, max_size=4,
                ),
                st.sampled_from(["update", "delete"]),
                st.booleans(),
            ),
            min_size=1,
            max_size=4,
        ),
    )
    def check(merges):
        import shutil
        import tempfile

        from flink_tpcds_spark.sources.merge import (
            convert_to_bucketed,
            read_merge_table,
        )

        work = tempfile.mkdtemp(prefix="merge_prop_")
        try:
            init = {1: 100, 2: 200, 3: 300}
            # SAME random sequence against both physical layouts —
            # the bucketed path must be logically invisible
            tgt = os.path.join(work, "t")
            btgt = os.path.join(work, "tb")
            for p in (tgt, btgt):
                spark.createDataFrame(
                    list(init.items()), "k long, v long"
                ).write.parquet(p)
            convert_to_bucketed(spark, btgt, ["k"], n_buckets=4)
            model = dict(init)
            for src_map, mode, insert in merges:
                src = spark.createDataFrame(
                    list(src_map.items()), "k long, v long"
                )
                for p in (tgt, btgt):
                    merge_into(
                        spark, p, src, ["k"],
                        when_matched=mode, insert_not_matched=insert,
                    )
                for k, v in src_map.items():
                    if k in model:
                        if mode == "update":
                            model[k] = v
                        else:
                            del model[k]
                    elif insert:
                        model[k] = v
                got = {r.k: r.v for r in spark.read.parquet(tgt).collect()}
                assert got == model, (mode, insert, src_map)
                bgot = {
                    r.k: r.v
                    for r in read_merge_table(spark, btgt).collect()
                }
                assert bgot == model, ("bucketed", mode, insert, src_map)
        finally:
            shutil.rmtree(work, ignore_errors=True)

    check()


def test_merge_into_recovers_every_crash_window(spark, tmp_path):
    """Crash-safety drill for the merge swap, every window simulated:
    (a) crash after the tmp write → orphaned .merge-* removed;
    (b) crash between the renames (only .old exists) → table restored;
    (c) crash after promote, before cleanup (.old alongside live) →
        stale backup removed. After each, merge_into works normally."""
    from flink_tpcds_spark.sources.merge import merge_into

    tgt = _merge_target(spark, tmp_path, [(1, "a"), (2, "b")])
    src = spark.createDataFrame([(2, "B")], "k long, v string")
    parent = os.path.dirname(tgt)

    # (a) orphaned tmp dir
    os.makedirs(tgt + ".merge-deadbeef")
    merge_into(spark, tgt, src, ["k"])
    assert not any(".merge-" in d for d in os.listdir(parent))
    assert {(r.k, r.v) for r in spark.read.parquet(tgt).collect()} == {
        (1, "a"), (2, "B"),
    }

    # (b) only the backup exists (crash between the renames)
    os.rename(tgt, tgt + ".old")
    merge_into(
        spark,
        tgt,
        spark.createDataFrame([(3, "c")], "k long, v string"),
        ["k"],
    )
    got = {(r.k, r.v) for r in spark.read.parquet(tgt).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}
    assert not os.path.isdir(tgt + ".old")

    # (c) stale backup alongside the live table
    shutil.copytree(tgt, tgt + ".old")
    merge_into(
        spark,
        tgt,
        spark.createDataFrame([(1,)], "k long"),
        ["k"],
        when_matched="delete",
        insert_not_matched=False,
    )
    got = {(r.k, r.v) for r in spark.read.parquet(tgt).collect()}
    assert got == {(2, "B"), (3, "c")}
    assert not os.path.isdir(tgt + ".old")


# ---------------------------------------------------------------------------
# Bucketed MERGE INTO (sources/merge.py bucketed layout — the
# partition-pruned copy-on-write that makes CDC apply O(delta))
# ---------------------------------------------------------------------------
def _bucket_state(tgt):
    """{bucket_dir: {file: mtime_ns}} snapshot of the physical layout."""
    out = {}
    for d in os.listdir(tgt):
        p = os.path.join(tgt, d)
        if d.startswith("bucket=") and os.path.isdir(p):
            out[d] = {
                f: os.stat(os.path.join(p, f)).st_mtime_ns
                for f in os.listdir(p)
            }
    return out


def test_bucketed_merge_rewrites_only_touched_buckets(spark, tmp_path):
    """The core pruning contract: after a small merge against a big
    bucketed target, every UNtouched bucket directory's files (paths
    AND mtimes) are bit-identical — they were never read into the
    write path, let alone rewritten."""
    from flink_tpcds_spark.sources.merge import (
        convert_to_bucketed,
        merge_into,
        read_merge_table,
    )

    tgt = str(tmp_path / "big")
    rows = [(k, k * 10) for k in range(200)]
    spark.createDataFrame(rows, "k long, v long").write.parquet(tgt)
    convert_to_bucketed(spark, tgt, ["k"], n_buckets=16)
    before = _bucket_state(tgt)
    assert len(before) == 16  # 200 keys cover all 16 buckets

    src = spark.createDataFrame([(7, 700), (900, 9000)], "k long, v long")
    m = merge_into(spark, tgt, src, ["k"], when_matched="update")
    assert m["n_buckets"] == 16
    assert 1 <= m["buckets_touched"] <= 2

    after = _bucket_state(tgt)
    touched = {d for d in before if before[d] != after.get(d)}
    assert len(touched) == m["buckets_touched"]
    untouched = set(before) - touched
    assert len(untouched) == 16 - len(touched)
    for d in untouched:
        assert after[d] == before[d], f"untouched bucket {d} was rewritten"

    model = dict(rows)
    model[7] = 700
    model[900] = 9000
    got = {r.k: r.v for r in read_merge_table(spark, tgt).collect()}
    assert got == model


def test_bucketed_merge_all_modes_match_model(spark, tmp_path):
    """Same merge sequence as the plain-layout property test's shape,
    bucketed: update/delete × insert on/off against a dict model."""
    from flink_tpcds_spark.sources.merge import (
        convert_to_bucketed,
        merge_into,
        read_merge_table,
    )

    tgt = str(tmp_path / "t")
    init = {1: 100, 2: 200, 3: 300, 4: 400, 5: 500}
    spark.createDataFrame(list(init.items()), "k long, v long").write.parquet(
        tgt
    )
    convert_to_bucketed(spark, tgt, ["k"], n_buckets=4)
    model = dict(init)
    seq = [
        ({2: 20, 9: 90}, "update", True),
        ({3: 0, 8: 80}, "delete", True),
        ({1: 11, 7: 77}, "update", False),
        ({9: 0, 99: 0}, "delete", False),
    ]
    for src_map, mode, insert in seq:
        src = spark.createDataFrame(list(src_map.items()), "k long, v long")
        merge_into(
            spark, tgt, src, ["k"], when_matched=mode,
            insert_not_matched=insert,
        )
        for k, v in src_map.items():
            if k in model:
                if mode == "update":
                    model[k] = v
                else:
                    del model[k]
            elif insert and mode == "update":
                model[k] = v
            elif insert and mode == "delete":
                model[k] = v
        got = {r.k: r.v for r in read_merge_table(spark, tgt).collect()}
        assert got == model, (mode, insert, src_map)


def test_bucketed_merge_empty_table_then_inserts(spark, tmp_path):
    """create_bucketed_table starts from zero state (marker only, no
    data files): the first merge populates only the touched buckets."""
    from flink_tpcds_spark.sources.merge import (
        create_bucketed_table,
        merge_into,
        read_merge_table,
    )
    from pyspark.sql import types as T

    tgt = str(tmp_path / "empty")
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
        ]
    )
    create_bucketed_table(spark, tgt, schema, ["k"], n_buckets=8)
    assert read_merge_table(spark, tgt).count() == 0
    src = spark.createDataFrame([(1, "a"), (2, "b")], schema)
    m = merge_into(spark, tgt, src, ["k"], when_matched="update")
    assert m["rows_written"] == 2
    got = {(r.k, r.v) for r in read_merge_table(spark, tgt).collect()}
    assert got == {(1, "a"), (2, "b")}
    # only the touched buckets exist on disk
    parts = [d for d in os.listdir(tgt) if d.startswith("bucket=")]
    assert len(parts) == m["buckets_touched"] <= 2


def test_bucketed_merge_delete_can_empty_a_bucket(spark, tmp_path):
    """Deleting every key of a bucket leaves an explicit empty bucket
    dir (roll-forward intent) and a readable table."""
    from flink_tpcds_spark.sources.merge import (
        convert_to_bucketed,
        merge_into,
        read_merge_table,
    )

    tgt = str(tmp_path / "d")
    rows = [(k, k) for k in range(12)]
    spark.createDataFrame(rows, "k long, v long").write.parquet(tgt)
    convert_to_bucketed(spark, tgt, ["k"], n_buckets=2)
    dels = spark.createDataFrame([(k,) for k in range(12)], "k long")
    merge_into(
        spark, tgt, dels, ["k"], when_matched="delete",
        insert_not_matched=False,
    )
    assert read_merge_table(spark, tgt).count() == 0
    # and the table is still mergeable afterwards
    src = spark.createDataFrame([(3, 33)], "k long, v long")
    merge_into(spark, tgt, src, ["k"], when_matched="update")
    got = {(r.k, r.v) for r in read_merge_table(spark, tgt).collect()}
    assert got == {(3, 33)}


def test_bucketed_merge_recovers_every_crash_window(spark, tmp_path):
    """Roll-forward drill for the per-bucket swap, every window:
    (a) crash after tmp write, before manifest → tmp swept, merge
        lost (nothing was promised);
    (b) crash after manifest, before ANY swap → next merge completes
        the interrupted one first (roll-forward), then applies;
    (c) crash mid-swap (one bucket moved to backup, tmp subdir still
        present) → completed;
    (d) crash after manifest removal, before backup cleanup → stale
        .merge-old-* swept."""
    import json as _json

    from flink_tpcds_spark.sources.merge import (
        _bucket_expr,
        convert_to_bucketed,
        merge_into,
        read_merge_table,
    )

    tgt = str(tmp_path / "c")
    rows = [(k, k) for k in range(40)]
    spark.createDataFrame(rows, "k long, v long").write.parquet(tgt)
    convert_to_bucketed(spark, tgt, ["k"], n_buckets=4)
    model = dict(rows)

    # (a) orphan tmp, no manifest
    os.makedirs(tgt + ".merge-deadbeef/bucket=0")
    merge_into(
        spark,
        tgt,
        spark.createDataFrame([(1, 111)], "k long, v long"),
        ["k"],
    )
    model[1] = 111
    assert not os.path.isdir(tgt + ".merge-deadbeef")
    got = {r.k: r.v for r in read_merge_table(spark, tgt).collect()}
    assert got == model

    # (b)+(c): build a REAL interrupted merge by hand — a tmp dir with
    # one bucket's replacement rows, the manifest published, bucket
    # half-swapped (live moved to backup, tmp not yet promoted)
    b_of = {
        r.k: r.b
        for r in spark.createDataFrame([(k,) for k in model], "k long")
        .withColumn("b", _bucket_expr(["k"], 4))
        .collect()
    }
    victim_key = next(iter(model))
    vb = b_of[victim_key]
    tmp = tgt + ".merge-cafe0001"
    repl = [(k, v + 1000) for k, v in model.items() if b_of[k] == vb]
    (
        spark.createDataFrame(repl, "k long, v long")
        .coalesce(1)
        .write.parquet(os.path.join(tmp, f"bucket={vb}"))
    )
    with open(os.path.join(tgt, "_merge_inflight.json"), "w") as f:
        _json.dump({"id": "cafe0001", "buckets": [vb],
                    "tmp": os.path.basename(tmp)}, f)
    # half-swap: live → backup (crash window c)
    os.makedirs(os.path.join(tgt, ".merge-old-cafe0001"))
    os.rename(
        os.path.join(tgt, f"bucket={vb}"),
        os.path.join(tgt, f".merge-old-cafe0001/bucket={vb}"),
    )
    # next merge rolls the interrupted one forward, then applies
    merge_into(
        spark,
        tgt,
        spark.createDataFrame([(victim_key,)], "k long"),
        ["k"],
        when_matched="delete",
        insert_not_matched=False,
    )
    for k, v in repl:
        model[k] = v
    del model[victim_key]
    assert not os.path.isfile(os.path.join(tgt, "_merge_inflight.json"))
    assert not os.path.isdir(tmp)
    assert not any(d.startswith(".merge-old-") for d in os.listdir(tgt))
    got = {r.k: r.v for r in read_merge_table(spark, tgt).collect()}
    assert got == model

    # (d) stale backup dir, manifest already gone
    os.makedirs(os.path.join(tgt, ".merge-old-feedf00d/bucket=0"))
    merge_into(
        spark,
        tgt,
        spark.createDataFrame([(5000, 1)], "k long, v long"),
        ["k"],
    )
    model[5000] = 1
    assert not any(d.startswith(".merge-old-") for d in os.listdir(tgt))
    got = {r.k: r.v for r in read_merge_table(spark, tgt).collect()}
    assert got == model


def test_bucketed_target_scan_is_partition_pruned(spark, tmp_path):
    """Plan gate: the touched-buckets filter lands in the scan's
    PartitionFilters (no data file of an untouched bucket is opened)."""
    from flink_tpcds_spark.sources.merge import convert_to_bucketed

    tgt = str(tmp_path / "p")
    spark.createDataFrame(
        [(k, k) for k in range(64)], "k long, v long"
    ).write.parquet(tgt)
    convert_to_bucketed(spark, tgt, ["k"], n_buckets=8)
    pruned = spark.read.parquet(tgt).filter(F.col("bucket").isin([1, 3]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the bucket predicate must be a PARTITION filter (pruned at file
    # listing), not a post-scan data Filter over all 8 buckets
    assert "PartitionFilters" in plan and "bucket" in plan
    scan_line = next(
        ln for ln in plan.splitlines() if "PartitionFilters" in ln
    )
    assert "bucket" in scan_line.split("PartitionFilters", 1)[1]
    assert "DataFilters: []" in plan  # nothing evaluated row-wise
    got = pruned.select("bucket").distinct().collect()
    assert {r.bucket for r in got} <= {1, 3}


def test_merge_into_rejects_type_drift(spark, tmp_path):
    """ADVICE r8: name-set equality is not schema equality — an int
    source column against a long target must fail up front, not get
    implicitly cast by unionByName."""
    from flink_tpcds_spark.sources.merge import merge_into

    tgt = str(tmp_path / "td")
    spark.createDataFrame([(1, 10)], "k long, v long").write.parquet(tgt)
    src = spark.createDataFrame([(1, 20)], "k long, v int")
    with pytest.raises(ValueError, match="differ in type"):
        merge_into(spark, tgt, src, ["k"], when_matched="update")
    # delete+insert also needs full typed rows — a keys-only source
    # must fail with a clear error, not a late AnalysisException
    dels = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="schemas differ"):
        merge_into(spark, tgt, dels, ["k"], when_matched="delete",
                   insert_not_matched=True)
    # target untouched by the failed merges
    assert spark.read.parquet(tgt).count() == 1


def test_cdc_apply_bucketed_state(spark, tmp_path):
    """CdcApply(n_buckets=…): the streaming CDC path on the bucketed
    layout — same fold semantics, state marker present, per-batch
    writes touch only the delta's buckets."""
    from flink_tpcds_spark.sources.merge import read_bucket_marker
    from flink_tpcds_spark.streaming.cdc import CdcApply

    path = str(tmp_path / "cdc_state")
    cdc = CdcApply(path, ["k"], order_cols=["seq"], n_buckets=8)
    b1 = spark.createDataFrame(
        [(1, "a", "u", 1), (2, "b", "u", 2), (1, "a2", "u", 3)],
        "k long, v string, op string, seq long",
    )
    cdc.foreach_batch(b1, 0)
    assert read_bucket_marker(path) is not None
    got = {(r.k, r.v) for r in cdc.table(spark).collect()}
    assert got == {(1, "a2"), (2, "b")}

    before = _bucket_state(path)
    b2 = spark.createDataFrame(
        [(2, "x", "u", 4), (2, None, "d", 5), (3, "c", "u", 6)],
        "k long, v string, op string, seq long",
    )
    cdc.foreach_batch(b2, 1)
    got = {(r.k, r.v) for r in cdc.table(spark).collect()}
    assert got == {(1, "a2"), (3, "c")}
    after = _bucket_state(path)
    # key 1's bucket was not in batch 2's delta: physically untouched
    untouched = [d for d in before if d in after and before[d] == after[d]]
    assert untouched, "expected at least one untouched bucket"


def test_suggest_bucket_count_power_of_two_sizing(spark, tmp_path):
    """N tracks on-disk bytes / target, as a power of two, clamped."""
    from flink_tpcds_spark.sources.merge import (
        convert_to_bucketed,
        read_bucket_marker,
        suggest_bucket_count,
    )

    tgt = str(tmp_path / "adv")
    spark.createDataFrame(
        [(k, "x" * 100) for k in range(5000)], "k long, v string"
    ).coalesce(1).write.parquet(tgt)
    # tiny table: clamps to the floor
    assert suggest_bucket_count(tgt) == 16
    # the cap binds when the size/target ratio exceeds it
    assert suggest_bucket_count(tgt, target_bucket_bytes=1, hi=64) == 64
    n = suggest_bucket_count(tgt, target_bucket_bytes=4096, lo=1, hi=1 << 20)
    sz = sum(
        os.path.getsize(os.path.join(tgt, f))
        for f in os.listdir(tgt)
        if not f.startswith(("_", "."))
    )
    import math as m

    assert n == 1 << max(0, round(m.log2(max(sz / 4096, 1.0))))
    # convert with n_buckets=None routes through the advisor
    convert_to_bucketed(spark, tgt, ["k"], n_buckets=None)
    assert read_bucket_marker(tgt)["n_buckets"] == 16


def test_apply_changeset_single_pass_both_layouts(spark, tmp_path):
    """apply_changeset: upserts (replace + insert) and tombstones in
    ONE rewrite, on both layouts; bucketed mode touches only the
    union of the changeset's buckets."""
    from flink_tpcds_spark.sources.merge import (
        apply_changeset,
        convert_to_bucketed,
        read_merge_table,
    )

    init = [(k, k * 10) for k in range(40)]
    ups = spark.createDataFrame([(1, 111), (100, 1000)], "k long, v long")
    dels = spark.createDataFrame([(2,), (3,)], "k long")
    model = dict(init)
    model[1] = 111
    model[100] = 1000
    del model[2], model[3]

    plain = str(tmp_path / "p")
    spark.createDataFrame(init, "k long, v long").write.parquet(plain)
    m = apply_changeset(spark, plain, ups, dels, ["k"])
    assert m["mode"] == "changeset" and m["rows_after"] == len(model)
    got = {r.k: r.v for r in spark.read.parquet(plain).collect()}
    assert got == model

    bkt = str(tmp_path / "b")
    spark.createDataFrame(init, "k long, v long").write.parquet(bkt)
    convert_to_bucketed(spark, bkt, ["k"], n_buckets=8)
    before = _bucket_state(bkt)
    m = apply_changeset(spark, bkt, ups, dels, ["k"])
    assert 1 <= m["buckets_touched"] <= 4  # ≤ |changeset keys|
    after = _bucket_state(bkt)
    untouched = [d for d in before if before[d] == after.get(d)]
    assert len(untouched) == 8 - m["buckets_touched"]
    got = {r.k: r.v for r in read_merge_table(spark, bkt).collect()}
    assert got == model

    # type drift still fails up front
    bad = spark.createDataFrame([(1, 5)], "k long, v int")
    with pytest.raises(ValueError, match="differ in type"):
        apply_changeset(spark, bkt, bad, dels, ["k"])


def test_bucketed_table_adopted_across_sessions(spark, sf_dir):
    """A later session (in-memory catalog empty) must ADOPT an intact
    on-disk bucketed table via the spec marker instead of rewriting
    it: same files (mtimes untouched), still shuffle-free on the
    bucket key, identical rows. A directory without the marker (the
    crashed-write shape) is rewritten."""
    import glob
    import os

    from flink_tpcds_spark.sources.bucketing import (
        _NAMESPACE,
        _SPEC_MARKER,
        install_bucketed_posture,
        uninstall_bucketed_posture,
    )

    try:
        w1 = install_bucketed_posture(spark, sf_dir)
        from flink_tpcds_spark.schemas import load_table

        rows1 = {
            tuple(r)
            for r in load_table(spark, sf_dir, "orders")
            .groupBy("o_orderstatus")
            .count()
            .collect()
        }
        wh = spark.conf.get("spark.sql.warehouse.dir")
        import hashlib
        from urllib.parse import urlparse

        whp = urlparse(wh).path
        keys = {"orders": "o_orderkey", "lineitem": "l_orderkey"}
        locs = {}
        for t, k in keys.items():
            fp = hashlib.md5(f"{sf_dir}|32|{k}".encode()).hexdigest()[:8]
            locs[t] = [
                os.path.join(whp, _NAMESPACE, f"bkt_{t}_{fp}")
            ]
        files_before = {
            t: {
                p: os.path.getmtime(p)
                for d in ds
                for p in glob.glob(os.path.join(d, "part-*"))
            }
            for t, ds in locs.items()
        }
        # simulate a new session: external DROP keeps the files
        for t in ("orders", "lineitem"):
            for d in locs[t]:
                tbl = os.path.basename(d)
                spark.sql(f"DROP TABLE IF EXISTS {tbl}")
                assert os.path.isfile(os.path.join(d, _SPEC_MARKER))
        uninstall_bucketed_posture()

        w2 = install_bucketed_posture(spark, sf_dir)
        assert all(v == 0.0 for v in w2.values()), f"not adopted: {w2}"
        files_after = {
            t: {
                p: os.path.getmtime(p)
                for d in ds
                for p in glob.glob(os.path.join(d, "part-*"))
            }
            for t, ds in locs.items()
        }
        assert files_before == files_after, "adoption must not rewrite"
        rows2 = {
            tuple(r)
            for r in load_table(spark, sf_dir, "orders")
            .groupBy("o_orderstatus")
            .count()
            .collect()
        }
        assert rows1 == rows2
        # the adopted table still joins shuffle-free on the bucket key
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            o = load_table(spark, sf_dir, "orders")
            li = load_table(spark, sf_dir, "lineitem")
            j = o.join(li, o["o_orderkey"] == li["l_orderkey"]).groupBy(
                "o_orderstatus"
            ).count()
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange hashpartitioning(o_orderkey" not in plan
            assert "Exchange hashpartitioning(l_orderkey" not in plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

        # crashed-write shape: marker missing -> rewrite, not adopt
        for d in locs["orders"]:
            tbl = os.path.basename(d)
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            os.remove(os.path.join(d, _SPEC_MARKER))
        uninstall_bucketed_posture()
        w3 = install_bucketed_posture(spark, sf_dir)
        assert w3["orders"] > 0.0, "markerless dir must be rewritten"
    finally:
        uninstall_bucketed_posture()


# ---------------------------------------------------------------------------
# Z-order clustering (sources/zorder.py) — Morton math + files_touched
# ---------------------------------------------------------------------------
def _py_morton(coords: list[int], bits: int) -> int:
    out = 0
    for d, v in enumerate(coords):
        for i in range(bits):
            out |= ((v >> i) & 1) << (i * len(coords) + d)
    return out


def test_morton_interleave_matches_python_reference(spark):
    """The shift/or expression tree computes the textbook Morton
    interleave for every 2-D point of a 16x16 grid (exhaustive) and a
    3-D sample — against a bit-twiddling Python reference."""
    from pyspark.sql import functions as F

    from flink_tpcds_spark.sources.zorder import _BITS, _interleave

    pts = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r.x, r.y): r.m
        for r in df.select(
            "x", "y", _interleave([F.col("x"), F.col("y")]).alias("m")
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _py_morton([x, y], _BITS), (x, y)

    pts3 = [(1, 2, 3), (7, 0, 5), (4, 4, 4), (255, 128, 1)]
    df3 = spark.createDataFrame(pts3, "x long, y long, z long")
    got3 = df3.select(
        _interleave([F.col("x"), F.col("y"), F.col("z")]).alias("m")
    ).collect()
    for row, point in zip(got3, pts3):
        assert row.m == _py_morton(list(point), _BITS), point


def test_files_touched_prunes_both_dimensions(spark, tmp_path):
    """files_touched (the footer-stats pruning counter the registered
    entry asserts with): on a uniform 2-D grid, a 1/8-span box on
    EITHER dimension must prune at least half the z-ordered files —
    the defining property a single-column sort cannot deliver for its
    non-leading column."""
    from flink_tpcds_spark.sources.zorder import (
        files_touched,
        write_zordered,
    )

    rows = [(x, y, x * 1000 + y) for x in range(200) for y in range(200)]
    df = spark.createDataFrame(rows, "a long, b long, payload long")
    dst = str(tmp_path / "grid_z")
    write_zordered(df, dst, ["a", "b"], n_files=16)
    for col in ("a", "b"):
        t, n = files_touched(dst, col, 0, 24)
        assert n == 16
        assert t * 2 <= n, (col, t, n)
    back = spark.read.parquet(dst)
    assert back.count() == len(rows)
    assert back.agg({"payload": "sum"}).collect()[0][0] == sum(
        r[2] for r in rows
    )


def test_zorder_degenerate_constant_column(spark, tmp_path):
    """A constant z-column must not break quantile bucketing (all
    boundaries equal -> every row in bucket 0)."""
    from flink_tpcds_spark.sources.zorder import write_zordered

    df = spark.createDataFrame([(1, 7), (2, 7), (3, 7)], "a long, c long")
    dst = str(tmp_path / "const_z")
    write_zordered(df, dst, ["a", "c"], n_files=2)
    assert spark.read.parquet(dst).count() == 3



def test_zorder_arrow_key_equals_jvm_reference(spark):
    """The Arrow searchsorted z-key must equal the pure-JVM
    filter-count + shift/or reference byte-for-byte — including NULL
    values (bucket 0 on both paths), NaN (top bucket on both paths —
    Spark SQL orders NaN above every double, so the JVM filter-count
    gives it 255; ADVICE r10), ±inf, and values exactly on a
    boundary."""
    import random

    from flink_tpcds_spark.sources.zorder import zorder_key, zorder_key_jvm

    random.seed(41)
    rows = [
        (i, float(random.randint(0, 300)), random.uniform(-10, 10))
        for i in range(3000)
    ]
    rows.append((3000, None, 0.0))
    rows.append((3001, 5.0, None))
    rows.append((3002, float("nan"), 1.0))
    rows.append((3003, 5.0, float("nan")))
    rows.append((3004, float("inf"), float("-inf")))
    df = spark.createDataFrame(rows, "id long, a double, b double")
    fast = {
        r["id"]: r["__zkey"]
        for r in zorder_key(df, ["a", "b"]).select("id", "__zkey").collect()
    }
    ref = {
        r["id"]: r["__zkey"]
        for r in zorder_key_jvm(df, ["a", "b"])
        .select("id", "__zkey")
        .collect()
    }
    assert fast == ref
