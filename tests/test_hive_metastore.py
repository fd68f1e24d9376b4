"""Hive metastore persistence (sources/hive.py) — driven in a
subprocess because ``spark.sql.catalogImplementation`` is a static
conf the suite's shared session has already fixed to in-memory.

The subprocess runs TWO SparkContexts back to back against one Derby
metastore directory:

- context 1 creates a database, a partitioned parquet catalog table
  (one partition per o_orderstatus), INSERTs a late-arriving
  partition, and runs ANALYZE TABLE ... FOR ALL COLUMNS;
- context 2 (fresh catalog client, same Derby files) must re-resolve
  the database, the table, every partition, the ANALYZE statistics,
  AND prune to a single partition on a filtered scan — proving the
  catalog state lives in the metastore, not in the session.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import json, os, sys
sys.path.insert(0, os.environ["REPO"])
from flink_tpcds_spark.sources.hive import (
    hive_session, partition_names, table_stats,
)

work = os.environ["WORK"]
sf_dir = os.environ["SF_DIR"]
out = {}

# ---- context 1: create + analyze ------------------------------------
spark = hive_session(work, "hive-phase1")
assert spark.conf.get("spark.sql.catalogImplementation") == "hive"
orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
spark.sql("CREATE DATABASE tpch")
(orders.filter("o_orderstatus <> 'P'")
    .write.partitionBy("o_orderstatus")
    .saveAsTable("tpch.orders_part"))
# late partition through SQL INSERT — must register in the metastore
data_cols = ", ".join(c for c in orders.columns if c != "o_orderstatus")
spark.sql(
    "INSERT INTO tpch.orders_part PARTITION (o_orderstatus='P') "
    "SELECT {} FROM parquet.`{}` WHERE o_orderstatus = 'P'".format(
        data_cols, os.path.join(sf_dir, "orders.parquet"))
)
spark.sql("ANALYZE TABLE tpch.orders_part COMPUTE STATISTICS FOR ALL COLUMNS")
out["n_total"] = orders.count()
out["phase1_partitions"] = sorted(partition_names(spark, "tpch.orders_part"))
out["n_p"] = orders.filter("o_orderstatus = 'P'").count()
spark.stop()

# ---- context 2: fresh catalog client over the same Derby files ------
spark = hive_session(work, "hive-phase2")
out["databases"] = sorted(
    d.namespace for d in spark.sql("SHOW DATABASES").collect())
out["phase2_partitions"] = sorted(partition_names(spark, "tpch.orders_part"))
out["stats"] = table_stats(spark, "tpch.orders_part")
t = spark.table("tpch.orders_part")
out["n_reread"] = t.count()
pruned = t.filter("o_orderstatus = 'P'")
plan = pruned._jdf.queryExecution().executedPlan().toString()
out["n_pruned"] = pruned.count()
out["plan_has_partition_filter"] = "o_orderstatus" in plan.split(
    "PartitionFilters:")[1].split("]")[0] if "PartitionFilters:" in plan else False
spark.stop()
print("RESULT " + json.dumps(out))
"""


def test_metastore_survives_context_teardown(sf_dir):
    work = tempfile.mkdtemp(prefix="hive_ms_")
    env = dict(
        os.environ, REPO=_REPO, WORK=work, SF_DIR=sf_dir
    )
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = next(
        ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")
    )
    out = json.loads(line[len("RESULT ") :])
    assert out["databases"] and any(
        "tpch" in str(d) for d in out["databases"]
    )
    assert out["phase2_partitions"] == out["phase1_partitions"]
    assert len(out["phase2_partitions"]) >= 2
    assert out["n_reread"] == out["n_total"]
    assert out["n_pruned"] == out["n_p"]
    # ANALYZE stats persisted in the metastore, visible to context 2
    assert out["stats"]["row_count"] == out["n_total"]
    assert out["plan_has_partition_filter"] is True
