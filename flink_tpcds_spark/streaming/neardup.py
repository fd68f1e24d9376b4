"""Continuous (ingest-time) near-duplicate detection.

The batch operator (``datapipe/dedup.py:minhash_near_dup_pairs``)
answers "which pairs in this corpus are near-dups"; a training-data
INGEST pipeline needs the streaming form: "is this arriving document
a near-dup of anything seen so far?" — the check web-crawl ingestion
runs on every batch before admitting documents.

:class:`StreamingNearDupIndex` is the 100 TB shape of that check —
all state lives in executor-written parquet, the driver never holds a
row (same posture as ``streaming/sinks.py:ParquetUpsertSink``):

- ``<path>/bands``    — the LSH band index ``(band, bucket, id)`` of
  every document admitted so far (16 rows/doc);
- ``<path>/shingles`` — each admitted document's distinct shingle
  set, for exact-Jaccard verification of candidates;
- ``<path>/pairs``    — the detections ``(id_a, id_b, jaccard,
  batch_id)``, id_a < id_b, appended per micro-batch.

Per micro-batch topology (all distributed joins, never all-pairs):
new docs → signatures → band keys; candidates = new band keys
equi-joined against the union of the historical index and the batch
itself (so intra-batch duplicates are caught too); exact Jaccard
verification touches only LSH-colliding pairs; then the batch's
bands/shingles append to the index. Identical constants to the batch
operator (64 hashes, 16×4 banding), so the stream replay of a corpus
detects exactly the batch operator's pair set — the equivalence
tests/test_streaming.py asserts.

At cluster scale the bands directory would be written partitioned by
``band`` (16 partitions) so the candidate join prunes to the probed
band files; the join topology is unchanged. Index growth is O(corpus)
— the same order as the admitted corpus itself — and compaction is
plain parquet rewrite.

Reference analog: this is a streaming lookup-join against a growing
index table (LookupableTableSource, flink-table-common
LookupableTableSource.java) fused with the dedup pipeline; the
reference has no near-dup operator (SURVEY §2 gap the datapipe layer
fills).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datapipe.dedup import (
    _band_keys,
    hashed_shingles,
    jaccard,
    minhash_signature_udf,
    shingles_of_tokens,
)
from ..datapipe.text import tokens


class StreamingNearDupIndex:
    """Use as ``stream.writeStream.foreachBatch(idx.foreach_batch)``
    over a document stream with ``(doc_id, text)`` columns, or drive
    the batches directly (the contract is per-batch)."""

    def __init__(
        self,
        path: str,
        threshold: float = 0.8,
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        self.path = path.rstrip("/")
        self.threshold = threshold
        self.id_col = id_col
        self.text_col = text_col

    def _read(self, spark: SparkSession, sub: str) -> DataFrame | None:
        try:
            return spark.read.parquet(f"{self.path}/{sub}")
        except Exception:  # noqa: BLE001 — first batch: no index yet
            return None

    def foreach_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        sh_new = (
            batch_df.select(
                F.col(self.id_col).alias("id"),
                tokens(F.col(self.text_col)).alias("toks"),
            )
            .filter(F.size("toks") >= 3)
            .select("id", shingles_of_tokens(F.col("toks")).alias("sh"))
            .localCheckpoint()  # cut lineage: read 3× below
        )
        sig_udf = minhash_signature_udf()
        bands_new = (
            sh_new.withColumn("hashed", hashed_shingles(F.col("sh")))
            .withColumn("sig", sig_udf(F.col("hashed")))
            .select("id", F.explode(_band_keys(F.col("sig"))).alias("bk"))
            .select(
                "id",
                F.col("bk.band").alias("band"),
                F.col("bk.bucket").alias("bucket"),
            )
            .localCheckpoint()
        )
        hist_bands = self._read(spark, "bands")
        hist_sh = self._read(spark, "shingles")
        all_bands = (
            bands_new if hist_bands is None else bands_new.unionByName(hist_bands)
        )
        all_sh = sh_new if hist_sh is None else sh_new.unionByName(hist_sh)
        # candidates must involve ≥1 NEW doc: probe side = the batch.
        candidates = (
            bands_new.alias("x")
            .join(all_bands.alias("y"), ["band", "bucket"])
            .select(
                F.least("x.id", "y.id").alias("id_a"),
                F.greatest("x.id", "y.id").alias("id_b"),
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .distinct()
        )
        verified = (
            candidates.join(
                all_sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")),
                "id_a",
            )
            .join(
                all_sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")),
                "id_b",
            )
            .withColumn("jaccard", jaccard(F.col("sh_a"), F.col("sh_b")))
            .filter(F.col("jaccard") >= self.threshold)
            .select("id_a", "id_b", "jaccard")
            .withColumn("batch_id", F.lit(int(batch_id)))
        )
        verified.write.mode("append").parquet(f"{self.path}/pairs")
        # admit the batch into the index AFTER detection so a doc
        # never pairs with itself through the index.
        bands_new.write.mode("append").parquet(f"{self.path}/bands")
        sh_new.write.mode("append").parquet(f"{self.path}/shingles")

    def pairs(self, spark: SparkSession) -> DataFrame:
        """All detections so far (id_a < id_b, exact jaccard)."""
        got = self._read(spark, "pairs")
        if got is not None:
            return got
        return spark.createDataFrame(
            [], "id_a long, id_b long, jaccard double, batch_id long"
        )
