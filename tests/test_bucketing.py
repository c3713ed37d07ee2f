"""Bucketed-table co-located join: the shuffle-elimination story for big
repeated joins (SURVEY §4). Writing both sides bucketed by the join key
lets SortMergeJoin read pre-partitioned buckets — the physical plan must
contain NO Exchange on either side of the join."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    spark.sql("DROP TABLE IF EXISTS bt_docs")
    spark.sql("DROP TABLE IF EXISTS bt_emb")
    (docs.write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
         .saveAsTable("bt_docs"))
    (emb.selectExpr("vec_id as doc_id", "label")
        .write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
        .saveAsTable("bt_emb"))
    yield "bt_docs", "bt_emb"
    spark.sql("DROP TABLE IF EXISTS bt_docs")
    spark.sql("DROP TABLE IF EXISTS bt_emb")


class TestBucketedJoin:
    def test_join_runs_without_any_exchange(self, spark, bucketed_tables):
        a, b = bucketed_tables
        # disable broadcast so the join would otherwise shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            df = spark.sql(
                f"SELECT d.doc_id, d.n_chars, e.label "
                f"FROM {a} d JOIN {b} e USING (doc_id)"
            )
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan  # buckets co-locate both sides
            assert df.count() == 500  # sf0.001: all ids join
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    def test_unbucketed_baseline_does_shuffle(self, spark):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            emb = spark.read.parquet(
                "/root/testdata/sf0.001/embeddings.parquet"
            ).selectExpr("vec_id as doc_id", "label")
            plan = (
                docs.join(emb, "doc_id")
                ._jdf.queryExecution().executedPlan().toString()
            )
            assert "Exchange" in plan  # same join without buckets shuffles
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


class TestPartitionPruning:
    def test_status_partitioned_sink_prunes_scan(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from pdf_parser_spark.corpus import ensure_corpus
        from pdf_parser_spark.pipeline import (
            extract_pipeline, load_pages, write_output,
        )

        out = str(tmp_path / "parted")
        res = extract_pipeline(load_pages(spark, ensure_corpus(0.001)))
        write_output(res, out, mode="overwrite", partition_by=["status"])
        df = spark.read.parquet(out).where(F.col("status") == "ok")
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the filter must land in PartitionFilters (directory pruning),
        # not as a row-level PushedFilters predicate
        assert "PartitionFilters" in plan and "(status" in plan.split(
            "PartitionFilters"
        )[1].split("]")[0]
        assert df.count() == 84
