"""Format round-trips and partition pruning."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from hawk_pack_spark.sources import load_table
from hawk_pack_spark.sources.formats import read_table, write_table

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip(spark, sf_dir, tmp_path, fmt):
    docs = load_table(spark, "documents", sf_dir)
    path = str(tmp_path / fmt)
    write_table(docs, path, fmt)
    back = read_table(spark, path, fmt, schema=DOC_SCHEMA)
    assert back.count() == docs.count()
    a = {r.doc_id: r.n_chars for r in back.select("doc_id", "n_chars").collect()}
    b = {r.doc_id: r.n_chars for r in docs.select("doc_id", "n_chars").collect()}
    assert a == b


def test_csv_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="requires an explicit schema"):
        read_table(spark, str(tmp_path), "csv")


def test_partition_pruning(spark, sf_dir, tmp_path):
    """A filter on the partition column must prune directories at plan
    time (PartitionFilters), not scan-and-filter."""
    docs = load_table(spark, "documents", sf_dir)
    path = str(tmp_path / "by_lang")
    write_table(docs, path, "parquet", partition_by=["lang"])

    q = read_table(spark, path, "parquet").where(F.col("lang") == "de")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:120]
    n_de = docs.where(F.col("lang") == "de").count()
    assert q.count() == n_de


def test_bucketed_join_and_agg_no_shuffle(spark, sf_dir):
    """The 100 TB shuffle eliminator: two tables bucketed+sorted on the
    join key must sort-merge-join with NO Exchange on either side, and a
    groupBy on the bucket key must aggregate with NO Exchange — the
    co-location is paid once at write time."""
    from hawk_pack_spark.sources.formats import write_bucketed

    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    write_bucketed(li, "b_lineitem", ["l_orderkey"], 4, sort_cols=["l_orderkey"])
    write_bucketed(orders, "b_orders", ["o_orderkey"], 4, sort_cols=["o_orderkey"])
    try:
        bl, bo = spark.table("b_lineitem"), spark.table("b_orders")
        old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bl.join(bo, F.col("l_orderkey") == F.col("o_orderkey"))
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                joined.explain("formatted")
            plan = buf.getvalue()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan
            assert joined.count() == li.join(
                orders, F.col("l_orderkey") == F.col("o_orderkey")
            ).count()

            agg = bl.groupBy("l_orderkey").count()
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                agg.explain("formatted")
            assert "Exchange" not in buf.getvalue()
            assert agg.count() == li.select("l_orderkey").distinct().count()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """DPP: when the partition filter arrives via a dimension join (not
    a literal), the fact scan must still prune partitions at runtime —
    the plan carries a dynamicpruning subquery on the partition column."""
    docs = load_table(spark, "documents", sf_dir)
    path = str(tmp_path / "by_lang_dpp")
    write_table(docs, path, "parquet", partition_by=["lang"])
    fact = read_table(spark, path, "parquet")
    dim = spark.createDataFrame(
        [("de", 1), ("fr", 1), ("en", 0), ("es", 0), ("it", 0)],
        "lang string, keep int",
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly", "false")
    try:
        joined = fact.join(dim.where(F.col("keep") == 1), "lang")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:2000]
        expected = docs.where(F.col("lang").isin("de", "fr")).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
