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
