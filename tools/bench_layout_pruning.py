"""Z-order / Hilbert / linear layout pruning at 1M+ rows, measured from
EXECUTED scan metrics (VERDICT r6 #6) — not `input_file_name` counts.

The pruning claim this measures is the 100 TB layout story: a table
clustered along a space-filling curve of its filter dimensions confines
a multi-dimensional box query to a few files/row-groups, so the scan
reads a small fraction of the bytes a linear single-key sort must read.

Three measurements per layout, per box query, all from the executed
plan / JVM runtime (local mode = one JVM, so global FS statistics see
every task's reads):

- scan_rows:  the FileSourceScan node's `numOutputRows` SQL metric —
  rows DELIVERED by the scan after parquet row-group skipping and
  pushed filters; the direct measure of decode work avoided.
- bytes_read: delta of Hadoop `file`-scheme bytesRead across the query
  — actual I/O, including footers of skipped files.
- files_hit:  distinct input_file_name (the old proxy, kept for
  contrast) and the scan's static `numFiles` (listing size — identical
  across layouts for unpartitioned data, printed to show WHY min/max
  stats, not file listing, are the pruning mechanism here).

Usage: python tools/bench_layout_pruning.py [n_rows] [n_files]
Prints one JSON line per (layout, query) for NOTES.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from hawk_pack_spark.operators.layout import (  # noqa: E402
    hilbert_layout,
    zorder_layout,
)
from hawk_pack_spark.session import get_spark  # noqa: E402


def _fs_bytes_read(spark) -> int:
    """Global `file`-scheme bytesRead (all threads of the local JVM)."""
    jvm = spark._jvm
    stats = jvm.org.apache.hadoop.fs.FileSystem.getGlobalStorageStatistics()
    s = stats.get("file")
    return int(s.getLong("bytesRead")) if s is not None else 0


def _scan_metrics(df) -> dict:
    """Walk the EXECUTED plan for the FileSourceScan node's metrics."""
    plan = df._jdf.queryExecution().executedPlan()
    if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        plan = plan.executedPlan()
    out = {}
    stack = [plan]
    while stack:
        n = stack.pop()
        name = n.getClass().getSimpleName()
        if "FileSourceScan" in name or "BatchScan" in name:
            it = n.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                out[kv._1()] = int(kv._2().value())
            break
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("layout-pruning")
    spark.sparkContext.setLogLevel("ERROR")

    # two filter dims + a ~160 B payload so bytes-read deltas are real
    df = (
        spark.range(n)
        .select(
            (F.xxhash64("id") % 100_000).alias("x"),
            (F.xxhash64("id", F.lit(1)) % 100_000).alias("y"),
            F.sha2(F.col("id").cast("string"), 512).alias("payload"),
        )
        .where((F.col("x") >= 0) & (F.col("y") >= 0))
    )

    tmp = tempfile.mkdtemp(prefix="layout_prune_")
    layouts = {
        "linear_x": lambda d: d.repartitionByRange(n_files, "x")
        .sortWithinPartitions("x"),
        "zorder_xy": lambda d: zorder_layout(d, ["x", "y"], n_files=n_files),
        "hilbert_xy": lambda d: hilbert_layout(d, ["x", "y"], n_files=n_files),
    }
    paths = {}
    for name, fn in layouts.items():
        p = f"{tmp}/{name}"
        fn(df).write.parquet(p)
        paths[name] = p

    # ~1% box and a ~10% band, both 2-D
    boxes = {
        "box_1pct": (
            (F.col("x") >= 40_000) & (F.col("x") < 50_000)
            & (F.col("y") >= 40_000) & (F.col("y") < 50_000)
        ),
        "box_10pct": (
            (F.col("x") >= 20_000) & (F.col("x") < 60_000)
            & (F.col("y") >= 20_000) & (F.col("y") < 50_000)
        ),
    }
    try:
        for lname, path in paths.items():
            for bname, box in boxes.items():
                # collect() executes THIS DataFrame's plan, so the SQL
                # metrics read below belong to the measured run (a
                # .count() would execute a separate pruned plan and
                # leave q's own metrics at zero)
                q = spark.read.parquet(path).where(box)
                b0 = _fs_bytes_read(spark)
                t0 = time.perf_counter()
                n_rows = len(q.collect())
                dt = round(time.perf_counter() - t0, 3)
                bytes_read = _fs_bytes_read(spark) - b0
                m = _scan_metrics(q)
                files_hit = (
                    spark.read.parquet(path)
                    .where(box)
                    .select(F.input_file_name().alias("f"))
                    .distinct()
                    .count()
                )
                print(json.dumps({
                    "layout": lname, "query": bname, "rows": n_rows,
                    "scan_rows": m.get("numOutputRows"),
                    "listed_files": m.get("numFiles"),
                    "files_hit": files_hit,
                    "bytes_read_mb": round(bytes_read / 1e6, 1),
                    "sec": dt,
                }), flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
