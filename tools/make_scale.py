"""Scale the driver fixtures up K× for scale sweeps (VERDICT r4 #7).

Replicates each sf0.1 table K times with per-replica KEY SHIFTS that
preserve referential integrity (orders.o_custkey follows customer's
shift, lineitem follows orders/part/supplier), so every catalog query
runs unchanged on a corpus one order of magnitude larger. Dimension
tables (region, nation) stay fixed — that is what scale factors do in
TPC-H too. Values are NOT perturbed: the sweep measures how the PLANS
behave at 10× the rows (shuffle sizes, partition counts, spill), for
which identical value distributions are exactly right.

Writes under /root/repo/_scale/sf<K*0.1> (gitignored scratch — the
fixtures themselves stay read-only). Usage:

    python tools/make_scale.py [K] [src_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from hawk_pack_spark.session import get_spark  # noqa: E402

# table -> (own-key column, {fk column -> parent table})
KEYED = {
    "customer": ("c_custkey", {}),
    "supplier": ("s_suppkey", {}),
    "part": ("p_partkey", {}),
    "orders": ("o_orderkey", {"o_custkey": "customer"}),
    "lineitem": (
        "l_orderkey",  # not unique, but shifts with orders
        {"l_partkey": "part", "l_suppkey": "supplier"},
    ),
    "events": ("event_id", {}),
    "documents": ("doc_id", {}),
    "embeddings": ("vec_id", {}),
}
FIXED = ["region", "nation"]


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = (
        sys.argv[3]
        if len(sys.argv) > 3
        else f"/root/repo/_scale/sf{round(0.1 * k, 2):g}"
    )
    spark = get_spark("make-scale")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    # per-parent key offsets (max key + 1 per replica step)
    offsets: dict[str, int] = {}
    for t, (key, _) in KEYED.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        offsets[t] = int(df.agg(F.max(key)).collect()[0][0]) + 1

    for t in FIXED:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")

    replicas = spark.range(k).select(F.col("id").cast("int").alias("_rep"))
    for t, (key, fks) in KEYED.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        scaled = df.crossJoin(F.broadcast(replicas))
        shift = {key: offsets["orders" if t == "lineitem" else t]}
        for fk, parent in fks.items():
            shift[fk] = offsets[parent]
        for col, step in shift.items():
            scaled = scaled.withColumn(
                col,
                (F.col(col) + F.col("_rep").cast("long") * F.lit(step)).cast(
                    df.schema[col].dataType
                ),
            )
        # embeddings/documents near-dup queries plant their own twins at
        # runtime; identical replicated vectors would make exact dedup
        # degenerate (every vector has K copies), which IS the stress
        # shape for dedup operators — keep it, that's the point.
        scaled.drop("_rep").repartition(32).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        print(f"{t}: {df.count()} -> {k}x", flush=True)

    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
