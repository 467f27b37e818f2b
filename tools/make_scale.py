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
        # documents.text replicates VERBATIM on purpose — K exact copies
        # of every doc is the stress shape for the dedup operators, and
        # both engines see the same parquet so parity is unaffected.
        # embeddings are PERTURBED per replica instead, and the
        # perturbation must clear TWO bars at once (measured the hard
        # way at the r6 sf1 gate): (a) exact-identity oracles
        # (self-recall, delete+repair) assume a vector's dist-0 nearest
        # neighbor is itself — K exact copies make it a K-way tie; and
        # (b) NEAR-dup oracles (semdedup at cos 0.9) assume only their
        # runtime-planted twins are near — a tiny +1e-5 shift left
        # replicas at cos 0.9999 and the engine correctly reported all
        # 90,000 replica pairs the constant oracle doesn't model. So
        # replicas get a hash-random delta EXPLICITLY ORTHOGONALIZED
        # against the vector (Gram-Schmidt) and scaled to the vector's
        # own norm, so replica-to-base cos = 1/sqrt(2) ≈ 0.707 exactly
        # by construction and replica-to-replica ≈ 0.5. (Two cheaper
        # attempts measured and rejected at the r6 sf1 gate: phase-
        # varied sine deltas live in a 2-D subspace — cross-rep corr up
        # to 0.87; frequency-varied deltas decorrelate from each other
        # but can ALIGN WITH THE FIXTURE VECTOR itself for some ids —
        # replica cos 0.99.) Distinct identities below every near-dup
        # threshold, a realistic 10-cluster-per-base ANN corpus.
        if t == "embeddings":
            dbl = F.transform("embedding", lambda x: x.cast("double"))
            scaled = scaled.withColumn("_v", dbl).withColumn(
                "_d",
                F.transform(
                    "_v",
                    lambda x, i: F.sin(
                        F.xxhash64(F.col(key), F.col("_rep"), i).cast("double")
                        * 1e-9
                    ),
                ),
            )
            dot = lambda a, b: F.aggregate(  # noqa: E731
                F.zip_with(a, b, lambda x, y: x * y),
                F.lit(0.0), lambda acc, x: acc + x,
            )
            scaled = (
                scaled.withColumn("_vv", dot("_v", "_v"))
                .withColumn("_beta", dot("_d", "_v") / F.col("_vv"))
                .withColumn(
                    "_p",
                    F.zip_with(
                        "_d", "_v", lambda d, v: d - F.col("_beta") * v
                    ),
                )
                .withColumn("_pp", dot("_p", "_p"))
                .withColumn(
                    "embedding",
                    F.when(
                        (F.col("_rep") > 0) & (F.col("_vv") > 0)
                        & (F.col("_pp") > 0),
                        F.zip_with(
                            "_v", "_p",
                            lambda v, p: (
                                v
                                + F.sqrt(F.col("_vv") / F.col("_pp")) * p
                            ).cast("float"),
                        ),
                    ).otherwise(F.col("embedding")),
                )
                .drop("_v", "_d", "_vv", "_beta", "_p", "_pp")
            )
        scaled.drop("_rep").repartition(32).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        print(f"{t}: {df.count()} -> {k}x", flush=True)

    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
