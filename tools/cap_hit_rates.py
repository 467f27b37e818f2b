"""Measure the near-dup safety-cap hit-rates (VERDICT r02 item 7):
how often the catalog's scale caps (minhash max_bucket=20, ngram
max_df=20) actually trigger at a given SF, and how much quadratic pair
mass they avert. Degenerate-key behavior measured, not assumed.

Usage: python tools/cap_hit_rates.py [sf_dir]   (default sf0.1)
Prints one JSON line for NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from hawk_pack_spark.operators.dedup import minhash_bands, minhash_signature  # noqa: E402
from hawk_pack_spark.functions.text import tokens  # noqa: E402
from hawk_pack_spark.session import get_spark  # noqa: E402
from hawk_pack_spark.sources import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out: dict = {"sf_dir": sf_dir}
    spark = get_spark("cap-hit-rates")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, "documents", sf_dir)

    # --- minhash LSH buckets (catalog: num_hashes=8, bands=4, cap=20) ---
    cap = 20
    bands = minhash_bands(minhash_signature(docs, num_hashes=8), bands=4)
    sizes = bands.groupBy("band", "band_key").agg(F.count(F.lit(1)).alias("b"))
    agg = sizes.agg(
        F.count(F.lit(1)).alias("buckets"),
        F.max("b").alias("max_bucket_size"),
        F.sum(F.when(F.col("b") > cap, 1).otherwise(0)).alias("buckets_over_cap"),
        F.sum(F.when(F.col("b") > cap, F.col("b"))).alias("rows_in_over_cap"),
        F.sum(F.col("b") * (F.col("b") - 1) / 2).alias("pairs_uncapped"),
        F.sum(
            F.when(F.col("b") <= cap, F.col("b") * (F.col("b") - 1) / 2).otherwise(0)
        ).alias("pairs_capped"),
    ).collect()[0]
    out["minhash"] = {
        "cap": cap,
        "buckets": int(agg["buckets"]),
        "max_bucket_size": int(agg["max_bucket_size"]),
        "buckets_over_cap": int(agg["buckets_over_cap"]),
        "rows_in_over_cap": int(agg["rows_in_over_cap"] or 0),
        "candidate_pairs_uncapped": int(agg["pairs_uncapped"]),
        "candidate_pairs_capped": int(agg["pairs_capped"]),
    }

    # --- ngram document frequencies (catalog: n=3, max_df=20) -----------
    cap = 20
    ts = tokens("text")
    idx = F.sequence(F.lit(1), F.size(ts) - 2)
    grams = F.array_distinct(
        F.when(
            F.size(ts) >= 3,
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(ts, i, 3))),
        ).otherwise(F.array().cast("array<string>"))
    )
    g0 = docs.select("doc_id", F.explode(grams).alias("gram"))
    dfs = g0.groupBy("gram").agg(F.count(F.lit(1)).alias("d"))
    agg = dfs.agg(
        F.count(F.lit(1)).alias("grams"),
        F.max("d").alias("max_df"),
        F.sum(F.when(F.col("d") > cap, 1).otherwise(0)).alias("grams_over_cap"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("pairs_uncapped"),
        F.sum(
            F.when(F.col("d") <= cap, F.col("d") * (F.col("d") - 1) / 2).otherwise(0)
        ).alias("pairs_capped"),
    ).collect()[0]
    out["ngram"] = {
        "cap": cap,
        "grams": int(agg["grams"]),
        "max_df": int(agg["max_df"]),
        "grams_over_cap": int(agg["grams_over_cap"]),
        "join_pairs_uncapped": int(agg["pairs_uncapped"]),
        "join_pairs_capped": int(agg["pairs_capped"]),
    }

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
