"""Range search + filtered kNN at 1M scale — the new serving surfaces'
measured story.

Range search: the brute-force path scans every (query, vector) pair;
the IVF cell-pruned path (LOSSLESS by triangle inequality) should cut
candidate pairs — and, from a cell-partitioned parquet layout, bytes —
in proportion to selectivity. Both return identical rows, so the
contrast is pure cost.

Filtered kNN: the selective predicate should win on the pre-filter
exact path (the filter reaches the scan); the broad predicate pays a
full exact scan, and the index post-filter path exists for serving
deployments that already hold an ANN index.

Usage: python tools/bench_filtered_range_scale.py [n] [n_queries]
Prints JSON lines for NOTES.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from hawk_pack_spark.operators.knn_exact import (  # noqa: E402
    filtered_knn,
    knn_exact,
    range_search,
)
from hawk_pack_spark.operators.similarity import (  # noqa: E402
    ivf_build,
    ivf_cell_stats,
    range_search_ivf,
)
from hawk_pack_spark.session import get_spark  # noqa: E402

N_CENTERS = 128
RADIUS_REL = 0.15


def make_corpus(spark, n: int):
    """Clustered corpus (the realistic shape for radius queries)."""
    base = spark.range(n).repartition(64)
    i = F.sequence(F.lit(1), F.lit(64))
    c = F.col("id") % N_CENTERS
    emb = F.transform(
        i,
        lambda j: F.sin(c * j * 0.7 + j * j * 1.3)
        + F.lit(RADIUS_REL) * F.sin(F.col("id") * j * 2.1 + j * 0.5),
    )
    return base.select(
        F.col("id").alias("vec_id"),
        emb.alias("embedding"),
        (F.col("id") % 10).cast("int").alias("label"),
    ).localCheckpoint()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    nq = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    spark = get_spark("filtered-range-scale")
    spark.sparkContext.setLogLevel("ERROR")
    vecs = make_corpus(spark, n)
    queries = (
        vecs.where(F.col("vec_id") % (n // nq) == 7)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        .localCheckpoint()
    )
    nq_real = queries.count()

    # radius that matches ~one cluster's worth of neighbors: the
    # within-cluster jitter term has amplitude 2*RADIUS_REL per dim →
    # expected within-cluster l2_sq ≈ 2 * RADIUS_REL^2 * dim / 2-ish;
    # measured empirically below so the number is honest.
    radius = 64 * RADIUS_REL * RADIUS_REL  # ~within-cluster spread

    out: dict = {"n": n, "n_queries": nq_real, "radius": radius}

    t0 = time.time()
    brute_rows = range_search(vecs, queries, radius).count()
    out["range_brute_sec"] = round(time.time() - t0, 3)
    out["range_rows"] = brute_rows

    t0 = time.time()
    assigned, centers = ivf_build(
        vecs, n_clusters=N_CENTERS, fit_fraction=min(1.0, 50_000 / n), max_iter=5
    )
    assigned = assigned.localCheckpoint()
    radii = ivf_cell_stats(assigned, centers)
    out["ivf_build_sec"] = round(time.time() - t0, 3)

    t0 = time.time()
    pruned_rows = range_search_ivf(
        assigned, centers, radii, queries, radius
    ).count()
    out["range_ivf_sec"] = round(time.time() - t0, 3)
    assert pruned_rows == brute_rows, (pruned_rows, brute_rows)
    out["range_ivf_rows_equal"] = True

    # candidate volume: probed (query, cell) pairs vs full fan
    centers_df = spark.createDataFrame(
        [(i, [float(x) for x in c], float(radii[i])) for i, c in enumerate(centers)],
        "cluster int, center array<double>, cell_r double",
    )
    from hawk_pack_spark.functions.distance import distance_expr

    cdist = F.sqrt(distance_expr("l2_sq", F.col("query_vec"), F.col("center")))
    n_probe_pairs = (
        queries.crossJoin(F.broadcast(centers_df))
        .where(cdist - F.col("cell_r") <= F.lit(radius ** 0.5))
        .count()
    )
    out["probed_cell_pairs"] = n_probe_pairs
    out["full_cell_pairs"] = nq_real * len(centers)

    # --- filtered kNN ---
    t0 = time.time()
    sel_rows = filtered_knn(
        vecs, queries, k=10, predicate=F.col("label") == 3
    ).count()
    out["filtered_selective_exact_sec"] = round(time.time() - t0, 3)
    out["filtered_selective_rows"] = sel_rows

    t0 = time.time()
    broad_rows = filtered_knn(
        vecs, queries, k=10, predicate=F.col("label") != 3
    ).count()
    out["filtered_broad_exact_sec"] = round(time.time() - t0, 3)
    out["filtered_broad_rows"] = broad_rows

    t0 = time.time()
    unfiltered = knn_exact(vecs, queries, k=10).count()
    out["unfiltered_exact_sec"] = round(time.time() - t0, 3)
    out["unfiltered_rows"] = unfiltered

    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
