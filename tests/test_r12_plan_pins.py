"""Plan-shape pins for the round-12 optimization changes: the
optimizations make claims ("the Hamming top-k shuffles metadata, not
payloads") — these tests make the executed plan keep them."""

from __future__ import annotations

import re


def _formatted(df) -> str:
    df.collect()  # AQE: the final plan exists only after execution
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_binary_quant_hamming_topk_shuffles_no_vectors(spark):
    """binary_quant_knn's prefilter window shuffles one row per
    (corpus row x query); it must carry ONLY (query_id, vec_id, _hd) —
    re-introducing the float vectors into that exchange multiplies the
    shuffle bytes ~40x (the r12 optimization this pins)."""
    from hawk_pack_spark.operators.similarity import binary_quant_knn

    vecs = spark.createDataFrame(
        [(i, [float((i * j) % 7) - 3.0 for j in range(1, 65)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    qs = vecs.where("vec_id < 3").selectExpr(
        "vec_id as query_id", "embedding as query_vec"
    )
    out = binary_quant_knn(vecs, qs, k=3, dim=64)
    plan = _formatted(out)
    # every query_id-partitioned Exchange that sits below a rank filter
    # (the Hamming prefilter and the final re-rank) must be payload-free:
    # its Input list may not mention the vector columns
    blocks = re.split(r"\n\(\d+\) ", plan)
    exchanges = [
        b for b in blocks
        if b.startswith("Exchange") and "hashpartitioning(query_id" in b
    ]
    assert exchanges, plan[:2000]
    hamming_ex = [b for b in exchanges if "_hd" in b]
    assert hamming_ex, plan[:2000]
    for b in hamming_ex:
        input_line = next(ln for ln in b.splitlines() if ln.startswith("Input"))
        assert "embedding" not in input_line and "_qv" not in input_line, b
        n_cols = int(re.match(r"Input \[(\d+)\]", input_line).group(1))
        assert n_cols <= 3, input_line


def test_minhash_cap_is_single_window_shuffle(spark):
    """minhash_candidates' bucket cap runs as a count window on the
    (band, band_key) self-join key — not the former groupBy + join
    (two extra exchanges of the band table)."""
    from hawk_pack_spark.operators.dedup import minhash_bands, minhash_signature

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma {i % 3}") for i in range(12)],
        "doc_id long, text string",
    )
    bands = minhash_bands(minhash_signature(docs, num_hashes=8), num_hashes=8, bands=4)
    # pin at the operator level: the capped band table's plan carries
    # exactly one exchange (the window) — the join downstream reads the
    # materialized checkpoint, pinned separately by result parity tests
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("band", "band_key")
    capped = (
        bands.withColumn("_bsize", F.count(F.lit(1)).over(w))
        .where(F.col("_bsize") <= 20)
        .drop("_bsize")
    )
    plan = _formatted(capped)
    n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
    # 4 on Spark 4.1: tokenize-explode shuffle, signature groupBy
    # (partial+final), cap window — the former groupBy-sizes +
    # shuffle-join form added two more band-table exchanges on top
    assert n_ex <= 4, f"{n_ex} exchanges\n{plan[:2000]}"


def test_verify_jaccard_candidate_pruned_path_exact(spark):
    """verify_jaccard now prunes the corpus to candidate-pair members
    before tokenizing (r12). The pruned path must stay value-identical:
    present pairs verify exactly, and a candidate id absent from the
    corpus drops the pair (inner-join semantics, same as before)."""
    from hawk_pack_spark.operators.dedup import verify_jaccard

    docs = spark.createDataFrame(
        [(i, f"x y z common tokens {i % 2}") for i in range(100)],
        "doc_id long, text string",
    )
    cands = spark.createDataFrame(
        [(3, 7), (2, 5), (4, 999)], "id_a long, id_b long"
    )
    out = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in verify_jaccard(cands, docs, threshold=0.0).collect()
    )
    # 3/7 share all 6 tokens (both odd); 2/5 differ in the parity token
    # (5 shared of 7 distinct = 0.714286); 4/999 drops (999 not in corpus)
    assert out == [(2, 5, 0.714286), (3, 7, 1.0)]


def test_knn_join_merge_pin_band(spark):
    """r12: the sort-merge pin on knn_join's corpus x corpus joins is
    waived only inside the [25k, 200k] n_rows band where AQE broadcast
    measured FASTER (38.9 s vs 85.2 s pinned at n=50k). Below the band
    broadcast measured ~2x SLOWER (20-21 s vs 12-13 s at the sf0.1
    fixture's n=2k — adaptive materialization barriers beat the trivial
    sort), and above it a corpus-sized broadcast is unsafe (r9 driver
    OOM), so the pin stays on in both regimes."""
    import numpy as np

    from hawk_pack_spark.operators.similarity import knn_join

    rng = np.random.default_rng(3)
    mat = rng.normal(size=(400, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(400)],
        "vec_id long, embedding array<double>",
    )

    def hinted(n_rows):
        g = knn_join(
            df, k=3, n_clusters=4, nprobe=2, replicas=1,
            descent_rounds=0, n_rows=n_rows, dim=8, fit_fraction=1.0,
        )
        # the physical plan keeps SortMergeJoin until AQE's runtime
        # rewrite either way, so the contract is pinned on the merge
        # HINT surviving into the optimized logical join
        return "merge" in g._jdf.queryExecution().optimizedPlan().toString().lower()

    assert hinted(2_000)        # below the band: pinned
    assert not hinted(50_000)   # inside the band: waived
    assert hinted(300_000)      # above the band: pinned
