"""M4 operators: IVF ANN recall, numpy cosine parity, streaming ingest
with dedup, multimodal plumbing."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from hawk_pack_spark.operators.knn_exact import knn_exact
from hawk_pack_spark.operators.similarity import cosine_topk_numpy, ivf_build, ivf_search
from hawk_pack_spark.sources import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return (
        load_table(spark, "embeddings", sf_dir)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .cache()
    )


def test_ivf_recall(spark, emb):
    assigned, centers = ivf_build(emb, n_clusters=8)
    assert len(centers) == 8
    queries = emb.where(F.col("vec_id") < 30).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    approx = ivf_search(assigned, centers, queries, k=10, nprobe=4)
    exact = knn_exact(emb, queries, k=10, metric="l2_sq")
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    recall = len(a & e) / len(e)
    # random gaussian data clusters poorly; the point is correct plumbing
    # with a real pruning ratio (nprobe/k = half the buckets)
    assert recall > 0.5, f"recall {recall}"
    # every returned candidate must come from a probed bucket
    assert approx.count() == 30 * 10


def test_cosine_topk_numpy_matches_exact(spark, emb):
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    fast = cosine_topk_numpy(emb, queries, k=10)
    from hawk_pack_spark.functions.distance import cosine_sim
    from hawk_pack_spark.operators.topk import topk_rows

    pairs = emb.crossJoin(F.broadcast(queries))
    scored = pairs.select(
        "query_id", "vec_id", cosine_sim("query_vec", "embedding").alias("sim")
    )
    slow = topk_rows(scored, ["query_id"], "sim", 10, ascending=False, tie_cols=["vec_id"])
    f = {(r.query_id, r.vec_id) for r in fast.collect()}
    s = {(r.query_id, r.vec_id) for r in slow.collect()}
    assert f == s


def test_streaming_ingest_dedup(spark):
    from hawk_pack_spark.config import HawkParams
    from hawk_pack_spark.streaming.ingest import StreamingIndex, start_parquet_ingest

    tmp = tempfile.mkdtemp(prefix="hps_stream_")
    try:
        # two batch files with overlapping codes: 0..99 then 50..149
        spark.range(100).select(
            F.col("id").alias("vec_id"), F.col("id").alias("code")
        ).coalesce(1).write.parquet(f"{tmp}/src/b1")
        spark.range(100).select(
            (F.col("id") + 1000).alias("vec_id"), (F.col("id") + 50).alias("code")
        ).coalesce(1).write.parquet(f"{tmp}/src/b2")

        sink = StreamingIndex(
            metric="hamming",
            params=HawkParams.new(64, 32, 16),
            match_threshold=0.0,
            num_shards=2,
        )
        q = start_parquet_ingest(
            spark, f"{tmp}/src/*", "vec_id long, code long", sink,
            checkpoint_dir=f"{tmp}/ckpt",
        )
        q.awaitTermination(120)
        # 100 + 100 staged, 50 duplicates rejected by the is_match gate
        assert sink.count() == 150
        codes = {r.code for r in sink.index_df.select("code").collect()}
        assert codes == set(range(150))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_multimodal_features(spark, sf_dir):
    from hawk_pack_spark.multimodal.ops import (
        extract_features,
        frame_sample,
        resize_meta,
        synthetic_media,
    )

    media = synthetic_media(spark, sf_dir)
    assert media.schema["payload"].dataType.typeName() == "binary"

    feats = extract_features(media)
    rows = feats.limit(5).collect()
    assert all(len(r.feature) == 64 for r in rows)
    # deterministic: same payload → same feature
    again = {r.media_id: r.feature for r in extract_features(media).limit(5).collect()}
    for r in rows:
        assert again[r.media_id] == r.feature

    # features feed the vector operators directly
    from hawk_pack_spark.operators.knn_exact import knn_exact

    vecs = feats.select(F.col("media_id").alias("vec_id"), F.col("feature").alias("embedding"))
    queries = vecs.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = knn_exact(vecs, queries, k=3, metric="cosine")
    assert out.count() == 9
    nearest = {r.query_id: r.vec_id for r in out.where(F.col("rank") == 1).collect()}
    assert nearest == {0: 0, 1: 1, 2: 2}  # self is nearest at cosine dist 0

    fs = frame_sample(media, every_nth=10)
    assert fs.where(F.col("frame_idx") % 10 != 0).count() == 0

    rm = resize_meta(media, max_side=256)
    bad = rm.where(
        (F.col("target_width") > 256) | (F.col("target_height") > 256)
    ).count()
    assert bad == 0


def test_exact_dedup_operator(spark):
    from hawk_pack_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "c")], "doc_id long, text string"
    )
    kept = exact_dedup(df, "text")
    assert sorted(r.doc_id for r in kept.collect()) == [1, 3, 5]


def test_connected_components(spark):
    from hawk_pack_spark.operators.components import connected_components, dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 1)], "id_a long, id_b long"
    )
    comp = {r.node: r.component for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 8: 1, 5: 5, 6: 5}

    all_ids = spark.createDataFrame([(i,) for i in range(1, 10)], "doc_id long")
    out = {r.doc_id: (r.rep, r.keep) for r in dedup_clusters(pairs, all_ids).collect()}
    assert out[4] == (4, True)   # unpaired keeps itself
    assert out[3] == (1, False)
    assert out[1] == (1, True)
    assert sum(1 for rep, keep in out.values() if keep) == 5  # {1,4,5,7,9}


def test_hot_bucket_and_hot_gram_caps(spark):
    """Scale safety valves: capped runs drop only the degenerate hot
    keys; uncapped behavior is unchanged."""
    from hawk_pack_spark.operators.dedup import (
        minhash_bands,
        minhash_candidates,
        minhash_signature,
        ngram_jaccard_pairs,
    )

    # 20 identical docs (one giant bucket) + 4 distinct near-pairs
    rows = [(i, "aa bb cc dd ee ff gg hh") for i in range(20)]
    rows += [(100, "xx yy zz ww vv"), (101, "xx yy zz ww uu")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    bands = minhash_bands(minhash_signature(docs), "doc_id")
    uncapped = minhash_candidates(bands, "doc_id").count()
    capped = minhash_candidates(bands, "doc_id", max_bucket=5)
    assert uncapped >= 190  # the clique dominates
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert got == {(100, 101)}  # clique dropped, true near-pair kept

    # hot-gram cap: identical docs share every trigram (df=20 > cap)
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.2, max_df=5)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got == {(100, 101)}


def test_streaming_near_dup_gate(spark):
    """StreamingNearDup: near-duplicate docs are rejected across AND
    inside micro-batches via the accumulated band-bucket store; novel
    docs pass. Batch-parity check: the accepted set equals what the
    batch minhash pipeline + first-wins retention would keep."""
    from hawk_pack_spark.streaming.ingest import StreamingNearDup

    base = [
        (0, "the quick brown fox jumps over the lazy dog every single day"),
        (1, "spark engines shuffle data between executors during wide stages"),
        (2, "completely different text about vector search and hnsw graphs"),
    ]
    # near-dup of 0 (one word changed), exact-dup of 1, novel
    b2 = [
        (10, "the quick brown fox jumps over the lazy cat every single day"),
        (11, "spark engines shuffle data between executors during wide stages"),
        (12, "a totally novel sentence mentioning product quantization codes"),
    ]
    gate = StreamingNearDup(num_hashes=8, bands=4)
    gate.ingest_batch(spark.createDataFrame(base, "doc_id long, text string"))
    assert gate.n_accepted() == 3
    gate.ingest_batch(spark.createDataFrame(b2, "doc_id long, text string"))
    accepted = {r.doc_id for r in gate.accepted_ids.collect()}
    assert {0, 1, 2}.issubset(accepted)
    assert 11 not in accepted, "exact dup crossed the gate"
    assert 10 not in accepted, "near dup (1-word edit) crossed the gate"
    assert 12 in accepted, "novel doc was over-rejected"

    # intra-batch first-wins: two near-identical docs in ONE batch
    gate2 = StreamingNearDup(num_hashes=8, bands=4)
    gate2.ingest_batch(
        spark.createDataFrame(
            [
                (5, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
                (9, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            ],
            "doc_id long, text string",
        )
    )
    assert {r.doc_id for r in gate2.accepted_ids.collect()} == {5}


def test_streaming_ingest_persists_delta_to_jdbc(spark):
    """Stream → index → durable store: with a JDBC URL configured, every
    micro-batch row-level-upserts the TOUCHED shards' graph rows
    (reference ON CONFLICT semantics, graph_pg.rs:111-115) — after the
    stream drains, the database holds exactly the final graph."""
    from hawk_pack_spark.config import HawkParams
    from hawk_pack_spark.operators import hnsw
    from hawk_pack_spark.sources.graph_io import import_graph_jdbc
    from hawk_pack_spark.streaming.ingest import StreamingIndex, start_parquet_ingest

    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    try:
        spark._jvm.java.lang.Class.forName(driver)
    except Exception:
        pytest.skip("embedded Derby driver not on the classpath")

    tmp = tempfile.mkdtemp(prefix="hps_stream_jdbc_")
    url = f"jdbc:derby:{tmp}/derby_stream;create=true"
    try:
        spark.range(80).select(
            F.col("id").alias("vec_id"), (F.col("id") * 7).alias("code")
        ).coalesce(1).write.parquet(f"{tmp}/src/b1")
        spark.range(40).select(
            (F.col("id") + 1000).alias("vec_id"),
            ((F.col("id") + 80) * 7).alias("code"),
        ).coalesce(1).write.parquet(f"{tmp}/src/b2")

        sink = StreamingIndex(
            metric="hamming",
            params=HawkParams.new(32, 16, 8),
            match_threshold=0.0,
            num_shards=3,
            jdbc_url=url,
            jdbc_driver=driver,
        )
        q = start_parquet_ingest(
            spark, f"{tmp}/src/*", "vec_id long, code long", sink,
            checkpoint_dir=f"{tmp}/ckpt",
        )
        q.awaitTermination(120)
        assert sink.count() == 120

        got = import_graph_jdbc(spark, url=url, driver=driver)
        assert got is not None
        links_db, entries_db = got
        want_links = {
            (r.layer, r.src): [(n.dist, n.dst) for n in r.nbrs]
            for r in hnsw.to_links(sink.index_df).collect()
        }
        have_links = {
            (r.layer, r.src): [(n.dist, n.dst) for n in r.nbrs]
            for r in links_db.collect()
        }
        assert have_links == want_links
        assert {tuple(r) for r in entries_db.collect()} == {
            (r.shard, r.point, r.layer)
            for r in hnsw.entry_points(sink.index_df).collect()
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_streaming_near_dup_durable_store_resumes(spark, tmp_path):
    """Durable band store: gate writes append-only parquet per batch; a
    FRESH gate on the same path resumes the history — near-dups of docs
    accepted by the dead process are still rejected, and the accepted
    log accumulates across processes (restart ≡ continuation)."""
    from hawk_pack_spark.streaming.ingest import StreamingNearDup

    path = str(tmp_path / "neardup_store")
    b1 = [
        (0, "the quick brown fox jumps over the lazy dog every single day"),
        (1, "spark engines shuffle data between executors during wide stages"),
    ]
    g1 = StreamingNearDup(num_hashes=8, bands=4, store_path=path)
    g1.ingest_batch(spark.createDataFrame(b1, "doc_id long, text string"))
    assert g1.n_accepted() == 2

    # process dies; a new gate resumes from the parquet history
    b2 = [
        (10, "the quick brown fox jumps over the lazy cat every single day"),
        (11, "spark engines shuffle data between executors during wide stages"),
        (12, "a totally novel sentence mentioning product quantization codes"),
    ]
    g2 = StreamingNearDup(num_hashes=8, bands=4, store_path=path)
    g2.ingest_batch(spark.createDataFrame(b2, "doc_id long, text string"))
    accepted = {r.doc_id for r in g2.accepted_ids.collect()}
    assert accepted == {0, 1, 12}, accepted

    # third process sees the union of both epochs
    g3 = StreamingNearDup(num_hashes=8, bands=4, store_path=path)
    g3.ingest_batch(
        spark.createDataFrame(
            [(20, "a totally novel sentence mentioning product quantization codes"),
             (21, "fresh words praising partition pruning and broadcast joins")],
            "doc_id long, text string",
        )
    )
    accepted = {r.doc_id for r in g3.accepted_ids.collect()}
    assert 20 not in accepted and 21 in accepted, accepted
