"""BPE training: distributed dataflow must reproduce the plain-python
reference (same merges in the same order, same final segmentations)."""

from __future__ import annotations

import random

from hawk_pack_spark.operators.bpe import END, train_bpe, train_bpe_reference


def _freqs_from_texts(texts):
    wf: dict[str, int] = {}
    for t in texts:
        for w in t.lower().split():
            wf[w] = wf.get(w, 0) + 1
    return wf


def test_bpe_matches_reference_on_synthetic(spark):
    rng = random.Random(13)
    vocab = ["low", "lower", "lowest", "newer", "new", "wider", "widest", "slow"]
    texts = [" ".join(rng.choice(vocab) for _ in range(30)) for _ in range(40)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges, segmented = train_bpe(docs, n_merges=12)
    want = train_bpe_reference(_freqs_from_texts(texts), n_merges=12)
    assert merges == want and len(merges) == 12
    # classic BPE behavior: frequent suffixes glue into single symbols
    glued = {a + b for a, b, _ in merges}
    assert any(g.endswith(END) for g in glued)
    # segmentations are exact concatenations of their words
    for r in segmented.collect():
        assert "".join(r["syms"]) == r["w"] + END


def test_bpe_on_fixture_matches_reference(spark, sf_dir):
    import duckdb

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges, _ = train_bpe(docs, n_merges=8)
    rows = duckdb.sql(
        f"""SELECT w, COUNT(*) AS f FROM (
              SELECT unnest(list_filter(
                regexp_split_to_array(lower(text), '\\s+'), x -> x != '')) AS w
              FROM '{sf_dir}/documents.parquet') GROUP BY w"""
    ).fetchall()
    want = train_bpe_reference({w: f for w, f in rows}, n_merges=8)
    assert merges == want and len(merges) == 8


def test_incremental_trainer_matches_reference_deep():
    """The heap/inverted-index trainer must track the O(vocab)-per-merge
    reference exactly over a long merge sequence on a large random
    vocabulary — this exercises stale-heap skipping, count decreases,
    self-pairs (a==b), and pair extinction."""
    from hawk_pack_spark.operators.bpe import _train_on_word_table

    rng = random.Random(99)
    alphabet = "abcdef"
    wf = {}
    for _ in range(2000):
        w = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        wf[w] = wf.get(w, 0) + rng.randint(1, 50)
    merges, vocab = _train_on_word_table(wf, n_merges=400, min_pair_freq=2)
    want = train_bpe_reference(wf, n_merges=400, min_pair_freq=2)
    assert merges == want
    for w, syms in vocab.items():
        assert "".join(syms) == w + END


def test_bpe_stops_when_pairs_exhaust(spark):
    docs = spark.createDataFrame([(0, "ab ab cd")], "doc_id long, text string")
    merges, _ = train_bpe(docs, n_merges=50, min_pair_freq=2)
    # only (a, b+END) reaches freq 2; everything else is unique
    assert len(merges) == 1 and merges[0][:2] == ("a", "b" + END)


def test_apply_bpe_consistent_with_training(spark):
    """Applying the learned merges to the training corpus must reproduce
    the final training segmentation for every word (priority-ordered
    application converges to the same fixpoint as sequential training
    on words the trainer saw)."""
    from hawk_pack_spark.operators.bpe import apply_bpe

    texts = ["low lower lowest low low", "newer new newest lower low"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges, segmented = train_bpe(docs, n_merges=10)
    want = {r["w"]: list(r["syms"]) for r in segmented.collect()}
    out = apply_bpe(docs, merges).collect()
    for r in out:
        # re-split subwords back into words via the END marker
        words, cur = [], []
        for s in r["subwords"]:
            cur.append(s)
            if s.endswith(END):
                words.append(cur)
                cur = []
        texts_words = texts[r["doc_id"]].split()
        assert len(words) == len(texts_words)
        for w, got in zip(texts_words, words):
            assert got == want[w], (w, got, want[w])
        assert r["n_subwords"] == len(r["subwords"])


def test_distributed_trainer_matches_reference(spark):
    """VERDICT r4 #1: the no-driver-collect trainer (word table stays a
    DataFrame, per-merge distributed pair count + 1-row argmax collect +
    Catalyst fold rewrite) must learn the byte-identical merge sequence
    and final segmentation as the reference — including across a
    localCheckpoint boundary (checkpoint_every=3 < n_merges)."""
    from hawk_pack_spark.operators.bpe import train_bpe_distributed

    rng = random.Random(13)
    vocab = ["low", "lower", "lowest", "newer", "new", "wider", "widest", "slow"]
    texts = [" ".join(rng.choice(vocab) for _ in range(30)) for _ in range(40)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    merges, segmented = train_bpe_distributed(docs, n_merges=12, checkpoint_every=3)
    want = train_bpe_reference(_freqs_from_texts(texts), n_merges=12)
    assert merges == want and len(merges) == 12
    for r in segmented.collect():
        assert "".join(r["syms"]) == r["w"] + END

    # early stop parity when pairs exhaust
    small = spark.createDataFrame([(0, "ab ab cd")], "doc_id long, text string")
    m2, _ = train_bpe_distributed(small, n_merges=50, min_pair_freq=2)
    assert len(m2) == 1 and m2[0][:2] == ("a", "b" + END)


def test_distributed_trainer_self_pairs_and_ties(spark):
    """Adversarial shapes for the fold expression: self-pairs (a==b) in
    runs ('aaaa' → 'aa'|'aa'), and count ties broken by (a, b) asc —
    both must match the reference exactly."""
    from hawk_pack_spark.operators.bpe import train_bpe_distributed

    docs = spark.createDataFrame(
        [(0, "aaaa aaaa aa zz zz yy yy")], "doc_id long, text string"
    )
    merges, seg = train_bpe_distributed(docs, n_merges=6, min_pair_freq=2)
    want = train_bpe_reference(
        {"aaaa": 2, "aa": 1, "zz": 2, "yy": 2}, n_merges=6
    )
    assert merges == want
    got = {r["w"]: list(r["syms"]) for r in seg.collect()}
    for w, syms in got.items():
        assert "".join(syms) == w + END


def test_train_bpe_dispatches_to_distributed_over_limit(spark):
    """train_bpe with a word table above max_driver_words must route to
    the distributed trainer (no O(vocab) driver collect) and still
    return the identical result."""
    texts = ["low lower lowest low low", "newer new newest lower low"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    via_driver, _ = train_bpe(docs, n_merges=8, max_driver_words=None)
    via_dispatch, seg = train_bpe(docs, n_merges=8, max_driver_words=2)
    assert via_dispatch == via_driver and len(via_dispatch) == 8
    assert {f.name for f in seg.schema.fields} == {"w", "freq", "syms"}
