"""Round-9 batch 6: containment join, OOV rate, equal-frequency
binning, DAU/MAU — closed-form checks."""

from __future__ import annotations


def test_containment_join_asymmetric(spark):
    from hawk_pack_spark.operators.dedup import containment_prefix_join

    # doc 1's tokens are a strict subset of doc 2's: containment(1->2)
    # = 1.0 but (2->1) = 5/8 < 0.8 — only the directed pair appears.
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "iota kappa lambda mu"),
        ],
        "doc_id long, text string",
    )
    rows = {
        (r.id_a, r.id_b): r
        for r in containment_prefix_join(docs, 0.8).collect()
    }
    assert set(rows) == {(1, 2)}
    r = rows[(1, 2)]
    assert r.n_common == 5 and r.size_a == 5
    assert r.containment == 1.0


def test_containment_join_lossless_vs_bruteforce(spark):
    import itertools

    from hawk_pack_spark.operators.dedup import containment_prefix_join

    # random-ish small corpus: verify the prefix filter loses nothing
    # against a literal brute force at tau = 0.6
    vocab = ["a", "b", "c", "d", "e", "f", "g", "h"]
    texts = {
        i: " ".join(vocab[j] for j in range(len(vocab)) if (i >> j) & 1)
        for i in range(1, 40)
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        (r.id_a, r.id_b)
        for r in containment_prefix_join(docs, 0.6).collect()
    }
    want = set()
    sets = {i: set(t.split()) for i, t in texts.items()}
    for a, b in itertools.permutations(sets, 2):
        inter = len(sets[a] & sets[b])
        if 5 * inter >= 3 * len(sets[a]):  # 0.6 = 3/5
            want.add((a, b))
    assert got == want


def test_oov_rate_hand_vocab(spark):
    from hawk_pack_spark.functions.curation import oov_rate

    # corpus counts: x:4, y:3, z:2, w:1 -> vocab_size=2 keeps {x, y}
    docs = spark.createDataFrame(
        [(1, "x x y z"), (2, "x x y y z w")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in oov_rate(docs, vocab_size=2).collect()}
    assert out[1].n_tokens == 4 and out[1].n_oov == 1
    assert out[1].oov_rate == 0.25
    assert out[2].n_tokens == 6 and out[2].n_oov == 2
    assert out[2].oov_rate == round(2 / 6, 6)


def test_equal_frequency_bins_exact_sizes_and_bounds(spark):
    from hawk_pack_spark.operators.analytics import equal_frequency_bins

    df = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(100)], "id long, v double"
    )
    out = {r.bin: r for r in equal_frequency_bins(df, "v", n_bins=4, tiebreak_col="id").collect()}
    assert set(out) == {0, 1, 2, 3}
    assert all(out[b].n_rows == 25 for b in out)
    assert out[0].lo == 1.0 and out[0].hi == 25.0
    assert out[3].lo == 76.0 and out[3].hi == 100.0


def test_equal_frequency_bins_uneven_split(spark):
    from hawk_pack_spark.operators.analytics import equal_frequency_bins

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id long, v double"
    )
    out = {r.bin: r.n_rows for r in equal_frequency_bins(df, "v", n_bins=3, tiebreak_col="id").collect()}
    # floor((rank-1)*3/10): sizes 4, 3, 3
    assert out == {0: 4, 1: 3, 2: 3}


def test_dau_mau_hand_series(spark):
    import datetime

    from hawk_pack_spark.operators.analytics import dau_mau

    d = datetime.datetime
    rows = [
        (1, d(2024, 1, 1)), (2, d(2024, 1, 1)),
        (1, d(2024, 1, 2)),
        (3, d(2024, 1, 4)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {str(r.day): r for r in dau_mau(ev, window_days=3).collect()}
    assert len(out) == 4  # zero-filled spine Jan 1-4
    assert out["2024-01-01"].dau == 2 and out["2024-01-01"].mau == 2
    assert out["2024-01-02"].dau == 1 and out["2024-01-02"].mau == 2
    # Jan 3: nobody active, but users 1,2 were active within 3 days
    assert out["2024-01-03"].dau == 0 and out["2024-01-03"].mau == 2
    assert out["2024-01-03"].stickiness == 0.0
    # Jan 4: user 3 active; window covers Jan 2-4 -> users {1, 3}
    assert out["2024-01-04"].dau == 1 and out["2024-01-04"].mau == 2
    assert out["2024-01-04"].stickiness == 0.5
