"""Bloom-filter semi-join reduction — the runtime-filter pattern
(Spark's own `InjectRuntimeFilter`, Trino's dynamic filtering) exposed
as an explicit, composable operator for when the planner can't prove
it: prune a huge fact table against a key set that is too large to
broadcast as a hash set but compresses to a few bits per key as a
Bloom filter, then make the result EXACT with a verifying semi-join
over the survivors only.

Why this matters at 100 TB: a shuffle semi-join moves every fact row
with its join key; a broadcast hash semi-join needs the full distinct
key set (8+ bytes/key plus object overhead) on every executor. The
Bloom filter is ~10 bits/key with a 1% false-positive rate, so a 100M
key dim compresses to ~120 MB — broadcastable — and the verify join's
shuffle carries only `selectivity + ε` of the fact table. Correctness
is NOT probabilistic: false positives are removed by the verify join,
false negatives are impossible, so the result is row-identical to the
plain semi-join (the oracle contract).

Spark 4 does not expose `bloom_filter_agg`/`might_contain` in the
public function registry, so the filter is built with pure DataFrame
algebra: double hashing (Kirsch–Mitzenmacher 2006) over `xxhash64`
picks k bit positions per key, a `bit_or` groupBy packs them into
64-bit words, and the dense word array travels as ONE broadcast row
probed by `element_at` inside whole-stage codegen — no UDF anywhere.

Reference scope: superset (the reference engine has no relational
join surface); the pattern follows the published runtime-filter
literature, not any proprietary system.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(key: Column, n_hashes: int, m_bits: int) -> list[Column]:
    """k Bloom bit positions via double hashing: pos_i = (h1 + i·h2)
    mod m, with h1/h2 independent xxhash64 seeds folded non-negative.
    Kirsch–Mitzenmacher: two independent hashes give the asymptotic
    false-positive rate of k independent ones."""
    h1 = F.pmod(F.xxhash64(key), F.lit(m_bits))
    h2 = F.pmod(F.xxhash64(key, F.lit(0x9E3779B9)), F.lit(m_bits - 1)) + 1
    return [
        F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)).cast("long")
        for i in range(n_hashes)
    ]


def build_bloom(
    keys_df: DataFrame,
    key_col: str,
    n_keys_hint: int | None = None,
    bits_per_key: int = 10,
    n_hashes: int = 4,
    max_bits: int = 1 << 26,
) -> DataFrame:
    """Distributed Bloom-filter build over `keys_df[key_col]`: one
    explode to (word_index, bit) pairs, one `bit_or` groupBy (fully
    map-side combinable — the shuffle carries at most m/64 longs per
    partition), and one dense-array assembly. Returns a ONE-ROW
    DataFrame (m_bits, n_hashes, words: array<long>) ready to
    broadcast into :func:`bloom_semi_join`.

    `n_keys_hint` sizes the filter (m = bits_per_key · n_keys, capped
    at `max_bits` = 8 MiB of words by default — past the cap the
    false-positive rate degrades gracefully and the verify join still
    guarantees exactness). When omitted, ONE count() job runs first —
    the documented price of auto-sizing, same contract as
    similarity.knn_join.
    """
    n_keys = n_keys_hint if n_keys_hint is not None else keys_df.count()
    m_bits = max(64, min(max_bits, bits_per_key * max(1, n_keys)))
    # round up to a whole word so element_at never lands out of range
    m_bits = ((m_bits + 63) // 64) * 64
    n_words = m_bits // 64
    key = F.col(key_col)
    pos = F.array(*_positions(key, n_hashes, m_bits))
    words = (
        keys_df.where(key.isNotNull())
        .select(F.explode(pos).alias("_pos"))
        # SQL-side shiftleft: the PySpark wrapper only takes a literal
        # shift amount, the SQL function takes expressions
        .select(
            (F.col("_pos") / 64).cast("long").alias("_w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))"
            ).alias("_bit"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_bit").alias("_bits"))
    )
    # densify: sparse set words → one map, then an O(n_words) spine
    # walk with per-index hash lookups (NOT a fold of array rewrites,
    # which would be O(n_words²) at the size cap)
    dense = (
        words.groupBy()
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("_w", "_bits"))
            ).alias("_m")
        )
        .select(
            F.lit(m_bits).alias("m_bits"),
            F.lit(n_hashes).alias("n_hashes"),
            F.transform(
                F.sequence(F.lit(0), F.lit(n_words - 1)),
                lambda i: F.coalesce(
                    F.element_at(F.col("_m"), i.cast("long")),
                    F.lit(0).cast("long"),
                ),
            ).alias("words"),
        )
    )
    return dense


def bloom_semi_join(
    fact: DataFrame,
    keys_df: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    n_keys_hint: int | None = None,
    bits_per_key: int = 10,
    n_hashes: int = 4,
    verify: bool = True,
) -> DataFrame:
    """Semi-join `fact` to `keys_df` with a Bloom pre-filter: fact
    rows are pruned by a broadcast bit-array probe (k `element_at`
    lookups, all whole-stage codegen) BEFORE the exact semi-join runs
    over the survivors. Row-identical to
    ``fact.join(keys_df, key, "leftsemi")`` — the Bloom phase can only
    pass extra candidates (false positives), never drop a match, and
    `verify=True` (the default) removes those candidates exactly.

    `verify=False` returns the approximate superset (≈1% extra rows at
    the default 10 bits/key) for pipelines that tolerate it — e.g.
    pre-filtering before a later exact join that subsumes the check.

    The finished filter is materialized to the driver as ONE bounded
    row (≤ max_bits/8 = 8 MiB of words) and probed as a LITERAL-array
    Filter — exactly how Spark's own InjectRuntimeFilter materializes
    its bloom through a scalar subquery. This is deliberate, not a
    shortcut: when the probe rode along as a broadcast 1-row JOIN,
    Catalyst's PushDownLeftSemiAntiJoin pushed the verify semi-join
    BELOW the probe (verified on the executed plan), so at scale the
    unpruned fact would have hit the semi-join's shuffle first and the
    Bloom would have filtered nothing. A plain Filter stays below the
    semi-join, so the shuffle only ever sees survivors.
    """
    dim_key = dim_key or fact_key
    keys_proj = keys_df.select(F.col(dim_key).alias(fact_key))
    bloom = build_bloom(
        keys_proj,
        fact_key,
        n_keys_hint=n_keys_hint,
        bits_per_key=bits_per_key,
        n_hashes=n_hashes,
    ).first()
    m_bits, words = bloom["m_bits"], F.lit(list(bloom["words"]))
    key = F.col(fact_key)
    hits = None
    h1 = F.pmod(F.xxhash64(key), F.lit(m_bits))
    h2 = F.pmod(F.xxhash64(key, F.lit(0x9E3779B9)), F.lit(m_bits - 1)) + 1
    for i in range(n_hashes):
        pos = F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)).cast("long")
        word = F.element_at(words, (pos / 64).cast("int") + 1)
        bit_set = F.getbit(word, pos % 64) == 1
        hits = bit_set if hits is None else (hits & bit_set)
    pruned = fact.where(key.isNotNull() & hits)
    if not verify:
        return pruned
    return pruned.join(keys_proj, fact_key, "leftsemi")
