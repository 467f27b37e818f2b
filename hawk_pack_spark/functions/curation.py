"""Training-data curation operators: repetition metrics, n-gram
decontamination, and deterministic stratified sampling.

These are the published curation stages a 100 TB pretraining pipeline
runs between raw ingest and tokenization:

- **Repetition metrics** (Rae et al. 2021 "Gopher", Table A1): fraction
  of the document covered by its most frequent word 2-gram and by
  duplicated word 5-grams. Documents dominated by repeated n-grams are
  boilerplate/spam and get gated out.
- **Decontamination** (Brown et al. 2020 "GPT-3", App. C): any training
  document sharing >= k exact word n-grams with an evaluation set is
  flagged. Expressed as an n-gram equi-join against the (small) eval
  gram set — broadcast-joinable at any training-corpus scale.
- **Stratified sampling** (domain/language mixing, e.g. The Pile /
  CCNet): a deterministic per-group Bernoulli gate,
  ``hash(id) mod 1000 < rate_permille(group)``. Hash-based (not rand())
  so the sample is reproducible across runs, engines, and partitionings.

Everything here is JVM-side built-ins on integer counts — no Python
UDFs, no floats — so every operator is oracle-checkable bit-for-bit
and stays inside whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hawk_pack_spark.functions import text as T


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("lang", "doc_id"),
    short_n: int = 2,
    long_n: int = 5,
    top_frac_permille: int = 200,
    dup_frac_permille: int = 100,
) -> DataFrame:
    """Per-document word n-gram repetition metrics (integer-only).

    Returns one row per document: ``max_short`` (count of the most
    frequent short_n-gram), ``n_short`` (total short_n-grams),
    ``dup_long`` (total occurrences of long_n-grams that appear more
    than once), ``n_long`` (total long_n-grams), and ``repetitive``
    (1 when max_short/n_short > top_frac_permille/1000 or
    dup_long/n_long > dup_frac_permille/1000, compared by integer
    cross-multiplication so no floats are involved).

    Scale shape: two explode->groupBy passes keyed by (doc, gram); both
    shuffles are on high-cardinality keys, map-side combined, and the
    result is one row per document. Linear in corpus bytes. (A fused
    single-explode variant tagging grams with their n was measured
    ~2x SLOWER at sf0.1 — array-of-struct construction costs more than
    the second scan branch. A shuffle-free restructure — per-doc
    F.aggregate fold over the array_sort'ed gram array with a
    (prev, run, maxrun, dup) struct accumulator — was also measured
    and REJECTED: 16.8s vs 4.6s at sf0.1; higher-order folds with
    struct accumulators run interpreted per element, losing far more
    than the two map-side-combined shuffles cost. Measured, not
    guessed — and measured with .collect(), because an
    .agg(...).count() probe lets Catalyst prune the aggregate
    expressions away entirely and times an empty plan.)
    """
    ids = [F.col(c) for c in id_cols]

    def gram_stats(n: int, max_alias: str, tot_alias: str, dup_alias: str) -> DataFrame:
        g = docs.select(*ids, F.explode(T.word_ngrams(text_col, n)).alias("gram"))
        per_gram = g.groupBy(*id_cols, "gram").agg(F.count(F.lit(1)).alias("c"))
        return per_gram.groupBy(*id_cols).agg(
            F.max("c").alias(max_alias),
            F.sum("c").alias(tot_alias),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias(
                dup_alias
            ),
        )

    s = gram_stats(short_n, "max_short", "n_short", "_dup_s")
    lg = gram_stats(long_n, "_max_l", "n_long", "dup_long")
    j = s.drop("_dup_s").join(lg.drop("_max_l"), list(id_cols), "left")
    j = j.withColumn("n_long", F.coalesce("n_long", F.lit(0))).withColumn(
        "dup_long", F.coalesce("dup_long", F.lit(0))
    )
    flag = (
        F.col("max_short") * F.lit(1000) > F.col("n_short") * F.lit(top_frac_permille)
    ) | (F.col("dup_long") * F.lit(1000) > F.col("n_long") * F.lit(dup_frac_permille))
    return j.withColumn("repetitive", F.when(flag, F.lit(1)).otherwise(F.lit(0)))


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("lang", "doc_id"),
    n: int = 3,
    min_hits: int = 3,
) -> DataFrame:
    """Flag training documents that share exact word n-grams with an
    evaluation set (GPT-3 App. C decontamination, word-level).

    Returns one row per training document with ``hits`` (number of the
    doc's DISTINCT n-grams that appear anywhere in the eval set) and
    ``contaminated`` (1 when hits >= min_hits).

    Scale shape: the eval gram set is tiny relative to the corpus
    (benchmarks are ~1e5 docs vs ~1e10 training docs), so the join is
    explicitly broadcast — the corpus side never shuffles; the only
    wide op is the per-doc hit count, map-side combined.
    """
    grams = F.explode(F.array_distinct(T.word_ngrams(text_col, n))).alias("gram")
    eval_grams = (
        eval_docs.select(F.explode(F.array_distinct(T.word_ngrams(text_col, n))).alias("gram"))
        .distinct()
    )
    tr = train.select(*[F.col(c) for c in id_cols], grams)
    hits = (
        tr.join(F.broadcast(eval_grams), "gram")
        .groupBy(*id_cols)
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    out = train.select(*id_cols).join(hits, list(id_cols), "left")
    out = out.withColumn("hits", F.coalesce("hits", F.lit(0)))
    return out.withColumn(
        "contaminated",
        F.when(F.col("hits") >= F.lit(min_hits), F.lit(1)).otherwise(F.lit(0)),
    )


def stratified_keep(
    id_col: Column | str,
    group_col: Column | str,
    rates_permille: Mapping[str, int],
    default_permille: int = 100,
    salt: str = "strat",
) -> Column:
    """Deterministic Bernoulli gate: keep iff
    ``hash64(salt || id) mod 1000 < rate_permille(group)``.

    Reproducible across runs/partitionings (pure function of the id),
    engine-portable (md5-based hash64), and exact: the realized rate
    converges to rate_permille/1000 with no RNG state to manage. This is
    how corpus mixing weights are applied at scale — a rand() sample
    changes membership on every retry/replay; a hash gate never does.
    """
    bucket = F.pmod(T.hash64(F.col(id_col).cast("string") if isinstance(id_col, str) else id_col.cast("string"), salt=salt), F.lit(1000))
    rate: Column = F.lit(default_permille)
    for g, p in sorted(rates_permille.items()):
        gc = F.col(group_col) if isinstance(group_col, str) else group_col
        rate = F.when(gc == F.lit(g), F.lit(p)).otherwise(rate)
    return bucket < rate


def quality_features(text_col: str = "text") -> dict[str, Column]:
    """Cheap per-document features for model-based quality filtering:
    all JVM-side column expressions (no n-grams, no Python) so scoring
    a corpus is one codegen'd projection."""
    ts = T.tokens(text_col)
    n = F.size(ts)
    nz = F.greatest(n, F.lit(1)).cast("double")
    return {
        "f_n_tokens": n.cast("double"),
        "f_distinct_ratio": F.size(F.array_distinct(ts)) / nz,
        "f_mean_tok_len": F.aggregate(
            ts, F.lit(0).cast("double"), lambda a, t: a + F.length(t)
        )
        / nz,
    }


def fit_quality_model(
    train: DataFrame,
    label_col: str = "label",
    feature_cols: list[str] | None = None,
    max_iter: int = 25,
):
    """Fit the quality-gate classifier: logistic regression over the
    cheap features — the published second tier of quality filtering
    (GPT-3 App. A; FineWeb) distills expensive/heuristic judgments into
    a linear scorer cheap enough for the full corpus. Training is one
    treeAggregate per LBFGS step (scale-safe); at 100 TB fit on a
    sample and score everything."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.pipeline import Pipeline

    feature_cols = feature_cols or sorted(
        c for c in train.columns if c.startswith("f_")
    )
    asm = VectorAssembler(inputCols=feature_cols, outputCol="features")
    lr = LogisticRegression(
        featuresCol="features", labelCol=label_col, maxIter=max_iter, regParam=0.01
    )
    return Pipeline(stages=[asm, lr]).fit(train)


# engine-portable PII patterns: no lookarounds, no \d/\b shorthand
# differences — the exact same strings compile in Java regex (Spark)
# and RE2 (DuckDB) with identical semantics.
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "phone": r"[0-9]{3}-[0-9]{3}-[0-9]{4}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def scrub_pii(text_col: Column | str) -> tuple[Column, dict[str, Column]]:
    """PII redaction (the CCNet/FineWeb release stage): emails, phone
    numbers, and IPv4 addresses replaced by <TYPE> placeholders.

    Returns (scrubbed text column, {type: per-row match count}). Order
    matters: email first (an email contains dots + digits an ipv4
    pattern could partially claim), then phone, then ipv4 — the counts
    are computed on the SAME intermediate the replacement saw, so
    count and replacement never disagree.

    Pure regexp built-ins — one codegen'd projection over corpus bytes.
    """
    s = T._c(text_col)
    counts: dict[str, Column] = {}
    for name, pat in PII_PATTERNS.items():
        counts[name] = F.size(F.regexp_extract_all(s, F.lit(pat), 0))
        s = F.regexp_replace(s, pat, f"<{name.upper()}>")
    return s, counts


def bigram_lm_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("lang", "doc_id"),
) -> DataFrame:
    """Perplexity filtering (CCNet, Wenzek et al. 2019): score every
    document under an n-gram LM trained on the corpus itself and flag
    the high-perplexity tail. Here an add-1-smoothed bigram model —
    p(b|a) = (c_ab + 1) / (c_a + V) — trained and applied in the same
    dataflow.

    Cross-engine float discipline: each bigram's negative log-prob is
    rounded to integer MICRO-NATS once (round(ln(p) * 1e6)), and all
    downstream aggregation is exact integer summation — ln() is the
    only float op, applied to identical operands in both engines (the
    BM25 oracle established ln bit-parity).

    Returns one row per doc: n_bigrams, sum_lp_micro (total score in
    micro-nats). Scale shape: the model table is the observed-bigram
    count table (vocabulary-sized, not corpus-sized) joined back on the
    gram key; both the training counts and the scoring join are
    map-side-combined shuffles on the gram."""
    ids = [F.col(c) for c in id_cols]
    # materialize the gram stream once: it feeds BOTH the training
    # count and the scoring join below, so the tokenize + 2-gram
    # explode over corpus bytes otherwise runs twice (guide §5)
    g = docs.select(
        *ids, F.explode(T.word_ngrams(text_col, 2)).alias("gram")
    ).localCheckpoint()
    c_ab = g.groupBy("gram").agg(F.count(F.lit(1)).alias("c_ab"))
    uni = docs.select(F.explode(T.tokens(text_col)).alias("tok"))
    # vocabulary-sized; feeds the model join AND the vocab count — and
    # V = COUNT(DISTINCT tok) is exactly this table's row count, so the
    # second corpus-wide unigram pass collapses to a metadata count
    c_a = uni.groupBy("tok").agg(F.count(F.lit(1)).alias("c_a")).localCheckpoint()
    v = c_a.select(F.count(F.lit(1)).alias("v"))
    model = (
        c_ab.withColumn("tok", F.split(F.col("gram"), " ")[0])
        .join(c_a, "tok")
        .crossJoin(F.broadcast(v))
        .select(
            "gram",
            F.round(
                -F.log((F.col("c_ab") + 1) / (F.col("c_a") + F.col("v"))) * 1e6
            )
            .cast("long")
            .alias("lp_micro"),
        )
    )
    return g.join(model, "gram").groupBy(*id_cols).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("lp_micro").alias("sum_lp_micro"),
    )


def clean_text_expr(text_col: Column | str) -> Column:
    """JVM-side text cleanup (one codegen'd projection): strip control
    characters, collapse whitespace runs to single spaces, trim. The
    universal first stage of corpus ingestion; everything downstream
    (tokenization, hashing, dedup) assumes it ran."""
    s = T._c(text_col)
    s = F.regexp_replace(s, r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "")
    s = F.regexp_replace(s, r"\s+", " ")
    return F.trim(s)


def nfc_normalize(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Unicode NFC normalization via Arrow-batched mapInPandas — Spark
    has no built-in NFC, and byte-identical text is what makes exact
    dedup correct across sources that encode the same string as
    composed vs decomposed codepoints (e.g. e+combining-acute vs
    precomposed). Python's unicodedata is the reference implementation;
    batches stream through, nothing collects."""
    import unicodedata

    cols = docs.columns

    def run(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[text_col] = [
                unicodedata.normalize("NFC", t) if t is not None else None
                for t in pdf[text_col]
            ]
            yield pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in docs.schema)
    _ = cols
    return docs.mapInPandas(run, schema)


def sample_to_token_budget(
    docs: DataFrame,
    budget_tokens: int,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-domain token-budget sampling: within each stratum, order the
    docs by a derandomized uniform key (Knuth multiplicative hash of the
    id — same discipline as `weighted_sample`/`stratified_keep`: pure
    function of the id, so a retry, replay, or repartition yields the
    SAME corpus) and keep the longest prefix whose cumulative
    whitespace-token count stays within ``budget_tokens``.

    This is the data-mixing primitive a pretraining pipeline runs after
    the quality gates: "N billion tokens per domain", not "p% of
    documents" — rate-based gates (`stratified_keep`) overshoot on
    domains with long documents, a token budget does not.

    One shuffle (the per-stratum window); the running SUM is a window
    cumulative over docs already sorted by the hash key, so the plan is
    sort + running-total — no self-join, no second scan. Returns the
    kept rows + (n_tokens, cum_tokens) for auditability.
    """
    from hawk_pack_spark.functions.text import token_count

    # Knuth multiplicative hash; id pre-reduced mod 2^31−1 so the
    # product stays in int64 at any id scale (ADVICE r8 — bare id*mult
    # wraps silently past ids ~3.47e9 under ANSI off while the DuckDB
    # oracle diverges). Collisions mod 2^31−1 fall to the id tiebreak.
    mult, mod, premod = 2654435761, 4294967291, 2147483647
    h = ((F.col(id_col).cast("long") % F.lit(premod)) * F.lit(mult)) % F.lit(mod)
    w = Window.partitionBy(stratum_col).orderBy(
        h.asc(), F.col(id_col).asc()
    )
    return (
        docs.withColumn("n_tokens", token_count(F.col(text_col)).cast("long"))
        .withColumn(
            "cum_tokens",
            F.sum("n_tokens").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .where(F.col("cum_tokens") <= F.lit(budget_tokens))
    )


def winsorize(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    lower: float = 0.01,
    upper: float = 0.99,
    out_col: str = "value_winsorized",
    decimals: int = 2,
) -> DataFrame:
    """Per-group percentile winsorization: clip `value_col` into the
    group's [p_lower, p_upper] EXACT percentile band — the standard
    heavy-tail taming pass before a feature enters training (clip,
    don't drop: outlier rows often carry signal in their other
    columns). Returns the input plus `out_col`.

    Percentiles are NEAREST-RANK (the value at position ⌈p·n⌉ of the
    sorted group), NOT interpolated: the clip boundaries are then
    actual data values — exact integers in scaled units — so the
    boundary comparison and the clipped output are engine-identical
    bit for bit. (Interpolated percentiles fall strictly between two
    integers via a float multiply-add whose operand ORDER differs
    between engines — the boundary would be ulp-fuzzy, the exact
    hazard this repo's float discipline exists to kill.)

    Shape: ONE (key, cents) window sort for the ranks, the two
    boundary rows reduce to a per-group pair (same-key groupBy rides
    the window's partitioning), broadcast back. At 100 TB the heavy
    op is the one sort; state is two longs per group.
    """
    unit = 10 ** decimals
    c = F.round(F.col(value_col) * unit).cast("long")
    w = Window.partitionBy(*keys).orderBy(F.col("_c"))
    wn = Window.partitionBy(*keys)
    ranked = (
        df.select(*keys, c.alias("_c"))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
    )
    lo_pos = F.ceil(F.lit(float(lower)) * F.col("_n"))
    hi_pos = F.ceil(F.lit(float(upper)) * F.col("_n"))
    bounds = (
        ranked.where((F.col("_rn") == lo_pos) | (F.col("_rn") == hi_pos))
        .groupBy(*keys)
        .agg(
            F.min(
                F.when(F.col("_rn") == lo_pos, F.col("_c"))
            ).alias("_lo"),
            F.max(
                F.when(F.col("_rn") == hi_pos, F.col("_c"))
            ).alias("_hi"),
        )
    )
    clipped = (
        F.least(F.greatest(c, F.col("_lo")), F.col("_hi")).cast("double")
        / F.lit(float(unit))
    )
    return (
        df.join(F.broadcast(bounds), list(keys))
        .withColumn(out_col, clipped)
        .drop("_lo", "_hi")
    )


def leakage_safe_split(
    docs: DataFrame,
    fractions: tuple[int, int] = (80, 10),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Duplicate-aware train/val/test assignment: documents with
    IDENTICAL content (md5 of the text) always land in the SAME split,
    so an exact duplicate of a training document can never leak into
    validation or test — the split-contamination failure mode
    train/test splits by bare doc hash don't protect against.

    Mechanics: group key = md5(text); the group's representative id is
    its MIN doc_id (one window over the content hash — the same
    canonical-member convention as `neardup_canonical_docs`); the
    split is the representative's Knuth-hash bucket mod 100
    (< fractions[0] → train, < sum → val, else test). Pure function of
    the corpus (derandomized — a retry or repartition yields the same
    split), one shuffle on the content hash, no driver action.

    At 100 TB the window is a (hash)-keyed sort whose groups are
    duplicate clusters (small by construction after upstream dedup);
    the hash itself pre-reduces mod 2^31−1 before the multiply so the
    product stays in int64 at any id scale (the ADVICE r8 rule).

    The id column must be integral (ADVICE r9): a string/uuid id would
    cast to NULL, yield a NULL bucket, and silently drop EVERY document
    into 'test' — so misuse raises here instead. Hash a non-numeric id
    to a long (e.g. ``functions.text.hash64``) before calling.
    """
    id_type = dict(docs.dtypes).get(id_col)
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"leakage_safe_split: id column {id_col!r} has non-integral "
            f"type {id_type!r}; a cast-to-long would NULL out and send "
            "every row to 'test'. Pre-hash it to a long (hash64) first."
        )
    mult, mod, premod = 2654435761, 4294967291, 2147483647
    h = F.conv(F.substring(F.md5(F.col(text_col)), 1, 15), 16, 10).cast("long")
    w = Window.partitionBy("_content_key")
    rep = F.min(F.col(id_col)).over(w)
    bucket = (
        ((F.col("_rep_id").cast("long") % F.lit(premod)) * F.lit(mult))
        % F.lit(mod)
    ) % F.lit(100)
    train_hi, val_hi = fractions[0], fractions[0] + fractions[1]
    return (
        docs.withColumn("_content_key", h)
        .withColumn("_rep_id", rep)
        .withColumn("_bucket", bucket.cast("int"))
        .select(
            F.col(id_col),
            F.col("_rep_id").alias("group_rep_id"),
            F.col("_bucket").alias("bucket"),
            F.when(F.col("_bucket") < train_hi, F.lit("train"))
            .when(F.col("_bucket") < val_hi, F.lit("val"))
            .otherwise(F.lit("test"))
            .alias("split"),
        )
    )


def oov_rate(
    docs: DataFrame,
    vocab_size: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus' own
    top-``vocab_size`` token vocabulary (by total occurrence count,
    ties broken by token — fully deterministic, no sampling): the
    tokenizer-coverage diagnostic run before committing to a vocab
    ("which documents will fragment into bytes"). Returns one row per
    document: n_tokens, n_oov, oov_rate.

    Shape: ONE postings groupBy builds the frequency table; the top-k
    cut is orderBy+limit, which Catalyst plans as
    TakeOrderedAndProject — each partition keeps its own top k and
    only k·partitions rows reach the driver-side merge, never a
    single-partition sort of the full (billions-of-distinct-tokens at
    100 TB) frequency table. The k survivors BROADCAST to the per-doc
    join. OOV fraction is one double division of exact ints.
    """
    from hawk_pack_spark.functions.text import tokens

    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_tok")
    )
    freq = toks.groupBy("_tok").agg(F.count(F.lit(1)).alias("_n"))
    vocab = (
        freq.orderBy(F.col("_n").desc(), F.col("_tok").asc())
        .limit(vocab_size)
        .select("_tok")
    )
    tagged = toks.join(
        F.broadcast(vocab.withColumn("_in", F.lit(1))), "_tok", "left"
    )
    return tagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_oov"),
        F.round(
            F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("oov_rate"),
    )


def domain_token_topp(
    docs: DataFrame,
    p_permille: int = 800,
    quality_col: str = "quality",
    stratum_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Nucleus-style (top-p) per-domain curation: within each stratum,
    keep the HIGHEST-quality documents whose cumulative token mass
    stays within p_permille/1000 of the stratum's total — "the best
    80% of each domain's tokens", the quality-budget dual of
    `sample_to_token_budget`'s absolute budget. Rate-based gates keep
    a fixed fraction of DOCS; this keeps a fixed fraction of TOKENS,
    weighted toward quality.

    Derandomized and exact: docs sort by (quality DESC, id) inside the
    stratum (one window), the running token sum is compared by integer
    cross-multiplication (1000·cum ≤ p·total — no float threshold),
    and the FIRST document of each stratum is always kept (a top-p cut
    that can return an empty domain is a footgun). One shuffle (the
    per-stratum window); totals ride the same groupBy-broadcast join.
    """
    from hawk_pack_spark.functions.text import token_count

    with_n = docs.withColumn(
        "n_tokens", token_count(F.col(text_col)).cast("long")
    )
    totals = with_n.groupBy(stratum_col).agg(
        F.sum("n_tokens").alias("_total")
    )
    w = Window.partitionBy(stratum_col).orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    ranked = (
        with_n.join(F.broadcast(totals), stratum_col)
        .withColumn(
            "cum_tokens",
            F.sum("n_tokens").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("_rn", F.row_number().over(w))
    )
    return ranked.where(
        (F.col("_rn") == 1)
        | (F.lit(1000) * F.col("cum_tokens") <= F.lit(p_permille) * F.col("_total"))
    ).select(
        F.col(id_col),
        F.col(stratum_col),
        F.col(quality_col),
        "n_tokens",
        F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
        F.col("_total").cast("bigint").alias("stratum_tokens"),
    )
