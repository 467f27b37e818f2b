"""Deduplication operators for the LLM-data-pipeline surface.

Generalizes the reference's dedup-on-ingest (``is_match``/LinearDb,
src/linear_db.rs:17-35 — "insert iff no existing match") from vectors to
documents, at 100 TB scale:

- exact: hash-groupBy, one shuffle, first-id-wins (serial semantics).
- MinHash-LSH: signature → bands → bucket equi-join → verify. The
  candidate join replaces the O(n²) scan; every stage is a built-in.
- SimHash: 60-bit sign-aggregated token-hash code; groupBy code.
- n-gram Jaccard: explode distinct grams → equi-join on gram →
  count-based Jaccard — pairs materialize only when they share a gram.

All hashing is md5-based (`hash64`) so every operator is exactly
reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hawk_pack_spark.functions.text import hash64, tokens
from hawk_pack_spark.operators.materialize import materialize


def exact_dedup(
    df: DataFrame, key: Column | str, id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id row per key group (first-wins, mirroring the
    reference's serial insert order)."""
    key_col = F.col(key) if isinstance(key, str) else key
    w = Window.partitionBy(key_col).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def _distinct_tokens(text_col: str = "text") -> Column:
    return F.array_distinct(tokens(text_col))


def minhash_signature(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
) -> DataFrame:
    """Per-doc MinHash signature: min over the distinct-token set of a
    salted md5-hash, one column per seed (h0..h{n-1}).

    Computed tokens-exploded + single groupBy with n min-aggregates:
    one shuffle regardless of num_hashes."""
    toks = df.select(
        F.col(id_col), F.explode(_distinct_tokens(text_col)).alias("tok")
    )
    aggs = [
        F.min(hash64(F.col("tok"), salt=f"{s}|")).alias(f"h{s}")
        for s in range(num_hashes)
    ]
    return toks.groupBy(id_col).agg(*aggs)


def minhash_bands(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Band the signature: band key = md5 of the concatenated rows.
    Returns (id, band, band_key) exploded — the LSH bucket table."""
    rows_per_band = num_hashes // bands
    parts = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        key = F.md5(F.concat_ws(",", *[c.cast("string") for c in cols]))
        parts.append(F.struct(F.lit(b).alias("band"), key.alias("band_key")))
    return sigs.select(
        F.col(id_col), F.explode(F.array(*parts)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))


def minhash_candidates(
    bands_df: DataFrame, id_col: str = "doc_id", max_bucket: int | None = None
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing any band bucket —
    the equi-join that replaces the all-pairs scan.

    ``max_bucket`` is the 100 TB safety valve: a bucket of b docs emits
    b²/2 pairs, so one degenerate hot bucket (boilerplate, empty docs)
    can dominate the whole job. Buckets larger than the cap are dropped
    before the self-join — standard LSH practice, deterministic, and the
    dropped buckets are exactly the ones whose members near-match almost
    everything (handle them with exact-dedup instead)."""
    if max_bucket is not None:
        # bucket-size cap as a count window over the bucket key — one
        # shuffle on the SAME key the self-join below needs, replacing
        # the former groupBy-sizes + shuffle-join (two shuffles of the
        # band table). COUNT and filter are integer-identical.
        w = Window.partitionBy("band", "band_key")
        bands_df = (
            bands_df.withColumn("_bsize", F.count(F.lit(1)).over(w))
            .where(F.col("_bsize") <= max_bucket)
            .drop("_bsize")
        )
    # materialize the narrow banded table ONCE: both self-join sides
    # (and, uncapped, the size pass) otherwise re-run the whole
    # tokenize+hash signature pipeline per consumer (guide §5).
    bands_df = bands_df.localCheckpoint(eager=True)
    a = bands_df.select(
        F.col(id_col).alias("id_a"), "band", "band_key"
    )
    b = bands_df.select(
        F.col(id_col).alias("id_b"), "band", "band_key"
    )
    return (
        a.join(b, ["band", "band_key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def verify_jaccard(
    candidates: DataFrame,
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.9,
) -> DataFrame:
    """Exact token-set Jaccard on candidate pairs only; keeps pairs with
    jaccard >= threshold. Returns (id_a, id_b, jaccard)."""
    # the pair list is read three times (two id projections + the
    # verify join) — materialize it once; it is candidate-sized
    candidates = candidates.localCheckpoint(eager=True)
    # tokenize ONLY docs that appear in some candidate pair: the
    # semi-join prunes the corpus before the (expensive) tokenize+sort
    # projection, and the checkpointed candidate-sized token table is
    # then read by both join sides without re-scanning the corpus
    # (guide §2: project/filter early, shuffle fewer bytes).
    ids = (
        candidates.select(F.col("id_a").alias(id_col))
        .unionByName(candidates.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    sets_ = df.join(ids, id_col, "leftsemi").select(
        F.col(id_col), F.array_sort(_distinct_tokens(text_col)).alias("ts")
    ).localCheckpoint(eager=True)
    a = sets_.select(F.col(id_col).alias("id_a"), F.col("ts").alias("ts_a"))
    b = sets_.select(F.col(id_col).alias("id_b"), F.col("ts").alias("ts_b"))
    joined = candidates.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("ts_a", "ts_b"))
    union = F.size(F.array_union("ts_a", "ts_b"))
    jac = F.round(inter * F.lit(1.0) / union, 6)
    return (
        joined.select("id_a", "id_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def minhash_near_dup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.9,
    max_bucket: int | None = None,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signature → bands → candidate
    join → exact verify. Set max_bucket at scale (see
    minhash_candidates)."""
    sigs = minhash_signature(df, id_col, text_col, num_hashes)
    cands = minhash_candidates(
        minhash_bands(sigs, id_col, num_hashes, bands), id_col, max_bucket
    )
    return verify_jaccard(cands, df, id_col, text_col, threshold)


SIMHASH_TEXT_BITS = 60  # full width of the portable md5-based hash64


def simhash_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    nbits: int = SIMHASH_TEXT_BITS,
) -> DataFrame:
    """Per-doc SimHash of the distinct token set: bit i is set iff the
    sign-sum of token-hash bit i over the doc's tokens is positive.
    Returns (id, code BIGINT).

    Width is the full 60 bits of the portable hash (a 16-bit code has
    only 65k distinct values — identical-code grouping at corpus scale
    would mass-merge unrelated docs; at 60 bits random collisions are
    ~n²/2⁶⁰). Computed tokens-exploded + one groupBy with nbits
    conditional sums — one shuffle total, all JVM-side; docs with no
    tokens code to 0 (empty sign-sum, every bit negative)."""
    ex = df.select(
        F.col(id_col), F.explode(_distinct_tokens(text_col)).alias("tok")
    ).withColumn("hv", hash64(F.col("tok")))
    aggs = [
        F.sum(
            F.when(
                F.shiftrightunsigned("hv", i).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1))
        ).alias(f"b{i}")
        for i in range(nbits)
    ]
    bits = ex.groupBy(id_col).agg(*aggs)
    code = F.lit(0).cast("long")
    for i in range(nbits):
        code = code + F.when(
            F.col(f"b{i}") > 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    coded = bits.select(F.col(id_col), code.alias("code"))
    return df.select(id_col).join(coded, id_col, "left").select(
        F.col(id_col), F.coalesce("code", F.lit(0).cast("long")).alias("code")
    )


def simhash_groups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    nbits: int = SIMHASH_TEXT_BITS,
) -> DataFrame:
    """Group docs by identical simhash code: (code, n_docs, min_id)."""
    coded = simhash_text(df, id_col, text_col, nbits)
    return coded.groupBy("code").agg(
        F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("min_id")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.01,
    max_df: int | None = None,
) -> DataFrame:
    """Exact word n-gram Jaccard similarity join via gram-explode +
    equi-join: a pair is only materialized when it shares at least one
    gram (at 100 TB: the join key is the gram hash; hot grams are the
    skew risk — AQE skew-join splits them).

    ``max_df`` drops grams whose document frequency exceeds the cap
    before the self-join (a gram in d docs emits d²/2 pairs; ubiquitous
    grams carry no similarity signal anyway — the stop-gram analog of
    stopwords). Capped runs compute Jaccard over the REMAINING gram
    space, still deterministically."""
    ts = tokens(text_col)
    idx = F.sequence(F.lit(1), F.size(ts) - (n - 1))
    grams = F.array_distinct(
        F.when(
            F.size(ts) >= n,
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(ts, i, n))),
        ).otherwise(F.array().cast("array<string>"))
    )
    g0 = df.select(F.col(id_col), F.explode(grams).alias("gram"))
    if max_df is not None:
        keep = (
            g0.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") <= max_df)
            .select("gram")
        )
        g0 = g0.join(keep, "gram")
    sizes = g0.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    g = g0.join(sizes, id_col)
    a = g.select(F.col(id_col).alias("id_a"), F.col("n_grams").alias("na"), "gram")
    b = g.select(F.col(id_col).alias("id_b"), F.col("n_grams").alias("nb"), "gram")
    shared = (
        a.join(b, "gram")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.round(
        F.col("inter") * F.lit(1.0) / (F.col("na") + F.col("nb") - F.col("inter")), 6
    )
    return (
        shared.select("id_a", "id_b", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def semdedup_pairs(
    vectors: DataFrame,
    threshold: float,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    fit_fraction: float | None = None,
) -> DataFrame:
    """Cluster-pruned embedding near-dup — SemDeDup (Abbas et al. 2023,
    arXiv:2303.09540): k-means the embedding space, then look for
    cosine-similar pairs ONLY within each cluster. Near-duplicate
    embeddings land in the same cell with high probability, so the
    O(n²) all-pairs sweep shrinks to Σ|cell|² — with n/k-sized cells
    that is n²/k work, and k grows with the corpus (the paper uses
    ~10⁵ clusters at web scale) keeping per-cell work bounded.

    Per-cell pairs run as one BLAS matmul in an applyInPandas kernel;
    cells fan out across executors (explicit repartition on cluster —
    the AQE-coalescing lesson, NOTES.md). Returns (id_a, id_b, sim)
    with id_a < id_b, sim rounded to 6 — the same output contract as
    the exact `all_pairs_cosine_numpy` verifier, so
    pruned ⊆ exact always holds and recall against exact is the
    quality metric (measured in the catalog summary query).
    """
    import numpy as np
    import pandas as pd

    from hawk_pack_spark.operators.similarity import ivf_build

    assigned, _ = ivf_build(
        vectors,
        n_clusters=n_clusters,
        id_col=id_col,
        vec_col=vec_col,
        seed=seed,
        fit_fraction=fit_fraction,
    )

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "sim": []}).astype(
                {"id_a": "int64", "id_b": "int64", "sim": "float64"}
            )
        ids = pdf[id_col].to_numpy()
        v = np.asarray(list(pdf[vec_col]), dtype=np.float64)
        nrm = np.linalg.norm(v, axis=1)
        nrm[nrm == 0.0] = 1.0
        u = v / nrm[:, None]
        s = u @ u.T
        iu, ju = np.triu_indices(n, k=1)
        sim = np.round(s[iu, ju], 6)
        m = sim >= threshold
        ia, ib = ids[iu[m]], ids[ju[m]]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "sim": sim[m]})

    sel = assigned.select("cluster", F.col(id_col), F.col(vec_col))
    return (
        sel.repartition(n_clusters, "cluster")
        .groupBy("cluster")
        .applyInPandas(pairs, "id_a long, id_b long, sim double")
    )


def edit_distance_join(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_len: int = 32,
    max_dist: int = 2,
) -> DataFrame:
    """Edit-distance self-join (record linkage): pairs of docs whose
    ``prefix_len``-char key is within Levenshtein distance ``max_dist``.

    Candidate generation is the PassJoin pigeonhole scheme: the key is
    split into (max_dist+1) fixed segments; any pair within max_dist
    edits must share at least one segment EXACTLY, appearing in the
    other string shifted by at most max_dist positions (the untouched
    segment's offset moves only by the net insertions/deletions before
    it). One side emits its segments, the other emits every
    (segment-grid position ± max_dist) substring, and candidates are an
    equi-join on (segment, text) — LOSSLESS for full-length keys, so
    the verify step's exact `levenshtein` makes the result identical to
    the brute-force cross join the oracle runs. Keys shorter than
    prefix_len still join through the same clamped grid but without the
    completeness guarantee (document-prefix linkage assumes documents
    of at least prefix_len chars).

    Scale shape: |candidates| tracks genuine near-matches (measured
    22.5k candidates vs 12.5M cross-pairs at 5k docs), the join key is
    an 10-11 char block (AQE splits hot blocks), and the quadratic
    verify never materializes — no cross join anywhere in the plan.
    """
    nseg = max_dist + 1
    base, rem = divmod(prefix_len, nseg)
    lens = [base + (1 if i < rem else 0) for i in range(nseg)]
    pos = [1 + sum(lens[:i]) for i in range(nseg)]
    t = df.select(
        F.col(id_col).alias("_id"),
        F.substring(F.col(text_col), 1, prefix_len).alias("_key"),
    )
    seg_structs = [
        F.struct(F.lit(i).alias("seg"), F.substring("_key", p, L).alias("s"))
        for i, (p, L) in enumerate(zip(pos, lens))
    ]
    probe_structs = [
        F.struct(F.lit(i).alias("seg"), F.substring("_key", p + d, L).alias("s"))
        for i, (p, L) in enumerate(zip(pos, lens))
        for d in range(-max_dist, max_dist + 1)
        if p + d >= 1
    ]
    segs = t.select(
        F.col("_id").alias("id_a"),
        F.col("_key").alias("_ka"),
        F.explode(F.array(*seg_structs)).alias("g"),
    ).select("id_a", "_ka", "g.seg", "g.s")
    probes = t.select(
        F.col("_id").alias("id_b"),
        F.col("_key").alias("_kb"),
        F.explode(F.array(*probe_structs)).alias("g"),
    ).select("id_b", "_kb", "g.seg", "g.s")
    cand = (
        segs.join(probes, ["seg", "s"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "_ka", "_kb")
        .distinct()
    )
    return (
        cand.withColumn("edit_dist", F.levenshtein("_ka", "_kb"))
        .where(F.col("edit_dist") <= max_dist)
        .select("id_a", "id_b", "edit_dist")
    )


def jaccard_prefix_join(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_n: int | None = None,
) -> DataFrame:
    """LOSSLESS set-similarity self-join: every UNORDERED doc pair whose
    token-set Jaccard ≥ ``threshold``, found via prefix filtering
    (PPJoin's candidate scheme, Xiao et al., WWW'08) — the exact
    complement of the approximate MinHash-LSH path. Returns
    (id_a, id_b, jaccard) with id_a < id_b.

    Prefix filter: order every token set by ascending global document
    frequency (rarest first, ties by token); a pair with Jaccard ≥ τ
    must share at least one token inside each side's first
    |s| − ⌈τ·|s|⌉ + 1 tokens under ANY consistent global order — so
    candidates are an equi-join on PREFIX tokens only, and the rare-
    first order makes those prefixes the lowest-frequency tokens in the
    corpus (smallest possible join fan-out). No pair is missed
    (losslessness is the theorem, not a tuning choice).

    Verification is integer-exact: with τ = p/q rational, jac ≥ τ ⇔
    q·|a∩b| ≥ p·(|a|+|b|−|a∩b|) — no float threshold compare, so the
    pair set is bit-identical in any engine; the reported jaccard is
    one double division rounded at the output.

    Scale: df-ordering costs one groupBy over the postings; the
    candidate join is on prefix tokens (fan-out bounded by the df of
    RARE tokens); verification joins the candidate list back to the
    (bounded-width) token arrays. Nothing is ever all-pairs. The
    brute-force oracle, by contrast, is quadratic — the catalog row
    documents it as unscalable and runs spark-only at the 10× gate
    (the ngram_jaccard_uncapped precedent).
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    from fractions import Fraction

    from hawk_pack_spark.functions.text import word_ngrams

    frac = Fraction(threshold).limit_denominator(1_000_000)
    p_num, q_den = frac.numerator, frac.denominator
    # set elements: whitespace tokens, or word n-grams when gram_n is
    # given — on a small shared vocabulary single-token sets saturate
    # (most pairs exceed any threshold) and prefix filtering degrades
    # to all-pairs; n-gram sets restore selectivity (the same reason
    # ngram_jaccard_pairs shingles)
    elems = (
        word_ngrams(F.col(text_col), gram_n)
        if gram_n
        else tokens(F.col(text_col))
    )
    # materialize the per-doc token arrays ONCE: four consumers below
    # (postings explode, sizes, and both verify sides) otherwise each
    # re-run the tokenize + sort + distinct over corpus bytes (guide §5)
    toks = materialize(df.select(
        F.col(id_col).alias("_id"),
        F.array_sort(F.array_distinct(elems)).alias("_ts"),
    ).where(F.size("_ts") > 0))
    posting = toks.select("_id", F.explode("_ts").alias("_tok"))
    dfreq = posting.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    # rare-first rank per doc: sort tokens by (df, token) inside each doc
    ranked = (
        posting.join(dfreq, "_tok")
        .withColumn(
            "_rnk",
            F.row_number().over(
                Window.partitionBy("_id").orderBy("_df", "_tok")
            ),
        )
    )
    sizes = toks.select("_id", F.size("_ts").alias("_sz"))
    # prefix length |s| - ceil(tau*|s|) + 1, integer-exact ceil
    # (materialized once: it feeds BOTH sides of the candidate join)
    pre = materialize(ranked.join(sizes, "_id").where(
        F.col("_rnk")
        <= F.col("_sz") - F.ceil(F.col("_sz") * F.lit(p_num) / F.lit(q_den)) + 1
    ))
    a = pre.select(F.col("_id").alias("_ia"), "_tok")
    b = pre.select(F.col("_id").alias("_ib"), "_tok")
    cand = (
        a.join(b, "_tok")
        .where(F.col("_ia") < F.col("_ib"))
        .select("_ia", "_ib")
        .distinct()
    )
    ta = toks.select(F.col("_id").alias("_ia"), F.col("_ts").alias("_ta"))
    tb = toks.select(F.col("_id").alias("_ib"), F.col("_ts").alias("_tb"))
    inter = F.size(F.array_intersect(F.col("_ta"), F.col("_tb")))
    sa, sb = F.size("_ta"), F.size("_tb")
    verified = (
        cand.join(ta, "_ia")
        .join(tb, "_ib")
        .withColumn("_i", inter)
        .where(
            F.lit(q_den) * F.col("_i")
            >= F.lit(p_num) * (sa + sb - F.col("_i"))
        )
    )
    return verified.select(
        F.col("_ia").alias("id_a"),
        F.col("_ib").alias("id_b"),
        F.round(
            F.col("_i").cast("double") / (sa + sb - F.col("_i")), 6
        ).alias("jaccard"),
    )


def dup_ngram_spans(
    docs: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level duplicated-substring coverage (the Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better" exact-
    substring signal, at word-n-gram granularity): for every document,
    how much of it is covered by an n-gram that also appears in at
    least `min_docs` DISTINCT documents. The per-doc `dup_fraction` is
    the curation gate ("drop or trim documents that are mostly
    boilerplate shared with the rest of the corpus"); near-dup pairs
    light up at fraction ~1.0, templated boilerplate at 0.2-0.6.

    Shape — the MapReduce rendering of suffix-array dedup, linear in
    corpus tokens: (1) explode each doc into (pos, gram-hash) rows
    (fan-out = tokens per doc, the hash is the repo's md5-15-hex
    BIGINT so the shuffle carries 8-byte keys, never 8-token
    strings); (2) ONE gram-keyed groupBy marks grams seen in >=
    min_docs distinct docs (map-side combinable); (3) a semi-join
    keeps duplicated occurrences; (4) ONE per-doc window computes the
    UNION of the [pos, pos+n) intervals with a running-max-end sweep
    (exact integer overlap clipping — overlapping spans never double-
    count). Two shuffles total, both on high-cardinality keys.

    Returns one row per document with >= n tokens: n_tokens, n_grams,
    n_dup_grams, dup_tokens (union-of-spans size), dup_fraction.
    """
    w = tokens(F.col(text_col))
    base = (
        docs.select(F.col(id_col), w.alias("_w"))
        .where(F.size("_w") >= n)
        .select(F.col(id_col), F.size("_w").alias("n_tokens"), F.col("_w"))
    )
    occ = base.select(
        F.col(id_col),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("n_tokens") - n + 1),
                lambda i: F.struct(
                    i.alias("pos"),
                    hash64(F.concat_ws(" ", F.slice("_w", i, F.lit(n)))).alias(
                        "_g"
                    ),
                ),
            )
        ).alias("_o"),
    ).select(F.col(id_col), F.col("_o.pos").alias("pos"), F.col("_o._g").alias("_g"))
    dup = (
        occ.groupBy("_g")
        .agg(F.countDistinct(F.col(id_col)).alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("_g")
    )
    kept = occ.join(dup, "_g", "leftsemi")
    wprev = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_end = F.max(F.col("pos") + n).over(wprev)
    covered = F.greatest(
        F.lit(0),
        F.col("pos") + n - F.greatest(F.col("pos"), F.coalesce(prev_end, F.col("pos"))),
    )
    perdoc = (
        kept.select(F.col(id_col), covered.alias("_c"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_dup_grams"),
            F.sum("_c").cast("bigint").alias("dup_tokens"),
        )
    )
    return base.join(perdoc, id_col, "left").select(
        F.col(id_col),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        (F.col("n_tokens") - n + 1).cast("bigint").alias("n_grams"),
        F.coalesce("n_dup_grams", F.lit(0)).cast("bigint").alias("n_dup_grams"),
        F.coalesce("dup_tokens", F.lit(0)).cast("bigint").alias("dup_tokens"),
        F.round(
            F.coalesce("dup_tokens", F.lit(0)).cast("double")
            / F.col("n_tokens").cast("double"),
            6,
        ).alias("dup_fraction"),
    )


def containment_prefix_join(
    df: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_n: int | None = None,
) -> DataFrame:
    """LOSSLESS directed set-CONTAINMENT join: every ORDERED doc pair
    (a, b), a ≠ b, with |Ta ∩ Tb| / |Ta| ≥ ``threshold`` — "a is
    mostly contained in b", the asymmetric signal Jaccard misses (a
    tweet quoted inside an article has tiny Jaccard but containment
    ~1.0). The quote/subset-dedup primitive a pretraining pipeline
    runs AFTER near-dup clustering.

    Prefix filter (the containment adaptation of PPJoin's scheme,
    Xiao et al. WWW'08): A may miss at most |A| − ⌈τ|A|⌉ of its own
    tokens, so A's first |A| − ⌈τ|A|⌉ + 1 tokens under the global
    rare-first order must hit SOME token of B — the probe side joins
    on PREFIX tokens only, while the indexed side posts ALL tokens
    (asymmetry is inherent: B cannot prune without knowing |A|). No
    pair is missed. Verification is integer-exact (q·|A∩B| ≥ p·|A|
    with τ = p/q), so the pair set is bit-identical in any engine.

    Scale: probe fan-out is bounded by the df of each doc's RAREST
    tokens; the full-postings index side is the same postings table
    every retrieval operator builds. Nothing is all-pairs; the
    brute-force oracle IS quadratic, so the catalog row runs
    spark-only at the 10× gate (the jaccard_docs_lossless precedent).
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    from fractions import Fraction

    from hawk_pack_spark.functions.text import word_ngrams

    frac = Fraction(threshold).limit_denominator(1_000_000)
    p_num, q_den = frac.numerator, frac.denominator
    elems = (
        word_ngrams(F.col(text_col), gram_n)
        if gram_n
        else tokens(F.col(text_col))
    )
    # same materialize-once discipline as jaccard_prefix_join: toks has
    # four consumers (postings, sizes, both verify sides), posting three
    # (dfreq, the ranked prefix cut, the full index side of the join)
    toks = materialize(df.select(
        F.col(id_col).alias("_id"),
        F.array_sort(F.array_distinct(elems)).alias("_ts"),
    ).where(F.size("_ts") > 0))
    posting = materialize(toks.select(
        "_id", F.explode("_ts").alias("_tok")
    ))
    dfreq = posting.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    ranked = posting.join(dfreq, "_tok").withColumn(
        "_rnk",
        F.row_number().over(Window.partitionBy("_id").orderBy("_df", "_tok")),
    )
    sizes = toks.select("_id", F.size("_ts").alias("_sz"))
    pre = ranked.join(sizes, "_id").where(
        F.col("_rnk")
        <= F.col("_sz") - F.ceil(F.col("_sz") * F.lit(p_num) / F.lit(q_den)) + 1
    )
    a = pre.select(F.col("_id").alias("_ia"), "_tok")
    b = posting.select(F.col("_id").alias("_ib"), "_tok")
    cand = (
        a.join(b, "_tok")
        .where(F.col("_ia") != F.col("_ib"))
        .select("_ia", "_ib")
        .distinct()
    )
    ta = toks.select(F.col("_id").alias("_ia"), F.col("_ts").alias("_ta"))
    tb = toks.select(F.col("_id").alias("_ib"), F.col("_ts").alias("_tb"))
    inter = F.size(F.array_intersect(F.col("_ta"), F.col("_tb")))
    sa = F.size("_ta")
    verified = (
        cand.join(ta, "_ia")
        .join(tb, "_ib")
        .withColumn("_i", inter)
        .where(F.lit(q_den) * F.col("_i") >= F.lit(p_num) * sa)
    )
    return verified.select(
        F.col("_ia").alias("id_a"),
        F.col("_ib").alias("id_b"),
        F.col("_i").cast("bigint").alias("n_common"),
        F.size("_ta").cast("bigint").alias("size_a"),
        F.round(F.col("_i").cast("double") / sa.cast("double"), 6).alias(
            "containment"
        ),
    )


def cosine_prefix_join(
    df: DataFrame,
    threshold: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_n: int | None = None,
) -> DataFrame:
    """LOSSLESS all-pairs WEIGHTED cosine similarity self-join (Bayardo
    et al., "Scaling Up All Pairs Similarity Search", WWW'07): every
    unordered doc pair whose tf-idf unit-vector cosine ≥ ``threshold``
    — the frequency-aware complement of jaccard_prefix_join (set
    semantics) and the exact complement of the MinHash/SimHash
    approximate paths. Returns (id_a, id_b, cosine) with id_a < id_b.

    Prefix filter (the losslessness argument): order every doc's terms
    by a global canonical order (df ascending, term ascending — rare
    first, so prefixes are the most selective tokens). With unit
    weights u_i, call a term TAIL when the canonical-order suffix norm²
    starting at it is < τ (strict). A pair sharing ONLY tail∩tail
    terms has sim ≤ ‖tail_x‖·‖tail_y‖ < √τ·√τ = τ (Cauchy-Schwarz,
    strict) — so generating candidates as PREFIX-postings ⋈ FULL-
    postings on the term (both directions via pair canonicalization)
    misses no qualifying pair. No tuning knob affects correctness.

    Float discipline: idf = ln(N/df) and every product in fixed
    operand order; the doc norm folds over the term-SORTED weight
    list; the verify dot product folds over the term-SORTED shared
    products; per-doc term order for the prefix cut is the unique
    (df, term) total order — every float therefore bit-matches across
    engines, and the ≥ τ boundary compare is deterministic.

    Scale: one postings groupBy (df), one per-doc window (canonical
    rank + running suffix norm — doc-width partitions), the candidate
    equi-join on RARE prefix terms, and a pair-keyed verify join.
    Nothing all-pairs, nothing corpus-wide broadcast except the 1-row
    doc count. The brute-force oracle IS quadratic — the catalog row
    documents it (jaccard_docs_lossless precedent).
    """
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")
    from hawk_pack_spark.functions.text import tokens as _tok
    from hawk_pack_spark.functions.text import word_ngrams as _wng

    # terms: whitespace tokens, or word n-grams when gram_n is given —
    # the jaccard_prefix_join lesson holds for weighted cosine too: on
    # a small shared vocabulary single-token dfs are huge, prefixes
    # stop pruning, and the candidate join saturates (measured: the
    # 10x fixture ran >600s on tokens, seconds on 3-grams)
    elems = _wng(F.col(text_col), gram_n) if gram_n else _tok(F.col(text_col))
    # materialize the tf postings ONCE: dfreq and the idf join below are
    # two separate consumers, so the tokenize + explode + groupBy
    # pipeline otherwise runs per consumer (guide §5; postings-sized,
    # same discipline as `unit` further down)
    tf = materialize(
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(elems).alias("_tok"),
        )
        .groupBy("_id", "_tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_tf"))
    )
    n_docs = df.select(F.col(id_col)).distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("_nd")
    )
    dfreq = tf.groupBy("_tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("_df")
    )
    # w feeds both the norm aggregation and the unit projection — one
    # more materialize-once point (values unchanged; the _w expression
    # and its operand order are identical)
    w = (
        tf.join(dfreq, "_tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "_w",
            F.col("_tf").cast("double")
            * F.log(F.col("_nd").cast("double") / F.col("_df").cast("double")),
        )
        .where(F.col("_w") > 0)  # corpus-universal terms carry no signal
    )
    w = materialize(w)
    norms = (
        w.groupBy("_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("_tok", "_w"))).alias("_l")
        )
        .select(
            "_id",
            F.sqrt(
                F.aggregate(
                    "_l", F.lit(0.0), lambda a, x: a + x["_w"] * x["_w"]
                )
            ).alias("_norm"),
        )
    )
    # materialize the unit postings ONCE: three downstream branches
    # (prefix side + both verify sides) would otherwise each recompute
    # the tokenize + two groupBys — measured as the dominant cost at
    # the 10x gate. The barrier is size-gated (r13, materialize()):
    # localCheckpoint while bounded, lineage-keeping DISK_ONLY persist
    # when the postings table is corpus-sized.
    unit = materialize(w.join(norms, "_id").select(
        "_id", "_tok", "_df", (F.col("_w") / F.col("_norm")).alias("_u")
    ))
    # canonical-desc running suffix norm²: a term is PREFIX iff the
    # suffix norm² including it is >= tau (strict-tail rule above)
    wdesc = Window.partitionBy("_id").orderBy(
        F.col("_df").desc(), F.col("_tok").desc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    pre = unit.withColumn(
        "_rsum", F.sum(F.col("_u") * F.col("_u")).over(wdesc)
    ).where(F.col("_rsum") >= F.lit(threshold))
    a = pre.select(F.col("_id").alias("_pa"), "_tok")
    b = unit.select(F.col("_id").alias("_pb"), "_tok")
    cand = (
        a.join(b, "_tok")
        .where(F.col("_pa") != F.col("_pb"))
        .select(
            F.least("_pa", "_pb").alias("_ia"),
            F.greatest("_pa", "_pb").alias("_ib"),
        )
        .distinct()
    )
    ua = unit.select(
        F.col("_id").alias("_ia"), "_tok", F.col("_u").alias("_ua")
    )
    ub = unit.select(
        F.col("_id").alias("_ib"), "_tok", F.col("_u").alias("_ub")
    )
    dots = (
        cand.join(ua, "_ia")
        .join(ub, ["_ib", "_tok"])
        .groupBy("_ia", "_ib")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct("_tok", (F.col("_ua") * F.col("_ub")).alias("_p"))
                )
            ).alias("_l")
        )
        .select(
            "_ia",
            "_ib",
            F.aggregate("_l", F.lit(0.0), lambda a_, x: a_ + x["_p"]).alias(
                "_sim"
            ),
        )
    )
    return (
        dots.where(F.col("_sim") >= F.lit(threshold))
        .select(
            F.col("_ia").alias("id_a"),
            F.col("_ib").alias("id_b"),
            F.round("_sim", 6).alias("cosine"),
        )
    )
