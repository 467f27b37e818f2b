"""Text-analysis scalar expressions for the LLM-data-pipeline surface.

All JVM-side built-ins (regexp/split/aggregate) — no Python UDFs — so the
whole text pipeline stays inside whole-stage codegen and scales linearly
with input bytes. Hashing is md5-based (first 60 bits) because md5 is
identical across Spark and DuckDB, which makes every hash-derived
operator oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def _let(val: Column, body) -> Column:
    """Evaluate ``val`` ONCE per row and bind it as a lambda variable in
    ``body`` (r13, guide §4/§1.2). Column expressions have no let-binding,
    and higher-order functions run INTERPRETED: a subtree captured in a
    lambda closure re-evaluates per array ELEMENT, so e.g. word_ngrams'
    `slice(tokens(text), i, n)` re-tokenized the document once per output
    gram — O(tokens²) splits per doc, measured 8x the whole stage. A
    1-element array transform gives the missing let: `array(val)` forces
    one evaluation, the lambda variable is a cheap per-row slot, and
    `element_at(.., 1)` unwraps. Same value, same type, same null
    semantics (array(NULL) passes NULL through the body unchanged)."""
    return F.element_at(F.transform(F.array(val), body), 1)


def hash64(col: Column | str, salt: str = "") -> Column:
    """Deterministic 60-bit hash: BIGINT of the first 15 hex chars of md5.

    Engine-portable (Spark ``conv``/DuckDB hex cast agree), unlike
    ``F.hash``/``F.xxhash64`` which are Spark-private.
    """
    s = _c(col)
    if salt:
        s = F.concat(F.lit(salt), s)
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of lowercased text (empty tokens dropped)."""
    return F.filter(F.split(F.lower(_c(col)), r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: letter runs, digit runs, and punctuation
    singles, like a BPE pre-tokenizer's coarse pass. Lookaround-free
    pattern so the DuckDB (RE2) oracle computes the identical count."""
    return F.size(
        F.regexp_extract_all(F.lower(_c(col)), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), 0)
    )


def rolling_hash(col: Column | str) -> Column:
    """Order-SENSITIVE document fingerprint: polynomial rolling hash over
    the token sequence, acc = (acc*131 + h(tok)) mod (2^31-1). Unlike
    `doc_fingerprint` (set-based), permuted token order changes this."""
    p = F.lit(2147483647).cast("long")
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda acc, t: (acc * F.lit(131) + F.pmod(hash64(t), p)) % p,
    )


def char_ngrams(col: Column | str, n: int = 5) -> Column:
    """All character n-grams (shingles) of the lowercased text.

    Guarded: F.sequence(1, 0) yields a DESCENDING [1,0], not empty, so
    short strings must short-circuit to an empty array. The lowercased
    string is let-bound so the per-gram substr doesn't re-lowercase the
    document per element (see _let)."""

    def gram(s):
        idx = F.sequence(F.lit(1), F.length(s) - (n - 1))
        return F.when(
            F.length(s) >= n, F.transform(idx, lambda i: s.substr(i, F.lit(n)))
        ).otherwise(F.array().cast("array<string>"))

    return _let(F.lower(_c(col)), gram)


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """Word n-grams (space-joined) of the token list. The token array is
    let-bound: captured in the per-gram slice lambda it would re-split
    the document once per OUTPUT GRAM (interpreted HOF closure —
    measured 8x the whole tokenize stage at sf0.1; see _let)."""

    def gram(ts):
        idx = F.sequence(F.lit(0), F.greatest(F.size(ts) - n, F.lit(-1)))
        return F.when(
            F.size(ts) >= n,
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(ts, i + 1, n))),
        ).otherwise(F.array())

    return _let(tokens(col), gram)


def punct_ratio(col: Column | str) -> Column:
    s = _c(col)
    stripped = F.regexp_replace(s, r"[^\p{Punct}]", "")
    return F.length(stripped) / F.greatest(F.length(s), F.lit(1))


def upper_ratio(col: Column | str) -> Column:
    s = _c(col)
    return F.length(F.regexp_replace(s, r"[^A-Z]", "")) / F.greatest(F.length(s), F.lit(1))


def digit_ratio(col: Column | str) -> Column:
    s = _c(col)
    return F.length(F.regexp_replace(s, r"[^0-9]", "")) / F.greatest(F.length(s), F.lit(1))


STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this",
)


def stopword_ratio(col: Column | str) -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    return _let(
        tokens(col),
        lambda ts: F.size(F.filter(ts, lambda t: F.array_contains(sw, t)))
        / F.greatest(F.size(ts), F.lit(1)),
    )


def quality_score(col: Column | str) -> Column:
    """Composite doc-quality heuristic in [0,1]: rewards mid-length docs
    with low punctuation/digit noise and a natural stopword rate."""
    s = _c(col)
    length_score = F.least(F.length(s) / F.lit(500.0), F.lit(1.0))
    noise = punct_ratio(s) + digit_ratio(s)
    noise_score = F.greatest(F.lit(1.0) - F.lit(4.0) * noise, F.lit(0.0))
    sw = stopword_ratio(s)
    sw_score = F.lit(1.0) - F.abs(sw - F.lit(0.4))
    return F.round((length_score + noise_score + sw_score) / F.lit(3.0), 6)


# Deterministic lang-ID: score each language by its marker-token hit count.
# (The fixture corpus is synthetic; the heuristic's value is that the SAME
# rule is expressible in the DuckDB oracle, making lang-ID hash-checkable.)
LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "fr": ("le", "la", "et", "est"),
    "de": ("der", "die", "und", "ist"),
    "es": ("el", "los", "y", "es"),
    "zh": ("de5", "shi4", "le5", "he2"),
}


def lang_id(col: Column | str) -> Column:
    def best_of(ts):
        scores = []
        for lang, markers in LANG_MARKERS.items():
            arr = F.array(*[F.lit(m) for m in markers])
            score = F.size(F.filter(ts, lambda t: F.array_contains(arr, t)))
            scores.append(
                F.struct(score.alias("score"), F.lit(lang).alias("lang"))
            )
        # max_by(lang, score), deterministic lexicographic tie-break on lang
        return F.array_max(F.array(*scores))["lang"]

    # the token array is let-bound: five per-language filters otherwise
    # re-tokenize the document five times per row (see _let)
    return _let(tokens(col), best_of)


def hash_embedding(col: Column | str, dim: int = 32) -> Column:
    """Feature-hashing text vectorizer: dense bag-of-words counts,
    bucket = hash64(token) mod dim. Turns documents into ARRAY<DOUBLE>
    vectors consumable by every vector operator (kNN, LSH, HNSW) with
    no model weights — and exactly reproducible in SQL."""
    # hash each token ONCE (md5 is the expensive part), then count per
    # bucket over the small int array; the bucket array is let-bound —
    # captured in the per-dimension filter it would re-run the md5 pass
    # `dim` times per row (see _let)
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    return _let(
        F.transform(tokens(col), lambda t: F.pmod(hash64(t), F.lit(dim))),
        lambda buckets: F.transform(
            idx,
            lambda i: F.size(F.filter(buckets, lambda b: b == i)).cast("double"),
        ),
    )


def doc_fingerprint(col: Column | str) -> Column:
    """Order-insensitive document fingerprint: 60-bit hash of the sorted
    distinct token set (the exact-dedup key after token normalization)."""
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(col))))
    return hash64(canon)


def readability(col: Column | str) -> dict[str, Column]:
    """Flesch-reading-ease-style readability features from pure column
    algebra (no UDF): whitespace word count, sentence count
    ([.!?] runs, floor 1), heuristic syllable count (per-word vowel
    runs [aeiouy]+, floor 1 per word — the standard approximation),
    and the Flesch score 206.835 − 1.015·(W/S) − 84.6·(Syl/W).

    Every count is an exact integer folded over the DOCUMENT-ORDER
    word list (deterministic, engine-identical); the score is three
    divisions/multiplies of exact ints combined in one fixed
    left-to-right fold, rounded by the caller. Lookaround-free
    patterns so RE2 (DuckDB) and Java regex (Spark) agree.
    """
    s = _c(col)
    ws = tokens(s)
    n_words = F.greatest(F.size(ws), F.lit(1)).cast("bigint")
    n_sentences = F.greatest(
        F.regexp_count(s, F.lit(r"[.!?]+")), F.lit(1)
    ).cast("bigint")
    syl = F.aggregate(
        ws,
        F.lit(0).cast("bigint"),
        lambda acc, w: acc
        + F.greatest(
            F.regexp_count(w, F.lit(r"[aeiouy]+")), F.lit(1)
        ).cast("bigint"),
    )
    score = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sentences.cast("double"))
        - F.lit(84.6) * (syl.cast("double") / n_words.cast("double"))
    )
    return {
        "n_words": n_words,
        "n_sentences": n_sentences,
        "n_syllables": syl.cast("bigint"),
        "flesch": score,
    }
