"""BPE vocabulary training (Sennrich et al. 2016, arXiv:1508.07909) as
distributed dataflow — the tokenizer-training stage of an LLM pipeline.

Key scale fact: BPE trains on the WORD-FREQUENCY table, not the corpus.
The corpus reduces to (word, freq) in one shuffle (vocabulary-sized —
~10M rows at web scale, not ~10T tokens), and every merge round is then
a pair-count aggregation + a symbol-array rewrite over that small
table. Each round: explode adjacent symbol pairs weighted by freq →
groupBy(pair) → argmax (deterministic tie-break: count desc, then
lexicographic) → apply the merge as a left-to-right fold over each
word's symbol array. Only the single winning pair ever reaches the
driver (one row per round); lineage is cut per round (localCheckpoint,
the iterative-plan rule).

The merge application is a pure Catalyst fold (F.aggregate): scanning a
symbol array left-to-right, gluing (a, b) into "ab" for non-overlapping
occurrences — identical semantics to the reference implementation in
the paper. Applying a TRAINED merge table to new text at corpus scale
would use a Pandas-UDF trie instead of k nested folds; training itself
never needs that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hawk_pack_spark.functions.text import tokens

END = "</w>"


def word_freq(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, freq): the one corpus-sized shuffle of training."""
    return (
        docs.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _initial_symbols(w: Column) -> Column:
    """Word → character symbols, last one suffixed with the end-of-word
    marker (the paper's representation)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(w)), lambda i: w.substr(i, F.lit(1))
    )
    return F.concat(
        F.slice(chars, 1, F.size(chars) - 1),
        F.array(F.concat(F.element_at(chars, -1), F.lit(END))),
    )


def _adjacent_pairs(syms: Column) -> Column:
    """[(a, b)] for each adjacent symbol pair (empty for 1-symbol words)."""
    n = F.size(syms)
    idx = F.sequence(F.lit(1), n - 1)
    pair = lambda i: F.struct(  # noqa: E731
        F.element_at(syms, i).alias("a"), F.element_at(syms, i + 1).alias("b")
    )
    return F.when(n >= 2, F.transform(idx, pair)).otherwise(
        F.array().cast("array<struct<a:string,b:string>>")
    )


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping merge of adjacent (a, b) → "ab",
    as a fold: if the accumulator ends with `a` and the next symbol is
    `b`, replace the tail with the glued symbol."""
    glued = a + b
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(glued))),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_freq: int = 2,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn up to ``n_merges`` BPE merges from the corpus.

    Returns (merges, segmented) where merges = [(a, b, pair_freq)] in
    learned order and segmented = the final (w, freq, syms) word table.
    Stops early when no pair reaches ``min_pair_freq`` (the paper's
    stopping rule)."""
    wf = word_freq(docs, text_col)
    syms = wf.select(
        "w", "freq", _initial_symbols(F.col("w")).alias("syms")
    ).localCheckpoint()

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            syms.select("freq", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.col("c").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not best or best[0]["c"] < min_pair_freq:
            break
        a, b, c = best[0]["a"], best[0]["b"], int(best[0]["c"])
        merges.append((a, b, c))
        syms = syms.select(
            "w", "freq", _apply_merge(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint()
    return merges, syms


def train_bpe_reference(
    word_freqs: dict[str, int], n_merges: int, min_pair_freq: int = 2
) -> list[tuple[str, str, int]]:
    """Plain-python oracle mirroring train_bpe exactly (same pair
    counting, same tie-break, same fold semantics) for tests."""
    vocab = {
        w: [*list(w[:-1]), w[-1] + END] if w else [] for w in word_freqs
    }
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            f = word_freqs[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_pair_freq:
            break
        merges.append((a, b, c))
        for w, syms in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            vocab[w] = out
    return merges


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """Apply a trained merge table to a corpus: one row per document
    with its subword sequence and count.

    Production shape: per-word segmentation runs in an Arrow-batched
    mapInPandas kernel with a per-batch memo (corpus words repeat
    heavily — each distinct word segments once per batch), applying
    merges in learned priority order. The k-nested-fold expression
    alternative is O(k) Catalyst nodes per row; the kernel is O(merges
    actually present in the word) with dict lookups.
    """
    import pandas as pd

    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}

    def segment(word: str) -> list[str]:
        syms = [*list(word[:-1]), word[-1] + END] if word else []
        while len(syms) >= 2:
            best_i, best_r = -1, None
            for i, pair in enumerate(zip(syms, syms[1:])):
                r = ranks.get(pair)
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            a, b = syms[best_i], syms[best_i + 1]
            # merge ALL non-overlapping (a,b) left-to-right (paper rule)
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            syms = out
        return syms

    from hawk_pack_spark.functions.text import tokens as _tokens

    base = docs.select(*[F.col(c) for c in id_cols], _tokens(text_col).alias("_ws"))
    out_schema = ", ".join(
        [f"{c} long" for c in id_cols] + ["subwords array<string>", "n_subwords long"]
    )

    def run(batches):
        for pdf in batches:
            memo: dict[str, list[str]] = {}
            rows_sub, rows_n = [], []
            for ws in pdf["_ws"]:
                subs: list[str] = []
                for w in ws:
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = segment(w)
                    subs.extend(got)
                rows_sub.append(subs)
                rows_n.append(len(subs))
            out = pd.DataFrame({c: pdf[c] for c in id_cols})
            out["subwords"] = rows_sub
            out["n_subwords"] = rows_n
            yield out

    return base.mapInPandas(run, out_schema)
