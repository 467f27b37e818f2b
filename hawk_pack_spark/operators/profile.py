"""One-pass table profiling — the stats-collection operator a
large-scale training-data pipeline runs before/after every transform.

Spark-first shape: ALL columns' statistics fold into ONE ``df.agg()``
(one job, one scan; Catalyst prunes the read to exactly the profiled
columns), the same single-stats-job discipline as
``layout.quantize_bounds``. Distinct counts default to
``approx_count_distinct`` (HyperLogLog — mergeable, one pass, the only
sane choice at 100 TB); ``exact_distinct=True`` switches to exact
``countDistinct`` for oracle-parity rows and small tables.

The reference has no profiling surface — superset, in the spirit of
its bench's corpus-stats prints (benches/hnsw.rs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"int", "bigint", "smallint", "tinyint", "double", "float",
            "decimal", "long"}
_INTEGRAL = {"int", "bigint", "smallint", "tinyint", "long"}


def _is_numeric(dtype: str) -> bool:
    return dtype.split("(")[0] in _NUMERIC


def _is_integral(dtype: str) -> bool:
    return dtype.split("(")[0] in _INTEGRAL


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """One row per profiled column:
    (column, n, n_null, n_distinct, min_val, max_val, mean_val).

    min/max are cast to string so heterogeneous column types share one
    schema; mean is NULL for non-numeric columns. The whole profile is
    one aggregate job regardless of column count.
    """
    cols = cols or df.columns
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        if c not in dtypes:
            raise ValueError(f"unknown column {c!r}")
        aggs.append(F.count(F.col(c)).alias(f"{c}__nn"))
        nd = (
            F.countDistinct(F.col(c)) if exact_distinct
            else F.approx_count_distinct(F.col(c))
        )
        aggs.append(nd.alias(f"{c}__nd"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"{c}__min"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"{c}__max"))
        if _is_integral(dtypes[c]):
            # ADVICE r7: F.avg accumulates an integral sum in a double,
            # which rounds (and becomes summation-order dependent) once
            # the running sum passes 2^53 — e.g. SUM(l_orderkey) at
            # sf100. An exact decimal(38,0) SUM divided by the count
            # keeps integer means bit-reproducible at any SF.
            aggs.append(
                F.sum(F.col(c).cast("decimal(38,0)")).alias(f"{c}__sum")
            )
        elif _is_numeric(dtypes[c]):
            aggs.append(F.avg(F.col(c)).alias(f"{c}__mean"))
    wide = df.agg(*aggs)
    # pivot the single wide row into one row per column — an explode of
    # per-column structs over the 1-row frame, no second scan
    rows = []
    for c in cols:
        if _is_integral(dtypes[c]):
            mean = F.round(
                (F.col(f"{c}__sum").cast("double") / F.col(f"{c}__nn")), 6
            )
        elif _is_numeric(dtypes[c]):
            mean = F.round(F.col(f"{c}__mean"), 6)
        else:
            mean = F.lit(None).cast("double")
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n"),
                (F.col("_n") - F.col(f"{c}__nn")).alias("n_null"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_val"),
                F.col(f"{c}__max").alias("max_val"),
                mean.alias("mean_val"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def join_cardinality(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """EXACT size of ``left ⋈ right`` on the key — without running the
    join. One row: n_pairs (Σ_k c_left(k)·c_right(k)), the distinct-key
    overlap split (keys_both / keys_left_only / keys_right_only), and
    the max per-key fan-out on each side (the skew signal an engine
    checks before choosing a join strategy).

    Shape: one groupBy per side reduces each input to (key, count) —
    the full-outer equi-join then moves two counts per DISTINCT key,
    never a data row. This is the planner-side primitive for sizing a
    100 TB join (detects the accidental many-to-many before it
    executes); per-key products accumulate in decimal(38,0) so a
    quadratic blowup is reported, not overflowed. NULL keys never join
    (SQL semantics) and are excluded from both sides.
    """
    lc = (
        left.where(F.col(left_key).isNotNull())
        .groupBy(F.col(left_key).alias("_k"))
        .agg(F.count(F.lit(1)).alias("_cl"))
    )
    rc = (
        right.where(F.col(right_key).isNotNull())
        .groupBy(F.col(right_key).alias("_k"))
        .agg(F.count(F.lit(1)).alias("_cr"))
    )
    j = lc.join(rc, "_k", "full_outer")
    d38 = "decimal(38,0)"
    return j.agg(
        F.sum(
            (F.coalesce(F.col("_cl"), F.lit(0)).cast(d38)
             * F.coalesce(F.col("_cr"), F.lit(0)).cast(d38)).cast(d38)
        ).cast("string").cast("double").alias("n_pairs"),
        F.sum(
            F.when(F.col("_cl").isNotNull() & F.col("_cr").isNotNull(), 1)
            .otherwise(0)
        ).cast("bigint").alias("keys_both"),
        F.sum(F.when(F.col("_cr").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("keys_left_only"),
        F.sum(F.when(F.col("_cl").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("keys_right_only"),
        F.max(F.coalesce(F.col("_cl"), F.lit(0))).cast("bigint").alias("max_left_fanout"),
        F.max(F.coalesce(F.col("_cr"), F.lit(0))).cast("bigint").alias("max_right_fanout"),
    )


def inclusion_profile(
    pairs: list[tuple[DataFrame, str, str, DataFrame, str, str]],
) -> DataFrame:
    """Foreign-key discovery: for each candidate (child column →
    parent column) pair, the inclusion coefficient
    |distinct(child) ∩ distinct(parent)| / |distinct(child)| — 1.0
    means every child value exists in the parent (an FK candidate).
    ``pairs`` entries are (child_df, child_label, child_col,
    parent_df, parent_label, parent_col); returns one row per pair:
    (child, parent, n_child_distinct, n_shared, inclusion).

    Shape: per pair, two DISTINCT reductions and one key join — the
    join moves one row per distinct value, never a data row; the
    profiling cost of an FK hypothesis is two column scans at any
    corpus size. NULLs are excluded on both sides (SQL join
    semantics, matching join_cardinality)."""
    outs = []
    for child, c_label, c_col, parent, p_label, p_col in pairs:
        cd = (
            child.where(F.col(c_col).isNotNull())
            .select(F.col(c_col).alias("_v"))
            .distinct()
        )
        pd_ = (
            parent.where(F.col(p_col).isNotNull())
            .select(F.col(p_col).alias("_v"))
            .distinct()
        )
        shared = cd.join(pd_, "_v", "leftsemi")
        outs.append(
            cd.agg(F.count(F.lit(1)).alias("n_child_distinct"))
            .crossJoin(shared.agg(F.count(F.lit(1)).alias("n_shared")))
            .select(
                F.lit(f"{c_label}.{c_col}").alias("child"),
                F.lit(f"{p_label}.{p_col}").alias("parent"),
                "n_child_distinct",
                "n_shared",
                F.round(
                    F.col("n_shared").cast("double")
                    / F.col("n_child_distinct"),
                    6,
                ).alias("inclusion"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def group_entropy(
    df: DataFrame,
    keys,
    cat_col: str,
) -> DataFrame:
    """Categorical dispersion profile per group: Shannon entropy
    (nats), normalized entropy (÷ ln of the category count), and Gini
    impurity of `cat_col`'s distribution — the label-skew /
    domain-mix diagnostics a curation pipeline checks before and
    after sampling (a domain whose entropy collapsed was over-pruned).

    Shape: ONE (key, category) count reduction, then ONE same-key
    groupBy — map-side partial aggregation on both, group state
    bounded by the category count, no driver action. Float
    discipline: category counts are exact; Gini impurity
    1 − Σcᵢ²/n² uses an exact integer Σc² (one final division);
    entropy needs Σ cᵢ·ln cᵢ, which is folded over the CATEGORY-SORTED
    count list (`aggregate` over `array_sort(collect_list(...))`) so
    the IEEE addition order is deterministic and engine-identical —
    never a shuffle-order float sum — and the result is rounded to
    6 dp on both engines (the repo's LN-parity envelope, as in PMI).
    """
    keys = list(keys)
    counts = (
        df.where(F.col(cat_col).isNotNull())
        .groupBy(*keys, F.col(cat_col).alias("_cat"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    grouped = counts.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_categories"),
        F.sum("_c").cast("bigint").alias("n_rows"),
        F.sum(F.col("_c") * F.col("_c")).cast("bigint").alias("_ss"),
        F.array_sort(F.collect_list(F.struct("_cat", "_c"))).alias("_l"),
    )
    clnc = F.aggregate(
        "_l",
        F.lit(0.0),
        lambda acc, x: acc
        + x["_c"].cast("double") * F.log(x["_c"].cast("double")),
    )
    n = F.col("n_rows").cast("double")
    h = F.log(n) - clnc / n
    return grouped.select(
        *keys,
        "n_categories",
        "n_rows",
        F.round(h, 6).alias("entropy"),
        F.round(
            F.when(F.col("n_categories") > 1, h / F.log(F.col("n_categories").cast("double")))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("norm_entropy"),
        F.round(
            F.lit(1.0) - F.col("_ss").cast("double") / (n * n), 6
        ).alias("gini_impurity"),
    )


def psi_bins(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    n_bins: int = 20,
    decimals: int = 2,
) -> DataFrame:
    """Population Stability Index drift profile between a reference
    and a current snapshot of a numeric column — the standard
    model-monitoring / data-drift diagnostic. Returns ONE ROW PER BIN
    with exact counts, smoothed shares, and the bin's PSI term
    (p − q)·ln(p/q); the headline PSI is their sum (data-level per-bin
    rows are strictly stronger evidence than one pre-summed float).

    Bins are equi-width over the REFERENCE min/max (the convention:
    drift is measured against where the reference lived); current
    values outside the reference range clamp into the edge bins, so
    mass never disappears. Bin assignment runs on exact integer
    scaled units (the histogram discipline). Shares are
    Laplace-smoothed as exact integer ratios (2c+1)/(2n+n_bins) —
    PSI's ln is undefined on empty bins; smoothing keeps every bin
    defined and both engines compute the identical ratio — and each
    term is a single ln/multiply on deterministic inputs, rounded to
    6 dp (the repo's LN-parity envelope). Shape: one 1-row stats agg
    on the reference, then one groupBy per side and a broadcast
    bin-spine join — three reductions, no window, no driver loop.
    """
    unit = 10 ** decimals
    c_ref = F.round(F.col(value_col) * unit).cast("long")
    stats = ref.agg(
        F.min(c_ref).alias("_lo"), F.max(c_ref).alias("_hi")
    )

    def binned(df, side):
        c = F.round(F.col(value_col) * unit).cast("long")
        # exact integer bin math: floor((c-lo)*n_bins/(hi-lo+1)),
        # clamped into [0, n_bins-1] (current values may fall outside
        # the reference range)
        b = F.floor(
            (c - F.col("_lo")) * n_bins / (F.col("_hi") - F.col("_lo") + 1)
        )
        b = F.greatest(F.lit(0), F.least(F.lit(n_bins - 1), b))
        return (
            df.where(F.col(value_col).isNotNull())
            .join(F.broadcast(stats))
            .select(b.cast("int").alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(f"n_{side}"))
        )

    spine = (
        stats.select(
            F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin")
        )
    )
    r = binned(ref, "ref")
    q = binned(cur, "cur")
    # totals ride as broadcast 1-row aggs — no driver action anywhere
    tot_r = ref.where(F.col(value_col).isNotNull()).agg(
        F.count(F.lit(1)).alias("_tr")
    )
    tot_c = cur.where(F.col(value_col).isNotNull()).agg(
        F.count(F.lit(1)).alias("_tc")
    )
    joined = (
        spine.join(r, "bin", "left")
        .join(q, "bin", "left")
        .join(F.broadcast(tot_r))
        .join(F.broadcast(tot_c))
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).cast("bigint").alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).cast("bigint").alias("n_cur"),
            "_tr",
            "_tc",
        )
    )
    p = (2 * F.col("n_ref") + 1).cast("double") / (
        2 * F.col("_tr") + n_bins
    ).cast("double")
    qq = (2 * F.col("n_cur") + 1).cast("double") / (
        2 * F.col("_tc") + n_bins
    ).cast("double")
    return joined.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round(p, 6).alias("p_ref"),
        F.round(qq, 6).alias("p_cur"),
        F.round((p - qq) * F.log(p / qq), 6).alias("psi_term"),
    )


def candidate_keys(df: DataFrame, cols: list[str]) -> DataFrame:
    """Uniqueness / candidate-key profile: one row per column with
    exact row, null, and distinct counts plus the two derived flags a
    schema-discovery pass wants — `is_candidate_key` (distinct ==
    non-null == total) and `uniqueness` (distinct / non-null rows).

    Shape: ONE aggregate over the table. Spark plans the N
    COUNT(DISTINCT) via a single Expand (N× the input rows, map-side
    partially aggregated before the one shuffle) — the same physical
    strategy it uses for any multi-distinct agg, linear in N·rows and
    never a per-column scan. The wide one-row result is unpivoted to
    per-column rows with a literal stack (driver-free). Ratios are one
    double division of exact ints, rounded 6dp.
    """
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).cast("bigint").alias(f"_nn_{c}"))
        aggs.append(
            F.countDistinct(F.col(c)).cast("bigint").alias(f"_nd_{c}")
        )
    one = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args += [
            F.lit(c),
            F.col(f"_nn_{c}"),
            F.col(f"_nd_{c}"),
        ]
    rows = one.select(
        F.col("_n").alias("n_rows"),
        F.stack(
            F.lit(len(cols)), *stack_args
        ).alias("column_name", "n_non_null", "n_distinct"),
    )
    return rows.select(
        "column_name",
        "n_rows",
        (F.col("n_rows") - F.col("n_non_null")).cast("bigint").alias("n_nulls"),
        "n_non_null",
        "n_distinct",
        (
            (F.col("n_distinct") == F.col("n_non_null"))
            & (F.col("n_non_null") == F.col("n_rows"))
        ).alias("is_candidate_key"),
        F.round(
            F.col("n_distinct").cast("double")
            / F.greatest(F.col("n_non_null"), F.lit(1)).cast("double"),
            6,
        ).alias("uniqueness"),
    )


def fd_violations(
    df: DataFrame, determinant: str, dependent: str, max_examples: int = 2
) -> DataFrame:
    """Functional-dependency check `determinant → dependent`: one row
    per determinant value that maps to MORE than one distinct
    dependent value, with the violation size and the `max_examples`
    smallest conflicting dependent values as evidence (deterministic:
    sorted, not sampled). Empty result == the FD holds — the
    schema-mining primitive behind key/hierarchy discovery (Huhtala et
    al., TANE, Comp. J. 1999), run here as a single exact pass.

    Shape: one (determinant, dependent) distinct reduction, one
    same-key groupBy — both map-side combinable; evidence lists are
    bounded by slice(max_examples). No driver action.
    """
    pairs = (
        df.where(F.col(determinant).isNotNull())
        .select(
            F.col(determinant).alias("determinant"),
            F.col(dependent).alias("dependent"),
        )
        .distinct()
    )
    g = pairs.groupBy("determinant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dependents"),
        F.slice(
            F.array_sort(F.collect_list(F.col("dependent").cast("string"))),
            1,
            max_examples,
        ).alias("examples"),
    )
    return g.where(F.col("n_dependents") > 1)


def key_skew_profile(
    df: DataFrame, key_col: str, top_k: int = 10
) -> DataFrame:
    """Join-key skew profiler: the heavy-hitter report run BEFORE a big
    join or groupBy to predict shuffle skew — the diagnostic behind
    "does this key need salting / AQE skew handling". One row per
    top-``top_k`` key by row count with:

    - ``n_rows``  — exact count;
    - ``share_ppm`` — the key's share of all non-null rows in exact
      integer parts-per-million (bigint cross-multiply + integer
      ``div`` — exact while n_rows·1e6 < 2^63, i.e. any real table);
    - ``skew_ratio`` — n_rows over the mean rows-per-key (n·distinct /
      total as one fixed-order double division, rounded): 1.0 means
      perfectly uniform, the two-sided-salting literature's trigger
      zone starts around 10x.

    Shape: ONE (key, count) reduction (map-side combinable), a 1-row
    broadcast total, and a TakeOrdered top-k — never a full sort; the
    report is top_k rows regardless of key cardinality. NULL keys are
    excluded (they never join anyway). Complements join_cardinality
    (which predicts the JOIN's output volume; this predicts the
    shuffle's per-task balance).
    """
    counts = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )
    totals = counts.agg(
        F.sum("n_rows").cast("bigint").alias("_total"),
        F.count(F.lit(1)).cast("bigint").alias("_distinct"),
    )
    top = (
        counts.crossJoin(F.broadcast(totals))
        .orderBy(F.col("n_rows").desc(), F.col("key").asc())
        .limit(top_k)
    )
    return top.select(
        F.col("key").cast("string").alias("key"),
        "n_rows",
        F.expr("(n_rows * CAST(1000000 AS BIGINT)) div _total")
        .cast("bigint")
        .alias("share_ppm"),
        F.round(
            (F.col("n_rows") * F.col("_distinct")).cast("double")
            / F.col("_total").cast("double"),
            6,
        ).alias("skew_ratio"),
    )


# Benford expected first-digit shares log10(1+1/d), d=1..9, as exact
# integer ppm CONSTANTS (hardcoded on both engines rather than computed:
# libm log10 rounding is not contractually identical across engines)
_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def benford_first_digit(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic anomaly/fabrication screen for monetary columns (Nigrini
    1996). Returns one row per digit 1-9: observed count, observed
    share_ppm (exact integer cross-multiplication), expected
    benford_ppm (hardcoded integer constants — libm log10 is not
    engine-contractual), and the absolute deviation.

    Engine-exact digit extraction: the value is captured as integer
    cents (round(v·100)) and the digit is the first character of the
    INTEGER's decimal string — integer-to-string is exact on every
    engine, where double→string formatting and floor(log10(v)) both
    have cross-engine edge cases. The filter is on CENTS > 0, not
    value > 0: values in (0, 0.005) round to 0 cents and would emit a
    spurious digit-0 row (ADVICE r10); sub-cent values are below the
    report's documented cent quantization and are excluded with nulls
    and non-positives. ONE groupBy over 9 groups; nothing wide.
    """
    cents = F.round(F.col(value_col) * 100).cast("bigint")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    counts = (
        df.where(F.col(value_col).isNotNull() & (cents > 0))
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_values"))
    )
    total = counts.agg(F.sum("n_values").cast("bigint").alias("_total"))
    bppm = F.create_map(
        *[F.lit(x) for kv in _BENFORD_PPM.items() for x in kv]
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n_values",
            F.expr("(n_values * CAST(1000000 AS BIGINT)) div _total")
            .cast("bigint")
            .alias("share_ppm"),
            bppm[F.col("digit")].cast("bigint").alias("benford_ppm"),
        )
        .withColumn(
            "deviation_ppm",
            F.abs(F.col("share_ppm") - F.col("benford_ppm")).cast("bigint"),
        )
    )
