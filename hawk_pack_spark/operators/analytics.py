"""Product-analytics / pipeline-maintenance operators.

Funnel conversion, cohort retention, calendar gap-fill (time-series
resample), mergeable aggregate state (incremental materialized-view
maintenance), derandomized weighted sampling, and z-score outlier
flagging. Every operator is a declarative DataFrame composition — one
shuffle per logical step, co-partitioned on the entity key, no driver
collection, no Python row loop — so each survives a 1000-executor
scale-up unchanged.

Cross-engine float discipline (see queries/catalog.py header): event
values are captured as exact integer cents/micro-units before any
aggregation; derived doubles are produced by identical operand folds in
both engines so comparisons (the z-score gate) are bit-deterministic.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Knuth multiplicative hash constants for the derandomized sampler:
# multiplier is the golden-ratio 32-bit constant, modulus the largest
# 32-bit prime. The id is pre-reduced mod 2^31−1 BEFORE the multiply
# (ADVICE r8): bare id*mult overflows int64 once ids exceed ~3.47e9 —
# Spark (ANSI off) would wrap silently to a negative key while DuckDB
# errors, a parity/determinism hazard at pretraining-corpus scale.
# (id % PREMOD) * mult < 2^62 is exact on both engines; ids that
# collide mod 2^31−1 share a key and fall to the id tiebreak.
_SAMPLE_MULT = 2654435761
_SAMPLE_MOD = 4294967291
_SAMPLE_PREMOD = 2147483647


def funnel(
    df: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-stage conversion funnel: for each prefix of ``stages``,
    the number of users with events matching the stages IN ORDER (stage
    k weakly after the user's earliest completion of stage k-1 —
    formally t_k = min sec of stage-k events with sec ≥ t_{k-1}).

    Returns one row per stage: (stage_idx, stage, n_users) with
    n_users non-increasing; stages nobody reaches still report 0.

    Plan shape: ONE scan of the (stage-filtered) events and ONE shuffle
    — per-user events are collected sorted by (sec, stage_idx) and the
    chained-min recurrence runs as a JVM-side higher-order fold
    (F.aggregate over the sorted array). Processing lower stage indexes
    first at timestamp ties makes the greedy fold EXACTLY the
    chained-min semantics, including the weakly-after equality case.
    Per-user state is the event list (the sessionization boundedness
    argument); a join-chain alternative was measured at k(k+1)/2 scans
    — 10 scans of the source for 4 stages — because AQE union branches
    don't reuse exchanges.
    """
    k = len(stages)
    sec = F.unix_timestamp(F.col(ts_col))
    stage_idx = F.lit(None).cast("int")
    for i, s in reversed(list(enumerate(stages))):
        stage_idx = F.when(F.col(type_col) == s, F.lit(i)).otherwise(stage_idx)
    ev = df.where(F.col(type_col).isin(list(stages))).select(
        F.col(user_col).alias("_u"),
        sec.alias("_s"),
        stage_idx.alias("_j"),
    )
    init = F.array(*[F.lit(None).cast("long") for _ in range(k)])

    def step(st, e):
        return F.transform(
            st,
            lambda t, i: F.when(
                (e["_j"] == i)
                & t.isNull()
                & ((i == F.lit(0)) | F.get(st, i - 1).isNotNull()),
                e["_s"],
            ).otherwise(t),
        )

    per_user = ev.groupBy("_u").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("_s", "_j"))), init, step
        ).alias("_st")
    )
    counts = (
        per_user.select(F.posexplode("_st").alias("_i", "_t"))
        .where(F.col("_t").isNotNull())
        .groupBy("_i")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    spine = (
        df.sparkSession.range(1)
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("_i"),
                            F.lit(i + 1).alias("stage_idx"),
                            F.lit(s).alias("stage"),
                        )
                        for i, s in enumerate(stages)
                    ]
                )
            ).alias("g")
        )
        .select("g.*")
    )
    return (
        spine.join(counts, "_i", "left")
        .select(
            "stage_idx",
            "stage",
            F.coalesce("n_users", F.lit(0).cast("long")).alias("n_users"),
        )
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_s: int = 7 * 86400,
) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-activity
    period (epoch // period_s), counted per (cohort_period,
    period_offset) where they were active again.

    All-integer arithmetic (epoch integer division) so the bucketing is
    engine-exact. Two shuffles: distinct (user, period), then the
    cohort join + final groupBy — both keyed on the user column.
    """
    sec = F.unix_timestamp(F.col(ts_col))
    period = ((sec - (sec % period_s)) / period_s).cast("long")
    up = df.select(F.col(user_col).alias("_u"), period.alias("_p")).distinct()
    firsts = up.groupBy("_u").agg(F.min("_p").alias("_c"))
    return (
        up.join(firsts, "_u")
        .groupBy(
            F.col("_c").alias("cohort_period"),
            (F.col("_p") - F.col("_c")).alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def gapfill_daily(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    measures: Sequence[Column],
    fill: dict[str, object],
) -> DataFrame:
    """Calendar-dense daily resample: every (key, day) combination in
    the table's global [min(day), max(day)] span gets a row; days with
    no events take the neutral element from ``fill`` (alias → literal).

    The day spine is built with sequence()+explode from a 1-row agg (no
    driver round-trip) and BROADCAST against the distinct key set —
    days ≪ keys at scale, so the dense grid costs one broadcast
    nested-loop over the key set, and the only real shuffle is the
    groupBy of the actuals.
    """
    day = F.to_date(F.col(ts_col))
    span = df.agg(F.min(day).alias("_d0"), F.max(day).alias("_d1"))
    days = span.select(F.explode(F.sequence("_d0", "_d1")).alias("day"))
    keys = df.select(*key_cols).distinct()
    grid = keys.crossJoin(F.broadcast(days))
    actual = df.groupBy(*key_cols, day.alias("day")).agg(*measures)
    out = grid.join(actual, [*key_cols, "day"], "left")
    return out.select(
        *key_cols,
        "day",
        *[
            F.coalesce(F.col(a), F.lit(v)).alias(a)
            for a, v in fill.items()
        ],
    )


def resample_ohlc(
    df: DataFrame,
    ts_col: str,
    group_cols: Sequence[str],
    value_col: str,
    tiebreak_col: str,
    bucket: str = "1 hour",
) -> DataFrame:
    """Time-bucket resample with bar semantics: per (group, bucket) the
    open (first value), high, low, close (last value), exact-decimal
    volume sum, and row count. The bar operator behind downsampling any
    high-frequency measure (metrics, trades, sensor feeds) before it
    hits a dashboard or a training pipeline.

    ONE groupBy — open/close ride the same shuffle as min/max via
    ``F.min/max(struct(ts, tiebreak, value))``: struct ordering is
    lexicographic in both Spark and DuckDB, and ``tiebreak_col`` (a
    unique row id) makes first/last DETERMINISTIC even when the 10×
    replicated fixture creates exact ts ties (the session_window
    lesson, NOTES r8 §9). No window function, no second pass; partial
    aggregation happens map-side, so the shuffle carries one struct per
    (group, bucket) per map task at any corpus size.
    """
    bkt = F.window(F.col(ts_col), bucket).start.alias("bucket_start")
    order = F.struct(
        F.col(ts_col).alias("t"),
        F.col(tiebreak_col).alias("i"),
        F.col(value_col).alias("v"),
    )
    return (
        df.groupBy(*group_cols, bkt)
        .agg(
            F.min(order).getField("v").alias("open_v"),
            F.max(F.col(value_col)).alias("high_v"),
            F.min(F.col(value_col)).alias("low_v"),
            F.max(order).getField("v").alias("close_v"),
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("volume"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def histogram(
    df: DataFrame,
    value_col: str,
    bins: int,
    lo: float,
    hi: float,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Equi-width histogram with DENSE bins: every bin index in
    [0, bins) gets a row per group, zero-filled — the fixed-schema
    shape a profiler or drift monitor consumes. Values outside
    [lo, hi) clamp into the edge bins (the standard width_bucket
    overflow convention, minus the two extra buckets).

    Bin arithmetic is one double expression — floor((x-lo)*bins/(hi-lo))
    computed with the same operand order in both engines, so bin
    assignment is bit-deterministic. One groupBy over the data; the
    dense spine is sequence()+explode over the group set, broadcast
    like gapfill_daily's day spine (bins ≪ groups at scale).
    """
    if bins <= 0 or not (hi > lo):
        raise ValueError("need bins > 0 and hi > lo")
    raw = F.floor(
        (F.col(value_col) - F.lit(float(lo)))
        * F.lit(float(bins))
        / F.lit(float(hi) - float(lo))
    )
    bin_ix = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("bigint")
    actual = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*group_cols, bin_ix.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    spine = df.sparkSession.range(bins).select(F.col("id").alias("bin"))
    if group_cols:
        grid = df.select(*group_cols).distinct().crossJoin(F.broadcast(spine))
    else:
        grid = spine
    out = grid.join(actual, [*group_cols, "bin"], "left")
    w = (float(hi) - float(lo)) / float(bins)
    return out.select(
        *group_cols,
        "bin",
        (F.lit(float(lo)) + F.col("bin") * F.lit(w)).alias("bin_lo"),
        (F.lit(float(lo)) + (F.col("bin") + 1) * F.lit(w)).alias("bin_hi"),
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
    )


def trend_slopes(
    df: DataFrame,
    group_cols: Sequence[str],
    x_col: Column,
    y_col: Column,
    x_origin: int = 0,
) -> DataFrame:
    """Per-group ordinary-least-squares trend line (slope, intercept,
    n) in ONE aggregation pass — the closed form
    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) over EXACT integer
    accumulators. ``x_col``/``y_col`` must already be integer-valued
    columns (epoch seconds, micro-units): every Σ is a decimal(38,0)
    sum, so the numerator/denominator are bit-exact at any corpus size
    and the only float ops are the two final divisions — identical
    operand order in any engine (the catalog parity discipline).

    ``x_origin`` shifts x (x − origin) before accumulating: keeps
    x² ~ (time-span)² instead of (epoch)², buying ~18 digits of
    headroom inside the 38-digit accumulator. Slope is per x-unit.

    One shuffle (the groupBy); map-side partial aggregation carries
    five numbers per group per task — the same cost envelope as any
    agg_state row at 100 TB. Groups with a single row or zero x
    variance return NULL slope/intercept (the SQL convention).
    """
    d38 = "decimal(38,0)"
    x = (x_col - F.lit(x_origin)).cast(d38)
    y = y_col.cast(d38)
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast(d38).alias("_n"),
        F.count(x).alias("_nx"),
        F.count(F.when(x.isNotNull() & y.isNotNull(), 1)).alias("_nboth"),
        F.count((x * y).cast(d38)).alias("_nxy"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum((x * y).cast(d38)).alias("_sxy"),
        F.sum((x * x).cast(d38)).alias("_sxx"),
    )
    num = (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast(d38)
    den = (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast(d38)
    # ADVICE r8 (the zscore_outliers guard, applied here too): with ANSI
    # off, decimal(38,0) overflow comes back NULL silently — in the
    # per-row products (x·y exceeding 38 digits shrinks _nxy below the
    # non-null row count), in the sums, or in num/den. Any of those
    # would yield NULL slope/intercept with no error; fail loudly.
    not_overflowed = ~(
        ((F.col("_nx") > 0) & (F.col("_sx").isNull() | F.col("_sxx").isNull()))
        | ((F.col("_nxy") > 0) & F.col("_sxy").isNull())
        | (F.col("_nxy") < F.col("_nboth"))
        | (
            F.col("_sx").isNotNull()
            & F.col("_sy").isNotNull()
            & F.col("_sxy").isNotNull()
            & F.col("_sxx").isNotNull()
            & (num.isNull() | den.isNull())
        )
    )
    agg = agg.where(
        F.assert_true(
            not_overflowed,
            "trend_slopes: decimal(38,0) accumulator overflowed (NULL "
            "sum/product over non-null values) — shift x_origin or "
            "rescale y to shrink the operand envelope",
        ).isNull()
    )
    # decimal → string → double: exact then correctly rounded in both
    # engines (catalog header discipline for wide decimals)
    num_d = num.cast("string").cast("double")
    den_d = den.cast("string").cast("double")
    n_d = F.col("_n").cast("string").cast("double")
    sx_d = F.col("_sx").cast("string").cast("double")
    sy_d = F.col("_sy").cast("string").cast("double")
    slope = F.when(den != 0, num_d / den_d)
    intercept = F.when(den != 0, (sy_d - (num_d / den_d) * sx_d) / n_d)
    return agg.select(
        *group_cols,
        F.col("_n").cast("bigint").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
    )


def top_event_paths(
    df: DataFrame,
    entity_cols: Sequence[str],
    type_col: str,
    order_cols: Sequence[str],
    max_steps: int = 5,
    k: int = 20,
) -> DataFrame:
    """Most frequent event PATHS: per entity (e.g. user-day), the
    ordered sequence of its first ``max_steps`` event types joined with
    '>', counted across entities, top-k by (count desc, path) — the
    "how do users actually move through the product" query behind
    funnel design. Returns (path, n_entities, rank).

    Determinism: the sequence order is the caller's ``order_cols``
    (include a unique tiebreak — the session_window lesson);
    collect_list alone is partition-order-dependent, so the path is
    assembled by sorting struct(step, type) INSIDE the aggregate —
    one groupBy, no second window. The path groupBy is the only
    corpus-wide shuffle; per-entity fan-in is capped at max_steps.
    """
    w = Window.partitionBy(*entity_cols).orderBy(*order_cols)
    stepped = (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_steps)
    )
    paths = stepped.groupBy(*entity_cols).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("_rn").alias("s"), F.col(type_col).alias("t"))
                    )
                ),
                lambda x: x.getField("t"),
            ),
            ">",
        ).alias("path")
    )
    counted = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_entities"))
    from hawk_pack_spark.operators.topk import topk_rows

    return topk_rows(
        counted, [], "n_entities", k, ascending=False, tie_cols=["path"]
    )


def ewma(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    order_cols: Sequence[str],
    alpha: float = 0.5,
    span: int = 8,
) -> DataFrame:
    """Exponentially weighted moving average over the last ``span``
    rows of each group's ordered series (the pandas ``ewm(adjust=True)``
    form on a bounded history): ewma_t = Σ_d w_d·x_{t−d} / Σ_d w_d,
    w_d = (1−α)^d — the smoothing baseline behind drift and anomaly
    monitors. Appends an ``ewma`` column.

    The bounded span UNROLLS into ``span`` lag() calls sharing ONE
    window sort (no per-row list materialization, no higher-order
    function): num and den are two plain column sums, missing history
    at a series head drops out of both (NULL-skip renormalization).
    Weights are exact powers of (1−α); with integer-valued x the sum
    is a deterministic left-to-right double fold — engine-reproducible
    (catalog float discipline), rounded at the output.
    """
    if not (0.0 < alpha < 1.0) or span < 1:
        raise ValueError("need 0 < alpha < 1 and span >= 1")
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    num = None
    den = None
    for d in range(span):
        wt = float((1.0 - alpha) ** d)
        x = F.lag(F.col(value_col), d).over(w)
        t_num = F.when(x.isNotNull(), x * F.lit(wt)).otherwise(F.lit(0.0))
        t_den = F.when(x.isNotNull(), F.lit(wt)).otherwise(F.lit(0.0))
        num = t_num if num is None else num + t_num
        den = t_den if den is None else den + t_den
    return df.withColumn("ewma", F.round(num / den, 6))


def agg_state(
    df: DataFrame, keys: Sequence[str], value_col: str, scale: int = 2
) -> DataFrame:
    """Mergeable aggregate state (count / exact-decimal sum / min / max)
    for one measure — the materialized-view maintenance primitive.
    Maintaining a 100 TB rollup then costs one pass over the DELTA plus
    a state-sized merge, never a base-table rescan.
    """
    v = F.col(value_col)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(v.cast(f"decimal(18,{scale})")).alias("_sum"),
        F.min(v).alias("_min"),
        F.max(v).alias("_max"),
    )


def merge_agg_states(states: Sequence[DataFrame], keys: Sequence[str]) -> DataFrame:
    """Combine aggregate states: counts and sums add, min/max fold.
    Union + one state-sized groupBy (states are |groups| rows, not
    |rows| — the merge never touches base data)."""
    u = reduce(lambda a, b: a.unionByName(b), states)
    return u.groupBy(*keys).agg(
        F.sum("_n").alias("_n"),
        F.sum("_sum").alias("_sum"),
        F.min("_min").alias("_min"),
        F.max("_max").alias("_max"),
    )


def finalize_agg(state: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Render a state into the user-facing aggregate row (the engine-
    parity float discipline: exact decimal sum → double, avg as one
    double division of the exact operands)."""
    return state.select(
        *keys,
        F.col("_n").alias("n_rows"),
        F.col("_sum").cast("double").alias("sum_value"),
        F.col("_min").alias("min_value"),
        F.col("_max").alias("max_value"),
        F.round(F.col("_sum").cast("double") / F.col("_n"), 6).alias("avg_value"),
    )


def weighted_sample(
    df: DataFrame, n: int, id_col: str, weight_col: str
) -> DataFrame:
    """Efraimidis–Spirakis A-ES weighted sampling WITHOUT replacement,
    derandomized: each row's uniform draw u comes from a Knuth
    multiplicative hash of its id, so the sample is reproducible across
    engines, retries, and cluster re-runs — the property a training-
    data mixing pipeline actually needs (re-running the job yields the
    same corpus, and the inclusion probability stays proportional to
    the weight for n ≪ N).

    A-ES key: u^(1/w) taken max-first ≡ ln(u)/w descending (monotone
    transform, no pow). Global top-n by key is a TakeOrdered — no full
    sort is materialized. Ties (hash collisions with equal weights)
    break on the id for full determinism.
    """
    h = (
        (F.col(id_col).cast("long") % F.lit(_SAMPLE_PREMOD))
        * F.lit(_SAMPLE_MULT)
    ) % F.lit(_SAMPLE_MOD)
    u = (h + F.lit(1)).cast("double") / F.lit(float(_SAMPLE_MOD + 1))
    key = F.log(u) / F.col(weight_col)
    return (
        df.withColumn("_aes", key)
        .orderBy(F.col("_aes").desc(), F.col(id_col).asc())
        .limit(n)
        .drop("_aes")
    )


def zscore_outliers(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    z: float = 2.5,
    decimals: int = 2,
) -> DataFrame:
    """Per-group z-score outlier flag with bit-deterministic arithmetic:
    values are captured as exact scaled integers (10^decimals units),
    the group's (n, Σv, Σv²) are aggregated as exact decimals small
    enough to convert to double losslessly (< 2^53 at every SF this
    repo gates), and mean/variance/σ derive from those identical
    doubles with one shared operand fold — so the |v−μ| > z·σ gate
    selects the exact same rows in any engine, even at the boundary.

    One shuffle (the group agg, broadcast back over the group key).
    Returns the input rows flagged as outliers.
    """
    unit = 10 ** decimals
    c = F.round(F.col(value_col) * unit).cast("decimal(19,0)")
    stats = (
        df.select(*keys, c.alias("_c"))
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("_gn"),
            F.count("_c").alias("_gnn"),
            F.sum("_c").cast("double").alias("_gs"),
            F.sum((F.col("_c") * F.col("_c")).cast("decimal(38,0)"))
            .cast("double")
            .alias("_gss"),
        )
    )
    # ADVICE r7: with ANSI off, a decimal(38,0) sum OVERFLOW comes back
    # NULL silently, which would make σ NULL and the operator return
    # zero outliers with no error. A NULL sum alongside non-null values
    # can only be overflow — fail loudly instead of silently-empty.
    # (A group whose values are ALL NULL keeps NULL sums legitimately
    # and never matches the |v−μ| gate, same as before.)
    not_overflowed = ~(
        (F.col("_gnn") > 0)
        & (F.col("_gs").isNull() | F.col("_gss").isNull())
    )
    stats = stats.where(
        F.assert_true(
            not_overflowed,
            "zscore_outliers: decimal stats overflowed (NULL sum over "
            "non-null values) — lower `decimals` or the per-group "
            "value-magnitude envelope",
        ).isNull()
    )
    mean = F.col("_gs") / F.col("_gn")
    var = F.col("_gss") / F.col("_gn") - mean * mean
    joined = df.withColumn("_c", c).join(F.broadcast(stats), list(keys))
    return (
        joined.where(
            F.abs(F.col("_c").cast("double") - mean) > F.lit(z) * F.sqrt(var)
        )
        .drop("_c", "_gn", "_gnn", "_gs", "_gss")
    )


def scd2(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    attr_cols: Sequence[str],
    valid_from_col: str | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension history from a change log: one
    row per (key, state change) with [valid_from, valid_to) bounds,
    valid_to NULL on the current state. Consecutive rows whose tracked
    attributes are unchanged collapse into one interval (null-safe
    compare, so NULL→NULL is "no change").

    ``order_cols`` must be a deterministic total order per key (e.g.
    (ts, event_id)); ``valid_from_col`` defaults to the first order
    column. Two window passes over the same (key, order) sort — Spark
    reuses the sort, so the operator costs ONE shuffle.
    """
    from operator import or_

    vf = valid_from_col or order_cols[0]
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c) for c in order_cols])
    first = F.row_number().over(w) == 1
    diffs = [~F.col(a).eqNullSafe(F.lag(a).over(w)) for a in attr_cols]
    change = first | reduce(or_, diffs)
    ch = df.withColumn("_chg", change).where(F.col("_chg"))
    w2 = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c) for c in order_cols]
    )
    return ch.select(
        *key_cols,
        *attr_cols,
        F.col(vf).alias("valid_from"),
        F.lead(vf).over(w2).alias("valid_to"),
    )


def rolling_median(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    window_rows: int = 10,
    decimals: int = 2,
) -> DataFrame:
    """Per-key rolling EXACT median of the trailing ``window_rows``
    rows (current row inclusive) — the robust smoother for monitoring
    feeds where one spike should not drag a mean. Appends
    ``rolling_median`` to the input rows.

    Bit-deterministic across engines: values are captured as integer
    cents (round(v·10^decimals)), and both Spark's `percentile` and
    DuckDB's `median` interpolate the even-count middle as (a+b)/2 of
    exact integers in double — identical at every boundary. The output
    is med/10^decimals with NO rounding: IEEE-754 division of
    identical doubles is bit-deterministic across engines, while
    ROUND implementations are not (the catalog float discipline).

    ONE shuffle (the per-key window sort); state per row is the
    trailing ``window_rows`` frame, bounded by construction — no
    group ever materializes whole beyond the sort Spark already does.
    ``order_cols`` must include a unique tiebreak (the sessionization
    lesson: a ts-only order is nondeterministic under ties).
    """
    unit = 10 ** decimals
    c = F.round(F.col(value_col) * unit).cast("long")
    w = (
        Window.partitionBy(*keys)
        .orderBy(*[F.col(o).asc() for o in order_cols])
        .rowsBetween(-(window_rows - 1), Window.currentRow)
    )
    med = F.percentile(F.col("_c"), F.lit(0.5)).over(w)
    return (
        df.withColumn("_c", c)
        .withColumn("rolling_median", med / unit)
        .drop("_c")
    )


def mad_outliers(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    k: float = 3.0,
    decimals: int = 2,
) -> DataFrame:
    """Per-group ROBUST outlier flag: |v − median| > k · MAD, where
    MAD is the median absolute deviation — immune to the masking that
    breaks z-scores when the outliers themselves inflate σ (a planted
    10× spike raises stddev enough to hide a 5× one; the median
    moves by at most one rank). Returns the flagged input rows.

    Exactness: values are integer cents; medians come from the EXACT
    `percentile` aggregate (not approx_percentile), so deviations are
    exact integers-or-half-integers in double and the k·MAD boundary
    comparison is engine-identical. MAD is inherently two-pass
    (deviations need the median first): two shuffles on the same
    group key, each carrying (key, cents) only — at 100 TB both
    passes are plain partial-aggregated groupBys, and the per-group
    state of `percentile` is value-distinct-bounded (cents over a
    monitoring envelope), the same envelope zscore_outliers documents.
    """
    unit = 10 ** decimals
    c = F.round(F.col(value_col) * unit).cast("long")
    vals = df.select(*keys, c.alias("_c"))
    med = vals.groupBy(*keys).agg(
        F.percentile(F.col("_c"), F.lit(0.5)).alias("_med")
    )
    mad = (
        vals.join(med, list(keys))
        .select(*keys, F.abs(F.col("_c") - F.col("_med")).alias("_dev"))
        .groupBy(*keys)
        .agg(F.percentile(F.col("_dev"), F.lit(0.5)).alias("_mad"))
    )
    stats = med.join(mad, list(keys))
    return (
        df.withColumn("_c", c)
        .join(stats, list(keys))
        .where(
            (F.col("_mad") > 0)
            & (F.abs(F.col("_c") - F.col("_med")) > F.lit(k) * F.col("_mad"))
        )
        .drop("_c", "_med", "_mad")
    )


def time_weighted_avg(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    order_cols: Sequence[str] = (),
    decimals: int = 2,
) -> DataFrame:
    """Per-group time-weighted average (TWAP): Σ(vᵢ·Δtᵢ)/ΣΔtᵢ where
    Δtᵢ is the seconds the i-th observation was "in force" (until the
    next observation in the same group). A plain AVG over irregular
    samples over-weights bursts; TWAP is the standard fix for sensor /
    market / metric rollups.

    ONE window sort per group for the `lead` + ONE groupBy on the same
    key — Spark reuses the partitioning, so the operator is one
    shuffle. Values are captured as exact scaled integers and the
    weighted sum is an exact decimal(38,0) (guarded against silent
    NULL-on-overflow, the zscore_outliers discipline); the single
    final division is the only float op, identical in any engine.
    The last observation of a group has no successor → zero weight,
    exactly as in the standard left-continuous step integral.
    """
    unit = 10 ** decimals
    order = list(order_cols) or [ts_col]
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order])
    c = F.round(F.col(value_col) * unit).cast("decimal(19,0)")
    # timestamps carry microseconds: weigh in EXACT integer micros
    # (unix_micros ≡ DuckDB epoch_us) — a seconds cast would floor on
    # one engine and round on the other; the unit cancels in the ratio
    ts_dtype = dict(df.dtypes).get(ts_col, "")
    t = (
        F.unix_micros(F.col(ts_col))
        if ts_dtype.startswith("timestamp")
        else F.col(ts_col).cast("long")
    )
    dt = (F.lead(t).over(w) - t).cast("decimal(19,0)")
    step = df.select(
        *keys,
        (c * dt).cast("decimal(38,0)").alias("_vdt"),
        dt.alias("_dt"),
    )
    agg = step.groupBy(*keys).agg(
        F.count("_dt").alias("_n"),
        F.sum("_vdt").cast("double").alias("_svdt"),
        F.sum("_dt").cast("double").alias("_sdt"),
    )
    not_overflowed = ~(
        (F.col("_n") > 0)
        & (F.col("_svdt").isNull() | F.col("_sdt").isNull())
    )
    agg = agg.where(
        F.assert_true(
            not_overflowed,
            "time_weighted_avg: decimal accumulator overflowed (NULL "
            "sum over non-null steps) — lower `decimals` or shorten "
            "the per-group time envelope",
        ).isNull()
    )
    return agg.where(F.col("_sdt") > 0).select(
        *keys,
        (F.col("_svdt") / F.col("_sdt") / F.lit(float(unit))).alias("twap"),
    )


def interpolate_linear(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    out_col: str = "value_filled",
) -> DataFrame:
    """Per-group linear interpolation of missing (NULL) values between
    the nearest non-null neighbors in sequence order; leading/trailing
    gaps (no anchor on one side) stay NULL. The sensor-series /
    feature-backfill companion to gapfill_daily (which fills missing
    ROWS; this fills missing VALUES).

    Anchors are located with running MAX(CASE WHEN observed THEN rn)
    windows — the engine-portable rendering of LAST_VALUE IGNORE
    NULLS — one forward and one reverse pass. Plan (verified): ONE
    Exchange on the group key; the forward windows share the first
    in-partition sort, the reverse pass re-sorts within partitions
    (no second shuffle).
    The interpolation weight is an exact integer ratio of row offsets;
    with values captured in integer cents the output is a single
    float multiply-add per row, engine-identical.
    """
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_bwd = (
        Window.partitionBy(*keys)
        .orderBy(*[F.col(c).desc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rn = F.row_number().over(
        Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_cols])
    )
    v = F.col(value_col)
    base = df.withColumn("_rn", rn).withColumn(
        "_obs_rn", F.when(v.isNotNull(), F.col("_rn"))
    )
    stepped = (
        base.withColumn("_prev_rn", F.max("_obs_rn").over(w_fwd))
        .withColumn("_prev_v", F.last(v, ignorenulls=True).over(w_fwd))
        .withColumn("_next_rn", F.min("_obs_rn").over(w_bwd))
        .withColumn("_next_v", F.last(v, ignorenulls=True).over(w_bwd))
    )
    frac = (
        (F.col("_rn") - F.col("_prev_rn")).cast("double")
        / (F.col("_next_rn") - F.col("_prev_rn")).cast("double")
    )
    filled = F.when(v.isNotNull(), v).otherwise(
        F.when(
            F.col("_prev_rn").isNotNull() & F.col("_next_rn").isNotNull(),
            F.col("_prev_v")
            + (F.col("_next_v") - F.col("_prev_v")) * frac,
        )
    )
    return stepped.withColumn(out_col, filled).drop(
        "_rn", "_obs_rn", "_prev_rn", "_prev_v", "_next_rn", "_next_v"
    )


def skyline_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    extra_cols: Sequence[str] = (),
    max_window_pairs: int | None = None,
) -> DataFrame:
    """2-D skyline (Pareto frontier), minimizing both dimensions: the
    distinct (x, y) pairs not dominated by any other pair (a dominates
    b iff a.x ≤ b.x ∧ a.y ≤ b.y with at least one strict). The classic
    price/size trade-off query (Börzsönyi et al., ICDE'01) — naive
    form is an O(n²) NOT-EXISTS self-join; this is the sort-based
    linear form.

    Shape: dedupe to distinct pairs, keep the min-y per x (same-x
    domination), then ONE global sort by x with a running strict min
    of y over preceding x's — a pair survives iff its y beats every
    y at a smaller x. The global window is over the post-aggregation
    pair set (≤ |distinct x|), not the corpus; at 100 TB the corpus
    never leaves its partitions except the (x, min y) reduction.
    ``extra_cols`` are carried via a semi-join of the frontier back
    onto the distinct input projection. Cardinality-dispatched
    (VERDICT r10 #5): when the pair frame exceeds ``max_window_pairs``
    the running prefix min routes through the two-phase
    range-partitioned form (`_prefix_min_two_phase`) — min is
    order-insensitive, so the paths are exactly equivalent.
    """
    threshold = (
        _GLOBAL_WINDOW_THRESHOLD
        if max_window_pairs is None
        else max_window_pairs
    )
    pairs = (
        df.select(
            F.col(x_col).alias("_x"), F.col(y_col).alias("_y")
        )
        .groupBy("_x")
        .agg(F.min("_y").alias("_y"))
    )
    pairs = _materialize(pairs)
    if _exceeds_rows(pairs, threshold):
        marked = _prefix_min_two_phase(pairs)
    else:
        w = (
            Window.orderBy("_x")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        marked = pairs.withColumn("_prev_min_y", F.min("_y").over(w))
    frontier = (
        marked
        .where(
            F.col("_prev_min_y").isNull()
            | (F.col("_y") < F.col("_prev_min_y"))
        )
        .select(
            F.col("_x").alias(x_col), F.col("_y").alias(y_col)
        )
    )
    if not extra_cols:
        return frontier
    proj = df.select(x_col, y_col, *extra_cols).dropDuplicates()
    return proj.join(F.broadcast(frontier), [x_col, y_col], "leftsemi")


def cusum_flags(
    df: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    allowance: float,
    threshold: float,
    decimals: int = 2,
) -> DataFrame:
    """Per-group one-sided CUSUM change-point flags (Page 1954): flag
    the rows where S⁺ᵢ = max(0, S⁺ᵢ₋₁ + (vᵢ − μ − allowance)) exceeds
    `threshold`, with μ the group mean — the standard sequential
    detector for a sustained upward level shift (the symmetric
    downward side is the same call on −v).

    The recurrence LOOKS sequential, but max(0, ·) prefix recursion
    has a closed window form: with cᵢ = vᵢ − μ − allowance and
    Cᵢ = Σc₁..cᵢ, S⁺ᵢ = Cᵢ − min(0, C₁..Cᵢ₋₁ minimum) — a cumulative
    sum minus a running minimum, TWO passes over ONE (key, order)
    window sort. All state is exact integer cents scaled by the group
    size (μ = Σv/n is kept as the exact pair (Σv, n): comparisons are
    done on n-scaled integers so no float division ever enters the
    flag decision — the gate is bit-deterministic in any engine).
    One groupBy for (Σv, n) + one window pass: two shuffles total.
    """
    unit = 10 ** decimals
    c = F.round(F.col(value_col) * unit).cast("decimal(19,0)")
    vals = df.withColumn("_c", c)
    stats = vals.groupBy(*keys).agg(
        F.sum("_c").cast("decimal(38,0)").alias("_sv"),
        F.count("_c").alias("_n"),
    )
    not_overflowed = ~((F.col("_n") > 0) & F.col("_sv").isNull())
    stats = stats.where(
        F.assert_true(
            not_overflowed,
            "cusum_flags: decimal sum overflowed — lower `decimals`",
        ).isNull()
    )
    # n-scaled integer step: n·cᵢ = n·vᵢ − Σv − n·allowance (exact)
    joined = vals.join(F.broadcast(stats), list(keys))
    step = (
        (F.col("_c") * F.col("_n")).cast("decimal(38,0)")
        - F.col("_sv")
        - F.round(F.lit(allowance) * unit).cast("decimal(19,0)")
        * F.col("_n")
    ).cast("decimal(38,0)")
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c_) for c_ in order_cols]
    )
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    cum = F.sum("_step").over(w)
    with_cum = joined.withColumn("_step", step).withColumn("_cum", cum)
    # S⁺ᵢ = Cᵢ − min(0, C₁..Cᵢ) — including Cᵢ itself in the running
    # min makes the closed form exact for EVERY row (max(0,·) clamps
    # to 0 exactly when Cᵢ is the new minimum), not only flagged ones.
    run_min = F.least(
        F.lit(0).cast("decimal(38,0)"),
        F.min("_cum").over(w_run),
    )
    s_plus = F.col("_cum") - run_min
    thresh = (
        F.round(F.lit(threshold) * unit).cast("decimal(38,0)")
        * F.col("_n")
    )
    return (
        with_cum.withColumn("_s_plus", s_plus)
        .where(F.col("_s_plus") > thresh)
        .withColumn(
            "cusum",
            (
                F.col("_s_plus").cast("double")
                / F.col("_n").cast("double")
                / F.lit(float(unit))
            ),
        )
        .drop("_c", "_sv", "_n", "_step", "_cum", "_s_plus")
    )


def gini_concentration(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    decimals: int = 2,
) -> DataFrame:
    """Per-group Gini concentration coefficient over non-negative
    values (revenue-concentration / load-imbalance profiling):
    G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) with xᵢ ascending, i = 1..n —
    0 = perfectly even, →1 = one member holds everything.

    ONE window sort per group (the ascending rank) + ONE groupBy on
    the same key. Accumulators are exact decimal(38,0) over integer
    cents (rank·cents stays well under 2^127 for any gated SF;
    silent-NULL overflow guarded as everywhere); the two final
    divisions are the only float ops. Ties get deterministic ranks
    (value, then input order is irrelevant: Σ i·xᵢ over tied equal
    values is permutation-invariant, so ANY total order yields the
    same G — documented so the missing tiebreak is provably safe).
    """
    unit = 10 ** decimals
    c = F.round(F.col(value_col) * unit).cast("decimal(19,0)")
    w = Window.partitionBy(*keys).orderBy(F.col("_c"))
    ranked = df.select(*keys, c.alias("_c")).withColumn(
        "_i", F.row_number().over(w).cast("decimal(19,0)")
    )
    agg = ranked.groupBy(*keys).agg(
        F.count("_c").alias("_n"),
        F.sum("_c").cast("decimal(38,0)").alias("_sx"),
        F.sum((F.col("_i") * F.col("_c")).cast("decimal(38,0)")).alias(
            "_six"
        ),
    )
    not_overflowed = ~(
        (F.col("_n") > 0)
        & (F.col("_sx").isNull() | F.col("_six").isNull())
    )
    agg = agg.where(
        F.assert_true(
            not_overflowed,
            "gini_concentration: decimal accumulator overflowed — "
            "lower `decimals`",
        ).isNull()
    )
    num = (
        F.lit(2).cast("decimal(38,0)") * F.col("_six")
        - (F.col("_n") + 1).cast("decimal(38,0)") * F.col("_sx")
    )
    den = F.col("_n").cast("decimal(38,0)") * F.col("_sx")
    return agg.where(F.col("_sx") > 0).select(
        *keys,
        F.col("_n").cast("bigint").alias("n_members"),
        (num.cast("double") / den.cast("double")).alias("gini"),
    )


def attribute_linear(
    events: DataFrame,
    conversion_type: str,
    touch_types: Sequence[str],
    window_seconds: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Linear multi-touch attribution: each conversion's value splits
    EQUALLY across the same user's touch events (clicks/views/...)
    inside the preceding `window_seconds` — the standard
    marketing-attribution model alongside asof's last-touch. Returns
    (conversion_id, touch_id, user, touch_type, share).

    Shape: ONE equi-join on the user key with the time-range predicate
    as a join filter — co-partitioned by user, per-user bounded fan-out
    (a user's touches × conversions inside the window), never
    quadratic in the corpus. The share divides exact integer cents by
    the per-conversion touch count (one COUNT window on the conversion
    key, riding the join's partitioning): two IEEE ops on
    deterministic inputs. Touches at or after the conversion instant
    are excluded (strictly-before semantics, exact integer micros).
    """
    conv = events.where(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias("conversion_id"),
        F.unix_micros(F.col(ts_col)).alias("_ct"),
        F.round(F.col(value_col) * 100).cast("long").alias("_cents"),
    )
    touch = events.where(F.col(type_col).isin(*touch_types)).select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias("touch_id"),
        F.col(type_col).alias("touch_type"),
        F.unix_micros(F.col(ts_col)).alias("_tt"),
    )
    win_us = int(window_seconds) * 1_000_000
    joined = conv.join(
        touch,
        (conv["_u"] == touch["_u"])
        & (touch["_tt"] < conv["_ct"])
        & (touch["_tt"] >= conv["_ct"] - F.lit(win_us)),
    ).select(
        conv["_u"].alias("user_id"),
        "conversion_id",
        "touch_id",
        "touch_type",
        "_cents",
    )
    w = Window.partitionBy("conversion_id")
    n = F.count(F.lit(1)).over(w)
    return joined.select(
        "conversion_id",
        "touch_id",
        "user_id",
        "touch_type",
        (
            F.col("_cents").cast("double") / n.cast("double") / F.lit(100.0)
        ).alias("share"),
    )


def acf(
    df: DataFrame,
    keys: Sequence[str],
    t_col: str,
    x_col: str,
    max_lag: int = 3,
) -> DataFrame:
    """Sample autocorrelation function per group: lag-k Pearson
    correlation between the series and its k-shifted self (the
    pairwise-complete "correlogram" convention — each lag's r uses
    only the (x_t, x_{t−k}) pairs that exist), for k = 1..max_lag.
    The seasonality / memory diagnostic run before picking a forecast
    window. Rows must have a UNIQUE `t_col` per group (pre-aggregate
    to the bucket first) and `x_col` must be exact integer units
    (cents / micro-units — the catalog float discipline).

    Shape: ONE window sort per group computes all max_lag lag columns
    (one Exchange + one Sort total), an explode of max_lag structs
    (linear ×L fan-out, L tiny), then ONE (keys, lag) groupBy of
    decimal(38,0) accumulators — map-side combinable, no driver
    action, scale-safe at any group count. Group STATE is 6 numbers —
    the series itself is never collected.

    Float discipline: all six accumulators (n, Σx, Σy, Σxy, Σx², Σy²)
    are exact decimals with the trend_slopes overflow guard;
    r = num / (sqrt(d1) · sqrt(d2)) with num/d1/d2 exact-decimal →
    string → double (the wide-decimal hop), the denominator folded as
    sqrt·sqrt in BOTH engines, rounded to 6 dp.
    """
    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(F.col(t_col))
    x = F.col(x_col).cast("decimal(38,0)")
    with_lags = df.select(
        *keys,
        F.col(t_col),
        x.alias("_x"),
        *[
            F.lag(x, k).over(w).alias(f"_lag{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    lagged = with_lags.select(
        *keys,
        "_x",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("int").alias("lag"),
                        F.col(f"_lag{k}").alias("_y"),
                    )
                    for k in range(1, max_lag + 1)
                ]
            )
        ).alias("_p"),
    ).select(*keys, "_x", F.col("_p.lag").alias("lag"), F.col("_p._y").alias("_y"))
    pairs = lagged.where(F.col("_y").isNotNull())
    agg = pairs.groupBy(*keys, "lag").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
    )
    num = F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    d1 = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    d2 = F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    not_overflowed = (
        F.col("_sx").isNotNull()
        & F.col("_sy").isNotNull()
        & F.col("_sxy").isNotNull()
        & F.col("_sxx").isNotNull()
        & F.col("_syy").isNotNull()
        & num.isNotNull()
        & d1.isNotNull()
        & d2.isNotNull()
    )
    agg = agg.where(
        F.assert_true(
            not_overflowed,
            "acf: decimal(38,0) accumulator overflowed — rescale x to "
            "smaller integer units",
        ).isNull()
    )
    num_d = num.cast("string").cast("double")
    d1_d = d1.cast("string").cast("double")
    d2_d = d2.cast("string").cast("double")
    r = num_d / (F.sqrt(d1_d) * F.sqrt(d2_d))
    return agg.where((d1 > 0) & (d2 > 0)).select(
        *keys,
        "lag",
        F.col("_n").cast("bigint").alias("n_pairs"),
        F.round(r, 6).alias("acf"),
    )


def theil_sen(
    df: DataFrame,
    keys: Sequence[str],
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group Theil–Sen robust trend (Sen 1968): the slope is the
    LOWER-median (nearest-rank, the winsorize convention) of all
    pairwise slopes (y_j − y_i)/(x_j − x_i) over x_i < x_j, and the
    intercept the lower-median of (y_i − slope·x_i) — breakdown point
    ~29%, immune to the outliers that drag OLS (`trend_slopes`).
    x/y must be exact integer units with UNIQUE x per group.

    Shape: one within-group self-equi-join on keys builds the
    n·(n−1)/2 slope pairs — the O(n²) term is PER GROUP, so the
    operator's contract is bounded group size (e.g. days per (type)
    series, ≤ a few thousand pairs), exactly like the skyline oracle;
    the corpus-level cost is Σ n_g², shuffled once on the group key.
    Median selection is a window rank, not a collect.

    Float discipline: each slope is ONE double division of exact ints
    (IEEE-deterministic, engine-identical); medians are value
    SELECTIONS (nearest-rank, ties broken by (x_i, x_j)), never
    interpolated averages; intercept folds y_i − m·x_i per row
    identically in both engines; outputs rounded to 6 dp.
    """
    keys = list(keys)
    t = df.select(
        *keys,
        F.col(x_col).cast("bigint").alias("_x"),
        F.col(y_col).cast("bigint").alias("_y"),
    )
    a = t.select(*keys, F.col("_x").alias("_xi"), F.col("_y").alias("_yi"))
    b = t.select(*keys, F.col("_x").alias("_xj"), F.col("_y").alias("_yj"))
    pairs = a.join(b, keys).where(F.col("_xi") < F.col("_xj"))
    slope = (F.col("_yj") - F.col("_yi")).cast("double") / (
        F.col("_xj") - F.col("_xi")
    ).cast("double")
    pairs = pairs.select(*keys, "_xi", "_xj", slope.alias("_slope"))
    wn = Window.partitionBy(*keys)
    ws = Window.partitionBy(*keys).orderBy("_slope", "_xi", "_xj")
    ranked = pairs.select(
        *keys,
        "_slope",
        F.row_number().over(ws).alias("_r"),
        F.count(F.lit(1)).over(wn).alias("_np"),
    )
    med = ranked.where(
        F.col("_r") == ((F.col("_np") + 1) / 2).cast("bigint")
    ).select(*keys, F.col("_slope").alias("_m"), F.col("_np").alias("n_pairs"))
    resid = t.join(med, keys).select(
        *keys,
        "n_pairs",
        "_m",
        (F.col("_y").cast("double") - F.col("_m") * F.col("_x").cast("double")).alias("_b"),
    )
    wrn = Window.partitionBy(*keys)
    wrs = Window.partitionBy(*keys).orderBy("_b")
    rr = resid.select(
        *keys,
        "n_pairs",
        "_m",
        "_b",
        F.row_number().over(wrs).alias("_r"),
        F.count(F.lit(1)).over(wrn).alias("_n"),
    )
    return rr.where(F.col("_r") == ((F.col("_n") + 1) / 2).cast("bigint")).select(
        *keys,
        F.col("_n").cast("bigint").alias("n_points"),
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.round("_m", 6).alias("slope"),
        F.round("_b", 6).alias("intercept"),
    )


def _km_table_two_phase(weekly: DataFrame) -> DataFrame:
    """Kaplan-Meier table for a distinct-time frame too large for the
    single bounded window + broadcast-list fold: range partition on
    time, then (a) n_at_risk = local suffix sum + the broadcast
    carry-in from LATER partitions (exact integers — bit-identical to
    the single-window form), and (b) survival = the per-partition
    time-ordered prefix product (numpy cumprod inside one grouped map
    — a global ordered product has no built-in window form) times the
    carry-in product of all EARLIER partitions' totals (a
    #partitions-sized sorted fold). Buckets are FIXED-WIDTH time
    ranges derived from (min, max, shuffle-partitions) — not sampled
    repartitionByRange boundaries — so the float-product association
    is a pure function of the data and the survival output is
    run-deterministic (ADVICE r11); vs the single global fold it may
    still differ by float re-association below the round(6) output.
    """
    import pandas as pd

    lo, hi = weekly.agg(F.min("time"), F.max("time")).collect()[0]
    if lo is None:
        return weekly.sparkSession.createDataFrame(
            [],
            "time long, d long, c long, n_at_risk long, "
            "hazard double, survival double",
        )
    nparts = int(
        weekly.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    width = max(1, -(-(int(hi) - int(lo) + 1) // nparts))
    pid = weekly.withColumn(
        "_pid",
        F.expr(f"CAST((time - {int(lo)}) DIV {width} AS INT)"),
    )
    ptot = pid.groupBy("_pid").agg(
        F.sum(F.col("d") + F.col("c")).cast("bigint").alias("_pt")
    )
    wafter = Window.orderBy("_pid").rowsBetween(
        1, Window.unboundedFollowing
    )
    carries = ptot.select(
        "_pid",
        F.coalesce(F.sum("_pt").over(wafter), F.lit(0))
        .cast("bigint")
        .alias("_crisk"),
    )
    staged = pid.join(F.broadcast(carries), "_pid")

    def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("time").reset_index(drop=True)
        dc = (pdf["d"] + pdf["c"]).to_numpy("int64")
        n = dc[::-1].cumsum()[::-1] + int(pdf["_crisk"].iloc[0])
        factor = 1.0 - pdf["d"].to_numpy("float64") / n
        return pd.DataFrame(
            {
                "_pid": pdf["_pid"],
                "time": pdf["time"],
                "d": pdf["d"],
                "c": pdf["c"],
                "n_at_risk": n,
                "_lp": np.cumprod(factor),
            }
        )

    folded = staged.groupBy("_pid").applyInPandas(
        _fold,
        schema=(
            "_pid int, time long, d long, c long, n_at_risk long, "
            "_lp double"
        ),
    )
    # carry-in product per partition: fold the (pid, partition total
    # product) list — #partitions rows — in pid order.
    ptotp = folded.groupBy("_pid").agg(
        F.max_by("_lp", "time").alias("_tp")
    )
    allp = ptotp.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_pid"), F.col("_tp")))
        ).alias("_pl")
    )
    carryp = ptotp.crossJoin(F.broadcast(allp)).select(
        "_pid",
        F.aggregate(
            F.filter(F.col("_pl"), lambda x: x["_pid"] < F.col("_pid")),
            F.lit(1.0),
            lambda acc, x: acc * x["_tp"],
        ).alias("_cp"),
    )
    return folded.join(F.broadcast(carryp), "_pid").select(
        "time",
        "d",
        "c",
        "n_at_risk",
        F.round(
            F.col("d").cast("double") / F.col("n_at_risk").cast("double"),
            6,
        ).alias("hazard"),
        F.round(F.col("_cp") * F.col("_lp"), 6).alias("survival"),
    )


def kaplan_meier(
    subjects: DataFrame,
    time_col: str = "time",
    event_col: str = "observed",
    max_window_times: int | None = None,
) -> DataFrame:
    """Kaplan-Meier product-limit survival table from per-subject
    (time, observed) rows — time is an exact integer duration (days /
    weeks since exposure), observed is true when the event happened at
    `time` and false when the subject was CENSORED then (analysis
    cutoff, still active, lost to follow-up). Counting censored
    subjects as events is the bias K-M exists to remove. Returns one
    row per distinct time: d (events), c (censored), n_at_risk,
    hazard d/n, survival Π_{s<=t} (1 − d_s/n_s).

    Shape: ONE (time) groupBy over the subjects (the only corpus-scale
    shuffle — callers reduce their event log to one row per subject
    first), a window reverse-cumsum for the at-risk counts, and the
    survival products folded over the TIME-SORTED (d, n) list: the
    K-M table is at most a few hundred rows regardless of corpus
    size, so the O(T²) per-row prefix fold is constant-bounded, and
    the sorted fold keeps the float product order deterministic in
    both engines (never exp/ln, which dies on a zero-survival tail).
    Hazard and survival rounded to 6 dp. Cardinality-dispatched
    (VERDICT r10 #5): when the distinct-time frame exceeds
    ``max_window_times`` the table routes through
    `_km_table_two_phase` — exact two-phase n_at_risk, per-range-
    partition cumprod for survival — instead of the single window +
    broadcast list.
    """
    threshold = (
        _GLOBAL_WINDOW_THRESHOLD
        if max_window_times is None
        else max_window_times
    )
    weekly = subjects.groupBy(F.col(time_col).cast("bigint").alias("time")).agg(
        F.sum(F.when(F.col(event_col), 1).otherwise(0)).cast("bigint").alias("d"),
        F.sum(F.when(F.col(event_col), 0).otherwise(1)).cast("bigint").alias("c"),
    )
    weekly = _materialize(weekly)
    if _exceeds_rows(weekly, threshold):
        return _km_table_two_phase(weekly)
    wrisk = (
        Window.orderBy("time")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    tbl = weekly.select(
        "time",
        "d",
        "c",
        F.sum(F.col("d") + F.col("c")).over(wrisk).cast("bigint").alias("n_at_risk"),
    )
    lst = tbl.agg(
        F.array_sort(
            F.collect_list(F.struct("time", "d", F.col("n_at_risk").alias("n")))
        ).alias("_l")
    )
    joined = tbl.crossJoin(F.broadcast(lst))
    surv = F.aggregate(
        F.filter(F.col("_l"), lambda x: x["time"] <= F.col("time")),
        F.lit(1.0),
        lambda acc, x: acc
        * (F.lit(1.0) - x["d"].cast("double") / x["n"].cast("double")),
    )
    return joined.select(
        "time",
        "d",
        "c",
        "n_at_risk",
        F.round(F.col("d").cast("double") / F.col("n_at_risk").cast("double"), 6).alias(
            "hazard"
        ),
        F.round(surv, 6).alias("survival"),
    )


def _two_phase_rank(
    df: DataFrame,
    value_col: str,
    tiebreak_col: str | None,
) -> DataFrame:
    """Distributed exact global rank by (value, tiebreak): range
    partition on the sort key, rank locally, add the partition's
    prefix offset (cumsum over the #partitions-row count table,
    broadcast back). Returns (_v, _rank 1-based, _n total) — never a
    one-partition window. The building block for exact equal-frequency
    bins and nearest-rank percentile selections.

    NULL values are excluded up front (ADVICE r9): Spark's ASC default
    sorts NULLs first while the DuckDB oracles' ROW_NUMBER uses NULLS
    LAST, so a NULL would silently take rank 1 on the Spark side only.
    Ranks are therefore over non-null values — the same contract every
    percentile operator in this module documents."""
    ranged = df.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).alias("_v"),
        *([F.col(tiebreak_col).alias("_tb")] if tiebreak_col else []),
    ).repartitionByRange(
        *(["_v", "_tb"] if tiebreak_col else ["_v"])
    )
    local_order = [F.col("_v").asc()] + (
        [F.col("_tb").asc()] if tiebreak_col else []
    )
    pid = ranged.withColumn("_pid", F.spark_partition_id())
    wl = Window.partitionBy("_pid").orderBy(*local_order)
    local = pid.withColumn("_lr", F.row_number().over(wl))
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_c"))
    woff = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_c").over(woff), F.lit(0)).alias("_off"),
    )
    total = counts.agg(F.sum("_c").cast("bigint").alias("_n"))
    return (
        local.join(F.broadcast(offsets), "_pid")
        .crossJoin(F.broadcast(total))
        .select(
            "_v",
            (F.col("_off") + F.col("_lr")).cast("bigint").alias("_rank"),
            "_n",
        )
    )


# Cardinality-dispatch threshold for the bounded-contract global
# windows (abc_classes, skyline_2d, kaplan_meier): pre-reduced frames
# at or under this row count run the single ordered window (the frame
# is entity/pair/time-bucket sized by contract — millions, not the
# corpus); above it the operator routes itself through the two-phase
# range-partitioned form instead of relying on the docstring
# (VERDICT r10 #5 — the ann_search dispatch pattern).
_GLOBAL_WINDOW_THRESHOLD = 2_000_000


def _exceeds_rows(df: DataFrame, threshold: int) -> bool:
    """Cardinality probe for the global-window dispatch: counts at most
    threshold+1 rows (LocalLimit early-exit), never the full frame."""
    return df.limit(threshold + 1).count() > threshold


def _materialize(df: DataFrame) -> DataFrame:
    """localCheckpoint the pre-reduced frame before the dispatch probe
    so the probe and the chosen path share ONE computation of the
    upstream reduction instead of running the corpus-wide groupBy
    twice (ADVICE r11). The frame is already reduced (entity/pair/
    time-bucket sized), so truncating lineage costs no pushdown."""
    return df.localCheckpoint(eager=True)


def _pareto_two_phase(agg: DataFrame) -> DataFrame:
    """Distributed global (value DESC, key ASC) rank + running value
    sum over an entity frame too large for one ordered window: range
    partition on the sort key, rank/cumsum locally per partition, add
    the partition's prefix offsets (row count AND value sum, cumsum
    over the #partitions-row totals table, broadcast back). Exact and
    bit-identical to the single-window form — all integer arithmetic.
    Input (key, value bigint); output (key, value, rank, cum_value).
    """
    ranged = agg.repartitionByRange(
        F.col("value").desc(), F.col("key").asc()
    )
    pid = ranged.withColumn("_pid", F.spark_partition_id())
    order = [F.col("value").desc(), F.col("key").asc()]
    wl = Window.partitionBy("_pid").orderBy(*order)
    local = pid.select(
        "key",
        "value",
        "_pid",
        F.row_number().over(wl).alias("_lr"),
        F.sum("value")
        .over(wl.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("_lcum"),
    )
    totals = local.groupBy("_pid").agg(
        F.count(F.lit(1)).cast("bigint").alias("_c"),
        F.sum("value").cast("bigint").alias("_s"),
    )
    woff = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "_pid",
        F.coalesce(F.sum("_c").over(woff), F.lit(0)).alias("_offr"),
        F.coalesce(F.sum("_s").over(woff), F.lit(0))
        .cast("bigint")
        .alias("_offv"),
    )
    return local.join(F.broadcast(offsets), "_pid").select(
        "key",
        "value",
        (F.col("_offr") + F.col("_lr")).cast("bigint").alias("rank"),
        (F.col("_offv") + F.col("_lcum")).cast("bigint").alias("cum_value"),
    )


def _prefix_min_two_phase(pairs: DataFrame) -> DataFrame:
    """Distributed running strict-prefix MIN of ``_y`` over ``_x``
    ascending (exclusive of the current row) for a (x, y) frame too
    large for one ordered window: range partition on _x, local
    exclusive prefix min per partition, then broadcast each
    partition's carry-in (the min of all EARLIER partitions' y).
    Exact — min is order-insensitive. Adds ``_prev_min_y``.
    """
    ranged = pairs.repartitionByRange(F.col("_x").asc())
    pid = ranged.withColumn("_pid", F.spark_partition_id())
    wl = (
        Window.partitionBy("_pid")
        .orderBy("_x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = pid.withColumn("_lmin", F.min("_y").over(wl))
    mins = pid.groupBy("_pid").agg(F.min("_y").alias("_pm"))
    wcarry = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carries = mins.select(
        "_pid", F.min("_pm").over(wcarry).alias("_carry")
    )
    return (
        local.join(F.broadcast(carries), "_pid")
        # least() skips NULLs (returns NULL only when both are) — the
        # first partition's carry and each partition's first row's
        # local min are NULL exactly like the single window's frame.
        .withColumn("_prev_min_y", F.least("_carry", "_lmin"))
        .drop("_pid", "_lmin", "_carry")
    )


def equal_frequency_bins(
    df: DataFrame,
    value_col: str,
    n_bins: int = 10,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Equal-frequency (quantile) binning: every row ranked by
    (value, tiebreak) lands in bin floor((rank−1)·B / n) — bins differ
    in size by at most one row, bounds are ACTUAL data values (the
    nearest-rank discipline: no interpolated, ulp-fuzzy cut points).
    Returns one row per bin: n_rows, lo, hi. The feature-binning /
    histogram-equalization primitive; with a unique `tiebreak_col`
    the output is fully deterministic (unlike NTILE's unspecified tie
    order).

    Scale shape — the global rank is TWO-PHASE, never a one-partition
    window: rows are range-partitioned on the sort key, each
    partition ranks locally, and the global rank adds the partition's
    prefix offset (a cumsum over the #partitions-row count table,
    broadcast back). The only corpus-wide movement is the range
    exchange any exact global order requires; bin assignment is
    integer math (rank·B is exact int64 far past any practical row
    count). At 100 TB prefer sketch quantiles (functions/sketches)
    when approximate bounds suffice.
    """
    ranked = _two_phase_rank(df, value_col, tiebreak_col).select(
        "_v",
        F.floor(((F.col("_rank") - 1) * n_bins) / F.col("_n"))
        .cast("bigint")
        .alias("bin"),
    )
    return ranked.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("_v").alias("lo"),
        F.max("_v").alias("hi"),
    )


def dau_mau(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 30,
) -> DataFrame:
    """Stickiness series: per calendar day, DAU (distinct active
    users), MAU (distinct users active in the trailing
    ``window_days``-day window ending that day), and the DAU/MAU
    ratio — the engagement metric. Returns one row per day of the
    observed span.

    Shape: the corpus reduces ONCE to distinct (user, day) rows; MAU
    is that table exploded onto the ≤ window_days future days each
    activity covers (bounded ×30 fan-out — a range self-join would
    re-scan per day) and de-dup-counted per day; DAU is the exact-day
    slice of the same table. Day spine from one 1-row min/max agg —
    days with zero activity still report. Exact integer counts, one
    final division.
    """
    day = F.to_date(F.col(ts_col))
    ud = events.select(
        F.col(user_col).alias("_u"), day.alias("_d")
    ).distinct()
    dau = ud.groupBy(F.col("_d").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("dau")
    )
    span = events.agg(
        F.min(day).alias("_d0"), F.max(day).alias("_d1")
    )
    days = span.select(F.explode(F.sequence("_d0", "_d1")).alias("day"))
    covered = ud.select(
        "_u",
        F.explode(
            F.sequence(
                F.col("_d"), F.date_add(F.col("_d"), window_days - 1)
            )
        ).alias("day"),
    ).distinct()
    mau = covered.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("mau")
    )
    out = (
        days.join(dau, "day", "left")
        .join(mau, "day", "left")
        .select(
            "day",
            F.coalesce("dau", F.lit(0)).cast("bigint").alias("dau"),
            F.coalesce("mau", F.lit(0)).cast("bigint").alias("mau"),
        )
    )
    return out.select(
        "day",
        "dau",
        "mau",
        F.round(
            F.when(
                F.col("mau") > 0,
                F.col("dau").cast("double") / F.col("mau").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("stickiness"),
    )


def nearest_rank_percentiles(
    df: DataFrame,
    value_col: str,
    percentiles: Sequence[int] = (0, 25, 50, 75, 90, 99, 100),
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Exact nearest-rank percentile selection: for each p the value
    at rank ⌈p·n/100⌉ (p=0 → rank 1) — clip points are ACTUAL data
    values (the winsorize discipline: interpolated percentiles are
    ulp-fuzzy cross-engine; selections are bit-exact). Returns one
    row per percentile: (percentile, rank, value, n_rows).

    Scale shape: the same two-phase distributed rank as
    equal_frequency_bins (range partition + local rank + broadcast
    prefix offsets — no one-partition window), then a broadcast
    percentile spine filters the ≤ len(ps) target ranks. One range
    exchange total; integer rank math.
    """
    ps = sorted(set(int(p) for p in percentiles))
    if not ps or ps[0] < 0 or ps[-1] > 100:
        raise ValueError("percentiles must be within [0, 100]")
    ranked = _two_phase_rank(df, value_col, tiebreak_col)
    spine = df.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in ps])).alias("percentile")
    )
    targets = ranked.crossJoin(F.broadcast(spine)).where(
        F.col("_rank")
        == F.greatest(
            F.lit(1),
            F.ceil(F.col("percentile") * F.col("_n") / F.lit(100)).cast(
                "bigint"
            ),
        )
    )
    return targets.select(
        F.col("percentile").cast("int").alias("percentile"),
        F.col("_rank").alias("rank"),
        F.col("_v").alias("value"),
        F.col("_n").alias("n_rows"),
    )


def funnel_latency(
    df: DataFrame,
    stages: Sequence[str],
    percentiles: Sequence[int] = (50, 90),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-transition funnel latency: for users who reached stage k+1,
    the exact nearest-rank percentiles of (t_{k+1} − t_k) seconds under
    the SAME chained-min semantics as `funnel` (stage k+1's time is the
    earliest stage-(k+1) event weakly after the user's stage-k time) —
    'how long does signup→view take at the median', the diagnosis
    behind a funnel's drop-offs. One row per (transition, percentile).

    Shape: the funnel fold (one scan + one shuffle, per-user sorted
    event list) re-used verbatim, then the per-user stage-time array
    differentiates IN the array (no second shuffle) and explodes to
    (transition, latency) rows; percentile selection is a per-
    transition window rank — partitioned by transition, never a global
    one-partition sort. Latencies are exact integer seconds; the
    selected percentiles are actual data values (nearest-rank
    discipline), ties broken by user id.
    """
    k = len(stages)
    sec = F.unix_timestamp(F.col(ts_col))
    stage_idx = F.lit(None).cast("int")
    for i, s in reversed(list(enumerate(stages))):
        stage_idx = F.when(F.col(type_col) == s, F.lit(i)).otherwise(stage_idx)
    ev = df.where(F.col(type_col).isin(list(stages))).select(
        F.col(user_col).alias("_u"),
        sec.alias("_s"),
        stage_idx.alias("_j"),
    )
    init = F.array(*[F.lit(None).cast("long") for _ in range(k)])

    def step(st, e):
        return F.transform(
            st,
            lambda t, i: F.when(
                (e["_j"] == i)
                & t.isNull()
                & ((i == F.lit(0)) | F.get(st, i - 1).isNotNull()),
                e["_s"],
            ).otherwise(t),
        )

    per_user = ev.groupBy("_u").agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("_s", "_j"))), init, step
        ).alias("_st")
    )
    trans = per_user.select(
        "_u",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.lit(k - 1)),
                lambda i: F.struct(
                    i.alias("_i"),
                    (F.get("_st", i) - F.get("_st", i - 1)).alias("_lat"),
                ),
            )
        ).alias("_t"),
    ).select(
        "_u", F.col("_t._i").alias("_i"), F.col("_t._lat").alias("_lat")
    ).where(F.col("_lat").isNotNull())
    wn = Window.partitionBy("_i")
    ws = Window.partitionBy("_i").orderBy("_lat", "_u")
    ranked = trans.select(
        "_i",
        "_lat",
        F.row_number().over(ws).alias("_r"),
        F.count(F.lit(1)).over(wn).alias("_n"),
    )
    ps = sorted(set(int(p) for p in percentiles))
    spine = df.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in ps])).alias("percentile")
    )
    stage_names = F.array(*[F.lit(s) for s in stages])
    out = ranked.crossJoin(F.broadcast(spine)).where(
        F.col("_r")
        == F.greatest(
            F.lit(1),
            F.ceil(F.col("percentile") * F.col("_n") / F.lit(100)).cast(
                "bigint"
            ),
        )
    )
    return out.select(
        F.col("_i").cast("int").alias("transition_idx"),
        F.get(stage_names, F.col("_i") - 1).alias("from_stage"),
        F.get(stage_names, F.col("_i")).alias("to_stage"),
        F.col("percentile").cast("int").alias("percentile"),
        F.col("_n").cast("bigint").alias("n_users"),
        F.col("_lat").cast("bigint").alias("latency_s"),
    )


def bounce_rate(
    df: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Daily bounce rate: gap-based sessions (a >gap_s silence starts
    a new one), a session of exactly ONE event is a bounce; per
    session-start day: n_sessions, n_bounces, bounce_rate. One
    per-user window sort (shared by the gap flag and the running
    session id) + two same-key groupBys; exact integer counts, one
    final division.
    """
    sec = F.unix_timestamp(F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    g = df.select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        F.when(
            sec - F.lag(sec).over(w) > gap_s, F.lit(1)
        ).otherwise(F.lit(0)).alias("_new"),
    )
    ws = (
        Window.partitionBy("_u")
        .orderBy("_ts", "_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = g.select(
        "_u", "_ts", F.sum("_new").over(ws).alias("_sid")
    )
    per_sess = s.groupBy("_u", "_sid").agg(
        F.count(F.lit(1)).alias("_len"),
        F.min(F.to_date("_ts")).alias("day"),
    )
    daily = per_sess.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum(F.when(F.col("_len") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_bounces"),
    )
    return daily.select(
        "day",
        "n_sessions",
        "n_bounces",
        F.round(
            F.col("n_bounces").cast("double") / F.col("n_sessions").cast("double"),
            6,
        ).alias("bounce_rate"),
    )


def gap_percentiles(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    id_col: str,
    percentiles: Sequence[int] = (50, 90),
) -> DataFrame:
    """Inter-event-time distribution per group: exact nearest-rank
    percentiles of the seconds between consecutive events (ordered by
    (ts, id) — deterministic under timestamp ties). The cadence
    diagnostic behind session-gap and watermark tuning. One row per
    (group, percentile), values are actual observed gaps.

    Shape: one per-group window sort (shared by the lag and the rank),
    then a broadcast percentile spine filters the target ranks —
    partitioned windows throughout, never a global sort.
    """
    keys = list(keys)
    sec = F.unix_timestamp(F.col(ts_col))
    w = Window.partitionBy(*keys).orderBy(ts_col, id_col)
    gaps = df.select(
        *keys,
        F.col(id_col).alias("_id"),
        (sec - F.lag(sec).over(w)).alias("_gap"),
    ).where(F.col("_gap").isNotNull())
    wn = Window.partitionBy(*keys)
    ws = Window.partitionBy(*keys).orderBy("_gap", "_id")
    ranked = gaps.select(
        *keys,
        "_gap",
        F.row_number().over(ws).alias("_r"),
        F.count(F.lit(1)).over(wn).alias("_n"),
    )
    ps = sorted(set(int(p) for p in percentiles))
    spine = df.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in ps])).alias("percentile")
    )
    out = ranked.crossJoin(F.broadcast(spine)).where(
        F.col("_r")
        == F.greatest(
            F.lit(1),
            F.ceil(F.col("percentile") * F.col("_n") / F.lit(100)).cast(
                "bigint"
            ),
        )
    )
    return out.select(
        *keys,
        F.col("percentile").cast("int").alias("percentile"),
        F.col("_n").cast("bigint").alias("n_gaps"),
        F.col("_gap").cast("bigint").alias("gap_s"),
    )


def cross_correlations(
    df: DataFrame,
    series_col: str,
    t_col: str,
    x_col: str,
) -> DataFrame:
    """Pairwise Pearson correlation between every pair of series
    (series_col values), matched on the time bucket `t_col` — which
    metrics move together, the co-movement diagnostic behind alerting
    and feature pruning. `x_col` must be exact integer units with one
    row per (series, t). Returns one row per unordered pair with
    n_common (matched buckets) and the correlation.

    Shape: ONE self-equi-join on the time bucket (series_a < series_b
    to keep pairs unordered), then ONE (pair) groupBy of exact
    decimal(38,0) accumulators — the trend/acf float discipline:
    overflow-guarded sums, string-hop doubles, r = num /
    (sqrt(d1)·sqrt(d2)) folded identically in both engines, 6 dp. The
    join fan-out per bucket is (#series choose 2) — bounded by the
    series-cardinality contract, never by the corpus.
    """
    t = df.select(
        F.col(series_col).alias("_s"),
        F.col(t_col).alias("_t"),
        F.col(x_col).cast("decimal(38,0)").alias("_x"),
    )
    a = t.select(
        F.col("_s").alias("series_a"), "_t", F.col("_x").alias("_xa")
    )
    b = t.select(
        F.col("_s").alias("series_b"), "_t", F.col("_x").alias("_xb")
    )
    pairs = a.join(b, "_t").where(F.col("series_a") < F.col("series_b"))
    agg = pairs.groupBy("series_a", "series_b").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
        F.sum("_xa").alias("_sx"),
        F.sum("_xb").alias("_sy"),
        F.sum(F.col("_xa") * F.col("_xb")).alias("_sxy"),
        F.sum(F.col("_xa") * F.col("_xa")).alias("_sxx"),
        F.sum(F.col("_xb") * F.col("_xb")).alias("_syy"),
    )
    num = F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    d1 = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    d2 = F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    not_overflowed = (
        F.col("_sx").isNotNull()
        & F.col("_sy").isNotNull()
        & F.col("_sxy").isNotNull()
        & F.col("_sxx").isNotNull()
        & F.col("_syy").isNotNull()
        & num.isNotNull()
        & d1.isNotNull()
        & d2.isNotNull()
    )
    agg = agg.where(
        F.assert_true(
            not_overflowed,
            "cross_correlations: decimal(38,0) accumulator overflowed — "
            "rescale x to smaller integer units",
        ).isNull()
    )
    num_d = num.cast("string").cast("double")
    d1_d = d1.cast("string").cast("double")
    d2_d = d2.cast("string").cast("double")
    return agg.where((d1 > 0) & (d2 > 0)).select(
        "series_a",
        "series_b",
        F.col("_n").cast("bigint").alias("n_common"),
        F.round(num_d / (F.sqrt(d1_d) * F.sqrt(d2_d)), 6).alias("pearson"),
    )


def period_growth(
    df: DataFrame,
    keys: Sequence[str],
    period_col: str,
    value_col: str,
) -> DataFrame:
    """Period-over-period growth per series: each period's exact
    integer total next to the previous period's, with the growth rate
    (v − prev)/prev — the MoM/WoW table every revenue dashboard leads
    with. One groupBy + one per-series window (LAG over the period
    order); rate is one double division of exact ints, 6 dp; the
    first period of each series reports NULL growth (no fabricated
    zero).
    """
    keys = list(keys)
    agg = df.groupBy(*keys, F.col(period_col).alias("period")).agg(
        F.sum(F.col(value_col)).cast("bigint").alias("value")
    )
    w = Window.partitionBy(*keys).orderBy("period")
    prev = F.lag("value").over(w)
    return agg.select(
        *keys,
        "period",
        "value",
        prev.alias("prev_value"),
        F.round(
            (F.col("value") - prev).cast("double") / prev.cast("double"), 6
        ).alias("growth"),
    )


def abc_classes(
    df: DataFrame,
    key_col: str,
    value_col: str,
    a_permille: int = 800,
    b_permille: int = 950,
    max_window_entities: int | None = None,
) -> DataFrame:
    """ABC / Pareto classification: entities sorted by exact integer
    value (descending, id tiebreak) are labeled A while the RUNNING
    share of total value is ≤ a_permille/1000, B up to
    b_permille/1000, C beyond — 'which 20% of parts carry 80% of
    revenue', the inventory-prioritization classic. Thresholds
    compare by integer cross-multiplication (1000·cum vs p·total) so
    class boundaries are bit-deterministic; the top entity is always
    A. One (key) reduction + one global-order window over the ENTITY
    table, one broadcast total. Cardinality-dispatched (VERDICT r10
    #5): when the entity frame exceeds ``max_window_entities``
    (probed with a limit-count, never a full count) the global
    rank+cumsum runs through the two-phase range-partitioned form
    (`_pareto_two_phase`) instead of one ordered window — exact
    integer arithmetic, bit-identical results on either path.
    """
    threshold = (
        _GLOBAL_WINDOW_THRESHOLD
        if max_window_entities is None
        else max_window_entities
    )
    agg = _materialize(
        df.groupBy(F.col(key_col).alias("key")).agg(
            F.sum(F.col(value_col)).cast("bigint").alias("value")
        )
    )
    total = agg.agg(F.sum("value").cast("bigint").alias("_total"))
    if _exceeds_rows(agg, threshold):
        ranked = _pareto_two_phase(agg).crossJoin(F.broadcast(total))
    else:
        w = Window.orderBy(F.col("value").desc(), F.col("key").asc())
        ranked = agg.crossJoin(F.broadcast(total)).select(
            "key",
            "value",
            "_total",
            F.sum("value")
            .over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            .cast("bigint")
            .alias("cum_value"),
            F.row_number().over(w).alias("rank"),
        )
    cls = (
        F.when(
            (F.col("rank") == 1)
            | (F.lit(1000) * F.col("cum_value") <= F.lit(a_permille) * F.col("_total")),
            F.lit("A"),
        )
        .when(
            F.lit(1000) * F.col("cum_value") <= F.lit(b_permille) * F.col("_total"),
            F.lit("B"),
        )
        .otherwise(F.lit("C"))
    )
    return ranked.select(
        "key",
        "value",
        F.col("rank").cast("bigint").alias("rank"),
        "cum_value",
        F.col("_total").alias("total_value"),
        cls.alias("abc_class"),
    )


def rolling_zscore(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    id_col: str,
    x_col: str,
    window_rows: int = 20,
    z_gate_x10: int = 30,
    min_window: int = 10,
) -> DataFrame:
    """Trailing-window z-score per series: each observation scored
    against the mean/stddev of its own last `window_rows` rows
    (inclusive) — the self-referential anomaly flag that adapts to
    level shifts where the global z-score (`zscore_outliers`) cannot.
    `x_col` must be exact integer units.

    Float discipline: the window carries exact decimal(38,0) Σx and
    Σx², and z reduces to (n·x − Σx) / sqrt(n·Σx² − (Σx)²) — both
    operands exact integers through the string-hop, ONE final
    division. The outlier gate compares 10·|z| against `z_gate_x10`
    on the rounded z (bit-deterministic). One window sort shared by
    all three frame aggregates; rows with fewer than `min_window`
    trailing observations are withheld (a 2-row 'window' flags
    everything).
    """
    keys = list(keys)
    x = F.col(x_col).cast("decimal(38,0)")
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col, id_col)
        .rowsBetween(-(window_rows - 1), 0)
    )
    framed = df.select(
        *keys,
        F.col(id_col).alias("event_ref"),
        x.alias("_x"),
        F.count(F.lit(1)).over(w).cast("decimal(38,0)").alias("_n"),
        F.sum(x).over(w).alias("_sx"),
        F.sum(x * x).over(w).alias("_sxx"),
    ).where(F.col("_n") >= min_window)
    num = F.col("_n") * F.col("_x") - F.col("_sx")
    den2 = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    num_d = num.cast("string").cast("double")
    den_d = den2.cast("string").cast("double")
    z = F.round(num_d / F.sqrt(den_d), 6)
    return framed.where(den2 > 0).select(
        *keys,
        "event_ref",
        F.col("_x").cast("bigint").alias("x"),
        F.col("_n").cast("bigint").alias("n_window"),
        z.alias("z"),
        (F.abs(z) * 10 >= F.lit(z_gate_x10)).cast("int").alias("outlier"),
    )


def classification_report(
    df: DataFrame,
    true_col: str,
    pred_col: str,
) -> DataFrame:
    """Per-class precision / recall / F1 with support from a
    (true, pred) label table — the classifier-eval companion to
    retrieval.eval_metrics. One (true, pred) count reduction, then
    per-class tp/fp/fn by three tiny re-aggregations of that
    contingency table (never a second corpus pass). Classes present
    only in predictions still report (support 0, precision from fp).
    Exact integer counts; each ratio is ONE double division, 6 dp;
    F1's harmonic mean folds identically in both engines; zero
    denominators report 0.0 by convention (not NULL — a class with no
    predictions has zero precision, the sklearn zero_division=0
    convention).
    """
    cm = df.groupBy(
        F.col(true_col).alias("_t"), F.col(pred_col).alias("_p")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    tp = cm.where(F.col("_t") == F.col("_p")).select(
        F.col("_t").alias("label"), F.col("_n").alias("tp")
    )
    support = cm.groupBy(F.col("_t").alias("label")).agg(
        F.sum("_n").cast("bigint").alias("support")
    )
    predicted = cm.groupBy(F.col("_p").alias("label")).agg(
        F.sum("_n").cast("bigint").alias("n_predicted")
    )
    out = (
        support.join(predicted, "label", "full")
        .join(tp, "label", "left")
        .select(
            "label",
            F.coalesce("support", F.lit(0)).cast("bigint").alias("support"),
            F.coalesce("n_predicted", F.lit(0)).cast("bigint").alias("n_predicted"),
            F.coalesce("tp", F.lit(0)).cast("bigint").alias("tp"),
        )
    )
    prec = F.when(
        F.col("n_predicted") > 0,
        F.col("tp").cast("double") / F.col("n_predicted").cast("double"),
    ).otherwise(F.lit(0.0))
    rec = F.when(
        F.col("support") > 0,
        F.col("tp").cast("double") / F.col("support").cast("double"),
    ).otherwise(F.lit(0.0))
    f1 = F.when(
        prec + rec > 0, F.lit(2.0) * prec * rec / (prec + rec)
    ).otherwise(F.lit(0.0))
    return out.select(
        "label",
        "support",
        "n_predicted",
        "tp",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def chi_square_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns: one contingency reduction, marginals by re-aggregation,
    X² = Σ (o − e)²/e folded over the (a, b)-SORTED cell list (the
    sorted-fold float rule — never a shuffle-order float sum), with
    e = row_total·col_total/n as one deterministic double expression
    per cell. One row: n, dof = (R−1)(C−1), chi2 (6 dp). Significance
    thresholds are the caller's lookup — shipping a p-value would
    mean shipping an incomplete gamma implementation two engines
    disagree on in the last ulp.
    """
    cm = df.where(
        F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
    ).groupBy(
        F.col(col_a).alias("_a"), F.col(col_b).alias("_b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    ra = cm.groupBy("_a").agg(F.sum("_n").cast("bigint").alias("_ra"))
    rb = cm.groupBy("_b").agg(F.sum("_n").cast("bigint").alias("_rb"))
    # the DENSE R x C grid: zero cells still contribute (0 - e)^2/e —
    # folding only observed cells under-computes X^2 whenever a
    # combination never occurs (caught by the perfectly-dependent 2x2
    # closed-form test: 10 != n=20)
    cells = (
        ra.crossJoin(rb)
        .join(cm, ["_a", "_b"], "left")
        .select(
            "_a", "_b", "_ra", "_rb",
            F.coalesce("_n", F.lit(0)).cast("bigint").alias("_n"),
        )
    )
    one = cells.agg(
        (F.sum("_n")).cast("bigint").alias("n"),
        F.countDistinct("_a").cast("bigint").alias("_nr"),
        F.countDistinct("_b").cast("bigint").alias("_nc"),
        F.array_sort(
            F.collect_list(F.struct("_a", "_b", "_n", "_ra", "_rb"))
        ).alias("_l"),
    )
    def term(x):
        e = x["_ra"].cast("double") * x["_rb"].cast("double") / F.col("n").cast("double")
        o = x["_n"].cast("double")
        return (o - e) * (o - e) / e
    chi2 = F.aggregate("_l", F.lit(0.0), lambda acc, x: acc + term(x))
    return one.select(
        "n",
        ((F.col("_nr") - 1) * (F.col("_nc") - 1)).cast("bigint").alias("dof"),
        F.round(chi2, 6).alias("chi2"),
    )


def two_proportion_ztest(
    df: DataFrame,
    group_col: str,
    success_col: str,
) -> DataFrame:
    """Two-proportion z-test (pooled): conversion-rate difference
    between exactly two groups — the A/B readout. One (group) count
    reduction; z = (p1 − p2) / sqrt(p̂(1−p̂)(1/n1 + 1/n2)) from exact
    integer counts in one fixed-order double expression, 6 dp. The
    groups order by group key (deterministic sign). Raises via
    assert_true if the table does not contain exactly two groups.
    """
    g = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col(success_col).cast("int")).cast("bigint").alias("k"),
    )
    one = g.agg(
        F.count(F.lit(1)).alias("_ng"),
        F.array_sort(F.collect_list(F.struct("grp", "n", "k"))).alias("_l"),
    )
    one = one.where(
        F.assert_true(
            F.col("_ng") == 2,
            "two_proportion_ztest: expected exactly two groups",
        ).isNull()
    )
    # degenerate pooled proportion (0 or 1) has zero variance — the z
    # statistic is undefined; fail loudly rather than divide by zero
    _k = F.get("_l", 0)["k"] + F.get("_l", 1)["k"]
    _n = F.get("_l", 0)["n"] + F.get("_l", 1)["n"]
    one = one.where(
        F.assert_true(
            (_k > 0) & (_k < _n),
            "two_proportion_ztest: pooled proportion is 0 or 1 (zero "
            "variance) — z undefined",
        ).isNull()
    )
    a = F.get("_l", 0)
    b = F.get("_l", 1)
    n1, k1 = a["n"].cast("double"), a["k"].cast("double")
    n2, k2 = b["n"].cast("double"), b["k"].cast("double")
    p1, p2 = k1 / n1, k2 / n2
    pp = (k1 + k2) / (n1 + n2)
    z = (p1 - p2) / F.sqrt(pp * (F.lit(1.0) - pp) * (F.lit(1.0) / n1 + F.lit(1.0) / n2))
    return one.select(
        a["grp"].alias("group_a"),
        b["grp"].alias("group_b"),
        a["n"].alias("n_a"),
        b["n"].alias("n_b"),
        a["k"].alias("k_a"),
        b["k"].alias("k_b"),
        F.round(p1, 6).alias("rate_a"),
        F.round(p2, 6).alias("rate_b"),
        F.round(z, 6).alias("z"),
    )


def rfm_segments(
    df: DataFrame,
    id_col: str,
    r_col: str,
    f_col: str,
    m_col: str,
) -> DataFrame:
    """RFM segmentation: every customer scored 1–5 on Recency (lower
    is better), Frequency, and Monetary value against the population's
    nearest-rank quintile THRESHOLDS, combined as segment =
    100·R + 10·F + M — the classic lifecycle grid (555 champions, 1xx
    at-risk). Inputs must be exact integers (days / counts / cents).

    The thresholds come from `nearest_rank_percentiles` (two-phase
    distributed rank — no one-partition window) and BROADCAST as one
    12-value row; assignment is then a pure comparison projection over
    the entity table. Threshold-crossing scores (1 + Σ v > t_p for
    F/M, 1 + Σ v < t_p for R) are value-deterministic: boundary ties
    bin by strict comparison, the documented convention (exact
    equal-frequency bins under heavy ties would need the full rank —
    that is `equal_frequency_bins`).
    """
    dims = {"r": r_col, "f": f_col, "m": m_col}
    one = None
    for dim, col in dims.items():
        t = nearest_rank_percentiles(
            df.select(F.col(id_col), F.col(col)),
            col,
            (20, 40, 60, 80),
            tiebreak_col=id_col,
        )
        row = t.agg(
            *[
                F.max(
                    F.when(F.col("percentile") == p, F.col("value"))
                ).alias(f"_{dim}{p}")
                for p in (20, 40, 60, 80)
            ]
        )
        one = row if one is None else one.crossJoin(row)
    scored = df.crossJoin(F.broadcast(one))

    def up_score(col):
        v = F.col(col)
        return (
            F.lit(1)
            + sum(
                (v > F.col(f"_{d}{p}")).cast("int")
                for d, c in dims.items()
                if c == col
                for p in (20, 40, 60, 80)
            )
        )

    r = F.col(r_col)
    r_score = F.lit(1) + sum(
        (r < F.col(f"_r{p}")).cast("int") for p in (20, 40, 60, 80)
    )
    f_score = up_score(f_col)
    m_score = up_score(m_col)
    return scored.select(
        F.col(id_col),
        F.col(r_col).alias("recency"),
        F.col(f_col).alias("frequency"),
        F.col(m_col).alias("monetary"),
        r_score.cast("int").alias("r_score"),
        f_score.cast("int").alias("f_score"),
        m_score.cast("int").alias("m_score"),
        (r_score * 100 + f_score * 10 + m_score).cast("int").alias("segment"),
    )


def seasonal_decompose(
    df: DataFrame,
    keys: Sequence[str],
    day_col: str,
    value_col: str,
    period: int = 7,
) -> DataFrame:
    """Classical additive seasonal decomposition of a per-key daily
    series (exact-integer values, e.g. micro-units): value = trend +
    seasonal + residual, where trend is the centered ``period``-row
    moving average (NULL until the window is full — no half-window
    edge estimates), seasonal is the per-phase mean of the detrended
    series (phase = epoch-day mod period: engine-exact integer
    arithmetic, no day-of-week builtin whose origin differs across
    engines), and residual is what remains. The seasonality/trend
    split behind "is Monday really lower, or is the whole series
    falling" — the diagnostic upstream of the ACF/CUSUM battery.

    Float discipline: the moving average stays an exact integer SUM
    over the rows frame (trend = sum/period is the final division);
    detrended mass is period·value − trend_sum (exact int), so the
    per-phase mean is an exact-integer ratio num/(period·cnt); the
    residual is three fixed-order double ops. ROWS (not calendar)
    window semantics — run gapfill_daily first on sparse series, the
    documented contract.

    Shape: one (key, day) window sort shared by the trend frame, one
    (key, phase) groupBy, one broadcast-back join. Linear, no driver
    action.

    ``period`` must be ODD: the centered rowsBetween(-(p//2), p//2)
    frame spans p rows only for odd p; for even p it spans p+1 rows,
    so the count==period full-window guard would match only truncated
    edge windows (garbage trend at the edges, NULL in the interior).
    Even periods need the classical 2x-period double moving average,
    which this operator does not implement — it raises instead of
    silently decomposing wrong (ADVICE r10).
    """
    if period % 2 == 0 or period < 3:
        raise ValueError(
            "seasonal_decompose requires an odd period >= 3 (got "
            f"{period}): the centered ROWS frame spans period rows "
            "only for odd periods; even periods need a 2x-period "
            "double moving average, not implemented"
        )
    kcols = [F.col(k) for k in keys]
    w = (
        Window.partitionBy(*kcols)
        .orderBy(F.col("_day"))
        .rowsBetween(-(period // 2), period // 2)
    )
    base = df.select(
        *keys,
        F.col(day_col).alias("_day"),
        F.col(value_col).cast("bigint").alias("_v"),
    )
    t = base.withColumn(
        "_tsum",
        F.when(
            F.count("_v").over(w) == period, F.sum("_v").over(w)
        ).cast("bigint"),
    ).withColumn(
        "_phase",
        F.pmod(
            F.datediff(F.col("_day"), F.lit("1970-01-01").cast("date")),
            F.lit(period),
        ).cast("int"),
    ).withColumn(
        "_det", (F.lit(period) * F.col("_v") - F.col("_tsum")).cast("bigint")
    )
    seas = (
        t.where(F.col("_det").isNotNull())
        .groupBy(*keys, "_phase")
        .agg(
            F.sum("_det").cast("bigint").alias("_snum"),
            F.count(F.lit(1)).cast("bigint").alias("_scnt"),
        )
    )
    j = t.join(F.broadcast(seas), [*keys, "_phase"], "left")
    trend = F.col("_tsum").cast("double") / F.lit(float(period))
    seasonal = F.col("_snum").cast("double") / (
        F.lit(float(period)) * F.col("_scnt").cast("double")
    )
    residual = F.col("_v").cast("double") - trend - seasonal
    return j.select(
        *keys,
        F.col("_day").alias(day_col),
        F.col("_v").alias(value_col),
        F.round(trend, 6).alias("trend"),
        F.round(seasonal, 6).alias("seasonal"),
        F.round(residual, 6).alias("residual"),
    )


def calibration_report(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Classifier calibration (reliability) report: predictions bucketed
    into ``n_bins`` equal-width probability bins, each bin reporting
    count, positives, mean predicted probability, empirical positive
    rate, and the bin's Brier contribution — the "is 0.8 really 80%"
    diagnostic run on every quality/langid gate before its threshold is
    trusted (Brier 1950; reliability diagrams per Murphy 1973).

    Float discipline: probabilities are captured ONCE as exact integer
    micro-units (round(p·1e6) — the report's documented quantization);
    every aggregate is then an exact integer/decimal sum (Σp_micro,
    Σ(p_micro − y·1e6)² in decimal(38,0)) and the only float ops are
    the final divisions — no shuffle-order float sums. Bin assignment
    floor(p_micro·B/1e6) clamped to B−1 is pure integer arithmetic.
    ONE groupBy over ≤ n_bins groups; NULL probs/labels excluded.
    """
    pm = F.round(F.col(prob_col) * 1_000_000).cast("bigint")
    y = F.col(label_col).cast("bigint")
    binc = F.least(
        F.floor(pm * n_bins / 1_000_000).cast("int"), F.lit(n_bins - 1)
    )
    base = df.where(
        F.col(prob_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        binc.alias("bin"),
        pm.alias("_pm"),
        y.alias("_y"),
        ((pm - y * 1_000_000) * (pm - y * 1_000_000))
        .cast("decimal(38,0)")
        .alias("_sq"),
    )
    g = base.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("_y").cast("bigint").alias("n_pos"),
        F.sum("_pm").cast("bigint").alias("_spm"),
        F.sum("_sq").cast("decimal(38,0)").alias("_ssq"),
    )
    return g.select(
        "bin",
        "n",
        "n_pos",
        F.round(
            F.col("_spm").cast("double")
            / (F.lit(1e6) * F.col("n").cast("double")),
            6,
        ).alias("mean_pred"),
        F.round(
            F.col("n_pos").cast("double") / F.col("n").cast("double"), 6
        ).alias("frac_pos"),
        F.round(
            F.col("_ssq").cast("double")
            / (F.lit(1e12) * F.col("n").cast("double")),
            6,
        ).alias("brier"),
    )


def holt_forecast(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.25,
    horizon: int = 1,
) -> DataFrame:
    """Holt's linear (double) exponential smoothing per key: level
    l_t = α·y_t + (1−α)(l_{t−1}+b_{t−1}), trend b_t = β(l_t−l_{t−1})
    + (1−β)b_{t−1}, initialized l₁=y₁, b₁=y₂−y₁; returns the final
    (level, trend) state and the ``horizon``-step-ahead forecast
    l+h·b — the trend-aware upgrade of the EWMA row (which a trending
    series systematically lags).

    BOUNDED-SERIES contract (the theil_sen discipline): the recurrence
    is inherently sequential, so each key's series folds over its
    order-SORTED in-memory list — state per key is O(series length);
    run on pre-aggregated (e.g. daily) series, not raw events. The
    fold is a fixed-operand-order double recurrence over the sorted
    list — deterministic and engine-portable. Keys with < 2 points
    return NULLs (no trend is estimable).
    """
    a_, b_ = float(alpha), float(beta)
    lst = df.groupBy(*keys).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(order_col).alias("o"),
                    F.col(value_col).cast("double").alias("y"),
                )
            )
        ).alias("_l")
    )
    y1 = F.element_at("_l", 1)["y"]
    y2 = F.element_at("_l", 2)["y"]
    init = F.struct(
        y1.alias("l"), (y2 - y1).alias("b")
    )
    state = F.aggregate(
        F.slice(F.col("_l"), 2, F.greatest(F.size("_l") - 1, F.lit(0))),
        init,
        lambda acc, x: F.struct(
            (
                F.lit(a_) * x["y"]
                + F.lit(1.0 - a_) * (acc["l"] + acc["b"])
            ).alias("l"),
            (
                F.lit(b_)
                * (
                    F.lit(a_) * x["y"]
                    + F.lit(1.0 - a_) * (acc["l"] + acc["b"])
                    - acc["l"]
                )
                + F.lit(1.0 - b_) * acc["b"]
            ).alias("b"),
        ),
    )
    out = lst.select(
        *keys,
        F.size("_l").alias("n"),
        F.when(F.size("_l") >= 2, state).alias("_s"),
    )
    return out.select(
        *keys,
        "n",
        F.round(F.col("_s")["l"], 6).alias("level"),
        F.round(F.col("_s")["b"], 6).alias("trend"),
        F.round(
            F.col("_s")["l"] + F.lit(float(horizon)) * F.col("_s")["b"], 6
        ).alias("forecast"),
    )


def welch_ttest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    decimals: int = 2,
) -> DataFrame:
    """Welch's unequal-variance two-sample t-test on exactly two
    groups — the continuous-metric A/B readout beside
    two_proportion_ztest (conversions). t = (x̄1 − x̄2)/√(s1²/n1 +
    s2²/n2) with the Welch-Satterthwaite df; Welch 1947.

    Float discipline: values capture as integer units (round(v·10^d))
    so per-group (n, Σx, Σx²) are exact decimal(38,0) accumulators
    (silent-NULL overflow guarded); means/variances/t/df derive in ONE
    fixed-operand-order double expression — no shuffle-order float
    sums anywhere. Groups order by key (deterministic sign). Raises
    via assert_true on ≠ 2 groups or zero pooled variance.
    """
    unit = 10 ** decimals
    c = F.round(F.col(value_col) * unit).cast("decimal(19,0)")
    g = (
        df.where(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("grp"), c.alias("_c"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("_c").cast("decimal(38,0)")).alias("_sx"),
            F.sum((F.col("_c") * F.col("_c")).cast("decimal(38,0)")).alias(
                "_sxx"
            ),
        )
    )
    guarded = g.where(
        F.assert_true(
            F.col("_sx").isNotNull() & F.col("_sxx").isNotNull(),
            "welch_ttest: decimal accumulator overflowed — lower "
            "`decimals`",
        ).isNull()
    )
    one = guarded.agg(
        F.count(F.lit(1)).alias("_ng"),
        F.array_sort(
            F.collect_list(F.struct("grp", "n", "_sx", "_sxx"))
        ).alias("_l"),
    )
    one = one.where(
        F.assert_true(
            F.col("_ng") == 2, "welch_ttest: expected exactly two groups"
        ).isNull()
    )
    a, b = F.get("_l", 0), F.get("_l", 1)

    def _stats(s):
        n = s["n"].cast("double")
        sx = s["_sx"].cast("double") / F.lit(float(unit))
        sxx = s["_sxx"].cast("double") / F.lit(float(unit * unit))
        mean = sx / n
        # unbiased sample variance (n-1): (Σx² − (Σx)²/n) / (n−1)
        var = (sxx - sx * sx / n) / (n - F.lit(1.0))
        return n, mean, var

    n1, m1, v1 = _stats(a)
    n2, m2, v2 = _stats(b)
    se2 = v1 / n1 + v2 / n2
    one = one.where(
        F.assert_true(
            (a["n"] > 1) & (b["n"] > 1),
            "welch_ttest: each group needs at least 2 values",
        ).isNull()
    )
    t = (m1 - m2) / F.sqrt(se2)
    dof = (se2 * se2) / (
        (v1 / n1) * (v1 / n1) / (n1 - F.lit(1.0))
        + (v2 / n2) * (v2 / n2) / (n2 - F.lit(1.0))
    )
    return one.select(
        a["grp"].alias("group_a"),
        b["grp"].alias("group_b"),
        a["n"].alias("n_a"),
        b["n"].alias("n_b"),
        F.round(m1, 6).alias("mean_a"),
        F.round(m2, 6).alias("mean_b"),
        F.round(t, 6).alias("t"),
        F.round(dof, 6).alias("df"),
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) test on exactly two groups —
    the distribution-free complement of welch_ttest (outlier-heavy or
    non-normal metrics). U_a = R_a − n_a(n_a+1)/2 with midranks for
    ties; z uses the normal approximation WITH the tie correction:
    σ² = (n_a·n_b/12)·((N+1) − Σ(t³−t)/(N(N−1))).

    Exactness: values quantize to integer units once; joint ranking
    runs through the distributed ``_two_phase_rank`` (range partition +
    local rank + prefix offsets — never a single-partition window);
    midranks stay EXACT by carrying DOUBLED ranks (2·midrank = lo+hi,
    an integer — lo/hi are each tie block's min/max row rank), so
    R_a, U_a and the tie term are exact decimal(38,0) sums and the
    z statistic is one fixed-operand-order double expression. Groups
    order by key (deterministic sign); raises on ≠ 2 groups.
    """
    unit = 10 ** decimals
    c = F.round(F.col(value_col) * unit).cast("bigint")
    base = (
        df.where(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("grp"), c.alias("_c"))
    )
    ranked = _two_phase_rank(base.select(F.col("_c").alias("v")), "v", None)
    # per distinct value: tie-block min/max rank and size
    vstats = ranked.groupBy("_v").agg(
        F.min("_rank").cast("decimal(38,0)").alias("_lo"),
        F.max("_rank").cast("decimal(38,0)").alias("_hi"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_t"),
    )
    gv = base.groupBy("grp", F.col("_c").alias("_v")).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_ng")
    )
    j = gv.join(vstats, "_v")
    per_group = j.groupBy("grp").agg(
        F.sum(F.col("_ng")).cast("decimal(38,0)").alias("_n"),
        F.sum(F.col("_ng") * (F.col("_lo") + F.col("_hi")))
        .cast("decimal(38,0)")
        .alias("_r2"),  # doubled rank sum
    )
    ties = vstats.agg(
        F.sum(F.col("_t") * F.col("_t") * F.col("_t") - F.col("_t"))
        .cast("decimal(38,0)")
        .alias("_tie")
    )
    one = per_group.agg(
        F.count(F.lit(1)).alias("_ng2"),
        F.array_sort(F.collect_list(F.struct("grp", "_n", "_r2"))).alias(
            "_l"
        ),
    ).crossJoin(F.broadcast(ties))
    one = one.where(
        F.assert_true(
            F.col("_ng2") == 2, "mann_whitney_u: expected exactly two groups"
        ).isNull()
    )
    a, b = F.get("_l", 0), F.get("_l", 1)
    n1d, n2d = a["_n"].cast("double"), b["_n"].cast("double")
    nd = n1d + n2d
    # doubled U: 2U = 2R − n(n+1); halves are exact binary fractions
    u_a = (
        a["_r2"].cast("double") - n1d * (n1d + F.lit(1.0))
    ) / F.lit(2.0)
    mu = n1d * n2d / F.lit(2.0)
    sigma2 = (
        n1d * n2d / F.lit(12.0)
    ) * (
        (nd + F.lit(1.0))
        - F.col("_tie").cast("double") / (nd * (nd - F.lit(1.0)))
    )
    one = one.where(
        F.assert_true(
            (a["_n"] > 0) & (b["_n"] > 0),
            "mann_whitney_u: both groups need values",
        ).isNull()
    )
    z = (u_a - mu) / F.sqrt(sigma2)
    return one.select(
        a["grp"].alias("group_a"),
        b["grp"].alias("group_b"),
        a["_n"].cast("bigint").alias("n_a"),
        b["_n"].cast("bigint").alias("n_b"),
        F.round(u_a, 6).alias("u_a"),
        F.round(z, 6).alias("z"),
    )


def ks_test_2samp(
    df: DataFrame,
    group_col: str,
    value_col: str,
    decimals: int = 6,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic D = max|F̂₁(v) − F̂₂(v)| —
    the whole-distribution complement of welch_ttest (means) and
    mann_whitney_u (ranks): detects shape/scale shifts equal means
    hide. No p-value by design (the chi_square precedent): D plus the
    standard threshold scale √((n₁+n₂)/(n₁n₂)) are returned and the
    caller applies c(α).

    EXACT: values quantize to integer units; per-distinct-value group
    counts reduce once; cumulative counts run range-partitioned (local
    window + broadcast prefix offsets — the two-phase-rank pattern,
    never a one-partition window over the value stream); the max of
    |cum₁·n₂ − cum₂·n₁| is an exact decimal(38,0) integer maximum, so
    D = max/(n₁·n₂) is bit-deterministic with ONE final division.
    Groups order by key; raises on ≠ 2 groups.
    """
    unit = 10 ** decimals
    c = F.round(F.col(value_col) * unit).cast("bigint")
    base = (
        df.where(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("grp"), c.alias("_v"))
    )
    groups = base.select("grp").distinct()
    n_groups = groups.count()
    if n_groups != 2:
        raise ValueError(
            f"ks_test_2samp: expected exactly two groups, got {n_groups}"
        )
    ga, gb = [r.grp for r in groups.orderBy("grp").collect()]
    vstats = base.groupBy("_v").agg(
        F.sum((F.col("grp") == F.lit(ga)).cast("long"))
        .cast("bigint")
        .alias("_c1"),
        F.sum((F.col("grp") == F.lit(gb)).cast("long"))
        .cast("bigint")
        .alias("_c2"),
    )
    ranged = vstats.repartitionByRange("_v").withColumn(
        "_pid", F.spark_partition_id()
    )
    wl = (
        Window.partitionBy("_pid")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = ranged.withColumn("_l1", F.sum("_c1").over(wl)).withColumn(
        "_l2", F.sum("_c2").over(wl)
    )
    ptot = local.groupBy("_pid").agg(
        F.sum("_c1").alias("_p1"), F.sum("_c2").alias("_p2")
    )
    woff = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = ptot.select(
        "_pid",
        F.coalesce(F.sum("_p1").over(woff), F.lit(0)).alias("_o1"),
        F.coalesce(F.sum("_p2").over(woff), F.lit(0)).alias("_o2"),
    )
    cum = local.join(F.broadcast(offsets), "_pid").select(
        (F.col("_l1") + F.col("_o1")).cast("decimal(38,0)").alias("_f1"),
        (F.col("_l2") + F.col("_o2")).cast("decimal(38,0)").alias("_f2"),
    )
    totals = base.groupBy().agg(
        F.sum((F.col("grp") == F.lit(ga)).cast("long"))
        .cast("decimal(38,0)")
        .alias("_n1"),
        F.sum((F.col("grp") == F.lit(gb)).cast("long"))
        .cast("decimal(38,0)")
        .alias("_n2"),
    )
    agg = cum.crossJoin(F.broadcast(totals)).agg(
        F.max(
            F.abs(F.col("_f1") * F.col("_n2") - F.col("_f2") * F.col("_n1"))
        ).alias("_m"),
        F.first("_n1").alias("_n1"),
        F.first("_n2").alias("_n2"),
    )
    n1d, n2d = F.col("_n1").cast("double"), F.col("_n2").cast("double")
    return agg.select(
        F.lit(ga).alias("group_a"),
        F.lit(gb).alias("group_b"),
        F.col("_n1").cast("bigint").alias("n_a"),
        F.col("_n2").cast("bigint").alias("n_b"),
        F.round(
            F.col("_m").cast("double") / (n1d * n2d), 6
        ).alias("d_stat"),
        F.round(F.sqrt((n1d + n2d) / (n1d * n2d)), 6).alias(
            "threshold_scale"
        ),
    )
