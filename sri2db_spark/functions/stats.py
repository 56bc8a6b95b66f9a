"""Time-series and robust-statistics operators.

Everything here is pure built-in-function DataFrame planning (whole-stage
codegen, no Python in the hot path) and engineered for bit-exact determinism
at any parallelism:

- windowed sums go through decimal (order-independent) and come back as
  double, mirroring :func:`sri2db_spark.plans.analytics.dsum`;
- correlation is computed from exact decimal moment sums, never from the
  order-dependent streaming ``corr``/``stddev`` aggregates;
- every window order has a total tie-break.

Scale notes (100 TB): each operator is a single keyed shuffle (the window
partition key or the groupBy key); nothing collects to the driver and no
operator joins the fact table against itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dsum(col: Column, scale: str = "decimal(18,4)") -> Column:
    return F.sum(col.cast(scale)).cast("double")


def rolling_mean(
    df: DataFrame,
    part_cols: list[str],
    order_cols: list[str],
    value_col: str,
    n: int,
) -> DataFrame:
    """Trailing-``n``-rows mean of ``value_col`` per partition.

    The frame sum is decimal-exact, so the mean is bit-stable regardless of
    partition layout. One shuffle on ``part_cols``. The reference has no
    windowed analytics; this extends its diagnostic aggregates
    (/root/reference/src/lib/client.js:1580-1620) to ordered history.
    """
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*order_cols)
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    frame_sum = F.sum(F.col(value_col).cast("decimal(18,4)")).over(w).cast("double")
    frame_n = F.count(F.lit(1)).over(w)
    return df.withColumn("roll_mean", frame_sum / frame_n).withColumn(
        "frame_n", frame_n
    )


def activity_streaks(
    df: DataFrame, entity_col: str, day_col: Column
) -> DataFrame:
    """Gaps-and-islands: longest run of consecutive active days per entity.

    ``day_col`` must evaluate to an integer day index. Classic
    ``day - row_number()`` island key; two window passes over the same
    partitioning (one shuffle), then one tiny aggregate.
    """
    days = df.select(F.col(entity_col).alias("entity"), day_col.alias("day")).distinct()
    w = Window.partitionBy("entity").orderBy("day")
    islands = days.withColumn(
        "island", F.col("day") - F.row_number().over(w)
    )
    streaks = islands.groupBy("entity", "island").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return (
        streaks.groupBy("entity")
        .agg(
            F.sum("streak_len").alias("n_days"),
            F.max("streak_len").alias("longest_streak"),
        )
        .select(
            F.col("entity").alias(entity_col), "n_days", "longest_streak"
        )
    )


def winsorize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Per-group percentile clipping (robust outlier handling).

    Exact interpolated percentiles (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``, verified bit-identical by the percentiles_by_type
    oracle), broadcast back onto the facts, then a decimal-exact clipped sum.
    Two shuffles: the percentile agg and the final group agg; the join is a
    broadcast (|groups| rows).
    """
    bounds = df.groupBy(group_col).agg(
        F.percentile(value_col, F.lit(lo)).alias("p_lo"),
        F.percentile(value_col, F.lit(hi)).alias("p_hi"),
    )
    clipped = F.least(F.greatest(F.col(value_col), F.col("p_lo")), F.col("p_hi"))
    return (
        df.join(F.broadcast(bounds), group_col)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("p_lo").alias("p_lo"),
            F.min("p_hi").alias("p_hi"),
            _dsum(clipped).alias("clipped_sum"),
        )
    )


def exact_corr(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    x_scale: int,
    y_scale: int,
) -> DataFrame:
    """Pearson correlation from exact integer moment sums.

    Spark's ``corr`` (like DuckDB's) folds doubles in partition order —
    non-deterministic under repartitioning. Here n, Σx, Σy, Σxy, Σx², Σy²
    are accumulated exactly (order-independent), and the final formula runs
    once per group in double. One shuffle (map-side combined).

    ``x_scale``/``y_scale`` are REQUIRED — the caller must state each
    column's true decimal places (k): the column is multiplied by 10^k
    and ROUNDED, so every operand is an exact integer. An understated
    scale silently quantizes the data (e.g. values in [0, 1) with scale 0
    collapse to {0, 1} and the correlation is garbage) — there is no safe
    default, which is why none is offered. Correlation is invariant
    under positive affine rescaling, so the result is unchanged — but the
    moment arithmetic is now plain integer decimals whose widths sit well
    below every engine's 38-digit cap (products are width 36/37 under
    either the p1+p2 or p1+p2+1 decimal product rule).

    Output schema is ALL-INTEGER — no decimal or double column crosses an
    engine boundary, because a double→decimal cast's rounding mode
    (HALF_UP vs HALF_EVEN at the final digit) is engine-version-dependent
    and flipped cross-engine value hashes twice (CORRECTNESS_r07/r08):

    - ``n`` BIGINT — count of PAIRWISE-COMPLETE rows (both x and y
      non-null), the standard correlation semantics (Spark's ``corr``
      and SQL's ``CORR`` likewise skip incomplete pairs); a group with
      no complete pair yields n=0 and a NULL ``corr_e8``.
    - ``corr_e8`` BIGINT — the Pearson coefficient quantized to 8 decimal
      places via FLOOR(corr*1e8 + 0.5) (round-half-up, engine-invariant
      pure-double arithmetic; NULL on zero variance). 1e-8 quantization is
      ~7 orders of magnitude above the decimal→double cast noise floor of
      the moment sums.
    - ``sx_m sy_m sxy_m sx2_m sy2_m`` BIGINT — each exact moment sum
      modulo 1e18 (the sums themselves can exceed int64). Exact integer
      arithmetic both sides; a future mismatch self-localizes to one
      moment column instead of one opaque hash.

    Overflow fails LOUDLY (never a silently skewed statistic). Under ANSI
    semantics (Spark 4's default) the decimal cast/SUM raises directly;
    with ANSI off they would instead null the operand / the accumulator
    and SUM would skip rows — that silent path is closed by counting
    nulled casts and checking sum-nullity in the same aggregation, raised
    via ``assert_true`` at execution time.
    """
    # pairwise-complete mask FIRST (standard corr semantics): a NULL input
    # is a skipped pair, never an overflow — without the mask, an all-NULL
    # group's legitimately-NULL moment sums would trip the overflow guard
    # (review r9 finding, confirmed live).
    complete = F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    # round() before the cast: the inputs are doubles carrying ~1e-9
    # representation noise around exact integers; never near .5, so the
    # rounding mode is irrelevant.
    x = F.when(
        complete, F.round(F.col(x_col) * F.lit(float(10**x_scale)), 0)
    ).cast("decimal(18,0)")
    y = F.when(
        complete, F.round(F.col(y_col) * F.lit(float(10**y_scale)), 0)
    ).cast("decimal(18,0)")
    mod = F.lit(10**18)
    moments = df.groupBy(group_col).agg(
        F.sum(F.when(complete, 1).otherwise(0)).alias("n_rows"),
        F.sum(x).alias("sx_d"),
        F.sum(y).alias("sy_d"),
        F.sum(x * y).alias("sxy_d"),
        F.sum(x * x).alias("sx2_d"),
        F.sum(y * y).alias("sy2_d"),
        # complete pairs whose decimal(18,0) cast nulled the scaled value —
        # i.e. |v * 10^scale| >= 1e18 operand overflow
        F.sum(F.when(x.isNull() & complete, 1).otherwise(0)).alias("x_ovf"),
        F.sum(F.when(y.isNull() & complete, 1).otherwise(0)).alias("y_ovf"),
    )
    # a moment sum that is NULL despite complete pairs = the decimal(38,0)
    # accumulator overflowed (Spark's non-ANSI SUM nulls out instead of
    # raising); either overflow class raises at execution time
    has_rows = F.col("n_rows") > F.lit(0)
    ok = (
        (F.col("x_ovf") == 0)
        & (F.col("y_ovf") == 0)
        & (~has_rows | F.col("sxy_d").isNotNull())
        & (~has_rows | F.col("sx2_d").isNotNull())
        & (~has_rows | F.col("sy2_d").isNotNull())
    )
    # the guard is a FILTER on the moments frame (always-true when the
    # assert passes, raises at execution time otherwise) rather than an
    # expression anchored to one projected column: a downstream
    # .select("n") would let Catalyst prune a projection-anchored guard
    # away together with the column it rides on, silently reintroducing
    # the overflow-skew path the guard exists to close (ADVICE r9). A
    # Filter node's condition is evaluated for every row regardless of
    # which output columns the caller keeps.
    moments = moments.filter(
        F.assert_true(
            ok,
            F.lit(
                "exact_corr: decimal overflow — an operand exceeded 10^18 "
                "after scaling, or a moment sum exceeded decimal(38,0); the "
                "statistic would be silently wrong. Reduce x_scale/y_scale "
                "or pre-filter."
            ),
        ).isNull()
    )
    n = F.col("n_rows").cast("double")
    sx, sy = F.col("sx_d").cast("double"), F.col("sy_d").cast("double")
    cov = F.col("sxy_d").cast("double") * n - sx * sy
    vx = F.col("sx2_d").cast("double") * n - sx * sx
    vy = F.col("sy2_d").cast("double") * n - sy * sy
    # zero variance (constant column, or any single-pair group) has no
    # defined correlation: emit NULL. The gate must run BEFORE the divide —
    # under ANSI (Spark 4's default) a bare cov/0.0 aborts the whole job
    # with DIVIDE_BY_ZERO for one degenerate group (review r9, confirmed
    # live); `> 0` also catches a pathological tiny-negative vx from
    # double rounding of the exact sums, whose sqrt would be NaN.
    defined = (vx > F.lit(0.0)) & (vy > F.lit(0.0))
    corr = cov / (F.sqrt(vx) * F.sqrt(vy))
    return moments.select(
        group_col,
        F.col("n_rows").cast("bigint").alias("n"),
        F.when(defined, F.floor(corr * F.lit(1e8) + F.lit(0.5)))
        .cast("bigint")
        .alias("corr_e8"),
        (F.col("sx_d") % mod).cast("bigint").alias("sx_m"),
        (F.col("sy_d") % mod).cast("bigint").alias("sy_m"),
        (F.col("sxy_d") % mod).cast("bigint").alias("sxy_m"),
        (F.col("sx2_d") % mod).cast("bigint").alias("sx2_m"),
        (F.col("sy2_d") % mod).cast("bigint").alias("sy2_m"),
    )


def expectation_report(
    df: DataFrame, checks: dict[str, Column]
) -> DataFrame:
    """Data-quality expectations: each check is a boolean Column flagging a
    VIOLATION; the report is one row per check with violation / total counts.

    One pass over the data (single agg, no shuffle beyond the final
    single-row exchange), then an unpivot of the tiny result. Mirrors the
    reference's post-sync count diagnostics
    (/root/reference/src/lib/client.js:1580-1620) generalized to predicates.
    """
    aggs = [F.count(F.lit(1)).alias("__total")] + [
        F.sum(F.when(cond, 1).otherwise(0)).alias(name)
        for name, cond in checks.items()
    ]
    wide = df.agg(*aggs)
    pairs = ", ".join(f"'{name}', `{name}`" for name in checks)
    return wide.selectExpr(
        f"stack({len(checks)}, {pairs}) as (check_name, violations)",
        "__total as total",
    ).select(
        "check_name",
        "violations",
        "total",
        (F.col("violations").cast("double") / F.col("total")).alias("violation_rate"),
    )
