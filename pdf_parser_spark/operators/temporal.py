"""Temporal operators: as-of join and gap-based sessionization.

Spark has no built-in ASOF JOIN (kdb/DuckDB/Flink all ship one); the naive
re-expression — a range theta-join then max-per-left-row — explodes to
O(|L| * matching-range) rows. The scalable re-expression used here is the
tagged-union trick:

    union(left tagged, right tagged)
      -> one hash shuffle on the join key
      -> in-partition sort by (event time, right-before-left tiebreak)
      -> last(payload, ignoreNulls) running window
      -> keep left rows

One shuffle per side, zero row explosion, and the window is a running
(rows-unbounded-preceding) frame, so it streams in sort order without
buffering the partition — the same shape Flink's event-time temporal join
lowers to. Sessionization is the standard lag/gap/cumsum window stack, all
JVM expressions.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join", "sessionize", "session_stats"]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
) -> DataFrame:
    """Range (interval) join: pair each left row with the right rows of the
    same key whose right_ts lies in [left_ts + lower, left_ts + upper].

    Spark lacks a native range join; the naive form is an equi-join on key
    followed by a time theta-filter, which inside one hot key degenerates to
    |L_k| x |R_k| comparisons. This re-expression uses time BINNING: both
    sides bucket into bins of the window width, a left row explodes to the
    (at most two) bins its window overlaps, and the join key becomes
    (key, bin) — so each comparison happens only between rows at most one
    window apart, the standard interval-join lowering (Flink's interval
    join and Databricks' range-join optimization do the same). The exact
    predicate filters the bin-neighbour false positives afterwards.

    Returns left columns + right columns (right_ts column included) for the
    matching pairs; aggregate downstream as needed.
    """
    if upper_seconds <= lower_seconds:
        raise ValueError("upper_seconds must be > lower_seconds")
    width_us = (upper_seconds - lower_seconds) * 1_000_000
    lo_us = lower_seconds * 1_000_000
    up_us = upper_seconds * 1_000_000
    lt = F.unix_micros(F.col(left_ts).cast("timestamp"))
    rt = F.unix_micros(F.col(right_ts).cast("timestamp"))
    l2 = left.withColumn(
        "_bin",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((lt + lo_us) / width_us),
                    F.floor((lt + up_us) / width_us),
                )
            )
        ),
    )
    r2 = right.withColumn("_bin", F.floor(rt / width_us))
    joined = l2.join(r2, [key, "_bin"]).drop("_bin")
    lt_j = F.unix_micros(F.col(left_ts).cast("timestamp"))
    rt_j = F.unix_micros(F.col(right_ts).cast("timestamp"))
    return joined.where(
        (rt_j >= lt_j + lo_us) & (rt_j <= lt_j + up_us)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: List[str],
    tolerance_seconds: Optional[int] = None,
) -> DataFrame:
    """For each left row, attach payload_cols from the LATEST right row of
    the same key with right_ts <= left_ts (inclusive, like DuckDB ASOF with
    >=). Left rows with no prior right row keep NULL payloads.

    `key` must be the same column name on both sides (rename before the
    call). If the right side can hold several rows per (key, right_ts),
    dedupe it first — at-or-before ties are otherwise ambiguous in ANY asof
    implementation. tolerance_seconds nulls out matches older than the
    window (the kdb `tolerance` / Flink interval semantics).
    """
    lcols = left.columns
    # the tagged union below places left columns and right payloads side by
    # side — a payload name colliding with a left column (or left_ts being
    # the key) would otherwise surface as an opaque AMBIGUOUS_REFERENCE
    # analysis error deep inside the window stage
    clash = [c for c in payload_cols if c in lcols]
    if clash:
        raise ValueError(
            f"payload_cols {clash} collide with left columns; rename them on "
            "the right side before asof_join"
        )
    if left_ts == key:
        raise ValueError("left_ts must differ from key")
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)
    tagged_l = left.select(
        *lcols,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(rtypes[c]).alias(c) for c in payload_cols],
        F.lit(None).cast("timestamp").alias("_rt"),
    )
    tagged_r = right.select(
        *[
            F.col(key) if c == key else F.lit(None).cast(ltypes[c]).alias(c)
            for c in lcols
        ],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        *payload_cols,
        F.col(right_ts).cast("timestamp").alias("_rt"),
    )
    # right rows (_is_left=0) sort BEFORE left rows at an equal timestamp,
    # which is exactly the inclusive (>=) match semantics
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = tagged_l.unionByName(tagged_r)
    for c in payload_cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    out = out.withColumn("_mt", F.last(F.col("_rt"), ignorenulls=True).over(w))
    if tolerance_seconds is not None:
        stale = (
            F.unix_micros(F.col("_t").cast("timestamp"))
            - F.unix_micros(F.col("_mt"))
        ) > tolerance_seconds * 1_000_000
        for c in payload_cols:
            out = out.withColumn(
                c, F.when(stale, F.lit(None).cast(rtypes[c])).otherwise(F.col(c))
            )
    return out.where(F.col("_is_left") == 1).drop("_t", "_is_left", "_rt", "_mt")


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based session assignment: a new session starts when the gap to
    the previous event of the same user exceeds gap_seconds.

    lag + cumulative-sum windows over one (user) shuffle; microsecond-exact
    gap arithmetic (unix_micros) so engines cannot disagree on boundaries.
    Adds `session_idx` (1-based per user).
    """
    order = [F.col(ts_col).asc(), F.col(id_col).asc()]
    w = Window.partitionBy(user_col).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(F.col(ts_col)).over(w)
    # cast handles TIMESTAMP_NTZ parquet columns; both sides of the gap get
    # the same zone shift so differences are unaffected
    micros = lambda c: F.unix_micros(c.cast("timestamp"))
    new_sess = F.when(
        prev.isNull() | ((micros(F.col(ts_col)) - micros(prev))
                         > gap_seconds * 1_000_000),
        1,
    ).otherwise(0)
    return events.withColumn("session_idx", F.sum(new_sess).over(run))


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session rollup: bounds, event count, and total value (in cents so
    the float sum order can never flip a comparison)."""
    s = sessionize(events, user_col, ts_col, id_col, gap_seconds)
    return s.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.round(F.sum(value_col) * 100).cast("long").alias("total_value_cents"),
    )
