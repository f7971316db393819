"""As-of (most-recent-prior) join — the union + carry-forward formulation.

Spark has no native as-of join; the naive range self-join explodes. The
scale-correct decomposition (also what pandas merge_asof does logically):
tag both sides, UNION them, sort within the join key by event time, and
carry the right side's latest value forward with last(..., ignorenulls)
over an unbounded-preceding window — exactly ONE shuffle on the join key,
no pair explosion, whole-stage-codegen window execution.

Not in the reference (no temporal joins there); part of the engine's
general OLAP surface (SURVEY.md guide: as-of/range joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              value_cols: tuple[str, ...] = (),
              suffix: str = "_asof",
              right_order_cols: tuple[str, ...] = ()) -> DataFrame:
    """For every left row: columns of the latest right row with
    right.ts <= left.ts and equal ``on`` key (nulls when none).

    Output: all left columns + ``<value_col><suffix>`` per value column +
    ``<right_ts><suffix>``.

    Row-atomicity: all carried columns travel as ONE struct through a single
    ``last(ignorenulls)``, so the output is always a slice of one actual
    right row — never a per-column mix of different right rows (pandas
    merge_asof semantics; per-column backfill would mix rows whenever a
    right row holds NULL in one value column).

    Determinism: equal-ts right rows are tie-broken ascending by
    ``right_order_cols`` (default: the carried values themselves), and the
    LAST one wins — matching ``ORDER BY ts, <order_cols>`` + last_value in
    SQL engines.
    """
    lcols = left.columns
    carried = [right_ts] + list(value_cols)
    tie_cols = list(right_order_cols) if right_order_cols else carried
    r = right.select(
        F.col(on), F.lit(0).alias("__side"), F.col(right_ts).alias("__ts"),
        F.struct(*[F.col(c).alias(c) for c in carried]).alias("__carry"),
        F.struct(*[F.col(c).alias(f"t{i}") for i, c in enumerate(tie_cols)])
         .alias("__tie"))
    carry_type = dict(r.dtypes)["__carry"]
    tie_type = dict(r.dtypes)["__tie"]
    l = left.select(
        *[F.col(c) for c in lcols],
        F.lit(1).alias("__side"), F.col(left_ts).alias("__ts"),
        F.lit(None).cast(carry_type).alias("__carry"),
        F.lit(None).cast(tie_type).alias("__tie"))
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows sort before left rows at equal ts (__side 0 < 1) so an
    # exactly-simultaneous right row is visible to the left row; among
    # equal-ts right rows the tie struct orders them (nulls_first keeps
    # left rows after right ones regardless — __side already separates)
    w = (Window.partitionBy(on)
         .orderBy(F.col("__ts"), F.col("__side"), F.asc_nulls_last("__tie"))
         .rowsBetween(Window.unboundedPreceding, 0))
    u = u.withColumn("__last", F.last("__carry", ignorenulls=True).over(w))
    return u.filter(F.col("__side") == 1).select(
        *lcols,
        *[F.col(f"__last.{c}").alias(f"{c}{suffix}") for c in carried])


def tumbling_window_agg(events: DataFrame, every: str = "1 hour",
                        ts_col: str = "ts") -> DataFrame:
    """Tumbling-window counts/sums per event_type — the batch twin of the
    streaming windowed aggregation (streaming/dedup_stream.py)."""
    bucket = F.date_trunc("hour", F.col(ts_col)) if every == "1 hour" \
        else F.window(ts_col, every)["start"]
    return (events.groupBy(bucket.alias("window_start"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value")))
