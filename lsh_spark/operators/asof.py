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
              suffix: str = "_asof") -> DataFrame:
    """For every left row: columns of the latest right row with
    right.ts <= left.ts and equal ``on`` key (nulls when none).

    Output: all left columns + ``<value_col><suffix>`` per value column +
    ``<right_ts><suffix>``.
    """
    lcols = left.columns
    l = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    r = right.withColumn("__side", F.lit(0)).withColumn("__ts", F.col(right_ts))
    carried = [right_ts] + list(value_cols)
    r_sel = [F.col(on), F.col("__side"), F.col("__ts")] + [
        F.col(c).alias(f"__carry_{c}") for c in carried]
    l_sel = [F.col(c) for c in lcols] + [F.col("__side"), F.col("__ts")] + [
        F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__carry_{c}")
        for c in carried]
    u = l.select(*l_sel).unionByName(r.select(*r_sel), allowMissingColumns=True)
    # right rows sort before left rows at equal ts (__side 0 < 1) so an
    # exactly-simultaneous right row is visible to the left row
    w = (Window.partitionBy(on).orderBy("__ts", "__side")
         .rowsBetween(Window.unboundedPreceding, 0))
    for c in carried:
        u = u.withColumn(f"__last_{c}",
                         F.last(f"__carry_{c}", ignorenulls=True).over(w))
    out = u.filter(F.col("__side") == 1).select(
        *lcols,
        *[F.col(f"__last_{c}").alias(f"{c}{suffix}") for c in carried])
    return out


def tumbling_window_agg(events: DataFrame, every: str = "1 hour",
                        ts_col: str = "ts") -> DataFrame:
    """Tumbling-window counts/sums per event_type — the batch twin of the
    streaming windowed aggregation (streaming/dedup_stream.py)."""
    bucket = F.date_trunc("hour", F.col(ts_col)) if every == "1 hour" \
        else F.window(ts_col, every)["start"]
    return (events.groupBy(bucket.alias("window_start"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value")))
