"""Temporal operators the built-in set lacks: as-of join, banded range
join, forward fill, and ordered-funnel matching.

All are compositions of existing DataFrame ops (the preferred strategy
for custom operators): no UDFs, no mapPartitions — key-partitioned
plans that survive 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def asof_join_union(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: dict[str, str],
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right_ts <= left_ts within the same ``on`` key.

    Implementation: union both sides tagged, sort per key by (ts, side),
    carry the last-seen right payload forward with last(ignorenulls) over
    an unbounded-preceding window, keep left rows.  ONE shuffle on the
    key — no join explosion, no range duplication; this is the canonical
    scalable as-of (vs a naive join+filter+max which shuffles the cross
    product).  Right rows sort BEFORE left rows at equal timestamps, so a
    tie counts as "at or before".

    right_payload: {right_col: out_col} columns to carry.
    """
    lcols = [c for c in left.columns]
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        *[F.lit(None).cast(right.schema[rc].dataType).alias(oc)
          for rc, oc in right_payload.items()],
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields
            ) + ">"
        ).alias("_l"),
        *[F.col(rc).alias(oc) for rc, oc in right_payload.items()],
    )
    # total order: ties between right rows resolve on the payload columns
    # (ascending, so last() picks the greatest — matching the SQL
    # last_value over ORDER BY ts, side, id); left-row payloads are NULL
    # and their relative order cannot change the carried value.
    w = (
        W.partitionBy("_k")
        .orderBy(
            "_ts",
            "_side",
            *[F.col(oc).asc_nulls_first() for oc in right_payload.values()],
        )
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = l.unionByName(r).select(
        "_side",
        "_l",
        *[F.last(oc, ignorenulls=True).over(w).alias(oc) for oc in right_payload.values()],
    )
    out = filled.filter(F.col("_side") == 1)
    return out.select(
        *[F.col("_l")[c].alias(c) for c in lcols],
        *[F.col(oc) for oc in right_payload.values()],
    )


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_lo: Column,
    right_hi: Column,
    band_width: float,
) -> DataFrame:
    """Value-range join: pair left rows with right rows whose
    [right_lo, right_hi] interval contains left_val.

    Scale path: quantize values into fixed-width bands; each right row
    explodes into the bands its interval covers (interval width / band
    width copies — bounded by construction), then a plain EQUI-join on the
    band id followed by the exact range filter.  Turns an O(N*M) theta
    join into a shuffle join with bounded fan-out; Catalyst sees an
    ordinary equi-join so AQE/broadcast still apply.
    """
    lo_band = F.floor(right_lo / band_width).cast("long")
    hi_band = F.floor(right_hi / band_width).cast("long")
    r = right.withColumn("_band", F.explode(F.sequence(lo_band, hi_band))).withColumn(
        "_lo", right_lo
    ).withColumn("_hi", right_hi)
    l = left.withColumn(
        "_band", F.floor(F.col(left_val) / band_width).cast("long")
    )
    return (
        l.join(r, "_band")
        .filter(F.col(left_val).between(F.col("_lo"), F.col("_hi")))
        .drop("_band", "_lo", "_hi")
    )


def forward_fill(
    df: DataFrame,
    partition_cols: list[str],
    order_cols: list[str],
    cols: list[str],
) -> DataFrame:
    """Carry the last non-null value forward within each partition.

    The gap-fill every feature pipeline needs (sparse sensor readings,
    sessionized attributes): ``last(ignorenulls)`` over an
    unbounded-preceding row frame.  Partitioned window — each key's
    history fills independently, so the plan is one shuffle on the
    partition key regardless of total size.
    """
    w = (
        W.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return df.withColumns(
        {c: F.last(F.col(c), ignorenulls=True).over(w) for c in cols}
    )


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel: earliest strictly-increasing event chain per user.

    For steps [s1, s2, ...]: t1 = min ts of s1; t_i = min ts of s_i
    AFTER t_{i-1}.  Emits one row per user who completed step 1, with
    t1..tn (NULL once the chain breaks) and ``funnel_depth``.

    Plan shape: per step one filtered aggregate joined to the previous
    frontier — k-1 equi-joins + k map-side-combinable min-aggregates,
    all keyed by user.  The per-step filter prunes to that step's events
    BEFORE the shuffle, so each stage moves only its own step's rows —
    no window over full per-user histories, no event-list collection.
    """
    assert len(steps) >= 1, "funnel needs at least one step"
    prev = (
        df.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    out = prev
    for i, s in enumerate(steps[1:], start=2):
        nxt = (
            df.filter(F.col(type_col) == s)
            .select(user_col, F.col(ts_col).alias("_ts"))
            .join(prev.select(user_col, f"t{i - 1}"), user_col)
            .filter(F.col("_ts") > F.col(f"t{i - 1}"))
            .groupBy(user_col)
            .agg(F.min("_ts").alias(f"t{i}"))
        )
        out = out.join(nxt, user_col, "left")
        prev = nxt
    depth = F.lit(1)
    for i in range(2, len(steps) + 1):
        depth = depth + F.col(f"t{i}").isNotNull().cast("int")
    return out.withColumn("funnel_depth", depth)


def scd2_intervals(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Slowly-changing-dimension (type 2) interval builder.

    Turns a change-event stream into validity intervals: one row per
    (key, change) with ``valid_from`` = the change's order value,
    ``valid_to`` = the NEXT change's (NULL while current), plus
    ``is_current``.  Consecutive events with UNCHANGED values collapse
    into one interval (the run-suppression every SCD2 loader needs).

    Plan: one partitioned window for the change detection (lag), a
    filter, then one more window for the interval close (lead) — two
    passes over each key's history, no self-join, no global sort.
    """
    w = W.partitionBy(*key_cols).orderBy(*order_cols)
    changed = F.lit(False)
    for c in value_cols:
        prev = F.lag(F.col(c)).over(w)
        changed = changed | ~(
            prev.eqNullSafe(F.col(c))
        )  # first row: lag NULL != value -> True unless value NULL too
    # the very first event of a key always opens an interval
    first = F.row_number().over(w) == 1
    starts = df.withColumn("_open", first | changed).filter(F.col("_open"))
    w2 = W.partitionBy(*key_cols).orderBy(*order_cols)
    open_col = order_cols[0]
    return (
        starts.withColumn("valid_from", F.col(open_col))
        .withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("_open")
    )


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    value_cols: list[str],
) -> DataFrame:
    """MERGE-INTO semantics as a full outer join: updates win, and every
    output row is labeled ``merge_action`` in {insert, update,
    unchanged} (delete is expressing an absent update — callers filter).

    The change-data-capture primitive: one shuffle on the key (or zero
    with bucketed tables), conditional projection — no driver loops, no
    row-at-a-time logic.
    """
    b = base.select(key, *value_cols, F.lit(True).alias("_in_b"))
    u = updates.select(
        key,
        *[F.col(c).alias(f"_u_{c}") for c in value_cols],
        F.lit(True).alias("_in_u"),
    )
    j = b.join(u, key, "full_outer")
    any_diff = F.lit(False)
    for c in value_cols:
        any_diff = any_diff | ~F.col(f"_u_{c}").eqNullSafe(F.col(c))
    action = (
        F.when(F.col("_in_u").isNull(), F.lit("unchanged"))  # base only
        .when(F.col("_in_b").isNull(), F.lit("insert"))  # brand new key
        .when(any_diff, F.lit("update"))
        .otherwise(F.lit("unchanged"))
    )
    out_vals = [
        F.when(F.col("_in_u").isNotNull(), F.col(f"_u_{c}"))
        .otherwise(F.col(c))
        .alias(c)
        for c in value_cols
    ]
    return j.select(key, *out_vals, action.alias("merge_action"))
