"""As-of join and skew-handling joins (beyond-reference scope — the
custom operators a time-series/event engine needs that Spark lacks as
built-ins).

as-of join, Spark-first: the naive formulation (range theta join +
row_number) explodes to O(left × right-per-key) pairs before pruning. The
union+window formulation here is the scale-correct plan: tag both sides,
union, one window pass per key ordered by time carrying the latest right
row forward — one shuffle on the key, zero pair explosion, state bounded
by one right row per partition stream.

salted join: the standard skew treatment — explode the hot side's key
space by a salt factor, replicate the small side per salt, join, drop the
salt. AQE's skew-join split handles sort-merge skew automatically; salting
is for the cases AQE can't see (e.g. aggregation hot keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right.ts <= left.ts for the same key (backward as-of join), or —
    with ``direction="forward"`` — the NEXT right row with
    right.ts >= left.ts (the time-to-next-event join: exposure ->
    conversion latency, order -> next restock). Forward is the same
    one-shuffle union+window plan scanned in descending time, so both
    directions share the zero-pair-explosion scale shape.

    Implementation: union with a side tag (right sorts before left on
    timestamp ties so an exactly-equal right row IS matched), then
    last_value(ignoreNulls) over (key ORDER BY ts, side) carries the
    latest right row forward onto left rows.

    All right columns travel as ONE struct (non-null per right row, null
    per left row) so the carried values always come from the same right
    row — carrying columns independently would mix columns across right
    rows whenever the latest right row has a NULL field.

    tolerance units: the gap is computed on ``cast('long')`` of the two
    timestamp columns, so for TIMESTAMP columns tolerance is SECONDS;
    for integer time columns it is whatever raw unit the column holds
    (e.g. micros for unix_micros). A match exactly at the tolerance
    bound is kept (gap <= tolerance). Negative tolerance is rejected —
    it would silently null every match.
    """
    if tolerance is not None and tolerance < 0:
        raise ValueError(
            f"tolerance must be >= 0 (got {tolerance}); a negative bound "
            "would null every match"
        )
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (key, right_ts)]

    r_struct_fields = list(right_cols)
    r_type = "struct<" + ", ".join(
        [
            f"{c}: {right.schema[c].dataType.simpleString()}"
            for c in r_struct_fields
        ]
        + [f"__asof_ts: {right.schema[right_ts].dataType.simpleString()}"]
    ) + ">"
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
        F.lit(None).cast(r_type).alias("_right"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            l_tag.schema["_left"].dataType
        ).alias("_left"),
        F.struct(
            *([F.col(c) for c in r_struct_fields]
              + [F.col(right_ts).alias("__asof_ts")])
        ).alias("_right"),
    )
    unioned = l_tag.unionByName(r_tag)
    # the trailing _right struct key makes the carried row DETERMINISTIC
    # when several right rows share (key, ts): without a tiebreak,
    # last() picks whichever the shuffle sort happened to place last —
    # flapping output across runs. Struct ordering is field-wise and
    # total; left rows carry NULL there and are already separated by
    # _side.
    if direction == "backward":
        order = [F.col("_ts").asc(), F.col("_side").asc(), F.col("_right").asc()]
    elif direction == "forward":
        # scan latest->earliest; equal-ts right rows (side 0) still
        # precede left rows, so right.ts == left.ts matches.
        order = [F.col("_ts").desc(), F.col("_side").asc(), F.col("_right").desc()]
    else:
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "_k",
        "_ts",
        "_side",
        "_left",
        F.last("_right", ignorenulls=True).over(w).alias("_rv"),
    )
    matched = carried.filter(F.col("_side") == 1)
    if tolerance is not None:
        gap = (
            F.col("_ts").cast("long") - F.col("_rv.__asof_ts").cast("long")
            if direction == "backward"
            else F.col("_rv.__asof_ts").cast("long") - F.col("_ts").cast("long")
        )
        matched = matched.withColumn(
            "_rv", F.when(gap <= F.lit(tolerance), F.col("_rv"))
        )
    out = matched.select(
        F.col("_left.*"),
        *[F.col(f"_rv.{c}").alias(f"right_{c}") for c in right_cols],
    )
    return out


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: salt the fact side's keys into
    `salt_buckets` sub-keys and replicate the dimension per salt, so one
    hot key spreads over `salt_buckets` tasks instead of one."""
    # the salt must be DETERMINISTIC per row: F.rand re-evaluates on
    # partial stage retries over a possibly reordered input, so the same
    # fact row could land in a different shuffle partition than the
    # surviving output expects (the SPARK-23207 correctness class). A
    # content hash is stable under recomputation.
    salted_facts = facts.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]), F.lit(salt_buckets)).cast(
            "int"
        ),
    )
    exploded_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return salted_facts.join(exploded_dim, [key, "_salt"]).drop("_salt")
