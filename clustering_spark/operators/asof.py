"""As-of join (beyond-reference scope): for every left row, the latest
right row with the same key and ts_right <= ts_left — the telemetry /
feature-engineering staple Spark has no built-in for (and one of the
brief's canonical custom operators).

Scale design — the union + last_value(ignorenulls) trick, NOT a join:
tag right rows 0 and left rows 1, union, and window
``last(payload, ignorenulls=True)`` over
(key ORDER BY ts, tag ROWS UNBOUNDED PRECEDING..CURRENT). Each left
row picks up the most recent preceding right payload in ONE shuffle by
key with no join at all — no range-explosion, no per-key driver loop,
and skew behaves exactly like any keyed window. A broadcast-range join
would re-shuffle both sides and blow up on wide time ranges; this
shape is linear in input size.

Tie rule: a right row AT the left row's timestamp matches (<=); right
rows sort before left rows at equal ts via the tag. Callers must make
(key, ts) unique on the right side (pre-aggregate) — otherwise which
of the tied right rows wins is order-dependent, the same caveat
DuckDB's ASOF JOIN carries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Left rows + ``payload_cols`` from the latest right row with
    right.ts <= left.ts on the same key (NULL when no such row).
    ``left`` keeps all its columns; ``payload_cols`` must not collide
    with them.

    All payloads are carried in ONE struct column filled with
    ``last(ignorenulls)``: the struct is non-NULL for every right row
    (even when its fields are NULL), so every payload value comes
    atomically from the single latest matching right row — a NULL field
    in that row stays NULL instead of being back-filled from an older
    row. This matches DuckDB/pandas ASOF semantics exactly."""
    from pyspark.sql import Window

    from pyspark.sql.types import StructField, StructType

    for c in payload_cols:
        if c in left.columns:
            raise ValueError(f"payload column {c!r} collides with a left column")
    for c in ("__tag", "__payload"):
        if c in left.columns or c in right.columns:
            # the union/select below would otherwise produce duplicate
            # columns and die with an opaque AMBIGUOUS_REFERENCE far
            # from the cause (the time_range_join __bucket rule)
            raise ValueError(
                f"asof_join uses {c!r} internally — rename that column first"
            )

    # a right row with a NULL timestamp OR a NULL key matches NOTHING
    # (DuckDB ASOF / pandas merge_asof semantics): unfiltered, a NULL
    # ts would sort ASC NULLS FIRST before every left row and backfill
    # rows with no true match, and the window's partitionBy groups
    # NULL keys TOGETHER — so a NULL-key right row would match NULL-key
    # left rows, which equality-matching ASOF never does. NULL-key
    # LEFT rows still come back (payload NULL): their partition then
    # contains no right rows at all.
    # backtick-escaped refs THROUGHOUT (round-16 review): bare strings
    # — and df[c] indexing, which routes through the same parsing
    # Dataset.col — treat a name like 'a.b' as a nested path, so a
    # left/key/ts column literally named that either failed to resolve
    # or silently picked a struct FIELD over the caller's column. The
    # payload side already escaped; every reference now does.
    def _q(c: str):
        return F.col("`" + c.replace("`", "``") + "`")

    nonnull_keys = F.lit(True)
    for k in key_cols:
        nonnull_keys = nonnull_keys & _q(k).isNotNull()
    right = right.filter(_q(ts_col).isNotNull() & nonnull_keys)

    # real StructType from the right schema's fields — a simpleString
    # round-trip can degrade types (char/varchar) and needs manual
    # backtick assembly
    payload_struct_t = StructType(
        [StructField(c, right.schema[c].dataType) for c in payload_cols]
    )
    lt = left.select(
        *[_q(c) for c in left.columns],
        F.lit(1).alias("__tag"),
        F.lit(None).cast(payload_struct_t).alias("__payload"),
    )
    left_only = [c for c in left.columns if c not in key_cols and c != ts_col]
    rt = right.select(
        *[_q(k) for k in key_cols],
        _q(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_only],
        F.lit(0).alias("__tag"),
        # backtick-quoted refs: a bare string in F.struct would parse
        # a payload name containing '.' as a nested path
        F.struct(
            *[
                F.col("`" + c.replace("`", "``") + "`").alias(c)
                for c in payload_cols
            ]
        ).alias("__payload"),
    )
    unioned = lt.select(*[_q(c) for c in rt.columns]).unionByName(rt)

    w = (
        Window.partitionBy(*[_q(k) for k in key_cols])
        .orderBy(_q(ts_col), F.col("__tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[_q(c) for c in unioned.columns if c != "__payload"],
        F.last("__payload", ignorenulls=True).over(w).alias("__payload"),
    )
    # index the struct column, never a dotted F.col path: a payload
    # name containing '.' would be parsed as deeper nesting
    return filled.filter(F.col("__tag") == 1).select(
        *[_q(c) for c in left.columns],
        *[F.col("__payload")[c].alias(c) for c in payload_cols],
    )
