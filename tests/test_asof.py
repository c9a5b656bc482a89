"""asof_join: the union + last_value(ignorenulls) shape must reproduce
textbook as-of semantics — latest right row with ts <= left ts per key,
inclusive at equal ts, NULL when no prior right row."""

from __future__ import annotations

from clustering_spark.operators.asof import asof_join


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 100, 10),  # before any right row -> NULL
            (2, 100, 20),  # right at ts=20 exists -> inclusive match
            (3, 100, 35),  # latest right <= 35 is ts=30
            (4, 200, 50),  # other key
            (5, 300, 50),  # key with no right rows at all -> NULL
        ],
        "event_id long, user_id long, ts long",
    )
    right = spark.createDataFrame(
        [
            (100, 20, 2.0),
            (100, 30, 3.0),
            (100, 40, 4.0),
            (200, 49, 9.0),
        ],
        "user_id long, ts long, val double",
    )
    out = asof_join(left, right, ["user_id"], "ts", ["val"])
    got = {r.event_id: r.val for r in out.collect()}
    assert got == {1: None, 2: 2.0, 3: 3.0, 4: 9.0, 5: None}
    # left columns all preserved, one output row per left row
    assert set(out.columns) == {"event_id", "user_id", "ts", "val"}
    assert out.count() == 5


def test_asof_is_single_window_no_join(spark):
    from clustering_spark.plans.audit import join_strategies, plan_tree

    left = spark.createDataFrame([(1, 1, 10)], "event_id long, user_id long, ts long")
    right = spark.createDataFrame([(1, 5, 1.0)], "user_id long, ts long, val double")
    df = asof_join(left, right, ["user_id"], "ts", ["val"])
    assert join_strategies(df) == []
    assert "Window" in plan_tree(df)


def test_asof_payload_collision_rejected(spark):
    import pytest

    left = spark.createDataFrame([(1, 1, 10, 0.0)], "event_id long, user_id long, ts long, val double")
    right = spark.createDataFrame([(1, 5, 1.0)], "user_id long, ts long, val double")
    with pytest.raises(ValueError):
        asof_join(left, right, ["user_id"], "ts", ["val"])


def test_null_ts_right_rows_match_nothing(spark):
    """A right row with a NULL timestamp must never backfill a left
    row (ASC NULLS FIRST sorted it before everything and its payload
    leaked into rows with no true match)."""
    import datetime as dt

    t = dt.datetime(2024, 1, 1, 12)
    left = spark.createDataFrame([(1, t)], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, None, 99.0)], "k long, ts timestamp, value double"
    )
    out = asof_join(left, right, ["k"], "ts", ["value"]).collect()
    assert len(out) == 1 and out[0].value is None


def test_dotted_payload_column_names(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 11)
    t1 = dt.datetime(2024, 1, 1, 12)
    left = spark.createDataFrame([(1, t1)], "k long, ts timestamp")
    right = (
        spark.createDataFrame([(1, t0, 5.0)], "k long, ts timestamp, v double")
        .withColumnRenamed("v", "price.usd")
    )
    out = asof_join(left, right, ["k"], "ts", ["price.usd"]).collect()
    assert out[0]["price.usd"] == 5.0


def test_null_key_rows_never_match(spark):
    # DuckDB ASOF / pandas merge_asof never equality-match NULL keys:
    # a NULL-key left row comes back payload-NULL even when a NULL-key
    # right row precedes it
    left = spark.createDataFrame(
        [(None, 10), ("u", 10)], "user string, ts long"
    )
    right = spark.createDataFrame(
        [(None, 5, 9.0), ("u", 5, 7.0)], "user string, ts long, v double"
    )
    from clustering_spark.operators.asof import asof_join

    out = {r.user: r.v for r in asof_join(left, right, ["user"], "ts", ["v"]).collect()}
    assert out["u"] == 7.0
    assert out[None] is None


def test_internal_column_collision_rejected(spark):
    import pytest

    from clustering_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 1, 0)], "k long, ts long, __tag int")
    right = spark.createDataFrame([(1, 1, 2.0)], "k long, ts long, v double")
    with pytest.raises(ValueError, match="__tag"):
        asof_join(left, right, ["k"], "ts", ["v"])


def test_asof_join_left_columns_with_dots(spark):
    """Round-16 review: the payload side always escaped dotted names
    but the LEFT side passed bare strings (select/Window), so a left
    or key column literally named 'a.b' (flattened-JSON naming)
    failed to resolve — or silently picked a struct FIELD over the
    caller's column. All references now use df[c] indexing."""
    from clustering_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100, "x")], "`k.id` long, `t.s` long, note string"
    )
    right = spark.createDataFrame(
        [(1, 90, 7.5)], "`k.id` long, `t.s` long, `p.val` double"
    )
    out = asof_join(
        left, right, key_cols=["k.id"], ts_col="t.s",
        payload_cols=["p.val"],
    ).collect()
    assert len(out) == 1
    row = out[0].asDict()
    assert row["p.val"] == 7.5 and row["note"] == "x"
