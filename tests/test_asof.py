"""Regression tests for the as-of join (operators/asof.py).

The critical case: the most recent right row has a NULL column. Carrying
columns independently would mix fields from different right rows; the
struct carry must return the latest right row verbatim, NULL fields
included.
"""

from __future__ import annotations

from cioos_siooc_data_transform_spark.operators.asof import asof_join


def test_asof_null_column_does_not_mix_rows(spark):
    left = spark.createDataFrame(
        [(1, 10)], "user_id int, ts int"
    )
    right = spark.createDataFrame(
        [(1, 1, "old", 100.0), (1, 5, None, 200.0)],
        "user_id int, ts int, label string, price double",
    )
    out = asof_join(left, right, key="user_id", right_cols=["label", "price"])
    row = out.collect()[0]
    # Latest right row is (ts=5, label=NULL, price=200.0) — take it whole.
    assert row["right_label"] is None
    assert row["right_price"] == 200.0


def test_asof_backward_semantics_and_tie(spark):
    left = spark.createDataFrame(
        [(1, 0), (1, 5), (1, 7), (2, 3)], "user_id int, ts int"
    )
    right = spark.createDataFrame(
        [(1, 5, 50.0), (1, 6, 60.0), (3, 1, 99.0)],
        "user_id int, ts int, price double",
    )
    out = asof_join(left, right, key="user_id", right_cols=["price"])
    got = {(r["user_id"], r["ts"]): r["right_price"] for r in out.collect()}
    assert got[(1, 0)] is None          # nothing at or before ts=0
    assert got[(1, 5)] == 50.0          # exact-tie right row matches
    assert got[(1, 7)] == 60.0          # most recent at ts<=7
    assert got[(2, 3)] is None          # key with no right rows


def test_asof_forward_direction(spark):
    """Forward as-of: each left row gets the NEXT right row (ts >=
    left.ts), equal timestamps match, absent following rows yield
    NULL."""
    from cioos_siooc_data_transform_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10), (1, 25), (1, 40), (2, 5)], "k INT, ts INT"
    )
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 30, "b"), (2, 1, "c")], "k INT, ts INT, v STRING"
    )
    out = {
        (r.k, r.ts): r.right_v
        for r in asof_join(
            left, right, key="k", direction="forward", right_cols=["v"]
        ).collect()
    }
    assert out[(1, 10)] == "a"   # equal ts matches
    assert out[(1, 25)] == "b"   # next following
    assert out[(1, 40)] is None  # nothing after
    assert out[(2, 5)] is None   # right exists only before


def test_asof_tolerance_window(spark):
    """tolerance nulls out matches farther than the window in ts units,
    in both directions."""
    from cioos_siooc_data_transform_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 100), (1, 200)], "k INT, ts INT")
    right = spark.createDataFrame(
        [(1, 95, "near"), (1, 10, "far")], "k INT, ts INT, v STRING"
    )
    back = {
        r.ts: r.right_v
        for r in asof_join(
            left, right, key="k", right_cols=["v"], tolerance=10
        ).collect()
    }
    assert back[100] == "near"  # gap 5 <= 10
    assert back[200] is None    # nearest is 105 away
    fwd = {
        r.ts: r.right_v
        for r in asof_join(
            spark.createDataFrame([(1, 90)], "k INT, ts INT"),
            right,
            key="k",
            right_cols=["v"],
            direction="forward",
            tolerance=4,
        ).collect()
    }
    assert fwd[90] is None  # next right is 95, gap 5 > 4
