"""operators/asof.asof_join: backward-inclusive nearest-earlier semantics,
tie-breaks, NULL payload fields, and no-match rows — against a hand-computed
truth table."""

from __future__ import annotations

from sri2db_spark.operators.asof import asof_join


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            ("a", 10, 1),   # before any right row -> NULL
            ("a", 20, 2),   # == right t=20 -> inclusive match r2
            ("a", 25, 3),   # between 20 and 30 -> r2
            ("a", 35, 4),   # after 30 -> r3 (payload value NULL preserved)
            ("b", 50, 5),   # key with no right rows -> NULL
        ],
        "k string, t long, lid long",
    )
    right = spark.createDataFrame(
        [
            ("a", 20, 100, 1.5),
            ("a", 20, 101, 2.5),   # same key+time: largest tiebreak wins
            ("a", 30, 102, None),  # NULL payload field must stay NULL
        ],
        "k string, t long, rid long, val double",
    )
    out = {
        r.lid: (r.asof_rid, r.asof_val)
        for r in asof_join(
            left, right, by=["k"], left_time="t", right_time="t",
            payload_cols=["rid", "val"], tiebreak="rid",
        ).collect()
    }
    assert out[1] == (None, None)
    assert out[2] == (101, 2.5)   # inclusive + tiebreak
    assert out[3] == (101, 2.5)
    assert out[4] == (102, None)  # NULL field not skipped by the carry
    assert out[5] == (None, None)


def test_asof_join_single_window_plan(spark):
    """One shuffle: the plan must contain exactly one Exchange (the window
    partitioning) and no joins at all."""
    import contextlib
    import io

    left = spark.createDataFrame([("a", 10, 1)], "k string, t long, lid long")
    right = spark.createDataFrame([("a", 5, 9, 0.1)], "k string, t long, rid long, val double")
    out = asof_join(left, right, ["k"], "t", "t", ["rid", "val"], tiebreak="rid")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue().split("== Physical Plan ==")[-1]
    assert "Join" not in plan.replace("rejoin", "")  # no join operator of any kind
    assert plan.count("(1) ") <= 1  # sanity: formatted output parsed
    assert "Window" in plan
