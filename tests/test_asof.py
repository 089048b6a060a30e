"""As-of join tests vs a pure-python oracle (operators/asof.py)."""

from valentinus_spark.operators.asof import asof_join


def py_asof(left, right):
    out = {}
    for lid, key, lts in left:
        cands = [(rts, rid, val) for rid, rkey, rts, val in right if rkey == key and rts <= lts]
        out[lid] = max(cands)[1:] if cands else (None, None)  # latest ts, largest id
    return out


def test_asof_join_matches_python(spark):
    left = [(i, i % 3, 10 * (i + 1)) for i in range(12)]  # (event_id, user, ts)
    right = [(100 + j, j % 3, 7 * j + 3, float(j)) for j in range(15)]  # (id, user, ts, value)
    ldf = spark.createDataFrame(left, "event_id long, user_id long, ts long")
    rdf = spark.createDataFrame(right, "rid long, user_id long, ts long, value double")
    got = {
        r["event_id"]: (r["asof_rid"], r["asof_value"])
        for r in asof_join(
            ldf, rdf, key="user_id", ts="ts", value_cols=["rid", "value"], tie_break="rid"
        ).collect()
    }
    expect = py_asof(left, right)
    for lid, (rid, _) in expect.items():
        assert got[lid][0] == rid, f"event {lid}"
        if rid is not None:
            assert got[lid][1] == float(rid - 100)


def test_asof_inclusive_and_ties(spark):
    ldf = spark.createDataFrame([(1, 0, 100)], "event_id long, user_id long, ts long")
    rdf = spark.createDataFrame(
        [(10, 0, 100, 1.0), (11, 0, 100, 2.0), (12, 0, 101, 9.0)],
        "rid long, user_id long, ts long, value double",
    )
    row = asof_join(
        ldf, rdf, key="user_id", ts="ts", value_cols=["rid", "value"], tie_break="rid"
    ).first()
    # inclusive match at equal ts; largest tie-break among equals wins;
    # the future row (ts=101) is invisible
    assert row["asof_rid"] == 11 and row["asof_value"] == 2.0


def test_asof_null_value_in_latest_right_row_stays_together(spark):
    """Regression: per-column last(ignorenulls) used to mix columns from
    DIFFERENT right rows when the latest match has NULL in one value column.
    All asof_* outputs must come from the single latest right row."""
    ldf = spark.createDataFrame([(1, 0, 100)], "event_id long, user_id long, ts long")
    rdf = spark.createDataFrame(
        [(10, 0, 50, 7.0), (11, 0, 90, None)],
        "rid long, user_id long, ts long, value double",
    )
    row = asof_join(
        ldf, rdf, key="user_id", ts="ts", value_cols=["rid", "value"], tie_break="rid"
    ).first()
    # latest right row is rid=11 (value NULL) — value must be NULL, not 7.0
    # carried over from the older rid=10 row
    assert row["asof_rid"] == 11 and row["asof_value"] is None


def test_asof_no_prior_row_is_null(spark):
    ldf = spark.createDataFrame([(1, 0, 5)], "event_id long, user_id long, ts long")
    rdf = spark.createDataFrame(
        [(10, 0, 50, 1.0)], "rid long, user_id long, ts long, value double"
    )
    row = asof_join(ldf, rdf, key="user_id", ts="ts", value_cols=["rid"]).first()
    assert row["asof_rid"] is None


def test_asof_forward_direction(spark):
    """Forward as-of: the EARLIEST right row at-or-after each left ts."""
    import pytest

    from valentinus_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", 10, "l1"), ("k", 25, "l2"), ("k", 99, "l3")],
        "key string, ts long, name string",
    )
    right = spark.createDataFrame(
        [("k", 5, "r_early"), ("k", 10, "r_at10"), ("k", 30, "r_at30")],
        "key string, ts long, v string",
    )
    out = {
        r["name"]: r["asof_v"]
        for r in asof_join(left, right, key="key", ts="ts", value_cols=["v"], direction="forward").collect()
    }
    assert out == {"l1": "r_at10", "l2": "r_at30", "l3": None}
    with pytest.raises(ValueError, match="backward|forward"):
        asof_join(left, right, key="key", ts="ts", value_cols=["v"], direction="nearest")


def test_asof_forward_tie_break_largest_wins(spark):
    from valentinus_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 10)], "key string, ts long")
    right = spark.createDataFrame(
        [("k", 10, 1), ("k", 10, 7), ("k", 12, 3)], "key string, ts long, v int"
    )
    row = asof_join(left, right, key="key", ts="ts", value_cols=["v"], direction="forward").first()
    assert row["asof_v"] == 7  # inclusive match at equal ts; largest tie wins
