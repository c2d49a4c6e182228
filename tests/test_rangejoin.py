"""interval_join_binned vs a brute-force oracle (hypothesis)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from deepicedrain_spark.operators.rangejoin import (
    auto_bin_width,
    interval_join_binned,
)


def brute(points, intervals):
    out = []
    for k, pid, t in points:
        for k2, iid, s, e in intervals:
            if k == k2 and s <= t <= e:
                out.append((k, pid, t, iid, s, e))
    return sorted(out)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 99), st.integers(-50, 50)),
        min_size=1,
        max_size=20,
    ),
    st.lists(
        st.tuples(
            st.integers(0, 2),
            st.integers(100, 199),
            st.integers(-50, 50),
            st.integers(-20, 60),  # length delta; negative = inverted interval
        ),
        min_size=1,
        max_size=20,
    ),
    st.one_of(st.none(), st.integers(1, 7)),
)
def test_interval_join_matches_brute(spark, prows, irows, w):  # noqa: F811
    points = [(k, pid, t) for k, pid, t in prows]
    intervals = [(k, iid, s, s + d) for k, iid, s, d in irows]
    pdf = spark.createDataFrame(points, "k long, pid long, t long")
    idf = spark.createDataFrame(intervals, "k long, iid long, s long, e long")
    got = sorted(
        tuple(r)
        for r in interval_join_binned(
            pdf, idf, key_cols=["k"], point_time="t",
            start_col="s", end_col="e", bin_width=w,
        )
        .select("k", "pid", "t", "iid", "s", "e")
        .collect()
    )
    assert got == brute(points, intervals)


def test_interval_join_large_times_exact(spark):
    # epoch-ns-scale values: > 2^53, where double division would round
    ns = 1_700_000_000_000_000_000
    pdf = spark.createDataFrame(
        [(1, 1, ns + 3), (1, 2, ns + 4)], "k long, pid long, t long"
    )
    idf = spark.createDataFrame(
        [(1, 10, ns, ns + 3)], "k long, iid long, s long, e long"
    )
    got = sorted(
        r["pid"]
        for r in interval_join_binned(
            pdf, idf, key_cols=["k"], point_time="t",
            start_col="s", end_col="e", bin_width=2,
        ).collect()
    )
    assert got == [1]


def test_interval_join_null_bounds_never_match(spark):
    pdf = spark.createDataFrame([(1, 1, 5), (1, 2, None)], "k long, pid long, t long")
    idf = spark.createDataFrame(
        [(1, 10, None, 9), (1, 11, 0, None), (1, 12, 0, 9)],
        "k long, iid long, s long, e long",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join_binned(
            pdf, idf, key_cols=["k"], point_time="t",
            start_col="s", end_col="e", bin_width=3,
        ).collect()
    )
    assert got == [(1, 12)]


def test_auto_bin_width_and_explosion_guard(spark):
    idf = spark.createDataFrame(
        [(1, i, 0, 10) for i in range(9)] + [(1, 12, 0, 1_000_000)],
        "k long, iid long, s long, e long",
    )
    w, mx = auto_bin_width(idf, "s", "e")
    assert w == 10 and mx == 1_000_000
    pdf = spark.createDataFrame([(1, 1, 5)], "k long, pid long, t long")
    with pytest.raises(ValueError, match="spans"):
        interval_join_binned(
            pdf, idf, key_cols=["k"], point_time="t",
            start_col="s", end_col="e", max_bins_per_interval=10,
        )


def test_interval_join_column_guards(spark):
    pdf = spark.createDataFrame([(1, 5, 1)], "k long, t long, dup long")
    idf = spark.createDataFrame([(1, 0, 9, 2)], "k long, s long, e long, dup long")
    with pytest.raises(ValueError, match="both"):
        interval_join_binned(
            pdf, idf, key_cols=["k"], point_time="t",
            start_col="s", end_col="e", bin_width=1,
        )
    pdf2 = spark.createDataFrame([(1, 5, 0)], "k long, t long, _bin long")
    idf2 = spark.createDataFrame([(1, 0, 9)], "k long, s long, e long")
    with pytest.raises(ValueError, match="reserved"):
        interval_join_binned(
            pdf2, idf2, key_cols=["k"], point_time="t",
            start_col="s", end_col="e", bin_width=1,
        )
