"""asof_join_backward vs a brute-force oracle (hypothesis)."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from deepicedrain_spark.operators.asof import asof_join_backward


def brute(left: pd.DataFrame, right: pd.DataFrame, tol):
    out = []
    for _, lr in left.iterrows():
        # bracket access throughout: "lt" collides with Series.lt()
        cand = right[(right["k"] == lr["k"]) & (right["rt"] <= lr["lt"])]
        if tol is not None:
            cand = cand[lr["lt"] - cand["rt"] <= tol]
        if cand.empty:
            out.append((lr["k"], lr["lid"], lr["lt"], None, None))
        else:
            m = cand.loc[cand["rt"].idxmax()]
            out.append((lr["k"], lr["lid"], lr["lt"], m["v"], m["rt"]))
    return sorted(out, key=lambda t: (t[0], t[1]))


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 40)), min_size=1, max_size=25),
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 40), st.integers(-5, 5)),
        max_size=25,
    ),
    st.one_of(st.none(), st.integers(0, 15)),
)
def test_asof_backward_matches_brute(spark, lrows, rrows, tol):  # noqa: F811
    left = pd.DataFrame(
        [(k, i, t) for i, (k, t) in enumerate(lrows)], columns=["k", "lid", "lt"]
    )
    right = (
        pd.DataFrame(rrows, columns=["k", "rt", "v"])
        .groupby(["k", "rt"], as_index=False)
        .v.max()  # dedup equal instants like the suite query does
        .astype({"v": "float64"})
    )
    ldf = spark.createDataFrame(left)
    rdf = (
        spark.createDataFrame(right)
        if len(right)
        else spark.createDataFrame([], "k long, rt long, v double")
    )
    got = sorted(
        (
            (r["k"], r["lid"], r["lt"], r["v"], r["asof_t"])
            for r in asof_join_backward(
                ldf, rdf, ["k"], "lt", "rt", ["v"], tolerance=tol
            ).collect()
        ),
        key=lambda t: (t[0], t[1]),
    )
    assert got == brute(left, right, tol)
