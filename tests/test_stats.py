"""Stats module: distributed gini vs the reference's sorted-scan
formula (stats.pyx:16-38)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.usefixtures("spark")


def _ref_gini(values):
    sorted_list = sorted(values)
    height, area = 0, 0
    for value in sorted_list:
        height += value
        area += height - value / 2.0
    fair_area = height * len(values) / 2
    return (fair_area - area) / fair_area


@pytest.mark.parametrize("values", [
    [1.0, 1.0, 1.0, 1.0],                      # perfectly equal -> 0
    [0.0, 0.0, 0.0, 10.0],                     # maximal concentration
    [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0],  # mixed with ties
    [float(x % 7 + 1) for x in range(100)],
])
def test_gini_matches_reference(spark, values):
    from networkit_spark.stats import gini

    df = spark.createDataFrame([(v,) for v in values], "value double")
    assert gini(df) == pytest.approx(_ref_gini(values))


def test_gini_empty_and_zero(spark):
    import math

    from networkit_spark.stats import gini

    empty = spark.createDataFrame([], "value double")
    assert math.isnan(gini(empty))
    zeros = spark.createDataFrame([(0.0,), (0.0,)], "value double")
    assert gini(zeros) == 0.0
