"""Order-robustness pins for the float-sum oracle class (r15, the r14
verdict's task 1).

The r14 driver reddened ``es_aggs_parent``: ``round(sum(double), 6)`` at
~2.75e9 magnitude keeps ~1e-5 summation-order noise, so the hash compare
was nondeterministic across partition layouts — the builder's replica
passed twice while the driver failed. The fix class sums DECIMAL(18,2)
on both engines (exact, order-free) and casts back to double once.

These tests replay each fixed row at two different
``spark.sql.shuffle.partitions`` values and demand FULL-PRECISION
(17-significant-digit) identity, so a regression back to order-dependent
double accumulation fails locally before the driver sees it. The local
harness itself normalizes at 17g too (tests/oracle_harness.py), so the
parity gate enforces the same bar against DuckDB's summation order.
"""

from __future__ import annotations

import pytest

from tests.oracle_harness import normalize
from tweets_elastic_spark import registry

# Every row the r15 sweep fixed (plus the lucky twin): double sums whose
# magnitude × 2^-52 noise floor a 6-digit round (or the driver's hash)
# cannot absorb.
FIXED_ROWS = [
    "es_aggs_parent",        # the r14 red row (~2.75e9 bucket sums)
    "es_aggs_children",      # same pattern, passed r14 on luck
    "es_aggs_ip_prefix",     # unrounded sum(value), ~5.5e4 buckets
    "es_aggs_ip_prefix_v6",
    "es_aggs_ip_range_v6",
    "search_template",
    # second sweep: 6-dp (or unrounded) grids within ~10 ULP of the
    # summation noise at 1e5-1e7 magnitude — decimal sums or a 2-dp
    # re-round, whichever the row's semantics allow
    "es_aggs_ip_range",
    "es_aggs_filters_metrics",
    "es_aggs_extended_stats",
    "rollup_search_month",
    "essql_date_parts",
]


@pytest.mark.parametrize("name", FIXED_ROWS)
def test_sum_is_partition_order_free(spark, sf_correct, name):
    reg = registry.get(name)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # two layouts with different partial-agg merge orders
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = normalize(reg.fn(spark, sf_correct).toPandas())
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        b = normalize(reg.fn(spark, sf_correct).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b, (
        f"{name}: output depends on the shuffle layout — an aggregate "
        "is accumulating doubles in partition order; sum an exact type "
        "(DECIMAL) and cast back instead"
    )
