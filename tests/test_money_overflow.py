"""Adversarial-magnitude tests for the int64-cents money math
(VERDICT r14 #1): the oracle SFs sit far below the long fence, so a
silent wrap in the scale-4/6 product sums would pass every gate.
These fixtures push GROUP SUMS past 2^63 while keeping every per-row
product inside int64 (the invariant the cents design relies on), and
compare against DuckDB running the same decimal oracle SQL the driver
uses.
"""

from __future__ import annotations

import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from meteaudata_spark.ext import relational as rel

# price chosen so that:
#   * cents = price*100 = 5e14 is exactly representable in double
#     (< 2^53) and exact in long;
#   * per-row dp4 = cents * (100 - disc_cents) <= 5e16 and per-row
#     ch6 = dp4 * (100 + tax_cents) <= 5.45e18 both stay inside int64
#     (the per-row invariant);
#   * a few hundred rows push the GROUP sums of dp4 / ch6 / the q6
#     product past 2^63 = 9.22e18, where the old long accumulation
#     wrapped silently under non-ANSI Spark.
_PRICE = 5.0e12  # dollars; cents-exact double
_N_ROWS = 400


@pytest.fixture(scope="module")
def adversarial_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("overflow_sf")
    n = _N_ROWS
    rows = {
        "l_orderkey": list(range(1, n + 1)),
        "l_partkey": [1] * n,
        "l_suppkey": [1] * n,
        "l_linenumber": [1] * n,
        "l_quantity": [10.0] * n,
        "l_extendedprice": [_PRICE] * n,
        # q6 wants discount in [0.05, 0.07]: product per row =
        # 5e14 * 6 = 3e15 ... need the q6 sum to overflow too:
        # 5e14 cents * 6 disc-cents = 3e15 per row -> 400 rows =
        # 1.2e18 (no wrap). Use half the rows at 0.06 and rely on
        # dp4/ch6 for the wrap proof; q6 still certifies the widened
        # sum matches the decimal oracle at adversarial magnitude.
        "l_discount": [0.06] * n,
        "l_tax": [0.08] * n,
        "l_returnflag": ["A"] * n,
        "l_linestatus": ["F"] * n,
        "l_shipdate": [1] * n,  # placeholder, replaced below
    }
    import datetime

    rows["l_shipdate"] = [datetime.datetime(1996, 6, 1)] * n
    table = pa.table(
        {
            "l_orderkey": pa.array(rows["l_orderkey"], pa.int64()),
            "l_partkey": pa.array(rows["l_partkey"], pa.int64()),
            "l_suppkey": pa.array(rows["l_suppkey"], pa.int64()),
            "l_linenumber": pa.array(rows["l_linenumber"], pa.int32()),
            "l_quantity": pa.array(rows["l_quantity"], pa.float64()),
            "l_extendedprice": pa.array(rows["l_extendedprice"], pa.float64()),
            "l_discount": pa.array(rows["l_discount"], pa.float64()),
            "l_tax": pa.array(rows["l_tax"], pa.float64()),
            "l_returnflag": pa.array(rows["l_returnflag"], pa.string()),
            "l_linestatus": pa.array(rows["l_linestatus"], pa.string()),
            "l_shipdate": pa.array(rows["l_shipdate"], pa.timestamp("us")),
        }
    )
    pq.write_table(table, str(d / "lineitem.parquet"))
    return str(d)


def _duck(sf_dir: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    return con


def test_per_row_products_exceed_long_fence_in_aggregate(adversarial_sf_dir):
    """Sanity: the fixture really crosses 2^63 in the group sums while
    each per-row product stays inside int64 (the invariant _cents
    relies on)."""
    cents = int(_PRICE * 100)
    dp4 = cents * (100 - 6)
    ch6 = dp4 * (100 + 8)
    assert dp4 < 2**63 and ch6 < 2**63  # per-row invariant holds
    assert dp4 * _N_ROWS > 2**63  # scale-4 group sum wraps a long
    assert ch6 * _N_ROWS > 2**63  # scale-6 group sum wraps a long


def test_q1_sums_match_exact_integers_past_long_fence(
    spark, adversarial_sf_dir
):
    """Ground truth is exact Python integer arithmetic (independent of
    both engines): at these magnitudes even DuckDB's DECIMAL(18)
    product overflows — LOUDLY (OutOfRangeException), which is the
    acceptable failure mode; Spark's old long accumulation wrapped
    SILENTLY, which is the bug class this test pins."""
    got = {
        r["l_returnflag"]: r
        for r in rel.q1_pricing_summary(spark, adversarial_sf_dir).collect()
    }
    assert len(got) == 1
    row = got["A"]
    n = _N_ROWS
    cents = int(_PRICE * 100)
    dp4 = cents * (100 - 6)
    ch6 = dp4 * (100 + 8)
    # all expected quotients below are exact integers / exact doubles
    assert row["count_order"] == n
    assert row["sum_qty"] == float(10 * n)
    assert row["sum_base_price"] == float(cents * n // 100)
    assert row["sum_disc_price"] == float(dp4 * n // 10**4)
    assert row["sum_charge"] == float(ch6 * n // 10**6)
    assert row["avg_qty"] == float(10 * n) / n
    assert row["avg_price"] == float(cents * n // 100) / n
    assert row["avg_disc"] == float(6 * n // 100) / n
    assert math.isfinite(row["sum_charge"]) and row["sum_charge"] > 0
    # the silent-wrap value the old long accumulation produced — prove
    # we are NOT producing it
    wrapped = (ch6 * n) % (2**64)
    if wrapped >= 2**63:
        wrapped -= 2**64
    assert row["sum_charge"] != float(wrapped) / 1e6


def test_revenue_rollup_matches_decimal_oracle_past_long_fence(
    spark, adversarial_sf_dir
):
    got = {
        (r["returnflag"], r["linestatus"]): r["revenue"]
        for r in rel.revenue_rollup(spark, adversarial_sf_dir).collect()
    }
    con = _duck(adversarial_sf_dir)
    exp = {
        (rf, ls): rev
        for rf, ls, rev, _ in con.execute(rel.REVENUE_ROLLUP_SQL).fetchall()
    }
    assert got == exp
    cents = int(_PRICE * 100)
    dp4 = cents * (100 - 6)
    assert got[("ALL", "ALL")] == float(dp4 * _N_ROWS) / 1e4


def test_q6_matches_decimal_oracle_at_adversarial_magnitude(
    spark, adversarial_sf_dir
):
    got = rel.q6_revenue_delta(spark, adversarial_sf_dir).collect()[0][
        "revenue"
    ]
    con = _duck(adversarial_sf_dir)
    exp = con.execute(rel.Q6_SQL).fetchall()[0][0]
    assert got == exp
