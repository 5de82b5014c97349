"""Unit tests for the TPC-H remainder family (pipelines.tpch) — the
partition-local logic that the end-to-end oracle sweep can't isolate.
Full-query parity runs in test_oracle_parity.py / scripts/check_oracle.py.
"""

import numpy as np
import pandas as pd

from nacc_form_validator_ray.pipelines.tpch import _cents, _qty_i


def test_cents_grid_negative_and_halfway():
    # floor(x*100 + 0.5) on IEEE doubles: 1.005*100 is 100.4999... so
    # it rounds DOWN — the point is not decimal correctness but that
    # engine and SQL twin compute the identical value on identical
    # float64 operands (negatives included: q22 balances go negative)
    assert list(_cents([1.005, -8.4669, 0.0, 2.675])) == \
        [100, -847, 0, 268]


def test_qty_integer_grid():
    assert list(_qty_i([24.0, 23.999999999, 1.0])) == [24, 24, 1]


def test_q17_small_quantity_inequality_is_integer_exact():
    # 5*qty*cnt < sum_qty  <=>  qty < 0.2 * avg, with no float division:
    # avg 10 over 4 rows -> threshold 2; qty=1 passes, qty=2 (== 0.2*avg)
    # must NOT pass (strict <)
    qty = np.array([1, 2, 17, 20], dtype=np.int64)
    sq, cnt = qty.sum(), len(qty)
    small = 5 * qty * cnt < sq
    assert list(small) == [True, False, False, False]


def test_q21_per_order_exactly_one_late_supplier():
    # order 1: two suppliers, one late -> supplier 7 counted
    # order 2: two suppliers, both late -> nobody counted
    # order 3: ONE supplier, late -> not counted (needs another supplier)
    # order 4: supplier 7 late twice in the same order -> counted ONCE
    df = pd.DataFrame({
        "l_orderkey": [1, 1, 2, 2, 3, 4, 4, 4],
        "l_suppkey":  [7, 8, 7, 8, 9, 7, 7, 5],
        "late":       [True, False, True, True, True,
                       True, True, False],
    })
    ns = df.groupby("l_orderkey")["l_suppkey"].nunique()
    late = df[df["late"]]
    nl = late.groupby("l_orderkey")["l_suppkey"].nunique()
    wait = late.groupby("l_orderkey")["l_suppkey"].first()
    ok = (ns.reindex(nl.index) > 1) & (nl == 1)
    counts = wait[ok.to_numpy()].value_counts()
    assert dict(zip(counts.index, counts)) == {7: 2}


def test_q22_threshold_cross_multiplication():
    # bal*count > sum  <=>  bal > avg(positive)  — integer-exact
    bal = np.array([100, 200, 300, -50], dtype=np.int64)
    pos = bal[bal > 0]
    s, c = pos.sum(), len(pos)        # avg = 200
    keep = bal * c > s
    assert list(keep) == [False, False, True, False]


def test_registry_has_all_sixteen_tpch_queries():
    from nacc_form_validator_ray.pipelines.queries import (ORACLE_SQL,
                                                           QUERIES)
    expected = {
        "q1_lineitem", "q3_shipping_priority", "q4_order_priority",
        "q5_local_supplier_volume", "q6_forecast_revenue",
        "q7_volume_shipping", "q8_market_share", "q10_returned_items",
        "q13_customer_distribution", "q14_promo_revenue",
        "q15_top_supplier", "q17_small_quantity_revenue",
        "q18_large_volume_customers", "q19_discounted_revenue",
        "q21_waiting_suppliers", "q22_sales_opportunity",
    }
    assert expected <= set(QUERIES)
    assert expected <= set(ORACLE_SQL)


def test_q12_band_day_arithmetic_matches_sql_date_diff():
    # band boundary: delay == 30 days is FAST, 31 is SLOW; the Ray side
    # computes delay as date32-int subtraction, the twin as DATE minus
    # DATE — both count calendar days, leap days included
    ship = pd.to_datetime(["1997-03-01", "1997-03-02", "1996-02-29"])
    order = pd.to_datetime(["1997-01-30", "1997-01-30", "1996-01-30"])
    delay = (ship - order).days if hasattr(ship - order, "days") \
        else (ship - order).to_numpy().astype("timedelta64[D]").astype(int)
    band = np.where(np.asarray(delay) <= 30, "FAST", "SLOW")
    assert list(band) == ["FAST", "SLOW", "FAST"]


def test_q20_share_threshold_is_integer_exact():
    # 4*q > tot  <=>  share > 1/4, no float division: tot=40 -> q=10 is
    # exactly 1/4 and must NOT pass; q=11 passes
    per = pd.DataFrame({"p_partkey": [1, 1, 1], "s_suppkey": [7, 8, 9],
                        "qty": np.array([11, 10, 19], dtype=np.int64)})
    tot = per.groupby("p_partkey")["qty"].transform("sum")
    keep = per[per["qty"] * 4 > tot]
    assert list(keep["s_suppkey"]) == [7, 9]


def test_q2_min_cost_keeps_all_tied_suppliers():
    g = pd.DataFrame({
        "p_partkey": [1, 1, 1, 2],
        "s_suppkey": [7, 8, 9, 7],
        "cost_c": np.array([100, 100, 250, 40], dtype=np.int64)})
    best = g.groupby("p_partkey")["cost_c"].transform("min")
    kept = g[g["cost_c"] == best]
    assert set(map(tuple, kept[["p_partkey", "s_suppkey"]].to_numpy())) \
        == {(1, 7), (1, 8), (2, 7)}


def test_registry_covers_the_full_22_query_family():
    from nacc_form_validator_ray.pipelines.queries import (ORACLE_SQL,
                                                           QUERIES)
    adapted = {
        "q2_min_cost_supplier", "q9_product_profit",
        "q11_important_parts", "q12_lateness_priority",
        "q16_supplier_part_cnt", "q20_dominant_share_suppliers",
    }
    assert adapted <= set(QUERIES)
    assert adapted <= set(ORACLE_SQL)


def test_q2_q16_q20_empty_filters_return_empty_frames(ray_session,
                                                      tmp_path):
    """All-empty exchanges lose their schema (repo trap): the three
    adapted queries must return typed empty frames, not KeyError, when
    their filters match nothing."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from nacc_form_validator_ray.pipelines.tpch import (
        q2_min_cost_supplier, q16_supplier_part_cnt,
        q20_dominant_share_suppliers)

    # a star schema where no part matches any of the three filters
    pq.write_table(pa.table({
        "p_partkey": pa.array([1], pa.int64()),
        "p_name": ["weird widget"],
        "p_brand": ["Brand#5"], "p_type": ["PROMO"],
        "p_size": pa.array([50], pa.int64()),
        "p_retailprice": [1.0]}), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1], pa.int64()),
        "s_name": ["Supplier#1"],
        "s_nationkey": pa.array([0], pa.int64()),
        "s_acctbal": [10.0]}), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0], pa.int64()),
        "n_name": ["NATION_0"],
        "n_regionkey": pa.array([0], pa.int64())}),
        str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0], pa.int64()),
        "r_name": ["EUROPE"]}), str(tmp_path / "region.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1], pa.int64()),
        "l_partkey": pa.array([1], pa.int64()),
        "l_suppkey": pa.array([1], pa.int64()),
        "l_quantity": [1.0], "l_extendedprice": [10.0],
        "l_discount": [0.0],
        "l_shipdate": pa.array([pd.Timestamp("1996-06-01")],
                               pa.timestamp("us"))}),
        str(tmp_path / "lineitem.parquet"))

    sf = str(tmp_path)
    assert len(q2_min_cost_supplier(sf)) == 0
    assert len(q16_supplier_part_cnt(sf)) == 0
    assert len(q20_dominant_share_suppliers(sf)) == 0
