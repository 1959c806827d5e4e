#!/usr/bin/env python3
"""Pandas mirror of the 10 BASELINE.md operators, parameterized by corpus dir.

Usage: python3 tools/baseline10.py <sfDir>

Each op mirrors the SAME registered Spark query shape (CoreQueries.scala) so
`graft.Bench` totals at any scale factor compare against this script run on
the same dir — the sf1 crossover measurement. Single thread, best of 3,
prints one JSON line. Dev tooling only — the shipped library is pure Scala.
"""
import json
import sys
import time

import pandas as pd
from ast import literal_eval


def main(d: str) -> None:
    lineitem = pd.read_parquet(f"{d}/lineitem.parquet")
    orders = pd.read_parquet(f"{d}/orders.parquet")
    customer = pd.read_parquet(f"{d}/customer.parquet")
    events = pd.read_parquet(f"{d}/events.parquet")
    nation = pd.read_parquet(f"{d}/nation.parquet")
    region = pd.read_parquet(f"{d}/region.parquet")

    def a1():  # a1_groupsum
        li = lineitem.assign(rev=lineitem.l_extendedprice * (1 - lineitem.l_discount))
        return li.groupby("l_returnflag").agg(
            sum_qty=("l_quantity", "sum"), sum_price=("l_extendedprice", "sum"),
            sum_revenue=("rev", "sum"), n_rows=("l_quantity", "size"))

    def a2():  # a2_groupcount
        return orders.groupby("o_orderpriority").size()

    def a3():  # a3_groupproduct
        return (1 + lineitem.l_discount).groupby(lineitem.l_orderkey).prod().round(6)

    def j1():  # j1_join_2hop
        return lineitem.merge(orders, left_on="l_orderkey", right_on="o_orderkey") \
            .merge(customer, left_on="o_custkey", right_on="c_custkey")[
                ["l_orderkey", "l_linenumber", "c_custkey", "c_mktsegment"]]

    def p4():  # p4_in_list
        return orders[orders.o_orderpriority.isin(["1-URGENT", "2-HIGH"])
                      & (orders.o_orderstatus == "F")][
            ["o_orderkey", "o_custkey", "o_orderpriority"]]

    def p1():  # p1_filter_project
        return lineitem[lineitem.l_shipdate >= "1995-06-01"][
            ["l_orderkey", "l_linenumber", "l_quantity"]]

    def r1():  # r1_pivot
        return events.pivot_table(index="user_id", columns="event_type",
                                  values="value", aggfunc="max")

    def f1():  # f1_recode
        m = {"1-URGENT": "urgent", "2-HIGH": "high", "3-MEDIUM": "medium"}
        return orders.assign(
            priority_label=orders.o_orderpriority.map(lambda v: m.get(v, v)))[
            ["o_orderkey", "priority_label"]]

    def r3():  # r3_explode (python-repr list cells + iterrows, as the reference)
        j = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
        j = j.assign(code="['" + j.n_name + "', '" + j.r_name + "']")
        rows = []
        for _, r in j.iterrows():
            for c in literal_eval(r["code"]):
                rows.append((r["n_nationkey"], c))
        return pd.DataFrame(rows, columns=["n_nationkey", "code"])

    def a5():  # a5_distinct
        return lineitem[["l_returnflag", "l_linestatus"]].drop_duplicates()

    ops = [("a1_groupsum", a1), ("a2_groupcount", a2), ("a3_groupproduct", a3),
           ("j1_join_2hop", j1), ("p4_in_list", p4), ("p1_filter_project", p1),
           ("r1_pivot", r1), ("f1_recode", f1), ("r3_explode", r3),
           ("a5_distinct", a5)]
    out = {}
    for name, fn in ops:
        best = min(
            (lambda t0=time.perf_counter(): (fn(), time.perf_counter() - t0)[1])()
            for _ in range(3))
        out[name] = best
    print(json.dumps({"metric": "pandas10", "sf": d, "total": sum(out.values()),
                      "ops": out}))


if __name__ == "__main__":
    main(sys.argv[1])
