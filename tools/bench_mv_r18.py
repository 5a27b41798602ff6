"""Round-18 sf10 measurements (one-off, recorded in BASELINE.md):

1. mv_q5_volume re-measurement with the FIXED 1996 window (the r17
   table measured an EMPTY state — VERDICT r17 what's-wrong #1):
   create / fold / read / recompute, non-empty state this time.
2. Join-MV dimension churn: _fold_dim_churn cost vs DROP+recreate for
   a small supplier re-tier on the same q5-shaped view.

Run:  python tools/bench_mv_r18.py /tmp/sf10data
Writes nothing; prints one timing line per step.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10data"

os.makedirs("/root/sparktmp", exist_ok=True)
os.environ.setdefault("SPARK_LOCAL_DIRS", "/root/sparktmp/bench_mv_r18")

from pg_mooncake_spark.session import get_spark  # noqa: E402
from pg_mooncake_spark.engine import MooncakeEngine  # noqa: E402
from pg_mooncake_spark.views import MaterializedView  # noqa: E402

spark = get_spark("bench_mv_r18", shuffle_partitions=32)
spark.conf.set("spark.sql.session.timeZone", "UTC")


def step(label, fn, n=1):
    outs = []
    for _ in range(n):
        t0 = time.time()
        r = fn()
        outs.append(time.time() - t0)
    print(f"{label}: " + ", ".join(f"{t:.3f}" for t in outs) + " s",
          flush=True)
    return r


eng = MooncakeEngine(spark, tempfile.mkdtemp(prefix="mvr18_",
                                             dir="/root/sparktmp"))
T = lambda n: spark.read.parquet(f"{SF}/{n}.parquet")  # noqa: E731


def make_mirrors():
    eng.create_table(
        "li5",
        source_df=T("lineitem").select(
            "l_orderkey", "l_linenumber", "l_suppkey",
            "l_extendedprice", "l_discount"),
        primary_key=["l_orderkey", "l_linenumber"], change_feed=True)
    eng.create_table("ord5", source_df=T("orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"))
    eng.create_table("cust5", source_df=T("customer").select(
        "c_custkey", "c_nationkey"))
    eng.create_table(
        "supp5",
        source_df=T("supplier").select("s_suppkey", "s_nationkey"),
        primary_key=["s_suppkey"], change_feed=True)
    eng.create_table("nat5", source_df=T("nation").select(
        "n_nationkey", "n_name", "n_regionkey"))
    eng.create_table("reg5", source_df=T("region").select(
        "r_regionkey", "r_name"))


step("mirror create (li5 + 5 dims)", make_mirrors)

ENRICH = [
    {"table": "ord5", "on": [("l_orderkey", "o_orderkey")],
     "cols": ["o_custkey"],
     "filter": "o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
               "AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'"},
    {"table": "cust5", "on": [("o_custkey", "c_custkey")],
     "cols": ["c_nationkey"]},
    {"table": "supp5", "on": [("l_suppkey", "s_suppkey")],
     "cols": ["s_nationkey"]},
    {"table": "nat5", "on": [("s_nationkey", "n_nationkey")],
     "cols": ["n_name", "n_regionkey"]},
    {"table": "reg5", "on": [("n_regionkey", "r_regionkey")],
     "cols": [], "filter": "r_name = 'ASIA'"},
]


def make_view():
    eng.create_materialized_view(
        "q5_volume", "li5", ["n_name"],
        {"revenue": (
            "sum",
            "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))",
        )},
        where="c_nationkey = s_nationkey",
        enrich=ENRICH,
    )


step("MV create (full q5 compute, 1996 window)", make_view)
n0 = eng.materialized_view("q5_volume").count()
print(f"state rows after create: {n0}", flush=True)

step("DML commit incl. auto-fold (discount bump slice)", lambda: eng.update_where(
    "li5", "l_suppkey % 7 = 3",
    {"l_discount": "least(l_discount + 0.01, 0.1)"}))
step("DML commit incl. auto-fold (order-slice delete)", lambda: eng.delete_where(
    "li5", "l_orderkey % 103 = 11"))

rows = step("MV read (median of 3)", lambda: eng.materialized_view(
    "q5_volume").collect(), n=3)
print(f"state rows post-fold: {len(rows)}; sample: {sorted(rows)[:2]}",
      flush=True)


def recompute():
    li = eng.table("li5")
    o = eng.table("ord5").where(
        "o_orderdate >= TIMESTAMP '1996-01-01' AND "
        "o_orderdate < TIMESTAMP '1997-01-01'")
    c = eng.table("cust5")
    s = eng.table("supp5")
    n = eng.table("nat5")
    r = eng.table("reg5").where("r_name = 'ASIA'")
    from pyspark.sql import functions as F
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey)
              & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(F.expr(
            "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))"
        )).alias("revenue"))
        .collect()
    )


step("q5 recompute from the same mirrors (median of 3)", recompute, n=3)

# ---- 2. dimension churn
print("\n-- dim churn --", flush=True)
mv = MaterializedView(spark, eng.catalog.get("q5_volume")["path"])

# narrow: ONE supplier re-tiered — 1-2 affected nations
step("narrow churn DML (one supplier)", lambda: eng.update_where(
    "supp5", "s_suppkey = 11", {"s_nationkey": "(s_nationkey + 2) % 25"}))
step("narrow churn fold (<=2 affected nations)", mv.refresh)

# wide: 1% of suppliers re-tiered — most nations affected
step("dim churn DML (supplier re-tier, 1% slice)", lambda: eng.update_where(
    "supp5", "s_suppkey % 100 = 7",
    {"s_nationkey": "(s_nationkey + 1) % 25"}))
step("wide churn fold (most nations affected)", mv.refresh)
rows = step("MV read post-churn", lambda: eng.materialized_view(
    "q5_volume").collect(), n=3)
print(f"state rows post-churn: {len(rows)}", flush=True)


def drop_recreate():
    eng.drop_table("q5_volume")
    make_view()


step("DROP + full re-CREATE (the r17 alternative)", drop_recreate)
print("done", flush=True)
