"""Full-registry RUNTIME sweep (round 19).

The r18 sweep checked plan *shapes* (Python nodes, cartesians,
unexpected SMJ, exchange counts) — it could not see a query whose plan
is perfect but whose expression tree is pathologically expensive
(embedding_normalize_quantize was map-only, zero exchanges, and
>400 s at sf10).  This sweep times every registered query end-to-end
(build + noop execution) once, in one session, and prints keys sorted
by wall time so runtime outliers surface mechanically.

Engine-family keys run at sf0.01 (fact-scale costs visible);
lifecycle/MV replay keys run at sf0.001 (their cost is the
statement-replay scheduling floor, scale-independent — r18 audit).

Usage: python tools/sweep_runtime_r19.py [engine_sf_dir] [replay_sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    eng_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    rep_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

    from tools.ab_r19 import session

    spark = session(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pg_mooncake_spark.queries.registry import all_queries

    out: list[tuple[float, float, str, str]] = []
    for name, fn in all_queries().items():
        replay = name.startswith(("lifecycle_", "mv_"))
        sf_dir = rep_dir if replay else eng_dir
        spark.sparkContext.setJobDescription(f"sweep: {name}")
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t_exec = time.perf_counter() - t1
        except Exception as e:  # pragma: no cover - report, keep sweeping
            print(f"ERR  {name}: {str(e).splitlines()[0][:100]}", flush=True)
            continue
        out.append((t_build + t_exec, t_exec, name, sf_dir))
        print(
            f"ran  {name}  build={t_build:.2f}s exec={t_exec:.2f}s",
            flush=True,
        )
        spark.catalog.clearCache()
    print("\n==== slowest (total seconds, exec seconds) ====")
    for tot, ex, name, sf_dir in sorted(out, reverse=True)[:40]:
        print(f"{tot:8.2f} {ex:8.2f}  {name}  [{sf_dir}]")
    spark.stop()


if __name__ == "__main__":
    main()
