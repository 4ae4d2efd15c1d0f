#!/usr/bin/env python3
"""DuckDB side of the same-host throughput ratio.

Times every oracle SQL from a Verify dump's oracle_sql.json against the
given sf dir (min of N runs per query, full materialization via
fetchall) and emits one JSON object mirroring Bench.scala's shape, so
the two engines' per-query timings line up by gate name. Usage:

    python3 tools/bench_duckdb.py <sfDir> <oracle_sql.json> [runs]

Methodology notes (r5-pinned): min-of-runs is the noise-robust point
estimate on a multi-tenant host; the comparable surface is the set of
gates with BOTH a Spark timing and an oracle SQL (streaming-only and
rows-only gates have no DuckDB twin). DuckDB runs all cores, same as
local[32] Spark.
"""
import json
import sys
import time

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main(sf_dir: str, oracle_json: str, runs: int = 2) -> None:
    runs = max(1, runs)  # runs <= 0 would leave best=None -> TypeError
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracle = json.load(open(oracle_json))
    timings = {}
    for name, sql in sorted(oracle.items()):
        best = None
        for _ in range(runs):
            t0 = time.perf_counter()
            try:
                con.execute(sql).fetchall()
                dt = time.perf_counter() - t0
            except Exception as e:
                print(f"[duckbench] {name} FAILED: {e}", file=sys.stderr)
                dt = -1.0
                best = -1.0
                break
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
    ok = [v for v in timings.values() if v >= 0]
    out = {
        "metric": "total",
        "value": round(sum(ok), 3),
        "unit": "sec",
        "n_failed": sum(1 for v in timings.values() if v < 0),
        "queries": timings,
        "sf": sf_dir,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 2)
