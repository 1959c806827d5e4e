#!/usr/bin/env python3
"""Static oracle-type audit (dev tooling only).

For every registered oracle SQL (graft.tools.DumpOracles output), asks
DuckDB for the RESULT SCHEMA (zero-row execution) and flags any output
column whose DuckDB type is not pandas-int64/float64/bool/str-clean:
HUGEINT and DECIMAL fetch as float64/object in pandas, so a Spark BIGINT
column hash-mismatches at the driver even when every value is equal.

Usage: python3 tools/audit_oracles.py <sfDir> [oracles.json]
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# DuckDB types that round-trip cleanly through pandas to match Spark dumps
CLEAN = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
         "VARCHAR", "BOOLEAN", "DATE"}


def main(sf_dir: str, oracles_path: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        import os
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracles = json.load(open(oracles_path))
    bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(f"SELECT * FROM ({sql}) q LIMIT 0")
            dirty = [(c, t) for c, t in zip(rel.columns, map(str, rel.types))
                     if t not in CLEAN and not t.startswith("TIMESTAMP")]
            if dirty:
                bad += 1
                print(f"DIRTY {name}: {dirty}")
        except Exception as e:
            bad += 1
            print(f"ERROR {name}: {type(e).__name__}: {str(e)[:160]}")
    print(f"\n{len(oracles) - bad}/{len(oracles)} oracles type-clean")
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1],
                  sys.argv[2] if len(sys.argv) > 2 else "/tmp/oracles.json"))
