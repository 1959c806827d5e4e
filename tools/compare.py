#!/usr/bin/env python3
"""Dev-loop oracle compare (mirrors the driver's CORRECTNESS gate).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [reportOut.json]

Loads each <verifyOutDir>/<name> parquet (graft.Verify output), runs the
matching SQL from oracle_sql.json in DuckDB over the sfDir parquet tables,
sorts columns by name and rows by all columns, and compares values.
Optionally writes the per-query report as JSON (CORRECTNESS-artifact
shape). Dev tooling only — the shipped library is pure Scala/Spark.

HARD GATE (round-13 rule, after CORRECTNESS_r12.json shipped empty and
nothing noticed): exits non-zero if ZERO queries were compared, or if a
full (non-subset) Verify run compared fewer queries than the registry
size recorded in <verifyOutDir>/manifest.json. An empty or truncated
compare must be loud, never a silent n/n over the wrong denominator.
"""
import json, math, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return a == b


def main(sf_dir: str, out_dir: str, report_out: str = None) -> int:
    con = duckdb.connect()
    for t in TABLES:
        # the driver corpus ships single files; ScaleUp (and any Spark
        # writer) produces a DIRECTORY of part files — glob in that case
        path = f"{sf_dir}/{t}.parquet"
        import os
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
        except Exception as e:
            print(f"WARN view {t}: {e}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    report, n_ok = {}, 0
    for name, sql in sorted(oracle.items()):
        entry = {}
        try:
            spark_df = norm(pd.read_parquet(f"{out_dir}/{name}"))
            duck_df = norm(con.sql(sql).df())
            entry["rows"] = [len(spark_df), len(duck_df)]
            entry["rows_match"] = len(spark_df) == len(duck_df)
            entry["schema_match"] = list(spark_df.columns) == list(duck_df.columns)
            # TYPE-STRICT (round-10 lesson): an uncast DuckDB HUGEINT/
            # DECIMAL output fetches as float64, so a Spark BIGINT column
            # hash-mismatches at the driver even when float(a) == int(b)
            # here. Mirror that: an int-kind vs float-kind column is a fail.
            if entry["schema_match"]:
                kind_bad = [
                    (c, str(spark_df[c].dtype), str(duck_df[c].dtype))
                    for c in spark_df.columns
                    if {spark_df[c].dtype.kind, duck_df[c].dtype.kind}
                    == {"i", "f"}]
                if kind_bad:
                    entry["schema_match"] = False
                    entry["cols"] = [f"dtype_mismatch:{x}" for x in kind_bad]
            if not entry["schema_match"]:
                entry.setdefault(
                    "cols", [list(spark_df.columns), list(duck_df.columns)])
            match = entry["rows_match"] and entry["schema_match"]
            if match:
                mismatches = []
                sv, dv = spark_df.to_numpy(), duck_df.to_numpy()
                for i in range(len(spark_df)):
                    for j in range(len(spark_df.columns)):
                        if not values_equal(sv[i][j], dv[i][j]):
                            mismatches.append(
                                (i, spark_df.columns[j], sv[i][j], dv[i][j]))
                            if len(mismatches) >= 3:
                                break
                    if len(mismatches) >= 3:
                        break
                entry["hash_match"] = not mismatches
                if mismatches:
                    entry["sample_mismatch"] = [
                        [int(i), c, repr(x), repr(y)] for i, c, x, y in mismatches]
            else:
                entry["hash_match"] = False
            if entry["hash_match"]:
                n_ok += 1
        except Exception as e:
            entry["error"] = f"{type(e).__name__}: {e}"
            entry["hash_match"] = False
        report[name] = entry
    for name, entry in report.items():
        flag = "OK " if entry.get("hash_match") else "FAIL"
        extra = entry.get("error") or entry.get("sample_mismatch") or \
            (entry.get("cols") if not entry.get("schema_match", True) else "") or \
            ("" if entry.get("rows_match") else f"rows={entry.get('rows')}")
        print(f"{flag} {name} {extra if extra else ''}")
    print(f"\n{n_ok}/{len(report)} queries hash-match")
    if report_out:
        with open(report_out, "w") as f:
            json.dump(report, f, indent=1, default=str)
        print(f"report written: {report_out} ({len(report)} queries)")
    # ---- hard denominator gate (round-13) -------------------------------
    # compared == 0, or a FULL run comparing fewer queries than the
    # registry, is an emission failure, not a pass — fail LOUDLY.
    if len(report) == 0:
        print("GATE FAIL: zero queries compared — empty oracle set "
              "(this is how CORRECTNESS_r12.json shipped as {})")
        return 2
    import os
    mpath = f"{out_dir}/manifest.json"
    if os.path.exists(mpath):
        m = json.load(open(mpath))
        # Gate against the ORACLE-BEARING count: the report has one entry
        # per query with oracle SQL; registry entries whose oracle is
        # legitimately omitted (non-SQL-expressible ops) don't appear here
        # and must not fail a full run. Older manifests without
        # oracle_total fall back to registry_total (all-oracled era).
        denom = m.get("oracle_total", m["registry_total"])
        if not m.get("subset", False) and len(report) < denom:
            print(f"GATE FAIL: compared {len(report)} < oracle-bearing "
                  f"{denom} on a full run "
                  f"(dumped={m.get('dumped')}, failed={m.get('failed')})")
            return 2
        if m.get("failed"):
            print(f"GATE FAIL: Verify reported dump failures: {m['failed']}")
            return 2
    else:
        print(f"WARN: no manifest.json in {out_dir} — denominator "
              f"unverified (stale Verify build?)")
    return 0 if n_ok == len(report) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
