#!/usr/bin/env python3
"""Merge the per-family sf10 bench artifacts (tools/sf10_full.sh) into the
single consolidated bench/full_sf10_r14.json the round-13 verdict demands:
one map over the whole registry, per-query method tags, per-family JVM
attribution, the shared corpus signature, and an explicit errors map (a
disk-bound documented arm must show up as an error, not vanish)."""
import json, os, sys, glob

OUT_DIR = sys.argv[1] if len(sys.argv) > 1 else "bench/sf10_r14"
DEST = sys.argv[2] if len(sys.argv) > 2 else "bench/full_sf10_r14.json"

queries, errors, method, family, corpora = {}, {}, {}, {}, set()
for path in sorted(glob.glob(os.path.join(OUT_DIR, "*.json"))):
    fam = os.path.splitext(os.path.basename(path))[0]
    if fam == "stage":
        continue  # warm-up pass: numbers deliberately unpublished
    with open(path) as f:
        d = json.load(f)
    corpora.add(d.get("corpus", "?"))
    for k, v in d.get("queries", {}).items():
        queries[k] = v
        family[k] = fam
        method[k] = d.get("method", {}).get(k, "coverage")
    for k, v in d.get("errors_full", d.get("errors", {})).items():
        errors[k] = v
        family[k] = fam

if len(corpora) > 1:
    sys.exit(f"FATAL: families ran against different corpora: {corpora}")

reg = set()
for src in glob.glob("src/main/scala/graft/queries/*.scala"):
    import re
    reg |= set(re.findall(r'Reg\("([a-z0-9_]+)"', open(src).read()))
missing = sorted(reg - set(queries) - set(errors))

out = {
    "queries": dict(sorted(queries.items(), key=lambda kv: -kv[1])),
    "errors": errors,
    "method": method,
    "family": family,
    "n_ok": len(queries),
    "n_err": len(errors),
    "n_registry": len(reg),
    "missing": missing,
    "headline_sec": round(sum(queries.values()), 3),
    "corpus": next(iter(corpora)) if corpora else "?",
    "sf": "/tmp/sf10",
    "runs": 1,
    "driver_mem": "32g",
    "note": "family JVMs, warm staged artifacts (pre-stage pass excluded), "
            "RUNS=1 RETIME=0; quiet box",
}
with open(DEST, "w") as f:
    json.dump(out, f)
print(f"{DEST}: {len(queries)} ok, {len(errors)} err, "
      f"{len(missing)} missing of {len(reg)}; headline {out['headline_sec']}s")
if missing:
    print("MISSING:", ", ".join(missing))
