#!/usr/bin/env python3
"""Generate src/main/resources/bench_reference.json from a QUIET-BOX
full-fidelity bench_detail.json (one whose spread entries are
mode=full and which carries the per-query "cold" map the r20 Bench
exports).

The reference is what makes BENCH artifacts self-labeling: Bench
computes median(observed cold / reference warm min) over the common
queries, normalizes by this file's cold_factor (the SAME statistic
measured on the quiet box — cold runs pay fixture builds and codegen,
so cold/warm > 1 even idle), and stamps contention_factor + degraded
into both artifacts. Regenerate ONLY from a run you trust as quiet
and full-fidelity:

    python3 scripts/gen_bench_reference.py bench_detail.json
"""
import json
import sys

path = sys.argv[1] if len(sys.argv) > 1 else "bench_detail.json"
detail = json.load(open(path))
spread = detail["spread"]
cold = detail.get("cold", {})
full = {k: v["min"] for k, v in sorted(spread.items())
        if v.get("mode") == "full" and v["min"] > 0}
if len(full) < 20:
    sys.exit(f"only {len(full)} mode=full queries in {path} - not a "
             "full-fidelity sweep; refuse to bless it as the reference")
ratios = sorted(cold[k] / full[k] for k in full if k in cold)
if len(ratios) < 20:
    sys.exit(f"only {len(ratios)} cold observations in {path} - the "
             "detail file predates the r20 cold export; re-run Bench")
cold_factor = ratios[len(ratios) // 2]
sf = detail.get("sf", "").rstrip("/").split("/")[-1]
if not sf:
    sys.exit(f"{path} carries no sf field - cannot pin the reference's scale factor")
out = {
    "queries": {k: round(v, 4) for k, v in full.items()},
    "cold_factor": round(cold_factor, 4),
    "sf": sf,
}
dest = "src/main/resources/bench_reference.json"
with open(dest, "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
    f.write("\n")
print(f"wrote {dest}: {len(full)} queries, cold_factor={cold_factor:.2f}")
