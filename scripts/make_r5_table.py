#!/usr/bin/env python
"""Assemble artifacts/r5/benchmark_table.md from the r5/r4 grid JSONs.

CoPO + IPPO rows are r5-retrained (success-gated LCF rail, shard-local
minibatch layout, net-sweep navi bake); CCPPO/CL rows are the r4 grid
(identical env code path for training; see NOTES_r5 caveat 2).
"""
import json

r4 = json.load(open('results/r4_bench/benchmark_table.json'))
r5 = json.load(open('results/r5_bench/benchmark_table.json'))
ENVS = ["bottleneck", "tollgate", "intersection", "roundabout", "parking", "pgmap"]
PUB = {
    "ippo": [24.04, 4.41, 71.91, 66.43, 16.98, 81.81],
    "ccppo_concat": [19.55, 3.53, 75.67, 67.82, 12.01, 80.21],
    "ccppo_mf": [14.60, 14.86, 70.79, 71.03, 20.66, 79.56],
    "cl": [60.60, 37.29, 75.68, 72.28, 21.26, 71.16],
    "copo": [47.39, 27.19, 79.47, 72.82, 19.51, 83.40],
}
rows, combined = [], {}
for algo in ("ippo", "ccppo_concat", "ccppo_mf", "cl", "copo"):
    src, tag = (r5, "r5") if algo in r5 else (r4, "r4")
    cells, combined[algo] = [], {}
    for e in ENVS:
        t = src[algo].get(f"{algo}_{e}")
        if t:
            cells.append(f"{100*t['mean']:.1f} ({100*t['std']:.1f})")
            combined[algo][e] = {"mean": t["mean"], "std": t["std"],
                                 "n": t.get("n", 3), "trained": tag}
        else:
            cells.append("—")
    rows.append(f"| {algo} ({tag}) | " + " | ".join(cells) + " |")
    rows.append("| *published* | *" +
                "* | *".join(f"{v:.1f}" for v in PUB[algo]) + "* |")
md = (
    "# Benchmark table (r5)\n\n"
    "Success rate %, per-seed max of the 100-episode-smoothed training "
    "curve, mean (std) over seeds — the reference's protocol "
    "(`benchmarks/MetaDrive-0.2.5/README.md:27-31`; CL trains 2M steps, "
    "first 1.5M discarded). n=3 seeds per cell (copo intersection n=8, r4 "
    "rows' intersection n=8). Published rows (8 seeds, reference env) are "
    "context, NOT a same-env comparison — the envs are independently "
    "calibrated; `budget_match.md` and the npz cross-evals are the "
    "apples-to-apples views. IPPO/CoPO rows retrained this round; "
    "CCPPO/CL cells are the r4 grid (see NOTES_r5 caveat 2).\n\n"
    "| algo | " + " | ".join(ENVS) + " |\n|---|" + "---|" * len(ENVS) + "\n"
    + "\n".join(rows) + "\n"
)
open('artifacts/r5/benchmark_table.md', 'w').write(md)
json.dump(combined, open('artifacts/r5/benchmark_table.json', 'w'), indent=2)
print(md)
