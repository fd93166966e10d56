#!/usr/bin/env python
"""Build eval_table.{json,md} from `scripts/evaluate.py` output CSVs.

Protocol (r4 VERDICT next #7 / weak #8): 20 eval episodes per checkpoint
(`/root/reference/copo_code/copo/eval.py:35`), best checkpoint per trial by
mean success, best seed per (algo, scene) cell — with the per-cell seed
count printed in the table, since a best-of-8 is a biased-up statistic vs a
best-of-3.

  python scripts/eval_table.py --root evaluate_results/r5 --out artifacts/r5
"""

import argparse
import csv
import json
import os
import re

ENVS = ("intersection", "roundabout", "bottleneck", "tollgate", "parking",
        "pgmap")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True,
                   help="dir of <algo>/evaluate_results.csv")
    p.add_argument("--out", required=True)
    p.add_argument("--num-episodes", type=int, default=20,
                   help="for the caption only")
    args = p.parse_args()

    cells = {}   # (algo, env) -> list of (success, trial)
    for algo in sorted(os.listdir(args.root)):
        adir = os.path.join(args.root, algo)
        if not os.path.isdir(adir):
            continue
        # per-trial CSVs (one row per evaluated checkpoint): best checkpoint
        # by mean success — robust to a partially-rewritten summary CSV
        for fn in sorted(os.listdir(adir)):
            m = re.match(r"([a-z_]+)_([a-z]+)_seed\d+\.csv$", fn)
            if not m or m.group(2) not in ENVS:
                continue
            with open(os.path.join(adir, fn)) as f:
                rows = list(csv.DictReader(f))
            if not rows:
                continue
            # rows are per-EPISODE per checkpoint: best checkpoint by its
            # MEAN episode success (the reference's best-checkpoint rule)
            by_ck = {}
            for r in rows:
                by_ck.setdefault(r["checkpoint"], []).append(
                    float(r["success_rate"]))
            best = max(sum(v) / len(v) for v in by_ck.values())
            cells.setdefault((algo, m.group(2)), []).append(
                (best, fn[:-4]))

    table, md_rows = {}, []
    algos = sorted({a for a, _ in cells})
    for algo in algos:
        table[algo] = {}
        out_cells = []
        for env in ENVS:
            rows = cells.get((algo, env), [])
            if not rows:
                out_cells.append("")
                continue
            best, trial = max(rows)
            table[algo][env] = {"success": best, "n_seeds": len(rows),
                                "trial": trial}
            out_cells.append(f"{100*best:.1f} (n={len(rows)})")
        md_rows.append(f"| {algo} | " + " | ".join(out_cells) + " |")

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "eval_table.json"), "w") as f:
        json.dump(table, f, indent=2)
    md = [
        "# Best-checkpoint evaluation",
        "",
        f"Mean success over {args.num_episodes} eval episodes of each "
        "trial's best checkpoint (crash_done=True, the reference protocol: "
        "`eval.py:35` runs 20 episodes); best seed per cell, with the "
        "per-cell seed count n (a best-of-8 is a biased-up statistic vs a "
        "best-of-3 — r4 VERDICT weak #8). Produced by `scripts/evaluate.py "
        "--root` + `scripts/eval_table.py`.",
        "",
        "| algo | " + " | ".join(ENVS) + " |",
        "|---|" + "---|" * len(ENVS),
        *md_rows,
    ]
    with open(os.path.join(args.out, "eval_table.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print("\n".join(md))


if __name__ == "__main__":
    main()
