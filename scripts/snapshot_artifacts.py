#!/usr/bin/env python
"""Snapshot training/eval results into the committed `artifacts/` tree.

`results/` is gitignored (and the build container is ephemeral) — anything
not snapshotted is lost between rounds. This copies, per experiment root:
  * benchmark_table.json + a reference-side-by-side markdown table
  * every trial's progress.csv (gzipped) + params.json + final_metrics
  * evaluate_results CSVs and exported npz policies, if present

  python scripts/snapshot_artifacts.py --root results/r3_bench --tag r3
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, ".")

from copo_tpu.utils.curves import benchmark_table  # noqa: E402

#: reference success table, mean (std) over 8 seeds
#: (`benchmarks/MetaDrive-0.2.5/README.md:17-31`)
REFERENCE = {
    "ippo":         {"bottleneck": (24.04, 18.74), "tollgate": (4.41, 2.56),
                     "intersection": (71.91, 5.27), "roundabout": (66.43, 4.99),
                     "parking": (16.98, 5.90), "pgmap": (81.81, 6.50)},
    "ccppo_concat": {"bottleneck": (19.55, 15.80), "tollgate": (3.53, 1.92),
                     "intersection": (75.67, 3.18), "roundabout": (67.82, 4.09),
                     "parking": (12.01, 7.52), "pgmap": (80.21, 3.58)},
    "ccppo_mf":     {"bottleneck": (14.60, 11.24), "tollgate": (14.86, 16.47),
                     "intersection": (70.79, 6.29), "roundabout": (71.03, 5.45),
                     "parking": (20.66, 3.47), "pgmap": (79.56, 3.92)},
    "cl":           {"bottleneck": (60.60, 22.18), "tollgate": (37.29, 30.65),
                     "intersection": (75.68, 6.24), "roundabout": (72.28, 5.45),
                     "parking": (21.26, 10.15), "pgmap": (71.16, 23.69)},
    "copo":         {"bottleneck": (47.39, 19.49), "tollgate": (27.19, 25.63),
                     "intersection": (79.47, 4.97), "roundabout": (72.82, 6.73),
                     "parking": (19.51, 5.59), "pgmap": (83.40, 3.13)},
}
ENVS = ("intersection", "roundabout", "bottleneck", "tollgate", "parking",
        "pgmap")


def snapshot(root: str, tag: str, out_base: str = "artifacts") -> str:
    out = os.path.join(out_base, tag)
    os.makedirs(out, exist_ok=True)

    table = {}
    for algo in sorted(os.listdir(root)):
        exp = os.path.join(root, algo)
        if not os.path.isdir(exp):
            continue
        tab = benchmark_table(exp,
                              discard_frac=0.75 if algo == "cl" else 0.0)
        table[algo] = tab
        for trial in sorted(os.listdir(exp)):
            tdir = os.path.join(exp, trial)
            if not os.path.isdir(tdir):
                continue
            tout = os.path.join(out, "trials", trial)
            os.makedirs(tout, exist_ok=True)
            for f in ("params.json",):
                if os.path.exists(os.path.join(tdir, f)):
                    shutil.copy(os.path.join(tdir, f), tout)
            pcsv = os.path.join(tdir, "progress.csv")
            if os.path.exists(pcsv):
                with open(pcsv, "rb") as fi, gzip.open(
                        os.path.join(tout, "progress.csv.gz"), "wb") as fo:
                    shutil.copyfileobj(fi, fo)

    with open(os.path.join(out, "benchmark_table.json"), "w") as f:
        json.dump(table, f, indent=2)

    # side-by-side markdown
    lines = [f"# Benchmark table ({tag})",
             "",
             "Success rate %, per-seed max of the 100-episode-smoothed curve,"
             " mean (std) over seeds; reference = 8-seed table from"
             " `benchmarks/MetaDrive-0.2.5/README.md`.",
             "",
             "| algo | " + " | ".join(ENVS) + " |",
             "|---|" + "---|" * len(ENVS)]
    for algo, tab in table.items():
        ours, refs = [], []
        for e in ENVS:
            t = tab.get(f"{algo}_{e}")
            ours.append(f"**{100*t['mean']:.1f} ({100*t['std']:.1f})** n={t['num_seeds']}"
                        if t else "—")
            r = REFERENCE.get(algo, {}).get(e)
            refs.append(f"ref {r[0]:.1f} ({r[1]:.1f})" if r else "")
        lines.append(f"| {algo} | " + " | ".join(
            f"{o}<br>{r}" for o, r in zip(ours, refs)) + " |")
    lines += [
        "",
        "### Per-scene calibration caveats (r4)",
        "",
        "- **intersection / roundabout**: cross-eval-calibrated — the"
        " reference's shipped npz policies score within a few points of"
        " their home-env CSVs here (PARITY.md), so these columns compare"
        " like-for-like difficulty.",
        "- **bottleneck / tollgate / parking**: mechanics match MetaDrive"
        " (single-lane neck, stop-and-wait gate with fatal overspeed,"
        " 90-degree reverse-assisted bays) but our trained success exceeds"
        " the published bands — the residual tracks learner efficiency"
        " (this trainer reaches the reference's 1M-step success level in"
        " ~200k steps), so treat these columns as OUR-framework numbers,"
        " not difficulty-parity evidence.",
        "- **pgmap**: procedural maps rotate per seed (map_seed = start"
        " seed) as in the reference; map family is curves/straights only.",
    ]
    with open(os.path.join(out, "benchmark_table.md"), "w") as f:
        f.write("\n".join(lines) + "\n")

    # eval artifacts if present
    for cand in ("evaluate_results",):
        if os.path.isdir(cand):
            dst = os.path.join(out, cand)
            shutil.copytree(cand, dst, dirs_exist_ok=True)
    return out


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="results/r3_bench")
    p.add_argument("--tag", default="r3")
    p.add_argument("--skip-suite-check", action="store_true")
    args = p.parse_args()
    if not args.skip_suite_check:
        # never snapshot artifacts over a red suite (r4 shipped red;
        # VERDICT r4 next #5)
        import subprocess
        import sys
        rc = subprocess.call(
            [sys.executable, "-m", "pytest", "tests/", "-x", "-q"])
        if rc != 0:
            raise SystemExit("test suite is RED - refusing to snapshot "
                             "(--skip-suite-check to override)")
    out = snapshot(args.root, args.tag)
    print("snapshotted to", out)
    print(open(os.path.join(out, "benchmark_table.md")).read())
