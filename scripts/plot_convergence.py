"""Convergence-evidence plots: runs/<run>/events.jsonl -> reward curves.

Produces BENCHMARKS_curves.png (one panel per task) plus a printed
markdown table of final metrics, consumed by BENCHMARKS.md.
"""
import json
import os
import sys
from collections import defaultdict

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt


def load(run_dir):
    series = defaultdict(list)
    with open(os.path.join(run_dir, "events.jsonl")) as f:
        for line in f:
            e = json.loads(line)
            series[e["tag"]].append((e["step"], e["value"]))
    return series


def main(run_dirs, out_png="BENCHMARKS_curves.png"):
    fig, axes = plt.subplots(1, len(run_dirs), figsize=(4 * len(run_dirs), 3.2))
    if len(run_dirs) == 1:
        axes = [axes]
    rows = []
    for ax, rd in zip(axes, run_dirs):
        rd, _, label = rd.partition("=")     # run_dir=panel_label
        name = label or os.path.basename(rd.rstrip("/")).split("_")[1]
        s = load(rd)
        tag = ("rewards/frame" if "rewards/frame" in s
               else next(t for t in s if t.startswith("rewards")))
        steps, vals = zip(*sorted(s[tag]))
        ax.plot(steps, vals, lw=1.2)
        ax.set_title(name)
        ax.set_xlabel("frames")
        ax.grid(alpha=0.3)
        ep_tag = next((t for t in s if "episode_lengths" in t), None)
        final_len = sorted(s[ep_tag])[-1][1] if ep_tag else float("nan")
        rows.append((name, steps[-1], vals[-1], final_len))
    axes[0].set_ylabel("mean episode reward")
    fig.tight_layout()
    fig.savefig(out_png, dpi=110)
    print(f"wrote {out_png}")
    print("| task | frames | final mean reward | final mean ep len |")
    print("|---|---|---|---|")
    for name, fr, rew, ln in rows:
        print(f"| {name} | {fr:,} | {rew:.1f} | {ln:.0f} |")


if __name__ == "__main__":
    main(sys.argv[1:])
