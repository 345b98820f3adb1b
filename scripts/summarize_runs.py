"""Compact, committable convergence evidence out of runs/*/events.jsonl.

runs/ and *.png are gitignored working artifacts; this distills each run
into a small JSON record (downsampled reward/ep-length curves + final
metrics + fps) written to benchmarks/convergence/<task>.json so the
training evidence survives in-repo.
"""
import json
import os
import sys
from collections import defaultdict


def load(run_dir):
    series = defaultdict(list)
    with open(os.path.join(run_dir, "events.jsonl")) as f:
        for line in f:
            e = json.loads(line)
            series[e["tag"]].append((e["step"], e["value"]))
    return {k: sorted(v) for k, v in series.items()}


def downsample(pairs, n=60):
    if len(pairs) <= n:
        return pairs
    idx = [round(i * (len(pairs) - 1) / (n - 1)) for i in range(n)]
    return [pairs[i] for i in idx]


def main(run_dirs, out_dir="benchmarks/convergence"):
    """Each arg is a run dir, optionally as ``run_dir=record_name`` to
    control the output filename (default: the task name — colliding
    records overwrite, so name variants explicitly)."""
    os.makedirs(out_dir, exist_ok=True)
    for rd in run_dirs:
        rd, _, record = rd.partition("=")
        name = os.path.basename(rd.rstrip("/"))
        task = record or name.split("_")[1]
        s = load(rd)
        rec = {"run": name, "task": task}
        for key, tags in [
                ("reward", [t for t in s if t.startswith("rewards")]),
                ("ep_length", [t for t in s if "episode_lengths" in t]),
                ("fps", [t for t in s if "total_fps" in t or t == "performance/total_fps"]),
                ("success_rate", [t for t in s if "success_rate" in t])]:
            if tags:
                pairs = s[tags[0]]
                rec[key + "_curve"] = [[int(a), round(float(b), 3)]
                                       for a, b in downsample(pairs)]
                rec[key + "_final"] = round(float(pairs[-1][1]), 3)
        ep_tags = [t for t in s if t.startswith("Episode/")]
        rec["episode_terms_final"] = {
            t.split("/", 1)[1]: round(float(s[t][-1][1]), 4) for t in ep_tags}
        rec["frames_total"] = int(max(p[0] for t in s.values() for p in t))
        out = os.path.join(out_dir, f"{task}.json")
        with open(out, "w") as f:
            json.dump(rec, f, indent=1)
        print("wrote", out, "reward_final=", rec.get("reward_final"))


if __name__ == "__main__":
    main(sys.argv[1:])
