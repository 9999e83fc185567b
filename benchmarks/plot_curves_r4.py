"""Plot train + held-out PSNR curves from campaign JSONL metrics.

Writes benchmarks/r4/curves.png overlaying every run that has a
held-out curve (--eval-every runs), solid = train PSNR, dashed =
held-out mean — the visual evidence for the train/held-out gap story
(VERDICT r3 item 2). Usage: python benchmarks/plot_curves_r4.py
[jsonl ...]; default: all benchmarks/r4/*_train.jsonl with curves.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys


def load(path):
    train, curve = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "psnr" in r and "step" in r:
                train.append((r["step"], r["psnr"]))
            elif r.get("kind") == "held-out" and "step" in r:
                curve.append((r["step"], r["eval"]["psnr_mean"]))
    return train, curve


def main() -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    paths = sys.argv[1:] or sorted(glob.glob("benchmarks/r4/*_train.jsonl"))
    fig, ax = plt.subplots(figsize=(9, 5.5), dpi=130)
    plotted = 0
    for p in paths:
        name = re.sub(r"_train\.jsonl$", "", os.path.basename(p))
        train, curve = load(p)
        if not curve:
            continue
        (ln,) = ax.plot(*zip(*train), lw=1.0, alpha=0.55, label=f"{name} (train)")
        ax.plot(
            *zip(*curve), "--o", ms=3, lw=1.6, color=ln.get_color(),
            label=f"{name} (held-out)",
        )
        plotted += 1
    if not plotted:
        print("[plot] no runs with held-out curves found; nothing to plot")
        return
    ax.set_xlabel("step")
    ax.set_ylabel("PSNR (dB)")
    ax.set_title("train vs held-out PSNR (round-4 campaign)")
    ax.grid(alpha=0.25)
    ax.legend(fontsize=7, ncol=2)
    out = "benchmarks/r4/curves.png"
    fig.tight_layout()
    fig.savefig(out)
    print(f"[plot] wrote {out} ({plotted} runs)")


if __name__ == "__main__":
    main()
