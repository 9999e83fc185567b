"""Assemble benchmarks/quality_r4.json from the round-4 campaign logs.

Scans benchmarks/r4/<name>_train.jsonl (train curve + held-out curve +
final held-out eval), benchmarks/r4/<name>_allviews/metrics.json
(all-view PSNR/SSIM), and benchmarks/r4/<name>_train.log (the [done]
rays/s line) into one quality table keyed by run name. Safe to run at
any point mid-campaign — missing runs are skipped, partial runs record
whatever exists. Usage: python benchmarks/collect_r4.py
"""

from __future__ import annotations

import glob
import json
import os
import re

R4 = "benchmarks/r4"
OUT = "benchmarks/quality_r4.json"


def collect_run(name: str) -> dict:
    run: dict = {}
    jsonl = f"{R4}/{name}_train.jsonl"
    if os.path.exists(jsonl):
        rows = []
        with open(jsonl) as f:
            for line in f:
                line = line.strip()
                if line:
                    try:
                        rows.append(json.loads(line))
                    except json.JSONDecodeError:
                        pass  # truncated tail of a killed run
        train = [r for r in rows if "psnr" in r and "step" in r]
        if train:
            run["train_psnr_final"] = train[-1]["psnr"]
            run["steps"] = train[-1]["step"]
        curve = [
            {"step": r["step"], "psnr": r["eval"]["psnr_mean"]}
            for r in rows
            if r.get("kind") == "held-out" and "step" in r
        ]
        if curve:
            run["heldout_curve"] = curve
        ema_curve = [
            {"step": r["step"], "psnr": r["eval_ema"]["psnr_mean"]}
            for r in rows
            if r.get("kind") == "held-out" and "step" in r and r.get("eval_ema")
        ]
        if ema_curve:
            run["heldout_ema_curve"] = ema_curve
        # Final eval row: marked "final" (round-4 schema) or legacy
        # step-less (round-3 logs).
        final = [
            r
            for r in rows
            if r.get("kind") == "held-out" and (r.get("final") or "step" not in r)
        ]
        if final:
            run["heldout_final"] = final[-1]["eval"]
            if final[-1].get("eval_ema"):
                run["heldout_final_ema"] = final[-1]["eval_ema"]
    log = f"{R4}/{name}_train.log"
    if os.path.exists(log):
        text = open(log, errors="replace").read()
        m = re.findall(r"train loop [\d.]+s, ([\d,]+) rays/s", text)
        if m:
            run["train_rays_per_sec"] = float(m[-1].replace(",", ""))
        m = re.findall(r"\[done\] (\d+) iters in ([\d.]+) min", text)
        if m:
            run["wall_min"] = float(m[-1][1])
    allviews = f"{R4}/{name}_allviews/metrics.json"
    if os.path.exists(allviews):
        with open(allviews) as f:
            av = json.load(f)
        run["allviews"] = {
            k: av[k]
            for k in ("psnr_mean", "psnr_min", "psnr_max", "ssim_mean")
            if k in av
        }
    return run


def main() -> None:
    names = sorted(
        {
            re.sub(r"_train\.(jsonl|log)$", "", os.path.basename(p))
            for p in glob.glob(f"{R4}/*_train.jsonl") + glob.glob(f"{R4}/*_train.log")
        }
    )
    table = {n: collect_run(n) for n in names}
    table = {n: r for n, r in table.items() if r}
    # Kernel-experiment artifacts (campaign stages 1b/1c) ride along
    # under underscore keys so the round's evidence is one file.
    for key, path in (
        ("_tile_sweep", f"{R4}/tile_sweep.json"),
        ("_peel_ab", f"{R4}/peel_ab.json"),
    ):
        if os.path.exists(path):
            try:
                with open(path) as f:
                    table[key] = json.load(f)
            except json.JSONDecodeError:
                pass  # mid-write or truncated: skip, don't crash collect
    with open(OUT, "w") as f:
        json.dump(table, f, indent=1, sort_keys=True)
    print(f"[collect] wrote {OUT}: {len(table)} runs -> {list(table)}")


if __name__ == "__main__":
    main()
