"""Pick the winning hard-scene probe (benchmarks/hardscene_r5.sh stage B).

Prints the probe leg name whose final logged TRAIN PSNR is highest AND
clears the lattice capture's background-only floor (~11.55 dB) by
>=3 dB — i.e. the run demonstrably escaped sigma death (dead runs pin
at the floor; live ones keep climbing). Prints nothing when no probe
escaped, so the campaign never commits a 20k budget to a dead recipe
(the r4 lesson: 2x20k chip-hours burned on runs that were dead by step
2000 — VERDICT r4 weak #3).

stdlib-only on purpose: runs between chip legs, must not pay the jax
import.
"""

import json
import os
import sys

PROBES = ["p1_precrop", "p2_precrop_img", "p3_noise4", "p4_img_ctrl"]
MIN_PSNR = 14.5  # background floor ~11.55 + ~3 dB escape margin


def final_train_psnr(path: str):
    last = None
    try:
        f = open(path)
    except OSError:
        return None
    with f:
        for ln in f:
            try:
                d = json.loads(ln)
            except json.JSONDecodeError:
                continue
            if "psnr" in d and "eval" not in d and not d.get("sigma_death"):
                last = d["psnr"]
    return last


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else "benchmarks/r5"
    best, best_psnr = "", -1.0
    for n in PROBES:
        psnr = final_train_psnr(os.path.join(root, f"{n}_train.jsonl"))
        if psnr is not None and psnr > best_psnr:
            best, best_psnr = n, psnr
    if best_psnr >= MIN_PSNR:
        print(best)


if __name__ == "__main__":
    main()
