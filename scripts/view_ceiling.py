"""Per-view intrinsic quadrature ceiling of the synthetic scene.

VERDICT r2 item 1(b): for every pose, render the ANALYTIC field through
the training recipe's quadrature (64 samples; and the 64+128=192-sample
fine union) and compare against the dataset ground truth (256-sample
quadrature). The resulting per-view PSNR is the ceiling a NeRF trained
with that sample budget could reach if it represented the field
perfectly — separating "the scene is the limiter on this pose" from
"the model/recipe has headroom".

Usage: python -u scripts/view_ceiling.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

if os.environ.get("CEILING_PLATFORM"):
    # The sandbox pre-imports jax (sitecustomize) so JAX_PLATFORMS env
    # alone is too late; route through jax.config before backend init.
    jax.config.update("jax_platforms", os.environ["CEILING_PLATFORM"])

import jax.numpy as jnp


def main(out_path: str = "benchmarks/r3/view_ceiling.json") -> None:
    from tinynerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from tinynerf_tpu.data import ensure_data
    from tinynerf_tpu.synthetic import render_ground_truth

    d = ensure_data("data/tiny_nerf_data.npz", allow_synthetic=True)
    if not d.get("synthetic"):
        print("[ceiling] real dataset present; quadrature ceiling is only "
              "defined for the analytic synthetic scene — nothing to do")
        return
    images = np.asarray(d["images"])
    poses = jnp.asarray(d["poses"])
    n = images.shape[0]

    table = {"n_samples": {}, "note": (
        "PSNR of S-sample quadrature of the analytic field vs the "
        "256-sample dataset ground truth, per pose"
    )}
    for S in (64, 192, 512):
        render = jax.jit(lambda p: render_ground_truth(p, n_samples=S))
        psnrs = []
        for i in range(n):
            img = np.asarray(render(poses[i]))
            mse = float(np.mean((img - images[i]) ** 2))
            psnrs.append(round(-10.0 * np.log10(max(mse, 1e-10)), 2))
        arr = np.array(psnrs)
        table["n_samples"][str(S)] = {
            "per_view": psnrs,
            "mean": round(float(arr.mean()), 2),
            "min": round(float(arr.min()), 2),
            "max": round(float(arr.max()), 2),
        }
        print(f"[ceiling] S={S}: mean {arr.mean():.2f} dB "
              f"(min {arr.min():.2f} / max {arr.max():.2f})")

    with open(out_path, "w") as f:
        json.dump(table, f, indent=1)
    print(f"[ceiling] wrote {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
