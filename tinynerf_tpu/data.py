"""Dataset loading for tiny_nerf_data.npz (+ offline synthetic fallback).

Loader parity with the reference (`src/data.py:4-13`): np.load the npz
and cast any float64 array to float32. Schema: images (N,H,W,3) float32
in [0,1], poses (N,4,4) camera-to-world, scalar focal (pixels).

`fetch_tiny_nerf_data` mirrors scripts/get_data.sh:13-29 (primary URL +
two mirrors, skip-if-exists) using urllib. When the environment has no
egress, `ensure_data` falls back to the procedural synthetic scene in
`tinynerf_tpu/synthetic.py`, which produces the identical schema so
every downstream component (training, rendering, benchmarking) is
data-source agnostic.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

DEFAULT_DATA_PATH = "data/tiny_nerf_data.npz"
SYNTHETIC_DATA_PATH = "data/synthetic_tiny_nerf.npz"

DATA_URLS = [
    "http://cseweb.ucsd.edu/~viscomp/projects/LF/papers/ECCV20/nerf/tiny_nerf_data.npz",
    "https://github.com/kunkun0w0/Clean-Torch-NeRFs/raw/main/tiny_nerf_data.npz",
    "https://github.com/volunt4s/TinyNeRF-pytorch/raw/main/tiny_nerf_data.npz",
]


def load_tiny_nerf_npz(path: str = DEFAULT_DATA_PATH) -> Dict[str, Any]:
    """Load the npz, normalizing float64 arrays to float32."""
    data = np.load(path)
    return {
        k: (v.astype(np.float32) if hasattr(v, "dtype") and v.dtype == np.float64 else v)
        for k, v in data.items()
    }


def fetch_tiny_nerf_data(path: str = DEFAULT_DATA_PATH, timeout: float = 30.0) -> bool:
    """Try to download the dataset (primary + mirrors). Returns success."""
    if os.path.exists(path):
        return True
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    import urllib.request

    for url in DATA_URLS:
        try:
            tmp = path + ".part"
            urllib.request.urlretrieve(url, tmp)  # noqa: S310 - fixed allowlist
            os.replace(tmp, path)
            return True
        except Exception:
            continue
    return False


def ensure_data(
    path: str = DEFAULT_DATA_PATH,
    allow_fetch: bool = True,
    allow_synthetic: bool = True,
    synthetic_path: str = SYNTHETIC_DATA_PATH,
) -> Dict[str, Any]:
    """Return a dataset dict, preferring the real npz.

    Order: existing file at `path` -> network fetch -> cached synthetic
    -> freshly generated synthetic (cached to `synthetic_path`).
    The returned dict gains a bool key "synthetic".
    """
    if os.path.exists(path):
        d = load_tiny_nerf_npz(path)
        d["synthetic"] = False
        return d
    if allow_fetch and fetch_tiny_nerf_data(path):
        d = load_tiny_nerf_npz(path)
        d["synthetic"] = False
        return d
    if not allow_synthetic:
        raise FileNotFoundError(
            f"{path} not found and could not be fetched; "
            "run scripts/get_data.sh or pass allow_synthetic=True"
        )
    # Loud, unmissable: a requested dataset is being substituted.
    print(
        f"[data] WARNING: {path} unavailable (no file, no egress) — "
        f"falling back to the procedural synthetic scene ({synthetic_path})",
        flush=True,
    )
    if os.path.exists(synthetic_path):
        d = load_tiny_nerf_npz(synthetic_path)
        d["synthetic"] = True
        return d
    from tinynerf_tpu.synthetic import generate_synthetic_dataset

    d = generate_synthetic_dataset()
    os.makedirs(os.path.dirname(os.path.abspath(synthetic_path)), exist_ok=True)
    np.savez(synthetic_path, images=d["images"], poses=d["poses"], focal=d["focal"])
    d["synthetic"] = True
    return d
