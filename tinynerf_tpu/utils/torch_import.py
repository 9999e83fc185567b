"""Import reference (PyTorch) TinyNeRF checkpoints into this framework.

A user of the reference has checkpoints shaped like
src/train.py:143-148: {"model": state_dict, "opt": ..., "step": N,
"in_dim": 63, "cfg": {hidden, depth, skip_at}} where the state_dict
keys follow src/nerf.py's module tree:
    layers.{i}.weight / layers.{i}.bias        (torch Linear: (out, in))
    sigma.0.weight / sigma.0.bias
    rgb.0.weight / rgb.0.bias

This converts those tensors into this framework's params pytree
(weights transposed to (in, out)) so trained reference models render
here directly — validated in tests/test_torch_parity.py by round-trip:
params -> state_dict -> params reproduces renders exactly.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import jax.numpy as jnp
import numpy as np


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):  # torch tensor
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def params_from_torch_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Reference state_dict -> tinynerf_tpu params pytree."""
    layers = []
    i = 0
    while f"layers.{i}.weight" in state_dict:
        layers.append(
            {
                "w": jnp.asarray(_to_np(state_dict[f"layers.{i}.weight"]).T),
                "b": jnp.asarray(_to_np(state_dict[f"layers.{i}.bias"])),
            }
        )
        i += 1
    if not layers:
        raise ValueError("no 'layers.N.weight' keys found — not a TinyNeRF state_dict")
    return {
        "layers": layers,
        "sigma": {
            "w": jnp.asarray(_to_np(state_dict["sigma.0.weight"]).T),
            "b": jnp.asarray(_to_np(state_dict["sigma.0.bias"])),
        },
        "rgb": {
            "w": jnp.asarray(_to_np(state_dict["rgb.0.weight"]).T),
            "b": jnp.asarray(_to_np(state_dict["rgb.0.bias"])),
        },
    }


def params_to_torch_state_dict(params) -> Dict[str, np.ndarray]:
    """Inverse direction: export this framework's TinyNeRF params to a
    reference-schema state_dict (numpy arrays; torch.save-able)."""
    out = {}
    for i, layer in enumerate(params["layers"]):
        out[f"layers.{i}.weight"] = np.asarray(layer["w"]).T.copy()
        out[f"layers.{i}.bias"] = np.asarray(layer["b"]).copy()
    out["sigma.0.weight"] = np.asarray(params["sigma"]["w"]).T.copy()
    out["sigma.0.bias"] = np.asarray(params["sigma"]["b"]).copy()
    out["rgb.0.weight"] = np.asarray(params["rgb"]["w"]).T.copy()
    out["rgb.0.bias"] = np.asarray(params["rgb"]["b"]).copy()
    return out


def import_torch_checkpoint(
    path: str, allow_pickle: bool = False
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load a reference .pth checkpoint -> (params, meta).

    meta carries {"step", "in_dim", "cfg"} from the torch checkpoint
    (src/train.py:143-148 schema). Reference checkpoints are plain
    tensor/dict payloads, so safe weights-only unpickling suffices;
    arbitrary-pickle loading (which executes code from the file) is
    gated behind allow_pickle=True.
    """
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        if not allow_pickle:
            raise ValueError(
                f"{path} is not a weights-only torch checkpoint; pass "
                "allow_pickle=True to run the full (code-executing) unpickler "
                "if you trust the file"
            )
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt["model"] if "model" in ckpt else ckpt
    params = params_from_torch_state_dict(state)
    meta = {
        "step": int(ckpt.get("step", 0)),
        "in_dim": int(ckpt.get("in_dim", params["layers"][0]["w"].shape[0])),
        "cfg": dict(ckpt.get("cfg", {"hidden": 128, "depth": 4, "skip_at": 2})),
    }
    return params, meta
