"""The TinyNeRF MLP as an explicit-parameter functional model.

Architecture parity with the reference (`src/nerf.py:10-41`):
depth=4 Linear+ReLU trunk, hidden=128; after the ReLU of layer index
(skip_at - 1) the encoded input is concatenated (widths for the default
63-dim encoding: 63->128, 128->128, 191->128, 128->128); heads
sigma = Linear(128,1)+ReLU and rgb = Linear(128,3)+Sigmoid — so sigma
is rectified inside the model and volume_render receives sigma >= 0.
Default parameter count: 66,308 (verified by tests/test_model.py).

TPU-first design: params are a plain pytree (dict of layer dicts) used
by a pure `apply_tinynerf(params, x)`; matmuls run in bfloat16 with
float32 accumulation (`preferred_element_type`) — the TPU analog of the
reference's CUDA AMP autocast (src/train.py:116) with no GradScaler
needed (bf16 keeps fp32's exponent range). Initialization follows the
same uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) family as torch's Linear
default so training dynamics match the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TinyNeRFConfig:
    in_dim: int = 63
    hidden: int = 128
    depth: int = 4
    skip_at: int = 2
    compute_dtype: Any = jnp.bfloat16  # matmul input dtype; params stay fp32


def _linear_init(key, fan_in: int, fan_out: int):
    """uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both W and b."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.float32(fan_in))
    w = jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def init_tinynerf(key: jax.Array, cfg: TinyNeRFConfig = TinyNeRFConfig()) -> Params:
    """Initialize the params pytree."""
    keys = jax.random.split(key, cfg.depth + 2)
    layers = []
    last = cfg.in_dim
    for i in range(cfg.depth):
        layers.append(_linear_init(keys[i], last, cfg.hidden))
        # The layer after the skip concat sees hidden + in_dim inputs.
        last = cfg.hidden if i != (cfg.skip_at - 1) else (cfg.hidden + cfg.in_dim)
    return {
        "layers": layers,
        "sigma": _linear_init(keys[cfg.depth], cfg.hidden, 1),
        "rgb": _linear_init(keys[cfg.depth + 1], cfg.hidden, 3),
    }


def _dense(h: jax.Array, layer: Params, compute_dtype) -> jax.Array:
    """bf16-in, fp32-accumulate dense layer (MXU-friendly)."""
    out = jnp.dot(
        h.astype(compute_dtype),
        layer["w"].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return out + layer["b"]


def apply_tinynerf(
    params: Params,
    x: jax.Array,
    cfg: TinyNeRFConfig = TinyNeRFConfig(),
    sigma_noise=None,
):
    """Forward pass: encoded coords (N, in_dim) -> (rgb (N,3), sigma (N,1)).

    Skip behavior matches src/nerf.py:35-38: concat [h, x] after the
    ReLU of layer (skip_at - 1). sigma_noise (N,1)|None is train-time
    regularization noise added to raw density pre-ReLU (NeRF paper's
    raw_noise_std; no reference equivalent — src/nerf.py:26 rectifies
    the raw head directly).
    """
    h = x
    for i, layer in enumerate(params["layers"]):
        h = jax.nn.relu(_dense(h, layer, cfg.compute_dtype))
        if i == cfg.skip_at - 1:
            h = jnp.concatenate([h, x.astype(h.dtype)], axis=-1)
    rgb = jax.nn.sigmoid(_dense(h, params["rgb"], cfg.compute_dtype))
    sigma_raw = _dense(h, params["sigma"], cfg.compute_dtype)
    if sigma_noise is not None:
        sigma_raw = sigma_raw + sigma_noise.astype(sigma_raw.dtype)
    sigma = jax.nn.relu(sigma_raw)
    return rgb, sigma


def count_params(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
