"""Round-5 diagnostic (ADVICE r4 medium #2): does --sigma-noise-std
actually perturb the FUSED train paths' logged loss?

The r4 hard-scene legs (hard20k: fused hierarchical, hardocc20k:
occupancy+streamed) produced bit-identical 400-point metric streams
despite std-4.0 noise supposedly active — only possible if either the
noise never reached the kernels, or both renders were constant
(exactly-white) from step <= 50. This probe answers which, on CPU in
interpret mode, with tiny shapes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np

from tinynerf_tpu.kernels.fused_nerf_train import make_fused_nerf_grad_fn
from tinynerf_tpu.models.nerf import NeRFConfig, init_nerf
from tinynerf_tpu.training import (
    TrainSettings,
    init_train_state,
    make_train_block,
)

ncfg = NeRFConfig(
    hidden=32, depth=2, skip_at=1, rgb_hidden=16,
    compute_dtype=jnp.float32,  # CPU DotThunk lacks bf16
)
R, SC, SF = 256, 16, 16


def run(std, decay, steps=2, seed=0):
    s = TrainSettings(
        n_rand=R, n_samples=SC, sigma_noise_std=std,
        sigma_noise_decay_steps=decay, ray_sampling="pool",
    )
    params, opt = init_train_state(
        jax.random.PRNGKey(seed), s, init_fn=lambda k: init_nerf(k, ncfg)
    )
    block = make_train_block(
        s, steps, grad_fn=make_fused_nerf_grad_fn(s, ncfg, n_fine=SF)
    )
    key = jax.random.PRNGKey(42)
    ro = jax.random.normal(key, (2, 64 * 64, 3)) * 0.1
    rd = jax.random.normal(jax.random.fold_in(key, 1), (2, 64 * 64, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    px = jax.random.uniform(jax.random.fold_in(key, 2), (2, 64 * 64, 3))
    params, opt, m = block(params, opt, key, jnp.int32(0), ro, rd, px)
    return np.asarray(m["loss"])


l0 = run(0.0, 0)
l4 = run(4.0, 8000)
l1 = run(1.0, 2000)
print("losses std=0   :", l0)
print("losses std=4   :", l4)
print("losses std=1   :", l1)
print("std4 differs from std0:", not np.allclose(l0, l4))
print("std4 differs from std1:", not np.allclose(l1, l4))
