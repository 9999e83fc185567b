"""Multi-scene batched training: K independent NeRFs advance in
lockstep, vmapped on-chip and sharded scene-wise across the mesh.

No reference counterpart (the reference trains one scene per process) —
this is BASELINE config 5's capability: batched 400x400 scenes with the
work spread over a v5e mesh. Scenes are embarrassingly parallel, so the
scene axis shards over the mesh's 'data' axis with ZERO cross-device
collectives in the update path (only a pmean for logging); within a
device, scenes are vmapped so XLA batches K models' matmuls into one
MXU stream (batch-of-GEMMs — far better than K sequential programs).

RNG: scene k's stream is fold_in(key, k) then per-step folding, so a
K-scene batched run reproduces K independent single-scene runs exactly
(tested in tests/test_multiscene.py).
"""

from __future__ import annotations


from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tinynerf_tpu.models.tinynerf import init_tinynerf
from tinynerf_tpu.parallel.mesh import DATA_AXIS, make_mesh, mesh_axes
from tinynerf_tpu.training import TrainSettings, _step_body, loss_fn, settings_optimizer


def init_multiscene_state(key: jax.Array, n_scenes: int, s: TrainSettings, init_fn=None):
    """(params, opt_state) with a leading scene axis.

    init_fn(key) -> params overrides the TinyNeRF init (e.g. the
    hierarchical coarse/fine pair via models/nerf.init_nerf).
    """
    keys = jax.random.split(key, n_scenes)
    one = init_fn or (lambda k: init_tinynerf(k, s.model_cfg))
    params = jax.vmap(one)(keys)
    opt_state = jax.vmap(settings_optimizer(s).init)(params)
    return params, opt_state


def make_multiscene_train_block(
    s: TrainSettings,
    block_size: int,
    n_scenes: int,
    mesh: Optional[Mesh] = None,
    loss=None,
    grad_fn=None,
):
    """Jitted sharded K-step block over batched scenes.

    fn(params, opt_state, key, step0, rays_o, rays_d, pixels) ->
    (params, opt_state, metrics with shape (block, n_scenes)).

    Array layouts (leading scene axis, sharded over 'data'):
      params/opt_state: pytrees with leading dim K
      rays_o/rays_d:    (K, N_images, H*W, 3)
      pixels:           (K, N_images, H*W, 3)
    """
    mesh = mesh or make_mesh()
    n_data, n_sample = mesh_axes(mesh)
    if n_sample != 1:
        raise ValueError("multi-scene training uses a 1-D ('data',) mesh")
    if n_scenes % n_data:
        raise ValueError(f"n_scenes={n_scenes} not divisible by mesh size {n_data}")
    k_loc = n_scenes // n_data
    opt = settings_optimizer(s)
    loss = loss or loss_fn

    def block(params, opt_state, key, step0, rays_o, rays_d, pixels):
        me = jax.lax.axis_index(DATA_AXIS) if n_data > 1 else 0
        scene_ids = me * k_loc + jnp.arange(k_loc)
        scene_keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(scene_ids)

        def body(carry, i):
            params, opt_state = carry
            step = step0 + i

            def one_scene(p, o, k, ro, rd, px):
                # grad_fn (the fused Pallas kernel) vmaps across scenes:
                # Pallas supports batching by extending the grid.
                return _step_body(p, o, k, step, ro, rd, px, s, opt, loss, grad_fn)

            params, opt_state, metrics = jax.vmap(one_scene)(
                params, opt_state, scene_keys, rays_o, rays_d, pixels
            )
            return (params, opt_state), metrics

        (params, opt_state), metrics = jax.lax.scan(
            body, (params, opt_state), jnp.arange(block_size)
        )
        return params, opt_state, metrics

    if n_data == 1:
        # Trivial mesh: skip shard_map entirely — its single-device
        # wrapper measured ~10x step overhead (layout copies around the
        # vmapped kernel) with zero benefit.
        return jax.jit(block, donate_argnums=(0, 1))

    scene_sharded = P(DATA_AXIS)
    sharded = jax.shard_map(
        block,
        mesh=mesh,
        in_specs=(
            scene_sharded,  # params (leading scene axis)
            scene_sharded,  # opt_state
            P(),  # key
            P(),  # step0
            scene_sharded,  # rays_o
            scene_sharded,  # rays_d
            scene_sharded,  # pixels
        ),
        out_specs=(scene_sharded, scene_sharded, P(None, DATA_AXIS)),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1))


def scene_params(params, k: int):
    """Extract scene k's parameter pytree (drops the scene axis)."""
    return jax.tree_util.tree_map(lambda x: x[k], params)
