"""Sharded full-image rendering: rays split across the mesh's data axis.

Each device renders H*W/n_data rays through the same chunked pipeline
as render.py and one all_gather assembles the image — novel-view
rendering scales linearly over ICI (rays are independent; zero
cross-device traffic until the final gather).
"""

from __future__ import annotations


from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tinynerf_tpu.models.tinynerf import TinyNeRFConfig
from tinynerf_tpu.ops.rays import get_rays
from tinynerf_tpu.parallel.mesh import DATA_AXIS, make_mesh, mesh_axes
from tinynerf_tpu.render import render_rays


def make_sharded_image_renderer(
    mesh: Optional[Mesh] = None,
    *,
    H: int,
    W: int,
    focal: float,
    chunk: int = 8192,
    n_samples: int = 64,
    near: float = 2.0,
    far: float = 6.0,
    num_freqs: int = 10,
    white_bkgd: bool = True,
    model_cfg: TinyNeRFConfig = TinyNeRFConfig(),
    use_fused: bool = False,
):
    """Build a jitted sharded `(params, pose) -> (H, W, 3)` renderer."""
    mesh = mesh or make_mesh()
    n_data, _ = mesh_axes(mesh)
    hw = H * W
    hw_local = -(-hw // n_data)  # rays per device (padded)
    n_chunks = -(-hw_local // chunk)
    chunk_eff = min(chunk, hw_local)
    hw_local_pad = n_chunks * chunk_eff if n_chunks * chunk_eff >= hw_local else hw_local
    n_chunks = -(-hw_local // chunk_eff)
    hw_local_pad = n_chunks * chunk_eff

    def render(params, pose):
        rays_o, rays_d = get_rays(H, W, focal, pose)  # replicated, cheap
        total_pad = n_data * hw_local_pad - hw
        rays_o = jnp.pad(rays_o, ((0, total_pad), (0, 0)))
        rays_d = jnp.concatenate(
            [rays_d, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (total_pad, 3))], 0
        )
        me = jax.lax.axis_index(DATA_AXIS)
        ro = jax.lax.dynamic_slice_in_dim(rays_o, me * hw_local_pad, hw_local_pad, 0)
        rd = jax.lax.dynamic_slice_in_dim(rays_d, me * hw_local_pad, hw_local_pad, 0)

        def one_chunk(args):
            return render_rays(
                params,
                *args,
                n_samples=n_samples,
                near=near,
                far=far,
                num_freqs=num_freqs,
                white_bkgd=white_bkgd,
                model_cfg=model_cfg,
                use_fused=use_fused,
            )

        out = jax.lax.map(
            one_chunk,
            (ro.reshape(n_chunks, chunk_eff, 3), rd.reshape(n_chunks, chunk_eff, 3)),
        ).reshape(hw_local_pad, 3)
        img = jax.lax.all_gather(out, DATA_AXIS, axis=0).reshape(-1, 3)[:hw]
        return jnp.clip(img.reshape(H, W, 3), 0.0, 1.0)

    sharded = jax.shard_map(
        render, mesh=mesh, in_specs=(P(), P()), out_specs=P(), check_vma=False
    )
    return jax.jit(sharded)
