"""Checkpoint-driven model reconstruction shared by the inference CLIs.

Rebuilds the right model family (tinynerf, nerf, or grid) and a matching
jitted image renderer from a checkpoint's stored metadata — the
reference's make_gif.py:19 pattern ("arch hyperparams from ckpt['cfg']
with fallback defaults") generalized to both model kinds.
"""

from __future__ import annotations

import json


import jax
import numpy as np


def load_model_and_renderer(
    ckpt_path: str,
    *,
    H: int,
    W: int,
    focal: float,
    n_samples: int = 64,
    near: float = 2.0,
    far: float = 6.0,
    chunk: int = 8192,
    fused: bool = False,
    frames: bool = False,
    n_fine: "int | None" = None,
    aux: bool = False,
):
    """-> (params, renderer, meta) with renderer: (params, pose) -> image
    (or, with frames=True, (params, poses (F,4,4)) -> (F,H,W,3)).

    aux=True builds a GEOMETRY renderer instead: packed (depth, acc)
    pseudo-images (render.pack_aux / unpack_aux).

    n_fine (None = use the checkpoint's stored fine-sample count)
    overrides the fine-sample budget for the hierarchical model —
    rendering can spend MORE quadrature than training did (the streamed
    kernels make large unions cheap). An explicit 0 means zero fine
    samples (coarse/grid-proposal budget only), which a falsy check
    could not express (ADVICE r3)."""
    from tinynerf_tpu.models.tinynerf import TinyNeRFConfig
    from tinynerf_tpu.ops.encoding import encoding_dim
    from tinynerf_tpu.render import make_hierarchical_image_renderer, make_image_renderer
    from tinynerf_tpu.utils import checkpoint as ckpt_lib

    with np.load(ckpt_path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))["meta"]
    mcfg = meta.get("cfg", {"hidden": 128, "depth": 4, "skip_at": 2, "num_freqs": 10})
    num_freqs = mcfg.get("num_freqs", 10)
    model_kind = meta.get("model", "tinynerf")
    # NDC training bakes the ray parameterization into the weights: the
    # renderer must reproject the same way (and sample t in [0,1]).
    ndc = bool(mcfg.get("ndc", False))
    if ndc:
        near, far = 0.0, 1.0

    if model_kind == "nerf":
        from tinynerf_tpu.models.nerf import NeRFConfig, init_nerf, init_nerf_mlp

        ncfg = NeRFConfig(
            num_freqs=num_freqs,
            num_freqs_dir=mcfg.get("num_freqs_dir", 4),
            hidden=mcfg["hidden"],
            depth=mcfg["depth"],
            skip_at=mcfg["skip_at"],
            rgb_hidden=mcfg.get("rgb_hidden", 64),
        )
        if mcfg.get("proposal", "coarse") == "occupancy":
            # Grid-proposal checkpoints hold a single MLP; the sampler
            # (the density grid) is recomputed from those params inside
            # the renderer — nothing else to restore.
            import jax.numpy as jnp

            from tinynerf_tpu.render import make_occupancy_image_renderer
            from tinynerf_tpu.ops.occupancy import default_aabb

            if mcfg.get("occ_aabb") is not None:
                # Training persisted its grid bounds — the sampler must
                # be rebuilt over the SAME box.
                aabb = jnp.asarray(mcfg["occ_aabb"], jnp.float32)
            else:
                aabb = default_aabb(1.0) if ndc else None
            params_t = {"fine": init_nerf_mlp(jax.random.PRNGKey(0), ncfg)}
            renderer = make_occupancy_image_renderer(
                H=H, W=W, focal=focal, chunk=min(chunk, 4096),
                n_samples=n_samples
                + (n_fine if n_fine is not None else mcfg.get("n_fine", 64)),
                near=near, far=far, nerf_cfg=ncfg, use_fused=fused,
                frames=frames, ndc=ndc, aabb=aabb, aux=aux,
            )
        else:
            params_t = init_nerf(jax.random.PRNGKey(0), ncfg)
            renderer = make_hierarchical_image_renderer(
                H=H, W=W, focal=focal, chunk=min(chunk, 4096),
                n_coarse=n_samples,
                n_fine=n_fine if n_fine is not None else mcfg.get("n_fine", 64),
                near=near, far=far, nerf_cfg=ncfg, use_fused=fused,
                frames=frames, ndc=ndc, aux=aux,
            )
    elif model_kind == "grid":
        from tinynerf_tpu.models.grid_nerf import GridNeRFConfig, init_grid_nerf
        from tinynerf_tpu.render import make_grid_image_renderer

        g = mcfg.get("grid", {})
        gcfg = GridNeRFConfig(
            n_levels=g.get("levels", 8),
            features=g.get("features", 2),
            base_res=g.get("base_res", 16),
            max_res=g.get("max_res", 128),
            table_size=g.get("table_size", 1 << 17),
            hidden=g.get("hidden", 64),
            num_freqs_dir=mcfg.get("num_freqs_dir", 4),
            # The box the tables were trained in — normalization must
            # match or every lookup lands in the wrong cell.
            **(
                {"aabb": tuple(float(v) for v in g["aabb"])}
                if g.get("aabb") is not None
                else {}
            ),
        )
        params_t = init_grid_nerf(jax.random.PRNGKey(0), gcfg)
        renderer = make_grid_image_renderer(
            H=H, W=W, focal=focal, grid_cfg=gcfg, chunk=chunk,
            n_samples=n_samples, near=near, far=far,
            frames=frames, ndc=ndc, aux=aux,
        )
    else:
        model_cfg = TinyNeRFConfig(
            in_dim=encoding_dim(num_freqs),
            hidden=mcfg["hidden"],
            depth=mcfg["depth"],
            skip_at=mcfg["skip_at"],
        )
        from tinynerf_tpu.models.tinynerf import init_tinynerf

        params_t = init_tinynerf(jax.random.PRNGKey(0), model_cfg)
        renderer = make_image_renderer(
            H=H, W=W, focal=focal, chunk=chunk, n_samples=n_samples,
            near=near, far=far, num_freqs=num_freqs, model_cfg=model_cfg,
            use_fused=fused, frames=frames, ndc=ndc, aux=aux,
        )
    # Params-only restore: render-only consumers must accept checkpoints
    # written under ANY optimizer configuration (--lr-decay-steps changes
    # the optax state structure; restore_checkpoint would reject it).
    params, step, _ = ckpt_lib.restore_params(ckpt_path, params_t)
    meta["step"] = step
    meta["model"] = model_kind
    return params, renderer, meta
