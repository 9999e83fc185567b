"""Full NeRF: view-direction conditioning + split coarse/fine MLPs with
hierarchical resampling.

The reference stops at TinyNeRF ("no viewdirs yet", src/nerf.py:5-7;
no hierarchical sampling, src/utils.py:8) — this module is the
capability upgrade mandated by BASELINE config 4, built TPU-first:

- static-shape hierarchical resampling (ops/sampling.sample_pdf:
  searchsorted inverse-CDF, jit/vmap/shard-safe);
- the fine pass runs on the sorted union of coarse+fine depths, so a
  single fixed-shape MLP batch serves both (no ragged shapes);
- view directions are Fourier-encoded (default L=4) and injected after
  the density head — density stays view-independent, color doesn't,
  matching the NeRF architecture;
- both MLPs share the same explicit-pytree init/apply discipline as
  TinyNeRF (bf16 matmuls, fp32 accumulation).

Architecture (per MLP): `depth` x `hidden` ReLU trunk with a skip
concat at `skip_at`; sigma = Linear(hidden, 1) from the trunk;
rgb = Sigmoid(Linear(rgb_hidden, 3)) applied to
ReLU(Linear(hidden + dir_dim, rgb_hidden)) of [trunk_feature, dir_enc].
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from tinynerf_tpu.models.tinynerf import _linear_init
from tinynerf_tpu.ops.encoding import encoding_dim, positional_encoding
from tinynerf_tpu.ops.sampling import sample_pdf, stratified_samples
from tinynerf_tpu.ops.volume import volume_render

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    num_freqs: int = 10  # position encoding bands
    num_freqs_dir: int = 4  # view-direction encoding bands
    hidden: int = 128
    depth: int = 8
    skip_at: int = 4
    rgb_hidden: int = 64
    use_viewdirs: bool = True
    compute_dtype: Any = jnp.bfloat16

    @property
    def in_dim(self) -> int:
        return encoding_dim(self.num_freqs)

    @property
    def dir_dim(self) -> int:
        return encoding_dim(self.num_freqs_dir) if self.use_viewdirs else 0


def init_nerf_mlp(key: jax.Array, cfg: NeRFConfig) -> Params:
    """One NeRF MLP (used twice: coarse + fine)."""
    n_keys = cfg.depth + 4
    keys = jax.random.split(key, n_keys)
    layers = []
    last = cfg.in_dim
    for i in range(cfg.depth):
        layers.append(_linear_init(keys[i], last, cfg.hidden))
        last = cfg.hidden if i != (cfg.skip_at - 1) else (cfg.hidden + cfg.in_dim)
    return {
        "layers": layers,
        "sigma": _linear_init(keys[cfg.depth], cfg.hidden, 1),
        "rgb_in": _linear_init(keys[cfg.depth + 1], cfg.hidden + cfg.dir_dim, cfg.rgb_hidden),
        "rgb": _linear_init(keys[cfg.depth + 2], cfg.rgb_hidden, 3),
    }


def init_nerf(key: jax.Array, cfg: NeRFConfig = NeRFConfig()) -> Params:
    """{'coarse': mlp, 'fine': mlp} parameter pytree."""
    kc, kf = jax.random.split(key)
    return {"coarse": init_nerf_mlp(kc, cfg), "fine": init_nerf_mlp(kf, cfg)}


def _dense(h, layer, dt):
    return (
        jnp.dot(h.astype(dt), layer["w"].astype(dt), preferred_element_type=jnp.float32)
        + layer["b"]
    )


def apply_nerf_mlp(
    params: Params,
    x_enc: jax.Array,
    d_enc: Optional[jax.Array],
    cfg: NeRFConfig,
    sigma_noise: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """(N, in_dim), (N, dir_dim)|None -> (rgb (N,3), sigma (N,1)).

    sigma_noise (N, 1)|None: train-time regularization noise added to
    the RAW density before its ReLU (the NeRF paper's raw_noise_std).
    Keeps the ReLU gradient alive when raw sigma drifts negative — the
    anti-sigma-death mechanism (see docs/DESIGN.md; the reference has
    no equivalent, its recipe never needs one on the Lego scene).
    """
    dt = cfg.compute_dtype
    h = x_enc
    for i, layer in enumerate(params["layers"]):
        h = jax.nn.relu(_dense(h, layer, dt))
        if i == cfg.skip_at - 1:
            h = jnp.concatenate([h, x_enc.astype(h.dtype)], axis=-1)
    sigma_raw = _dense(h, params["sigma"], dt)
    if sigma_noise is not None:
        sigma_raw = sigma_raw + sigma_noise.astype(sigma_raw.dtype)
    sigma = jax.nn.relu(sigma_raw)
    if cfg.use_viewdirs:
        assert d_enc is not None, "use_viewdirs=True requires direction encodings"
        h = jnp.concatenate([h, d_enc.astype(h.dtype)], axis=-1)
    h = jax.nn.relu(_dense(h, params["rgb_in"], dt))
    rgb = jax.nn.sigmoid(_dense(h, params["rgb"], dt))
    return rgb, sigma


def render_rays_hierarchical(
    params: Params,
    rays_o: jax.Array,
    rays_d: jax.Array,
    *,
    n_coarse: int = 64,
    n_fine: int = 64,
    near: float = 2.0,
    far: float = 6.0,
    white_bkgd: bool = True,
    cfg: NeRFConfig = NeRFConfig(),
    randomized: bool = False,
    key: Optional[jax.Array] = None,
    sigma_noise_std: float = 0.0,
    sigma_noise_scale=1.0,
    return_aux: bool = False,
):
    """Coarse pass -> inverse-CDF resample -> fine pass on the union.

    Returns (comp_coarse (R,3), comp_fine (R,3)); with return_aux=True,
    (comp_coarse, comp_fine, depth_fine (R,), acc_fine (R,)) — the fine
    pass's expected ray-termination depth and accumulated opacity (the
    render.py aux/geometry channels).

    sigma_noise_std > 0 adds N(0, std) noise to raw density pre-ReLU in
    BOTH passes (train-time only: requires randomized=True/key);
    sigma_noise_scale (traced scalar ok) multiplies the drawn noise —
    the decay-schedule hook (training.TrainSettings
    .sigma_noise_decay_steps).
    """
    n_rays = rays_o.shape[0]
    k_nc = k_nf = None
    if randomized:
        if sigma_noise_std > 0.0:
            # Extra splits ONLY when noise is on: the noise-off
            # jitter/resample streams stay bit-identical to the
            # historical recipe.
            key, k_nc, k_nf = jax.random.split(key, 3)
        k_strat, k_pdf = jax.random.split(key)
    else:
        k_strat = k_pdf = None

    # Viewdir encodings: one per ray, broadcast over samples.
    if cfg.use_viewdirs:
        vdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        d_enc_ray = positional_encoding(vdirs, num_freqs=cfg.num_freqs_dir)  # (R, Dd)
    else:
        d_enc_ray = None

    def run_mlp(mlp_params, pts, n_samples, k_noise=None):
        x_enc = positional_encoding(pts.reshape(-1, 3), num_freqs=cfg.num_freqs)
        d_enc = (
            jnp.repeat(d_enc_ray, n_samples, axis=0) if cfg.use_viewdirs else None
        )
        noise = None
        if sigma_noise_std > 0.0 and k_noise is not None:
            noise = sigma_noise_scale * sigma_noise_std * jax.random.normal(
                k_noise, (n_rays * n_samples, 1), jnp.float32
            )
        rgb, sigma = apply_nerf_mlp(mlp_params, x_enc, d_enc, cfg, sigma_noise=noise)
        return rgb.reshape(n_rays, n_samples, 3), sigma.reshape(n_rays, n_samples)

    # --- coarse ---
    z_c, pts_c = stratified_samples(
        near, far, n_coarse, rays_o, rays_d, randomized=randomized, key=k_strat
    )
    rgb_c, sigma_c = run_mlp(params["coarse"], pts_c, n_coarse, k_noise=k_nc)
    comp_c, _, _, weights = volume_render(
        rgb_c, sigma_c, z_c, rays_d, white_bkgd=white_bkgd
    )

    # --- hierarchical resample (NeRF eq. 5): PDF over interior bins ---
    z_mids = 0.5 * (z_c[:, 1:] + z_c[:, :-1])  # (R, Nc-1)
    z_f = sample_pdf(
        z_mids,
        jax.lax.stop_gradient(weights[:, 1:-1]),
        n_fine,
        randomized=randomized,
        key=k_pdf,
    )
    z_union = jnp.sort(jnp.concatenate([z_c, z_f], axis=-1), axis=-1)
    pts_f = rays_o[:, None, :] + rays_d[:, None, :] * z_union[..., None]

    # --- fine ---
    rgb_f, sigma_f = run_mlp(params["fine"], pts_f, n_coarse + n_fine, k_noise=k_nf)
    comp_f, depth_f, acc_f, _ = volume_render(
        rgb_f, sigma_f, z_union, rays_d, white_bkgd=white_bkgd
    )
    if return_aux:
        return comp_c, comp_f, depth_f, acc_f
    return comp_c, comp_f


def make_hierarchical_loss(cfg: NeRFConfig, n_fine: int = 64):
    """Coarse+fine MSE loss pluggable into training.make_train_block.

    Matches the NeRF paper's objective: sum of the coarse and fine MSEs
    (both passes supervise their MLPs); PSNR is reported on the fine
    composite.
    """
    from tinynerf_tpu.utils.metrics import mse2psnr

    def loss(params, ro, rd, target, key, s, noise_scale=1.0):
        comp_c, comp_f = render_rays_hierarchical(
            params,
            ro,
            rd,
            n_coarse=s.n_samples,
            n_fine=n_fine,
            near=s.near,
            far=s.far,
            white_bkgd=s.white_bkgd,
            cfg=cfg,
            randomized=True,
            key=key,
            sigma_noise_std=getattr(s, "sigma_noise_std", 0.0),
            sigma_noise_scale=noise_scale,
        )
        target = target.astype(jnp.float32)
        mse_c = jnp.mean((comp_c - target) ** 2)
        mse_f = jnp.mean((comp_f - target) ** 2)
        return mse_c + mse_f, {
            "loss": mse_f,
            "psnr": mse2psnr(mse_f),
            "loss_coarse": mse_c,
        }

    return loss


def count_params(params: Params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
