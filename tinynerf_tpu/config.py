"""Training configuration — the reference's flag surface plus TPU extensions.

The first block of fields mirrors the reference `Config` dataclass
(src/train.py:20-34) verbatim (same names, defaults, semantics) so a
user of the reference can reuse their command lines. The second block
exposes what the reference hard-codes (model/encoding hyperparameters,
src/train.py:78-79) and adds TPU-native controls (bf16, fused Pallas
kernels, data-parallel mesh, profiling).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp

from tinynerf_tpu.models.tinynerf import TinyNeRFConfig
from tinynerf_tpu.ops.encoding import encoding_dim
from tinynerf_tpu.training import TrainSettings


@dataclass
class Config:
    # --- reference-parity surface (src/train.py:20-34) ---
    iters: int = 20000  # total training steps
    n_rand: int = 2048  # random rays per step
    n_samples: int = 64  # samples along each ray
    lr: float = 5e-4
    lr_decay_steps: int = 0  # >0: exponential decay over this many steps
    lr_decay_factor: float = 0.1  # final lr = lr * factor (NeRF schedule)
    near: float = 2.0
    far: float = 6.0
    log_every: int = 50
    preview_every: int = 500
    ckpt_every: int = 1000
    ckpt_path: str = "checkpoints/tinynerf_latest.npz"
    out_dir: str = "outputs"
    resume: bool = True
    preview_pose: Optional[int] = None  # None -> (img_i + 1) % N

    # --- hyperparameters the reference hard-codes (src/train.py:78-79) ---
    hidden: int = 128
    depth: int = 4
    skip_at: int = 2
    num_freqs: int = 10
    seed: int = 0
    chunk: int = 8192  # rays per render chunk (src/train.py:43)

    # --- full-NeRF upgrade (BASELINE config 4; no reference counterpart) ---
    model: str = "tinynerf"  # "tinynerf" | "nerf" (viewdirs + coarse/fine)
    # | "grid" (multi-resolution grid encoding, models/grid_nerf.py —
    # Instant-NGP-style; converges in far fewer steps)
    n_fine: int = 64  # fine samples per ray (nerf model only)
    proposal: str = "coarse"  # nerf model's proposal distribution:
    # "coarse": a second MLP, the NeRF paper's hierarchical scheme |
    # "occupancy": a density grid recomputed from the current params
    # (ops/occupancy.py, NerfAcc-style) — a single MLP then takes
    # n_samples + n_fine importance samples, no coarse-MLP cost.
    nerf_depth: int = 8
    nerf_skip_at: int = 4
    num_freqs_dir: int = 4
    rgb_hidden: int = 64

    # --- grid model family (models/grid_nerf.py; --model grid) ---
    grid_levels: int = 8  # feature-pyramid levels
    grid_features: int = 2  # features per level
    grid_base_res: int = 16  # coarsest grid resolution
    grid_max_res: int = 128  # finest grid resolution
    grid_table_size: int = 1 << 17  # entries/level cap (finer levels hash)
    grid_hidden: int = 64  # grid-MLP width (both branches)
    grid_encode_impl: str = "loop"  # "loop" | "cat" | "cat_pib" — gather
    # strategy, numerically identical (models/grid_nerf.GridNeRFConfig.
    # encode_impl); default follows the measured on-chip attribution
    # (benchmarks/r5/grid_profile.json)

    # --- ray batching ---
    ray_sampling: str = "image"  # "image": one image per step (reference
    # semantics, src/train.py:108-112) | "pool": every step draws from
    # the union of all train pixels (full-NeRF batching; decorrelated
    # gradients, no per-image cycling transient)

    # --- warmup ray cropping (anti sigma-death on background-heavy
    # captures; the original NeRF's precrop trick for white-bkgd Lego) ---
    precrop_iters: int = 0  # >0: draw rays only from the central
    # precrop-frac window of each image for this many warmup steps —
    # re-weights the early gradient toward object pixels so a
    # background-dominated capture (r4's lattice: 77% white) cannot
    # push raw sigma negative everywhere before geometry forms
    precrop_frac: float = 0.5  # side fraction of the central crop

    # --- sigma-death watchdog (VERDICT r4 weak #3: a run pinned at
    # background PSNR for 15k steps should abort, not burn the window) ---
    death_check: bool = True  # abort when the train PSNR is pinned
    # within death-margin dB of the background-only PSNR floor for
    # death-window consecutive log points (after death-grace steps)
    death_margin: float = 1.0
    death_window: int = 20
    death_grace: int = 1000

    # --- density regularization ---
    sigma_noise_std: float = 0.0  # train-time N(0, std) noise on RAW
    # density pre-ReLU (the NeRF paper's raw_noise_std; reference has
    # none). Prevents ReLU sigma-death: pool-mode's decorrelated early
    # gradient can push raw sigma negative everywhere, zeroing all
    # gradients permanently (measured on TPU — docs/DESIGN.md). Use
    # ~1.0 with --ray-sampling pool.
    sigma_noise_decay_steps: int = 0  # >0: linearly decay the noise to
    # 0 over this many steps. The regularizer is only needed through the
    # early death-window; held constant it fogs free space late in
    # training (measured: constant-noise pool run lost ~5 dB on
    # top-down views). Recommended: ~2000 with --ray-sampling pool.
    sigma_noise_floor: float = 0.0  # with decay: decay to THIS std
    # instead of 0 — a mild permanent density regularizer (one of the
    # anti-memorization levers for the train/held-out gap).
    weight_decay: float = 0.0  # AdamW decoupled decay on weight
    # matrices (anti-memorization lever; 0 = reference-parity Adam)
    lr_floor: float = 0.0  # with --lr-decay-steps: clamp the schedule
    # at this lr instead of decaying indefinitely
    sigma_sparsity: float = 0.0  # >0 (e.g. 1e-3): free-space density
    # prior — L1 on sigma at random points in the scene box each step
    # (Plenoxels-style). Clears the diffuse density halo that costs
    # held-out PSNR at viewing angles the capture under-covers
    # (docs/DESIGN.md 4d); composes with --fused-train (the prior is an
    # additive XLA gradient term, ~1-2% extra compute)
    sigma_sparsity_points: int = 8192  # points sampled per step
    ema_decay: float = 0.0  # >0 (e.g. 0.999): Polyak-average the params;
    # the average is checkpointed as a TWIN file <ckpt>.ema.npz that any
    # render consumer (eval/make_gif) can load directly, and held-out
    # evals score both the raw and averaged weights

    # --- forward-facing (LLFF-style) scenes: NDC reparameterization ---
    ndc: bool = False  # project rays to NDC space (ops/rays.ndc_rays,
    # near plane 1.0) and sample t in [0,1] — uniform DISPARITY in world
    # space. For forward-facing captures; --near/--far are ignored.

    # --- TPU-native extensions ---
    data_path: str = "data/tiny_nerf_data.npz"
    allow_synthetic: bool = True  # fall back to the procedural scene offline
    bf16: bool = True  # bfloat16 matmuls (fp32 params/accum)
    fused: bool = False  # route rendering through the fused Pallas kernel
    fused_train: bool = False  # fused Pallas fwd+bwd train kernel (TPU;
    # ~4x faster steps; jitter via the in-kernel hardware PRNG)
    data_parallel: bool = False  # shard ray batches over all local devices
    sample_parallel: int = 1  # with data_parallel: size of the mesh's
    # sample axis (shards the per-ray sample axis / fine union via the
    # blockwise composite — sequence parallelism)
    distributed: bool = False  # multi-host: jax.distributed bootstrap
    # (coordinator from the launcher env; see parallel/mesh.py)
    profile_dir: Optional[str] = None  # jax.profiler trace output
    metrics_path: Optional[str] = None  # JSONL metrics log
    holdout: int = 0  # poses excluded from training, used for held-out
    # novel-view PSNR evaluation at the end of the run
    holdout_mode: str = "tail"  # "tail": the trailing N poses |
    # "strided": N poses evenly spread over the capture's pose sequence
    # (pose-diverse eval — the tail of the reference capture clusters
    # in one orbit region, so tail-holdout under-covers the pose space)
    eval_every: int = 0  # >0: render + score the held-out views every N
    # steps and log to the JSONL metrics (the held-out learning curve;
    # requires --holdout > 0)
    ckpt_keep: int = 0  # >0: also retain the last N step-stamped
    # checkpoint copies (0 = single latest file, reference behavior)

    def model_cfg(self) -> TinyNeRFConfig:
        return TinyNeRFConfig(
            in_dim=encoding_dim(self.num_freqs, include_input=True),
            hidden=self.hidden,
            depth=self.depth,
            skip_at=self.skip_at,
            compute_dtype=jnp.bfloat16 if self.bf16 else jnp.float32,
        )

    def nerf_cfg(self):
        from tinynerf_tpu.models.nerf import NeRFConfig

        return NeRFConfig(
            num_freqs=self.num_freqs,
            num_freqs_dir=self.num_freqs_dir,
            hidden=self.hidden,
            depth=self.nerf_depth,
            skip_at=self.nerf_skip_at,
            rgb_hidden=self.rgb_hidden,
            compute_dtype=jnp.bfloat16 if self.bf16 else jnp.float32,
        )

    def grid_cfg(self, aabb=None):
        """GridNeRFConfig; aabb (2, 3 array-like) overrides the default
        scene box — the driver derives it from the capture's rays and
        persists it in checkpoint meta (the same contract as occ_aabb)."""
        import numpy as np

        from tinynerf_tpu.models.grid_nerf import GridNeRFConfig

        kw = {}
        if aabb is not None:
            a = np.asarray(aabb, np.float64).reshape(6)
            kw["aabb"] = tuple(float(v) for v in a)
        return GridNeRFConfig(
            n_levels=self.grid_levels,
            features=self.grid_features,
            base_res=self.grid_base_res,
            max_res=self.grid_max_res,
            table_size=self.grid_table_size,
            hidden=self.grid_hidden,
            num_freqs_dir=self.num_freqs_dir,
            compute_dtype=jnp.bfloat16 if self.bf16 else jnp.float32,
            encode_impl=self.grid_encode_impl,
            **kw,
        )

    def train_settings(self) -> TrainSettings:
        if self.ray_sampling not in ("image", "pool"):
            raise ValueError(
                f"ray_sampling={self.ray_sampling!r} (expected 'image'|'pool')"
            )
        return TrainSettings(
            n_rand=self.n_rand,
            n_samples=self.n_samples,
            near=0.0 if self.ndc else self.near,
            far=1.0 if self.ndc else self.far,
            ray_sampling=self.ray_sampling,
            precrop_iters=self.precrop_iters,
            precrop_frac=self.precrop_frac,
            sigma_noise_std=self.sigma_noise_std,
            sigma_noise_decay_steps=self.sigma_noise_decay_steps,
            sigma_noise_floor=self.sigma_noise_floor,
            weight_decay=self.weight_decay,
            lr_floor=self.lr_floor,
            ema_decay=self.ema_decay,
            num_freqs=self.num_freqs,
            lr=self.lr,
            lr_decay_steps=self.lr_decay_steps,
            lr_decay_factor=self.lr_decay_factor,
            white_bkgd=True,
            model_cfg=self.model_cfg(),
        )
