"""Single-chip training core: jitted, scan-batched NeRF train steps.

Matches the reference's training semantics (src/train.py:105-128):
each step picks image (step % N), draws n_rand random pixel indices,
builds jittered stratified samples, runs encode->MLP->composite, and
optimizes MSE with Adam (torch defaults: b1=0.9, b2=0.999, eps=1e-8).

TPU-first design:
- the whole step (index draw included) lives inside jit; RNG is an
  explicit key folded with the step number, so any step is
  reproducible in isolation and under resume;
- `make_train_block` wraps K steps in one `lax.scan`, amortizing
  dispatch overhead — the TinyNeRF step is microseconds of MXU work,
  so per-step Python dispatch would dominate otherwise;
- bf16 matmuls with fp32 params/accumulation replace CUDA AMP +
  GradScaler (bf16 needs no loss scaling);
- buffers are donated so params/opt_state update in place in HBM.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from tinynerf_tpu.models.tinynerf import TinyNeRFConfig, apply_tinynerf
from tinynerf_tpu.ops.encoding import positional_encoding
from tinynerf_tpu.ops.sampling import stratified_samples
from tinynerf_tpu.ops.volume import volume_render
from tinynerf_tpu.utils.metrics import mse2psnr


@dataclasses.dataclass(frozen=True)
class TrainSettings:
    """Static hyperparameters baked into the compiled step."""

    n_rand: int = 2048
    n_samples: int = 64
    near: float = 2.0
    far: float = 6.0
    num_freqs: int = 10
    lr: float = 5e-4
    # Optional exponential decay to lr*lr_decay_factor over lr_decay_steps
    # (the NeRF paper's schedule; the reference uses constant lr — this
    # stays off by default for parity).
    lr_decay_steps: int = 0
    lr_decay_factor: float = 0.1
    white_bkgd: bool = True
    # Train-time N(0, std) noise on raw density pre-ReLU (the NeRF
    # paper's raw_noise_std). 0.0 = reference parity (no noise). The
    # anti-sigma-death regularizer: with pool-mode ray batching the
    # decorrelated early gradient can push raw sigma negative
    # EVERYWHERE (white background explains most pixels), after which
    # ReLU gradients are exactly zero and Adam momentum makes the death
    # permanent — measured on TPU, see docs/DESIGN.md.
    sigma_noise_std: float = 0.0
    # >0: linearly decay the sigma noise from sigma_noise_std to 0 over
    # this many steps. The noise only needs to live through the early
    # death-window (the first ~1k steps); held constant it acts as a
    # density fog late in training — measured: the constant-noise pool
    # run's top-down views dropped ~5 dB (benchmarks/r3).
    sigma_noise_decay_steps: int = 0
    # >0 with decay: the noise decays to THIS std instead of 0 — a mild
    # permanent density regularizer (one of the anti-memorization
    # levers for the train/held-out gap, VERDICT r3 item 2).
    sigma_noise_floor: float = 0.0
    # AdamW-style decoupled weight decay on the 2-D weight matrices
    # (biases/1-D params excluded). 0.0 = reference parity (plain Adam).
    weight_decay: float = 0.0
    # With lr_decay_steps: clamp the exponential schedule at this value
    # (optax end_value) so late training keeps a non-vanishing lr.
    lr_floor: float = 0.0
    # >0: maintain an exponential moving average of the PARAMS inside
    # the optimizer state (Polyak averaging, e.g. 0.999) — the averaged
    # weights generalize better to held-out poses than the last SGD
    # iterate. Rides inside opt_state, so every train path (fused,
    # sharded, occupancy, multiscene) inherits it and resume keeps it.
    ema_decay: float = 0.0
    # "image": each step draws rays from ONE image (step % N) — the
    # reference's semantics (src/train.py:108-112). "pool": each step
    # draws from the union of every train pixel — the full-NeRF paper's
    # batching, decorrelates the gradient and removes the per-image
    # cycling transient (the step-2000 dip in BASELINE.md).
    ray_sampling: str = "image"
    # >0: for the first precrop_iters steps, draw rays only from the
    # central precrop_frac x precrop_frac window of each image — the
    # original NeRF's precrop warmup (nerf-pytorch precrop_iters=500 on
    # the white-background Lego scene). On captures dominated by
    # background (r4's lattice: 77% white) the uncropped early gradient
    # pushes raw sigma negative everywhere and the run dies of sigma
    # collapse; the crop re-weights the warmup toward object pixels.
    # Requires image_hw (the trainer sets it from the data).
    precrop_iters: int = 0
    precrop_frac: float = 0.5
    # (H, W) of the training images — only needed (and only set) when
    # precrop_iters > 0; part of the static settings so the crop window
    # is compile-time constant.
    image_hw: Any = None
    model_cfg: TinyNeRFConfig = TinyNeRFConfig()


class EmaParamsState(NamedTuple):
    """Optimizer-state slot holding the Polyak average of the params."""

    ema: Any


def ema_of_params(decay: float) -> optax.GradientTransformation:
    """Identity on updates; tracks ema = decay*ema + (1-decay)*new_params
    in its state. Chained AFTER the base optimizer so `new_params` is
    the post-update iterate."""

    def init_fn(params):
        # copy=True: jnp.asarray would ALIAS the param buffers, and the
        # train blocks donate params and opt_state as separate argnums —
        # aliased leaves crash with "donate the same buffer twice".
        return EmaParamsState(
            ema=jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
        )

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("ema_of_params requires params in update()")
        new_params = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: decay * e + (1.0 - decay) * p, state.ema, new_params
        )
        return updates, EmaParamsState(ema=ema)

    return optax.GradientTransformation(init_fn, update_fn)


def ema_params_from_opt_state(opt_state):
    """Extract the Polyak average from an opt_state built with
    ema_decay > 0 (None if absent)."""
    states = jax.tree_util.tree_leaves(
        opt_state, is_leaf=lambda x: isinstance(x, EmaParamsState)
    )
    for s in states:
        if isinstance(s, EmaParamsState):
            return s.ema
    return None


def make_optimizer(
    lr: float,
    decay_steps: int = 0,
    decay_factor: float = 0.1,
    weight_decay: float = 0.0,
    lr_floor: float = 0.0,
    ema_decay: float = 0.0,
) -> optax.GradientTransformation:
    if decay_steps > 0:
        schedule = optax.exponential_decay(
            init_value=lr,
            transition_steps=decay_steps,
            decay_rate=decay_factor,
            end_value=lr_floor if lr_floor > 0 else None,
        )
    else:
        schedule = lr
    if weight_decay > 0:
        # Decoupled (AdamW) decay on weight MATRICES only: biases and
        # other 1-D params carry no function-smoothness meaning and
        # decaying them just fights the density/rgb head offsets.
        base = optax.adamw(
            schedule, b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=weight_decay,
            mask=lambda params: jax.tree_util.tree_map(
                lambda x: x.ndim >= 2, params
            ),
        )
    else:
        base = optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8)
    if ema_decay > 0:
        return optax.chain(base, ema_of_params(ema_decay))
    return base


def settings_optimizer(s: TrainSettings) -> optax.GradientTransformation:
    return make_optimizer(
        s.lr, s.lr_decay_steps, s.lr_decay_factor,
        weight_decay=getattr(s, "weight_decay", 0.0),
        lr_floor=getattr(s, "lr_floor", 0.0),
        ema_decay=getattr(s, "ema_decay", 0.0),
    )


class SigmaDeathDetector:
    """Aborts runs whose render has collapsed to the background.

    Total sigma death (docs/DESIGN.md 4b): once raw sigma goes negative
    at every sample, ReLU gradients are exactly zero and Adam momentum
    makes the death permanent — the render is an input-independent
    background and the train PSNR pins at the background-only score.
    r4's hard-scene legs burned 2x20k chip-steps in exactly this state
    (pinned at 11.5 dB from ~step 2000, VERDICT r4 weak #3) with
    nothing watching the curve.

    The detector compares each logged train PSNR against the PSNR of
    rendering the background color for every train pixel (`bg_psnr`):
    `window` consecutive log points within `margin` dB of that floor,
    after a `grace` warmup, means dead. A near-infinite floor (an
    all-background capture, bg_mse ~ 0) disables the check — there is
    nothing to die."""

    def __init__(
        self,
        bg_psnr: float,
        margin: float = 1.0,
        window: int = 20,
        grace: int = 1000,
    ):
        self.bg_psnr = float(bg_psnr)
        self.margin = float(margin)
        self.window = int(window)
        self.grace = int(grace)
        self.enabled = self.bg_psnr < 60.0  # ~all-background capture guard
        self._run = 0
        self.first_pinned_step = None

    def update(self, step: int, psnr: float) -> bool:
        """Record one logged train PSNR; True => declare sigma death."""
        if not self.enabled or step < self.grace:
            return False
        if psnr < self.bg_psnr + self.margin:
            if self._run == 0:
                self.first_pinned_step = step
            self._run += 1
        else:
            self._run = 0
            self.first_pinned_step = None
        return self._run >= self.window


def background_psnr(pixels, white_bkgd: bool = True) -> float:
    """PSNR of predicting the background color for every train pixel —
    the score a sigma-dead (background-constant) render pins at."""
    import numpy as np

    bg = 1.0 if white_bkgd else 0.0
    mse = float(jnp.mean((pixels.astype(jnp.float32) - bg) ** 2))
    return float(-10.0 * np.log10(max(mse, 1e-10)))


def noise_scale_kwargs(s, step) -> Dict[str, jax.Array]:
    """`{"noise_scale": ...}` when sigma-noise decay is configured, else
    {} — call sites splat this so decay-off traces (and external
    grad_fn/loss signatures that predate the kwarg) are untouched."""
    decay = getattr(s, "sigma_noise_decay_steps", 0)
    std = getattr(s, "sigma_noise_std", 0.0)
    if decay <= 0 or std <= 0.0:
        return {}
    # Decay toward sigma_noise_floor (as a fraction of std) instead of
    # 0 when configured — a mild permanent regularizer (VERDICT r3
    # item 2's "mild noise floor" lever).
    floor_frac = min(max(getattr(s, "sigma_noise_floor", 0.0) / std, 0.0), 1.0)
    scale = jnp.clip(
        1.0 - jnp.asarray(step, jnp.float32) / float(decay), floor_frac, 1.0
    )
    return {"noise_scale": scale}


def loss_fn(
    params,
    rays_o: jax.Array,
    rays_d: jax.Array,
    target: jax.Array,
    key: jax.Array,
    s: TrainSettings,
    noise_scale=1.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """MSE loss over one ray batch (jittered sampling)."""
    n_rand = rays_o.shape[0]
    noise_std = getattr(s, "sigma_noise_std", 0.0)
    noise = None
    if noise_std > 0.0:
        # Split ONLY when noise is on: the noise-off jitter stream stays
        # bit-identical to the historical recipe.
        key, k_noise = jax.random.split(key)
        noise = noise_scale * noise_std * jax.random.normal(
            k_noise, (n_rand * s.n_samples, 1), jnp.float32
        )
    z_vals, pts = stratified_samples(
        s.near, s.far, s.n_samples, rays_o, rays_d, randomized=True, key=key
    )
    xenc = positional_encoding(pts.reshape(-1, 3), num_freqs=s.num_freqs)
    rgb, sigma = apply_tinynerf(params, xenc, s.model_cfg, sigma_noise=noise)
    rgb = rgb.reshape(n_rand, s.n_samples, 3)
    sigma = sigma.reshape(n_rand, s.n_samples)
    comp_rgb, _, _, _ = volume_render(rgb, sigma, z_vals, rays_d, white_bkgd=s.white_bkgd)
    loss = jnp.mean((comp_rgb - target.astype(jnp.float32)) ** 2)
    return loss, {"loss": loss, "psnr": mse2psnr(loss)}


def draw_ray_batch(s, key, step, rays_o_all, rays_d_all, pixels):
    """Per-step ray-batch draw -> (ro, rd, target, k_jitter).

    THE canonical ray/RNG stream: `fold_in(key, step)`, split into the
    index key and the jitter key, then image-mode (reference
    src/train.py:108-112 semantics) or pool-mode (cross-image
    batching) gathers. Shared by the single-device step, and any
    external block factory (e.g. ops/occupancy.py) so alternate
    training paths cannot drift from these semantics."""
    n_images, hw = rays_o_all.shape[0], rays_o_all.shape[1]
    k_step = jax.random.fold_in(key, step)
    k_inds, k_jitter = jax.random.split(k_step)

    def _apply_precrop(pix_inds, k):
        """While step < precrop_iters, replace the per-image pixel draw
        with one restricted to the central crop window (branchless:
        precrop_iters is static, `step` is traced via jnp.where)."""
        pc = getattr(s, "precrop_iters", 0)
        if pc <= 0:
            return pix_inds
        if s.image_hw is None:
            raise ValueError(
                "precrop_iters > 0 requires image_hw=(H, W) in settings "
                "(the train driver sets it from the loaded data)"
            )
        H, W = s.image_hw
        frac = s.precrop_frac
        ch, cw = max(1, int(H * frac)), max(1, int(W * frac))
        rlo, clo = (H - ch) // 2, (W - cw) // 2
        k_center = jax.random.fold_in(k, 1)
        kk = jax.random.randint(k_center, pix_inds.shape, 0, ch * cw)
        center = (rlo + kk // cw) * W + (clo + kk % cw)
        return jnp.where(step < pc, center, pix_inds)

    if s.ray_sampling == "pool":
        # Cross-image ray batching: one gather from the flattened
        # (N*HW) pixel pool (free reshape; the gather is the same cost
        # as the per-image one).
        inds = jax.random.randint(k_inds, (s.n_rand,), 0, n_images * hw)
        if getattr(s, "precrop_iters", 0) > 0:
            # Crop within each image: keep the drawn image, re-draw the
            # pixel inside the center window during the warmup.
            img = inds // hw
            inds = jnp.where(
                step < s.precrop_iters,
                img * hw + _apply_precrop(inds % hw, k_inds),
                inds,
            )
        ro = rays_o_all.reshape(n_images * hw, 3)[inds]
        rd = rays_d_all.reshape(n_images * hw, 3)[inds]
        target = pixels.reshape(n_images * hw, 3)[inds]
    else:
        img_i = jnp.mod(step, n_images)
        inds = _apply_precrop(
            jax.random.randint(k_inds, (s.n_rand,), 0, hw), k_inds
        )
        ro = rays_o_all[img_i][inds]
        rd = rays_d_all[img_i][inds]
        target = pixels[img_i][inds]
    return ro, rd, target, k_jitter


def _step_body(
    params, opt_state, key, step, rays_o_all, rays_d_all, pixels, s, opt, loss,
    grad_fn=None, extra_grad_fn=None,
):
    """One train step; step is a traced int32 scalar.

    grad_fn (params, ro, rd, target, key) -> (grads, metrics) replaces
    jax.grad of `loss` when given (e.g. the fused Pallas train kernel).
    extra_grad_fn (params, key) -> grads is ADDED to the main gradient
    (e.g. the free-space sparsity prior, ops/regularizers.py) — it
    composes with any grad_fn, fused kernels included.
    """
    ro, rd, target, k_jitter = draw_ray_batch(
        s, key, step, rays_o_all, rays_d_all, pixels
    )
    nkw = noise_scale_kwargs(s, step)
    if grad_fn is not None:
        grads, metrics = grad_fn(params, ro, rd, target, k_jitter, **nkw)
    else:
        grads, metrics = jax.grad(
            lambda p: loss(p, ro, rd, target, k_jitter, s, **nkw), has_aux=True
        )(params)
    if extra_grad_fn is not None:
        from tinynerf_tpu.ops.regularizers import add_grads

        grads = add_grads(grads, extra_grad_fn(params, k_jitter))
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, metrics


def make_train_step(s: TrainSettings, loss=None):
    """Jitted single step:
    (params, opt_state, key, step, rays_o_all, rays_d_all, pixels)
      -> (params, opt_state, metrics)

    `loss` is any (params, ro, rd, target, key, settings) ->
    (scalar, metrics-dict) — defaults to the TinyNeRF MSE loss; the
    hierarchical coarse/fine loss (models/nerf.make_hierarchical_loss)
    plugs in here with a {'coarse','fine'} params pytree.
    """
    opt = settings_optimizer(s)
    loss = loss or loss_fn

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, key, step, rays_o_all, rays_d_all, pixels):
        return _step_body(
            params, opt_state, key, step, rays_o_all, rays_d_all, pixels, s, opt, loss
        )

    return train_step


def make_train_block(
    s: TrainSettings, block_size: int, loss=None, grad_fn=None, extra_grad_fn=None
):
    """Jitted `lax.scan` over `block_size` consecutive steps.

    Returns fn(params, opt_state, key, step0, rays_o_all, rays_d_all,
    pixels) -> (params, opt_state, metrics-with-leading-block-axis).
    Pass grad_fn (see _step_body) to route gradients through the fused
    Pallas train kernel; extra_grad_fn to add a regularizer gradient.
    """
    opt = settings_optimizer(s)
    loss = loss or loss_fn

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_block(params, opt_state, key, step0, rays_o_all, rays_d_all, pixels):
        def body(carry, i):
            params, opt_state = carry
            params, opt_state, metrics = _step_body(
                params, opt_state, key, step0 + i, rays_o_all, rays_d_all, pixels,
                s, opt, loss, grad_fn, extra_grad_fn,
            )
            return (params, opt_state), metrics

        (params, opt_state), metrics = jax.lax.scan(
            body, (params, opt_state), jnp.arange(block_size)
        )
        return params, opt_state, metrics

    return train_block


def init_train_state(key: jax.Array, s: TrainSettings, init_fn=None):
    """(params, opt_state) freshly initialized.

    `init_fn(key) -> params` overrides the default TinyNeRF init (e.g.
    models/nerf.init_nerf for the coarse/fine pair).
    """
    if init_fn is None:
        from tinynerf_tpu.models.tinynerf import init_tinynerf

        params = init_tinynerf(key, s.model_cfg)
    else:
        params = init_fn(key)
    opt_state = settings_optimizer(s).init(params)
    return params, opt_state
