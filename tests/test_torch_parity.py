"""Cross-framework pixel parity: identical weights, torch vs tinynerf_tpu.

The strongest fidelity check available offline: load ONE set of weights
into (a) this framework's functional pipeline and (b) an independent
PyTorch implementation of the reference's architecture/formulas
(benchmarks/torch_baseline.py's model family), render the same rays,
and compare composites pixel-by-pixel. This validates the end-to-end
semantics — encoding order, skip placement, heads, deltas, eps,
white background — against the reference's own framework, not just
against numpy re-derivations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from tinynerf_tpu.models.tinynerf import TinyNeRFConfig
from tinynerf_tpu.render import render_rays
from tinynerf_tpu.training import TrainSettings, init_train_state


def _torch_forward(params_np, ro, rd, n_samples=32, num_freqs=10):
    """The reference pipeline in torch (formulas, not copied code)."""
    torch.set_grad_enabled(False)
    ro_t = torch.from_numpy(ro)
    rd_t = torch.from_numpy(rd)
    R = ro.shape[0]
    t = torch.linspace(0.0, 1.0, n_samples)
    z = 2.0 * (1 - t) + 6.0 * t
    z = z.expand(R, n_samples)
    pts = ro_t[:, None] + rd_t[:, None] * z[..., None]
    x = pts.reshape(-1, 3)
    enc = [x]
    for k in range(num_freqs):
        f = 2.0**k
        enc += [torch.sin(x * f), torch.cos(x * f)]
    h = torch.cat(enc, dim=-1)
    xin = h
    for i in range(4):
        w = torch.from_numpy(params_np["layers"][i]["w"])
        b = torch.from_numpy(params_np["layers"][i]["b"])
        h = torch.relu(h @ w + b)
        if i == 1:
            h = torch.cat([h, xin], dim=-1)
    rgb = torch.sigmoid(
        h @ torch.from_numpy(params_np["rgb"]["w"]) + torch.from_numpy(params_np["rgb"]["b"])
    ).reshape(R, n_samples, 3)
    sigma = torch.relu(
        h @ torch.from_numpy(params_np["sigma"]["w"])
        + torch.from_numpy(params_np["sigma"]["b"])
    ).reshape(R, n_samples)
    deltas = torch.cat([z[:, 1:] - z[:, :-1], torch.full_like(z[:, :1], 1e10)], -1)
    deltas = deltas * rd_t.norm(dim=-1, keepdim=True)
    alpha = 1 - torch.exp(-sigma * deltas)
    accum = torch.cumprod(1 - alpha + 1e-10, dim=-1)
    trans = torch.cat([torch.ones_like(accum[:, :1]), accum[:, :-1]], -1)
    w = alpha * trans
    comp = (w[..., None] * rgb).sum(-2) + (1 - w.sum(-1, keepdim=True))
    return comp.numpy()


def test_pixel_parity_with_torch():
    cfg = TinyNeRFConfig(compute_dtype=jnp.float32)
    params, _ = init_train_state(jax.random.PRNGKey(7), TrainSettings(model_cfg=cfg))
    params_np = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), params)

    rng = np.random.RandomState(0)
    ro = (rng.randn(200, 3) * 0.1).astype(np.float32)
    rd = rng.randn(200, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)

    want = _torch_forward(params_np, ro, rd)
    got = np.asarray(
        render_rays(
            params, jnp.asarray(ro), jnp.asarray(rd), n_samples=32, model_cfg=cfg
        )
    )
    # Both f32; differences are summation-order only.
    np.testing.assert_allclose(got, want, atol=1e-4)
    # In [0,1]-image units this is sub-1/255: pixel-identical after
    # uint8 quantization.
    assert np.abs(got - want).max() < 1.0 / 255.0 / 2


def test_pixel_parity_fused_kernel_vs_torch():
    from tinynerf_tpu.kernels.fused_render import fused_render_rays

    cfg = TinyNeRFConfig(compute_dtype=jnp.float32)
    params, _ = init_train_state(jax.random.PRNGKey(8), TrainSettings(model_cfg=cfg))
    params_np = jax.tree_util.tree_map(lambda x: np.asarray(x, np.float32), params)
    rng = np.random.RandomState(1)
    ro = (rng.randn(64, 3) * 0.1).astype(np.float32)
    rd = rng.randn(64, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    want = _torch_forward(params_np, ro, rd)
    got = np.asarray(
        fused_render_rays(
            params, jnp.asarray(ro), jnp.asarray(rd), n_samples=32,
            model_cfg=cfg, tile_r=32, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_torch_checkpoint_import_roundtrip(tmp_path):
    """Export params to the reference's .pth schema, re-import, and
    verify the renders are identical — users of the reference can carry
    their trained checkpoints over."""
    import torch

    from tinynerf_tpu.utils.torch_import import (
        import_torch_checkpoint,
        params_to_torch_state_dict,
    )

    cfg = TinyNeRFConfig(compute_dtype=jnp.float32)
    params, _ = init_train_state(jax.random.PRNGKey(11), TrainSettings(model_cfg=cfg))
    state = {k: torch.from_numpy(v) for k, v in params_to_torch_state_dict(params).items()}
    path = str(tmp_path / "ref_style.pth")
    torch.save(
        {"model": state, "step": 777, "in_dim": 63,
         "cfg": {"hidden": 128, "depth": 4, "skip_at": 2}},
        path,
    )
    params2, meta = import_torch_checkpoint(path)
    assert meta["step"] == 777 and meta["cfg"]["hidden"] == 128

    rng = np.random.RandomState(4)
    ro = jnp.asarray((rng.randn(50, 3) * 0.1).astype(np.float32))
    rd = rng.randn(50, 3).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    rd = jnp.asarray(rd)
    a = np.asarray(render_rays(params, ro, rd, n_samples=16, model_cfg=cfg))
    b = np.asarray(render_rays(params2, ro, rd, n_samples=16, model_cfg=cfg))
    np.testing.assert_array_equal(a, b)
