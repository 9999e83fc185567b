"""Full-image rendering: the encode->MLP->composite chain over ray chunks.

Behavioral parity with the reference's `render_one` (src/train.py:36-59):
rays for a pose are processed in fixed-size chunks (default 8192) with
un-jittered stratified samples, and chunking never changes the result
(rays are independent). TPU-first differences:

- the chunk loop is a `jax.lax.map` inside one jitted program (static
  shapes, no per-chunk dispatch) instead of a Python loop;
- H*W is padded up to a chunk multiple and un-padded after, keeping all
  shapes static;
- the hot per-chunk computation can route through the fused Pallas
  kernel (`kernels/fused_render.py`) that keeps sample points in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tinynerf_tpu.models.tinynerf import TinyNeRFConfig, apply_tinynerf
from tinynerf_tpu.ops.encoding import positional_encoding
from tinynerf_tpu.ops.rays import get_rays
from tinynerf_tpu.ops.sampling import stratified_samples
from tinynerf_tpu.ops.volume import volume_render


def render_rays(
    params,
    rays_o: jax.Array,
    rays_d: jax.Array,
    *,
    n_samples: int = 64,
    near: float = 2.0,
    far: float = 6.0,
    num_freqs: int = 10,
    white_bkgd: bool = True,
    model_cfg: TinyNeRFConfig = TinyNeRFConfig(),
    use_fused: bool = False,
) -> jax.Array:
    """Deterministically render a batch of rays to composite RGB (R, 3)."""
    if use_fused:
        from tinynerf_tpu.kernels.fused_render import fused_render_rays

        return fused_render_rays(
            params,
            rays_o,
            rays_d,
            n_samples=n_samples,
            near=near,
            far=far,
            num_freqs=num_freqs,
            white_bkgd=white_bkgd,
            model_cfg=model_cfg,
        )
    n_rays = rays_o.shape[0]
    z_vals, pts = stratified_samples(near, far, n_samples, rays_o, rays_d, randomized=False)
    xenc = positional_encoding(pts.reshape(-1, 3), num_freqs=num_freqs)
    rgb, sigma = apply_tinynerf(params, xenc, model_cfg)
    rgb = rgb.reshape(n_rays, n_samples, 3)
    sigma = sigma.reshape(n_rays, n_samples)
    comp_rgb, _, _, _ = volume_render(rgb, sigma, z_vals, rays_d, white_bkgd=white_bkgd)
    return comp_rgb


def pack_aux(depth, acc, near: float, far: float):
    """Pack per-ray (depth, acc) as a (R, 3) pseudo-image so the aux
    render rides the generic 3-channel chunked driver unchanged:
    channel 0 = EXPECTED termination depth (depth / acc — the raw
    composite sum(w*z) scales with opacity, so an acc=0.3 ray would
    otherwise report a depth below `near`) normalized to [0,1] over
    [near, far]; channel 1 = accumulated opacity (already [0,1]);
    channel 2 unused. Low-acc rays carry an ill-defined expectation —
    consumers mask on the acc channel. The driver's [0,1] clip bounds
    both channels by construction; shapes are flattened so the
    volume_render's keepdims (R, 1) outputs pack the same as (R,)."""
    depth = jnp.ravel(depth)
    acc = jnp.ravel(acc)
    d_exp = depth / jnp.maximum(acc, 1e-6)
    d_norm = (d_exp - near) / (far - near)
    return jnp.stack([d_norm, acc, jnp.zeros_like(acc)], axis=-1)


def unpack_aux(img, near: float, far: float):
    """(H, W, 3) aux pseudo-image -> (expected depth (H, W) in scene
    units — clipped to [near, far], mask on acc for validity;
    acc (H, W))."""
    return img[..., 0] * (far - near) + near, img[..., 1]


def chunked_over_rays(
    ray_fn, H: int, W: int, focal, pose: jax.Array, chunk: int,
    ndc: bool = False,
):
    """Generic chunked full-image driver: pad H*W rays to a chunk
    multiple, lax.map `ray_fn(ro, rd) -> (chunk, 3)` over the chunks,
    un-pad and reshape to (H, W, 3). Chunking never changes results
    (rays are independent — the reference guarantee,
    tiny_nerf_min.py:1424-1428, preserved here by construction).

    ndc=True reprojects rays to NDC space (ops/rays.ndc_rays, near
    plane at 1.0 — the original NeRF's hard-coded choice for
    forward-facing scenes); callers must then sample near=0, far=1.
    """
    rays_o, rays_d = get_rays(H, W, focal, pose)
    if ndc:
        from tinynerf_tpu.ops.rays import ndc_rays

        rays_o, rays_d = ndc_rays(H, W, focal, 1.0, rays_o, rays_d)
    hw = H * W
    # Shrink the chunk to the 128-aligned cover of H*W when the image
    # is smaller than the requested chunk budget — e.g. a 100x100 image
    # renders as one 10112-ray chunk instead of 2 x 8192 (38% padding).
    chunk = min(chunk, -(-hw // 128) * 128)
    n_chunks = -(-hw // chunk)
    pad = n_chunks * chunk - hw
    rays_o = jnp.pad(rays_o, ((0, pad), (0, 0)))
    # Pad directions with unit z so norms stay finite for padded rays.
    rays_d = jnp.concatenate(
        [rays_d, jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (pad, 3))], axis=0
    )
    out = jax.lax.map(
        lambda args: ray_fn(*args),
        (rays_o.reshape(n_chunks, chunk, 3), rays_d.reshape(n_chunks, chunk, 3)),
    )
    img = out.reshape(n_chunks * chunk, 3)[:hw].reshape(H, W, 3)
    return jnp.clip(img, 0.0, 1.0)


def render_image_fn(
    params,
    pose: jax.Array,
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
    ndc: bool = False,
    aux: bool = False,
) -> jax.Array:
    """Render a full (H, W, 3) image for one camera pose (pure, jittable).

    aux=True renders the geometry channels instead of color: the packed
    (depth, acc) pseudo-image (pack_aux). Aux is an offline-analysis
    path, so it always takes the XLA pipeline (the fused render kernel
    composites color only)."""

    def one_chunk(ro, rd):
        if aux:
            n_rays = ro.shape[0]
            z_vals, pts = stratified_samples(
                near, far, n_samples, ro, rd, randomized=False
            )
            xenc = positional_encoding(pts.reshape(-1, 3), num_freqs=num_freqs)
            rgb, sigma = apply_tinynerf(params, xenc, model_cfg)
            _, depth, acc, _ = volume_render(
                rgb.reshape(n_rays, n_samples, 3),
                sigma.reshape(n_rays, n_samples),
                z_vals, rd, white_bkgd=white_bkgd,
            )
            return pack_aux(depth, acc, near, far)
        return render_rays(
            params,
            ro,
            rd,
            n_samples=n_samples,
            near=near,
            far=far,
            num_freqs=num_freqs,
            white_bkgd=white_bkgd,
            model_cfg=model_cfg,
            use_fused=use_fused,
        )

    return chunked_over_rays(one_chunk, H, W, focal, pose, chunk, ndc=ndc)


def as_frames_renderer(image_fn):
    """Batch a pure `(params, pose) -> (H, W, 3)` body over a leading
    pose axis: jitted `(params, poses (F, 4, 4)) -> (F, H, W, 3)`.

    ONE dispatch renders every frame (lax.map over poses inside the
    program) — vs the reference's per-frame host loop
    (src/make_gif.py:24-27), which through a remote-TPU tunnel pays the
    ~0.27ms dispatch floor plus a device->host image transfer per frame.
    """
    return jax.jit(
        lambda params, poses: jax.lax.map(lambda p: image_fn(params, p), poses)
    )


def make_hierarchical_image_renderer(
    *,
    H: int,
    W: int,
    focal: float,
    chunk: int = 4096,
    n_coarse: int = 64,
    n_fine: int = 64,
    near: float = 2.0,
    far: float = 6.0,
    white_bkgd: bool = True,
    nerf_cfg=None,
    use_fused: bool = False,
    frames: bool = False,
    ndc: bool = False,
    aux: bool = False,
):
    """Jitted `(params, pose) -> (H, W, 3)` renderer for the full NeRF
    (coarse/fine) model: the fine composite is the output image.
    use_fused routes both MLP passes through the fused Pallas pipeline
    (kernels/fused_nerf.py). frames=True instead returns the batched
    `(params, poses (F, 4, 4)) -> (F, H, W, 3)` variant. aux=True
    renders the fine pass's packed (depth, acc) geometry channels
    (pack_aux) via the XLA pipeline."""
    from tinynerf_tpu.models.nerf import NeRFConfig, render_rays_hierarchical

    nerf_cfg = nerf_cfg or NeRFConfig()

    def fn(params, pose):
        def one_chunk(ro, rd):
            if aux:
                _, _, depth, acc = render_rays_hierarchical(
                    params, ro, rd,
                    n_coarse=n_coarse, n_fine=n_fine,
                    near=near, far=far, white_bkgd=white_bkgd,
                    cfg=nerf_cfg, randomized=False, return_aux=True,
                )
                return pack_aux(depth, acc, near, far)
            if use_fused:
                from tinynerf_tpu.kernels.fused_nerf import (
                    fused_render_rays_hierarchical,
                )

                _, comp_f = fused_render_rays_hierarchical(
                    params,
                    ro,
                    rd,
                    n_coarse=n_coarse,
                    n_fine=n_fine,
                    near=near,
                    far=far,
                    white_bkgd=white_bkgd,
                    cfg=nerf_cfg,
                )
            else:
                _, comp_f = render_rays_hierarchical(
                    params,
                    ro,
                    rd,
                    n_coarse=n_coarse,
                    n_fine=n_fine,
                    near=near,
                    far=far,
                    white_bkgd=white_bkgd,
                    cfg=nerf_cfg,
                    randomized=False,
                )
            return comp_f

        return chunked_over_rays(one_chunk, H, W, float(focal), pose, chunk, ndc=ndc)

    return as_frames_renderer(fn) if frames else jax.jit(fn)


def make_occupancy_image_renderer(
    *,
    H: int,
    W: int,
    focal: float,
    chunk: int = 4096,
    n_samples: int = 192,
    near: float = 2.0,
    far: float = 6.0,
    white_bkgd: bool = True,
    nerf_cfg=None,
    use_fused: bool = False,
    frames: bool = False,
    ndc: bool = False,
    resolution: int = 64,
    n_segments: int = 64,
    floor: float = 1e-2,
    aabb=None,
    aux: bool = False,
):
    """Jitted `(params, pose) -> (H, W, 3)` renderer for the
    occupancy-proposal NeRF (params = {'fine': mlp}): the density grid
    is recomputed from params ONCE per call (outside the chunk map, so
    chunking stays result-invariant), then every chunk importance-
    samples n_samples depths from it and runs the single MLP.
    use_fused routes the MLP through the streamed Pallas render kernel
    (kernels/fused_nerf_stream.py, which takes caller depths — exactly
    this composition point)."""
    from tinynerf_tpu.models.nerf import NeRFConfig, apply_nerf_mlp
    from tinynerf_tpu.ops.occupancy import density_grid, occupancy_samples
    from tinynerf_tpu.ops.volume import volume_render

    nerf_cfg = nerf_cfg or NeRFConfig()

    def fn(params, pose):
        grid = density_grid(
            params["fine"], nerf_cfg, resolution=resolution, aabb=aabb
        )

        def one_chunk(ro, rd):
            z = occupancy_samples(
                grid, ro, rd, near, far, n_samples,
                n_segments=n_segments, floor=floor, aabb=aabb,
                randomized=False,
            )
            if use_fused and not aux:
                from tinynerf_tpu.kernels.fused_nerf_stream import (
                    fused_nerf_render_rays_streamed,
                )
                from tinynerf_tpu.ops.occupancy import pick_sample_block

                return fused_nerf_render_rays_streamed(
                    params["fine"], ro, rd, z, white_bkgd=white_bkgd,
                    cfg=nerf_cfg, sample_block=pick_sample_block(z.shape[1]),
                )
            R, S = z.shape
            pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
            x_enc = positional_encoding(
                pts.reshape(-1, 3), num_freqs=nerf_cfg.num_freqs
            )
            d_enc = None
            if nerf_cfg.use_viewdirs:
                vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
                d_enc = jnp.repeat(
                    positional_encoding(vd, num_freqs=nerf_cfg.num_freqs_dir),
                    S, axis=0,
                )
            rgb, sigma = apply_nerf_mlp(params["fine"], x_enc, d_enc, nerf_cfg)
            comp, depth, acc, _ = volume_render(
                rgb.reshape(R, S, 3), sigma.reshape(R, S), z, rd,
                white_bkgd=white_bkgd,
            )
            if aux:
                return pack_aux(depth, acc, near, far)
            return comp

        return chunked_over_rays(one_chunk, H, W, float(focal), pose, chunk, ndc=ndc)

    return as_frames_renderer(fn) if frames else jax.jit(fn)


def make_grid_image_renderer(
    *,
    H: int,
    W: int,
    focal: float,
    grid_cfg,
    chunk: int = 8192,
    n_samples: int = 64,
    near: float = 2.0,
    far: float = 6.0,
    white_bkgd: bool = True,
    frames: bool = False,
    ndc: bool = False,
    aux: bool = False,
):
    """Jitted full-image renderer for the grid family (--model grid):
    one deterministic uniform-quadrature pass through the generic
    chunked driver. Same surface as the other make_*_image_renderer
    builders (frames batching, NDC, aux geometry channels)."""
    from tinynerf_tpu.models.grid_nerf import render_rays_grid

    def image_fn(params, pose):
        def one_chunk(ro, rd):
            comp, depth, acc, _, _ = render_rays_grid(
                params, ro, rd, None,
                cfg=grid_cfg, n_samples=n_samples, near=near, far=far,
                white_bkgd=white_bkgd,
            )
            if aux:
                return pack_aux(depth, acc, near, far)
            return comp

        return chunked_over_rays(one_chunk, H, W, focal, pose, chunk, ndc=ndc)

    return as_frames_renderer(image_fn) if frames else jax.jit(image_fn)


def make_image_renderer(
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
    frames: bool = False,
    ndc: bool = False,
    aux: bool = False,
):
    """Build a jitted `(params, pose) -> (H, W, 3)` renderer, or with
    frames=True the batched `(params, poses (F, 4, 4)) -> (F, H, W, 3)`
    variant (one dispatch for a whole camera path). aux=True renders
    packed (depth, acc) geometry channels instead of color."""
    fn = functools.partial(
        render_image_fn,
        H=H,
        W=W,
        focal=float(focal),
        chunk=chunk,
        n_samples=n_samples,
        near=near,
        far=far,
        num_freqs=num_freqs,
        white_bkgd=white_bkgd,
        model_cfg=model_cfg,
        use_fused=use_fused,
        ndc=ndc,
        aux=aux,
    )
    return as_frames_renderer(fn) if frames else jax.jit(fn)
