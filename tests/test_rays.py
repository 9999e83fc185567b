"""Golden-value tests for ray generation (parity with src/rays.py:3-33)."""

import numpy as np
import jax.numpy as jnp

from tinynerf_tpu.ops.rays import get_rays, get_rays_for_poses


def _numpy_reference_rays(H, W, focal, c2w):
    """Independent numpy implementation of the pinhole ray formulas."""
    i, j = np.meshgrid(np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32))
    dirs = np.stack(
        [(i - W * 0.5) / focal, -(j - H * 0.5) / focal, -np.ones_like(i)], axis=-1
    ).reshape(-1, 3)
    rays_d = dirs @ c2w[:3, :3].T
    rays_d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = np.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def test_identity_pose_center_pixel():
    H = W = 4
    focal = 2.0
    rays_o, rays_d = get_rays(H, W, focal, jnp.eye(4))
    assert rays_o.shape == (16, 3) and rays_d.shape == (16, 3)
    np.testing.assert_allclose(np.asarray(rays_o), 0.0)
    # Pixel (w=2, h=2) is the optical center: direction exactly -z.
    center = np.asarray(rays_d).reshape(H, W, 3)[2, 2]
    np.testing.assert_allclose(center, [0, 0, -1], atol=1e-6)
    # All directions unit-norm.
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(rays_d), axis=-1), 1.0, atol=1e-6
    )


def test_matches_numpy_reference_random_pose(rng):
    H, W, focal = 7, 5, 3.3
    # Random rotation via QR + random translation.
    q, _ = np.linalg.qr(rng.randn(3, 3))
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = q.astype(np.float32)
    c2w[:3, 3] = rng.randn(3).astype(np.float32)
    ro, rd = get_rays(H, W, focal, jnp.asarray(c2w))
    ro_ref, rd_ref = _numpy_reference_rays(H, W, focal, c2w)
    np.testing.assert_allclose(np.asarray(ro), ro_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rd), rd_ref, atol=1e-5)


def test_xy_indexing_orientation():
    """First ray is pixel (w=0, h=0): +x left-edge offset, +y top."""
    H = W = 2
    focal = 1.0
    _, rays_d = get_rays(H, W, focal, jnp.eye(4))
    d0 = np.asarray(rays_d)[0] * np.sqrt(3.0)  # un-normalize: |(-1,1,-1)|=sqrt3
    np.testing.assert_allclose(d0, [-1.0, 1.0, -1.0], atol=1e-5)


def test_batched_matches_single(rng):
    H, W, focal = 3, 3, 2.0
    poses = np.stack([np.eye(4, dtype=np.float32) for _ in range(4)])
    poses[:, :3, 3] = rng.randn(4, 3).astype(np.float32)
    ro_b, rd_b = get_rays_for_poses(H, W, focal, jnp.asarray(poses))
    assert ro_b.shape == (4, 9, 3)
    for k in range(4):
        ro, rd = get_rays(H, W, focal, jnp.asarray(poses[k]))
        np.testing.assert_allclose(np.asarray(ro_b[k]), np.asarray(ro), atol=1e-6)
        np.testing.assert_allclose(np.asarray(rd_b[k]), np.asarray(rd), atol=1e-6)


def test_ndc_rays_frustum_to_cube():
    """NDC properties: near plane -> z=-1... (o+0*d), far (t->inf) -> z=+1;
    x/y of frustum edges map to +-1."""
    from tinynerf_tpu.ops.rays import ndc_rays

    H = W = 8
    focal = 4.0  # 90-degree-ish frustum
    near = 1.0
    ro, rd = get_rays(H, W, focal, jnp.eye(4))
    no, nd = ndc_rays(H, W, focal, near, ro, rd)
    no, nd = np.asarray(no), np.asarray(nd)
    # Origin sits on the near plane: z component = 1 + 2*near/(-near) = -1.
    np.testing.assert_allclose(no[:, 2], -1.0, atol=1e-5)
    # t -> infinity limit: o + d has z -> -1 + 2 = 1.
    np.testing.assert_allclose((no + nd)[:, 2], 1.0, atol=1e-5)
    # All NDC x/y within the unit square (pixel centers inside frustum).
    assert np.abs(no[:, :2]).max() <= 1.0 + 1e-4


def test_ndc_points_stay_on_ndc_ray():
    """World point at parameter t maps onto the NDC line o' + t'*d'."""
    from tinynerf_tpu.ops.rays import ndc_rays

    H = W = 4
    focal, near = 3.0, 1.0
    ro, rd = get_rays(H, W, focal, jnp.eye(4))
    no, nd = ndc_rays(H, W, focal, near, ro, rd)
    # Project a mid-ray world point manually and check collinearity.
    ro_n = np.asarray(ro) + (
        -(near + np.asarray(ro)[:, 2]) / np.asarray(rd)[:, 2]
    )[:, None] * np.asarray(rd)
    world = ro_n + 3.0 * np.asarray(rd)  # some point beyond near plane
    px = -focal / (0.5 * W) * world[:, 0] / world[:, 2]
    pz = 1.0 + 2.0 * near / world[:, 2]
    # Solve t' from the z coordinate, then x must match.
    no_np, nd_np = np.asarray(no), np.asarray(nd)
    t_p = (pz - no_np[:, 2]) / nd_np[:, 2]
    x_on_line = no_np[:, 0] + t_p * nd_np[:, 0]
    np.testing.assert_allclose(x_on_line, px, atol=1e-4)
