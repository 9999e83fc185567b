"""Tests for stratified and hierarchical (inverse-CDF) sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from tinynerf_tpu.ops.sampling import sample_pdf, stratified_samples


def test_deterministic_linspace():
    ro = jnp.zeros((3, 3))
    rd = jnp.broadcast_to(jnp.array([0.0, 0.0, -1.0]), (3, 3))
    z, pts = stratified_samples(2.0, 6.0, 5, ro, rd, randomized=False)
    np.testing.assert_allclose(np.asarray(z[0]), [2.0, 3.0, 4.0, 5.0, 6.0], atol=1e-6)
    # pts = o + d*z
    np.testing.assert_allclose(np.asarray(pts[0, :, 2]), [-2, -3, -4, -5, -6], atol=1e-6)
    np.testing.assert_allclose(np.asarray(pts[..., :2]), 0.0, atol=1e-6)


def test_jitter_stays_in_bins():
    """Each jittered z_i must stay within its stratified bin [lower_i, upper_i]."""
    n, s = 64, 16
    ro = jnp.zeros((n, 3))
    rd = jnp.ones((n, 3))
    z_det, _ = stratified_samples(2.0, 6.0, s, ro, rd, randomized=False)
    z_det = np.asarray(z_det)
    mids = 0.5 * (z_det[:, :-1] + z_det[:, 1:])
    upper = np.concatenate([mids, z_det[:, -1:]], -1)
    lower = np.concatenate([z_det[:, :1], mids], -1)
    z, _ = stratified_samples(
        2.0, 6.0, s, ro, rd, randomized=True, key=jax.random.PRNGKey(0)
    )
    z = np.asarray(z)
    assert (z >= lower - 1e-6).all() and (z <= upper + 1e-6).all()
    # Jitter actually jitters.
    assert np.abs(z - z_det).max() > 1e-3


def test_jitter_requires_key():
    ro = jnp.zeros((2, 3))
    try:
        stratified_samples(2.0, 6.0, 4, ro, ro, randomized=True)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_sample_pdf_concentrates_where_weights_are():
    """Weights peaked in one bin -> most samples land in that bin."""
    n_rays, n_bins = 8, 16
    bins = jnp.broadcast_to(jnp.linspace(2.0, 6.0, n_bins + 1), (n_rays, n_bins + 1))
    weights = np.full((n_rays, n_bins), 1e-3, np.float32)
    weights[:, 5] = 10.0  # bin [z=3.25, z=3.5]
    samples = sample_pdf(
        bins, jnp.asarray(weights), 64, randomized=True, key=jax.random.PRNGKey(1)
    )
    samples = np.asarray(samples)
    lo, hi = np.asarray(bins[0, 5]), np.asarray(bins[0, 6])
    frac_in_peak = ((samples >= lo) & (samples <= hi)).mean()
    assert frac_in_peak > 0.9
    # Sorted per ray, within range.
    assert (np.diff(samples, axis=-1) >= 0).all()
    assert samples.min() >= 2.0 - 1e-5 and samples.max() <= 6.0 + 1e-5


def test_sample_pdf_uniform_weights_roughly_uniform():
    n_rays, n_bins = 4, 8
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_bins + 1), (n_rays, n_bins + 1))
    weights = jnp.ones((n_rays, n_bins))
    samples = sample_pdf(bins, weights, 9, randomized=False)
    np.testing.assert_allclose(
        np.asarray(samples[0]), np.linspace(0, 1, 9), atol=1e-5
    )


def test_sample_pdf_stratified_matches_numpy_inverse_cdf():
    """stratified=True: u_i = (i + r_i)/n, then the same inverse CDF.

    Oracle: recompute the inverse CDF in numpy (np.searchsorted + linear
    interp) from the u's jax must have drawn, and check each sample
    falls in its own equal-probability stratum.
    """
    n_rays, n_bins, n_imp = 4, 8, 32
    rng = np.random.RandomState(0)
    bins = np.sort(rng.rand(n_rays, n_bins + 1).astype(np.float32) * 4 + 2, axis=-1)
    weights = rng.rand(n_rays, n_bins).astype(np.float32)

    key = jax.random.PRNGKey(3)
    samples = np.asarray(
        sample_pdf(
            jnp.asarray(bins), jnp.asarray(weights), n_imp,
            randomized=True, key=key, stratified=True,
        )
    )

    # numpy oracle with the exact same u draw
    eps = 1e-5
    w = weights + eps
    pdf = w / w.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros((n_rays, 1)), np.cumsum(pdf, -1)], -1)
    r = np.asarray(jax.random.uniform(key, (n_rays, n_imp), dtype=jnp.float32))
    u = (np.arange(n_imp, dtype=np.float32) + r) / n_imp
    expect = np.empty_like(u)
    for i in range(n_rays):
        idx = np.searchsorted(cdf[i], u[i], side="right")
        below, above = np.clip(idx - 1, 0, n_bins), np.clip(idx, 0, n_bins)
        denom = cdf[i][above] - cdf[i][below]
        denom = np.where(denom < 1e-8, 1.0, denom)
        t = (u[i] - cdf[i][below]) / denom
        expect[i] = bins[i][below] + t * (bins[i][above] - bins[i][below])
    np.testing.assert_allclose(samples, np.sort(expect, -1), rtol=1e-5, atol=1e-5)

    # Each u_i sits in stratum [i/n, (i+1)/n): exactly one sample per
    # equal-probability stratum of the CDF.
    strat = np.floor(u * n_imp).astype(int)
    assert (strat == np.arange(n_imp)).all()


def test_sample_pdf_jit_and_vmap_compatible():
    f = jax.jit(lambda b, w, k: sample_pdf(b, w, 8, randomized=True, key=k))
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 5), (3, 5))
    out = f(bins, jnp.ones((3, 4)), jax.random.PRNGKey(0))
    assert out.shape == (3, 8)
