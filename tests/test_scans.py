"""Unit tests for the shared in-kernel scan primitives (interpret on CPU
via direct jnp execution — the helpers are pure jnp + pltpu.roll, which
interpret-lowers to jnp.roll)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinynerf_tpu.kernels.scans import (
    prefix_product_exclusive,
    suffix_sum_exclusive,
    sum_over_samples,
)


def _run_in_interpret(fn, *arrays):
    """Run a scans-helper expression inside an interpret-mode kernel so
    pltpu.roll has a lowering."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(*refs):
        ins = [r[:] for r in refs[:-1]]
        refs[-1][:] = fn(*ins)

    out_shape = jax.eval_shape(fn, *arrays)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in arrays],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape.shape, out_shape.dtype),
        interpret=True,
    )(*arrays)


@pytest.mark.parametrize("S,TR", [(8, 16), (64, 128), (16, 32)])
def test_prefix_product_matches_cumprod(S, TR):
    rng = np.random.RandomState(0)
    vals = rng.uniform(0.5, 1.0, (TR, S)).astype(np.float32)  # per-ray rows
    flat = jnp.asarray(vals.T.reshape(1, S * TR))  # sample-major
    got = np.asarray(
        _run_in_interpret(lambda x: prefix_product_exclusive(x, S, TR), flat)
    ).reshape(S, TR).T  # back to (rays, samples)
    want = np.concatenate(
        [np.ones((TR, 1), np.float32), np.cumprod(vals, axis=1)[:, :-1]], axis=1
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("S,TR", [(8, 16), (64, 128)])
def test_suffix_sum_matches_reverse_cumsum(S, TR):
    rng = np.random.RandomState(1)
    vals = rng.randn(TR, S).astype(np.float32)
    flat = jnp.asarray(vals.T.reshape(1, S * TR))
    got = np.asarray(
        _run_in_interpret(lambda x: suffix_sum_exclusive(x, S, TR), flat)
    ).reshape(S, TR).T
    # exclusive suffix: sum of strictly-later samples in the same ray
    want = np.flip(np.cumsum(np.flip(vals, axis=1), axis=1), axis=1) - vals
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sum_over_samples():
    S, TR = 16, 32
    rng = np.random.RandomState(2)
    vals = rng.randn(3, TR, S).astype(np.float32)
    flat = jnp.asarray(np.transpose(vals, (0, 2, 1)).reshape(3, S * TR))
    got = np.asarray(_run_in_interpret(lambda x: sum_over_samples(x, S, TR), flat))
    want = vals.sum(axis=2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
