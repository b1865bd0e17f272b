"""Pallas fetch kernel vs a plain gather (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pathtracing_spectrum_tpu.ops.fetch_pallas import fetch_rows_pallas


@pytest.mark.parametrize("t,f,n", [(36, 48, 500), (2300, 30, 1500)])
def test_fetch_matches_gather(t, f, n):
    rng = np.random.default_rng(t)
    table = rng.normal(size=(t, f)).astype(np.float32)
    idx = rng.integers(0, t, n).astype(np.int32)
    got = np.asarray(fetch_rows_pallas(jnp.asarray(idx), jnp.asarray(table),
                                       interpret=True))
    want = table[idx].T
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_fetch_out_of_range_is_zero():
    table = np.ones((10, 8), np.float32)
    idx = np.array([0, 9, -1, 10, 5], np.int32)
    got = np.asarray(fetch_rows_pallas(jnp.asarray(idx), jnp.asarray(table),
                                       interpret=True))
    np.testing.assert_allclose(got[:, 0], 1.0)
    np.testing.assert_allclose(got[:, 1], 1.0)
    np.testing.assert_allclose(got[:, 2], 0.0)  # -1 -> zeros
    np.testing.assert_allclose(got[:, 3], 0.0)  # T -> zeros (padding row)
    np.testing.assert_allclose(got[:, 4], 1.0)
