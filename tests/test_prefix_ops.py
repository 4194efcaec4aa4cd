"""MXU-blocked prefix sum (ops/prefix.py) vs exact numpy cumsum."""
import numpy as np
import pytest

import jax.numpy as jnp

from gramtools_tpu.ops.prefix import mm_cumsum, mm_cumsum_np


@pytest.mark.parametrize("n", [1, 7, 64, 511, 512, 513, 2048, 20480])
def test_cumsum_matches_numpy(n):
    rng = np.random.RandomState(n)
    x = rng.randint(0, 5, size=n).astype(np.int32)
    got = np.asarray(mm_cumsum(jnp.asarray(x)))
    np.testing.assert_array_equal(got, mm_cumsum_np(x))


def test_cumsum_exclusive_and_bool():
    rng = np.random.RandomState(0)
    x = rng.rand(1000) < 0.3
    got = np.asarray(mm_cumsum(jnp.asarray(x), exclusive=True))
    np.testing.assert_array_equal(got, mm_cumsum_np(x, exclusive=True))


def test_cumsum_channels():
    """Leading batch dims prefix-sum independently (the scan step stacks
    cnt and nz into one call)."""
    rng = np.random.RandomState(1)
    x = rng.randint(0, 100, size=(2, 3000)).astype(np.int32)
    got = np.asarray(mm_cumsum(jnp.asarray(x)))
    np.testing.assert_array_equal(got, mm_cumsum_np(x))


def test_cumsum_exact_to_2_24():
    """Float32 accumulation is exact while prefix values < 2**24: pin
    the documented bound at its edge."""
    n = 4096
    x = np.full(n, 4095, np.int32)           # total = 4095*4096 < 2**24
    got = np.asarray(mm_cumsum(jnp.asarray(x)))
    np.testing.assert_array_equal(got, mm_cumsum_np(x))
