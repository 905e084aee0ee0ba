"""Benes routing (mx/benes.py): trace-time permutation -> static stages.

Property tests of the router plus interpret-mode parity of the in-kernel
apply (kernels/mixed_matmul.apply_benes) against jnp.take.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from micromix_tpu.mx.benes import (
    apply_benes_np, benes_dists, benes_route, pack_masks)


@pytest.mark.parametrize("k", [2, 8, 128, 512, 4096])
def test_route_realizes_permutation(k):
    rng = np.random.default_rng(k)
    for _ in range(3):
        perm = rng.permutation(k)
        dists, masks = benes_route(perm)
        assert dists == benes_dists(k)
        y = apply_benes_np(np.arange(k, dtype=np.float32)[None], dists,
                           masks)
        np.testing.assert_array_equal(y[0].astype(np.int64), perm)
        for d, m in zip(dists, masks):
            # swap masks must be pair-consistent (m[i] == m[i^d])
            np.testing.assert_array_equal(m, m[np.arange(k) ^ d])


def test_identity_and_reverse():
    k = 256
    for perm in (np.arange(k), np.arange(k)[::-1].copy()):
        dists, masks = benes_route(perm)
        y = apply_benes_np(np.arange(k, dtype=np.float32)[None], dists,
                           masks)
        np.testing.assert_array_equal(y[0].astype(np.int64), perm)


def test_packed_apply_matches_take_in_kernel():
    """apply_benes inside a Pallas kernel (interpret) == jnp.take."""
    import functools

    from jax.experimental import pallas as pl
    from micromix_tpu.kernels.mixed_matmul import apply_benes

    k = 512
    rng = np.random.default_rng(0)
    perm = rng.permutation(k)
    dists, masks = benes_route(perm)
    packed = jnp.asarray(pack_masks(masks)).reshape(1, k)
    x = jnp.asarray(rng.normal(0, 1, (8, k)).astype(np.float32))

    def kern(x_ref, p_ref, o_ref, *, dists):
        o_ref[:] = apply_benes(x_ref[:], p_ref[:], dists)

    y = pl.pallas_call(
        functools.partial(kern, dists=dists),
        out_shape=jax.ShapeDtypeStruct((8, k), jnp.float32),
        interpret=True,
    )(x, packed)
    np.testing.assert_array_equal(np.asarray(y),
                                  np.asarray(x)[:, perm])


def test_non_power_of_two_rejected():
    with pytest.raises(AssertionError):
        benes_dists(96)
