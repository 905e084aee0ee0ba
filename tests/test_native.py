"""Native host quantizer vs the jnp/oracle path: bit-exact parity."""

import numpy as np
import pytest

import jax.numpy as jnp

from micromix_tpu.mx.mxtensor import quantize_mixed
from micromix_tpu.utils.native import native_available, quantize_mixed_host


@pytest.mark.parametrize("w_fp4_only", [False, True])
def test_host_quantizer_matches_device_path(rng, w_fp4_only):
    k4, k6, k8 = 256, 128, 128
    x = rng.normal(0, 1, (33, k4 + k6 + k8)).astype(np.float32)
    x[:, -k8:] *= 70
    x[5, :32] = 0.0
    got = quantize_mixed_host(x, k4, k6, k8, weight_fp4_only=w_fp4_only)
    want = quantize_mixed(jnp.asarray(x), k4, k6, k8,
                          weight_fp4_only=w_fp4_only, pack_fp4=True)
    for f in ("fp4", "fp6", "fp8", "sf4", "sf6", "sf8"):
        np.testing.assert_array_equal(got[f], np.asarray(getattr(want, f)),
                                      err_msg=f)


def test_native_library_builds():
    # The C++ path must actually be exercised in CI, not just the fallback.
    assert native_available(), "libmxpack.so failed to build"
