"""Spherical-harmonics encoding vs scipy's sph_harm ground truth."""

import numpy as np
import pytest

from emernerf_tpu.ops.sh import sh_encode, sh_output_dim


def _scipy_real_sh(l, m, theta, phi):
    """Real SH in the Instant-NGP/tcnn convention: the Condon-Shortley
    phase of the complex harmonics is KEPT (no extra (-1)^m factor)."""
    from scipy.special import sph_harm_y

    y = sph_harm_y(l, abs(m), theta, phi)  # (theta=polar, phi=azimuth)
    if m > 0:
        return np.sqrt(2.0) * y.real
    if m < 0:
        return np.sqrt(2.0) * y.imag
    return y.real


@pytest.mark.parametrize("degree", [1, 2, 3, 4])
def test_sh_matches_scipy(degree):
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(64, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    x, y, z = dirs.T
    theta = np.arccos(np.clip(z, -1, 1))
    phi = np.arctan2(y, x)

    got = np.asarray(sh_encode((dirs + 1.0) / 2.0, degree))
    assert got.shape == (64, sh_output_dim(degree))

    idx = 0
    for l in range(degree):
        for m in range(-l, l + 1):
            want = _scipy_real_sh(l, m, theta, phi)
            np.testing.assert_allclose(
                got[:, idx], want, rtol=1e-5, atol=1e-5,
                err_msg=f"l={l} m={m} (idx {idx})",
            )
            idx += 1


def test_sh_invalid_degree():
    with pytest.raises(ValueError):
        sh_encode(np.zeros((4, 3)), 5)
