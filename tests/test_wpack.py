"""conv2d_wpack — the packed-width lane-occupancy lowering — is an EXACT
reordering of the SAME 3x3 stride-1 conv, standalone and inside
conv3d_zdecomp (the Conv3DZ path that replaces the reference's nn.Conv3d,
/root/reference/models/voxelmorph/torchvoxelmorph/networks.py:99-106)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dfmir_tpu.nets.layers as L


def _conv2d(x, k):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("p", [2, 4, 8])
def test_wpack_exact(p):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, 24, 5)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 5, 7)), jnp.float32)
    err = float(jnp.max(jnp.abs(L.conv2d_wpack(x, k, p) - _conv2d(x, k))))
    assert err < 1e-4, err


@pytest.mark.parametrize("p", [2, 4])
def test_wpack_inside_zdecomp(p, monkeypatch):
    monkeypatch.setattr(L, "WPACK", p)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 6, 8, 16, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 4, 8)), jnp.float32)
    strides, padding = (1, 1, 1), ((1, 1), (1, 1), (1, 1))
    got = L.conv3d_zdecomp(x, w, strides, padding)
    ref = L._conv3d_xla(x, w, strides, padding)
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-4


def test_wpack_gate_skips_strided(monkeypatch):
    """Encoder (stride-2) convs and W % p != 0 shapes must take the plain
    conv2d path regardless of the WPACK knob."""
    monkeypatch.setattr(L, "WPACK", 4)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 6, 8, 14, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 4, 8)), jnp.float32)
    for strides in [(2, 2, 2), (1, 1, 1)]:   # W=14 % 4 != 0 gates both
        padding = ((1, 1), (1, 1), (1, 1))
        got = L.conv3d_zdecomp(x, w, strides, padding)
        ref = L._conv3d_xla(x, w, strides, padding)
        assert float(jnp.max(jnp.abs(got - ref))) < 1e-4
