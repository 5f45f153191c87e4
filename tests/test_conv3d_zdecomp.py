"""conv3d_zdecomp must be EXACTLY lax conv3d (same math, different
schedule): strides 1/2, odd depths, asymmetric padding, bias, and the
module drop-in (param tree identical to nn.Conv, values identical given
the same rng).  Replaces nn.Conv3d at
/root/reference/models/voxelmorph/torchvoxelmorph/networks.py:99-106.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import flax.linen as nn

from dfmir_tpu.nets.layers import Conv3DZ, conv3d_hybrid, conv3d_zdecomp


def _ref_conv3d(x, w, strides, padding):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=list(padding),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


@pytest.mark.parametrize("shape,k,stride,pad", [
    ((2, 12, 10, 14, 3), 3, (1, 1, 1), ((1, 1),) * 3),
    ((1, 13, 9, 11, 4), 3, (2, 2, 2), ((1, 1),) * 3),
    ((1, 8, 8, 8, 2), 3, (1, 2, 1), ((1, 1),) * 3),
    ((1, 9, 9, 9, 2), 2, (1, 1, 1), ((0, 1), (1, 0), (0, 0))),
    ((1, 7, 7, 7, 1), 1, (1, 1, 1), ((0, 0),) * 3),
])
def test_matches_xla_conv3d(shape, k, stride, pad):
    rng = np.random.default_rng(0)
    co = 5
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(
        rng.standard_normal((k, k, k, shape[-1], co)), jnp.float32)
    ref = _ref_conv3d(x, w, stride, pad)
    got = conv3d_zdecomp(x, w, stride, pad)
    assert got.shape == ref.shape
    # same math, different accumulation order: f32 reassociation only
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-4)


def test_grads_match_xla_conv3d():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 10, 8, 12, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 3, 4)), jnp.float32)
    st, pd = (2, 2, 2), ((1, 1),) * 3

    def loss(fn, x, w):
        y = fn(x, w, st, pd)
        return jnp.sum(jnp.sin(y))

    gr = jax.grad(lambda x, w: loss(_ref_conv3d, x, w), argnums=(0, 1))
    gz = jax.grad(lambda x, w: loss(conv3d_zdecomp, x, w), argnums=(0, 1))
    for a, b in zip(gr(x, w), gz(x, w)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def test_hybrid_fwd_is_xla_bwd_is_zdecomp():
    """conv3d_hybrid: forward bit-identical to XLA's native conv3d, VJP
    bit-identical to conv3d_zdecomp's (each direction's measured winner,
    BENCH_MODES_r04.json train3d.conv_impl_ab)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 9, 8, 10, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 3, 4)), jnp.float32)
    st, pd = (2, 1, 2), ((1, 1),) * 3

    y_h = conv3d_hybrid(x, w, st, pd)
    y_x = _ref_conv3d(x, w, st, pd)
    np.testing.assert_array_equal(np.asarray(y_h), np.asarray(y_x))

    def loss(fn, x, w):
        return jnp.sum(jnp.sin(fn(x, w, st, pd)))

    # the cotangent flows through sin(y) of the XLA-forward values, which
    # differ from zdecomp's by f32 reassociation — so grads match to 1e-4,
    # not bitwise
    gh = jax.grad(lambda x, w: loss(conv3d_hybrid, x, w), argnums=(0, 1))
    gz = jax.grad(lambda x, w: loss(conv3d_zdecomp, x, w), argnums=(0, 1))
    for a, b in zip(gh(x, w), gz(x, w)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    # and under jit (the custom_vjp must trace cleanly inside a grad-of-jit)
    gj = jax.jit(jax.grad(
        lambda x, w: loss(conv3d_hybrid, x, w), argnums=(0, 1)))
    for a, b in zip(gj(x, w), gh(x, w)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_module_drop_in_for_nn_conv():
    """Conv3DZ inits the same params as nn.Conv (same tree, same values for
    the same rng) and applies to the same output."""
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 6, 7, 9, 2)),
        jnp.float32)
    kw = dict(features=4, kernel_size=(3, 3, 3),
              strides=(2, 2, 2), padding=[(1, 1)] * 3)
    key = jax.random.PRNGKey(7)
    p_ref = nn.Conv(**kw).init(key, x)["params"]
    p_z = Conv3DZ(**kw).init(key, x)["params"]
    assert jax.tree.structure(p_ref) == jax.tree.structure(p_z)
    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_z)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    y_ref = nn.Conv(**kw).apply({"params": p_ref}, x)
    y_z = Conv3DZ(**kw).apply({"params": p_ref}, x)
    np.testing.assert_allclose(np.asarray(y_z), np.asarray(y_ref),
                               atol=1e-5)
