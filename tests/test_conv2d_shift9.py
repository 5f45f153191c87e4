"""conv2d_shift9 must be EXACTLY lax conv2d (same math, different
schedule): strides 1/2, non-square, asymmetric padding, bias, VJP, and
the module drop-in (param tree identical to nn.Conv).  Targets the hot
3x3 resblock convs of /root/reference/models/networks.py:1164-1221; the
lowering is A/B-selectable via DFMIR_TPU_CONV2D (default 'xla' until the
on-chip measurement picks a winner — scripts/measure_conv2d.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import flax.linen as nn

from dfmir_tpu.nets.layers import Conv2DS9, conv2d_shift9


def _ref_conv2d(x, w, strides, padding):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=strides, padding=list(padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("shape,k,stride,pad", [
    ((2, 16, 14, 3), 3, (1, 1), ((1, 1), (1, 1))),
    ((1, 17, 19, 4), 3, (2, 2), ((1, 1), (1, 1))),
    ((1, 12, 12, 2), 7, (1, 1), ((3, 3), (3, 3))),
    ((1, 9, 9, 2), 2, (1, 2), ((0, 1), (1, 0))),
    ((1, 8, 8, 1), 1, (1, 1), ((0, 0), (0, 0))),
])
def test_matches_xla_conv2d(shape, k, stride, pad):
    rng = np.random.default_rng(0)
    co = 5
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, shape[-1], co)), jnp.float32)
    ref = _ref_conv2d(x, w, stride, pad)
    out = conv2d_shift9(x, w, stride, pad)
    assert out.shape == ref.shape
    scale = float(jnp.max(jnp.abs(ref))) or 1.0
    assert float(jnp.max(jnp.abs(out - ref))) / scale < 1e-6


def test_vjp_matches_xla():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 4)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 6)), jnp.float32)
    stride, pad = (1, 1), ((1, 1), (1, 1))
    ref = _ref_conv2d(x, w, stride, pad)
    g = jnp.asarray(rng.standard_normal(ref.shape), jnp.float32)
    _, v_s = jax.vjp(lambda a, b: conv2d_shift9(a, b, stride, pad), x, w)
    _, v_x = jax.vjp(lambda a, b: _ref_conv2d(a, b, stride, pad), x, w)
    for got, want in zip(v_s(g), v_x(g)):
        scale = max(float(jnp.max(jnp.abs(want))), 1e-9)
        assert float(jnp.max(jnp.abs(got - want))) / scale < 1e-5


def test_module_drop_in_param_tree_and_values():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 12, 12, 3)), jnp.float32)
    m_ref = nn.Conv(8, kernel_size=(3, 3), strides=(1, 1),
                    padding=[(1, 1), (1, 1)])
    m_s9 = Conv2DS9(features=8, kernel_size=(3, 3), strides=(1, 1),
                    padding=[(1, 1), (1, 1)])
    p_ref = m_ref.init(jax.random.PRNGKey(0), x)["params"]
    p_s9 = m_s9.init(jax.random.PRNGKey(0), x)["params"]
    assert (jax.tree.map(lambda a: (a.shape, str(a.dtype)), p_ref)
            == jax.tree.map(lambda a: (a.shape, str(a.dtype)), p_s9))
    # identical params -> identical outputs (the lowering is exact)
    y_ref = m_ref.apply({"params": p_ref}, x)
    y_s9 = m_s9.apply({"params": p_ref}, x)
    scale = float(jnp.max(jnp.abs(y_ref))) or 1.0
    assert float(jnp.max(jnp.abs(y_ref - y_s9))) / scale < 1e-6
