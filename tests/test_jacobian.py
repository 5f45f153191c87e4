import numpy as np
import jax.numpy as jnp

from dfmir_tpu.ops import jacobian_det, folding_fraction


def test_identity_flow_det_one():
    flow = jnp.zeros((2, 16, 16, 2))
    det = np.asarray(jacobian_det(flow))
    np.testing.assert_allclose(det, 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(folding_fraction(flow)), 0.0)


def test_uniform_scaling_det():
    # flow = 0.5 * p  =>  phi = 1.5 p  => det = 1.5^2
    H = W = 16
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    flow = 0.5 * np.stack([ys, xs], -1)[None].astype(np.float32)
    det = np.asarray(jacobian_det(jnp.asarray(flow)))
    np.testing.assert_allclose(det, 2.25, atol=1e-4)


def test_folding_detected():
    # strong negative gradient along x folds the map
    H = W = 16
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    flow = np.zeros((1, H, W, 2), np.float32)
    flow[..., 1] = -2.0 * xs  # phi_x = x - 2x = -x  => dphi/dx = -1
    frac = float(folding_fraction(jnp.asarray(flow))[0])
    assert frac > 0.9


def test_3d_identity():
    flow = jnp.zeros((1, 8, 8, 8, 3))
    np.testing.assert_allclose(np.asarray(jacobian_det(flow)), 1.0, atol=1e-6)
