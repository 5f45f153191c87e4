"""Loss parity vs torch golden implementations of the documented math."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from dfmir_tpu.losses import (
    patch_nce_loss, ncc_loss, masked_l1, smoothness_loss, grad_loss,
    gan_loss, dice_loss,
)


def torch_patch_nce(feat_q, feat_k, T=0.07, batch_size=1):
    """Golden PatchNCE (reference patchnce.py:14-55 math, re-derived)."""
    q = torch.from_numpy(feat_q)
    k = torch.from_numpy(feat_k).detach()
    N, dim = q.shape
    l_pos = torch.bmm(q.view(N, 1, -1), k.view(N, -1, 1)).view(N, 1)
    qb = q.view(batch_size, -1, dim)
    kb = k.view(batch_size, -1, dim)
    P = qb.size(1)
    l_neg = torch.bmm(qb, kb.transpose(2, 1))
    diag = torch.eye(P, dtype=torch.bool)[None]
    l_neg.masked_fill_(diag, -10.0)
    out = torch.cat((l_pos, l_neg.view(-1, P)), dim=1) / T
    return F.cross_entropy(out, torch.zeros(out.size(0), dtype=torch.long),
                           reduction="none")


@pytest.mark.parametrize("batch_size", [1, 2])
def test_patch_nce_matches_torch(rng, batch_size):
    P, dim = 64, 32
    q = rng.standard_normal((batch_size * P, dim)).astype(np.float32)
    k = rng.standard_normal((batch_size * P, dim)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    k /= np.linalg.norm(k, axis=1, keepdims=True)
    golden = torch_patch_nce(q, k, batch_size=batch_size)
    ours = patch_nce_loss(jnp.asarray(q), jnp.asarray(k), batch_size=batch_size)
    np.testing.assert_allclose(np.asarray(ours), golden.numpy(), atol=1e-4)


def torch_ncc(pred, tgt, win=9, eps=1e-5, mask=None):
    """Golden windowed NCC (reference util/losses.py:183-246 math)."""
    I, J = torch.from_numpy(pred), torch.from_numpy(tgt)
    filt = torch.ones(1, 1, win, win)
    pad = win // 2
    conv = lambda x: F.conv2d(x, filt, stride=1, padding=pad)
    I_sum, J_sum = conv(I), conv(J)
    I2_sum, J2_sum, IJ_sum = conv(I * I), conv(J * J), conv(I * J)
    ws = filt.sum()
    u_I, u_J = I_sum / ws, J_sum / ws
    cross = IJ_sum - u_J * I_sum - u_I * J_sum + u_I * u_J * ws
    I_var = I2_sum - 2 * u_I * I_sum + u_I ** 2 * ws
    J_var = J2_sum - 2 * u_J * J_sum + u_J ** 2 * ws
    cc = cross * cross / (I_var * J_var + eps)
    if mask is None:
        return -torch.sqrt(cc.mean())
    m = torch.from_numpy(mask).float()
    return -torch.sqrt((cc * m).sum() / m.sum())


def test_ncc_matches_torch(rng):
    x = rng.standard_normal((2, 1, 32, 32)).astype(np.float32)
    y = (x + 0.3 * rng.standard_normal((2, 1, 32, 32))).astype(np.float32)
    golden = torch_ncc(x, y)
    ours = ncc_loss(
        jnp.asarray(np.moveaxis(x, 1, -1)), jnp.asarray(np.moveaxis(y, 1, -1))
    )
    np.testing.assert_allclose(float(ours), float(golden), atol=1e-4)


def test_ncc_masked_matches_torch(rng):
    x = rng.standard_normal((1, 1, 24, 24)).astype(np.float32)
    y = rng.standard_normal((1, 1, 24, 24)).astype(np.float32)
    mask = (rng.random((1, 1, 24, 24)) > 0.5).astype(np.float32)
    golden = torch_ncc(x, y, mask=mask)
    ours = ncc_loss(
        jnp.asarray(np.moveaxis(x, 1, -1)),
        jnp.asarray(np.moveaxis(y, 1, -1)),
        mask=jnp.asarray(np.moveaxis(mask, 1, -1)),
    )
    np.testing.assert_allclose(float(ours), float(golden), atol=1e-4)


def test_masked_l1(rng):
    a = rng.standard_normal((2, 8, 8, 1)).astype(np.float32)
    b = rng.standard_normal((2, 8, 8, 1)).astype(np.float32)
    m = (rng.random((2, 8, 8, 1)) > 0.3).astype(np.float32)
    expected = np.sum(np.abs(a - b) * m) / np.sum(m)
    np.testing.assert_allclose(
        float(masked_l1(jnp.asarray(a), jnp.asarray(b), jnp.asarray(m))),
        expected, rtol=1e-5)
    # no mask
    np.testing.assert_allclose(
        float(masked_l1(jnp.asarray(a), jnp.asarray(b))),
        np.mean(np.abs(a - b)), rtol=1e-5)
    # all-zero mask -> 0 (reference returns torch.tensor(0))
    assert float(masked_l1(jnp.asarray(a), jnp.asarray(b),
                           jnp.zeros((2, 8, 8, 1)))) == 0.0


def test_smoothness_matches_reference_formula(rng):
    """(mean(dx^2)+mean(dy^2))/2 of registration_model.py:25-32."""
    flow = rng.standard_normal((2, 16, 16, 2)).astype(np.float32)
    t = torch.from_numpy(np.moveaxis(flow, -1, 1))
    dy = torch.abs(t[:, :, 1:, :] - t[:, :, :-1, :]) ** 2
    dx = torch.abs(t[:, :, :, 1:] - t[:, :, :, :-1]) ** 2
    expected = (dx.mean() + dy.mean()) / 2.0
    ours = smoothness_loss(jnp.asarray(flow))
    np.testing.assert_allclose(float(ours), float(expected), rtol=1e-5)


def test_gan_losses(rng):
    pred = rng.standard_normal((4, 1, 8, 8)).astype(np.float32)
    t = torch.from_numpy(pred)
    np.testing.assert_allclose(
        float(gan_loss(jnp.asarray(pred), True, "lsgan")),
        float(F.mse_loss(t, torch.ones_like(t))), rtol=1e-5)
    np.testing.assert_allclose(
        float(gan_loss(jnp.asarray(pred), False, "vanilla")),
        float(F.binary_cross_entropy_with_logits(t, torch.zeros_like(t))),
        rtol=1e-5)
    np.testing.assert_allclose(
        float(gan_loss(jnp.asarray(pred), True, "wgangp")),
        float(-t.mean()), rtol=1e-5)


def test_grad_loss_l2(rng):
    flow = rng.standard_normal((1, 12, 12, 2)).astype(np.float32)
    t = torch.from_numpy(np.moveaxis(flow, -1, 1))
    dy = (t[:, :, 1:] - t[:, :, :-1]) ** 2
    dx = (t[:, :, :, 1:] - t[:, :, :, :-1]) ** 2
    expected = (dx.mean() + dy.mean()) / 2
    np.testing.assert_allclose(float(grad_loss(jnp.asarray(flow))),
                               float(expected), rtol=1e-5)


def test_dice_perfect():
    x = jnp.ones((1, 8, 8, 1))
    assert float(dice_loss(x, x)) < 1e-5
