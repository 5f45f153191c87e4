"""Every CLI netG/netF choice must train end-to-end through the engine (or
error loudly at construction) — VERDICT round-1 item 3: the engine routes
ALL net construction through define_G/define_F/define_D
(reference registration_model.py:91-92, networks.py:218-375).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfmir_tpu.engine import RegistrationConfig, RegistrationModel

SMALL = dict(crop_size=64, batch_size=2, num_patches=16)


def _step(**kw):
    cfg = RegistrationConfig(**SMALL, **kw)
    m = RegistrationModel(cfg)
    st = m.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((2, 64, 64, 1)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((2, 64, 64, 1)), jnp.float32)
    # train_step donates st — snapshot pre-step params before they are freed
    g_before = jax.tree.map(np.asarray, st.params["G"])
    st2, metrics = m.train_step(st, A, B, jax.random.PRNGKey(1),
                                jnp.float32(2e-4))
    assert all(np.isfinite(float(v)) for v in metrics.values()), metrics
    return g_before, st2


@pytest.mark.parametrize("netF", ["sample", "global_pool", "reshape",
                                  "strided_conv"])
def test_netF_choices_train(netF):
    g_before, st2 = _step(netF=netF)
    # G must still receive NCE gradients through the adapted projection
    moved = any(
        not np.allclose(np.asarray(a), b)
        for a, b in zip(jax.tree.leaves(st2.params["G"]),
                        jax.tree.leaves(g_before)))
    assert moved


def test_netG_resnet_cat_trains():
    _step(netG="resnet_cat", nce_layers=(0, 1, 2, 3))


def test_netG_resnet_cat_default_layers_error_loudly():
    # default nce_layers (0,4,8,12,16) exceed the ContentEncoder op list;
    # the reference silently drops such taps — here it must raise
    with pytest.raises(ValueError, match="nce_layers"):
        _step(netG="resnet_cat")


def test_netG_unknown_raises():
    with pytest.raises(NotImplementedError):
        RegistrationModel(RegistrationConfig(**SMALL, netG="nope_9blocks"))


def test_netF_unknown_raises():
    with pytest.raises(NotImplementedError):
        RegistrationModel(RegistrationConfig(**SMALL, netF="nope"))


def test_gan_with_dropout_trains():
    # round-1 crash: phase-1 D update ran G with dropout active but no
    # dropout rng (engine/registration.py:358 pre-fix)
    _step(lambda_GAN=1.0, no_dropout=False)


def test_flip_equivariance_trains():
    _step(flip_equivariance=True)


def test_unet_taps_unit():
    """UnetGenerator feature taps: encoder activations, loud range check."""
    from dfmir_tpu.nets.unet_gen import UnetGenerator

    g = UnetGenerator(input_nc=1, output_nc=1, num_downs=5, ngf=4)
    x = jnp.zeros((1, 32, 32, 1), jnp.float32)
    vs = g.init(jax.random.PRNGKey(0), x)
    out, feats = g.apply(vs, x, layers=(0, 2, 4))
    assert out.shape == x.shape
    assert [f.shape[1] for f in feats] == [16, 4, 1]
    only = g.apply(vs, x, layers=(0, 2), encode_only=True)
    assert len(only) == 2
    np.testing.assert_allclose(np.asarray(only[0]), np.asarray(feats[0]))
    with pytest.raises(ValueError, match="nce_layers"):
        g.apply(vs, x, layers=(0, 7))


@pytest.mark.slow
def test_netG_unet_128_trains_end_to_end():
    """--netG unet_128 at its native 128px through the full joint step."""
    cfg = RegistrationConfig(crop_size=128, batch_size=1, num_patches=16,
                             netG="unet_128", ngf=16,
                             nce_layers=(0, 2, 4, 6))
    m = RegistrationModel(cfg)
    st = m.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((1, 128, 128, 1)), jnp.float32)
    B = jnp.asarray(rng.standard_normal((1, 128, 128, 1)), jnp.float32)
    _, metrics = m.train_step(st, A, B, jax.random.PRNGKey(1),
                              jnp.float32(2e-4))
    assert all(np.isfinite(float(v)) for v in metrics.values()), metrics
