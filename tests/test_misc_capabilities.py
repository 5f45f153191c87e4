"""MUNIT nets, NT-Xent, pynd-equivalent utils, config-carrying checkpoints."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfmir_tpu.losses import nt_xent_loss, smooth_loss_3d
from dfmir_tpu.nets import E_adaIN, GResnet, StyleEncoder, define_G
from dfmir_tpu.utils.ndutils import (
    bw2sdtrf, bw_grid, bw_sphere, gaussian_kernel, perlin_vol, seg2contour,
)


class TestMunit:
    def test_gresnet_forward_and_taps(self, rng):
        g = GResnet(ngf=8, n_res=2, num_downs=2)
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 1)), np.float32)
        params = g.init(jax.random.PRNGKey(0), x)
        out = g.apply(params, x)
        assert out.shape == (1, 32, 32, 1)
        assert float(jnp.abs(out).max()) <= 1.0  # tanh output
        feats = g.apply(params, x, nce_layers=(0, 2), encode_only=True)
        assert len(feats) == 2

    def test_gresnet_style_conditioning(self, rng):
        g = GResnet(ngf=8, n_res=2, num_downs=2, nz=4)
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 1)), np.float32)
        s1 = jnp.zeros((1, 4))
        s2 = jnp.ones((1, 4))
        params = g.init(jax.random.PRNGKey(0), x, s1)
        a = g.apply(params, x, s1)
        b = g.apply(params, x, s2)
        assert float(jnp.abs(a - b).max()) > 0  # style changes the output

    def test_style_encoder_and_eadain(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 64, 64, 1)), np.float32)
        e = StyleEncoder(n_downsample=4, dim=8, style_dim=8)
        out = e.apply(e.init(jax.random.PRNGKey(0), x), x)
        assert out.shape == (2, 8)
        ev = E_adaIN(style_dim=8, nef=8, vae=True)
        mean, logvar = ev.apply(ev.init(jax.random.PRNGKey(0), x), x)
        assert mean.shape == (2, 8) and logvar.shape == (2, 8)

    def test_factory_resnet_cat(self):
        assert isinstance(define_G(netG="resnet_cat", ngf=8), GResnet)


class TestNTXent:
    def test_identical_views_minimize(self, rng):
        z = jnp.asarray(rng.standard_normal((8, 16)), np.float32)
        same = float(nt_xent_loss(z, z, temperature=0.1))
        other = jnp.asarray(rng.standard_normal((8, 16)), np.float32)
        diff = float(nt_xent_loss(z, other, temperature=0.1))
        assert same < diff
        assert np.isfinite(same) and np.isfinite(diff)

    def test_smooth_loss_3d(self):
        flat = jnp.ones((1, 4, 4, 4, 3))
        assert float(smooth_loss_3d(flat)) == 0.0
        bumpy = flat.at[0, 2].set(5.0)
        assert float(smooth_loss_3d(bumpy)) > 0


class TestNdUtils:
    def test_bw_grid_sphere(self):
        g = bw_grid((16, 16), 4)
        assert g.shape == (16, 16) and g[0, 0] == 1.0 and g[1, 1] == 0.0
        s = bw_sphere((16, 16, 16), 4)
        assert s[8, 8, 8] == 1.0 and s[0, 0, 0] == 0.0

    def test_gaussian_kernel(self):
        k = gaussian_kernel([1.0, 1.0])
        assert k.sum() == pytest.approx(1.0, abs=1e-6)
        assert k.ndim == 2 and k.shape[0] % 2 == 1
        c = k.shape[0] // 2
        assert k[c, c] == k.max()

    def test_bw2sdtrf_signs(self):
        bw = bw_sphere((32, 32), 8).astype(bool)
        sdt = bw2sdtrf(bw)
        assert sdt[16, 16] < 0      # inside negative
        assert sdt[0, 0] > 0        # outside positive
        assert abs(sdt[16, 16 + 8]) <= 1.5  # near boundary ~ 0

    def test_perlin_and_contour(self):
        p = perlin_vol((32, 32), seed=0)
        assert p.shape == (32, 32) and 0 <= p.min() and p.max() <= 1.0
        p2 = perlin_vol((32, 32), seed=0)
        np.testing.assert_array_equal(p, p2)  # seeded determinism
        seg = np.zeros((16, 16), np.int32)
        seg[4:12, 4:12] = 3
        con = seg2contour(seg)
        assert con[4, 4] == 3 and con[8, 8] == 0


class TestConfigCheckpoint:
    def test_roundtrip_registration(self, tmp_path):
        from dfmir_tpu.engine import RegistrationConfig, RegistrationModel
        from dfmir_tpu.engine.checkpoints import (
            load_with_config, save_with_config,
        )

        cfg = RegistrationConfig(crop_size=64, num_patches=16,
                                 netG="resnet_4blocks", nce_layers=(0, 4))
        m = RegistrationModel(cfg)
        state = m.init_state(jax.random.PRNGKey(0))
        path = str(tmp_path / "model.msgpack")
        save_with_config(path, cfg, state.params)
        cfg2, params2 = load_with_config(path)
        assert cfg2 == cfg
        m2 = RegistrationModel(cfg2)
        a = jax.tree.leaves(state.params["G"])
        b = jax.tree.leaves(params2["G"])
        assert all(np.allclose(x, y) for x, y in zip(a, b))
        # rebuilt model runs with the restored params
        A = jnp.zeros((1, 64, 64, 1))
        out = m2.register(params2, A, A)
        assert out[0].shape == (1, 64, 64, 1)

    def test_unknown_class_rejected(self, tmp_path):
        from flax import serialization
        from dfmir_tpu.engine.checkpoints import load_with_config

        path = tmp_path / "bad.msgpack"
        path.write_bytes(serialization.msgpack_serialize(
            {"config": {}, "config_class": "Bogus", "params": {}}))
        with pytest.raises(KeyError):
            load_with_config(str(path))
