"""StyleGAN2 family: upfirdn2d math, modulated-conv equivalence, shapes."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfmir_tpu.nets.stylegan2 import (
    EqualConv, EqualLinear, MappingNetwork, ModulatedConv,
    StyleGAN2Discriminator, StyleGAN2Generator, StyleGAN2SynthesisGenerator,
    TileStyleGAN2Discriminator, fused_leaky_relu, make_kernel, upfirdn2d,
)


def upfirdn2d_numpy(x_hw, kernel, up, down, pad):
    """Independent per-channel reference: zero-stuff, pad, CONVOLVE (flip),
    then subsample."""
    kh, kw = kernel.shape
    h, w = x_hw.shape
    up_arr = np.zeros((h * up, w * up), np.float32)
    up_arr[::up, ::up] = x_hw
    p0, p1 = pad
    padded = np.pad(up_arr, ((p0, p1), (p0, p1)))
    out = np.zeros((padded.shape[0] - kh + 1, padded.shape[1] - kw + 1),
                   np.float32)
    fk = kernel[::-1, ::-1]
    for i in range(out.shape[0]):
        for j in range(out.shape[1]):
            # correlate with flipped kernel == convolution
            out[i, j] = np.sum(padded[i:i + kh, j:j + kw] * fk)
    return out[::down, ::down]


class TestUpfirdn:
    @pytest.mark.parametrize("up,down,pad", [(1, 1, (1, 2)), (2, 1, (2, 1)),
                                             (1, 2, (2, 2)), (2, 2, (1, 1))])
    def test_matches_numpy(self, rng, up, down, pad):
        kernel = make_kernel([1, 3, 3, 1])
        x = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)
        got = np.asarray(upfirdn2d(jnp.asarray(x), kernel, up, down, pad))
        for c in range(2):
            want = upfirdn2d_numpy(x[0, :, :, c], kernel, up, down, pad)
            np.testing.assert_allclose(got[0, :, :, c], want, atol=1e-5)


class TestModulatedConv:
    def test_matches_per_sample_weights(self, rng):
        """modulate-activations formulation == reference's per-sample
        grouped weights (stylegan_networks.py:304-315)."""
        B, H, W, C, O, k = 2, 8, 8, 4, 6, 3
        mod = ModulatedConv(features=O, kernel=k, style_dim=8)
        x = jnp.asarray(rng.standard_normal((B, H, W, C)), np.float32)
        style = jnp.asarray(rng.standard_normal((B, 8)), np.float32)
        params = mod.init(jax.random.PRNGKey(0), x, style)
        got = np.asarray(mod.apply(params, x, style))

        w = np.asarray(params["params"]["weight"])       # (k,k,C,O)
        lin = params["params"]["modulation"]
        s = (np.asarray(style) @ (np.asarray(lin["weight"])
                                  / math.sqrt(8))) + np.asarray(lin["bias"])
        scale = 1.0 / math.sqrt(C * k * k)
        want = np.zeros((B, H, W, O), np.float32)
        xp = np.pad(np.asarray(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
        for b in range(B):
            wb = scale * w * s[b][None, None, :, None]
            demod = 1.0 / np.sqrt((wb ** 2).sum(axis=(0, 1, 2)) + 1e-8)
            wb = wb * demod[None, None, None, :]
            for i in range(H):
                for j in range(W):
                    patch = xp[b, i:i + k, j:j + k, :]
                    want[b, i, j] = np.einsum("hwc,hwco->o", patch, wb)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_up_down_shapes(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), np.float32)
        s = jnp.asarray(rng.standard_normal((1, 8)), np.float32)
        up = ModulatedConv(4, 3, 8, upsample=True)
        out = up.apply(up.init(jax.random.PRNGKey(0), x, s), x, s)
        assert out.shape == (1, 16, 16, 4)
        dn = ModulatedConv(4, 3, 8, downsample=True)
        out = dn.apply(dn.init(jax.random.PRNGKey(0), x, s), x, s)
        assert out.shape == (1, 4, 4, 4)


class TestStyleGAN2Nets:
    def test_generator_forward_and_taps(self, rng):
        g = StyleGAN2Generator(ngf=8, n_blocks=4, size=64)
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 1)), np.float32)
        params = g.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)}, x)
        out = g.apply(params, x, rngs={"noise": jax.random.PRNGKey(2)})
        assert out.shape == (1, 64, 64, 1)
        feats = g.apply(params, x, layers=(0, 2, 3), encode_only=True,
                        rngs={"noise": jax.random.PRNGKey(2)})
        assert len(feats) == 3
        assert feats[0].shape == (1, 64, 64, 1)  # identity tap

    def test_small_variant_deterministic(self, rng):
        g = StyleGAN2Generator(ngf=8, n_blocks=4, size=64, small=True)
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 1)), np.float32)
        params = g.init(jax.random.PRNGKey(0), x)
        a = g.apply(params, x)
        b = g.apply(params, x)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_discriminators(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 64, 64, 1)), np.float32)
        d = StyleGAN2Discriminator(ndf=16, size=64)
        out = d.apply(d.init(jax.random.PRNGKey(0), x), x)
        assert out.shape == (2, 1)
        dp = StyleGAN2Discriminator(ndf=16, size=64, patch=True)
        out = dp.apply(dp.init(jax.random.PRNGKey(0), x), x)
        assert out.ndim == 4 and out.shape[-1] == 1
        dt = TileStyleGAN2Discriminator(ndf=16, patch_size=32)
        out = dt.apply(dt.init(jax.random.PRNGKey(0), x), x)
        assert out.shape == (2 * 4, 1)

    def test_synthesis_generator(self, rng):
        g = StyleGAN2SynthesisGenerator(size=32, style_dim=32, ngf=8,
                                        out_channels=3)
        z = jnp.asarray(rng.standard_normal((2, 32)), np.float32)
        params = g.init({"params": jax.random.PRNGKey(0),
                         "noise": jax.random.PRNGKey(1)}, z)
        out = g.apply(params, z, rngs={"noise": jax.random.PRNGKey(2)})
        assert out.shape == (2, 32, 32, 3)

    def test_factory_dispatch(self):
        from dfmir_tpu.nets import define_D, define_G
        from dfmir_tpu.nets.stylegan2 import (
            StyleGAN2Discriminator as D, StyleGAN2Generator as G,
            TileStyleGAN2Discriminator as TD,
        )

        assert isinstance(define_G(netG="stylegan2", size=64), G)
        assert define_G(netG="smallstylegan2", size=64).small
        assert isinstance(define_D(netD="stylegan2", size=64), D)
        assert isinstance(define_D(netD="tilestylegan2"), TD)

    def test_equal_layers_and_mapping(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 16)), np.float32)
        lin = EqualLinear(8, activation="fused_lrelu")
        out = lin.apply(lin.init(jax.random.PRNGKey(0), x), x)
        assert out.shape == (2, 8)
        m = MappingNetwork(style_dim=16, n_mlp=2)
        w = m.apply(m.init(jax.random.PRNGKey(0), x), x)
        assert w.shape == (2, 16)
        assert np.isfinite(np.asarray(w)).all()


class TestStyleGAN2InEngine:
    def test_registration_with_stylegan2_netG(self, rng):
        from dfmir_tpu.engine import RegistrationConfig, RegistrationModel

        cfg = RegistrationConfig(netG="stylegan2", crop_size=64, ngf=8,
                                 num_patches=64, nce_layers=(1, 2, 3))
        m = RegistrationModel(cfg)
        state = m.init_state(jax.random.PRNGKey(0))
        A = jnp.asarray(rng.standard_normal((1, 64, 64, 1)), np.float32)
        B = jnp.asarray(rng.standard_normal((1, 64, 64, 1)), np.float32)
        state, metrics = m.train_step(state, A, B, jax.random.PRNGKey(1),
                                      jnp.float32(2e-4))
        assert all(np.isfinite(float(v)) for v in metrics.values())


class TestTransFusion:
    def test_vxm_dense_transformer(self, rng):
        from dfmir_tpu.nets.transfusion import VxmDenseTransformer

        net = VxmDenseTransformer(
            nb_features=((8, 16), (16, 16, 8)), int_steps=3,
            n_head=2, n_layer=2)
        A = jnp.asarray(rng.standard_normal((1, 32, 32, 1)), np.float32)
        B = jnp.asarray(rng.standard_normal((1, 32, 32, 1)), np.float32)
        params = net.init(jax.random.PRNGKey(0), A, B)
        y_s, y_t, flow = net.apply(params, A, B)
        assert y_s.shape == A.shape and flow.shape == (1, 32, 32, 2)
        y_s, flow = net.apply(params, A, B, registration=True)
        assert y_s.shape == A.shape
        # flow head starts near zero => warp ~ identity
        np.testing.assert_allclose(np.asarray(y_s), np.asarray(A), atol=1e-2)

    def test_vxm_dense_dual_no_fusion(self, rng):
        from dfmir_tpu.nets.transfusion import VxmDenseDual

        net = VxmDenseDual(nb_features=((8, 16), (16, 16, 8)), int_steps=3)
        A = jnp.asarray(rng.standard_normal((1, 32, 32, 1)), np.float32)
        params = net.init(jax.random.PRNGKey(0), A, A)
        names = jax.tree_util.tree_structure(params)
        assert "fusion" not in str(names)  # no transformer params
        out = net.apply(params, A, A)
        assert out[0].shape == A.shape

    def test_fusion_is_differentiable(self, rng):
        from dfmir_tpu.nets.transfusion import VxmDenseTransformer
        from dfmir_tpu.losses import mse_loss

        net = VxmDenseTransformer(nb_features=((8, 16), (16, 16, 8)),
                                  int_steps=2, n_head=2, n_layer=1)
        A = jnp.asarray(rng.standard_normal((1, 32, 32, 1)), np.float32)
        B = jnp.asarray(rng.standard_normal((1, 32, 32, 1)), np.float32)
        params = net.init(jax.random.PRNGKey(0), A, B)

        def loss(p):
            y_s, _, _ = net.apply(p, A, B)
            return mse_loss(y_s, B)

        g = jax.grad(loss)(params)
        gnorm = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(g))
        assert np.isfinite(gnorm) and gnorm > 0


class TestFusionModes:
    @pytest.mark.parametrize("fuse", ["bottleneck", "cross"])
    def test_fuse_variants_run(self, rng, fuse):
        from dfmir_tpu.nets.transfusion import VxmDenseTransformer

        net = VxmDenseTransformer(
            nb_features=((8, 16), (16, 16, 8)), int_steps=2,
            n_head=2, n_layer=1, fuse=fuse)
        A = jnp.asarray(rng.standard_normal((1, 32, 32, 1)), np.float32)
        B = jnp.asarray(rng.standard_normal((1, 32, 32, 1)), np.float32)
        params = net.init(jax.random.PRNGKey(0), A, B)
        tree = str(jax.tree_util.tree_structure(params))
        if fuse == "bottleneck":
            assert "fusion_1" in tree and "fusion_0" not in tree
        y_s, y_t, flow = net.apply(params, A, B)
        assert y_s.shape == A.shape
        assert np.isfinite(np.asarray(flow)).all()
