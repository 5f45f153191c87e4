"""Network-zoo parity and surface tests: UNet generator, discriminators,
netF variants, factories."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dfmir_tpu.compat.convert import _conv_w, _convT_w, _np
from dfmir_tpu.compat.torch_ref import (
    RefNLayerDiscriminator, RefUnetGenerator,
)
from dfmir_tpu.nets import (
    NLayerDiscriminator, PatchDiscriminator, PixelDiscriminator, PoolingF,
    ReshapeF, StridedConvF, UnetGenerator, define_D, define_F, define_G,
)


def _torch_convs_in_order(model):
    return [m for m in model.modules()
            if isinstance(m, (torch.nn.Conv2d, torch.nn.ConvTranspose2d))]


def _unet_flax_params_from_torch(tmodel, num_downs):
    """torch module order: downs 0..L-1, then ups L-1..0."""
    convs = _torch_convs_in_order(tmodel)
    downs, ups = convs[:num_downs], convs[num_downs:]
    params = {}
    for i, c in enumerate(downs):
        params[f"down_{i}"] = {"Conv_0": {"kernel": _conv_w(c.weight),
                                          "bias": _np(c.bias)}}
    for j, c in enumerate(ups):  # ups[j] is level L-1-j
        i = num_downs - 1 - j
        params[f"up_{i}"] = {"kernel": _convT_w(c.weight),
                             "bias": _np(c.bias)}
    return params


class TestUnetGenerator:
    @pytest.mark.parametrize("num_downs,size", [(7, 128), (8, 256)])
    def test_parity_vs_torch(self, num_downs, size):
        torch.manual_seed(0)
        tnet = RefUnetGenerator(num_downs=num_downs, ngf=8).eval()
        x = np.random.default_rng(0).standard_normal(
            (2, 1, size, size)).astype(np.float32)
        with torch.no_grad():
            want = tnet(torch.from_numpy(x)).numpy()

        jnet = UnetGenerator(num_downs=num_downs, ngf=8)
        params = _unet_flax_params_from_torch(tnet, num_downs)
        got = jnet.apply({"params": params},
                         jnp.asarray(x.transpose(0, 2, 3, 1)))
        got = np.asarray(got).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    def test_init_and_shapes(self):
        net = UnetGenerator(num_downs=7, ngf=4)
        x = jnp.zeros((1, 128, 128, 1))
        params = net.init(jax.random.PRNGKey(0), x)["params"]
        assert net.apply(params if "params" in params else {"params": params},
                         x).shape == (1, 128, 128, 1)


class TestDiscriminators:
    def test_nlayer_parity_vs_torch(self):
        torch.manual_seed(0)
        tnet = RefNLayerDiscriminator(ndf=16, n_layers=3).eval()
        x = np.random.default_rng(1).standard_normal(
            (2, 1, 64, 64)).astype(np.float32)
        with torch.no_grad():
            want = tnet(torch.from_numpy(x)).numpy()

        convs = _torch_convs_in_order(tnet)
        params = {f"conv_{i}": {"Conv_0": {"kernel": _conv_w(c.weight),
                                           "bias": _np(c.bias)}}
                  for i, c in enumerate(convs)}
        jnet = NLayerDiscriminator(ndf=16, n_layers=3)
        got = jnet.apply({"params": params},
                         jnp.asarray(x.transpose(0, 2, 3, 1)))
        got = np.asarray(got).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    def test_nlayer_no_antialias_parity(self):
        torch.manual_seed(1)
        tnet = RefNLayerDiscriminator(ndf=8, n_layers=2,
                                      no_antialias=True).eval()
        x = np.random.default_rng(2).standard_normal(
            (1, 1, 32, 32)).astype(np.float32)
        with torch.no_grad():
            want = tnet(torch.from_numpy(x)).numpy()
        convs = _torch_convs_in_order(tnet)
        params = {f"conv_{i}": {"Conv_0": {"kernel": _conv_w(c.weight),
                                           "bias": _np(c.bias)}}
                  for i, c in enumerate(convs)}
        jnet = NLayerDiscriminator(ndf=8, n_layers=2, no_antialias=True)
        got = np.asarray(jnet.apply(
            {"params": params},
            jnp.asarray(x.transpose(0, 2, 3, 1)))).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    def test_pixel_shape(self):
        net = PixelDiscriminator(ndf=8)
        x = jnp.zeros((2, 32, 32, 1))
        p = net.init(jax.random.PRNGKey(0), x)
        assert net.apply(p, x).shape == (2, 32, 32, 1)

    def test_patch_tiling_shape(self):
        net = PatchDiscriminator(ndf=8)
        x = jnp.zeros((2, 64, 64, 1))
        p = net.init(jax.random.PRNGKey(0), x)
        out = net.apply(p, x)
        assert out.shape[0] == 2 * 4 * 4  # 16x16 tiles folded into batch


class TestFeatureNets:
    def test_pooling_f(self):
        net = PoolingF()
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (2, 8, 8, 16)).astype(np.float32))
        out = net.apply(net.init(jax.random.PRNGKey(0), x), x)
        assert out.shape == (2, 1, 1, 16)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(out), axis=-1), 1.0, atol=1e-5)

    def test_reshape_f(self):
        net = ReshapeF()
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (2, 8, 8, 16)).astype(np.float32))
        out = net.apply(net.init(jax.random.PRNGKey(0), x), x)
        assert out.shape == (2 * 16, 16)

    def test_strided_conv_f(self):
        specs = ((32, 64), (64, 32))
        net = StridedConvF(specs=specs)
        feats = [jnp.asarray(np.random.default_rng(c).standard_normal(
            (1, s, s, c)).astype(np.float32)) for c, s in specs]
        variables = net.init(jax.random.PRNGKey(0), feats)
        outs, new_vars = net.apply(variables, feats, mutable=["stats"])
        assert outs[0].shape[-1] == 64 and outs[1].shape[-1] == 64
        # EMA moved away from zero
        leaves = jax.tree.leaves(new_vars["stats"])
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


class TestFactories:
    def test_define_g(self):
        from dfmir_tpu.nets import ResnetGenerator

        assert isinstance(define_G(netG="resnet_6blocks"), ResnetGenerator)
        assert define_G(netG="resnet_6blocks").n_blocks == 6
        assert isinstance(define_G(netG="unet_128"), UnetGenerator)
        assert define_G(netG="unet_256").num_downs == 8
        with pytest.raises(NotImplementedError):
            define_G(netG="nope")

    def test_define_f(self):
        from dfmir_tpu.nets import PatchSampleF

        assert isinstance(define_F("global_pool"), PoolingF)
        assert isinstance(define_F("reshape"), ReshapeF)
        f = define_F("sample", feature_dims=(8,))
        assert isinstance(f, PatchSampleF) and not f.use_mlp
        f = define_F("mlp_sample", feature_dims=(8,))
        assert f.use_mlp
        assert isinstance(define_F("strided_conv",
                                   strided_specs=((8, 64),)), StridedConvF)

    def test_define_d(self):
        assert isinstance(define_D(netD="basic"), NLayerDiscriminator)
        assert define_D(netD="n_layers", n_layers_D=5).n_layers == 5
        assert isinstance(define_D(netD="pixel"), PixelDiscriminator)
        assert isinstance(define_D(netD="patch"), PatchDiscriminator)
