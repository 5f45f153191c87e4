"""End-to-end network parity: torch mirror weights -> converted flax params
-> outputs must match within 1e-3 (the BASELINE.json north-star tolerance).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from dfmir_tpu.compat.convert import convert_netF, convert_netG, convert_netR
from dfmir_tpu.compat.torch_ref import (
    RefPatchSampleF, RefResnetGenerator, RefVxmDense,
)
from dfmir_tpu.nets import (
    PatchSampleF, ResnetGenerator, VxmDense, nce_feature_dims,
    resnet_generator_specs,
)

H = W = 64  # small spatial size keeps CPU tests fast; ops are size-agnostic


def to_nhwc(x):
    return jnp.asarray(np.moveaxis(x, 1, -1))


def from_nhwc(x):
    return np.moveaxis(np.asarray(x), -1, 1)


@pytest.fixture(scope="module")
def gen_pair():
    torch.manual_seed(0)
    tg = RefResnetGenerator(1, 1, ngf=16, n_blocks=4)
    tg.eval()
    jg = ResnetGenerator(input_nc=1, output_nc=1, ngf=16, n_blocks=4)
    specs = jg.specs()
    params = convert_netG(tg.state_dict(), specs)
    return tg, jg, {"params": params}


def test_netG_forward_parity(rng, gen_pair):
    tg, jg, variables = gen_pair
    x = rng.standard_normal((2, 1, H, W)).astype(np.float32)
    with torch.no_grad():
        golden = tg(torch.from_numpy(x)).numpy()
    ours = from_nhwc(jg.apply(variables, to_nhwc(x)))
    assert np.max(np.abs(ours - golden)) < 1e-3


def test_netG_encode_only_taps(rng, gen_pair):
    tg, jg, variables = gen_pair
    x = rng.standard_normal((1, 1, H, W)).astype(np.float32)
    layers = [0, 4, 8, 12, 14]
    with torch.no_grad():
        golden = tg(torch.from_numpy(x), layers=layers, encode_only=True)
    ours = jg.apply(variables, to_nhwc(x), layers=tuple(layers),
                    encode_only=True)
    assert len(ours) == len(golden)
    for o, g in zip(ours, golden):
        assert from_nhwc(o).shape == tuple(g.shape)
        assert np.max(np.abs(from_nhwc(o) - g.numpy())) < 1e-3


def test_netG_param_structure_matches_init(gen_pair):
    _, jg, variables = gen_pair
    ref = jg.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 1)))
    ref_paths = jax.tree_util.tree_structure(ref["params"])
    got_paths = jax.tree_util.tree_structure(variables["params"])
    assert ref_paths == got_paths


@pytest.fixture(scope="module")
def vxm_pair():
    torch.manual_seed(1)
    nb = [[8, 16, 16, 16], [16, 16, 16, 16, 16, 8, 8]]
    tr = RefVxmDense((H, W), nb, int_steps=7, int_downsize=2, bidir=True)
    tr.eval()
    # give the flow head visible weights so the warp actually deforms
    with torch.no_grad():
        tr.flow.weight.normal_(0, 1e-2)
    jr = VxmDense(ndims=2, nb_features=(tuple(nb[0]), tuple(nb[1])),
                  int_steps=7, int_downsize=2, bidir=True)
    params = convert_netR(tr.state_dict(), nb[0], nb[1])
    return tr, jr, {"params": params}


def test_netR_forward_parity(rng, vxm_pair):
    tr, jr, variables = vxm_pair
    src = rng.standard_normal((1, 1, H, W)).astype(np.float32)
    tgt = rng.standard_normal((1, 1, H, W)).astype(np.float32)
    with torch.no_grad():
        g_ys, g_yt, g_flow = tr(torch.from_numpy(src), torch.from_numpy(tgt))
    ys, yt, flow = jr.apply(variables, to_nhwc(src), to_nhwc(tgt))
    assert np.max(np.abs(from_nhwc(flow) - g_flow.numpy())) < 1e-3
    assert np.max(np.abs(from_nhwc(ys) - g_ys.numpy())) < 1e-3
    assert np.max(np.abs(from_nhwc(yt) - g_yt.numpy())) < 1e-3


def test_netR_registration_mode(rng, vxm_pair):
    tr, jr, variables = vxm_pair
    src = rng.standard_normal((1, 1, H, W)).astype(np.float32)
    tgt = rng.standard_normal((1, 1, H, W)).astype(np.float32)
    with torch.no_grad():
        g_ys, g_flow = tr(torch.from_numpy(src), torch.from_numpy(tgt),
                          registration=True)
    ys, flow = jr.apply(variables, to_nhwc(src), to_nhwc(tgt),
                        registration=True)
    assert np.max(np.abs(from_nhwc(flow) - g_flow.numpy())) < 1e-3
    assert np.max(np.abs(from_nhwc(ys) - g_ys.numpy())) < 1e-3


def test_netF_parity(rng):
    torch.manual_seed(2)
    dims = [1, 32, 64]
    tf = RefPatchSampleF(dims, nc=16)
    tf.eval()
    jf = PatchSampleF(feature_dims=tuple(dims), nc=16)
    params = convert_netF(tf.state_dict(), len(dims))

    feats_t = [torch.from_numpy(
        rng.standard_normal((2, d, 8, 8)).astype(np.float32)) for d in dims]
    ids = [torch.randperm(64)[:16] for _ in dims]
    with torch.no_grad():
        golden, _ = tf(feats_t, 16, patch_ids=ids)

    feats_j = [to_nhwc(f.numpy()) for f in feats_t]
    ids_j = [jnp.asarray(i.numpy()) for i in ids]
    ours, _ = PatchSampleF(feature_dims=tuple(dims), nc=16).apply(
        {"params": params}, feats_j, 16, patch_ids=ids_j)
    for o, g in zip(ours, golden):
        assert np.max(np.abs(np.asarray(o) - g.numpy())) < 1e-4


def test_nce_feature_dims_default_config():
    """--nce_layers 0,4,8,12,16 on resnet_9blocks taps these channels."""
    dims = nce_feature_dims((0, 4, 8, 12, 16), input_nc=1, ngf=64, n_blocks=9)
    assert dims == [1, 128, 256, 256, 256]
    specs = resnet_generator_specs(1, 1, 64, 9)
    assert len(specs) == 32
    assert [s["kind"] for s in specs[:8]] == [
        "pad", "conv", "norm", "relu", "conv", "norm", "relu", "blur_down"]
