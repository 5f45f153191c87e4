"""The split 3-D banded backward (dflow / dsrc halves as separate
pallas_calls) and the dsrc VMEM-accumulator mode.

Covers:
- numeric equality of dsrc_mode="vmem" vs "scatter" vs the XLA VJP
  (the vmem mode reorders only the accumulation of disjoint adds);
- the split's purpose: when a warp's source has no gradient path (the
  model's full-res image warps), the dsrc kernel is DEAD CODE and JAX's
  jaxpr DCE removes it through the band-cascade lax.conds.

Reference op: /root/reference/models/voxelmorph/torchvoxelmorph/
layers.py:30-48 (SpatialTransformer backward semantics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dfmir_tpu.ops.warp_pallas as wp
from dfmir_tpu.ops.warp import warp


def _mk(shape_src=(2, 16, 16, 16, 2), seed=0, amp=1.5):
    rng = np.random.default_rng(seed)
    B, D, H, W, C = shape_src
    src = jnp.asarray(rng.standard_normal(shape_src), jnp.float32)
    # smooth-ish flow comfortably inside the tiny band
    lo = rng.standard_normal((B, D // 4, H // 4, W // 4, 3)) * amp
    from dfmir_tpu.ops.integrate import resize_linear
    flow = resize_linear(jnp.asarray(lo, jnp.float32), (D, H, W))
    g = jnp.asarray(rng.standard_normal((B, D, H, W, C)), jnp.float32)
    return src, flow, g


def _xla_vjp(src, flow, g):
    _, vjp = jax.vjp(lambda s, f: warp(s, f, mode="bilinear", impl="xla"),
                     src, flow)
    return vjp(g)


def test_dsrc_vmem_matches_scatter_and_xla():
    src, flow, g = _mk()
    ds_ref, df_ref = _xla_vjp(src, flow, g)

    ds_v, ok_v = wp.warp3d_banded_bwd_dsrc(flow, g, fold=2, interpret=True,
                                           dsrc_mode="vmem")
    ds_s, ok_s = wp.warp3d_banded_bwd_dsrc(flow, g, fold=2, interpret=True,
                                           dsrc_mode="scatter")
    assert bool(ok_v) and bool(ok_s)
    # identical adds in different order
    np.testing.assert_allclose(np.asarray(ds_v), np.asarray(ds_s),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ds_v), np.asarray(ds_ref),
                               atol=2e-4, rtol=2e-4)


def test_dflow_half_matches_xla():
    src, flow, g = _mk(seed=1)
    _, df_ref = _xla_vjp(src, flow, g)
    df, ok = wp.warp3d_banded_bwd_dflow(src, flow, g, fold=2,
                                        interpret=True)
    assert bool(ok)
    scale = float(jnp.max(jnp.abs(df_ref))) + 1e-12
    err = float(jnp.max(jnp.abs(df - df_ref))) / scale
    assert err < 2e-4, err


def test_dsrc_auto_picks_vmem_small_scatter_big():
    # 16^3: dsrc plane 16*16*128*4 = 128 KB -> vmem.
    src, flow, g = _mk()
    assert wp._pick_fold(16, wp.BZ0 * wp.BY0, 128, k1=3.0, k2=4,
                         extra=16 * 16 * 128 * 4 + wp.BZ0 * wp.BY0 * 128 * 4,
                         strict=True) is not None
    # a 256^3 plane (256*256*256*4 = 64 MB) can never fit
    assert wp._pick_fold(256, wp.BZ0 * wp.BY0, 256, k1=3.0, k2=4,
                         extra=256 * 256 * 256 * 4,
                         strict=True) is None


def _pallas_arity_counts(closed_jaxpr):
    from collections import Counter

    def walk(j):
        yield j
        for e in j.eqns:
            for v in e.params.values():
                vs = v if isinstance(v, (list, tuple)) else (v,)
                for x in vs:
                    inner = getattr(x, "jaxpr", None)
                    if inner is not None and hasattr(inner, "eqns"):
                        yield from walk(inner)
                    elif hasattr(x, "eqns"):
                        yield from walk(x)

    c = Counter()
    for j in walk(closed_jaxpr):
        for e in j.eqns:
            if e.primitive.name == "pallas_call":
                c[len(e.outvars)] += 1
    return dict(c)


def test_dsrc_kernel_dce_when_src_is_data():
    """grad wrt flow only (src = data image): every 1-output pallas eqn
    (the dsrc kernels AND the dead primal-retrace fwd kernels) must DCE;
    grad wrt both keeps the dsrc kernels.  This is the property the split
    exists for — VxmDense's full-res warps pay zero for dsrc."""
    # private JAX API: degrade to a skip (not a false failure) on a JAX
    # bump that moves/renames it (ADVICE r4)
    pe = pytest.importorskip("jax._src.interpreters.partial_eval")
    if not hasattr(pe, "dce_jaxpr"):
        pytest.skip("jax._src partial_eval.dce_jaxpr no longer exposed")

    old = wp._INTERPRET
    wp._INTERPRET = True
    try:
        src, flow, _ = _mk()

        cj = jax.make_jaxpr(lambda f: jax.grad(
            lambda ff: jnp.sum(wp._warp3d(src, ff)))(f))(flow)
        dj, _ = pe.dce_jaxpr(cj.jaxpr, [True] * len(cj.jaxpr.outvars))
        counts = _pallas_arity_counts(dj)
        assert counts.get(1, 0) == 0, counts   # no dsrc/fwd kernels left
        assert counts.get(3, 0) >= 1, counts   # dflow kernels remain

        cj2 = jax.make_jaxpr(lambda s, f: jax.grad(
            lambda ss, ff: jnp.sum(wp._warp3d(ss, ff)),
            argnums=(0, 1))(s, f))(src, flow)
        dj2, _ = pe.dce_jaxpr(cj2.jaxpr, [True] * len(cj2.jaxpr.outvars))
        counts2 = _pallas_arity_counts(dj2)
        assert counts2.get(1, 0) >= 1, counts2  # dsrc kernels kept
    finally:
        wp._INTERPRET = old


@pytest.mark.parametrize("prec,tol", [("bf16", 3e-2), ("bf16x2", 1e-2),
                                      ("bf16x3", 2e-4)])
def test_split_bwd_precision_envelopes(prec, tol):
    """Relative gradient error per emulation level for the SPLIT halves
    (mirrors test_3d_bwd_precision_variants for the fused wrapper)."""
    src, flow, g = _mk(seed=2)
    ds_ref, df_ref = _xla_vjp(src, flow, g)
    df, ok = wp.warp3d_banded_bwd_dflow(src, flow, g, fold=2,
                                        interpret=True, precision=prec)
    ds, _ = wp.warp3d_banded_bwd_dsrc(flow, g, fold=2, interpret=True,
                                      precision=prec)
    assert bool(ok)
    for a, b in ((df, df_ref), (ds, ds_ref)):
        scale = float(jnp.max(jnp.abs(b))) + 1e-12
        err = float(jnp.max(jnp.abs(a - b))) / scale
        assert err < tol, (prec, err)
