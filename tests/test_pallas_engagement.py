"""The Pallas warp must engage INSIDE the jitted train step, not just in
isolation (VERDICT r2 #3): with the TPU dispatch forced, tracing the joint
train step's gradient must embed banded pallas_call equations in both the
forward chain (VecInt + full-res warps) and the custom-VJP backward.

This is a structural check (jaxpr inspection, backend-free) — the
compiled-on-hardware exactness gate is ``bench.py --mode kernelcheck``.
"""

import importlib

import jax
import jax.numpy as jnp

from dfmir_tpu.engine import RegistrationConfig, RegistrationModel

# the package re-exports the warp FUNCTION under the submodule's name
warp_mod = importlib.import_module("dfmir_tpu.ops.warp")


def _iter_jaxprs(jaxpr):
    """Yield a jaxpr and every nested sub-jaxpr (cond branches, scan
    bodies, pjit calls, custom-vjp calls, ...)."""
    yield jaxpr
    for eqn in jaxpr.eqns:
        for val in eqn.params.values():
            vals = val if isinstance(val, (list, tuple)) else (val,)
            for v in vals:
                inner = getattr(v, "jaxpr", None)
                if inner is not None and hasattr(inner, "eqns"):
                    yield from _iter_jaxprs(inner)
                elif hasattr(v, "eqns"):
                    yield from _iter_jaxprs(v)


def _pallas_eqns(closed_jaxpr):
    out = []
    for j in _iter_jaxprs(closed_jaxpr.jaxpr):
        out.extend(e for e in j.eqns if e.primitive.name == "pallas_call")
    return out


def _classify(eqns):
    """Pallas warp kernels by output arity: the forward selection kernel
    emits ONE array; the banded backwards emit (dband, df...) = 3 (2-D)
    or 4 (3-D) arrays."""
    fwd = [e for e in eqns if len(e.outvars) == 1]
    bwd = [e for e in eqns if len(e.outvars) >= 3]
    return fwd, bwd


def _forced_impl(src, flow, mode):
    # force the TPU dispatch decision; supports() must hold at every warp
    # site inside the step or this raises (a silent XLA fallback at any
    # site would otherwise hide a shape-gate regression)
    from dfmir_tpu.ops import warp_pallas

    assert warp_pallas.supports(src, flow, mode), (
        f"warp site fell off the kernel path: src={src.shape} "
        f"flow={flow.shape} mode={mode}")
    return "pallas"


def test_pallas_warp_engages_in_train_step_trace(monkeypatch):
    model = RegistrationModel(RegistrationConfig(
        crop_size=64, batch_size=1, num_patches=16))
    state = model.init_state(jax.random.PRNGKey(0))  # real exec: pre-patch
    A = jnp.zeros((1, 64, 64, 1), jnp.float32)
    B = jnp.zeros((1, 64, 64, 1), jnp.float32)
    key = jax.random.PRNGKey(1)

    monkeypatch.setattr(warp_mod, "_default_impl", _forced_impl)
    jax.clear_caches()  # init_state traced warp sites with the CPU (xla)
    # dispatch; drop those cached traces so the forced one takes effect

    jaxpr = jax.make_jaxpr(
        lambda p, a, b: jax.grad(
            lambda q, x, y: model._loss_fn(q, x, y, key)[0])(p, a, b)
    )(state.params, A, B)
    eqns = _pallas_eqns(jaxpr)
    fwd, bwd = _classify(eqns)
    # forward chain (batched bidir VecInt self-warps live in a scan body,
    # so distinct eqns undercount call counts) + the custom-VJP backward
    assert len(eqns) >= 3, len(eqns)
    assert fwd, "no forward selection kernel in the step trace"
    assert bwd, "custom-VJP backward kernel not in the step trace"


def test_pallas_warp_engages_in_vxm3d_train_trace(monkeypatch):
    from dfmir_tpu.engine.vxm_engine import VxmConfig, VxmEngine

    eng = VxmEngine(VxmConfig(ndims=3, vol_size=32, enc=(4, 8),
                              dec=(8, 4, 4), int_steps=3, image_loss="mse"))
    state = eng.init_state(jax.random.PRNGKey(0))  # real exec: pre-patch
    x = jnp.zeros((1, 32, 32, 32, 1), jnp.float32)
    y = jnp.zeros((1, 32, 32, 32, 1), jnp.float32)

    monkeypatch.setattr(warp_mod, "_default_impl", _forced_impl)
    jax.clear_caches()  # drop init-time (xla-dispatch) warp traces

    jaxpr = jax.make_jaxpr(
        lambda p: jax.grad(lambda q: eng._loss_fn(q, x, y)[0])(p)
    )(state.params)
    eqns = _pallas_eqns(jaxpr)
    fwd, bwd = _classify(eqns)
    assert len(eqns) >= 2, len(eqns)
    assert fwd, "no forward selection kernel in the 3-D step trace"
    assert bwd, "custom-VJP backward kernel not in the 3-D step trace"
