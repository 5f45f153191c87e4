"""Attribute the 3-D VxmEngine train step's time (832 ms at 160^3 bf16 on
v5e) by chained-timing each stage on the real chip — same methodology as
scripts/profile_train.py (the tunnel makes jax.profiler unreliable).

Forward stages:
  train_step   full jitted update (fwd + bwd + Adam)
  netR_fwd     full VxmDense forward (unet + flow head + vecint + warps)
  unet_fwd     just the conv tower + flow head (no integrate/warp)
  vecint       7-step scaling-and-squaring at half res (batched bidir pair)
  warp_full    one batched full-res warp of the (src, tgt) pair
  ncc_loss     windowed-NCC value on a full-res pair

Backward attribution (each stage times grad() of the same computation, so
bwd cost = <stage>_fwdbwd - <stage> fwd; train_step - loss_fwdbwd = Adam +
state plumbing):
  loss_fwdbwd  grad of the full loss wrt params (fwd + whole backward)
  unet_fwdbwd  grad of the conv tower + flow head wrt params
  vecint_fwdbwd  grad of the scaling-and-squaring chain wrt the SVF
  warp_fwdbwd  grad of the full-res batched warp wrt (src, flow)
  ncc_fwdbwd   grad of the windowed NCC wrt the prediction
  adam         optimizer update only (scale_by_adam + apply on the tree)

Prints one JSON dict of ms/step.  Reference op under test:
/root/reference/models/voxelmorph/torchvoxelmorph/{networks.py:1028-1145,
layers.py:51-68}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=160)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--stages", default="train_step,netR_fwd,unet_fwd,"
                    "vecint,warp_full,ncc_loss,loss_fwdbwd,unet_fwdbwd,"
                    "vecint_fwdbwd,warp_fwdbwd,ncc_fwdbwd,adam")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _init_on_cpu, _measure_chained, _log
    from dfmir_tpu.engine.vxm_engine import VxmConfig, VxmEngine
    from dfmir_tpu.losses.similarity import ncc_loss
    from dfmir_tpu.ops import warp
    from dfmir_tpu.ops.integrate import resize_linear, vecint

    S = args.size
    cfg = VxmConfig(vol_size=S, batch_size=1, compute_dtype=args.dtype)
    eng = VxmEngine(cfg)
    state = _init_on_cpu(lambda: eng.init_state(jax.random.PRNGKey(0)))
    rng = np.random.default_rng(0)
    shape = (1, S, S, S, 1)
    src = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    # half-res SVF pair (the batched bidir vecint input) and a full-res
    # smooth field (the final warp input)
    H = S // 2
    lo = rng.standard_normal((2, H // 8, H // 8, H // 8, 3)) * 2.0
    svf = resize_linear(jnp.asarray(lo, jnp.float32), (H, H, H))
    lo2 = rng.standard_normal((2, S // 16, S // 16, S // 16, 3)) * 5.0
    flow_full = resize_linear(jnp.asarray(lo2, jnp.float32), (S, S, S))
    pair = jnp.concatenate([src, tgt], axis=0)

    def chain(out_list, x):
        upd = 0.0
        for o in out_list:
            upd = upd + jnp.sum(jnp.ravel(o)[:1]) * 1e-6
        return x + upd

    stages = {}

    def stage_train_step():
        def step(carry):
            st, s = carry
            new_st, _ = eng.train_step(st, s, tgt)
            return new_st, s
        return step, (state, src)

    def record_memstats(tag):
        # peak HBM with the current conv lowering engaged (ADVICE r3: the
        # z-decomposed conv materializes kz shifted volume copies — verify
        # the op-level win survives the activation footprint at scale)
        try:
            ms = jax.local_devices()[0].memory_stats()
            if ms:
                for key in ("peak_bytes_in_use", "bytes_in_use",
                            "largest_alloc_size", "bytes_limit"):
                    if key in ms:
                        stages[f"{tag}_{key}_mb"] = round(
                            ms[key] / 2**20, 1)
        except Exception as e:  # memory_stats unsupported on some backends
            stages[f"{tag}_memstats_error"] = repr(e)[:120]

    def stage_netR_fwd():
        def step(carry):
            s, t = carry
            out = eng.netR.apply({"params": state.params}, s, t,
                                 return_preint=True)
            return chain(list(out), s), t
        return step, (src, tgt)

    def stage_unet_fwd():
        # conv tower + flow head only, applied straight on the params
        # subtrees (VxmDense has no unet-only entry point).  The flow
        # head must be Conv3DZ — the engine's lowering (nets/vxm.py) —
        # NOT plain nn.Conv: XLA's native conv3d at C_out=3 is the
        # measured 0.6-ish TFLOP/s pathology and inflated this stage's
        # pre-r5 attribution (the "170 ms unet" was part flow-head
        # artifact).
        from dfmir_tpu.nets.vxm import VxmUnet
        from dfmir_tpu.nets.layers import Conv3DZ

        enc_nf, dec_nf = eng.netR.nb_features
        unet = VxmUnet(tuple(enc_nf), tuple(dec_nf))
        flow_conv = Conv3DZ(3, kernel_size=(3, 3, 3),
                            padding=[(1, 1)] * 3)

        def step(carry):
            s, t = carry
            x = jnp.concatenate([s, t], axis=-1).astype(
                jnp.dtype(eng.netR.compute_dtype))
            h = unet.apply({"params": state.params["unet"]}, x)
            pre = flow_conv.apply(
                {"params": state.params["flow"]}, h).astype(jnp.float32)
            return chain([pre], s), t
        return step, (src, tgt)

    def stage_vecint():
        def step(carry):
            (v,) = carry
            out = vecint(v, nsteps=7)
            return (v + out * 1e-6,)
        return step, (svf,)

    def stage_warp_full():
        def step(carry):
            p, f = carry
            out = warp(p, f, mode="bilinear")
            return chain([out], p), f
        return step, (pair, flow_full)

    def stage_ncc_loss():
        def step(carry):
            a, b = carry
            val = ncc_loss(a, b, kernel_var=[9, 9, 9])
            return a + val * 1e-6, b
        return step, (src, tgt)

    # --- backward attribution: grad() of each stage's computation; the
    # carry folds a scalar tap of the gradient back into the input so the
    # chained steps stay dependent and nothing is dead-code-eliminated.

    def stage_loss_fwdbwd():
        def step(carry):
            p, s = carry
            grads, _ = jax.grad(eng._loss_fn, has_aux=True)(p, s, tgt)
            tap = jnp.asarray(0.0, jnp.float32)
            for leaf in jax.tree.leaves(grads):
                tap = tap + jnp.sum(jnp.ravel(leaf)[:1]).astype(jnp.float32)
            return jax.tree.map(
                lambda a: a + (tap * 1e-12).astype(a.dtype), p), s
        return step, (state.params, src)

    def stage_unet_fwdbwd():
        # flow head via Conv3DZ, matching the engine (see stage_unet_fwd)
        from dfmir_tpu.nets.vxm import VxmUnet
        from dfmir_tpu.nets.layers import Conv3DZ

        enc_nf, dec_nf = eng.netR.nb_features
        unet = VxmUnet(tuple(enc_nf), tuple(dec_nf))
        flow_conv = Conv3DZ(3, kernel_size=(3, 3, 3),
                            padding=[(1, 1)] * 3)
        x_in = jnp.concatenate([src, tgt], axis=-1).astype(
            jnp.dtype(eng.netR.compute_dtype))

        def f(p):
            h = unet.apply({"params": p["unet"]}, x_in)
            pre = flow_conv.apply({"params": p["flow"]}, h)
            return jnp.sum(pre.astype(jnp.float32)) * 1e-6

        sub = {"unet": state.params["unet"], "flow": state.params["flow"]}

        def step(carry):
            p, = carry
            grads = jax.grad(f)(p)
            tap = jnp.asarray(0.0, jnp.float32)
            for leaf in jax.tree.leaves(grads):
                tap = tap + jnp.sum(jnp.ravel(leaf)[:1]).astype(jnp.float32)
            return (jax.tree.map(
                lambda a: a + (tap * 1e-12).astype(a.dtype), p),)
        return step, (sub,)

    def stage_vecint_fwdbwd():
        def f(v):
            return jnp.sum(vecint(v, nsteps=7).astype(jnp.float32)) * 1e-6

        def step(carry):
            (v,) = carry
            g = jax.grad(f)(v)
            return (v + g * 1e-6,)
        return step, (svf,)

    def stage_warp_fwdbwd():
        def f(p, fl):
            return jnp.sum(
                warp(p, fl, mode="bilinear").astype(jnp.float32)) * 1e-6

        def step(carry):
            p, fl = carry
            gp, gf = jax.grad(f, argnums=(0, 1))(p, fl)
            return p + gp * 1e-6, fl + gf * 1e-6
        return step, (pair, flow_full)

    def stage_ncc_fwdbwd():
        def f(a, b):
            return ncc_loss(a, b, kernel_var=[9, 9, 9])

        def step(carry):
            a, b = carry
            g = jax.grad(f)(a, b)
            return a + g * 1e-3, b
        return step, (src, tgt)

    def stage_adam():
        fake_grads = jax.tree.map(
            lambda a: jnp.full(a.shape, 1e-6, a.dtype), state.params)

        def step(carry):
            p, opt = carry
            updates, new_opt = eng.tx.update(fake_grads, opt, p)
            updates = jax.tree.map(lambda u: -1e-4 * u, updates)
            import optax
            return optax.apply_updates(p, updates), new_opt
        return step, (state.params, state.opt_state)

    for name in args.stages.split(","):
        fn = {"train_step": stage_train_step, "netR_fwd": stage_netR_fwd,
              "unet_fwd": stage_unet_fwd, "vecint": stage_vecint,
              "warp_full": stage_warp_full, "ncc_loss": stage_ncc_loss,
              "loss_fwdbwd": stage_loss_fwdbwd,
              "unet_fwdbwd": stage_unet_fwdbwd,
              "vecint_fwdbwd": stage_vecint_fwdbwd,
              "warp_fwdbwd": stage_warp_fwdbwd,
              "ncc_fwdbwd": stage_ncc_fwdbwd, "adam": stage_adam}[name]
        try:
            step, carry = fn()
            _log(f"stage {name}")
            sec = _measure_chained(step, carry, args.iters)
            stages[f"{name}_ms"] = round(sec * 1e3, 2)
            _log(f"# {name}: {stages[f'{name}_ms']} ms/step")
            if name == "train_step":
                record_memstats("train_step")
        except Exception as e:
            stages[f"{name}_ms"] = None
            stages[f"{name}_error"] = repr(e)[:200]
            _log(f"# {name} FAILED: {repr(e)[:200]}")

    print(json.dumps(stages), flush=True)


if __name__ == "__main__":
    main()
