"""Attribute the 3-D VxmEngine train step's time (832 ms at 160^3 bf16 on
v5e) by chained-timing each stage on the real chip — same methodology as
scripts/profile_train.py (the tunnel makes jax.profiler unreliable).

Stages:
  train_step   full jitted update (fwd + bwd + Adam)
  netR_fwd     full VxmDense forward (unet + flow head + vecint + warps)
  unet_fwd     just the conv tower + flow head (no integrate/warp)
  vecint       7-step scaling-and-squaring at half res (batched bidir pair)
  warp_full    one batched full-res warp of the (src, tgt) pair
  ncc_loss     windowed-NCC value on a full-res pair

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
                    "vecint,warp_full,ncc_loss")
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

    def stage_netR_fwd():
        def step(carry):
            s, t = carry
            out = eng.netR.apply({"params": state.params}, s, t,
                                 return_preint=True)
            return chain(list(out), s), t
        return step, (src, tgt)

    def stage_unet_fwd():
        # conv tower + flow head only, applied straight on the params
        # subtrees (VxmDense has no unet-only entry point)
        import flax.linen as nn
        from dfmir_tpu.nets.vxm import VxmUnet

        enc_nf, dec_nf = eng.netR.nb_features
        unet = VxmUnet(tuple(enc_nf), tuple(dec_nf))
        flow_conv = nn.Conv(3, kernel_size=(3, 3, 3), padding=1)

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

    for name in args.stages.split(","):
        fn = {"train_step": stage_train_step, "netR_fwd": stage_netR_fwd,
              "unet_fwd": stage_unet_fwd, "vecint": stage_vecint,
              "warp_full": stage_warp_full, "ncc_loss": stage_ncc_loss}[name]
        try:
            step, carry = fn()
            _log(f"stage {name}")
            sec = _measure_chained(step, carry, args.iters)
            stages[f"{name}_ms"] = round(sec * 1e3, 2)
            _log(f"# {name}: {stages[f'{name}_ms']} ms/step")
        except Exception as e:
            stages[f"{name}_ms"] = None
            stages[f"{name}_error"] = repr(e)[:200]
            _log(f"# {name} FAILED: {repr(e)[:200]}")

    print(json.dumps(stages), flush=True)


if __name__ == "__main__":
    main()
