"""On-chip decision harness for the 3-D backward restructure (VERDICT r3
#5): VecInt's backward measured ~428 ms of the 533 ms 160^3 train step
(PROF3D_r04.json) — ~10x its 41.5 ms forward, vs the ~4x the four
selection matmuls predict.  The hypothesis (code reading): the per-tile
dband HBM materialization + the serial n_t-iteration scatter loop are
latency-bound (~40 of 61 ms/warp-step at 80^3 x 7 steps).

Stages (all chained-timing on the real chip, tunnel-safe):
  vecint_fwd        7-step scaling-and-squaring, (2, 80^3, 3) bf16-shaped
                    f32 SVF (the in-graph vecint input)
  vecint_fwdbwd     grad of sum(vecint) wrt the SVF — the 428 ms target
  vecint_fwdbwd_bf16 / _bf16x2
                    same with BWD_PRECISION dropped (passes 4:8:12)
  dsrc_vmem / dsrc_scatter
                    the dsrc half alone at vecint shapes, both modes
  dflow_half        the dflow half alone at vecint shapes
  warp_fwdbwd_flowonly
                    full-res 160^3 batched warp, grad wrt FLOW only (the
                    training path after the split: dsrc kernel DCE'd)
  warp_fwdbwd_both  same, grad wrt (src, flow) — the old cost

Prints one JSON dict of ms/step.  Reference op under test:
/root/reference/models/voxelmorph/torchvoxelmorph/layers.py:51-68.
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
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--stages", default="vecint_fwd,vecint_fwdbwd,"
                    "vecint_fwdbwd_bf16,vecint_fwdbwd_bf16x2,"
                    "dsrc_vmem,dsrc_scatter,dflow_half,"
                    "warp_fwdbwd_flowonly,warp_fwdbwd_both")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _measure_chained, _log
    import dfmir_tpu.ops.warp_pallas as wp
    from dfmir_tpu.ops import warp
    from dfmir_tpu.ops.integrate import resize_linear, vecint

    S = args.size
    H = S // 2
    rng = np.random.default_rng(0)
    # the profile_train3d SVF (same spectrum/amplitude, bidir batch pair)
    lo = rng.standard_normal((2, H // 8, H // 8, H // 8, 3)) * 2.0
    svf = resize_linear(jnp.asarray(lo, jnp.float32), (H, H, H))
    # full-res smooth field + image pair for the 160^3 warp stages
    lo2 = rng.standard_normal((2, S // 16, S // 16, S // 16, 3)) * 5.0
    flow_full = resize_linear(jnp.asarray(lo2, jnp.float32), (S, S, S))
    pair = jnp.asarray(rng.standard_normal((2, S, S, S, 1)), jnp.float32)
    g80 = jnp.asarray(rng.standard_normal(svf.shape), jnp.float32)

    stages = {}

    def stage_vecint_fwd():
        def step(carry):
            (v,) = carry
            out = vecint(v, nsteps=7)
            return (v + out * 1e-6,)
        return step, (svf,)

    def _vecint_fwdbwd(prec):
        # BWD_PRECISION is read at trace time inside _warp3d_bwd
        wp.BWD_PRECISION = prec
        jax.clear_caches()

        def f(v):
            return jnp.sum(vecint(v, nsteps=7).astype(jnp.float32)) * 1e-6

        def step(carry):
            (v,) = carry
            gr = jax.grad(f)(v)
            return (v + gr * 1e-6,)
        return step, (svf,)

    def stage_vecint_fwdbwd():
        return _vecint_fwdbwd(None)

    def stage_vecint_fwdbwd_bf16():
        return _vecint_fwdbwd("bf16")

    def stage_vecint_fwdbwd_bf16x2():
        return _vecint_fwdbwd("bf16x2")

    def _dsrc(mode):
        def step(carry):
            v, g = carry
            ds, _ = wp.warp3d_banded_bwd_dsrc(v, g, bz=wp.BZ0, by=wp.BY0,
                                              dsrc_mode=mode)
            return v + ds * 1e-6, g
        return step, (svf, g80)

    def stage_dsrc_vmem():
        return _dsrc("vmem")

    def stage_dsrc_scatter():
        return _dsrc("scatter")

    def stage_dflow_half():
        def step(carry):
            v, g = carry
            df, _ = wp.warp3d_banded_bwd_dflow(v, v, g, bz=wp.BZ0,
                                               by=wp.BY0)
            return v + df * 1e-6, g
        return step, (svf, g80)

    def stage_warp_fwdbwd_flowonly():
        def f(fl, p):
            return jnp.sum(
                warp(p, fl, mode="bilinear").astype(jnp.float32)) * 1e-6

        def step(carry):
            p, fl = carry
            gf = jax.grad(f)(fl, p)
            return p, fl + gf * 1e-6
        return step, (pair, flow_full)

    def stage_warp_fwdbwd_both():
        def f(p, fl):
            return jnp.sum(
                warp(p, fl, mode="bilinear").astype(jnp.float32)) * 1e-6

        def step(carry):
            p, fl = carry
            gp, gf = jax.grad(f, argnums=(0, 1))(p, fl)
            return p + gp * 1e-6, fl + gf * 1e-6
        return step, (pair, flow_full)

    table = {
        "vecint_fwd": stage_vecint_fwd,
        "vecint_fwdbwd": stage_vecint_fwdbwd,
        "vecint_fwdbwd_bf16": stage_vecint_fwdbwd_bf16,
        "vecint_fwdbwd_bf16x2": stage_vecint_fwdbwd_bf16x2,
        "dsrc_vmem": stage_dsrc_vmem,
        "dsrc_scatter": stage_dsrc_scatter,
        "dflow_half": stage_dflow_half,
        "warp_fwdbwd_flowonly": stage_warp_fwdbwd_flowonly,
        "warp_fwdbwd_both": stage_warp_fwdbwd_both,
    }
    for name in args.stages.split(","):
        try:
            step, carry = table[name]()
            _log(f"stage {name}")
            sec = _measure_chained(step, carry, args.iters)
            stages[f"{name}_ms"] = round(sec * 1e3, 2)
            _log(f"# {name}: {stages[f'{name}_ms']} ms/step")
        except Exception as e:
            stages[f"{name}_ms"] = None
            stages[f"{name}_error"] = repr(e)[:300]
            _log(f"# {name} FAILED: {repr(e)[:300]}")
        finally:
            wp.BWD_PRECISION = None

    print(json.dumps(stages), flush=True)


if __name__ == "__main__":
    main()
