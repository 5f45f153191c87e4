"""On-chip price list for the 3-D warp FORWARD's selection-matmul
emulation level (FWD_PRECISION).  After the split-backward restructure
(VECINT_BWD_r04) the full-res bidir warp FORWARD is the largest single
stage of the 327 ms 160^3 train step (138.8 ms, PROF3D_r04): its one
selection matmul per sub-tile runs 3-pass bf16x3.  Dropping passes cuts
MXU work 1/3 per pass but the error lands in the warped INTENSITIES
(the loss inputs), not just gradients — so this harness reports both
ms/step and max relative error vs the XLA f32 warp, per level, for
  warp_full   full-res 160^3 batch-2 warp (the loss-image warp)
  vecint      80^3 bidir 7-step scaling-and-squaring (flow-on-flow
              warps; errors compound through the chain)
Semantics under test: the reference SpatialTransformer
(/root/reference/models/voxelmorph/torchvoxelmorph/layers.py:30-48).
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--levels", default="bf16x3,bf16x2,bf16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _measure_chained, _log
    import dfmir_tpu.ops.warp_pallas as wp
    from dfmir_tpu.ops.warp import warp
    from dfmir_tpu.ops.integrate import resize_linear, vecint

    S = args.size
    H = S // 2
    rng = np.random.default_rng(0)
    lo = rng.standard_normal((2, H // 8, H // 8, H // 8, 3)) * 2.0
    svf = resize_linear(jnp.asarray(lo, jnp.float32), (H, H, H))
    lo2 = rng.standard_normal((2, S // 16, S // 16, S // 16, 3)) * 5.0
    flow_full = resize_linear(jnp.asarray(lo2, jnp.float32), (S, S, S))
    pair = jnp.asarray(rng.standard_normal((2, S, S, S, 1)), jnp.float32)

    out = {"what": __doc__.split("\n")[0]}

    @jax.jit
    def ref_warp(p, fl):
        return warp(p, fl, mode="bilinear", impl="xla")

    @jax.jit
    def ref_vecint_err(v, a):
        f = vecint(v, nsteps=7, impl="xla")
        return jnp.max(jnp.abs(a - f)) / (jnp.max(jnp.abs(f)) + 1e-12)

    ref_full = ref_warp(pair, flow_full)

    for lev in args.levels.split(","):
        wp.FWD_PRECISION = None if lev == "bf16x3" else lev
        jax.clear_caches()

        def step_warp(carry):
            p, fl = carry
            o = warp(p, fl, mode="bilinear")
            return p + o * 1e-6, fl

        def step_vecint(carry):
            (v,) = carry
            o = vecint(v, nsteps=7)
            return (v + o * 1e-6,)

        try:
            _log(f"level {lev}: warp_full timing")
            sec = _measure_chained(step_warp, (pair, flow_full),
                                   args.iters)
            out[f"warp_full_{lev}_ms"] = round(sec * 1e3, 2)
            o = jax.jit(lambda p, fl: warp(p, fl, mode="bilinear"))(
                pair, flow_full)
            err = float(jnp.max(jnp.abs(o - ref_full))
                        / (jnp.max(jnp.abs(ref_full)) + 1e-12))
            out[f"warp_full_{lev}_relerr"] = round(err, 7)
            _log(f"# warp_full {lev}: {out[f'warp_full_{lev}_ms']} ms, "
                 f"relerr {err:.2e}")

            _log(f"level {lev}: vecint timing")
            sec = _measure_chained(step_vecint, (svf,),
                                   args.iters)
            out[f"vecint_{lev}_ms"] = round(sec * 1e3, 2)
            a = jax.jit(lambda v: vecint(v, nsteps=7))(svf)
            errv = float(ref_vecint_err(svf, a))
            out[f"vecint_{lev}_relerr"] = round(errv, 7)
            _log(f"# vecint {lev}: {out[f'vecint_{lev}_ms']} ms, "
                 f"relerr {errv:.2e}")
        except Exception as e:
            out[f"{lev}_error"] = repr(e)[:300]
            _log(f"# {lev} FAILED: {repr(e)[:300]}")
        finally:
            wp.FWD_PRECISION = None

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
