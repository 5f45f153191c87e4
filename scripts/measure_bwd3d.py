"""On-chip decision measurement for VERDICT r2 #8: the 3-D big-band Pallas
backward vs the XLA VJP, per selection-matmul emulation level.

The small-band bwd wins 2x (166 ms vs 334 ms at 160^3 on v5e) but the
big-band bwd at the default bf16x3 emulation measured 470 ms (loses) — its
four selection matmuls scale with band area.  Dropping to bf16x2/bf16 cuts
the MXU passes 3:2:1 with a bounded relative gradient error (pinned by
tests/test_warp_pallas.py::test_3d_bwd_precision_variants at 1e-2 / 3e-2).
This script times each level COMPILED on the TPU on a deterministic
big-band field (y-shear, same construction as bench kernelcheck) and
reports errors vs the XLA VJP, so BWD_BIG_PRECISION's default is a
recorded measurement, not a guess.

Usage:  python scripts/measure_bwd3d.py [--size 160] [--iters 6]
Prints one JSON line per variant plus a "decision" line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _measure_chained, _log  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=160)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--cpu", action="store_true",
                    help="CPU smoke (tiny size, interpret-mode kernels; "
                         "timings meaningless)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from dfmir_tpu.ops import warp_pallas as wp
    from dfmir_tpu.ops.warp import warp
    from dfmir_tpu.ops.integrate import resize_linear

    S = args.size
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((1, S, S, S, 1)), jnp.float32)
    lo = rng.standard_normal((1, S // 16, S // 16, S // 16, 3)) * 3.0
    flow = resize_linear(jnp.asarray(lo, jnp.float32), (S, S, S))
    # y-shear pushes the per-tile y-span over the small band (BY=32) but
    # under the big one (BY2=48) — same construction as bench kernelcheck.
    # The per-tile span scales with shear*S, so the coefficient must adapt
    # to --size: scan for one that lands in the small<span<=big window.
    xx = jnp.arange(S, dtype=jnp.float32) - S / 2
    base = flow
    for coef in (0.15, 0.12, 0.18, 0.10, 0.08, 0.2, 0.06):
        flow = base.at[..., 1].add(jnp.broadcast_to(coef * xx, (1, S, S, S)))
        ok_small = bool(wp._band3d_ok(flow, S, S, wp.BZ, wp.BY))
        ok_big = bool(wp._band3d_ok(flow, S, S, wp.BZ2, wp.BY2))
        _log(f"shear {coef}: small={ok_small} big={ok_big} (want F/T)")
        if not ok_small and ok_big:
            break
    else:
        _log("no shear coefficient lands in the big-band-only window; "
             "the measurement would not exercise the big band — aborting")
        sys.exit(2)
    g = jnp.asarray(rng.standard_normal(src.shape), jnp.float32)

    _, vjp = jax.vjp(lambda s, f: warp(s, f, impl="xla"), src, flow)
    ds_ref, df_ref = vjp(g)
    scale_s = float(jnp.max(jnp.abs(ds_ref)))
    scale_f = float(jnp.max(jnp.abs(df_ref)))

    def time_variant(fn):
        # chain through g so each step depends on the previous (bench.py
        # methodology: the tunnel pipeline otherwise overlaps steps).
        # src/flow ride in the carry as ARGUMENTS: a closure-captured 160^3
        # array is embedded into the HLO as a constant, and the tunnel's
        # remote-compile endpoint rejects the multi-MB request (HTTP 413).
        def step(carry):
            gc, s, f = carry
            outs = fn(gc, s, f)
            upd = sum(jnp.sum(jnp.ravel(o)[:1]) for o in outs)
            return (gc + upd * 1e-6, s, f)

        return _measure_chained(step, (g, src, flow), args.iters)

    results = {}

    # The XLA bwd-only time cannot be isolated without embedding residual
    # constants, so estimate it as (fwd+bwd) - (fwd); both programs take
    # src/flow as arguments.
    def xla_fwd(gc, s, f):
        # 1e-30*gc: numerically nil but NOT simplifiable to a constant —
        # without the data dependence XLA would hoist the loop-invariant
        # warp out of the fori_loop and the slope would measure nothing.
        return (warp(s + gc * 1e-30, f, impl="xla"),)

    def xla_fwdbwd(gc, s, f):
        _, vj = jax.vjp(lambda ss, ff: warp(ss, ff, impl="xla"), s, f)
        return vj(gc)

    sec_fwd = time_variant(xla_fwd)
    sec_fwdbwd = time_variant(xla_fwdbwd)
    results["xla_vjp"] = {
        "ms": round((sec_fwdbwd - sec_fwd) * 1e3, 2),
        "fwd_ms": round(sec_fwd * 1e3, 2),
        "fwdbwd_ms": round(sec_fwdbwd * 1e3, 2),
        "method": "fwdbwd minus fwd",
    }
    print(json.dumps({"variant": "xla_vjp", **results["xla_vjp"]}),
          flush=True)

    for prec in ("bf16x3", "bf16x2", "bf16"):
        # The big band's VMEM footprint scales with fold: fold=2 measured
        # 19.8M scoped vmem at 160^3 (over the 16M limit), so walk down.
        entry = None
        for fold in (2, 1):
            def pallas_bwd(gc, s, f, prec=prec, fold=fold):
                ds, df, _ = wp.warp3d_banded_bwd(
                    s, f, gc, bz=wp.BZ2, by=wp.BY2, fold=fold,
                    precision=prec, interpret=args.cpu)
                return ds, df

            try:
                ds, df = pallas_bwd(g, src, flow)
                err_s = (float(jnp.max(jnp.abs(ds - ds_ref)))
                         / max(scale_s, 1e-12))
                err_f = (float(jnp.max(jnp.abs(df - df_ref)))
                         / max(scale_f, 1e-12))
                sec = time_variant(pallas_bwd)
                entry = {"ms": round(sec * 1e3, 2), "fold": fold,
                         "rel_err_dsrc": round(err_s, 6),
                         "rel_err_dflow": round(err_f, 6)}
                break
            except Exception as e:
                _log(f"big_band_{prec} fold={fold} failed: {repr(e)[:160]}")
                entry = {"ms": None, "fold": fold,
                         "error": repr(e)[:200]}
        results[prec] = entry
        print(json.dumps({"variant": f"big_band_{prec}", **entry}),
              flush=True)

    xla_ms = results["xla_vjp"]["ms"]
    ok_precs = [p for p in ("bf16x3", "bf16x2", "bf16")
                if results[p].get("ms") is not None]
    if ok_precs:
        best = min(ok_precs, key=lambda p: results[p]["ms"])
        decision = best if results[best]["ms"] < xla_ms else "xla_vjp"
        best_entry = {best: results[best]}
    else:
        decision, best_entry = "xla_vjp", {"all_variants_failed": results}
    print(json.dumps({
        "decision": decision,
        "xla_ms": xla_ms,
        "best_pallas": best_entry,
        "note": "set dfmir_tpu.ops.warp_pallas.BWD_BIG_PRECISION accordingly",
    }), flush=True)


if __name__ == "__main__":
    main()
