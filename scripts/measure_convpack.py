"""Lane-occupancy attack on the 3-D UNet's low-C_out convs (VERDICT r4 #4).

The zdecomp conv2d at the volumetric UNet's shapes puts C_out=16..32 on
the MXU matmul's N axis — 16/128 lanes — and measures 13.5-14.5 TFLOP/s
(measure_conv3d.py).  Two experiments, both exact reorderings:

1. ``occupancy``: the same conv at C_out 16/32/64/128 (flops held
   comparable) — is achieved TFLOP/s linear in lane occupancy?  If yes,
   packing output pixels into lanes pays.
2. ``wpack``: conv2d_wpack(p) packs p width-neighbors into channels with
   an offset-by-(-1) input packing so the 3-tap stride-1 kernel spans
   exactly TWO packed columns (kernel (3,2,pC,pCo), zero-filled where a
   tap falls outside an offset's 3-window).  Flops grow 2p/3 x, lanes
   grow p x -> net win iff TFLOP/s scales superlinearly vs the flop
   bloat.  Timed fwd and fwd+bwd at the UNet's zdecomp hot shapes,
   exactness-checked against lax conv.

Replaces the op at
/root/reference/models/voxelmorph/torchvoxelmorph/networks.py:99-106.

Usage: python scripts/measure_convpack.py [--mode occupancy|wpack|all]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from dfmir_tpu.nets.layers import conv2d_wpack  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--mode", default="all",
                    choices=["occupancy", "wpack", "all"])
    ap.add_argument("--packs", default="2,4,8")
    ap.add_argument("--check_only", action="store_true",
                    help="run the f32 exactness checks and exit (CPU-safe)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)

    def conv2d(x, k):
        return lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # --- exactness (f32)
    xc = jnp.asarray(rng.standard_normal((2, 16, 24, 5)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((3, 3, 5, 7)), jnp.float32)
    ref = conv2d(xc, kc)
    for p in (2, 4, 8):
        err = float(jnp.max(jnp.abs(conv2d_wpack(xc, kc, p) - ref)))
        print(json.dumps({"check": f"wpack{p}", "max_abs_err": err}),
              flush=True)
        assert err < 1e-4, (p, err)
    if args.check_only:
        return

    from bench import _measure_chained, _log

    def run(fn, x, k):
        def step(carry):
            xx, kk = carry
            y = fn(xx, kk)
            upd = jnp.sum(jnp.ravel(y)[:1]).astype(dt) * dt.type(1e-6)
            return xx + upd, kk
        return _measure_chained(step, (x, k), args.iters)

    def run_fwdbwd(fn, x, k):
        def step(carry):
            xx, kk = carry
            def scalar(args_):
                # sum(y^2), NOT sum(y): a linear scalar makes the
                # cotangent a constant and XLA simplifies the whole
                # backward away (wgrad of a ones-cotangent is a windowed
                # sum) — measured as a bogus 0.4 ms "backward"
                x_, k_ = args_
                y = fn(x_, k_).astype(jnp.float32)
                return jnp.sum(jnp.square(y))
            dx, dk = jax.grad(scalar)((xx, kk))
            # tanh-bounded feedback: keeps both grads live in the chain
            # without drifting the operands (unbounded dk[0] feedback
            # compounds over the loop and overflows to NaN)
            return (xx + (jnp.tanh(jnp.ravel(dx)[0]) * 1e-6).astype(dt),
                    kk + (jnp.tanh(jnp.ravel(dk)[0]) * 1e-6).astype(dt))
        return _measure_chained(step, (x, k), args.iters)

    if args.mode in ("occupancy", "all"):
        # fixed M = 160*160 rows x 160 batch, K = 9*48; N sweeps
        for co in (16, 32, 64, 128):
            x = jnp.asarray(rng.standard_normal((160, 160, 160, 48)), dt)
            k = jnp.asarray(rng.standard_normal((3, 3, 48, co)) * 0.05, dt)
            gf = 2 * 160**3 * 9 * 48 * co / 1e9
            _log(f"occupancy co={co}")
            t = run(conv2d, x, k)
            print(json.dumps({
                "occupancy_co": co, "gflop": round(gf, 1),
                "ms": round(t * 1e3, 2),
                "tflops": round(gf / t / 1e3, 1),
                "lane_pct": round(100 * min(co, 128) / 128, 1),
            }), flush=True)

    if args.mode in ("wpack", "all"):
        # the UNet's zdecomp hot shapes: (B*D, H, W, kz*Cin) -> Cout
        shapes = [(160, 160, 160, 102, 16),   # full-res extra conv (34ch)
                  (160, 160, 160, 48, 16),    # full-res extra conv 2
                  (80, 80, 80, 192, 32)]      # decoder L1 skip conv (64ch)
        packs = [int(v) for v in args.packs.split(",")]
        for (Bd, H, W, Ci, Co) in shapes:
            x = jnp.asarray(rng.standard_normal((Bd, H, W, Ci)), dt)
            k = jnp.asarray(rng.standard_normal((3, 3, Ci, Co)) * 0.03, dt)
            gf = 2 * Bd * H * W * 9 * Ci * Co / 1e9
            _log(f"wpack shape {Bd}x{H}x{W} {Ci}->{Co}: baseline")
            t0 = run(conv2d, x, k)
            tb0 = run_fwdbwd(conv2d, x, k)
            rec = {"shape": f"{Bd}x{H}x{W}_{Ci}to{Co}", "gflop": round(gf, 1),
                   "conv2d_ms": round(t0 * 1e3, 2),
                   "conv2d_tflops": round(gf / t0 / 1e3, 1),
                   "conv2d_fwdbwd_ms": round(tb0 * 1e3, 2)}
            for p in packs:
                _log(f"wpack p={p}")
                fn = functools.partial(conv2d_wpack, p=p)
                fn = lambda xx, kk, _p=p: conv2d_wpack(xx, kk, _p)
                tp = run(fn, x, k)
                tbp = run_fwdbwd(fn, x, k)
                rec[f"wpack{p}_ms"] = round(tp * 1e3, 2)
                rec[f"wpack{p}_fwdbwd_ms"] = round(tbp * 1e3, 2)
                rec[f"wpack{p}_speedup"] = round(t0 / tp, 2)
                rec[f"wpack{p}_fwdbwd_speedup"] = round(tb0 / tbp, 2)
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
