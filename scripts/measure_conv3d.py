"""Is XLA's conv3d the 3-D UNet's 3.9%-MFU problem?  Times a raw 3x3x3
conv at UNet-representative shapes against the z-decomposed equivalent
(one conv2d over z-shift-concatenated channels: y[:,d] = sum_kz
conv2d(x[:,d+kz-1], K[kz]) — same math, (B*D, H, W, 3*Cin) layout feeds
the MXU as a well-tuned 2-D conv).  Chained methodology from bench.py.

Usage: python scripts/measure_conv3d.py [--iters 8]
Prints one JSON line per shape.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--bwd", action="store_true",
                    help="also time the zdecomp VJP per shape and add "
                         "the 160^3 flops-dominant decoder shapes")
    ap.add_argument("--shapes", default=None,
                    help="override shape list: 'D,H,W,Ci,Co[;...]'")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from bench import _measure_chained, _log

    dt = jnp.dtype(args.dtype)

    def conv3d(x, k):
        return lax.conv_general_dilated(
            x, k, window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    def conv3d_zdecomp(x, k):
        B, D, H, W, C = x.shape
        co = k.shape[-1]
        xp = jnp.pad(x, [(0, 0), (1, 1), (0, 0), (0, 0), (0, 0)])
        # (B, D, 3, H, W, C): the three z-taps per output slice
        shifts = jnp.stack([xp[:, i:i + D] for i in range(3)], axis=2)
        x2 = shifts.transpose(0, 1, 3, 4, 2, 5).reshape(B * D, H, W, 3 * C)
        # kernel (kz,ky,kx,ci,co) -> (ky,kx, kz*ci, co)
        k2 = k.transpose(1, 2, 0, 3, 4).reshape(3, 3, 3 * C, co)
        y = lax.conv_general_dilated(
            x2, k2, window_strides=(1, 1), padding=[(1, 1)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y.reshape(B, D, H, W, co)

    rng = np.random.default_rng(0)
    # (D,H,W, Cin, Cout): the UNet's hot shapes (encoder L0/L1, decoder
    # full-res extras).  --bwd adds the 160^3 flops-dominant shapes and
    # times the full VJP per shape (fwd+bwd, grads wrt x and k) — the
    # attribution harness for the 170 ms unet fwdbwd (VERDICT r4 #4).
    shapes = [
        (160, 160, 160, 2, 16),
        (80, 80, 80, 16, 32),
        (160, 160, 160, 18, 16),   # decoder full-res skip-concat conv
        (40, 40, 40, 32, 32),
    ]
    if args.bwd:
        shapes += [
            (160, 160, 160, 34, 16),  # full-res extra conv (dec++input)
            (160, 160, 160, 16, 16),  # full-res extra conv 2
            (80, 80, 80, 64, 32),     # decoder skip-concat conv, L1
        ]
    if args.shapes:
        shapes = [tuple(int(v) for v in s.split(","))
                  for s in args.shapes.split(";")]
    for (D, H, W, Ci, Co) in shapes:
        x = jnp.asarray(rng.standard_normal((1, D, H, W, Ci)), dt)
        k = jnp.asarray(rng.standard_normal((3, 3, 3, Ci, Co)) * 0.05, dt)

        # exactness first (f32 on small slice to bound cast noise)
        xa = x[:, :16].astype(jnp.float32)
        ka = k.astype(jnp.float32)
        err = float(jnp.max(jnp.abs(
            conv3d(xa, ka) - conv3d_zdecomp(xa, ka))))

        gf = 2 * D * H * W * Ci * Co * 27 / 1e9

        def run(fn):
            def step(carry):
                xx, kk = carry
                y = fn(xx, kk)
                upd = jnp.sum(jnp.ravel(y)[:1]).astype(dt) * dt.type(1e-6)
                return xx + upd, kk
            return _measure_chained(step, (x, k), args.iters)

        def run_fwdbwd(fn):
            def step(carry):
                xx, kk = carry
                def scalar(args_):
                    # sum(y^2): a nonlinear scalar keeps the cotangent
                    # data-dependent so the backward cannot be
                    # constant-folded (sum(y)'s ones-cotangent lets XLA
                    # reduce wgrad to a windowed sum)
                    x_, k_ = args_
                    y = fn(x_, k_).astype(jnp.float32)
                    return jnp.sum(jnp.square(y))
                dx, dk = jax.grad(scalar)((xx, kk))
                # tanh-bounded feedback (see measure_convpack.py): keeps
                # both grads live without compounding drift -> NaN
                return (xx + (jnp.tanh(jnp.ravel(dx)[0]) * 1e-6
                              ).astype(dt),
                        kk + (jnp.tanh(jnp.ravel(dk)[0]) * 1e-6
                              ).astype(dt))
            return _measure_chained(step, (x, k), args.iters)

        _log(f"shape {D}^3 {Ci}->{Co}")
        t3 = run(conv3d)
        t2 = run(conv3d_zdecomp)
        rec = {
            "shape": f"{D}x{H}x{W}_{Ci}to{Co}", "gflop": round(gf, 1),
            "conv3d_ms": round(t3 * 1e3, 2),
            "zdecomp_ms": round(t2 * 1e3, 2),
            "speedup": round(t3 / t2, 2),
            "conv3d_tflops": round(gf / t3 / 1e3, 1),
            "zdecomp_tflops": round(gf / t2 / 1e3, 1),
            "max_abs_err_f32": err,
        }
        if args.bwd:
            tb2 = run_fwdbwd(conv3d_zdecomp)
            rec.update({
                "zdecomp_fwdbwd_ms": round(tb2 * 1e3, 2),
                "zdecomp_bwd_ms": round((tb2 - t2) * 1e3, 2),
                "zdecomp_bwd_tflops": round(2 * gf / max(tb2 - t2, 1e-9)
                                            / 1e3, 1),
            })
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
