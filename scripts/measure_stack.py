"""Is the z-tap STACK (not the conv) the zdecomp UNet's hidden cost?

measure_convpack.py timed bare conv2d on pre-stacked inputs at 38-64
TFLOP/s, while the in-graph UNet runs its convs ~5x slower
(unet_fwd 84.6 ms vs ~15 ms of isolated-conv time, and the
optimization-barrier A/B refuted the fusion-deopt hypothesis).  This
harness times, per real decoder shape, (a) bare conv2d on a pre-stacked
(kz*C)-channel input, (b) the full conv3d_zdecomp (pad + 3-tap stack +
reshape + conv2d) from the 5-D input, and (c) the stack alone — so the
stack's true cost is measured directly rather than inferred.

Usage: python scripts/measure_stack.py [--iters 8]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from bench import _measure_chained, _log
    from dfmir_tpu.nets.layers import conv3d_zdecomp

    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)

    def conv2d(x, k):
        return lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def stack_only(x5):
        B, D, H, W, C = x5.shape
        xp = jnp.pad(x5, [(0, 0), (1, 1), (0, 0), (0, 0), (0, 0)])
        taps = [xp[:, t:t + D] for t in range(3)]
        return jnp.stack(taps, axis=4).reshape(B * D, H, W, 3 * C)

    # real 160^3 decoder shapes (Ci is the 5-D channel count)
    shapes = [(160, 34, 32),   # dec extra conv 1 (dec out ++ input)
              (160, 32, 16),   # dec extra conv 2
              (160, 16, 16)]   # dec extra conv 3
    for (S, Ci, Co) in shapes:
        x5 = jnp.asarray(rng.standard_normal((1, S, S, S, Ci)), dt)
        x2 = jnp.asarray(rng.standard_normal((S, S, S, 3 * Ci)), dt)
        k5 = jnp.asarray(rng.standard_normal((3, 3, 3, Ci, Co)) * 0.03, dt)
        k2 = jnp.asarray(
            np.transpose(np.asarray(k5, np.float32), (1, 2, 0, 3, 4)
                         ).reshape(3, 3, 3 * Ci, Co), dt)
        gf = 2 * S**3 * 27 * Ci * Co / 1e9

        def run(fn, *ops):
            def step(carry):
                y = fn(*carry)
                upd = jnp.sum(jnp.ravel(y)[:1]).astype(dt) * dt.type(1e-6)
                return tuple(o + upd if i == 0 else o
                             for i, o in enumerate(carry))
            return _measure_chained(step, ops, args.iters)

        _log(f"shape {S}^3 {Ci}->{Co}")
        t_conv = run(conv2d, x2, k2)
        t_zdec = run(
            lambda a, b: conv3d_zdecomp(
                a, b, (1, 1, 1), ((1, 1), (1, 1), (1, 1))), x5, k5)
        t_stack = run(lambda a: stack_only(a), x5)
        print(json.dumps({
            "shape": f"{S}^3_{Ci}to{Co}", "gflop": round(gf, 1),
            "conv2d_prestacked_ms": round(t_conv * 1e3, 2),
            "zdecomp_full_ms": round(t_zdec * 1e3, 2),
            "stack_only_ms": round(t_stack * 1e3, 2),
            "stack_gb": round(S**3 * 3 * Ci * dt.itemsize * 2 / 1e9, 2),
            "stack_gbps": round(S**3 * 3 * Ci * dt.itemsize * 2 / 1e9
                                / max(t_stack, 1e-9), 0),
        }), flush=True)


if __name__ == "__main__":
    main()
