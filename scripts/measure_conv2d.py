"""2-D conv MXU-utilization attribution at the flagship's hot shapes.

The joint train step's forward runs at ~26% of v5e bf16 peak
(README attribution: 57.8 ms fwd of a 186 ms step at 256^2 batch 8) and
the FLOPs live in the ResnetGenerator's 9 residual blocks — 18 convs of
3x3 256->256 at 64^2 (/root/reference/models/networks.py:1164-1221).
This script measures, on the real chip, where that utilization goes and
whether any alternative lowering of the hot conv beats XLA's:

  conv_hot        bare 3x3 256->256 valid conv on the pre-padded 66^2 input
                  (exactly the resblock conv) — the XLA baseline
  conv_hot_same   same math as a zero-SAME conv on 64^2 (lowering probe)
  conv_shift9     shift-concat the 9 taps into channels -> one 1x1 conv
                  (the 2-D analog of nets/layers.conv3d_zdecomp)
  conv_im2col     same but as one explicit (B*H*W, 9C) @ (9C, C) matmul
  matmul_peak     a pure (B*64^2, 2304)x(2304, 256) matmul — the MXU
                  ceiling for this op's shape
  resblock        pad+conv+norm+relu+pad+conv+norm+residual (the full
                  block, measures the instance-norm/pad overhead share)
  resblock_chain  9 blocks back-to-back (the real tower)
  netg_fwd        whole ResnetGenerator forward at 256^2

Each row reports ms/step and achieved TFLOP/s (conv FLOPs only).  Chained
timing via bench._measure_chained (tunnel-safe).  Prints one JSON dict.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--stages", default="conv_hot,conv_hot_same,conv_shift9,"
                    "conv_im2col,matmul_peak,resblock,resblock_chain,"
                    "netg_fwd")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _measure_chained, _log

    B, C, S = args.batch, 256, 64
    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)

    def mk(shape, scale=0.05):
        return jnp.asarray(rng.standard_normal(shape) * scale, dt)

    x_pad = mk((B, S + 2, S + 2, C))      # pre-padded resblock input
    x = mk((B, S, S, C))
    w33 = mk((3, 3, C, C))
    w11 = jnp.reshape(jnp.transpose(w33, (2, 0, 1, 3)), (1, 1, 9 * C, C))
    wmm = jnp.reshape(w11, (9 * C, C))

    conv_flops = 2.0 * B * S * S * 9 * C * C

    def conv_valid(xp, w):
        return jax.lax.conv_general_dilated(
            xp, w, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def conv_same(xi, w):
        return jax.lax.conv_general_dilated(
            xi, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def shift9(xp):
        # 9 shifted SxS views of the padded (S+2)^2 input, tap-major concat
        # matching w11's (C-major within tap) layout.
        taps = [xp[:, dy:dy + S, dx:dx + S, :]
                for dy in range(3) for dx in range(3)]
        return jnp.concatenate(taps, axis=-1)

    stages = {}

    def stage_conv_hot():
        def step(carry):
            xp, = carry
            y = conv_valid(xp, w33)
            return (xp + jnp.pad(y, [(0, 0), (1, 1), (1, 1), (0, 0)])
                    * jnp.asarray(1e-3, dt),)
        return step, (x_pad,), conv_flops

    def stage_conv_hot_same():
        def step(carry):
            xi, = carry
            y = conv_same(xi, w33)
            return (xi + y * jnp.asarray(1e-3, dt),)
        return step, (x,), conv_flops

    def stage_conv_shift9():
        def step(carry):
            xp, = carry
            y = jax.lax.conv_general_dilated(
                shift9(xp), w11, (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return (xp + jnp.pad(y, [(0, 0), (1, 1), (1, 1), (0, 0)])
                    * jnp.asarray(1e-3, dt),)
        return step, (x_pad,), conv_flops

    def stage_conv_im2col():
        def step(carry):
            xp, = carry
            cols = shift9(xp).reshape(B * S * S, 9 * C)
            y = (cols @ wmm).reshape(B, S, S, C)
            return (xp + jnp.pad(y, [(0, 0), (1, 1), (1, 1), (0, 0)])
                    * jnp.asarray(1e-3, dt),)
        return step, (x_pad,), conv_flops

    def stage_matmul_peak():
        a = mk((B * S * S, 9 * C))

        def step(carry):
            ai, = carry
            y = ai @ wmm
            return (ai + jnp.tile(y, (1, 9)) * jnp.asarray(1e-3, dt),)
        return step, (a,), conv_flops

    def stage_conv7in():
        # the generator's first conv: 7x7, C_in=1 -> 64 at 256^2.  NHWC
        # with C_in=1 puts ONE real lane in the contraction operand —
        # XLA's conv lowering cannot fill the MXU (K = 49*1).
        xi = mk((B, 256, 256, 1))
        w7 = mk((7, 7, 1, 64))
        f = 2.0 * B * 256 * 256 * 49 * 1 * 64

        def step(carry):
            x7, = carry
            y = jax.lax.conv_general_dilated(
                x7, w7, (1, 1), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return (x7 + jnp.mean(y, axis=-1, keepdims=True)
                    * jnp.asarray(1e-3, dt),)
        return step, (xi,), f

    def stage_conv7in_s2d():
        # same op as an explicit 49-tap im2col: pad, 49 shifted views
        # concat into channels (K=49 matmul operand), one 1x1 conv
        xi = mk((B, 256, 256, 1))
        w7 = mk((7, 7, 1, 64))
        w49 = jnp.reshape(w7, (1, 1, 49, 64))
        f = 2.0 * B * 256 * 256 * 49 * 1 * 64

        def step(carry):
            x7, = carry
            xp = jnp.pad(x7, [(0, 0), (3, 3), (3, 3), (0, 0)])
            taps = jnp.concatenate(
                [xp[:, dy:dy + 256, dx:dx + 256, :]
                 for dy in range(7) for dx in range(7)], axis=-1)
            y = jax.lax.conv_general_dilated(
                taps, w49, (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return (x7 + jnp.mean(y, axis=-1, keepdims=True)
                    * jnp.asarray(1e-3, dt),)
        return step, (xi,), f

    def stage_conv7out():
        # the generator's last conv: 7x7, 64 -> 1 at 256^2 (N=1 lane)
        xi = mk((B, 256, 256, 64))
        w7 = mk((7, 7, 64, 1))
        f = 2.0 * B * 256 * 256 * 49 * 64 * 1

        def step(carry):
            x7, = carry
            y = jax.lax.conv_general_dilated(
                x7, w7, (1, 1), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return (x7 + y * jnp.asarray(1e-3, dt),)
        return step, (xi,), f

    def stage_conv7out_wide():
        # 64 -> 1 rewritten as 7 row-taps of a (7*64 -> 1)... simplest
        # competitive alternative: keep HWIO but let XLA see it as a
        # K=49*64 matmul via im2col on the 7 y-shifts only (x handled by
        # a strided reshape is not free; this measures the 49-tap concat)
        xi = mk((B, 256, 256, 64))
        w7 = mk((7, 7, 64, 1))
        wmm1 = jnp.reshape(w7, (1, 1, 49 * 64, 1))
        f = 2.0 * B * 256 * 256 * 49 * 64 * 1

        def step(carry):
            x7, = carry
            xp = jnp.pad(x7, [(0, 0), (3, 3), (3, 3), (0, 0)])
            taps = jnp.concatenate(
                [xp[:, dy:dy + 256, dx:dx + 256, :]
                 for dy in range(7) for dx in range(7)], axis=-1)
            y = jax.lax.conv_general_dilated(
                taps, wmm1, (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return (x7 + y * jnp.asarray(1e-3, dt),)
        return step, (xi,), f

    def stage_conv7out_tapdot():
        # 64 -> 1 with the channel contraction FIRST: one matmul
        # (B*HW, 64) @ (64, 49) puts the MXU's N at 49 tap-planes instead
        # of 1 output channel; the 49 single-channel partial planes then
        # shift-add on the VPU (conv7out measured 0.61 TFLOP/s = N=1 lane
        # starvation; this reorders the same arithmetic)
        xi = mk((B, 256, 256, 64))
        w7 = mk((7, 7, 64, 1))
        # wt[c, k] for tap k=(dy*7+dx)
        wt = jnp.transpose(jnp.reshape(w7, (49, 64)), (1, 0))
        f = 2.0 * B * 256 * 256 * 49 * 64 * 1

        def step(carry):
            x7, = carry
            z = jnp.einsum("bhwc,ck->bhwk", x7, wt)   # (B,256,256,49)
            zp = jnp.pad(z, [(0, 0), (3, 3), (3, 3), (0, 0)])
            y = jnp.zeros((B, 256, 256), z.dtype)
            for k in range(49):
                dy, dx = divmod(k, 7)
                # output[p] sums tap k of input p+delta: plane k shifted
                y = y + zp[:, dy:dy + 256, dx:dx + 256, k]
            return (x7 + y[..., None] * jnp.asarray(1e-3, dt),)
        return step, (xi,), f

    def stage_resblock():
        from dfmir_tpu.nets.resnet_gen import ResnetBlock
        blk = ResnetBlock(C)
        params = jax.eval_shape(
            lambda: blk.init(jax.random.PRNGKey(0), x))["params"]
        params = jax.tree.map(
            lambda s: jnp.asarray(
                rng.standard_normal(s.shape) * 0.02, s.dtype), params)

        def step(carry):
            xi, = carry
            y = blk.apply({"params": params}, xi)
            return ((y * jnp.asarray(0.999, y.dtype)).astype(xi.dtype),)
        return step, (x,), 2 * conv_flops

    def stage_resblock_chain():
        from dfmir_tpu.nets.resnet_gen import ResnetBlock
        blk = ResnetBlock(C)
        keys = list(range(9))
        ptrees = []
        for _ in keys:
            p = jax.eval_shape(
                lambda: blk.init(jax.random.PRNGKey(0), x))["params"]
            ptrees.append(jax.tree.map(
                lambda s: jnp.asarray(
                    rng.standard_normal(s.shape) * 0.02, s.dtype), p))

        def step(carry):
            xi, = carry
            h = xi
            for p in ptrees:
                h = blk.apply({"params": p}, h).astype(xi.dtype)
            return ((h * jnp.asarray(0.999, h.dtype)).astype(xi.dtype),)
        return step, (x,), 18 * conv_flops

    def stage_netg_fwd():
        from dfmir_tpu.nets.resnet_gen import ResnetGenerator
        gen = ResnetGenerator()
        img = jnp.asarray(rng.standard_normal((B, 256, 256, 1)), jnp.float32)
        imgc = img.astype(dt)
        params = jax.eval_shape(
            lambda: gen.init(jax.random.PRNGKey(0), imgc))["params"]
        params = jax.tree.map(
            lambda s: jnp.asarray(
                rng.standard_normal(s.shape) * 0.02, s.dtype), params)
        # conv FLOPs of the whole generator at 256^2 (dominant terms):
        # 18 resblock convs at 64^2 + down/up convs + 7x7 ends
        f = 18 * conv_flops
        f += 2 * B * 256 * 256 * 49 * 1 * 64 * 2        # two 7x7 convs
        f += 2 * B * 256 * 256 * 9 * 64 * 128           # down1 (stride 1 + blur)
        f += 2 * B * 128 * 128 * 9 * 128 * 256          # down2
        f += 2 * B * 128 * 128 * 9 * 256 * 128          # up1
        f += 2 * B * 256 * 256 * 9 * 128 * 64           # up2

        def step(carry):
            xi, = carry
            y = gen.apply({"params": params}, xi.astype(dt))
            return (xi + y.astype(jnp.float32) * 1e-3,)
        return step, (img,), f

    def stage_netr_fwd():
        # the register graph's other half: 2-D VxmDense at 256^2 in
        # registration mode (unet + flow head + vecint + full-res warp).
        # Bisects the CONV2D_ENDS regression between netG and netR.
        from dfmir_tpu.nets.vxm import VxmDense
        net = VxmDense(ndims=2, compute_dtype=args.dtype)
        img = jnp.asarray(rng.standard_normal((B, 256, 256, 1)),
                          jnp.float32)
        tgt = jnp.asarray(rng.standard_normal((B, 256, 256, 1)),
                          jnp.float32)
        params = jax.eval_shape(
            lambda: net.init(jax.random.PRNGKey(0), img, tgt))["params"]
        params = jax.tree.map(
            lambda s: jnp.asarray(
                rng.standard_normal(s.shape) * 0.02, s.dtype), params)

        def step(carry):
            xi, = carry
            y, flow = net.apply({"params": params}, xi, tgt,
                                registration=True)
            return (xi + y.astype(jnp.float32) * 1e-3,)
        return step, (img,), None

    table = {
        "conv_hot": stage_conv_hot, "conv_hot_same": stage_conv_hot_same,
        "conv_shift9": stage_conv_shift9, "conv_im2col": stage_conv_im2col,
        "matmul_peak": stage_matmul_peak, "resblock": stage_resblock,
        "resblock_chain": stage_resblock_chain, "netg_fwd": stage_netg_fwd,
        "conv7in": stage_conv7in, "conv7in_s2d": stage_conv7in_s2d,
        "conv7out": stage_conv7out, "conv7out_wide": stage_conv7out_wide,
        "conv7out_tapdot": stage_conv7out_tapdot,
        "netr_fwd": stage_netr_fwd,
    }
    for name in args.stages.split(","):
        try:
            step, carry, flops = table[name]()
            _log(f"stage {name}")
            sec = _measure_chained(step, carry, args.iters)
            stages[f"{name}_ms"] = round(sec * 1e3, 4)
            if flops is not None:
                stages[f"{name}_tflops"] = round(flops / sec / 1e12, 2)
            _log(f"# {name}: {stages[f'{name}_ms']} ms, "
                 f"{stages.get(f'{name}_tflops', '-')} TFLOP/s")
        except Exception as e:
            stages[f"{name}_error"] = repr(e)[:200]
            _log(f"# {name} FAILED: {repr(e)[:200]}")

    stages["batch"] = B
    stages["dtype"] = args.dtype
    print(json.dumps(stages), flush=True)


if __name__ == "__main__":
    main()
