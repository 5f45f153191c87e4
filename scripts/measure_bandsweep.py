"""Band-layout sweep for the 3-D banded warp FORWARD (VERDICT r4 #7).

The cascade's selection-matmul MXU work scales with band AREA (bz*by),
and the shipped cascade jumps tiny(8x32) -> small(16x32) -> big(32x48):
a realistic ±15-voxel registration field that overflows the small band
pays the full 32x48 even if its per-tile spans would fit something far
smaller.  This harness (a) measures the per-tile z/y span distribution
of the WARPFWD_r04 reference field at --size, and (b) times
``warp3d_banded`` at every candidate (bz, by) that fits it, so the
cascade's band menu can be tuned to measured spans instead of guesses.

Semantics under test: the reference SpatialTransformer
(/root/reference/models/voxelmorph/torchvoxelmorph/layers.py:30-48).

Usage: python scripts/measure_bandsweep.py [--size 160] [--amp 5.0]
Prints one JSON line per candidate band + a span-distribution record.
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
    ap.add_argument("--amp", type=float, default=5.0,
                    help="lo-res N(0,1) multiplier (5.0 = the "
                         "WARPFWD_r04 ±15-voxel field)")
    ap.add_argument("--bands", default="8,32;16,32;16,48;24,32;24,40;"
                    "24,48;32,48")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _measure_chained, _log
    import dfmir_tpu.ops.warp_pallas as wp
    from dfmir_tpu.ops.integrate import resize_linear

    S = args.size
    rng = np.random.default_rng(0)
    lo2 = rng.standard_normal((2, S // 16, S // 16, S // 16, 3)) * args.amp
    flow = resize_linear(jnp.asarray(lo2, jnp.float32), (S, S, S))
    pair = jnp.asarray(rng.standard_normal((2, S, S, S, 1)), jnp.float32)

    # --- span distribution (per output row-tile, the kernel's grid unit)
    D = H = W = S
    TILE = wp.TILE
    zs = np.asarray(jax.lax.broadcasted_iota(jnp.float32, (D, H, W), 0)
                    [None] + flow[..., 0])
    ys = np.asarray(jax.lax.broadcasted_iota(jnp.float32, (D, H, W), 1)
                    [None] + flow[..., 1])
    B = zs.shape[0]
    n_t = D * H // TILE

    def spans(coord, lim, quant):
        c0 = np.clip(np.floor(np.clip(coord, -2.0, lim + 1)), 0,
                     lim - 1).astype(np.int64)
        c1 = np.clip(c0 + 1, 0, lim - 1)
        t0 = c0.reshape(B, n_t, TILE * W)
        t1 = c1.reshape(B, n_t, TILE * W)
        lo = t0.min(-1)
        if quant:
            lo = (lo // 8) * 8
        return (t1.max(-1) - lo + 1).ravel()

    sz = spans(zs, D, False)
    sy = spans(ys, H, True)
    dist = {
        "what": "per-tile source-span distribution (rows needed in VMEM)",
        "size": S, "amp": args.amp, "n_tiles": int(sz.size),
        "z_span_q50_q90_q99_max": [int(np.quantile(sz, q))
                                   for q in (0.5, 0.9, 0.99)] + [
                                       int(sz.max())],
        "y_span_q50_q90_q99_max": [int(np.quantile(sy, q))
                                   for q in (0.5, 0.9, 0.99)] + [
                                       int(sy.max())],
    }
    print(json.dumps(dist), flush=True)

    results = [dist]
    for cand in args.bands.split(";"):
        bz, by = (int(v) for v in cand.split(","))
        fits = bool(np.asarray(wp._band3d_ok(flow, D, H, bz, by)))
        rec = {"band": f"{bz}x{by}", "area": bz * by, "fits": fits}
        if not fits:
            print(json.dumps(rec), flush=True)
            results.append(rec)
            continue
        try:
            def step(carry):
                p, fl = carry
                o, ok = wp.warp3d_banded(p, fl, bz=bz, by=by)
                return p + o * 1e-6, fl

            _log(f"band {bz}x{by}: timing")
            sec = _measure_chained(step, (pair, flow), args.iters)
            rec["ms"] = round(sec * 1e3, 2)
        except Exception as e:   # no feasible lane-fold / Mosaic reject
            rec["error"] = f"{type(e).__name__}: {e}"[:300]
        print(json.dumps(rec), flush=True)
        results.append(rec)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
