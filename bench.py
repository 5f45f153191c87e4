"""Headline benchmark: registered 256x256 pairs/sec on one chip.

Measures the full inference path of the flagship registration model —
translation (ResnetGenerator) + registration (VxmDense, scaling-and-squaring
integration) + dense warp — jit-compiled end-to-end, matching the reference
workload (256x256 grayscale pair; /root/reference/test.py:77-81).

Timing methodology: the axon TPU tunnel neither serializes the execution
queue nor makes ``block_until_ready`` wait for real completion, bulk D2H is
very slow, and identical (program, inputs) executions are served from a
cache — so wall-timing individual dispatches is meaningless.  Instead we jit
a program that runs ``n`` chained steps (each step's input depends on the
previous step's output, via lax.fori_loop) and fetch a single scalar; the
data dependence forces sequential execution on device and the scalar fetch
forces completion.  Each trial perturbs the input (device-side) to defeat
the result cache, and per-step time is the slope between a short and a long
chain — (t_long - t_short) / (n_long - n_short) — which cancels the
dispatch+fetch round-trip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is relative to the PyTorch-CPU reference throughput recorded in
BENCH_BASELINE.json (the reference publishes no numbers of its own).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time


def _measure_chained(step_fn, init_carry, iters):
    """Time `iters` data-chained steps inside one jitted fori_loop; returns
    seconds/step via the slope between a short and a long chain."""
    import functools
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    @functools.partial(jax.jit, static_argnums=2)
    def chained(carry, salt, n):
        carry = jax.tree.map(
            lambda x: x * (1.0 + salt) if x.dtype == jnp.float32 else x,
            carry)

        def body(_, c):
            return step_fn(c)

        out = lax.fori_loop(0, n, body, carry)
        leaves = [l for l in jax.tree.leaves(out)
                  if jnp.issubdtype(l.dtype, jnp.floating)]
        return sum(jnp.sum(jnp.ravel(l)[:1]) for l in leaves)

    salt = [0]

    def run(n):
        salt[0] += 1
        t0 = time.perf_counter()
        v = float(chained(init_carry, jnp.float32(salt[0] * 1e-5), n))
        t1 = time.perf_counter()
        assert np.isfinite(v), v
        return t1 - t0

    n_short, n_long = 2, 12
    run(n_short)
    run(n_long)
    t_short = min(run(n_short) for _ in range(3))
    t_long = min(run(n_long) for _ in range(3))
    return (t_long - t_short) / (n_long - n_short)


def _bench_warp3d(args):
    """3-D trilinear warp kernel latency on a 160^3 volume (BASELINE.md
    metric: '3D warp kernel ms').

    The flow is a SMOOTH random deformation (low-res noise trilinearly
    upsampled, ~5-voxel displacements) — representative of the dense
    registration fields this op actually warps with (VecInt outputs are
    smooth by construction).  An iid-noise flow is not a registration
    field and structurally defeats any locality-exploiting implementation
    (it forces the banded Pallas kernel's runtime fallback), so it would
    benchmark the fallback, not the kernel.  The JSON reports which path
    engaged (``pallas_ok``)."""
    import jax.numpy as jnp
    import numpy as np

    from dfmir_tpu.ops import warp
    from dfmir_tpu.ops.integrate import resize_linear

    rng = np.random.default_rng(0)
    S = args.size if args.size != 256 else 160
    src = jnp.asarray(rng.standard_normal((1, S, S, S, 1)), jnp.float32)
    lo = rng.standard_normal((1, S // 16, S // 16, S // 16, 3)) * 5.0
    flow = resize_linear(jnp.asarray(lo, jnp.float32), (S, S, S))

    pallas_ok = None
    try:
        from dfmir_tpu.ops import warp_pallas
        if warp_pallas.supports(src, flow, "bilinear"):
            ok = (warp_pallas._band3d_ok(flow, S, S, warp_pallas.BZ,
                                         warp_pallas.BY)
                  | warp_pallas._band3d_ok(flow, S, S, warp_pallas.BZ2,
                                           warp_pallas.BY2))
            pallas_ok = bool(ok)
    except Exception:
        pallas_ok = False

    def step(carry):
        s, f = carry
        out = warp(s, f, mode="bilinear")
        return out, f  # feed warped output back in: chains the gathers

    sec = _measure_chained(step, (src, flow), args.iters)
    return {"metric": f"warp3d_{S}cube_trilinear_ms",
            "value": round(sec * 1e3, 3), "unit": "ms", "vs_baseline": None,
            "extra": {"pallas_ok": pallas_ok}}


def _bench_train3d(args):
    """Full 3-D VxmEngine training step (NCC + smooth, Adam) on a 160^3
    volume pair — the voxelmorph-side workload.  Runs the Pallas warp
    custom VJP end-to-end (fwd cascade + small-band bwd)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dfmir_tpu.engine.vxm_engine import VxmConfig, VxmEngine

    S = args.size if args.size != 256 else 160
    cfg = VxmConfig(vol_size=S, batch_size=1, compute_dtype=args.dtype)
    eng = VxmEngine(cfg)
    state = eng.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    shape = (1, S, S, S, 1)
    src = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    def step(carry):
        st, s = carry
        new_st, _ = eng.train_step(st, s, tgt)
        return new_st, s

    sec = _measure_chained(step, (state, src), max(args.iters // 2, 4))
    return {"metric": f"train3d_{S}cube_ms_per_step",
            "value": round(sec * 1e3, 3), "unit": "ms",
            "vs_baseline": None}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="register",
                    choices=["register", "train", "warp3d", "train3d"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from dfmir_tpu.engine import RegistrationConfig, RegistrationModel

    if args.mode == "warp3d":
        print(json.dumps(_bench_warp3d(args)))
        return

    if args.mode == "train3d":
        print(json.dumps(_bench_train3d(args)))
        return

    if args.mode == "train":
        cfg = RegistrationConfig(crop_size=args.size, batch_size=args.batch,
                                 compute_dtype=args.dtype)
        model = RegistrationModel(cfg)
        state = model.init_state(jax.random.PRNGKey(0),
                                 batch_size=args.batch)
        rng = np.random.default_rng(0)
        shape = (args.batch, args.size, args.size, 1)
        A = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        B = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        key = jax.random.PRNGKey(1)

        def step(carry):
            st, a = carry
            new_st, _ = model.train_step(st, a, B, key, jnp.float32(2e-4))
            return new_st, a

        sec = _measure_chained(step, (state, A), args.iters)
        print(json.dumps({
            "metric": f"train_step_{args.size}sq_pairs_per_sec"
                      + ("_bf16" if args.dtype == "bfloat16" else ""),
            "value": round(args.batch / sec, 3),
            "unit": "pairs/s", "vs_baseline": None,
        }))
        return

    cfg = RegistrationConfig(crop_size=args.size, batch_size=args.batch,
                             compute_dtype=args.dtype)
    model = RegistrationModel(cfg)
    # register() only touches netG + netR params; skip the (expensive over
    # the tunnel) netF init.
    kG, kR = jax.random.split(jax.random.PRNGKey(0))
    shape = (args.batch, args.size, args.size, 1)
    zeros = jnp.zeros(shape, jnp.float32)
    params = {
        "G": model.netG.init(kG, zeros)["params"],
        "R": model.netR.init(kR, zeros, zeros)["params"],
    }

    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    B = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    @functools.partial(jax.jit, static_argnums=4)
    def chained(params, A, B, salt, n):
        A = A * (1.0 + salt)  # device-side perturbation: defeats result cache
        def body(_, carry):
            A, acc = carry
            fake_B, idt_B, y_source, pos_flow = model.register(params, A, B)
            # feed a function of EVERY output back in: forces serialization
            # AND keeps all networks live (consuming only the flow would let
            # XLA dead-code-eliminate the whole translation net)
            A = A + 1e-6 * (y_source + fake_B + idt_B)
            return A, acc + jnp.sum(pos_flow[0, 0, 0])
        A, acc = lax.fori_loop(0, n, body, (A, jnp.float32(0.0)))
        return acc

    salt = 0

    def run(n):
        nonlocal salt
        salt += 1
        t0 = time.perf_counter()
        v = float(chained(params, A, B, jnp.float32(salt * 1e-5), n))
        t1 = time.perf_counter()
        assert np.isfinite(v)
        return t1 - t0

    n_short, n_long = 2, max(args.iters, 4)
    run(n_short)  # compile
    run(n_long)   # compile
    t_short = min(run(n_short) for _ in range(3))
    t_long = min(run(n_long) for _ in range(3))
    step = (t_long - t_short) / (n_long - n_short)
    pairs_per_sec = args.batch / step

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")
    baseline = None
    if os.path.exists(base_path):
        with open(base_path) as f:
            baseline = json.load(f).get("baseline_value")

    # Secondary metric in the same line: joint train-step throughput
    # (the driver tracks the one default invocation, so both numbers ride
    # it; failures here must not sink the headline metric).
    extra = {}
    try:
        model_t = RegistrationModel(RegistrationConfig(
            crop_size=args.size, batch_size=args.batch,
            compute_dtype=args.dtype))
        state = model_t.init_state(jax.random.PRNGKey(0),
                                   batch_size=args.batch)
        key = jax.random.PRNGKey(1)

        def tstep(carry):
            st, a = carry
            new_st, _ = model_t.train_step(st, a, B, key, jnp.float32(2e-4))
            return new_st, a

        sec_t = _measure_chained(tstep, (state, A), args.iters)
        extra["train_step_pairs_per_sec"] = round(args.batch / sec_t, 3)
    except Exception as e:  # pragma: no cover - defensive
        extra["train_step_error"] = repr(e)[:200]

    print(json.dumps({
        "metric": "registered_256sq_pairs_per_sec",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": (round(pairs_per_sec / baseline, 2)
                        if baseline else None),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
