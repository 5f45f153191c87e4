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
dispatch+fetch round-trip.  The trip count is a TRACED scalar so the short
and long chains share ONE compiled program (tunnel compiles are minutes;
this matters).

Budget discipline (the driver runs ``python bench.py`` under a timeout and
records the LAST parseable JSON line): the headline line is printed and
flushed the INSTANT its slope is measured; the secondary train-step number
only runs if wall-clock remains (BENCH_EXTRA_CUTOFF_S, default 300 s from
process start) and then the headline line is re-printed with the extra
merged in.  A timeout mid-extra therefore still leaves the headline line on
stdout.

Prints JSON lines of the form:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is relative to the PyTorch-CPU reference throughput recorded in
BENCH_BASELINE.json (the reference publishes no numbers of its own).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

T0 = time.perf_counter()


def _log(msg: str) -> None:
    """Phase log on stderr — lands in the driver's output tail even when
    the process is killed, so a timeout shows where the time went."""
    print(f"[bench +{time.perf_counter() - T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _emit(payload: dict) -> None:
    print(json.dumps(payload), flush=True)


_REAL_INIT = False


def _init_on_cpu(thunk):
    """Materialize a param/state pytree for benchmarking without paying any
    device compile.

    Timing on the MXU is value-independent (no data-dependent branching in
    the nets; the Pallas band predicate sees the same near-zero flows a real
    N(0,1e-5) flow-head init produces), so the benchmark only needs the
    right SHAPES on device: ``jax.eval_shape`` traces the init abstractly
    (no FLOPs, no compile), the leaves materialize as host zeros, and one
    ``device_put`` ships the tree.  Cold init was measured at ~400 s over
    the tunnel (two ~200 s program compiles) and ~350 s CPU-traced (XLA:CPU
    compiles each op of flax's eager init); this path is ~2 s.

    ``--real_init`` instead runs the real init on the CPU backend and
    transfers the values (for eyeballing real loss magnitudes)."""
    import jax
    import numpy as np

    if _REAL_INIT and jax.default_backend() != "cpu":
        try:
            cpu = jax.devices("cpu")[0]
        except Exception:
            return thunk()
        with jax.default_device(cpu):
            out = thunk()
        return jax.device_put(out, jax.devices()[0])
    shapes = jax.eval_shape(thunk)

    # Leaf-aware values: all-zero params NaN the TRAIN path (L2-normalize of
    # exactly-zero NCE features, sqrt-grad at 0), so mimic the real init
    # distribution — norm scales at 1, everything else float at N(0, 0.02),
    # ints (Adam count / step) at 0.  Still zero device compiles.
    def leaf(path, s):
        name = str(path[-1]) if path else ""
        keystr = jax.tree_util.keystr(path)
        # Optimizer state starts at the REAL init values (zeros): a random
        # Adam second moment can be negative -> sqrt(neg) -> NaN.
        if not np.issubdtype(s.dtype, np.floating) or "opt_state" in keystr:
            return np.zeros(s.shape, s.dtype)
        if "scale" in name:
            return np.ones(s.shape, s.dtype)
        # zlib.crc32, NOT hash(): str hash is salted per process, and any
        # value that ends up embedded in an HLO module would change the
        # persistent-compile-cache key on every invocation (the driver's
        # 400 s recompile, BENCH_r04).
        import zlib
        rng = np.random.default_rng(zlib.crc32(keystr.encode()))
        return (rng.standard_normal(s.shape) * 0.02).astype(s.dtype)

    host = jax.tree_util.tree_map_with_path(leaf, shapes)
    return jax.device_put(host, jax.devices()[0])


def _measure_chained(step_fn, init_carry, n_long, n_short=2, reps=3,
                     consts=None):
    """Time data-chained steps inside one jitted fori_loop; returns
    seconds/step via the slope between a short and a long chain.  The trip
    count is traced (ONE compile serves both chain lengths).

    ``consts``: pytree of arrays the step reads but does not update (params,
    fixed inputs).  They are passed as jit ARGUMENTS, not closed over — a
    closed-over array is embedded in the HLO module as a literal, so its
    VALUES enter the persistent-compile-cache key and any run-to-run value
    difference forces a full recompile (the driver's 400 s, BENCH_r04)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    @jax.jit
    def chained(carry, cst, salt, n):
        carry = jax.tree.map(
            lambda x: x * (1.0 + salt) if x.dtype == jnp.float32 else x,
            carry)

        def body(_, c):
            return step_fn(c) if cst is None else step_fn(c, cst)

        out = lax.fori_loop(0, n, body, carry)
        leaves = [l for l in jax.tree.leaves(out)
                  if jnp.issubdtype(l.dtype, jnp.floating)]
        return sum(jnp.sum(jnp.ravel(l)[:1]) for l in leaves)

    salt = [0]

    def run(n):
        salt[0] += 1
        t0 = time.perf_counter()
        v = float(chained(init_carry, consts, jnp.float32(salt[0] * 1e-5),
                          jnp.int32(n)))
        t1 = time.perf_counter()
        assert np.isfinite(v), v
        return t1 - t0

    _log(f"compiling chained program (n traced, {n_short}/{n_long} steps)")
    run(n_short)  # compile + warm
    _log("compiled; measuring")
    t_short = min(run(n_short) for _ in range(reps))
    t_long = min(run(n_long) for _ in range(reps))
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
    state = _init_on_cpu(lambda: eng.init_state(jax.random.PRNGKey(0)))
    rng = np.random.default_rng(0)
    shape = (1, S, S, S, 1)
    src = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    def step(carry, tgt_c):
        st, s = carry
        new_st, _ = eng.train_step(st, s, tgt_c)
        return new_st, s

    sec = _measure_chained(step, (state, src), max(args.iters // 2, 4),
                           consts=tgt)
    return {"metric": f"train3d_{S}cube_ms_per_step",
            "value": round(sec * 1e3, 3), "unit": "ms",
            "vs_baseline": None}


def _bench_train(args, model=None, B_arr=None):
    """Joint train-step throughput (optimize_parameters analog)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dfmir_tpu.engine import RegistrationConfig, RegistrationModel

    if model is None:
        cfg = RegistrationConfig(crop_size=args.size, batch_size=args.batch,
                                 compute_dtype=args.dtype)
        model = RegistrationModel(cfg)
    _log("train: init_state (netG+netF+netR)")
    # params/opt-state are batch-independent: init at batch 1 on the CPU
    # backend (each cold init program costs ~200 s to compile over the
    # tunnel; CPU traces in seconds and the pytree transfers once)
    state = _init_on_cpu(
        lambda: model.init_state(jax.random.PRNGKey(0), batch_size=1))
    rng = np.random.default_rng(0)
    shape = (args.batch, args.size, args.size, 1)
    A = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    B = B_arr if B_arr is not None else jnp.asarray(
        rng.standard_normal(shape), jnp.float32)
    key = jax.random.PRNGKey(1)

    def step(carry, cst):
        st, a = carry
        B_c, key_c = cst
        new_st, _ = model.train_step(st, a, B_c, key_c, jnp.float32(2e-4))
        return new_st, a

    sec = _measure_chained(step, (state, A), args.iters, consts=(B, key))
    return args.batch / sec


def _bench_kernelcheck(args):
    """Compiled-kernel exactness on the real TPU: run every Pallas warp
    kernel COMPILED (not interpret-mode) against the XLA gather path and
    report max-abs errors.  This is the hardware regression gate the
    interpret-mode tests cannot provide (a Mosaic lowering change that
    breaks the kernels shows up here, not there).

    Op under test: the reference SpatialTransformer semantics
    (/root/reference/models/voxelmorph/torchvoxelmorph/layers.py:30-48).
    Tolerance 2e-4 (bf16x3 selection-matmul emulation; see
    ops/warp_pallas.PRECISION)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dfmir_tpu.ops import warp
    from dfmir_tpu.ops import warp_pallas as wp
    from dfmir_tpu.ops.integrate import resize_linear

    tol = 2e-4
    rng = np.random.default_rng(0)
    checks = {}

    def record(name, a, b, tol_override=None):
        t = tol if tol_override is None else tol_override
        err = float(jnp.max(jnp.abs(a - b)))
        checks[name] = round(err, 8)
        status = "ok" if err < t else "FAIL"
        _log(f"kernelcheck {name}: max|err|={err:.2e} [{status}]")
        return err < t

    ok_all = True

    # --- 2-D: aligned (256) and lane-padded (200) widths
    for H, W in ((256, 256), (200, 200)):
        src = jnp.asarray(rng.standard_normal((2, H, W, 2)), jnp.float32)
        lo = rng.standard_normal((2, H // 8, W // 8, 2)) * 4.0
        flow = resize_linear(jnp.asarray(lo, jnp.float32), (H, W))
        if not wp.supports(src, flow, "bilinear"):
            checks[f"warp2d_{W}_unsupported"] = None
            ok_all = False
            continue
        ref = warp(src, flow, impl="xla")
        out, okp = wp.warp2d_banded(src, flow)
        ok_all &= bool(okp) and record(f"warp2d_fwd_{W}", out, ref)
        g = jnp.asarray(rng.standard_normal(src.shape), jnp.float32)
        _, vjp = jax.vjp(lambda s, f: warp(s, f, impl="xla"), src, flow)
        dsr, dfr = vjp(g)
        dsp, dfp, okb = wp.warp2d_banded_bwd(src, flow, g)
        ok_all &= bool(okb) and record(f"warp2d_bwd_dsrc_{W}", dsp, dsr)
        ok_all &= record(f"warp2d_bwd_dflow_{W}", dfp, dfr)

    # --- 3-D: small-band fwd+bwd, big-band fwd (64^3 keeps compiles short)
    S = 64
    src3 = jnp.asarray(rng.standard_normal((1, S, S, S, 1)), jnp.float32)
    lo = rng.standard_normal((1, S // 16, S // 16, S // 16, 3)) * 3.0
    flow_small = resize_linear(jnp.asarray(lo, jnp.float32), (S, S, S))
    # Big-band case: a y-shear across x (flow_y = 0.3*(x - S/2)) makes each
    # row-tile's y-span ~8 + 0.3*S + field ≈ 40 rows — deterministically over the
    # small band (BY=32 incl. alignment slack) but under the big (BY2=48).
    xx = jnp.arange(S, dtype=jnp.float32) - S / 2
    shear = jnp.broadcast_to(0.3 * xx, (1, S, S, S))
    flow_big = (flow_small.at[..., 1].add(shear)
                if hasattr(flow_small, "at") else flow_small)
    flow_tiny = resize_linear(
        jnp.asarray(rng.standard_normal(
            (1, S // 16, S // 16, S // 16, 3)) * 0.8, jnp.float32),
        (S, S, S))
    # fold left at None everywhere: the gate must exercise the SHIPPED
    # auto-fold packing choices (_pick_fold), not a pinned variant
    for name, flow3, bz, by in (
            ("tiny", flow_tiny, wp.BZ0, wp.BY0),
            ("small", flow_small, wp.BZ, wp.BY),
            ("big", flow_big, wp.BZ2, wp.BY2)):
        ref3 = warp(src3, flow3, impl="xla")
        out3, okp = wp.warp3d_banded(src3, flow3, bz=bz, by=by)
        if not bool(okp):
            checks[f"warp3d_fwd_{name}_band_not_engaged"] = None
            ok_all = False
            continue
        ok_all &= record(f"warp3d_fwd_{name}", out3, ref3)
        if wp.FWD_PRECISION not in (None, "bf16x3"):
            # the dispatch SHIPS a reduced forward emulation level
            # (FWD_PRECISION, measured winner WARPFWD_r04) — gate it at
            # the envelope pinned by test_3d_fwd_precision_variants
            fwd_tol = {"bf16x2": 5e-3, "bf16": 1e-2}[wp.FWD_PRECISION]
            outs, oks = wp.warp3d_banded(src3, flow3, bz=bz, by=by,
                                         precision=wp.FWD_PRECISION)
            scale3 = float(jnp.max(jnp.abs(ref3)))
            ok_all &= bool(oks) and record(
                f"warp3d_fwd_{name}_shipped", outs / max(scale3, 1e-12),
                ref3 / max(scale3, 1e-12), tol_override=fwd_tol)
        if name in ("tiny", "small"):
            # gate the SHIPPED dispatch config: the tiny/small backward
            # runs at BWD_PRECISION (the measured end-to-end winner,
            # VECINT_BWD_r04) at its pinned relative-error envelope
            prec = wp.BWD_PRECISION
            tol3 = {None: None, "bf16x3": None, "bf16x2": 1e-2,
                    "bf16": 3e-2}[prec]
            g3 = jnp.asarray(rng.standard_normal(src3.shape), jnp.float32)
            _, vjp3 = jax.vjp(lambda s, f: warp(s, f, impl="xla"),
                              src3, flow3)
            dsr3, dfr3 = vjp3(g3)
            dsp3, dfp3, okb3 = wp.warp3d_banded_bwd(src3, flow3, g3,
                                                    bz=bz, by=by,
                                                    precision=prec)
            sfx = "" if name == "small" else f"_{name}"
            if tol3 is None:
                ok_all &= bool(okb3) and record(f"warp3d_bwd_dsrc{sfx}",
                                                dsp3, dsr3)
                ok_all &= record(f"warp3d_bwd_dflow{sfx}", dfp3, dfr3)
            else:
                scale_s = float(jnp.max(jnp.abs(dsr3)))
                scale_f = float(jnp.max(jnp.abs(dfr3)))
                ok_all &= bool(okb3) and record(
                    f"warp3d_bwd_dsrc{sfx}", dsp3 / max(scale_s, 1e-12),
                    dsr3 / max(scale_s, 1e-12), tol_override=tol3)
                ok_all &= record(
                    f"warp3d_bwd_dflow{sfx}", dfp3 / max(scale_f, 1e-12),
                    dfr3 / max(scale_f, 1e-12), tol_override=tol3)
            if name == "small":
                # both dsrc output modes must stay hardware-exact: "auto"
                # picked vmem above (the plane fits at 64^3); gate the
                # scatter fallback (giant shapes) against the same ref
                dss, _ = wp.warp3d_banded_bwd_dsrc(
                    flow3, g3, bz=bz, by=by, precision=prec,
                    dsrc_mode="scatter")
                if tol3 is None:
                    ok_all &= record("warp3d_bwd_dsrc_scatter", dss, dsr3)
                else:
                    ok_all &= record(
                        "warp3d_bwd_dsrc_scatter",
                        dss / max(scale_s, 1e-12),
                        dsr3 / max(scale_s, 1e-12), tol_override=tol3)
        elif wp.BWD_BIG_PRECISION is not None:
            # big-band bwd ships at a reduced emulation level; gate at the
            # envelope pinned by test_3d_bwd_precision_variants
            big_tol = {"bf16x3": 2e-4, "bf16x2": 1e-2,
                       "bf16": 3e-2}[wp.BWD_BIG_PRECISION]
            g3 = jnp.asarray(rng.standard_normal(src3.shape), jnp.float32)
            _, vjp3 = jax.vjp(lambda s, f: warp(s, f, impl="xla"),
                              src3, flow3)
            dsr3, dfr3 = vjp3(g3)
            dsp3, dfp3, okb3 = wp.warp3d_banded_bwd(
                src3, flow3, g3, bz=bz, by=by,
                precision=wp.BWD_BIG_PRECISION)
            scale_s = float(jnp.max(jnp.abs(dsr3)))
            scale_f = float(jnp.max(jnp.abs(dfr3)))
            ok_all &= bool(okb3) and record(
                "warp3d_bwd_big_dsrc", dsp3 / max(scale_s, 1e-12),
                dsr3 / max(scale_s, 1e-12), tol_override=big_tol)
            ok_all &= record(
                "warp3d_bwd_big_dflow", dfp3 / max(scale_f, 1e-12),
                dfr3 / max(scale_f, 1e-12), tol_override=big_tol)

    # --- Conv3DZ z-decomposed conv3d lowering (nets/layers.py): the whole
    # 3-D UNet routes its convs through this rewrite, so gate fwd + VJP on
    # hardware against XLA's native conv3d.  Exact math either way — only
    # the reduction order differs — so errors are f32 rounding, checked
    # relative to the gradient scale.
    from dfmir_tpu.nets.layers import conv3d_zdecomp

    xc = jnp.asarray(rng.standard_normal((1, 20, 24, 24, 8)), jnp.float32)
    wc = jnp.asarray(rng.standard_normal((3, 3, 3, 8, 16)), jnp.float32)
    cstr, cpad = (2, 2, 2), ((1, 1), (1, 1), (1, 1))

    def conv_z(x, w):
        return conv3d_zdecomp(x, w, cstr, cpad)

    def conv_x(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=cstr, padding=list(cpad),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))

    yz, yx = conv_z(xc, wc), conv_x(xc, wc)
    sc = float(jnp.max(jnp.abs(yx)))
    ok_all &= record("conv3dz_fwd", yz / sc, yx / sc)
    gc = jnp.asarray(rng.standard_normal(yx.shape), jnp.float32)
    _, vjp_z = jax.vjp(conv_z, xc, wc)
    _, vjp_x = jax.vjp(conv_x, xc, wc)
    (dxz, dwz), (dxx, dwx) = vjp_z(gc), vjp_x(gc)
    sx, sw = float(jnp.max(jnp.abs(dxx))), float(jnp.max(jnp.abs(dwx)))
    ok_all &= record("conv3dz_bwd_dsrc", dxz / sx, dxx / sx)
    ok_all &= record("conv3dz_bwd_dkernel", dwz / sw, dwx / sw)

    return {"metric": "kernelcheck_pass", "value": 1.0 if ok_all else 0.0,
            "unit": "bool", "vs_baseline": None,
            "extra": {"tolerance": tol, "backend": jax.default_backend(),
                      "checks": checks}}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="register",
                    choices=["register", "train", "warp3d", "train3d",
                             "kernelcheck"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--no-extra", action="store_true",
                    help="skip the train-step extra in register mode")
    ap.add_argument("--real_init", action="store_true",
                    help="CPU-trace the real param init instead of the "
                         "shape-only zeros materialization (slow; values "
                         "do not affect MXU timing)")
    args = ap.parse_args()
    global _REAL_INIT
    _REAL_INIT = args.real_init

    # Tunnel watchdog BEFORE importing jax in this process: when the axon
    # TPU tunnel is down, backend init hangs indefinitely (observed a
    # multi-hour outage), which would burn the driver's whole timeout
    # (round-2's rc=124).  Probe in a subprocess with a hard deadline and
    # fail fast + loud instead.
    _log(f"mode={args.mode} dtype={args.dtype}; probing backend (180 s cap)")
    import subprocess
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.default_backend())"],
            capture_output=True, text=True, timeout=180)
        backend = (probe.stdout or "").strip().splitlines()[-1:] or ["?"]
        _log(f"backend probe: rc={probe.returncode} backend={backend[0]}")
        if probe.returncode != 0:
            _log("backend init FAILED; stderr tail: "
                 + (probe.stderr or "")[-500:])
            sys.exit(3)
    except subprocess.TimeoutExpired:
        _log("backend init HUNG >180 s — TPU tunnel down; aborting fast "
             "instead of burning the driver timeout")
        sys.exit(3)

    import jax
    import jax.numpy as jnp
    import numpy as np

    # Persistent compilation cache (TPU only — the XLA:CPU AOT round-trip
    # burns mmaps, see tests/conftest.py): tunnel compiles run minutes, and
    # the driver's benchmark invocation runs the exact programs this script
    # compiled last time, so priming the cache is what keeps the driver run
    # inside its timeout.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        if jax.default_backend() != "cpu":
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 2.0)
            jax.config.update(
                "jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # cache is an optimization, never a failure
        _log(f"compilation cache unavailable: {e!r}")

    _log(f"backend={jax.default_backend()} devices={jax.device_count()}")

    if args.mode == "warp3d":
        _emit(_bench_warp3d(args))
        return
    if args.mode == "train3d":
        _emit(_bench_train3d(args))
        return
    if args.mode == "kernelcheck":
        _emit(_bench_kernelcheck(args))
        return

    from dfmir_tpu.engine import RegistrationConfig, RegistrationModel

    if args.mode == "train":
        pairs = _bench_train(args)
        _emit({
            "metric": f"train_step_{args.size}sq_pairs_per_sec"
                      + ("_bf16" if args.dtype == "bfloat16" else ""),
            "value": round(pairs, 3),
            "unit": "pairs/s", "vs_baseline": None,
        })
        return

    # ------------------------------------------------- register (default)
    cfg = RegistrationConfig(crop_size=args.size, batch_size=args.batch,
                             compute_dtype=args.dtype)
    model = RegistrationModel(cfg)
    # register() only touches netG + netR params; skip the (expensive over
    # the tunnel) netF init for the headline.  Batch-1 inits — params are
    # batch-independent and the programs land in the persistent cache, so
    # the driver's run pays seconds, not the ~200 s cold compile.
    _log("register: materialize netG+netR params (shape-only)")
    shape = (args.batch, args.size, args.size, 1)

    def _mk_params():
        kG, kR = jax.random.split(jax.random.PRNGKey(0))
        zeros1 = jnp.zeros((1,) + shape[1:], jnp.float32)
        return {
            "G": model.netG.init(kG, zeros1)["params"],
            "R": model.netR.init(kR, zeros1, zeros1)["params"],
        }

    params = _init_on_cpu(_mk_params)

    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    B = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    def step(carry, cst):
        a, acc = carry
        params_c, B_c = cst
        fake_B, idt_B, y_source, pos_flow = model.register(params_c, a, B_c)
        # feed a function of EVERY output back in: forces serialization
        # AND keeps all networks live (consuming only the flow would let
        # XLA dead-code-eliminate the whole translation net)
        a = a + 1e-6 * (y_source + fake_B + idt_B)
        return a, acc + jnp.sum(pos_flow[0, 0, 0])

    sec = _measure_chained(step, (A, jnp.float32(0.0)), args.iters,
                           consts=(params, B))
    pairs_per_sec = args.batch / sec

    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BASELINE.json")
    baseline = None
    if os.path.exists(base_path):
        with open(base_path) as f:
            baseline = json.load(f).get("baseline_value")

    headline = {
        "metric": "registered_256sq_pairs_per_sec",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": (round(pairs_per_sec / baseline, 2)
                        if baseline else None),
        "extra": {"dtype": args.dtype, "batch": args.batch},
    }
    # THE deliverable: on stdout before anything else can time out.
    _emit(headline)
    _log(f"headline measured: {headline['value']} pairs/s")

    # Secondary metric: joint train-step throughput, budget-permitting.
    # The headline line above already satisfies the driver; this re-print
    # (same metric/value, extra enriched) only replaces it if it lands.
    if args.no_extra:
        return
    cutoff = float(os.environ.get("BENCH_EXTRA_CUTOFF_S", "240"))
    elapsed = time.perf_counter() - T0
    if elapsed > cutoff:
        headline["extra"]["train_step_skipped"] = "budget"
        _emit(headline)
        return
    try:
        pairs_t = _bench_train(args, model=model, B_arr=B)
        headline["extra"]["train_step_pairs_per_sec"] = round(pairs_t, 3)
    except Exception as e:  # pragma: no cover - defensive
        headline["extra"]["train_step_error"] = repr(e)[:200]
    _emit(headline)


if __name__ == "__main__":
    main()
