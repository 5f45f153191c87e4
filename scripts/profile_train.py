"""Attribute the joint train step's time (VERDICT item: profile the
57 ms/pair) by chained-timing each stage of the step separately on the
real chip — the tunnel makes jax.profiler traces unreliable, so this is
the measurement of record.

Stages (batch 8, 256^2, f32 unless --dtype):
  train_step   full jitted update (fwd + bwd + Adam)
  loss_fwd     _loss_fn value only (no grad)  -> bwd = train_step - loss_fwd
  netG_fwd     generator on cat(A,B) (2B images) + taps
  encode_q     encode-only pass on the 3B NCE query images
  netR_fwd     VxmDense fwd (unet + flow head + vecint + warps)

Backward attribution (each *_fwdbwd stage times grad() of the same
computation with a squared-sum loss so the cotangent is data-dependent —
sum(y) lets XLA fold constant-cotangent backwards, the 59a2f86 harness
lesson; bwd cost = <stage>_fwdbwd - <stage> fwd):
  loss_fwdbwd  grad of _loss_fn wrt all params (fwd + whole backward)
  netG_fwdbwd  grad of the generator + taps wrt G params
  encode_fwdbwd grad of the 3B-image encode pass wrt G params
  netR_fwdbwd  grad of the VxmDense forward wrt R params
  adam         optimizer update only (scale_by_adam + apply on the tree)

Prints one JSON dict of ms/step (batch) and derived ms/pair.
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
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--stages", default="train_step,loss_fwd,netG_fwd,"
                    "encode_q,netR_fwd")
    ap.add_argument("--flops", action="store_true",
                    help="attach per-stage HLO flop counts (lowered-HLO "
                         "cost analysis, no execution), per-stage TFLOP/s "
                         "and model-level MFU vs --peak_tflops")
    ap.add_argument("--peak_tflops", type=float, default=197.0,
                    help="chip peak for the MFU ledger (v5e bf16: 197)")
    ap.add_argument("--platform", default=None, choices=["cpu"],
                    help="force the JAX platform (the axon plugin returns "
                         "no lowered-HLO cost analysis; run --flops_only "
                         "on cpu and merge with the on-chip timings)")
    ap.add_argument("--flops_only", action="store_true",
                    help="skip the chained timing; print per-stage HLO "
                         "flop counts only")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _init_on_cpu, _measure_chained
    from dfmir_tpu.engine import RegistrationConfig, RegistrationModel

    cfg = RegistrationConfig(crop_size=args.size, batch_size=args.batch,
                             compute_dtype=args.dtype)
    model = RegistrationModel(cfg)
    state = _init_on_cpu(
        lambda: model.init_state(jax.random.PRNGKey(0), batch_size=1))
    rng = np.random.default_rng(0)
    shape = (args.batch, args.size, args.size, 1)
    A = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    B = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    key = jax.random.PRNGKey(1)

    def chain_imgs(out_list, a):
        """Feed a scalar function of every output back into the carry."""
        upd = 0.0
        for o in out_list:
            upd = upd + jnp.sum(o[(0,) * o.ndim]) * 1e-6
        return a + upd

    stages = {}

    def stage_train_step():
        def step(carry):
            st, a = carry
            new_st, _ = model.train_step(st, a, B, key, jnp.float32(2e-4))
            return new_st, a
        return step, (state, A)

    def stage_loss_fwd():
        def step(carry):
            (a,) = carry
            total, (metrics, aux) = model._loss_fn(state.params, a, B, key)
            return (a + total * 1e-6,)
        return step, (A,)

    def stage_netG_fwd():
        real = jnp.concatenate([A, B], axis=0)

        def step(carry):
            (x,) = carry
            fake, feats = model._forward_and_taps(state.params["G"], x)
            return (chain_imgs([fake] + list(feats), x),)
        return step, (real,)

    def stage_encode_q():
        q = jnp.concatenate([A, B, A], axis=0)  # 3B query images

        def step(carry):
            (x,) = carry
            feats = model._encode(state.params["G"], x)
            return (chain_imgs(list(feats), x),)
        return step, (q,)

    def stage_netR_fwd():
        def step(carry):
            (a,) = carry
            y_source, y_target, pos_flow = model.netR.apply(
                {"params": model._cast_params(state.params["R"])}, a, B)
            return (chain_imgs([y_source, y_target, pos_flow], a),)
        return step, (A,)

    def _grad_feedback(p, grads):
        """Fold a scalar tap of every grad leaf back into the params so the
        chained carry stays data-dependent without drifting."""
        tap = jnp.asarray(0.0, jnp.float32)
        for leaf in jax.tree.leaves(grads):
            tap = tap + jnp.sum(jnp.ravel(leaf)[:1]).astype(jnp.float32)
        tap = jnp.tanh(tap) * 1e-12
        return jax.tree.map(lambda a: a + tap.astype(a.dtype), p)

    def _sq(outs):
        """Data-dependent scalar loss: sum of squares of every output (a
        plain sum makes the cotangent constant and XLA folds backwards)."""
        t = jnp.asarray(0.0, jnp.float32)
        for o in outs:
            t = t + jnp.sum(jnp.square(o.astype(jnp.float32)))
        return t * 1e-6

    def stage_loss_fwdbwd():
        def f(p, a):
            total, _ = model._loss_fn(p, a, B, key)
            return total

        def step(carry):
            p, a = carry
            grads = jax.grad(f)(p, a)
            return _grad_feedback(p, grads), a
        return step, (state.params, A)

    def stage_netG_fwdbwd():
        real = jnp.concatenate([A, B], axis=0)

        def f(pG, x):
            fake, feats = model._forward_and_taps(pG, x)
            return _sq([fake] + list(feats))

        def step(carry):
            p, x = carry
            grads = jax.grad(f)(p, x)
            return _grad_feedback(p, grads), x
        return step, (state.params["G"], real)

    def stage_encode_fwdbwd():
        q = jnp.concatenate([A, B, A], axis=0)

        def f(pG, x):
            return _sq(list(model._encode(pG, x)))

        def step(carry):
            p, x = carry
            grads = jax.grad(f)(p, x)
            return _grad_feedback(p, grads), x
        return step, (state.params["G"], q)

    def stage_netR_fwdbwd():
        def f(pR, a):
            y_source, y_target, pos_flow = model.netR.apply(
                {"params": model._cast_params(pR)}, a, B)
            return _sq([y_source, y_target, pos_flow])

        def step(carry):
            p, a = carry
            grads = jax.grad(f)(p, a)
            return _grad_feedback(p, grads), a
        return step, (state.params["R"], A)

    def stage_adam():
        fake_grads = jax.tree.map(
            lambda a: jnp.full(a.shape, 1e-6, a.dtype), state.params)
        opt0 = (state.opt_state[0]
                if isinstance(state.opt_state, tuple) and
                not hasattr(state.opt_state, "_fields")
                else state.opt_state)

        def step(carry):
            p, opt = carry
            updates, new_opt = model.tx.update(fake_grads, opt, p)
            updates = jax.tree.map(lambda u: -1e-4 * u, updates)
            import optax
            return optax.apply_updates(p, updates), new_opt
        return step, (state.params, opt0)

    builders = {
        "train_step": stage_train_step, "loss_fwd": stage_loss_fwd,
        "netG_fwd": stage_netG_fwd, "encode_q": stage_encode_q,
        "netR_fwd": stage_netR_fwd,
        "loss_fwdbwd": stage_loss_fwdbwd, "netG_fwdbwd": stage_netG_fwdbwd,
        "encode_fwdbwd": stage_encode_fwdbwd,
        "netR_fwdbwd": stage_netR_fwdbwd, "adam": stage_adam,
    }
    out = {}
    for name in args.stages.split(","):
        step, carry = builders[name]()
        if args.flops or args.flops_only:
            ca = jax.jit(step).lower(carry).cost_analysis()
            if ca is None:
                print(f"# {name}: no cost analysis on this backend "
                      "(run --flops_only --platform cpu)", file=sys.stderr)
            else:
                fl = ca.get("flops", 0.0)
                out[name + "_gflop"] = round(fl / 1e9, 1)
        if args.flops_only:
            continue
        sec = _measure_chained(step, carry, 12)
        out[name + "_ms"] = round(sec * 1e3, 2)
        print(f"# {name}: {sec * 1e3:.2f} ms/step", file=sys.stderr)
        if name + "_gflop" in out:
            fl = out[name + "_gflop"] * 1e9
            out[name + "_tflops"] = round(fl / sec / 1e12, 1)
            out[name + "_mfu_pct"] = round(
                100 * fl / sec / 1e12 / args.peak_tflops, 1)

    if "train_step_ms" in out and "loss_fwd_ms" in out:
        out["bwd_plus_adam_ms"] = round(
            out["train_step_ms"] - out["loss_fwd_ms"], 2)
    out["batch"] = args.batch
    if "train_step_ms" in out:
        out["train_pairs_per_sec"] = round(
            args.batch / (out["train_step_ms"] / 1e3), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
