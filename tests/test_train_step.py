"""Train-step integration tests: losses finite, params update, grads flow to
all three networks, fused-NCE optimization is exact, and the step runs under
a sharded 8-device mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfmir_tpu.engine import RegistrationConfig, RegistrationModel, LRSchedule
from dfmir_tpu.parallel import make_mesh, shard_batch, replicate

SMALL = dict(ngf=8, netF_nc=16, num_patches=16, crop_size=32,
             vxm_enc=(4, 8), vxm_dec=(8, 8, 4), nce_layers=(0, 4, 8, 12))


@pytest.fixture(scope="module")
def model():
    return RegistrationModel(RegistrationConfig(**SMALL))


@pytest.fixture(scope="module")
def _state0(model):
    return model.init_state(jax.random.PRNGKey(0), batch_size=2)


@pytest.fixture
def state(_state0):
    # train_step donates its state argument (buffers freed after the call),
    # so hand every test a fresh copy of the module-scoped master
    return jax.tree.map(jnp.copy, _state0)


def batch(rng, b=2, s=32):
    A = rng.standard_normal((b, s, s, 1)).astype(np.float32).clip(-1, 1)
    B = rng.standard_normal((b, s, s, 1)).astype(np.float32).clip(-1, 1)
    return jnp.asarray(A), jnp.asarray(B)


def test_train_step_runs_and_updates(rng, model, state):
    A, B = batch(rng)
    step0 = int(state.step)
    params0 = jax.tree.map(np.asarray, state.params)  # pre-donation snapshot
    new_state, metrics = model.train_step(state, A, B, jax.random.PRNGKey(1),
                                          jnp.float32(2e-4))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert int(new_state.step) == step0 + 1
    # every sub-network's params must have moved (grads flow to G, F, R)
    for net in ("G", "F", "R"):
        before = jax.tree.leaves(params0[net])
        after = jax.tree.leaves(new_state.params[net])
        moved = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(after, before)
        )
        assert moved, f"params[{net}] did not update"


def test_loss_names_match_reference(model, state, rng):
    A, B = batch(rng)
    metrics, _ = model.eval_step(state.params, A, B, jax.random.PRNGKey(2))
    # reference loss_names ['G','NCE','R','smooth','local'] + NCE_Y (nce_idt)
    for name in ("G", "NCE", "R", "smooth", "local", "NCE_Y"):
        assert name in metrics


def test_fused_nce_is_exact(rng, state):
    A, B = batch(rng)
    key = jax.random.PRNGKey(3)
    m_fused = RegistrationModel(RegistrationConfig(**SMALL, fuse_nce_encodes=True))
    m_plain = RegistrationModel(RegistrationConfig(**SMALL, fuse_nce_encodes=False))
    mf, _ = m_fused.eval_step(state.params, A, B, key)
    mp, _ = m_plain.eval_step(state.params, A, B, key)
    for k in mf:
        np.testing.assert_allclose(float(mf[k]), float(mp[k]), rtol=2e-4,
                                   err_msg=k)


def test_train_step_donates_state(model, state, rng):
    """Regression pin on the donation contract: the pre-step state's
    buffers must actually be freed (donate_argnums in effect), keeping the
    optimizer state single-buffered in device memory."""
    A, B = batch(rng)
    leaf = jax.tree.leaves(state.params)[0]
    new_state, _ = model.train_step(state, A, B, jax.random.PRNGKey(1),
                                    jnp.float32(2e-4))
    jax.block_until_ready(new_state.params)
    assert leaf.is_deleted()


def test_flow_stats_scalars(model, state, rng):
    # --jac_freq path: every stat must be a finite device scalar
    A, B = batch(rng)
    stats = model.flow_stats(state.params, A, B)
    for k, v in stats.items():
        assert v.ndim == 0 and np.isfinite(float(v)), k


def test_register_inference(model, state, rng):
    A, B = batch(rng)
    fake_B, idt_B, y_source, flow = model.register(state.params, A, B)
    assert fake_B.shape == A.shape
    assert flow.shape == (2, 32, 32, 2)
    assert np.all(np.isfinite(np.asarray(flow)))


def test_visuals(model, state, rng):
    A, B = batch(rng)
    visuals, metrics = model.compute_visuals(state.params, A, B,
                                             jax.random.PRNGKey(4))
    for name in ("real_A", "fake_B", "real_B", "dvf", "registered", "regA",
                 "idt_B"):
        assert name in visuals
        assert visuals[name].shape == A.shape


def test_sharded_train_step(model, state, rng):
    mesh = make_mesh()  # 8 CPU devices, data axis
    assert mesh.devices.size == 8
    A, B = batch(rng, b=8)
    A, B = shard_batch(mesh, (A, B))
    sharded_state = replicate(mesh, state)
    new_state, metrics = model.train_step(
        sharded_state, A, B, jax.random.PRNGKey(5), jnp.float32(2e-4))
    assert np.isfinite(float(metrics["total"]))


def test_sharded_matches_single_device(model, state, rng):
    A, B = batch(rng, b=8)
    key = jax.random.PRNGKey(6)
    m_single, _ = model.eval_step(state.params, A, B, key)
    mesh = make_mesh()
    As, Bs = shard_batch(mesh, (A, B))
    ps = replicate(mesh, state.params)
    m_shard, _ = model.eval_step(ps, As, Bs, key)
    for k in m_single:
        np.testing.assert_allclose(float(m_shard[k]), float(m_single[k]),
                                   rtol=1e-4, err_msg=k)


def test_sharded_train_step_matches_single_device(model, state, rng):
    """The actual DataParallel parity check (reference base_model.py:103-107):
    gradients all-reduced over the data mesh must match a single-device step
    on the full batch.

    What is (and is not) guaranteed at f32: the per-sample forward itself is
    not bitwise identical between a batch-8 program and a batch-1-per-device
    program (XLA picks different conv blocking), and the ~1e-7 rounding
    noise compounds through 9 resnet blocks, instance norms, and the
    T=0.07-sharpened NCE softmax into gradient differences of order
    1e-3 * leaf-scale (measured).  Adam's first step is ±lr*sign(m̂), so a
    component whose gradient lies inside that noise band can flip sign,
    moving the param by exactly 2*lr.  The assertions therefore are:

    (1) gradients agree to the measured noise envelope.  The envelope is
        scaled per NETWORK (1e-2 * max|g| over all of G / F / R), not per
        leaf: a bias leaf whose true gradient fully cancels has leaf-scale
        ~0 but summand-scale set by the network's activations, so its
        noise floor must come from the surrounding network's gradient
        magnitude;
    (2) every post-Adam param disagreement is exactly such a bounded
        first-step sign artifact (|Δp| ≤ 2.05*lr) at a gradient inside the
        noise band, and >99% of components match to 1e-5."""
    A, B = batch(rng, b=8)
    key = jax.random.PRNGKey(7)
    lr = jnp.float32(2e-4)

    # replicate BEFORE the single-device step: train_step donates `state`
    mesh = make_mesh()
    As, Bs = shard_batch(mesh, (A, B))
    sharded_state = replicate(mesh, state)

    grad_fn = jax.jit(jax.grad(lambda p, a, b: model._loss_fn(
        p, a, b, key)[0]))
    g_single = grad_fn(state.params, A, B)
    st_single, _ = model.train_step(state, A, B, key, lr)

    g_shard = grad_fn(sharded_state.params, As, Bs)
    st_shard, _ = model.train_step(sharded_state, As, Bs, key, lr)

    flat_gs = jax.tree_util.tree_leaves_with_path(g_single)
    flat_gm = jax.tree.leaves(g_shard)
    flat_s = jax.tree.leaves(st_single.params)
    flat_m = jax.tree.leaves(st_shard.params)
    assert len(flat_gs) == len(flat_gm) == len(flat_s) == len(flat_m)

    net_scale = {
        net: max(float(jnp.abs(leaf).max())
                 for leaf in jax.tree.leaves(g_single[net]))
        for net in g_single
    }

    total = mismatched = 0
    for (path, gs), gm, pa, pb in zip(flat_gs, flat_gm, flat_s, flat_m):
        name = jax.tree_util.keystr(path)
        gs, gm, pa, pb = (np.asarray(x) for x in (gs, gm, pa, pb))
        net = path[0].key  # top-level pytree key: 'G' / 'F' / 'R'
        noise = 1e-2 * max(net_scale[net], 1e-6)
        # (1) all-reduced gradient equals single-device gradient to noise
        assert float(np.abs(gs - gm).max()) <= noise, (
            f"grad {name}: {np.abs(gs - gm).max()} > {noise}")
        # (2) param disagreements are only bounded sign artifacts
        mism = ~np.isclose(pa, pb, atol=1e-5, rtol=1e-4)
        total += pa.size
        mismatched += int(mism.sum())
        if mism.any():
            dp = np.abs(pa[mism] - pb[mism])
            assert float(dp.max()) <= 2.05 * float(lr), (
                f"{name}: param divergence beyond a first-step sign flip")
            assert float(np.abs(gs[mism]).max()) <= noise, (
                f"{name}: sign flip at a resolvable gradient")
    assert mismatched < 0.01 * total, (mismatched, total)


def test_sharded_grad_parity_f64(model, state, rng):
    """Reduction-bug detector at 1000x the f32 envelope's sensitivity
    (VERDICT r2 #7): the f32 noise-envelope test above must tolerate
    ~1e-2-relative gradient noise because batch-8 and batch-1-per-device
    conv blocking legitimately differ; recomputed in f64 that blocking
    noise collapses to ~1e-7 relative (bounded by the engine's deliberate
    f32 casts at the NCE tap boundaries, measured 8.6e-7 worst-net), so a
    real all-reduce/scaling bug (always O(1) relative) cannot hide.
    Match: DataParallel gradient semantics, reference base_model.py:103-107.
    """
    A, B = batch(rng, b=8)
    key = jax.random.PRNGKey(7)
    jax.config.update("jax_enable_x64", True)
    try:
        p64 = jax.tree.map(
            lambda x: (x.astype(jnp.float64)
                       if jnp.issubdtype(x.dtype, jnp.floating) else x),
            state.params)
        A64 = A.astype(jnp.float64)
        B64 = B.astype(jnp.float64)
        grad_fn = jax.jit(jax.grad(
            lambda p, a, b: model._loss_fn(p, a, b, key)[0]))
        g_single = grad_fn(p64, A64, B64)
        mesh = make_mesh()
        As, Bs = shard_batch(mesh, (A64, B64))
        g_shard = grad_fn(replicate(mesh, p64), As, Bs)
        for net in g_single:
            scale = max(float(jnp.abs(l).max())
                        for l in jax.tree.leaves(g_single[net]))
            diff = max(float(jnp.abs(a - b).max())
                       for a, b in zip(jax.tree.leaves(g_single[net]),
                                       jax.tree.leaves(g_shard[net])))
            # measured: 8.6e-7 relative worst (netG); 10x margin
            assert diff <= 1e-5 * max(scale, 1e-12), (
                f"net {net}: f64 sharded grad diff {diff} vs scale {scale}")
    finally:
        jax.config.update("jax_enable_x64", False)


def test_sharded_multi_step_no_compounding(model, state, rng):
    """Three sequential f32 steps, sharded vs single device.

    Adam normalizes every gradient coordinate, so sub-noise sign flips
    DIFFUSE through the moment estimates over steps — measured on this
    config: 0.3% / 12% / 30% of components past atol=1e-5 after steps
    1/2/3, so a mismatch-*fraction* assert is the wrong invariant (and
    scale bugs are invisible to Adam updates anyway; the f64 gradient
    test above is the sharp scale/reduction detector).  What bounded
    rounding noise CANNOT do, and a real divergence bug does, is (a)
    push any component beyond the k*lr-per-step random-walk envelope,
    (b) grow the MEAN |dp| to update scale (measured 0.06*lr at step 3),
    or (c) bend the loss trajectory (measured total-loss agreement
    3e-7 / 9e-5 / 2e-4 relative over the 3 steps under the 'xla' conv
    lowering — that lowering keeps the sharp 1e-3 bound it was calibrated
    on; the tapdot low-channel lowering — CONV2D_ENDS='out', the measured
    end-to-end winner on chip — shifts per-example rounding in the flow
    head and lands at 1.4e-3 by step 1, so it gets 5e-3: still an order
    of magnitude under any real reduction bug, which the f64 gradient
    test above pins exactly (ADVICE r4: per-lowering bound)."""
    from dfmir_tpu.nets.layers import CONV2D_ENDS
    traj_tol = 1e-3 if CONV2D_ENDS == "xla" else 5e-3
    A, B = batch(rng, b=8)
    lr = jnp.float32(2e-4)
    mesh = make_mesh()
    As, Bs = shard_batch(mesh, (A, B))
    st_single = state
    st_shard = replicate(mesh, state)
    for i in range(3):
        key = jax.random.PRNGKey(100 + i)
        st_single, m_single = model.train_step(st_single, A, B, key, lr)
        st_shard, m_shard = model.train_step(st_shard, As, Bs, key, lr)
        t_s, t_d = float(m_single["total"]), float(m_shard["total"])
        assert abs(t_s - t_d) <= traj_tol * max(abs(t_s), 1e-12), (
            f"loss trajectory diverged at step {i}: {t_s} vs {t_d}")
    diffs = np.concatenate([
        np.abs(np.asarray(pa) - np.asarray(pb)).ravel()
        for pa, pb in zip(jax.tree.leaves(st_single.params),
                          jax.tree.leaves(st_shard.params))])
    bound = 3 * 2.05 * float(lr)          # measured max 8.7e-4 vs 1.23e-3
    assert float(diffs.max()) <= bound, (diffs.max(), bound)
    assert float(diffs.mean()) <= 0.25 * float(lr), diffs.mean()
    # beyond ONE full sign-flip step: measured 0.16%
    assert float((diffs > 2.05 * float(lr)).mean()) < 0.02


def test_lr_schedule_linear():
    class Opt:
        lr_policy = "linear"
        lr = 2e-4
        epoch_count = 1
        n_epochs = 10
        n_epochs_decay = 10
        lr_decay_iters = 50

    s = LRSchedule(Opt())
    assert s.current_lr() == pytest.approx(2e-4)
    for _ in range(10):
        s.step()
    # after 10 steps: factor = 1 - (10 + 1 - 10)/11 = 10/11
    assert s.current_lr() == pytest.approx(2e-4 * 10 / 11)
    for _ in range(9):
        s.step()
    # last training epoch (k=19): factor = 1 - 10/11 = 1/11
    assert s.current_lr() == pytest.approx(2e-4 * 1 / 11)
    s.step()
    assert s.current_lr() == pytest.approx(0.0)
