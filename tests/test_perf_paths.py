"""Perf-path correctness: bf16 compute mode and integral-image NCC."""

import numpy as np

import jax
import jax.numpy as jnp

from dfmir_tpu.engine import RegistrationConfig, RegistrationModel
from dfmir_tpu.losses.similarity import ncc_loss, ncc_map


class TestIntegralNCC:
    def test_matches_conv_2d_3d(self, rng):
        for shape, win in (((2, 40, 40, 1), [9, 9]),
                           ((1, 20, 20, 20, 1), [9, 9, 9]),
                           ((1, 33, 31, 1), [5, 5])):
            I = jnp.asarray(rng.standard_normal(shape), jnp.float32)
            J = jnp.asarray(0.5 * I + 0.5 * rng.standard_normal(shape),
                            jnp.float32)
            a = np.asarray(ncc_map(I, J, win, method="conv"))
            b = np.asarray(ncc_map(I, J, win, method="integral"))
            np.testing.assert_allclose(a, b, atol=1e-4)

    def test_auto_even_window_uses_conv(self, rng):
        I = jnp.asarray(rng.standard_normal((1, 20, 20, 1)), jnp.float32)
        # even window: auto must not crash (falls back to the conv path,
        # which yields the torch n+1 'same' output)
        out = ncc_map(I, I, [4, 4], method="auto")
        assert out.shape[1] == 21

    def test_gradients_match(self, rng):
        I = jnp.asarray(rng.standard_normal((1, 24, 24, 1)), jnp.float32)
        J = jnp.asarray(rng.standard_normal((1, 24, 24, 1)), jnp.float32)
        g_conv = jax.grad(lambda p: ncc_loss(p, J, method="conv"))(I)
        g_int = jax.grad(lambda p: ncc_loss(p, J, method="integral"))(I)
        np.testing.assert_allclose(np.asarray(g_conv), np.asarray(g_int),
                                   atol=1e-4)


class TestBf16Compute:
    def _models(self):
        kw = dict(crop_size=64, num_patches=64, batch_size=1)
        return (RegistrationModel(RegistrationConfig(**kw)),
                RegistrationModel(RegistrationConfig(
                    compute_dtype="bfloat16", **kw)))

    def test_register_close_to_f32(self, rng):
        m32, m16 = self._models()
        params = m32.init_state(jax.random.PRNGKey(0)).params
        A = jnp.asarray(rng.standard_normal((1, 64, 64, 1)), jnp.float32)
        B = jnp.asarray(rng.standard_normal((1, 64, 64, 1)), jnp.float32)
        f32 = m32.register(params, A, B)
        bf16 = m16.register(params, A, B)
        for a, b in zip(f32, bf16):
            assert a.dtype == jnp.float32 and b.dtype == jnp.float32
        # translated image within bf16 tolerance of f32
        assert float(jnp.abs(f32[0] - bf16[0]).max()) < 0.1
        # flow fields are tiny at init; compare absolutely
        assert float(jnp.abs(f32[3] - bf16[3]).max()) < 1e-3

    def test_train_step_finite(self, rng):
        _, m16 = self._models()
        state = m16.init_state(jax.random.PRNGKey(0))
        A = jnp.asarray(rng.standard_normal((1, 64, 64, 1)), jnp.float32)
        B = jnp.asarray(rng.standard_normal((1, 64, 64, 1)), jnp.float32)
        for _ in range(2):
            state, metrics = m16.train_step(
                state, A, B, jax.random.PRNGKey(1), jnp.float32(2e-4))
        assert all(np.isfinite(float(v)) for v in metrics.values())
        # master params stayed f32
        assert all(l.dtype == jnp.float32
                   for l in jax.tree.leaves(state.params))


class TestGanMode:
    def test_gan_train_step(self, rng):
        cfg = RegistrationConfig(crop_size=64, num_patches=64,
                                 lambda_GAN=1.0, ndf=16)
        m = RegistrationModel(cfg)
        assert m.netD is not None
        state = m.init_state(jax.random.PRNGKey(0))
        assert "D" in state.params
        A = jnp.asarray(rng.standard_normal((1, 64, 64, 1)), jnp.float32)
        B = jnp.asarray(rng.standard_normal((1, 64, 64, 1)), jnp.float32)
        d0 = jax.tree.leaves(state.params["D"])[0].copy()
        for _ in range(2):
            state, metrics = m.train_step(
                state, A, B, jax.random.PRNGKey(1), jnp.float32(2e-4))
        for k in ("G", "G_GAN", "D", "D_fake", "D_real", "R"):
            assert k in metrics and np.isfinite(float(metrics[k])), k
        # D actually trained
        assert float(jnp.abs(jax.tree.leaves(
            state.params["D"])[0] - d0).max()) > 0


class TestFlipEquivariance:
    def test_fastcut_flip_step(self, rng):
        cfg = RegistrationConfig(crop_size=64, num_patches=64,
                                 flip_equivariance=True, nce_idt=False,
                                 lambda_NCE=10.0)
        m = RegistrationModel(cfg)
        state = m.init_state(jax.random.PRNGKey(0))
        A = jnp.asarray(rng.standard_normal((1, 64, 64, 1)), jnp.float32)
        B = jnp.asarray(rng.standard_normal((1, 64, 64, 1)), jnp.float32)
        # run with keys landing on both coin outcomes (copy per call:
        # train_step donates its state argument)
        vals = []
        for seed in range(4):
            _, metrics = m.train_step(jax.tree.map(jnp.copy, state), A, B,
                                      jax.random.PRNGKey(seed),
                                      jnp.float32(2e-4))
            vals.append(float(metrics["total"]))
            assert np.isfinite(vals[-1])
        assert len(set(round(v, 6) for v in vals)) > 1  # coin varies losses
