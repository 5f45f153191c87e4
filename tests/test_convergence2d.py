"""End-to-end 2-D convergence of the paper model on structured synthetic
multi-modal pairs: same geometry rendered as two 'modalities' (soft disk vs
inverted ring) with a known spatial offset.  Verifies the joint losses fall
and registration actually moves the structures together."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfmir_tpu.engine import RegistrationConfig, RegistrationModel


def _pair(rng, size=64):
    cy, cx = rng.integers(24, 40, 2)
    r = rng.integers(12, 18)
    g = np.stack(np.meshgrid(np.arange(size), np.arange(size), indexing="ij"))
    d = np.sqrt((g[0] - cy) ** 2 + (g[1] - cx) ** 2)
    A = np.clip(1 - d / r, 0, 1) * 2.0 - 1.0                  # soft disk
    ring = np.clip(1 - np.abs(d - r * 0.7) / 6.0, 0, 1)
    B = (1 - ring) * 2.0 - 1.0                                # inverted ring
    dy, dx = rng.integers(-4, 5, 2)
    B = np.roll(np.roll(B, dy, 0), dx, 1)
    return (A[None, :, :, None].astype(np.float32),
            B[None, :, :, None].astype(np.float32))


@pytest.mark.slow
class TestJointConvergence:
    def test_losses_fall_and_field_moves(self):
        cfg = RegistrationConfig(crop_size=64, num_patches=64, ngf=16,
                                 netG="resnet_4blocks", nce_layers=(0, 4, 8),
                                 vxm_enc=(8, 16, 16), vxm_dec=(16, 16, 16, 8),
                                 int_steps=5, lr=5e-4)
        model = RegistrationModel(cfg)
        state = model.init_state(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        pairs = [_pair(rng) for _ in range(4)]

        def epoch_loss(state, key):
            tot = {}
            for i, (A, B) in enumerate(pairs):
                state, m = model.train_step(
                    state, jnp.asarray(A), jnp.asarray(B),
                    jax.random.fold_in(key, i), jnp.float32(cfg.lr))
                for k, v in m.items():
                    tot[k] = tot.get(k, 0.0) + float(v) / len(pairs)
            return state, tot

        state, first = epoch_loss(state, jax.random.PRNGKey(1))
        for e in range(12):
            state, last = epoch_loss(state, jax.random.PRNGKey(2 + e))

        # the registration (masked L1) and NCE objectives both improved
        assert last["R"] < first["R"], (first["R"], last["R"])
        assert last["NCE"] < first["NCE"], (first["NCE"], last["NCE"])
        assert all(np.isfinite(v) for v in last.values())

        # the deformation field is actually doing work now (non-trivial
        # displacements) without folding
        A, B = pairs[0]
        _, _, _, flow = model.register(state.params, jnp.asarray(A),
                                       jnp.asarray(B))
        from dfmir_tpu.ops import folding_fraction

        assert float(jnp.abs(flow).max()) > 0.25
        assert float(jnp.max(folding_fraction(flow))) < 0.02
