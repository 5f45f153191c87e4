"""Evaluation metrics + affine warp + random deformation augmentation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dfmir_tpu.metrics import (
    deepsim, dice_score, hausdorff_distance, label_dice, ncc_metric, psnr,
)
from dfmir_tpu.ops import (
    affine_to_flow, affine_warp, augment, centered_affine, identity_grid,
    random_affine_matrix, random_deformation, warp,
)


class TestSegMetrics:
    def test_dice(self):
        a = np.zeros((10, 10), bool)
        b = np.zeros((10, 10), bool)
        a[2:6, 2:6] = True
        b[2:6, 2:6] = True
        assert dice_score(a, b) == 1.0
        b[:] = False
        b[4:8, 2:6] = True
        assert 0 < dice_score(a, b) < 1
        assert dice_score(np.zeros((3, 3)), np.zeros((3, 3))) == 1.0

    def test_label_dice(self):
        p = np.array([[0, 1, 1], [2, 2, 0]])
        t = np.array([[0, 1, 0], [2, 2, 2]])
        d = label_dice(p, t)
        assert set(d) == {1, 2}
        assert d[1] == pytest.approx(2 * 1 / 3)
        assert d[2] == pytest.approx(2 * 2 / 5)

    def test_hausdorff(self):
        a = np.zeros((20, 20), bool)
        b = np.zeros((20, 20), bool)
        a[5, 5] = True
        b[5, 9] = True
        assert hausdorff_distance(a, b) == pytest.approx(4.0)
        assert hausdorff_distance(a, a) == 0.0
        assert hausdorff_distance(a, np.zeros((20, 20), bool)) == float("inf")

    def test_hd95(self):
        a = np.zeros((30, 30), bool)
        b = np.zeros((30, 30), bool)
        a[10:20, 10] = True
        b[10:20, 12] = True
        b[25, 25] = True  # outlier
        full = hausdorff_distance(a, b)
        h95 = hausdorff_distance(a, b, percentile=95)
        assert h95 < full


class TestImageMetrics:
    def test_ncc_psnr(self, rng):
        a = rng.standard_normal((32, 32))
        assert ncc_metric(a, a) == pytest.approx(1.0, abs=1e-6)
        assert ncc_metric(a, -a) == pytest.approx(-1.0, abs=1e-6)
        assert psnr(a, a) == float("inf")
        assert psnr(a, a + 0.1) > psnr(a, a + 0.5)

    def test_deepsim_with_generator_taps(self, rng):
        from dfmir_tpu.nets import ResnetGenerator

        net = ResnetGenerator(n_blocks=4, ngf=8)
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 1)), jnp.float32)
        params = net.init(jax.random.PRNGKey(0), x)["params"]

        def extractor(v):
            return net.apply({"params": params}, v, layers=(0, 4),
                             encode_only=True)

        assert deepsim(x, x, extractor) == pytest.approx(1.0, abs=1e-3)
        y = jnp.asarray(rng.standard_normal((1, 64, 64, 1)), jnp.float32)
        assert deepsim(x, y, extractor) < 1.0


class TestAffine:
    def test_identity_matrix_is_noop(self, rng):
        src = jnp.asarray(rng.standard_normal((2, 16, 16, 1)), jnp.float32)
        eye = jnp.tile(jnp.eye(2, 3)[None], (2, 1, 1))
        out = affine_warp(src, eye)
        np.testing.assert_allclose(np.asarray(out), np.asarray(src),
                                   atol=1e-6)

    def test_translation(self, rng):
        src = jnp.asarray(rng.standard_normal((1, 16, 16, 1)), jnp.float32)
        m = jnp.asarray([[[1.0, 0.0, 2.0], [0.0, 1.0, 0.0]]])  # +2 on axis 0
        out = affine_warp(src, m)
        # output[i] = src[i + 2]
        np.testing.assert_allclose(np.asarray(out)[0, :14],
                                   np.asarray(src)[0, 2:], atol=1e-6)

    def test_centered_rotation_preserves_center(self):
        a = jnp.float32(0.3)
        lin = jnp.asarray([[[jnp.cos(a), -jnp.sin(a)],
                            [jnp.sin(a), jnp.cos(a)]]])
        m = centered_affine((17, 17), lin)
        flow = affine_to_flow(m, (17, 17))
        # center pixel does not move
        np.testing.assert_allclose(np.asarray(flow)[0, 8, 8], [0, 0],
                                   atol=1e-5)

    def test_affine_flow_equals_affine_warp(self, rng):
        src = jnp.asarray(rng.standard_normal((1, 16, 16, 1)), jnp.float32)
        m = centered_affine((16, 16),
                            jnp.asarray([[[1.05, 0.02], [-0.03, 0.97]]]),
                            jnp.asarray([[0.5, -0.3]]))
        direct = affine_warp(src, m)
        via_flow = warp(src, affine_to_flow(m, (16, 16)))
        np.testing.assert_allclose(np.asarray(direct), np.asarray(via_flow),
                                   atol=1e-5)


class TestAugment:
    def test_random_affine_shapes(self):
        m2 = random_affine_matrix(jax.random.PRNGKey(0), 4, (32, 32))
        assert m2.shape == (4, 2, 3)
        m3 = random_affine_matrix(jax.random.PRNGKey(0), 2, (16, 16, 16))
        assert m3.shape == (2, 3, 4)

    def test_random_deformation_smooth_and_invertible(self):
        flow = random_deformation(jax.random.PRNGKey(1), 2, (32, 32),
                                  max_rotation=5.0, max_translation=2.0,
                                  svf_std=0.5)
        assert flow.shape == (2, 32, 32, 2)
        from dfmir_tpu.ops import folding_fraction

        # per-batch folding fraction: should be 0 (diffeomorphic-ish)
        assert float(jnp.max(folding_fraction(flow))) == 0.0

    def test_augment_label_consistency(self, rng):
        src = jnp.asarray(rng.standard_normal((1, 32, 32, 1)), jnp.float32)
        lab = jnp.asarray((rng.integers(0, 3, (1, 32, 32, 1))).astype(
            np.float32))
        aug, lab_aug, flow = augment(src, jax.random.PRNGKey(2), label=lab,
                                     svf_std=0.5, max_translation=2.0)
        assert aug.shape == src.shape
        # nearest label warp introduces no new label values
        assert set(np.unique(np.asarray(lab_aug))) <= \
            set(np.unique(np.asarray(lab)))
        # zero deformation params -> identity
        aug0, flow0 = augment(src, jax.random.PRNGKey(3), max_rotation=0.0,
                              max_scaling=0.0, max_translation=0.0,
                              svf_std=0.0)
        np.testing.assert_allclose(np.asarray(aug0), np.asarray(src),
                                   atol=1e-5)


class TestLossRegistryAndPool:
    def test_registry_names_and_dispatch(self, rng):
        from dfmir_tpu.losses import DICT_LOSSES, get_loss

        expected = {"L1", "L2", "TukeyBiweight", "PatchNCE", "Grad", "NCC",
                    "NMI", "CrossEntropy", "NLL", "Dice", "WGAN", "LSGAN",
                    "GradPenGAN"}
        assert expected == set(DICT_LOSSES)
        a = jnp.asarray(rng.standard_normal((1, 8, 8, 1)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((1, 8, 8, 1)), jnp.float32)
        assert float(get_loss("L2")(a, b)) > 0
        assert float(get_loss("TukeyBiweight")(a, b)) > 0
        with pytest.raises(KeyError):
            get_loss("nope")

    def test_masked_l2_and_tukey(self, rng):
        from dfmir_tpu.losses import masked_l2, tukey_biweight

        a = jnp.ones((1, 4, 4, 1))
        b = jnp.zeros((1, 4, 4, 1))
        mask = jnp.zeros((1, 4, 4, 1)).at[0, :2].set(1.0)
        assert float(masked_l2(a, b, mask)) == pytest.approx(1.0)
        # tukey saturates at c^2/6 for large errors
        c = 0.8
        assert float(tukey_biweight(a * 100, b, c=c)) == \
            pytest.approx(c ** 2 / 6)

    def test_cross_entropy_nll(self):
        from dfmir_tpu.losses import cross_entropy_loss, nll_loss
        import jax

        logits = jnp.asarray([[[[10.0, -10.0]]]])  # (1,1,1,2)
        onehot = jnp.asarray([[[[1.0, 0.0]]]])
        assert float(cross_entropy_loss(logits, onehot)) < 1e-3
        logp = jax.nn.log_softmax(logits, axis=-1)
        assert float(nll_loss(logp, onehot)) < 1e-3

    def test_image_pool(self):
        from dfmir_tpu.utils import ImagePool

        pool = ImagePool(pool_size=0)
        x = np.arange(8, dtype=np.float32).reshape(2, 2, 2)
        assert pool.query(x) is x  # passthrough

        pool = ImagePool(pool_size=4, seed=0)
        seen = []
        for i in range(10):
            batch = np.full((2, 2, 2), float(i), np.float32)
            out = pool.query(batch)
            assert out.shape == batch.shape
            seen.extend(np.unique(out).tolist())
        assert len(pool.images) == 4
        assert len(set(seen)) > 1  # history actually mixed in
