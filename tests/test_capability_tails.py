"""Round-2 capability tails: pynd patchlib, per-patient-site datasets,
learned-affine localization (VERDICT round-1 item 8)."""

import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from dfmir_tpu.utils import patchlib


class TestPatchlib:
    def test_gridsize_and_volsize_roundtrip(self):
        gs, new_vol = patchlib.gridsize((10, 12), (4, 4), patch_stride=2,
                                        nargout=2)
        np.testing.assert_array_equal(gs, [4, 5])
        np.testing.assert_array_equal(
            new_vol, patchlib.grid2volsize(gs, (4, 4), 2))

    def test_grid_idx_matches_sub(self):
        idx = patchlib.grid((9, 9), (3, 3), patch_stride=3)
        sub = patchlib.grid((9, 9), (3, 3), patch_stride=3,
                            grid_type="sub")
        np.testing.assert_array_equal(
            idx, np.ravel_multi_index(tuple(sub.T), (9, 9)))

    def test_patch_gen_contents(self):
        vol = np.arange(36.0).reshape(6, 6)
        p = patchlib.patch_gen(vol, (3, 3), stride=3)
        assert p.shape == (4, 3, 3)
        np.testing.assert_array_equal(p[0], vol[:3, :3])
        np.testing.assert_array_equal(p[3], vol[3:, 3:])

    @pytest.mark.parametrize("stride", [1, 2, 3])
    def test_quilt_reconstructs_volume(self, rng, stride):
        vol = rng.standard_normal((7, 9))
        gs = patchlib.gridsize(vol.shape, (3, 3), stride)
        cropped = patchlib.grid2volsize(gs, (3, 3), stride)
        patches = patchlib.patch_gen(vol, (3, 3), stride=stride)
        rec = patchlib.quilt(patches.reshape(len(patches), -1), (3, 3), gs,
                             patch_stride=stride)
        np.testing.assert_allclose(
            rec, vol[: cropped[0], : cropped[1]], atol=1e-12)

    def test_quilt_3d_with_K_candidates(self, rng):
        vol = rng.standard_normal((6, 6, 6))
        patches = patchlib.patch_gen(vol, (2, 2, 2), stride=2)
        lib = patches.reshape(len(patches), -1)
        libK = np.stack([lib, lib], axis=-1)  # two identical candidates
        rec = patchlib.quilt(libK, (2, 2, 2), (3, 3, 3), patch_stride=2)
        np.testing.assert_allclose(rec, vol, atol=1e-12)

    def test_stack_layers_cover_without_overlap(self, rng):
        vol = rng.standard_normal((8, 8))
        patches = patchlib.patch_gen(vol, (4, 4), stride=2)
        gs = patchlib.gridsize((8, 8), (4, 4), 2)
        layers = patchlib.stack(patches.reshape(len(patches), -1),
                                (4, 4), gs, 2)
        assert layers.shape[0] == 4  # ceil(4/2)^2
        # each voxel covered at least once; layer-mean == quilt mean
        counts = (~np.isnan(layers)).sum(0)
        assert counts.min() >= 1
        np.testing.assert_allclose(
            np.nanmean(layers, axis=0),
            patchlib.quilt(patches.reshape(len(patches), -1), (4, 4), gs, 2),
            atol=1e-12)

    def test_quilt_nanmedian_path(self, rng):
        vol = rng.standard_normal((6, 6))
        patches = patchlib.patch_gen(vol, (3, 3), stride=3)
        rec = patchlib.quilt(patches.reshape(4, -1), (3, 3), (2, 2), 3,
                             nan_func_layers=np.nanmedian)
        np.testing.assert_allclose(rec, vol, atol=1e-12)


def _write_png(path, rng, size=70):
    Image.fromarray(
        (rng.random((size, size)) * 255).astype(np.uint8)).save(path)


class _Opt:
    phase = "train"
    isTrain = True
    crop_size = 64
    load_size = 64
    preprocess = "crop"
    no_flip = True
    max_dataset_size = float("inf")
    seed = 0
    serial_batches = True
    batch_size = 2
    num_threads = 0
    dataset_mode = "patient_site"


class TestPatientSiteDataset:
    @pytest.fixture()
    def root(self, tmp_path, rng):
        for site in ["site0", "site1", "site2"]:
            for mod in ["t1", "t2"]:
                d = tmp_path / site / mod
                d.mkdir(parents=True)
                for i in range(3):
                    _write_png(str(d / f"s{i:02d}.png"), rng)
        return str(tmp_path)

    def test_site_random_pairing(self, root):
        from dfmir_tpu.data.patient_site import PatientSiteDataset

        opt = _Opt()
        opt.dataroot = root
        ds = PatientSiteDataset(opt)
        assert len(ds) == 9
        sample = ds[4]
        # A comes from site index 4//3=1, slice 1; B from a random site at
        # the SAME slice index (reference dataset.py:133-136)
        assert os.sep + "t1" + os.sep in sample["A_paths"]
        assert sample["A_paths"].endswith("s01.png")
        assert sample["B_paths"].endswith("s01.png")
        assert os.sep + "t2" + os.sep in sample["B_paths"]
        assert sample["A"].shape == (64, 64, 1)
        assert sample["A"].min() >= -1.0 and sample["A"].max() <= 1.0
        np.testing.assert_array_equal(sample["C"], sample["A"])
        # deterministic per (seed, epoch, index)
        np.testing.assert_array_equal(ds[4]["B"], sample["B"])

    def test_loader_integration(self, root):
        from dfmir_tpu.data.loader import create_dataset

        opt = _Opt()
        opt.dataroot = root
        loader = create_dataset(opt)
        batch = next(iter(loader))
        assert batch["A"].shape == (2, 64, 64, 1)


class TestTripletDataset:
    def test_triplet_streams(self, tmp_path, rng):
        for d in ["trainA", "trainB"]:
            (tmp_path / d).mkdir()
            for i in range(2):
                _write_png(str(tmp_path / d / f"x{i}.png"), rng)
        from dfmir_tpu.data.triplet import TripletDataset

        opt = _Opt()
        opt.dataset_mode = "triplet"
        opt.dataroot = str(tmp_path)
        ds = TripletDataset(opt)
        s = ds[1]
        assert {"A", "B", "C"} <= set(s)
        assert s["C_paths"].startswith(str(tmp_path / "trainA"))


class TestAffineRegistration:
    def test_identity_at_init(self, rng):
        from dfmir_tpu.nets.affine_net import AffineRegistration

        net = AffineRegistration(ndims=2)
        mov = jnp.asarray(rng.standard_normal((2, 32, 32, 1)), jnp.float32)
        fix = jnp.asarray(rng.standard_normal((2, 32, 32, 1)), jnp.float32)
        vs = net.init(jax.random.PRNGKey(0), mov, fix)
        warped, matrix, flow = net.apply(vs, mov, fix)
        # zero-initialized regressor -> exact identity transform
        np.testing.assert_allclose(np.asarray(warped), np.asarray(mov),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(flow), 0.0, atol=1e-5)
        eye = np.broadcast_to(np.eye(2), (2, 2, 2))
        np.testing.assert_allclose(np.asarray(matrix[:, :, :2]), eye,
                                   atol=1e-6)

    def test_3d_and_gradients(self, rng):
        from dfmir_tpu.nets.affine_net import AffineRegistration

        net = AffineRegistration(ndims=3, enc_features=(4, 8))
        mov = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 1)),
                          jnp.float32)
        fix = jnp.asarray(rng.standard_normal((1, 16, 16, 16, 1)),
                          jnp.float32)
        vs = net.init(jax.random.PRNGKey(0), mov, fix)

        def loss(v):
            warped, _, _ = net.apply(v, mov, fix)
            return jnp.mean((warped - fix) ** 2)

        g = jax.grad(loss)(vs)
        norms = [float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g)]
        assert np.isfinite(sum(norms))
        # localization tower receives gradient through the warp
        assert any(n > 0 for n in norms)
