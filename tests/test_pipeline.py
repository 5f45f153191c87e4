"""Data pipeline + options + checkpoints + CLI end-to-end tests."""

import argparse
import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

from dfmir_tpu.data import (
    DataLoader, UnalignedDataset, apply_transform, create_dataset,
    make_dataset, prefetch_to_device,
)
from dfmir_tpu.options import TestOptions, TrainOptions


def _mk_images(root, phase, n_a=4, n_b=3, size=80):
    rng = np.random.default_rng(0)
    for side, n in (("A", n_a), ("B", n_b)):
        d = os.path.join(root, f"{phase}{side}")
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            arr = (rng.random((size, size)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"img_{i:03d}.png"))


def _opt(dataroot, **kw):
    base = dict(dataroot=dataroot, phase="train", isTrain=True,
                preprocess="resize_and_crop", load_size=72, crop_size=64,
                no_flip=False, serial_batches=False, num_threads=0,
                batch_size=2, max_dataset_size=float("inf"), n_epochs=10,
                seed=0, dataset_mode="unaligned", direction="AtoB")
    base.update(kw)
    return argparse.Namespace(**base)


class TestTransforms:
    def test_resize_and_crop_shape_range(self, tmp_path):
        img = Image.fromarray(
            (np.random.default_rng(0).random((100, 90)) * 255).astype(
                np.uint8))
        opt = _opt(str(tmp_path))
        out = apply_transform(opt, img, rng=np.random.default_rng(1))
        assert out.shape == (64, 64, 1)
        assert out.dtype == np.float32
        assert out.min() >= -1.0 and out.max() <= 1.0

    def test_make_power_2(self, tmp_path):
        img = Image.fromarray(np.zeros((67, 70), np.uint8))
        opt = _opt(str(tmp_path), preprocess="none", no_flip=True)
        out = apply_transform(opt, img, rng=np.random.default_rng(1))
        assert out.shape[0] % 4 == 0 and out.shape[1] % 4 == 0

    def test_flip_param_respected(self, tmp_path):
        arr = np.arange(64 * 64, dtype=np.uint8).reshape(64, 64) % 255
        img = Image.fromarray(arr)
        opt = _opt(str(tmp_path), preprocess="none", load_size=64)
        from dfmir_tpu.data import TransformParams

        a = apply_transform(opt, img, params=TransformParams(flip=False))
        b = apply_transform(opt, img, params=TransformParams(flip=True))
        np.testing.assert_allclose(a, b[:, ::-1])

    def test_uint8_transfer_matches_float_path(self, tmp_path):
        """uint8 pixels + device-side dequant == host float normalize
        within 1 ulp (the transform chain is PIL/uint8 end to end)."""
        from dfmir_tpu.models.registration import _dequant_u8

        img = Image.fromarray(
            (np.random.default_rng(3).random((100, 90)) * 255).astype(
                np.uint8))
        opt = _opt(str(tmp_path))
        f = apply_transform(opt, img, rng=np.random.default_rng(5))
        u = apply_transform(opt, img, rng=np.random.default_rng(5),
                            out_dtype="uint8")
        assert u.dtype == np.uint8 and u.shape == f.shape
        d = np.asarray(_dequant_u8(u))
        assert np.abs(d - f).max() <= 1.2e-7

    def test_decoded_image_cache(self, tmp_path):
        from dfmir_tpu.data.image_folder import load_image

        p = tmp_path / "x.png"
        Image.fromarray(np.zeros((8, 8), np.uint8)).save(p)
        a = load_image(str(p), cache_mb=8)
        b = load_image(str(p), cache_mb=8)
        assert a is b and a.mode == "L"
        c = load_image(str(p), grayscale=False, cache_mb=8)
        assert c is not a


class TestUnaligned:
    def test_pairing_and_len(self, tmp_path):
        _mk_images(tmp_path, "train", n_a=4, n_b=3)
        ds = UnalignedDataset(_opt(str(tmp_path)))
        assert len(ds) == 4
        s = ds[3]
        assert s["A_paths"].endswith("img_003.png")
        assert s["B_paths"].endswith("img_000.png")  # 3 % 3 == 0
        assert s["A"].shape == (64, 64, 1)

    def test_reproducible_samples(self, tmp_path):
        _mk_images(tmp_path, "train")
        ds = UnalignedDataset(_opt(str(tmp_path)))
        ds.set_epoch(2)
        a1 = ds[1]["A"]
        a2 = ds[1]["A"]
        np.testing.assert_array_equal(a1, a2)
        ds.set_epoch(3)
        assert np.abs(ds[1]["A"] - a1).max() > 0  # new epoch, new aug

    def test_finetune_switch(self, tmp_path):
        _mk_images(tmp_path, "train")
        opt = _opt(str(tmp_path), n_epochs=2)
        ds = UnalignedDataset(opt)
        ds.set_epoch(3)  # past n_epochs: load_size -> crop_size
        assert ds._effective_opt().load_size == 64
        ds.set_epoch(1)
        assert ds._effective_opt().load_size == 72


class TestLoader:
    def test_batching_drop_last(self, tmp_path):
        _mk_images(tmp_path, "train", n_a=5, n_b=5)
        opt = _opt(str(tmp_path), batch_size=2)
        loader = create_dataset(opt)
        batches = list(loader)
        assert len(batches) == 2  # 5 -> drop_last -> 4 samples
        assert batches[0]["A"].shape == (2, 64, 64, 1)
        assert isinstance(batches[0]["A_paths"], list)

    def test_shuffle_epoch_determinism(self, tmp_path):
        _mk_images(tmp_path, "train", n_a=6, n_b=6)
        opt = _opt(str(tmp_path), batch_size=2, no_flip=True)
        loader = create_dataset(opt)
        loader.set_epoch(1)
        p1 = [b["A_paths"] for b in loader]
        loader.set_epoch(1)
        p2 = [b["A_paths"] for b in loader]
        assert p1 == p2
        loader.set_epoch(2)
        p3 = [b["A_paths"] for b in loader]
        assert p1 != p3

    def test_threaded_matches_serial(self, tmp_path):
        _mk_images(tmp_path, "train", n_a=4, n_b=4)
        opt = _opt(str(tmp_path), batch_size=2, serial_batches=True)
        serial = list(create_dataset(opt))
        opt.num_threads = 3
        threaded = list(create_dataset(opt))
        for s, t in zip(serial, threaded):
            np.testing.assert_array_equal(s["A"], t["A"])

    def test_prefetch_to_device(self, tmp_path):
        _mk_images(tmp_path, "train", n_a=2, n_b=2)
        opt = _opt(str(tmp_path), batch_size=1, serial_batches=True)
        out = list(prefetch_to_device(iter(create_dataset(opt))))
        assert len(out) == 2
        import jax

        assert isinstance(out[0]["A"], jax.Array)

    def test_max_dataset_size(self, tmp_path):
        _mk_images(tmp_path, "train", n_a=6, n_b=6)
        opt = _opt(str(tmp_path), batch_size=1, max_dataset_size=3)
        assert len(list(create_dataset(opt))) == 3


class TestOptionsParsing:
    def test_cut_defaults(self, tmp_path):
        opt = TrainOptions(
            cmd_line=f"--dataroot {tmp_path} --checkpoints_dir "
                     f"{tmp_path}/ck --name t").parse()
        assert opt.nce_idt is True          # CUT branch
        assert opt.lambda_NCE == 0.25
        assert opt.pool_size == 0
        assert opt.isTrain is True
        assert os.path.exists(f"{tmp_path}/ck/t/train_opt.txt")

    def test_fastcut_defaults(self, tmp_path):
        opt = TrainOptions(
            cmd_line=f"--dataroot {tmp_path} --checkpoints_dir "
                     f"{tmp_path}/ck --name t --CUT_mode FastCUT").parse()
        assert opt.nce_idt is False
        assert opt.lambda_NCE == 10.0
        assert opt.flip_equivariance is True
        assert opt.n_epochs_decay == 50

    def test_test_options(self, tmp_path):
        opt = TestOptions(
            cmd_line=f"--dataroot {tmp_path} --checkpoints_dir "
                     f"{tmp_path}/ck --name t --crop_size 128").parse()
        assert opt.isTrain is False
        assert opt.phase == "test"
        # load_size == default crop_size (not the overridden one: reference
        # parity — set_defaults happens at parser construction)
        assert opt.load_size == 256

    def test_suffix(self, tmp_path):
        opt = TrainOptions(
            cmd_line=f"--dataroot {tmp_path} --checkpoints_dir "
                     f"{tmp_path}/ck --name t --suffix {{model}}").parse()
        assert opt.name == "t_registration"


class TestCheckpoints:
    def test_roundtrip(self, tmp_path):
        import jax
        from dfmir_tpu.engine import RegistrationConfig, RegistrationModel
        from dfmir_tpu.engine import checkpoints as ckpt

        cfg = RegistrationConfig(crop_size=64, num_patches=16,
                                 nce_layers=(0, 4), netG="resnet_4blocks")
        model = RegistrationModel(cfg)
        state = model.init_state(jax.random.PRNGKey(0))
        ckpt.save_networks(str(tmp_path), "latest", state.params,
                           opt_extras={"opt_state": state.opt_state,
                                       "step": state.step})
        zeroed = jax.tree.map(lambda x: x * 0, state.params)
        loaded = ckpt.load_networks(str(tmp_path), "latest",
                                    ["G", "F", "R"], templates=zeroed)
        for net in ("G", "F", "R"):
            a = jax.tree.leaves(state.params[net])
            b = jax.tree.leaves(loaded[net])
            assert all(np.array_equal(x, y) for x, y in zip(a, b))
        optim = ckpt.load_optim(
            str(tmp_path), "latest",
            {"opt_state": state.opt_state, "step": state.step})
        assert optim is not None
        assert int(optim["step"]) == 0


@pytest.mark.slow
class TestEndToEnd:
    def test_train_then_test_cli(self, tmp_path, monkeypatch):
        import train as train_script
        import test as test_script

        data = tmp_path / "data"
        _mk_images(data, "train", n_a=2, n_b=2)
        _mk_images(data, "test", n_a=2, n_b=2)
        lab = data / "trainA_label"
        lab.mkdir()
        for i in range(2):
            Image.fromarray(
                (np.random.default_rng(i).integers(0, 4, (64, 64)) * 60
                 ).astype(np.uint8)).save(lab / f"img_{i:03d}.png")

        common = ["--dataroot", str(data), "--name", "e2e",
                  "--checkpoints_dir", str(tmp_path / "ckpt"),
                  "--load_size", "64", "--crop_size", "64",
                  "--num_patches", "64", "--batch_size", "1"]
        monkeypatch.setattr(sys, "argv", ["train.py", *common,
                            "--n_epochs", "1", "--n_epochs_decay", "0",
                            "--save_epoch_freq", "1", "--print_freq", "1"])
        train_script.main()
        ckdir = tmp_path / "ckpt" / "e2e"
        assert (ckdir / "latest_net_G.msgpack").exists()
        assert (ckdir / "latest_net_R.msgpack").exists()
        assert (ckdir / "loss_log.txt").read_text().count("epoch: 1") >= 1
        hist = [json.loads(l) for l in
                (ckdir / "loss_history.jsonl").read_text().splitlines()]
        assert all(np.isfinite(list(h["losses"].values())).all()
                   for h in hist)

        monkeypatch.setattr(sys, "argv", ["test.py", *common,
                            "--results_dir", str(tmp_path / "results"),
                            "--num_test", "2"])
        test_script.main()
        assert (data / "deform_label" / "img_000.png").exists()
        assert (data / "deform_trainA" / "img_001.png").exists()
        assert (tmp_path / "results" / "e2e" / "test_latest" /
                "index.html").exists()
        # warped label should only contain the original label values
        orig = np.asarray(Image.open(lab / "img_000.png"))
        warped = np.asarray(Image.open(data / "deform_label"
                                       / "img_000.png"))
        assert set(np.unique(warped)) <= set(np.unique(orig))


class TestCorrectResize:
    def test_correct_resize_and_label(self):
        from dfmir_tpu.utils.util import correct_resize, correct_resize_label

        arr = np.linspace(-1, 1, 16 * 16, dtype=np.float32).reshape(
            1, 16, 16, 1)
        out = correct_resize(arr, (8, 8))
        assert out.shape == (1, 8, 8, 1)
        assert -1.0 <= out.min() and out.max() <= 1.0

        lab = np.zeros((1, 16, 16, 1), np.int64)
        lab[0, 8:, 8:] = 3
        out = correct_resize_label(lab, (8, 8))
        assert out.shape == (1, 8, 8)
        assert set(np.unique(out)) <= {0, 3}
