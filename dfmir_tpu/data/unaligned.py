"""Unpaired A/B dataset (capability of
/root/reference/data/unaligned_dataset.py:9-87).

Loads sorted file lists from ``{dataroot}/{phase}A`` and ``{phase}B`` (with
the test->val fallback), pairs ``A[i]`` with ``B[i % B_size]`` (the
reference pairs deterministically in both serial and "random" mode — its
random branch is commented out), applies a joint 50% horizontal flip to the
pair in training, and switches ``load_size -> crop_size`` once the decay
phase starts (FastCUT finetuning, reference :67-68).

TPU-first deltas: samples are numpy HWC float32 in [-1,1]; randomness comes
from a per-(epoch, index) seeded Generator so any worker thread reproduces
the same sample.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
from PIL import Image

from dfmir_tpu.data.image_folder import load_image, make_dataset
from dfmir_tpu.data.transforms import apply_transform


class UnalignedDataset:
    def __init__(self, opt):
        self.opt = opt
        self.isTrain = getattr(opt, "isTrain", opt.phase == "train")
        self.current_epoch = 0
        self.dir_A = os.path.join(opt.dataroot, opt.phase + "A")
        self.dir_B = os.path.join(opt.dataroot, opt.phase + "B")
        if (opt.phase == "test" and not os.path.exists(self.dir_A)
                and os.path.exists(os.path.join(opt.dataroot, "valA"))):
            self.dir_A = os.path.join(opt.dataroot, "valA")
            self.dir_B = os.path.join(opt.dataroot, "valB")
        self.A_paths = sorted(make_dataset(self.dir_A, opt.max_dataset_size))
        self.B_paths = sorted(make_dataset(self.dir_B, opt.max_dataset_size))
        self.A_size = len(self.A_paths)
        self.B_size = len(self.B_paths)
        self.seed = int(getattr(opt, "seed", 0) or 0)

    @staticmethod
    def modify_commandline_options(parser, is_train):
        return parser

    def set_epoch(self, epoch: int) -> None:
        self.current_epoch = epoch

    def __len__(self) -> int:
        return max(self.A_size, self.B_size)

    def _effective_opt(self):
        # FastCUT finetuning: once decay starts, stop resize-crop aug.
        is_finetuning = (self.isTrain
                         and self.current_epoch > self.opt.n_epochs)
        if not is_finetuning or self.opt.load_size == self.opt.crop_size:
            return self.opt
        import copy
        opt = copy.copy(self.opt)
        opt.load_size = opt.crop_size
        return opt

    def __getitem__(self, index: int) -> Dict:
        A_path = self.A_paths[index % self.A_size]
        B_path = self.B_paths[index % self.B_size]
        rng = np.random.default_rng(
            (self.seed, self.current_epoch, index))
        cache_mb = float(getattr(self.opt, "cache_images_mb", 0) or 0)
        A_img = load_image(A_path, grayscale=True, cache_mb=cache_mb)
        B_img = load_image(B_path, grayscale=True, cache_mb=cache_mb)
        if self.isTrain and rng.random() > 0.5:
            A_img = A_img.transpose(Image.FLIP_LEFT_RIGHT)
            B_img = B_img.transpose(Image.FLIP_LEFT_RIGHT)
        opt = self._effective_opt()
        # uint8 transfer: ship raw pixels (1 byte/px) and normalize on
        # device — exact vs the float path, 4x less H2D traffic.
        dt = "uint8" if getattr(opt, "uint8_transfer", False) else "float32"
        A = apply_transform(opt, A_img, grayscale=True, rng=rng,
                            out_dtype=dt)
        B = apply_transform(opt, B_img, grayscale=True, rng=rng,
                            out_dtype=dt)
        return {"A": A, "B": B, "A_paths": A_path, "B_paths": B_path}
