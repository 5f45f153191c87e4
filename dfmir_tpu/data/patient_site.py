"""Per-patient-site medical slice datasets.

Capability of the reference's alternate medical loaders
(/root/reference/models/voxelmorph/dataset.py:39-146):

- ``PatientSiteDataset`` (``--dataset_mode patient_site``) mirrors
  ``medical_dataset_patient_site_random``: the dataroot holds one directory
  per patient/site, each with ``t1/`` and ``t2/`` slice folders; sample i
  pairs A = (site s, slice k) with B = (RANDOM site, same slice index k) —
  cross-site pairing at a fixed anatomical position.  The reference also
  returns the A slice a second time as "C" (the original modality); kept.

- ``TripletDataset`` (``--dataset_mode triplet``) mirrors
  ``medical_dataset_unpair``: sorted ``{phase}A``/``{phase}B`` pairs plus a
  third stream C drawn from ``trainA`` (the untranslated original-modality
  images, reference :54-57).

TPU-first deltas: numpy HWC float32 in [-1,1]; randomness is a
per-(epoch, index) seeded Generator so worker threads are reproducible; the
reference's CenterCrop(crop_size) + Normalize(0.5, 0.5) becomes the shared
transform chain in crop-only mode.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np
from PIL import Image

from dfmir_tpu.data.image_folder import make_dataset
from dfmir_tpu.data.transforms import apply_transform


def _center_crop_tensor(img: Image.Image, size: int) -> np.ndarray:
    """CenterCrop(size) -> grayscale -> [-1,1] HWC float32 (the reference's
    transform stack, dataset.py:124-128)."""
    img = img.convert("L")
    w, h = img.size
    left = (w - size) // 2
    top = (h - size) // 2
    img = img.crop((left, top, left + size, top + size))
    arr = np.asarray(img, np.float32) / 255.0
    return (arr * 2.0 - 1.0)[..., None]


class PatientSiteDataset:
    def __init__(self, opt):
        self.opt = opt
        self.isTrain = getattr(opt, "isTrain", opt.phase == "train")
        self.current_epoch = 0
        self.seed = int(getattr(opt, "seed", 0) or 0)
        root = opt.dataroot
        sites = sorted(
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d, "t1")))
        if not sites:
            raise RuntimeError(
                f"{root}: no site directories with t1/ subfolders")
        self.A = []
        self.B = []
        for site in sites:
            self.A.append(sorted(make_dataset(os.path.join(root, site, "t1"))))
            self.B.append(sorted(make_dataset(os.path.join(root, site, "t2"))))
        self.dir_size = len(self.A[0])
        self.n_sites = len(self.A)

    @staticmethod
    def modify_commandline_options(parser, is_train):
        return parser

    def set_epoch(self, epoch: int) -> None:
        self.current_epoch = epoch

    def __len__(self) -> int:
        return self.n_sites * self.dir_size

    def __getitem__(self, index: int) -> Dict:
        rng = np.random.default_rng((self.seed, self.current_epoch, index))
        site = index // self.dir_size
        k = index % self.dir_size
        b_site = int(rng.integers(0, self.n_sites))
        A_path = self.A[site][k]
        B_path = self.B[b_site][k % len(self.B[b_site])]
        size = self.opt.crop_size
        A = _center_crop_tensor(Image.open(A_path), size)
        B = _center_crop_tensor(Image.open(B_path), size)
        return {"A": A, "B": B, "C": A.copy(),
                "A_paths": A_path, "B_paths": B_path}


class TripletDataset:
    def __init__(self, opt):
        self.opt = opt
        self.isTrain = getattr(opt, "isTrain", opt.phase == "train")
        self.current_epoch = 0
        self.seed = int(getattr(opt, "seed", 0) or 0)
        root = opt.dataroot
        self.A_paths = sorted(make_dataset(
            os.path.join(root, opt.phase + "A"), opt.max_dataset_size))
        self.B_paths = sorted(make_dataset(
            os.path.join(root, opt.phase + "B"), opt.max_dataset_size))
        c_dir = os.path.join(root, "trainA")
        self.C_paths = (sorted(make_dataset(c_dir))
                        if os.path.isdir(c_dir) else list(self.A_paths))
        self.A_size = len(self.A_paths)
        self.B_size = len(self.B_paths)
        self.C_size = len(self.C_paths)

    @staticmethod
    def modify_commandline_options(parser, is_train):
        return parser

    def set_epoch(self, epoch: int) -> None:
        self.current_epoch = epoch

    def __len__(self) -> int:
        return max(self.A_size, self.B_size)

    def __getitem__(self, index: int) -> Dict:
        rng = np.random.default_rng((self.seed, self.current_epoch, index))
        A_path = self.A_paths[index % self.A_size]
        B_path = self.B_paths[index % self.B_size]
        C_path = self.C_paths[index % self.C_size]
        A = apply_transform(self.opt, Image.open(A_path), grayscale=True,
                            rng=rng)
        B = apply_transform(self.opt, Image.open(B_path), grayscale=True,
                            rng=rng)
        C = apply_transform(self.opt, Image.open(C_path), grayscale=True,
                            rng=rng)
        return {"A": A, "B": B, "C": C,
                "A_paths": A_path, "B_paths": B_path, "C_paths": C_path}
