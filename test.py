"""Inference driver (capability of /root/reference/test.py:14-91): batch-1
serial inference over the test split; warps each sample's *label map* with
the integrated flow using nearest-neighbor interpolation; writes
``{dataroot}/deform_label/`` and ``{dataroot}/deform_trainA/`` plus an HTML
gallery of visuals under ``{results_dir}/{name}/{phase}_{epoch}``.

TPU deltas: the label warp runs on-device through the same fused warp op
(the reference drops to a CPU SpatialTransformer, test.py:80-81), and the
model outputs come from one jitted register() call.
"""

import json
import os

import numpy as np
from PIL import Image

from dfmir_tpu.data import create_dataset
from dfmir_tpu.models import create_model
from dfmir_tpu.options import TestOptions
from dfmir_tpu.ops import folding_fraction, jacobian_det, warp
from dfmir_tpu.utils import html as html_mod
from dfmir_tpu.utils.jac_vis import jac_det_to_rgb, overlay
from dfmir_tpu.utils.util import copyconf
from dfmir_tpu.utils.visualizer import save_images


def save_gray(img01, path):
    """(H,W) float in [0,1] -> 8-bit PNG."""
    arr = np.clip(np.asarray(img01, np.float32), 0.0, 1.0) * 255.0
    Image.fromarray(arr.astype(np.uint8)).save(path)


def main():
    opt = TestOptions().parse()
    opt.num_threads = 0
    opt.batch_size = 1
    opt.serial_batches = True
    opt.no_flip = True
    opt.display_id = -1
    dataset = create_dataset(opt)
    train_dataset = create_dataset(copyconf(opt, phase="train"))  # noqa: F841 (reference parity)
    model = create_model(opt)

    web_dir = os.path.join(opt.results_dir, opt.name,
                           f"{opt.phase}_{opt.epoch}")
    print("creating web directory", web_dir)
    webpage = html_mod.HTML(
        web_dir,
        f"Experiment = {opt.name}, Phase = {opt.phase}, Epoch = {opt.epoch}")

    images_A_names = sorted(os.listdir(
        os.path.join(opt.dataroot, opt.phase + "A")))
    label_dir = os.path.join(opt.dataroot, "trainA_label")

    for i, data in enumerate(dataset):
        if i == 0:
            model.data_dependent_initialize(data)
            model.setup(opt)
            model.parallelize()
            model.eval()
        if i >= opt.num_test:
            break
        model.set_input(data)
        model.test()
        img_path = model.get_image_paths()
        print(i, img_path[0] if img_path else "")

        fake_B, idt_B, y_source, pos_flow = model.register_pair()

        name = images_A_names[i % len(images_A_names)]
        flow_np = np.asarray(pos_flow)

        # label warp (nearest) — reference test.py:68-81
        label_path = os.path.join(label_dir, name)
        if os.path.exists(label_path):
            lab = Image.open(label_path)
            lab_arr = np.asarray(lab, np.float32)
            if lab_arr.ndim == 2:
                lab_arr = lab_arr[:, :, None]
            lab_arr = lab_arr / 255.0  # ToTensor scaling
            warped_lab = np.asarray(warp(
                lab_arr[None], flow_np, mode="nearest"))[0]
            out_dir = os.path.join(opt.dataroot, "deform_label")
            os.makedirs(out_dir, exist_ok=True)
            save_gray(warped_lab[..., 0], os.path.join(out_dir, name))

        out_dir = os.path.join(opt.dataroot, "deform_trainA")
        os.makedirs(out_dir, exist_ok=True)
        save_gray(np.asarray(y_source)[0, ..., 0] / 2.0 + 0.5,
                  os.path.join(out_dir, name))

        # Jacobian-determinant overlay + folding stats (capability the
        # reference only sketched: util/jac_vis.py has the colormap but no
        # |J| computation)
        det = np.asarray(jacobian_det(pos_flow))[0]  # (H, W)
        fold = float(np.asarray(folding_fraction(pos_flow))[0])
        jac_dir = os.path.join(opt.dataroot, "jac_vis")
        os.makedirs(jac_dir, exist_ok=True)
        rgb = overlay(np.asarray(y_source)[0, ..., 0], jac_det_to_rgb(det))
        Image.fromarray(rgb).save(os.path.join(jac_dir, name))
        stats = {"name": name, "folding_fraction": fold,
                 "jac_det_min": float(det.min()),
                 "jac_det_max": float(det.max())}
        with open(os.path.join(jac_dir, "stats.jsonl"), "a") as f:
            f.write(json.dumps(stats) + "\n")

        visuals = {
            "real_A": np.asarray(model._batch[0]),
            "real_B": np.asarray(model._batch[1]),
            "fake_B": np.asarray(fake_B),
            "registered": np.asarray(y_source),
        }
        save_images(webpage, visuals, img_path,
                    width=opt.display_winsize)
    webpage.save()


if __name__ == "__main__":
    main()
