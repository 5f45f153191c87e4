"""Offline registration evaluation: the BASELINE.md metric set for a trained
checkpoint — deformation-field statistics (%|J|<0, |J| range), image
similarity (global NCC, PSNR, windowed NCC), and segmentation overlap
(per-label Dice, HD95) when label maps exist.

Usage:
  python scripts/evaluate.py --dataroot DATA --name EXP \
      [--checkpoints_dir ./checkpoints] [--crop_size 256] [--num_test N] \
      [--out results/eval.json]

Expects the reference layout: {dataroot}/testA, testB (+ optional
trainA_label with per-image label maps).  Prints one JSON summary line and
writes per-pair records next to --out.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--name", required=True)
    ap.add_argument("--checkpoints_dir", default="./checkpoints")
    ap.add_argument("--epoch", default="latest")
    ap.add_argument("--crop_size", type=int, default=256)
    ap.add_argument("--num_patches", type=int, default=256)
    ap.add_argument("--num_test", type=int, default=50)
    ap.add_argument("--gpu_ids", default="0")
    ap.add_argument("--out", default=None)
    # volume mode (--ndims 3): score a vxm checkpoint (--model vxm,
    # {epoch}_net_R.msgpack) on paired .npy test volumes.  The net-shape
    # flags must match the training run (VxmTask defaults).
    ap.add_argument("--ndims", type=int, default=2, choices=[2, 3])
    ap.add_argument("--vol_size", type=int, default=160)
    ap.add_argument("--int_steps", type=int, default=7)
    ap.add_argument("--int_downsize", type=int, default=2)
    ap.add_argument("--bidir", action="store_true")
    ap.add_argument("--enc", default="16,32,32,32")
    ap.add_argument("--dec", default="32,32,32,32,32,16,16")
    args = ap.parse_args()

    if args.gpu_ids == "-1":
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.ndims == 3:
        return eval_volumes(args)

    import numpy as np
    from PIL import Image

    import jax

    from dfmir_tpu.engine import RegistrationConfig, RegistrationModel
    from dfmir_tpu.engine import checkpoints as ckpt
    from dfmir_tpu.metrics import (
        hausdorff_distance, label_dice, ncc_metric, psnr,
    )
    from dfmir_tpu.losses import ncc_loss
    from dfmir_tpu.ops import folding_fraction, jacobian_det, warp
    from dfmir_tpu.data.transforms import to_array

    cfg = RegistrationConfig(crop_size=args.crop_size,
                             num_patches=args.num_patches)
    model = RegistrationModel(cfg)
    state = model.init_state(jax.random.PRNGKey(0), batch_size=1)
    save_dir = os.path.join(args.checkpoints_dir, args.name)
    loaded = ckpt.load_networks(save_dir, args.epoch, ["G", "R"],
                                templates=state.params)
    params = dict(state.params)
    params.update(loaded)

    def load_img(path):
        img = Image.open(path).convert("L").resize(
            (args.crop_size, args.crop_size), Image.BICUBIC)
        return to_array(img)[None]

    A_dir = os.path.join(args.dataroot, "testA")
    B_dir = os.path.join(args.dataroot, "testB")
    names_A = sorted(os.listdir(A_dir))[: args.num_test]
    names_B = sorted(os.listdir(B_dir))
    # paired labels (testA_label + testB_label): Dice/HD95 BEFORE vs AFTER
    # the predicted warp — the direct registration-quality measurement.
    # Reference-layout datasets only carry trainA_label (the label-warp
    # path of /root/reference/test.py:68-91); that remains the fallback.
    labA_dir = os.path.join(args.dataroot, "testA_label")
    labB_dir = os.path.join(args.dataroot, "testB_label")
    label_dir = os.path.join(args.dataroot, "trainA_label")

    records = []
    for i, name in enumerate(names_A):
        A = load_img(os.path.join(A_dir, name))
        B = load_img(os.path.join(B_dir, names_B[i % len(names_B)]))
        fake_B, idt_B, y_source, pos_flow = model.register(params, A, B)
        y_np = np.asarray(y_source)[0, ..., 0]
        B_np = np.asarray(B)[0, ..., 0]
        rec = {
            "name": name,
            "folding_fraction": float(np.asarray(
                folding_fraction(pos_flow))[0]),
            "jac_det_min": float(np.asarray(jacobian_det(pos_flow)).min()),
            "ncc_global": ncc_metric(y_np, B_np),
            "ncc_windowed": -float(ncc_loss(y_source, B)),
            "psnr": psnr(y_np, B_np),
        }
        labA_path = os.path.join(labA_dir, name)
        labB_path = os.path.join(labB_dir, names_B[i % len(names_B)])
        if os.path.exists(labA_path) and os.path.exists(labB_path):
            labA = np.asarray(Image.open(labA_path))
            labB = np.asarray(Image.open(labB_path))
            warped = np.asarray(warp(
                labA.astype(np.float32)[None, :, :, None], pos_flow,
                mode="nearest"))[0, ..., 0].astype(labA.dtype)

            def _dice_hd(moving, fixed):
                d = label_dice(moving, fixed)
                dice = float(np.mean(list(d.values()))) if d else 1.0
                hd = [hausdorff_distance(moving == l, fixed == l,
                                         percentile=95)
                      for l in d
                      if (moving == l).any() and (fixed == l).any()]
                return dice, (float(np.mean(hd)) if hd else None)

            for tag, pair in (("before", (labA, labB)),
                              ("after", (warped, labB))):
                dice, hd = _dice_hd(*pair)
                rec[f"dice_{tag}"] = dice
                if hd is not None:
                    rec[f"hd95_{tag}"] = hd
        elif os.path.exists(os.path.join(label_dir, name)):
            lab = np.asarray(Image.open(os.path.join(label_dir, name))
                             )[None, :, :, None]
            warped = np.asarray(warp(
                lab.astype(np.float32), pos_flow, mode="nearest"))
            d = label_dice(warped[0, ..., 0].astype(lab.dtype),
                           lab[0, ..., 0])
            rec["label_dice_mean"] = float(np.mean(list(d.values()))) \
                if d else 1.0
            masks = [(warped[0, ..., 0] == l, lab[0, ..., 0] == l)
                     for l in d]
            hd = [hausdorff_distance(a, b, percentile=95)
                  for a, b in masks if a.any() and b.any()]
            if hd:
                rec["hd95_mean"] = float(np.mean(hd))
        records.append(rec)

    keys = sorted({k for r in records for k in r if k != "name"})
    summary = {f"mean_{k}": float(np.mean([r[k] for r in records if k in r]))
               for k in keys}
    summary["n_pairs"] = len(records)
    print(json.dumps(summary))
    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)),
                    exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({"summary": summary, "records": records}, f, indent=1)


def eval_volumes(args):
    """3-D registration quality for a vxm checkpoint: NCC/PSNR before vs
    after the predicted warp, deformation health (fold %, |J| range), and
    per-label Dice/HD95 before vs after when paired .npy label volumes
    exist — the ndims=3 capability of the reference
    (/root/reference/models/voxelmorph/torchvoxelmorph/networks.py:1028,
    losses.py:7-117), scored the same way as the 2-D path."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from dfmir_tpu.engine import checkpoints as ckpt
    from dfmir_tpu.engine.vxm_engine import VxmConfig, VxmEngine
    from dfmir_tpu.data.volume import (
        load_volume, normalize_minmax, crop_or_pad,
    )
    from dfmir_tpu.metrics import (
        hausdorff_distance, label_dice, ncc_metric, psnr,
    )
    from dfmir_tpu.losses import ncc_loss
    from dfmir_tpu.ops import folding_fraction, jacobian_det, warp

    cfg = VxmConfig(
        ndims=3, vol_size=args.vol_size, int_steps=args.int_steps,
        int_downsize=args.int_downsize, bidir=args.bidir,
        enc=tuple(int(v) for v in args.enc.split(",")),
        dec=tuple(int(v) for v in args.dec.split(",")),
        batch_size=1)
    eng = VxmEngine(cfg)
    state = eng.init_state(jax.random.PRNGKey(0), batch_size=1)
    save_dir = os.path.join(args.checkpoints_dir, args.name)
    params = ckpt.load_networks(save_dir, args.epoch, ["R"],
                                templates={"R": state.params})["R"]
    register = jax.jit(eng.register)

    size = (args.vol_size,) * 3

    def load_vol(path):
        return crop_or_pad(normalize_minmax(load_volume(path)), size)

    def load_lab(path):
        lab = np.load(path)
        return crop_or_pad(np.asarray(lab, np.float32),
                           size).astype(np.int32)

    A_dir = os.path.join(args.dataroot, "testA")
    B_dir = os.path.join(args.dataroot, "testB")
    names_A = sorted(os.listdir(A_dir))[: args.num_test]
    names_B = sorted(os.listdir(B_dir))
    labA_dir = os.path.join(args.dataroot, "testA_label")
    labB_dir = os.path.join(args.dataroot, "testB_label")

    records = []
    for i, name in enumerate(names_A):
        name_B = names_B[i % len(names_B)]
        A = load_vol(os.path.join(A_dir, name))[None, ..., None]
        B = load_vol(os.path.join(B_dir, name_B))[None, ..., None]
        y_source, pos_flow = jax.tree.map(
            np.asarray, register(params, A, B))
        y_np, B_np, A_np = y_source[0, ..., 0], B[0, ..., 0], A[0, ..., 0]
        rec = {
            "name": name,
            "folding_fraction": float(np.asarray(
                folding_fraction(pos_flow))[0]),
            "jac_det_min": float(np.asarray(jacobian_det(pos_flow)).min()),
            "ncc_global_before": ncc_metric(A_np, B_np),
            "ncc_global_after": ncc_metric(y_np, B_np),
            "ncc_windowed_before": -float(ncc_loss(
                jnp.asarray(A), jnp.asarray(B))),
            "ncc_windowed_after": -float(ncc_loss(
                jnp.asarray(y_source), jnp.asarray(B))),
            "psnr_before": psnr(A_np, B_np, data_range=1.0),
            "psnr_after": psnr(y_np, B_np, data_range=1.0),
        }
        labA_path = os.path.join(labA_dir, name)
        labB_path = os.path.join(labB_dir, name_B)
        if os.path.exists(labA_path) and os.path.exists(labB_path):
            labA = load_lab(labA_path)
            labB = load_lab(labB_path)
            warped = np.asarray(warp(
                labA.astype(np.float32)[None, ..., None], pos_flow,
                mode="nearest"))[0, ..., 0].astype(labA.dtype)
            for tag, moving in (("before", labA), ("after", warped)):
                d = label_dice(moving, labB)
                rec[f"dice_{tag}"] = (float(np.mean(list(d.values())))
                                      if d else 1.0)
                hd = [hausdorff_distance(moving == l, labB == l,
                                         percentile=95)
                      for l in d
                      if (moving == l).any() and (labB == l).any()]
                if hd:
                    rec[f"hd95_{tag}"] = float(np.mean(hd))
        records.append(rec)

    keys = sorted({k for r in records for k in r if k != "name"})
    summary = {f"mean_{k}": float(np.mean([r[k] for r in records
                                           if k in r])) for k in keys}
    summary["n_pairs"] = len(records)
    summary["ndims"] = 3
    print(json.dumps(summary))
    if args.out:
        os.makedirs(os.path.dirname(os.path.abspath(args.out)),
                    exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({"summary": summary, "records": records}, f, indent=1)


if __name__ == "__main__":
    main()
