"""Structured synthetic multimodal pairs for the flagship soak run.

The reference's workload is unpaired 256x256 grayscale A->B registration
(/root/reference/options/base_options.py:53-55, train_options.py:33-37).
Real datasets cannot ship in this image, so this generates anatomy-like
volumes with the two properties the joint model actually exercises:

- modality gap: A and B render the SAME underlying "anatomy" (a sum of
  soft blobs on a smooth background) through DIFFERENT monotone intensity
  maps, so the translator has real work (NCE keeps structure, intensity
  must be re-mapped);
- misalignment: B's anatomy is warped by a smooth random SVF-style
  deformation (low-res Gaussian flow, upsampled), so the registration
  net has real work and the Jacobian statistics are meaningful.

Images are written as PNGs under {out}/trainA, {trainB}, {testA}, {testB}
in the reference's dataroot layout (data/unaligned.py pairs A[i] with
B[i % len(B)]).
"""

import argparse
import os

import numpy as np
from PIL import Image


def _smooth_noise(rng, size, cells, amp):
    """Low-res Gaussian noise bilinearly upsampled to (size, size)."""
    lo = rng.standard_normal((cells, cells)).astype(np.float32) * amp
    img = Image.fromarray(lo, mode="F").resize((size, size), Image.BILINEAR)
    return np.asarray(img, np.float32)


def _anatomy(rng, size):
    """Sum of soft elliptical blobs on a smooth background, in [0, 1]."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    img = 0.25 + 0.1 * _smooth_noise(rng, size, 4, 1.0)
    for _ in range(int(rng.integers(6, 12))):
        cy, cx = rng.uniform(0.15 * size, 0.85 * size, 2)
        sy, sx = rng.uniform(0.03 * size, 0.15 * size, 2)
        th = rng.uniform(0, np.pi)
        amp = rng.uniform(0.3, 0.9) * rng.choice([-1.0, 1.0])
        dy, dx = yy - cy, xx - cx
        ry = dy * np.cos(th) + dx * np.sin(th)
        rx = -dy * np.sin(th) + dx * np.cos(th)
        img += amp * np.exp(-(ry / sy) ** 2 - (rx / sx) ** 2)
    img -= img.min()
    return img / max(img.max(), 1e-6)


def _warp_bilinear(img, flow):
    """Dense-flow bilinear warp (numpy; loader-side ground truth only)."""
    size = img.shape[0]
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    ys = np.clip(yy + flow[..., 0], 0, size - 1)
    xs = np.clip(xx + flow[..., 1], 0, size - 1)
    y0 = np.clip(np.floor(ys).astype(np.int32), 0, size - 2)
    x0 = np.clip(np.floor(xs).astype(np.int32), 0, size - 2)
    wy = ys - y0
    wx = xs - x0
    g = lambda yi, xi: img[yi, xi]
    return ((1 - wy) * (1 - wx) * g(y0, x0) + (1 - wy) * wx * g(y0, x0 + 1)
            + wy * (1 - wx) * g(y0 + 1, x0) + wy * wx * g(y0 + 1, x0 + 1))


def _warp_nearest(img, flow):
    """Nearest-neighbor warp (for label maps — values must stay exact)."""
    size = img.shape[0]
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    ys = np.clip(np.rint(yy + flow[..., 0]), 0, size - 1).astype(np.int32)
    xs = np.clip(np.rint(xx + flow[..., 1]), 0, size - 1).astype(np.int32)
    return img[ys, xs]


def _labels(base, n_bins=4):
    """Quantile-binned anatomy -> label map {0..n_bins-1} scaled x60."""
    qs = np.quantile(base, np.linspace(0, 1, n_bins + 1)[1:-1])
    return (np.digitize(base, qs).astype(np.uint8) * 60)


# 3-D analogs (--ndims 3): .npy volumes for the vxm task
# (--model vxm --dataset_mode volume).  Same recipe — blob anatomy, smooth
# ground-truth flow, quantile-bin labels riding the flow — one modality
# (classic VoxelMorph registers same-modality under NCC).

def _upsample3d(lo, size):
    """Trilinear upsample of a small 3-D grid to (size,)*3 (pure numpy:
    successive per-axis linear interpolation)."""
    out = lo.astype(np.float32)
    for ax in range(3):
        n = out.shape[ax]
        pos = np.linspace(0, n - 1, size).astype(np.float32)
        i0 = np.minimum(np.floor(pos).astype(np.int64), n - 2)
        w = (pos - i0).astype(np.float32)
        a = np.take(out, i0, axis=ax)
        b = np.take(out, i0 + 1, axis=ax)
        shape = [1, 1, 1]
        shape[ax] = size
        w = w.reshape(shape)
        out = a * (1 - w) + b * w
    return out


def _smooth_noise3d(rng, size, cells, amp):
    return _upsample3d(rng.standard_normal((cells,) * 3) * amp, size)


def _anatomy3d(rng, size, texture=0.35):
    """Sum of soft 3-D Gaussian blobs on a smooth background plus a
    fine-scale texture field, in [0, 1].

    The texture (cells ~size/8, i.e. ~8-voxel features) rides the
    ground-truth flow like everything else and is what gives intensity
    losses (MSE/NCC) gradient teeth everywhere: blob-only volumes are
    smooth at the deformation scale, their MSE landscape is nearly flat
    in the flow, and vxm training measurably collapses to a zero-flow
    saddle (the r5 128^3/64^3 runs) — exactly why real-MRI texture
    matters to classic VoxelMorph."""
    zz, yy, xx = np.mgrid[0:size, 0:size, 0:size].astype(np.float32)
    img = 0.25 + 0.1 * _smooth_noise3d(rng, size, 4, 1.0)
    for _ in range(int(rng.integers(8, 16))):
        c = rng.uniform(0.15 * size, 0.85 * size, 3)
        s = rng.uniform(0.04 * size, 0.16 * size, 3)
        amp = rng.uniform(0.3, 0.9) * rng.choice([-1.0, 1.0])
        img += amp * np.exp(-((zz - c[0]) / s[0]) ** 2
                            - ((yy - c[1]) / s[1]) ** 2
                            - ((xx - c[2]) / s[2]) ** 2)
    if texture > 0:
        img += texture * _smooth_noise3d(rng, size, max(size // 8, 4), 1.0)
    img -= img.min()
    return img / max(img.max(), 1e-6)


def _warp_trilinear3d(vol, flow):
    size = vol.shape
    grid = np.mgrid[0:size[0], 0:size[1], 0:size[2]].astype(np.float32)
    pos = [np.clip(grid[i] + flow[..., i], 0, size[i] - 1) for i in range(3)]
    i0 = [np.minimum(np.floor(p).astype(np.int64), s - 2)
          for p, s in zip(pos, size)]
    w = [p - f for p, f in zip(pos, i0)]
    out = np.zeros_like(vol)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                wt = ((w[0] if dz else 1 - w[0])
                      * (w[1] if dy else 1 - w[1])
                      * (w[2] if dx else 1 - w[2]))
                out += wt * vol[i0[0] + dz, i0[1] + dy, i0[2] + dx]
    return out


def _warp_nearest3d(vol, flow):
    size = vol.shape
    grid = np.mgrid[0:size[0], 0:size[1], 0:size[2]].astype(np.float32)
    idx = [np.clip(np.rint(grid[i] + flow[..., i]), 0,
                   size[i] - 1).astype(np.int64) for i in range(3)]
    return vol[idx[0], idx[1], idx[2]]


def _write_volumes(args):
    rng = np.random.default_rng(args.seed)
    for phase, n in (("train", args.n_train), ("test", args.n_test)):
        dirs = {k: os.path.join(args.out, phase + k)
                for k in ("A", "B", "A_label", "B_label")}
        for d in dirs.values():
            os.makedirs(d, exist_ok=True)
        for i in range(n):
            blob = _anatomy3d(rng, args.size, texture=0.0)
            base = blob
            if args.texture > 0:
                # texture the intensities (MSE/NCC gradient teeth) but
                # keep labels from the smooth anatomy so Dice measures
                # structure overlap, not texture speckle
                tex = args.texture * _smooth_noise3d(
                    rng, args.size, max(args.size // 8, 4), 1.0)
                base = blob + tex
                base -= base.min()
                base /= max(base.max(), 1e-6)
            flow = np.stack([_smooth_noise3d(rng, args.size, 6,
                                             args.flow_amp)
                             for _ in range(3)], -1)
            b_vol = _warp_trilinear3d(base, flow)
            a_lab = _labels(blob)
            b_lab = _warp_nearest3d(a_lab, flow)
            for key, arr in (("A", base.astype(np.float32)),
                             ("B", b_vol.astype(np.float32)),
                             ("A_label", a_lab), ("B_label", b_lab)):
                np.save(os.path.join(dirs[key], f"pair_{i:03d}.npy"), arr)
    print(f"wrote {args.n_train}+{args.n_test} {args.size}^3 volume pairs "
          f"(+labels) to {args.out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/soak/data")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--n_train", type=int, default=48)
    ap.add_argument("--n_test", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--flow_amp", type=float, default=6.0,
                    help="misalignment amplitude in px (smooth 6-cell "
                         "flow); larger = lower before-Dice = more "
                         "registration headroom for the eval")
    ap.add_argument("--ndims", type=int, default=2, choices=[2, 3],
                    help="3 = .npy volume pairs for --model vxm "
                         "--dataset_mode volume")
    ap.add_argument("--texture", type=float, default=0.35,
                    help="3-D fine-scale texture amplitude (gives "
                         "intensity losses gradient teeth; 0 = the "
                         "blob-only volumes that collapse vxm training "
                         "to a zero-flow saddle)")
    args = ap.parse_args()

    if args.ndims == 3:
        _write_volumes(args)
        return

    rng = np.random.default_rng(args.seed)
    for phase, n in (("train", args.n_train), ("test", args.n_test)):
        da = os.path.join(args.out, phase + "A")
        db = os.path.join(args.out, phase + "B")
        dla = os.path.join(args.out, phase + "A_label")
        dlb = os.path.join(args.out, phase + "B_label")
        for d in (da, db, dla, dlb):
            os.makedirs(d, exist_ok=True)
        for i in range(n):
            base = _anatomy(rng, args.size)
            # modality A: near-linear ramp; modality B: inverted gamma map
            a_img = np.clip(base ** 1.1, 0, 1)
            b_src = np.clip(1.0 - base, 0, 1) ** 0.6
            # misalign B by a smooth random flow (~±flow_amp px)
            amp = args.flow_amp
            flow = np.stack([_smooth_noise(rng, args.size, 6, amp),
                             _smooth_noise(rng, args.size, 6, amp)], -1)
            b_img = _warp_bilinear(b_src, flow)
            # quantile-bin labels of the shared anatomy; B's labels ride
            # the SAME ground-truth deformation (nearest), so
            # Dice(warp(A_label, predicted_flow), B_label) measures how
            # much of the misalignment the registration recovered
            a_lab = _labels(base)
            b_lab = _warp_nearest(a_lab, flow)
            for d, img in ((da, (a_img * 255).astype(np.uint8)),
                           (db, (b_img * 255).astype(np.uint8)),
                           (dla, a_lab), (dlb, b_lab)):
                Image.fromarray(img).save(
                    os.path.join(d, f"pair_{i:03d}.png"))
    print(f"wrote {args.n_train}+{args.n_test} pairs (+labels) to "
          f"{args.out}")


if __name__ == "__main__":
    main()
