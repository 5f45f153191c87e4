"""Flagship soak run: drive the REAL train.py CLI for a few hundred steps
on structured synthetic multimodal pairs and distill the run into one
committed artifact (SOAK_rNN.json).

The reference's workload is 150+150 epochs of unpaired 256^2 registration
(/root/reference/options/train_options.py:33-37); unit tests only prove
single steps.  This records the evidence in between: the joint model
(translation + NCE + registration) training stably at realistic length on
the real chip — loss trajectory, LR decay crossover, and deformation
health (folding fraction, |J| range, max displacement) sampled throughout.

Usage (defaults give ~400 steps at batch 8):
    python scripts/soak.py --out SOAK_r03.json
The train subprocess is bounded by --budget_s; on timeout the artifact is
still written from whatever loss_history.jsonl accumulated.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _downsample(records, n):
    if len(records) <= n:
        return records
    idx = [round(i * (len(records) - 1) / (n - 1)) for i in range(n)]
    return [records[i] for i in sorted(set(idx))]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SOAK_r03.json")
    ap.add_argument("--workdir", default="/tmp/soak")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n_train", type=int, default=48)
    ap.add_argument("--epochs", type=int, default=34,
                    help="constant-LR epochs; the same count again decays")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--budget_s", type=int, default=2400)
    ap.add_argument("--reuse_data", action="store_true")
    ap.add_argument("--gpu_ids", default=None,
                    help="forwarded to train.py (-1 = CPU smoke)")
    ap.add_argument("--n_test", type=int, default=4)
    ap.add_argument("--print_every_steps", type=int, default=1,
                    help="loss print/record cadence in steps; >1 removes "
                         "the per-step device sync from the hot loop")
    ap.add_argument("--jac_every_steps", type=int, default=5)
    ap.add_argument("--num_threads", type=int, default=2)
    ap.add_argument("--save_epoch_freq", type=int, default=0,
                    help="mid-run checkpoint cadence; 0 = final epoch only")
    ap.add_argument("--flow_amp", type=float, default=6.0,
                    help="forwarded to make_soak_data.py (misalignment px)")
    args = ap.parse_args()

    data = os.path.join(args.workdir, "data")
    ckpt = os.path.join(args.workdir, "ckpt")
    name = "soak"
    t0 = time.time()

    if not (args.reuse_data and os.path.isdir(os.path.join(data, "trainA"))):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts",
                                          "make_soak_data.py"),
             "--out", data, "--size", str(args.size),
             "--n_train", str(args.n_train), "--n_test", str(args.n_test),
             "--flow_amp", str(args.flow_amp)],
            check=True, cwd=REPO)

    # Loss record every print_every_steps steps (print_freq counts
    # images), deformation health every jac_every_steps, no dashboard.
    bs = args.batch
    cmd = [
        sys.executable, os.path.join(REPO, "train.py"),
        "--dataroot", data, "--name", name, "--checkpoints_dir", ckpt,
        "--crop_size", str(args.size), "--load_size", str(args.size),
        "--batch_size", str(bs), "--compute_dtype", args.dtype,
        "--n_epochs", str(args.epochs),
        "--n_epochs_decay", str(args.epochs),
        "--print_freq", str(args.print_every_steps * bs),
        "--jac_freq", str(args.jac_every_steps * bs),
        "--display_freq", "1000000000",
        "--save_latest_freq", "1000000000",
        # checkpoint at the final epoch (2*epochs % freq == 0 there) plus
        # optional mid-run saves — scripts/evaluate.py scores them for
        # the registration-quality artifact (EVAL_rNN.json)
        "--save_epoch_freq", str(args.save_epoch_freq or 2 * args.epochs),
        "--num_threads", str(args.num_threads),
    ]
    if args.gpu_ids is not None:
        cmd += ["--gpu_ids", args.gpu_ids]
    # record which backend the train subprocess will actually resolve
    # (the artifact must be attributable to real hardware, VERDICT r3 #1)
    if args.gpu_ids == "-1":
        backend = "cpu"
    else:
        try:
            probe = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(jax.default_backend())"],
                capture_output=True, text=True, timeout=240, cwd=REPO)
            backend = (probe.stdout or "").strip().splitlines()[-1] \
                if probe.returncode == 0 and probe.stdout.strip() \
                else "unknown"
        except (subprocess.TimeoutExpired, OSError):
            backend = "unknown"  # probe hiccup must not abort the soak
    print(f"soak: backend={backend}", flush=True)
    print("soak:", " ".join(cmd), flush=True)
    log_path = os.path.join(args.workdir, "train.log")
    timed_out = False
    with open(log_path, "w") as log:
        try:
            proc = subprocess.run(cmd, cwd=REPO, stdout=log,
                                  stderr=subprocess.STDOUT,
                                  timeout=args.budget_s)
            rc = proc.returncode
        except subprocess.TimeoutExpired:
            timed_out, rc = True, -1

    hist_path = os.path.join(ckpt, name, "loss_history.jsonl")
    records = []
    if os.path.exists(hist_path):
        with open(hist_path) as f:
            for line in f:
                try:
                    records.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    if not records:
        print(f"soak: NO history records (rc={rc}); see {log_path}",
              file=sys.stderr)
        tail = open(log_path).read()[-3000:]
        print(tail, file=sys.stderr)
        sys.exit(1)

    loss_keys = sorted(records[0]["losses"])
    k = min(10, max(1, len(records) // 4))

    def mean_of(recs, key):
        vals = [r["losses"][key] for r in recs if key in r["losses"]]
        return round(sum(vals) / len(vals), 5) if vals else None

    jac_recs = [r for r in records if "fold" in r["losses"]]
    # records are loss prints (one per print_every_steps optimizer steps);
    # reconstruct the optimizer-step count from the last record's position
    steps_per_epoch = max(1, args.n_train // bs)
    last = records[-1]
    total_steps = ((last.get("epoch", 1) - 1) * steps_per_epoch
                   + round(last.get("counter_ratio", 1.0) * steps_per_epoch))
    summary = {
        "what": "flagship joint model (translate+NCE+register) trained via "
                "the real train.py CLI on structured synthetic multimodal "
                f"pairs, {args.size}^2 batch {bs} {args.dtype}",
        "steps": total_steps,
        "loss_records": len(records),
        "epochs_seen": records[-1].get("epoch"),
        "config": {"size": args.size, "batch": bs, "dtype": args.dtype,
                   "n_train_images": args.n_train,
                   "n_epochs": args.epochs, "n_epochs_decay": args.epochs},
        "backend": backend,
        "rc": rc, "timed_out": timed_out,
        "wall_s": round(time.time() - t0, 1),
        "loss_first10_vs_last10": {
            key: [mean_of(records[:k], key), mean_of(records[-k:], key)]
            for key in loss_keys if key not in
            ("fold", "jac_min", "jac_max", "jac_mean", "flow_max")},
        "deformation_health_last": (
            {key: jac_recs[-1]["losses"][key]
             for key in ("fold", "jac_min", "jac_max", "jac_mean",
                         "flow_max") if key in jac_recs[-1]["losses"]}
            if jac_recs else None),
        "deformation_health_n_samples": len(jac_recs),
        "all_finite": all(
            v == v and abs(v) != float("inf")
            for r in records for v in r["losses"].values()),
        "curve_downsampled": [
            {"epoch": r.get("epoch"),
             "counter_ratio": round(r.get("counter_ratio", 0.0), 3),
             "losses": {key: round(v, 5)
                        for key, v in r["losses"].items()}}
            for r in _downsample(records, 40)],
    }
    out_path = os.path.join(REPO, args.out)
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"soak: {len(records)} steps, rc={rc}, wrote {out_path}",
        flush=True)


if __name__ == "__main__":
    main()
