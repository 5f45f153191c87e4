"""Generate PARITY.json: recorded max-abs diffs between the flagship nets
and their independently-written PyTorch golden twins on fixed weights.

The BASELINE.md north star says "<= 1e-3 max-abs diff on warped outputs &
fields" — this script turns the passing asserts of tests/test_nets_parity.py
into a recorded artifact at the repo root (VERDICT round-1 item 7).

Run from the repo root:  python scripts/gen_parity.py
(CPU; flagship 256x256 resnet_9blocks + VxmDense configuration.)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import torch

import jax.numpy as jnp

from dfmir_tpu.compat.convert import convert_netG, convert_netR
from dfmir_tpu.compat.torch_ref import RefResnetGenerator, RefVxmDense
from dfmir_tpu.nets import ResnetGenerator, VxmDense

SIZE = 256
ENC = (16, 32, 32, 64, 64, 64)
DEC = (64, 64, 64, 32, 32, 32, 16)


def to_nhwc(x):
    return jnp.asarray(np.moveaxis(x, 1, -1))


def from_nhwc(x):
    return np.moveaxis(np.asarray(x), -1, 1)


def main():
    torch.manual_seed(0)
    rng = np.random.default_rng(0)

    # --- netG: flagship resnet_9blocks, ngf 64 ------------------------------
    tg = RefResnetGenerator(1, 1, ngf=64, n_blocks=9).eval()
    jg = ResnetGenerator(input_nc=1, output_nc=1, ngf=64, n_blocks=9)
    pG = convert_netG(tg.state_dict(), jg.specs())

    x = rng.standard_normal((1, 1, SIZE, SIZE)).astype(np.float32)
    with torch.no_grad():
        fake_t = tg(torch.from_numpy(x)).numpy()
    fake_j = from_nhwc(jg.apply({"params": pG}, to_nhwc(x)))
    d_fake = float(np.max(np.abs(fake_j - fake_t)))

    # --- netR: flagship VxmDense (256^2, int_steps 7, bidir) ---------------
    tr = RefVxmDense((SIZE, SIZE), (list(ENC), list(DEC)), int_steps=7,
                     int_downsize=2, bidir=True).eval()
    jr = VxmDense(ndims=2, nb_features=(ENC, DEC), int_steps=7,
                  int_downsize=2, bidir=True)
    pR = convert_netR(tr.state_dict(), enc_nf=ENC, dec_nf=DEC)

    a = rng.standard_normal((1, 1, SIZE, SIZE)).astype(np.float32)
    b = rng.standard_normal((1, 1, SIZE, SIZE)).astype(np.float32)
    with torch.no_grad():
        warped_t, flow_t = tr(torch.from_numpy(a), torch.from_numpy(b),
                              registration=True)
    warped_j, flow_j = jr.apply({"params": pR}, to_nhwc(a), to_nhwc(b),
                                registration=True)
    d_warped = float(np.max(np.abs(from_nhwc(warped_j) - warped_t.numpy())))
    d_flow = float(np.max(np.abs(from_nhwc(flow_j) - flow_t.numpy())))

    tol = 1e-3
    out = {
        "generated_unix": int(time.time()),
        "config": {
            "size": SIZE, "netG": "resnet_9blocks (ngf 64)",
            "netR": f"VxmDense enc={list(ENC)} dec={list(DEC)} "
                    "int_steps=7 int_downsize=2 bidir",
            "inputs": "N(0,1) fixed seed 0, torch weights seed 0",
        },
        "max_abs_diff": {
            "fake_B": d_fake,
            "warped": d_warped,
            "pos_flow": d_flow,
        },
        "tolerance": tol,
        "pass": bool(d_fake < tol and d_warped < tol and d_flow < tol),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PARITY.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
