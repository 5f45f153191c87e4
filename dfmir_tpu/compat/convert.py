"""Convert reference PyTorch checkpoints (state_dicts) to flax param trees.

Lets users of the reference repo load their trained ``{epoch}_net_{G,F,R}.pth``
weights into this framework.  Key naming follows the reference modules:
netG ``model.<i>.*`` (/root/reference/models/networks.py:956-1030), netR
``unet_model.{downarm,uparm,extras}.<i>.main.*`` + ``flow.*``
(torchvoxelmorph/networks.py:64-106,1077-1081), netF ``mlp_<i>.{0,2}.*``
(networks.py:587-595).

Tensors may be torch.Tensor or numpy arrays (state_dicts saved on CPU).
Layout maps: torch Conv (out,in,*k) -> flax (*k,in,out); torch ConvTranspose
(in,out,*k) -> flax (*k,in,out); torch Linear (out,in) -> flax (in,out).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _conv_w(x):
    x = _np(x)
    nd = x.ndim - 2
    return np.transpose(x, tuple(range(2, 2 + nd)) + (1, 0))


def _convT_w(x):
    x = _np(x)
    nd = x.ndim - 2
    return np.transpose(x, tuple(range(2, 2 + nd)) + (0, 1))


def convert_netG(state_dict: Mapping[str, Any], specs, use_dropout=False,
                 padding_type="reflect") -> Dict[str, Any]:
    """Reference netG state_dict -> ResnetGenerator flax params."""
    params: Dict[str, Any] = {}
    for i, s in enumerate(specs):
        kind = s["kind"]
        if kind == "conv":
            params[f"layer_{i}"] = {"Conv_0": {
                "kernel": _conv_w(state_dict[f"model.{i}.weight"]),
                "bias": _np(state_dict[f"model.{i}.bias"]),
            }}
        elif kind == "convT":
            params[f"layer_{i}"] = {
                "kernel": _convT_w(state_dict[f"model.{i}.weight"]),
                "bias": _np(state_dict[f"model.{i}.bias"]),
            }
        elif kind == "resblock":
            if padding_type == "zero":
                c0, c1 = 0, 4 if use_dropout else 3
            else:
                c0, c1 = 1, 6 if use_dropout else 5
            block = {}
            for j, c in enumerate((c0, c1)):
                block[f"ConvND_{j}"] = {"Conv_0": {
                    "kernel": _conv_w(
                        state_dict[f"model.{i}.conv_block.{c}.weight"]),
                    "bias": _np(state_dict[f"model.{i}.conv_block.{c}.bias"]),
                }}
            params[f"layer_{i}"] = block
    return params


def convert_netR(state_dict: Mapping[str, Any], enc_nf, dec_nf) -> Dict[str, Any]:
    """Reference netR (VxmDense) state_dict -> VxmDense flax params."""
    unet: Dict[str, Any] = {}
    for i in range(len(enc_nf)):
        unet[f"down_{i}"] = {"ConvND_0": {"Conv_0": {
            "kernel": _conv_w(state_dict[f"unet_model.downarm.{i}.main.weight"]),
            "bias": _np(state_dict[f"unet_model.downarm.{i}.main.bias"]),
        }}}
    for i in range(len(enc_nf)):
        unet[f"up_{i}"] = {"ConvND_0": {"Conv_0": {
            "kernel": _conv_w(state_dict[f"unet_model.uparm.{i}.main.weight"]),
            "bias": _np(state_dict[f"unet_model.uparm.{i}.main.bias"]),
        }}}
    for i in range(len(dec_nf) - len(enc_nf)):
        unet[f"extra_{i}"] = {"ConvND_0": {"Conv_0": {
            "kernel": _conv_w(state_dict[f"unet_model.extras.{i}.main.weight"]),
            "bias": _np(state_dict[f"unet_model.extras.{i}.main.bias"]),
        }}}
    return {
        "unet": unet,
        "flow": {
            "kernel": _conv_w(state_dict["flow.weight"]),
            "bias": _np(state_dict["flow.bias"]),
        },
    }


def convert_netF(state_dict: Mapping[str, Any], n_layers: int) -> Dict[str, Any]:
    """Reference netF (PatchSampleF mlp_sample) state_dict -> flax params."""
    params: Dict[str, Any] = {}
    for i in range(n_layers):
        for j, t in ((0, 0), (1, 2)):
            params[f"mlp_{i}_{j}"] = {
                "kernel": _np(state_dict[f"mlp_{i}.{t}.weight"]).T,
                "bias": _np(state_dict[f"mlp_{i}.{t}.bias"]),
            }
    return params


def load_torch_file(path: str) -> Dict[str, Any]:
    """Load a .pth state_dict without requiring CUDA."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return sd
