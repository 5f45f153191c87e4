"""Checkpoint save/load with the reference's file layout
(/root/reference/models/base_model.py:164-224): per-network files named
``{epoch}_net_{Name}`` under ``{checkpoints_dir}/{name}``, ``latest`` tag,
``--continue_train`` / ``--pretrained_name`` resume semantics.

Improvements over the reference (SURVEY.md section 5): optimizer state and
step counter are checkpointed too (``{epoch}_optim.msgpack``), so resume is
exact — the reference silently resets Adam moments.  Format is flax
msgpack (framework-native, no pickle).  ``.pth`` files are transparently
converted from reference PyTorch checkpoints via dfmir_tpu.compat.convert.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np
from flax import serialization


def _net_path(save_dir: str, epoch: str, name: str) -> str:
    return os.path.join(save_dir, f"{epoch}_net_{name}.msgpack")


def save_networks(save_dir: str, epoch, params: Dict[str, Any],
                  opt_extras: Optional[Dict[str, Any]] = None) -> None:
    """params: {'G': tree, 'F': tree, 'R': tree}; opt_extras: opt_state etc."""
    os.makedirs(save_dir, exist_ok=True)
    host = _to_host(params)
    for name, tree in host.items():
        with open(_net_path(save_dir, str(epoch), name), "wb") as f:
            f.write(serialization.msgpack_serialize(tree))
    if opt_extras is not None:
        with open(os.path.join(save_dir, f"{epoch}_optim.msgpack"),
                  "wb") as f:
            f.write(serialization.msgpack_serialize(_to_host(opt_extras)))


def _to_host(tree):
    import jax

    return jax.tree.map(lambda x: np.asarray(x),
                        serialization.to_state_dict(tree))


def load_networks(save_dir: str, epoch, names, templates: Dict[str, Any],
                  verbose: bool = False, pth_converter=None) -> Dict[str, Any]:
    """Load params for ``names``; falls back to reference ``.pth`` files
    (converted via ``pth_converter(name, state_dict)``) when absent.

    templates: current param trees (for msgpack restore typing)."""
    out = {}
    for name in names:
        path = _net_path(save_dir, str(epoch), name)
        if os.path.exists(path):
            if verbose:
                print(f"loading the model from {path}")
            with open(path, "rb") as f:
                tree = serialization.msgpack_restore(f.read())
            out[name] = serialization.from_state_dict(
                templates[name], tree) if templates.get(name) is not None \
                else tree
        else:
            pth = os.path.join(save_dir, f"{epoch}_net_{name}.pth")
            if not (os.path.exists(pth) and pth_converter is not None):
                raise FileNotFoundError(
                    f"no checkpoint for net {name} at {path} or {pth}")
            if verbose:
                print(f"converting reference checkpoint {pth}")
            from dfmir_tpu.compat.convert import load_torch_file

            out[name] = pth_converter(name, load_torch_file(pth))
    return out


def load_optim(save_dir: str, epoch, template) -> Optional[Any]:
    path = os.path.join(save_dir, f"{epoch}_optim.msgpack")
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    return serialization.from_state_dict(template, tree)


# ------------------------------------------------------------ config-carrying

def save_with_config(path: str, cfg, params) -> None:
    """One-file checkpoint carrying the constructor config alongside the
    weights (capability of the reference LoadableModel/store_config_args,
    /root/reference/models/voxelmorph/torchvoxelmorph/modelio.py:7-76) —
    reload without knowing the architecture flags."""
    import dataclasses

    cfg_dict = {k: (list(v) if isinstance(v, tuple) else v)
                for k, v in dataclasses.asdict(cfg).items()}
    blob = {
        "config": cfg_dict,
        "config_class": type(cfg).__name__,
        "params": _to_host(params),
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(blob))


def load_with_config(path: str):
    """Returns (cfg, params_state_dict).  cfg is reconstructed from the
    stored class name (RegistrationConfig / VxmConfig)."""
    with open(path, "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    name = blob["config_class"]
    if name == "RegistrationConfig":
        from dfmir_tpu.engine.config import RegistrationConfig as C
    elif name == "VxmConfig":
        from dfmir_tpu.engine.vxm_engine import VxmConfig as C
    else:
        raise KeyError(f"unknown config class {name!r}")
    raw = dict(blob["config"])
    import dataclasses as _dc

    for f_ in _dc.fields(C):
        if f_.name in raw and isinstance(raw[f_.name], (list, tuple)):
            raw[f_.name] = tuple(raw[f_.name])
    return C(**raw), blob["params"]
