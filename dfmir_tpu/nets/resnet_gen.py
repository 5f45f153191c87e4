"""CUT-style ResNet generator with indexed feature taps.

Mirrors the reference ResnetGenerator (/root/reference/models/networks.py:956-1051):
c7s1-ngf, two antialiased downsamples, n_blocks ResNet blocks, two antialiased
upsamples, c7s1-output + Tanh — built as an explicit op list whose indices
match the reference's nn.Sequential indices exactly, so ``--nce_layers
0,4,8,12,16`` taps the same activations.

Default indexing (resnet_9blocks, antialias on):
  0 pad3 | 1 conv7(ngf) | 2 norm | 3 relu
  4 conv3(2ngf) | 5 norm | 6 relu | 7 blur_down
  8 conv3(4ngf) | 9 norm | 10 relu | 11 blur_down
  12..20 resblock(4ngf) x9
  21 blur_up | 22 conv3(2ngf) | 23 norm | 24 relu
  25 blur_up | 26 conv3(ngf) | 27 norm | 28 relu
  29 pad3 | 30 conv7(output_nc) | 31 tanh
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from dfmir_tpu.nets.layers import ConvND, ConvTransposeTorch, instance_norm, norm_fn, pad_nd
from dfmir_tpu.ops.filters import blur_downsample, blur_upsample


def resnet_generator_specs(
    input_nc: int = 1,
    output_nc: int = 1,
    ngf: int = 64,
    n_blocks: int = 9,
    no_antialias: bool = False,
    no_antialias_up: bool = False,
) -> List[Dict[str, Any]]:
    """Op list with reference-Sequential index parity.

    Each spec: {'kind', 'channels' (output channel count), ...kind args}.
    """
    specs: List[Dict[str, Any]] = []

    def add(kind, channels, **kw):
        specs.append(dict(kind=kind, channels=channels, **kw))

    add("pad", input_nc, pad=3)
    add("conv", ngf, kernel=7, stride=1, padding=0)
    add("norm", ngf)
    add("relu", ngf)
    n_down = 2
    for i in range(n_down):
        mult = 2 ** i
        if no_antialias:
            add("conv", ngf * mult * 2, kernel=3, stride=2, padding=1)
            add("norm", ngf * mult * 2)
            add("relu", ngf * mult * 2)
        else:
            add("conv", ngf * mult * 2, kernel=3, stride=1, padding=1)
            add("norm", ngf * mult * 2)
            add("relu", ngf * mult * 2)
            add("blur_down", ngf * mult * 2)
    mult = 2 ** n_down
    for _ in range(n_blocks):
        add("resblock", ngf * mult)
    for i in range(n_down):
        mult = 2 ** (n_down - i)
        if no_antialias_up:
            add("convT", ngf * mult // 2, kernel=3, stride=2, padding=1,
                output_padding=1)
            add("norm", ngf * mult // 2)
            add("relu", ngf * mult // 2)
        else:
            add("blur_up", ngf * mult)
            add("conv", ngf * mult // 2, kernel=3, stride=1, padding=1)
            add("norm", ngf * mult // 2)
            add("relu", ngf * mult // 2)
    add("pad", ngf, pad=3)
    add("conv", output_nc, kernel=7, stride=1, padding=0, final=True)
    add("tanh", output_nc)
    return specs


def nce_feature_dims(nce_layers: Sequence[int], **gen_kwargs) -> List[int]:
    """Channel count of each tapped activation (feeds PatchSampleF MLPs)."""
    specs = resnet_generator_specs(**gen_kwargs)
    dims = []
    for l in nce_layers:
        dims.append(specs[l]["channels"] if l < len(specs) else specs[-1]["channels"])
    return dims


class ResnetBlock(nn.Module):
    """pad-conv-norm-relu-[dropout]-pad-conv-norm with residual skip
    (reference networks.py:1164-1221)."""

    dim: int
    padding_type: str = "reflect"
    norm: str = "instance"
    use_dropout: bool = False
    use_bias: bool = True
    init_type: str = "xavier"
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x, train: bool = True):
        nf = norm_fn(self.norm)
        p = 1 if self.padding_type == "zero" else 0
        h = x
        if p == 0:
            h = pad_nd(h, 1, self.padding_type)
        h = ConvND(self.dim, 3, 1, p, self.use_bias, self.init_type, self.init_gain)(h)
        h = nn.relu(nf(h))
        if self.use_dropout:
            h = nn.Dropout(0.5, deterministic=not train)(h)
        if p == 0:
            h = pad_nd(h, 1, self.padding_type)
        h = ConvND(self.dim, 3, 1, p, self.use_bias, self.init_type, self.init_gain)(h)
        h = nf(h)
        return x + h


class ResnetGenerator(nn.Module):
    input_nc: int = 1
    output_nc: int = 1
    ngf: int = 64
    n_blocks: int = 9
    norm: str = "instance"
    use_dropout: bool = False
    no_antialias: bool = False
    no_antialias_up: bool = False
    padding_type: str = "reflect"
    init_type: str = "xavier"
    init_gain: float = 0.02

    def specs(self):
        return resnet_generator_specs(
            self.input_nc, self.output_nc, self.ngf, self.n_blocks,
            self.no_antialias, self.no_antialias_up,
        )

    @nn.compact
    def __call__(self, x, layers: Tuple[int, ...] = (), encode_only: bool = False,
                 train: bool = True):
        """Forward; with ``layers`` returns tapped activations.

        Matches reference forward (networks.py:1028-1051): ``layers`` of
        Sequential indices; ``encode_only`` early-exits after ``layers[-1]``
        and returns only the feature list; otherwise returns
        ``(output, feats)``; with no layers returns the output alone.
        """
        layers = tuple(layers)
        specs = self.specs()
        if -1 in layers:
            layers = tuple(l for l in layers if l != -1) + (len(specs),)
        bad = [l for l in layers if l < 0 or l > len(specs)]
        if bad:
            raise ValueError(
                f"nce_layers {bad} out of range for this generator "
                f"({len(specs)} sequential ops); the reference silently "
                f"drops such taps — here that is a loud error")
        use_bias = self.norm == "instance"
        nf = norm_fn(self.norm)

        feats = []
        h = x
        for i, s in enumerate(specs):
            kind = s["kind"]
            if kind == "pad":
                h = pad_nd(h, s["pad"], self.padding_type)
            elif kind == "conv":
                bias = True if s.get("final") else use_bias
                h = ConvND(s["channels"], s["kernel"], s["stride"], s["padding"],
                           bias, self.init_type, self.init_gain,
                           name=f"layer_{i}")(h)
            elif kind == "convT":
                h = ConvTransposeTorch(s["channels"], s["kernel"], s["stride"],
                                       s["padding"], s["output_padding"],
                                       use_bias, self.init_type, self.init_gain,
                                       name=f"layer_{i}")(h)
            elif kind == "norm":
                h = nf(h)
            elif kind == "relu":
                h = nn.relu(h)
            elif kind == "blur_down":
                h = blur_downsample(h)
            elif kind == "blur_up":
                h = blur_upsample(h)
            elif kind == "resblock":
                h = ResnetBlock(s["channels"], self.padding_type, self.norm,
                                self.use_dropout, use_bias, self.init_type,
                                self.init_gain, name=f"layer_{i}")(h, train=train)
            elif kind == "tanh":
                h = jnp.tanh(h)
            else:
                raise ValueError(kind)
            if layers and i in layers:
                feats.append(h)
            if layers and encode_only and i == layers[-1]:
                return feats
        if layers:
            return h, feats
        return h
