"""UNet generator (capability of /root/reference/models/networks.py:1224-1323,
the ``--netG unet_256 / unet_128`` choices).

The reference builds the net recursively from UnetSkipConnectionBlocks; the
math is an encoder of 4x4 stride-2 convs (LeakyReLU 0.2 going down, no norm
on the outermost/innermost), a mirrored decoder of 4x4 stride-2 transposed
convs (ReLU going up, Tanh at the output), and channel-concat skips at every
level.  Channel widths: ngf, 2ngf, 4ngf, then 8ngf for every deeper level
(num_downs levels total: 8 for unet_256, 7 for unet_128).  Implemented here
iteratively — identical topology, flat param tree.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from dfmir_tpu.nets.layers import ConvND, ConvTransposeTorch, norm_fn


class UnetGenerator(nn.Module):
    input_nc: int = 1
    output_nc: int = 1
    num_downs: int = 8
    ngf: int = 64
    norm: str = "instance"
    use_dropout: bool = False
    init_type: str = "xavier"
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x, layers=(), encode_only: bool = False,
                 train: bool = True):
        """Forward; ``layers`` taps encoder activations for PatchNCE.

        The reference UnetGenerator has no feature-tap interface (its
        forward takes only the input, networks.py:1320-1323, so the
        reference crashes when ``--netG unet_256`` meets the CUT loss);
        here tap index i in [0, num_downs) returns the encoder activation
        after ``down_i`` (post-norm), making the choice trainable
        end-to-end.  With ``encode_only`` returns only the tapped list;
        with ``layers`` and not ``encode_only`` returns ``(output, feats)``.
        """
        layers = tuple(layers)
        if layers and (min(layers) < 0 or max(layers) >= self.num_downs):
            raise ValueError(
                f"UnetGenerator taps index encoder levels 0..{self.num_downs - 1}; "
                f"got nce_layers={layers}.  Pass e.g. --nce_layers "
                + ",".join(str(i) for i in range(0, self.num_downs, 2)))
        nf = norm_fn(self.norm)
        widths = []
        for i in range(self.num_downs):
            widths.append(self.ngf * min(2 ** i, 8))

        # ----- encoder: conv(k4 s2 p1); LeakyReLU *before* every conv
        # except the outermost (recursion puts downrelu inside each block)
        skips = []
        feats = []
        h = x
        for i, w in enumerate(widths):
            if i > 0:
                h = nn.leaky_relu(h, 0.2)
            h = ConvND(w, kernel=4, stride=2, padding=1,
                       init_type=self.init_type, init_gain=self.init_gain,
                       name=f"down_{i}")(h)
            # innermost & outermost blocks have no norm after downconv
            if 0 < i < self.num_downs - 1:
                h = nf(h)
            skips.append(h)
            if i in layers:
                feats.append(h)
                if encode_only and i == max(layers):
                    return feats

        # ----- decoder: ReLU -> convT(k4 s2 p1) -> norm, concat skips.
        # Middle 8ngf blocks carry Dropout(0.5) when use_dropout.
        for i in reversed(range(self.num_downs)):
            out_ch = self.output_nc if i == 0 else widths[i - 1]
            h = nn.relu(h)
            h = ConvTransposeTorch(out_ch, kernel=4, stride=2, padding=1,
                                   output_padding=0,
                                   init_type=self.init_type,
                                   init_gain=self.init_gain,
                                   name=f"up_{i}")(h)
            if i == 0:
                out = jnp.tanh(h)
                return (out, feats) if layers else out
            h = nf(h)
            is_middle = (i >= 4) and (i < self.num_downs - 1)
            if self.use_dropout and is_middle:
                h = nn.Dropout(0.5, deterministic=not train)(h)
            h = jnp.concatenate([skips[i - 1], h], axis=-1)
        raise AssertionError("unreachable")
