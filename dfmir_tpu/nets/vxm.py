"""VoxelMorph-style dense registration network (2-D and 3-D).

Mirrors the reference VxmDense + Unet
(/root/reference/models/voxelmorph/torchvoxelmorph/networks.py:9-106,
1028-1145): strided-conv encoder (LeakyReLU 0.2), nearest-upsample decoder
with skip concats, extra full-res convs (input = decoder out ++ unet input),
a 3x3 flow head initialized ~N(0, 1e-5) with zero bias, half-resolution
scaling-and-squaring integration (int_downsize=2, int_steps=7), full-size
resize, and dense warps of source (and target with the negated SVF when
bidirectional).

UNet convs use torch's default init (the reference never passes netR through
init_net).  All resize/integrate/warp steps come from dfmir_tpu.ops and run
inside the same jit scope.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from dfmir_tpu.nets.inits import normal_init
from dfmir_tpu.nets.layers import (Conv2DLC, Conv3DZ, ConvND,
                                   _lowchan_engaged, upsample_nearest)
from dfmir_tpu.ops.integrate import resize_flow, vecint
from dfmir_tpu.ops.warp import warp


def default_unet_features():
    return [[16, 32, 32, 32], [32, 32, 32, 32, 32, 16, 16]]


class VxmConvBlock(nn.Module):
    """3x3 conv (torch-default init) + LeakyReLU(0.2)."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = ConvND(self.features, kernel=3, stride=self.stride, padding=1,
                   init_type="torch_default")(x)
        return nn.leaky_relu(x, negative_slope=0.2)


class VxmUnet(nn.Module):
    enc_nf: Sequence[int]
    dec_nf: Sequence[int]

    @nn.compact
    def __call__(self, x):
        x_enc = [x]
        for i, nf in enumerate(self.enc_nf):
            x_enc.append(VxmConvBlock(nf, stride=2, name=f"down_{i}")(x_enc[-1]))
        h = x_enc.pop()
        for i, nf in enumerate(self.dec_nf[: len(self.enc_nf)]):
            h = VxmConvBlock(nf, name=f"up_{i}")(h)
            h = upsample_nearest(h)
            h = jnp.concatenate([h, x_enc.pop()], axis=-1)
        for i, nf in enumerate(self.dec_nf[len(self.enc_nf):]):
            h = VxmConvBlock(nf, name=f"extra_{i}")(h)
        return h


class VxmDense(nn.Module):
    """Returns (bidir, training): (y_source, y_target, pos_flow_fullres);
    (bidir, registration=True): (y_source, pos_flow_fullres);
    (unidir, training): (y_source, preint_flow)."""

    ndims: int = 2
    nb_features: Tuple[Tuple[int, ...], Tuple[int, ...]] = (
        (16, 32, 32, 64, 64, 64), (64, 64, 64, 32, 32, 32, 16))
    int_steps: int = 7
    int_downsize: int = 2
    bidir: bool = True
    compute_dtype: str = "float32"  # UNet conv dtype; flow math stays f32

    @nn.compact
    def __call__(self, source, target, registration: bool = False,
                 return_preint: bool = False):
        enc_nf, dec_nf = self.nb_features
        x = jnp.concatenate([source, target], axis=-1)
        # The convs are the FLOPs; bf16 feeds the MXU at double rate.  All
        # flow-field math (resize / integrate / warp coordinates) stays in
        # f32: pixel coordinates up to S-1 need more mantissa than bf16's 8
        # bits (a 0.5-px coordinate error at 256 would swamp the warp).
        x = x.astype(jnp.dtype(self.compute_dtype))
        x = VxmUnet(tuple(enc_nf), tuple(dec_nf), name="unet")(x)

        if self.ndims == 3:
            # same param tree/shapes as nn.Conv; z-decomposed MXU lowering
            flow_field = Conv3DZ(
                self.ndims, kernel_size=(3, 3, 3),
                padding=[(1, 1)] * 3,
                kernel_init=normal_init(1e-5),
                bias_init=nn.initializers.zeros_init(),
                name="flow",
            )(x).astype(jnp.float32)
        elif _lowchan_engaged(x.shape[-1], self.ndims):
            # C_out = 2 starves the conv matmul's N axis; contraction-
            # first tapdot lowering (same param tree as nn.Conv)
            flow_field = Conv2DLC(
                self.ndims, kernel_size=(3, 3),
                padding=[(1, 1)] * 2,
                kernel_init=normal_init(1e-5),
                bias_init=nn.initializers.zeros_init(),
                name="flow",
            )(x).astype(jnp.float32)
        else:
            flow_field = nn.Conv(
                self.ndims, kernel_size=(3,) * self.ndims, padding=1,
                kernel_init=normal_init(1e-5),
                bias_init=nn.initializers.zeros_init(),
                name="flow",
            )(x).astype(jnp.float32)

        do_resize = self.int_steps > 0 and self.int_downsize > 1
        pos_flow = flow_field
        if do_resize:
            pos_flow = resize_flow(pos_flow, 1.0 / self.int_downsize)
        preint_flow = pos_flow
        neg_flow = -pos_flow if self.bidir else None

        if self.int_steps > 0 and self.bidir and not registration:
            # Batch the pos/neg integrations into ONE scaling-and-squaring
            # chain: vecint's 7 warps are strictly serial, so stacking the
            # two flows halves the serial depth (7 batched warps instead of
            # 14) at near-zero extra cost per warp.  Exact: every op in the
            # chain (warp / resize / add) is per-sample.  Skipped in
            # registration mode, where the neg branch is unused and XLA
            # dead-code-eliminates it entirely.
            b = source.shape[0]
            both = vecint(jnp.concatenate([pos_flow, neg_flow], axis=0),
                          self.int_steps)
            if do_resize:
                both = resize_flow(both, float(self.int_downsize))
            pos_flow, neg_flow = both[:b], both[b:]
            # the two full-res warps batch the same way
            warped = warp(jnp.concatenate([source, target], axis=0), both)
            y_source, y_target = warped[:b], warped[b:]
        else:
            if self.int_steps > 0:
                pos_flow = vecint(pos_flow, self.int_steps)
                neg_flow = (vecint(neg_flow, self.int_steps)
                            if self.bidir else None)
                if do_resize:
                    pos_flow = resize_flow(pos_flow, float(self.int_downsize))
                    neg_flow = (
                        resize_flow(neg_flow, float(self.int_downsize))
                        if self.bidir else None
                    )
            y_source = warp(source, pos_flow)
            y_target = warp(target, neg_flow) if self.bidir else None

        if not registration:
            out = ((y_source, y_target, pos_flow) if self.bidir
                   else (y_source, preint_flow))
        else:
            out = (y_source, pos_flow)
        if return_preint:
            out = out + (preint_flow,)
        return out
