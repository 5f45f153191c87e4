"""Transformer-fusion registration variants (capability of the reference's
alternate nets: Unet_Transformer / VxmDenseTransformer / DualUnet /
VxmDenseDual, /root/reference/models/voxelmorph/torchvoxelmorph/
networks.py:124-519, 829-1503, with the TransFuser-style GPT blocks from
util/trans_model.py:71-243; none are on the paper's default path).

Architecture: one strided-conv encoder per modality; at every level both
streams are average-pooled to an anchors x anchors token grid, a joint
transformer (self-attention over the concatenated token set + learnable
positional embedding) exchanges information, tokens are bilinearly
upsampled back and added residually; the decoder consumes the concatenated
fused skip pairs.  Attention over 2*8*8=128 tokens is a natural MXU
workload.  ``fuse='none'`` gives the plain dual-encoder variant
(VxmDenseDual).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from dfmir_tpu.nets.inits import normal_init
from dfmir_tpu.nets.layers import Conv3DZ, upsample_nearest
from dfmir_tpu.nets.vxm import VxmConvBlock
from dfmir_tpu.ops.integrate import resize_flow, vecint
from dfmir_tpu.ops.warp import warp


def _adaptive_avg_pool(x, out: int):
    """(B, H, W, C) -> (B, out, out, C); exact torch bins."""
    B, H, W, C = x.shape
    if H % out == 0 and W % out == 0:
        x = x.reshape(B, out, H // out, out, W // out, C)
        return x.mean(axis=(2, 4))
    from dfmir_tpu.nets.feature_nets import _adaptive_pool

    return _adaptive_pool(x, out, jnp.mean)


def _bilinear_resize(x, h: int, w: int):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), "bilinear")


class TransformerBlock(nn.Module):
    """Pre-LN self-attention + MLP (reference Block, trans_model.py:106-131)."""

    n_head: int = 4
    block_exp: int = 4

    @nn.compact
    def __call__(self, tokens, deterministic: bool = True):
        C = tokens.shape[-1]
        h = nn.LayerNorm()(tokens)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_head, qkv_features=C,
            kernel_init=normal_init(0.02))(h, h)
        tokens = tokens + h
        h = nn.LayerNorm()(tokens)
        h = nn.Dense(C * self.block_exp, kernel_init=normal_init(0.02))(h)
        h = nn.relu(h)
        h = nn.Dense(C, kernel_init=normal_init(0.02))(h)
        return tokens + h


class GPTFusion(nn.Module):
    """Joint transformer over the pooled tokens of both streams
    (reference GPT, trans_model.py:134-243)."""

    n_head: int = 4
    n_layer: int = 8
    block_exp: int = 4
    anchors: int = 8

    @nn.compact
    def __call__(self, xa, xb):
        B, P, Pw, C = xa.shape
        tok = jnp.concatenate([xa.reshape(B, -1, C), xb.reshape(B, -1, C)],
                              axis=1)
        pos = self.param("pos_emb", nn.initializers.zeros_init(),
                         (1, tok.shape[1], C))
        tok = tok + pos
        for i in range(self.n_layer):
            tok = TransformerBlock(self.n_head, self.block_exp,
                                   name=f"block_{i}")(tok)
        tok = nn.LayerNorm(name="ln_f")(tok)
        n = P * Pw
        return (tok[:, :n].reshape(B, P, Pw, C),
                tok[:, n:].reshape(B, P, Pw, C))


class CrossAttentionFusion(nn.Module):
    """Non-local cross-attention between two streams (capability of the
    reference NLBlockND_cross / AttentionNet, networks.py:560-720): each
    stream attends over the other's tokens; residual add."""

    n_head: int = 4

    @nn.compact
    def __call__(self, ta, tb):
        B, P, Pw, C = ta.shape
        qa = ta.reshape(B, -1, C)
        qb = tb.reshape(B, -1, C)
        attn_ab = nn.MultiHeadDotProductAttention(
            num_heads=self.n_head, qkv_features=C,
            kernel_init=normal_init(0.02), name="a_from_b")
        attn_ba = nn.MultiHeadDotProductAttention(
            num_heads=self.n_head, qkv_features=C,
            kernel_init=normal_init(0.02), name="b_from_a")
        fa = qa + attn_ab(nn.LayerNorm()(qa), nn.LayerNorm()(qb))
        fb = qb + attn_ba(nn.LayerNorm()(qb), nn.LayerNorm()(qa))
        return fa.reshape(B, P, Pw, C), fb.reshape(B, P, Pw, C)


class TransFusionUnet(nn.Module):
    """Dual-encoder UNet with cross-modal token fusion.

    fuse modes (capabilities of the reference variant zoo,
    torchvoxelmorph/networks.py:124-825):
    - 'gpt':        joint GPT fusion at EVERY level (Unet_Transformer)
    - 'bottleneck': joint GPT fusion at the deepest level only
                    (Whole_Transformer)
    - 'cross':      per-level non-local cross-attention (AttentionNet /
                    NLBlockND_cross)
    - 'none':       plain dual encoders (DualUnet)
    """

    enc_nf: Sequence[int] = (16, 32, 32, 64, 64, 64)
    dec_nf: Sequence[int] = (64, 64, 64, 32, 32, 32, 16)
    n_head: int = 4
    n_layer: int = 8
    anchors: int = 8
    fuse: str = "gpt"  # 'gpt' | 'bottleneck' | 'cross' | 'none'

    @nn.compact
    def __call__(self, x, y):
        if self.fuse not in ("gpt", "bottleneck", "cross", "none"):
            raise ValueError(f"unknown fuse mode {self.fuse!r}")
        skips = [jnp.concatenate([x, y], axis=-1)]
        hx, hy = x, y
        n_levels = len(self.enc_nf)
        for i, nf in enumerate(self.enc_nf):
            hx = VxmConvBlock(nf, stride=2, name=f"down_x_{i}")(hx)
            hy = VxmConvBlock(nf, stride=2, name=f"down_y_{i}")(hy)
            here = (self.fuse == "gpt"
                    or (self.fuse == "bottleneck" and i == n_levels - 1)
                    or self.fuse == "cross")
            if here:
                ta = _adaptive_avg_pool(hx, self.anchors)
                tb = _adaptive_avg_pool(hy, self.anchors)
                if self.fuse == "cross":
                    fa, fb = CrossAttentionFusion(
                        self.n_head, name=f"fusion_{i}")(ta, tb)
                else:
                    fa, fb = GPTFusion(self.n_head, self.n_layer,
                                       anchors=self.anchors,
                                       name=f"fusion_{i}")(ta, tb)
                H, W = hx.shape[1], hx.shape[2]
                hx = hx + _bilinear_resize(fa, H, W)
                hy = hy + _bilinear_resize(fb, H, W)
            skips.append(jnp.concatenate([hx, hy], axis=-1))

        h = skips.pop()
        for i, nf in enumerate(self.dec_nf[: len(self.enc_nf)]):
            h = VxmConvBlock(nf, name=f"up_{i}")(h)
            h = upsample_nearest(h)
            h = jnp.concatenate([h, skips.pop()], axis=-1)
        for i, nf in enumerate(self.dec_nf[len(self.enc_nf):]):
            h = VxmConvBlock(nf, name=f"extra_{i}")(h)
        return h


class VxmDenseTransformer(nn.Module):
    """Transformer-fusion VxmDense (reference VxmDenseTransformer,
    networks.py:1244-1370): TransFusionUnet -> flow head -> half-res
    scaling-and-squaring -> dense warps."""

    ndims: int = 2
    nb_features: Tuple[Tuple[int, ...], Tuple[int, ...]] = (
        (16, 32, 32, 64, 64, 64), (64, 64, 64, 32, 32, 32, 16))
    int_steps: int = 7
    int_downsize: int = 2
    bidir: bool = True
    fuse: str = "gpt"
    n_head: int = 4
    n_layer: int = 8

    @nn.compact
    def __call__(self, source, target, registration: bool = False):
        enc_nf, dec_nf = self.nb_features
        x = TransFusionUnet(tuple(enc_nf), tuple(dec_nf),
                            n_head=self.n_head, n_layer=self.n_layer,
                            fuse=self.fuse, name="unet")(source, target)
        if self.ndims == 3:
            # same param tree/shapes as nn.Conv; z-decomposed MXU lowering
            # (XLA's conv3d leaves >10x on the table — see Conv3DZ)
            flow_field = Conv3DZ(
                self.ndims, kernel_size=(3,) * 3, padding=[(1, 1)] * 3,
                kernel_init=normal_init(1e-5),
                bias_init=nn.initializers.zeros_init(), name="flow")(x)
        else:
            flow_field = nn.Conv(
                self.ndims, kernel_size=(3,) * self.ndims, padding=1,
                kernel_init=normal_init(1e-5),
                bias_init=nn.initializers.zeros_init(), name="flow")(x)

        do_resize = self.int_steps > 0 and self.int_downsize > 1
        pos_flow = flow_field
        if do_resize:
            pos_flow = resize_flow(pos_flow, 1.0 / self.int_downsize)
        preint_flow = pos_flow
        neg_flow = -pos_flow if self.bidir else None
        if self.int_steps > 0:
            pos_flow = vecint(pos_flow, self.int_steps)
            neg_flow = vecint(neg_flow, self.int_steps) if self.bidir \
                else None
            if do_resize:
                pos_flow = resize_flow(pos_flow, float(self.int_downsize))
                neg_flow = (resize_flow(neg_flow, float(self.int_downsize))
                            if self.bidir else None)
        y_source = warp(source, pos_flow)
        y_target = warp(target, neg_flow) if self.bidir else None
        if not registration:
            return ((y_source, y_target, pos_flow) if self.bidir
                    else (y_source, preint_flow))
        return y_source, pos_flow


def VxmDenseDual(**kwargs):
    """Dual-encoder VxmDense without token fusion (reference VxmDenseDual,
    networks.py:1446-1503)."""
    kwargs.setdefault("fuse", "none")
    return VxmDenseTransformer(**kwargs)
