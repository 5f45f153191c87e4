"""Shared NN building blocks (flax.linen), matching reference semantics.

- ``instance_norm``: torch InstanceNorm2d/3d(affine=False,
  track_running_stats=False), eps 1e-5 (reference networks.py:125).
- ``pad_nd``: reflect/replicate/zero spatial padding.
- ``ConvTransposeTorch``: torch ConvTranspose semantics (kernel flip +
  output_padding) expressed as an lhs-dilated conv.
- ``upsample_nearest``: torch nn.Upsample(scale_factor=2, mode='nearest').

Layout NHWC / NDHWC.
"""

from __future__ import annotations

import functools
import os
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from dfmir_tpu.nets.inits import get_initializer

PAD_MODES = {"reflect": "reflect", "refl": "reflect",
             "replicate": "edge", "repl": "edge", "zero": "constant"}


def instance_norm(x, eps: float = 1e-5):
    """Per-sample, per-channel spatial normalization (no affine params).

    Statistics are always accumulated in float32 (bf16 mean/var over 256^2
    positions is too coarse); the result is cast back to the input dtype.
    """
    axes = tuple(range(1, x.ndim - 1))
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=axes, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def pad_nd(x, pad: int, mode: str = "reflect"):
    """Pad all spatial dims of (B, *spatial, C) by ``pad`` on both sides."""
    nd = x.ndim - 2
    widths = [(0, 0)] + [(pad, pad)] * nd + [(0, 0)]
    return jnp.pad(x, widths, mode=PAD_MODES[mode])


def upsample_nearest(x, scale: int = 2):
    """Nearest-neighbor upsample of every spatial dim (torch Upsample)."""
    nd = x.ndim - 2
    for axis in range(1, 1 + nd):
        x = jnp.repeat(x, scale, axis=axis)
    return x


def norm_fn(norm: str):
    if norm == "instance":
        return instance_norm
    if norm == "none":
        return lambda x: x
    if norm == "batch":
        raise NotImplementedError(
            "batch norm requires mutable state; use --normG instance|none"
        )
    raise NotImplementedError(f"normalization layer [{norm}] is not found")


# Packed-width lowering for the zdecomp conv2d's low-C_out cases:
# DFMIR_TPU_CONV3D_WPACK=p (2/4/8) packs p width-neighbors into lanes
# (see conv2d_wpack); 0/unset = off.  A/B knob, measured on chip by
# scripts/measure_convpack.py before any default change.
WPACK = int(os.environ.get("DFMIR_TPU_CONV3D_WPACK", "0") or "0")
if WPACK not in (0, 1, 2, 4, 8):
    raise ValueError(f"DFMIR_TPU_CONV3D_WPACK must be 0/1/2/4/8, "
                     f"got {WPACK}")

# DFMIR_TPU_CONV3D_BARRIER=1: materialize the z-tap stack via
# optimization_barrier before each zdecomp conv (fusion A/B probe).
ZBARRIER = os.environ.get("DFMIR_TPU_CONV3D_BARRIER", "0") not in (
    "0", "", "false", "off")


def conv3d_zdecomp(x, w, strides, padding):
    """3-D conv lowered as ONE 2-D conv over z-tap-concatenated channels.

    XLA's native conv3d lowering runs at 1-11 TFLOP/s bf16 on v5e at the
    volumetric UNet's shapes while the identical math expressed as a 2-D
    conv hits 13.5-14.5 TFLOP/s (scripts/measure_conv3d.py: 11.4x at
    160^3 2->16, 5.6x at 40^3 32->32, 1.35x at the full-res decoder conv,
    parity at worst).  The rewrite: output slice d needs input slices
    d*sz+t-pz for the kz z-taps t, so stack those kz shifted views on a new
    trailing-but-one axis, merge (kz, Cin) into the channel dim of a
    (B*Dout, H, W, kz*Cin) batch, and run one conv2d whose kernel is the 3-D
    kernel reshaped (ky, kx, kz*Cin, Cout) — exact, not an approximation.

    ``x``: (B, D, H, W, C); ``w``: (kz, ky, kx, Cin, Cout); ``strides``:
    (sz, sy, sx); ``padding``: three (lo, hi) pairs.  Replaces the op at
    /root/reference/models/voxelmorph/torchvoxelmorph/networks.py:99-106
    (nn.Conv3d) on the TPU compute path.
    """
    B, D, H, W, C = x.shape
    kz, ky, kx, ci, co = w.shape
    sz, sy, sx = strides
    (pzl, pzr), py, px = padding
    xp = jnp.pad(x, [(0, 0), (pzl, pzr), (0, 0), (0, 0), (0, 0)])
    d_out = (D + pzl + pzr - kz) // sz + 1
    span = (d_out - 1) * sz + 1
    taps = [xp[:, t:t + span:sz] for t in range(kz)]
    x2 = jnp.stack(taps, axis=4).reshape(B * d_out, H, W, kz * C)
    if ZBARRIER:
        # force the stacked z-tap tensor to materialize instead of fusing
        # into the conv's input — the A/B probe for "does XLA's
        # stack-into-conv fusion deoptimize the conv kernel?"
        # (measure_unet3d.py; isolated convs run 4-5x faster than the
        # same convs inside the UNet graph)
        x2 = jax.lax.optimization_barrier(x2)
    k2 = w.transpose(1, 2, 0, 3, 4).reshape(ky, kx, kz * ci, co)
    if (WPACK > 1 and (ky, kx) == (3, 3) and (sy, sx) == (1, 1)
            and tuple(py) == (1, 1) and tuple(px) == (1, 1)
            and W % WPACK == 0 and co <= 32):
        y = conv2d_wpack(x2, k2, WPACK)
    else:
        y = jax.lax.conv_general_dilated(
            x2, k2, window_strides=(sy, sx), padding=[py, px],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y.reshape(B, d_out, y.shape[1], y.shape[2], co)


def _conv3d_xla(x, w, strides, padding):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=tuple(strides), padding=list(padding),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def conv2d_wpack(x, k, p: int):
    """Exact SAME 3x3 stride-1 conv2d with ``p`` width-neighbors packed
    into channels, so the MXU matmul's N axis carries p*C_out lanes
    instead of C_out.

    The volumetric UNet's convs put C_out=16..32 on N — 16/128 lanes —
    and run at 13.5-14.5 TFLOP/s on v5e (scripts/measure_conv3d.py).
    Packing trades 2p/3 x more flops (the packed kernel spans exactly
    TWO packed columns thanks to an offset-by-(-1) input packing; taps
    landing outside an offset's 3-window are zero-filled) for p x lane
    occupancy.  Bit-exact vs lax conv (scripts/measure_convpack.py).

    x: (N, H, W, C); k: (3, 3, C, Co); requires W % p == 0.
    """
    N, H, W, C = x.shape
    ky, kx, _, Co = k.shape
    assert (ky, kx) == (3, 3) and W % p == 0, (k.shape, W, p)
    # packed col j holds original cols p*j-1 .. p*j+p-2
    xpw = jnp.pad(x, [(0, 0), (0, 0), (1, p - 1), (0, 0)])
    xs = xpw.reshape(N, H, W // p + 1, p * C)
    # output offset a, tap dx reads original col u = p*j + a + dx - 1
    #   = p*(j + dxp) + b - 1  with  dxp, b = divmod(a + dx, p)
    ks = jnp.zeros((3, 2, p, C, p, Co), k.dtype)
    for a in range(p):
        for dx in range(3):
            dxp, b = divmod(a + dx, p)
            ks = ks.at[:, dxp, b, :, a, :].add(k[:, dx])
    ks = ks.reshape(3, 2, p * C, p * Co)
    ys = jax.lax.conv_general_dilated(
        xs, ks, window_strides=(1, 1), padding=[(1, 1), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return ys.reshape(N, H, W, Co)


def conv3d_tapdot(x, w, strides, padding):
    """3-D conv with FEW OUTPUT channels, channel contraction first.

    The VxmDense flow head (3x3x3, 16 -> 3 at full volume; reference
    networks.py:1113 ``self.flow``) puts C_out=3 on the matmul's N axis
    under any conv lowering — 3/128 lane occupancy.  Same reordering as
    conv2d_tapdot: one matmul x @ w' with N = kz*ky*kx*C_out tap-planes,
    then the tap-planes shift-add on the VPU.  Exact reordering."""
    B, D, H, W, C = x.shape
    kz, ky, kx, ci, co = w.shape
    sz, sy, sx = strides
    (pzl, pzr), (pyl, pyr), (pxl, pxr) = padding
    d_out = (D + pzl + pzr - kz) // sz + 1
    h_out = (H + pyl + pyr - ky) // sy + 1
    w_out = (W + pxl + pxr - kx) // sx + 1
    nt = kz * ky * kx
    wt = jnp.transpose(w, (3, 0, 1, 2, 4)).reshape(ci, nt * co)
    z = jnp.einsum("bdhwc,ck->bdhwk", x, wt)
    zp = jnp.pad(z, [(0, 0), (pzl, pzr), (pyl, pyr), (pxl, pxr), (0, 0)])
    zr = zp.reshape(zp.shape[0], zp.shape[1], zp.shape[2], zp.shape[3],
                    nt, co)
    spz = (d_out - 1) * sz + 1
    spy = (h_out - 1) * sy + 1
    spx = (w_out - 1) * sx + 1
    y = jnp.zeros((B, d_out, h_out, w_out, co), z.dtype)
    for t in range(nt):
        tz, r = divmod(t, ky * kx)
        ty, tx = divmod(r, kx)
        y = y + zr[:, tz:tz + spz:sz, ty:ty + spy:sy,
                   tx:tx + spx:sx, t, :]
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3d_hybrid(x, w, strides, padding):
    """Native-XLA conv3d FORWARD with the z-decomposed conv2d BACKWARD.

    The on-chip A/B (BENCH_MODES_r04.json train3d.conv_impl_ab) showed the
    split verdict: inside the full 160^3 UNet the z-decomposed forward is
    SLOWER than XLA's native conv3d (84.8 vs 60.3 ms — the kz stacked
    full-volume views cost HBM traffic the isolated-op microbenchmark
    never paid), while the whole train step is 160 ms FASTER (597 vs
    758 ms), i.e. the entire win lives in the backward, where XLA's
    conv3d dgrad/wgrad lowerings are the pathology.  This custom_vjp
    takes each direction from its measured winner.  Gradients are the
    VJP of conv3d_zdecomp, which computes the identical mathematical
    function — exact, not an approximation.

    The first hybrid attempt (jax.vjp of conv3d_zdecomp inside the
    backward) measured 704 ms/step vs zdecomp's 597 — jax.vjp RE-RUNS
    the primal forward to build the linearization, so every backward
    paid an extra zdecomp forward.  A conv is linear in each argument
    separately, so jax.linear_transpose builds the same fast conv2d
    dgrad/wgrad lowerings from a shape-only trace — no primal compute.

    MEASURED REJECTION x2 (BENCH_MODES_r04.json conv_impl_ab): even the
    linear_transpose form lands at 388.6 ms/step vs zdecomp's 273.4 —
    the fused whole-graph zdecomp backward reuses the forward's stacked
    z-tap tensor for wgrad, while the custom_vjp seam forces the
    backward to rebuild it from x (extra HBM round trip per conv) and
    blocks fusion across the boundary; the 24 ms native-forward win
    never comes close to covering that.  Kept selectable for future
    re-measurement; the default stays 'zdecomp'.
    """
    return _conv3d_xla(x, w, strides, padding)


def _conv3d_hybrid_fwd(x, w, strides, padding):
    return _conv3d_xla(x, w, strides, padding), (x, w)


def _conv3d_hybrid_bwd(strides, padding, res, g):
    x, w = res
    (dx,) = jax.linear_transpose(
        lambda x_: conv3d_zdecomp(x_, w, strides, padding), x)(g)
    (dw,) = jax.linear_transpose(
        lambda w_: conv3d_zdecomp(x, w_, strides, padding), w)(g)
    return dx, dw


conv3d_hybrid.defvjp(_conv3d_hybrid_fwd, _conv3d_hybrid_bwd)


# A/B switch for on-chip measurement: DFMIR_TPU_CONV3D selects the Conv3DZ
# lowering — 'hybrid' (native-XLA fwd + z-decomposed bwd, each direction's
# measured winner), 'zdecomp' (z-decomposed both directions), 'xla' (native
# conv3d both directions).  Read once at import (the choice must be stable
# across jit traces).  The default is the END-TO-END measured winner on
# v5e (BENCH_MODES_r04.json train3d.conv_impl_ab).
CONV3D_IMPL = os.environ.get("DFMIR_TPU_CONV3D", "zdecomp")
if CONV3D_IMPL not in ("zdecomp", "xla", "hybrid"):
    raise ValueError(f"DFMIR_TPU_CONV3D must be 'zdecomp', 'xla' or "
                     f"'hybrid', got {CONV3D_IMPL!r}")

# Low-C_out 3-D heads (the flow convs): 'tapdot' = contraction-first
# lowering (conv3d_tapdot), 'off' = the CONV3D_IMPL lowering.  A/B knob;
# default 'off' picked by on-chip netR_fwd A/B at 160^3: tapdot 108.05 ms
# vs z-decomp 99.61 ms — unlike the 2-D 7x7 64->1 case (44x win), the 3-D
# flow head's 16->3 contraction is cheap and the 27 full-volume tap-plane
# shift-adds dominate.  Keep the knob for other shapes.
CONV3D_LOWCHAN = os.environ.get("DFMIR_TPU_CONV3D_LOWCHAN", "off")
if CONV3D_LOWCHAN not in ("tapdot", "off"):
    raise ValueError(f"DFMIR_TPU_CONV3D_LOWCHAN must be 'tapdot' or "
                     f"'off', got {CONV3D_LOWCHAN!r}")


def conv2d_shift9(x, w, strides, padding):
    """2-D conv lowered as shift-concat taps -> ONE 1x1 conv (pure MXU
    matmul) — the 2-D analog of conv3d_zdecomp, targeting the joint
    model's hot 3x3 256->256 convs at 64^2 where the XLA lowering runs at
    ~26% of bf16 peak (README attribution; the FLOPs of
    /root/reference/models/networks.py:1164-1221).  Exact, not an
    approximation: output pixel (y, x) needs input (y*sy+dy-py,
    x*sx+dx-px) for the (ky, kx) taps, so stack the ky*kx shifted views on
    the channel axis and contract once with the kernel reshaped
    (1, 1, ky*kx*Cin, Cout).

    A/B-selectable via DFMIR_TPU_CONV2D (default 'xla' until the on-chip
    measurement picks a winner — scripts/measure_conv2d.py).
    """
    B, H, W, C = x.shape
    ky, kx, ci, co = w.shape
    sy, sx = strides
    (pyl, pyr), (pxl, pxr) = padding
    xp = jnp.pad(x, [(0, 0), (pyl, pyr), (pxl, pxr), (0, 0)])
    h_out = (H + pyl + pyr - ky) // sy + 1
    w_out = (W + pxl + pxr - kx) // sx + 1
    spy = (h_out - 1) * sy + 1
    spx = (w_out - 1) * sx + 1
    taps = [xp[:, ty:ty + spy:sy, tx:tx + spx:sx, :]
            for ty in range(ky) for tx in range(kx)]
    x2 = jnp.concatenate(taps, axis=-1)
    k2 = w.reshape(ky * kx * ci, co)[None, None]
    return jax.lax.conv_general_dilated(
        x2, k2, window_strides=(1, 1), padding=[(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


CONV2D_IMPL = os.environ.get("DFMIR_TPU_CONV2D", "xla")
if CONV2D_IMPL not in ("xla", "shift9"):
    raise ValueError(f"DFMIR_TPU_CONV2D must be 'xla' or 'shift9', "
                     f"got {CONV2D_IMPL!r}")


def conv2d_tapdot(x, w, strides, padding):
    """2-D conv with FEW OUTPUT channels, channel contraction first.

    XLA's NHWC conv lowering puts C_out on the matmul's N (lane) axis —
    at C_out=1 that is 1/128 lane occupancy, measured 0.61 TFLOP/s on v5e
    for the generator's final 7x7 64->1 conv (5.38 ms of a 16.4 ms netG
    forward; /root/reference/models/networks.py:1049 'c7s1-1').  Reorder
    the same arithmetic: one matmul x @ w' with N = ky*kx*C_out tap-planes
    (MXU-occupied), then the tap-planes shift-add on the VPU.  Measured
    0.121 ms — 44x (scripts/measure_conv2d.py conv7out_tapdot,
    CONV2D_r04.json).  Exact reordering, not an approximation.
    """
    B, H, W, C = x.shape
    ky, kx, ci, co = w.shape
    sy, sx = strides
    (pyl, pyr), (pxl, pxr) = padding
    h_out = (H + pyl + pyr - ky) // sy + 1
    w_out = (W + pxl + pxr - kx) // sx + 1
    # z[b,h,w,(tap,co)] = sum_c x[b,h,w,c] * w[ty,tx,c,co]
    wt = jnp.transpose(w, (2, 0, 1, 3)).reshape(ci, ky * kx * co)
    z = jnp.einsum("bhwc,ck->bhwk", x, wt)
    # padding zeros of x == padding zeros of z (per-pixel linear, no bias)
    zp = jnp.pad(z, [(0, 0), (pyl, pyr), (pxl, pxr), (0, 0)])
    zr = zp.reshape(zp.shape[0], zp.shape[1], zp.shape[2], ky * kx, co)
    spy = (h_out - 1) * sy + 1
    spx = (w_out - 1) * sx + 1
    y = jnp.zeros((B, h_out, w_out, co), z.dtype)
    for t in range(ky * kx):
        ty, tx = divmod(t, kx)
        y = y + zr[:, ty:ty + spy:sy, tx:tx + spx:sx, t, :]
    return y


def conv2d_im2col(x, w, strides, padding):
    """2-D conv with FEW INPUT channels as an explicit tap-concat matmul.

    XLA's conv at C_in=1 has a K=ky*kx*1 contraction with one real lane —
    measured 2.18 TFLOP/s for the generator's first 7x7 1->64 conv
    (1.51 ms); concatenating the ky*kx shifted views into channels first
    (K = ky*kx*C_in) measured 0.60 ms (scripts/measure_conv2d.py
    conv7in_s2d, CONV2D_r04.json).  Same math as conv2d_shift9 (which
    LOSES at 256 channels where XLA's native lowering is already at 91%
    of peak — see conv_hot_same); the win exists only at low C_in.
    """
    B, H, W, C = x.shape
    ky, kx, ci, co = w.shape
    sy, sx = strides
    (pyl, pyr), (pxl, pxr) = padding
    xp = jnp.pad(x, [(0, 0), (pyl, pyr), (pxl, pxr), (0, 0)])
    h_out = (H + pyl + pyr - ky) // sy + 1
    w_out = (W + pxl + pxr - kx) // sx + 1
    spy = (h_out - 1) * sy + 1
    spx = (w_out - 1) * sx + 1
    taps = jnp.concatenate(
        [xp[:, ty:ty + spy:sy, tx:tx + spx:sx, :]
         for ty in range(ky) for tx in range(kx)], axis=-1)
    wI = w.reshape(ky * kx * ci, co)
    return jnp.einsum("bhwk,ko->bhwo", taps, wI)


# Lowering for 2-D convs whose input or output channel count starves the
# MXU's K or N axis under XLA's native conv ('lowchan' engages conv2d_
# tapdot / conv2d_im2col below the channel threshold, 'xla' disables;
# 'out' engages only the C_out<=MAX tapdot side, 'in' only the C_in<=MAX
# im2col side — the per-direction bisection knobs).  Default is the
# measured END-TO-END winner on v5e (CONV2D_r04.json): 'out' — tapdot on
# the low-C_out flow/RGB heads wins both network forwards (netG 16.40 ->
# 14.11 ms, netR 6.80 -> 6.09 ms) and the full register graph (250.7 ->
# 283.5 bf16 pairs/s); the im2col 'in' side REGRESSES end to end (netG
# 17.70 ms, headline 87.4 pairs/s with an 870 s compile — a whole-graph
# fusion/layout poisoning, not an op-level cost), so 'lowchan' (both
# sides) loses despite each op winning its microbench in isolation.
CONV2D_ENDS = os.environ.get("DFMIR_TPU_CONV2D_ENDS", "out")
if CONV2D_ENDS not in ("xla", "lowchan", "in", "out"):
    raise ValueError(f"DFMIR_TPU_CONV2D_ENDS must be 'xla', 'lowchan', "
                     f"'in' or 'out', got {CONV2D_ENDS!r}")
LOWCHAN_MAX = 8   # engage when C_in or C_out is at/below this


def _lowchan_engaged(c_in: int, c_out: int) -> bool:
    """Does the CONV2D_ENDS mode route a (c_in -> c_out) 2-D conv through
    Conv2DLC?  'out' covers C_out<=MAX (tapdot); 'in' covers C_in<=MAX
    when tapdot does NOT apply (im2col); 'lowchan' covers both."""
    if CONV2D_ENDS == "xla":
        return False
    tap = c_out <= LOWCHAN_MAX
    col = c_in <= LOWCHAN_MAX and not tap
    if CONV2D_ENDS == "out":
        return tap
    if CONV2D_ENDS == "in":
        return col
    return tap or col


class Conv2DLC(nn.Module):
    """Drop-in nn.Conv replacement for low-channel 2-D convs.

    Param tree ({kernel, bias}), shapes, init, and dtype promotion are
    bit-identical to flax nn.Conv; only the lowering changes: C_out <=
    LOWCHAN_MAX uses conv2d_tapdot (channel contraction first, tap-planes
    shift-add), else C_in <= LOWCHAN_MAX uses conv2d_im2col.  Engaged by
    ConvND under DFMIR_TPU_CONV2D_ENDS (default 'out': tapdot side only
    — the measured end-to-end winner; see _lowchan_engaged)."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Sequence = ((0, 0), (0, 0))
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = (
        nn.initializers.lecun_normal())
    bias_init: nn.initializers.Initializer = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x):
        ky, kx = self.kernel_size
        w = self.param("kernel", self.kernel_init,
                       (ky, kx, x.shape[-1], self.features))
        b = (self.param("bias", self.bias_init, (self.features,))
             if self.use_bias else None)
        x, w, b = nn.dtypes.promote_dtype(x, w, b, dtype=None)
        if isinstance(self.padding, str):
            raise NotImplementedError(
                "Conv2DLC: string padding is not supported; pass int or "
                "(lo, hi) pairs per spatial dim")
        pads = []
        for p in self.padding:
            if isinstance(p, (tuple, list)) and len(p) == 2:
                pads.append((int(p[0]), int(p[1])))
            elif isinstance(p, int):
                pads.append((p, p))
            else:
                raise NotImplementedError(
                    f"Conv2DLC: unsupported padding entry {p!r}")
        if self.features <= LOWCHAN_MAX:
            y = conv2d_tapdot(x, w, tuple(self.strides), pads)
        else:
            y = conv2d_im2col(x, w, tuple(self.strides), pads)
        if b is not None:
            y = y + b
        return y


class Conv3DZ(nn.Module):
    """Drop-in nn.Conv replacement for 3-D convs, z-decomposed for the MXU.

    Param tree ({kernel, bias}), shapes, init, and dtype promotion are
    bit-identical to flax nn.Conv — checkpoints and the .pth converter see
    no difference; only the lowering changes (see conv3d_zdecomp).

    Supported surface is deliberately narrow (what the 3-D nets use):
    integer or (lo, hi)-pair padding only; no string padding, no
    kernel/input dilation, no feature groups — anything else raises.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1, 1)
    padding: Sequence = ((0, 0), (0, 0), (0, 0))
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = (
        nn.initializers.lecun_normal())
    bias_init: nn.initializers.Initializer = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x):
        kz, ky, kx = self.kernel_size
        w = self.param(
            "kernel", self.kernel_init,
            (kz, ky, kx, x.shape[-1], self.features))
        b = (self.param("bias", self.bias_init, (self.features,))
             if self.use_bias else None)
        x, w, b = nn.dtypes.promote_dtype(x, w, b, dtype=None)
        if isinstance(self.padding, str):
            raise NotImplementedError(
                "Conv3DZ: string padding (e.g. 'SAME') is not supported; "
                "pass int or (lo, hi) pairs per spatial dim")
        pads = []
        for p in self.padding:
            if isinstance(p, (tuple, list)):
                if len(p) != 2:
                    raise ValueError(f"Conv3DZ: bad padding entry {p!r}")
                pads.append((int(p[0]), int(p[1])))
            elif isinstance(p, int):
                pads.append((p, p))
            else:
                raise NotImplementedError(
                    f"Conv3DZ: unsupported padding entry {p!r}")
        if len(pads) != 3:
            raise ValueError("Conv3DZ: padding must cover 3 spatial dims")
        if (CONV3D_IMPL != "xla" and CONV3D_LOWCHAN == "tapdot"
                and self.features <= LOWCHAN_MAX):
            # low-C_out heads (the VxmDense/TransFusion flow convs) are
            # N-lane starved under every conv lowering; contraction-first
            # tapdot instead (see conv3d_tapdot / conv2d_tapdot)
            y = conv3d_tapdot(x, w, tuple(self.strides), pads)
        elif CONV3D_IMPL == "xla":
            y = _conv3d_xla(x, w, tuple(self.strides), pads)
        elif CONV3D_IMPL == "hybrid":
            y = conv3d_hybrid(x, w, tuple(self.strides), tuple(pads))
        else:
            y = conv3d_zdecomp(x, w, tuple(self.strides), pads)
        if b is not None:
            y = y + b
        return y


class Conv2DS9(nn.Module):
    """Drop-in nn.Conv replacement for 2-D convs, shift-concat lowered.

    Param tree ({kernel, bias}), shapes, init, and dtype promotion are
    bit-identical to flax nn.Conv; only the lowering changes (see
    conv2d_shift9).  Engaged via DFMIR_TPU_CONV2D=shift9."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Sequence = ((0, 0), (0, 0))
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = (
        nn.initializers.lecun_normal())
    bias_init: nn.initializers.Initializer = nn.initializers.zeros_init()

    @nn.compact
    def __call__(self, x):
        ky, kx = self.kernel_size
        w = self.param("kernel", self.kernel_init,
                       (ky, kx, x.shape[-1], self.features))
        b = (self.param("bias", self.bias_init, (self.features,))
             if self.use_bias else None)
        x, w, b = nn.dtypes.promote_dtype(x, w, b, dtype=None)
        pads = []
        for p in self.padding:
            if isinstance(p, (tuple, list)) and len(p) == 2:
                pads.append((int(p[0]), int(p[1])))
            elif isinstance(p, int):
                pads.append((p, p))
            else:
                raise NotImplementedError(
                    f"Conv2DS9: unsupported padding entry {p!r}")
        y = conv2d_shift9(x, w, tuple(self.strides), pads)
        if b is not None:
            y = y + b
        return y


class ConvND(nn.Module):
    """Conv over (B, *spatial, C) with torch-style integer padding.

    kernel init per ``init_type`` (reference init_weights), bias zeros unless
    ``torch_default`` (then torch's U(+-1/sqrt(fan_in)) bias).  The 3-D case
    lowers through Conv3DZ (z-decomposed conv2d — XLA's conv3d leaves >10x
    MXU throughput on the table at UNet shapes); param paths stay
    ``.../Conv_0/{kernel,bias}`` either way.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    init_type: str = "xavier"
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2
        kernel_init = get_initializer(self.init_type, self.init_gain)
        if self.init_type == "torch_default":
            from dfmir_tpu.nets.inits import torch_default_bias_init
            fan_in = x.shape[-1] * self.kernel ** nd
            bias_init = torch_default_bias_init(fan_in)
        else:
            bias_init = nn.initializers.zeros_init()
        if nd == 3:
            return Conv3DZ(
                features=self.features,
                kernel_size=(self.kernel,) * 3,
                strides=(self.stride,) * 3,
                padding=[(self.padding, self.padding)] * 3,
                use_bias=self.use_bias,
                kernel_init=kernel_init,
                bias_init=bias_init,
                name="Conv_0",
            )(x)
        if nd == 2 and CONV2D_IMPL == "shift9":
            return Conv2DS9(
                features=self.features,
                kernel_size=(self.kernel,) * 2,
                strides=(self.stride,) * 2,
                padding=[(self.padding, self.padding)] * 2,
                use_bias=self.use_bias,
                kernel_init=kernel_init,
                bias_init=bias_init,
                name="Conv_0",
            )(x)
        if nd == 2 and _lowchan_engaged(x.shape[-1], self.features):
            return Conv2DLC(
                features=self.features,
                kernel_size=(self.kernel,) * 2,
                strides=(self.stride,) * 2,
                padding=[(self.padding, self.padding)] * 2,
                use_bias=self.use_bias,
                kernel_init=kernel_init,
                bias_init=bias_init,
                name="Conv_0",
            )(x)
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel,) * nd,
            strides=(self.stride,) * nd,
            padding=[(self.padding, self.padding)] * nd,
            use_bias=self.use_bias,
            kernel_init=kernel_init,
            bias_init=bias_init,
        )(x)


class ConvTransposeTorch(nn.Module):
    """torch nn.ConvTranspose2d/3d semantics on NHWC/NDHWC.

    output = (i - 1)*stride - 2*padding + kernel + output_padding.
    Implemented as an lhs-dilated conv with spatially flipped kernel.
    """

    features: int
    kernel: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1
    use_bias: bool = True
    init_type: str = "xavier"
    init_gain: float = 0.02

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2
        C = x.shape[-1]
        kernel_init = get_initializer(self.init_type, self.init_gain)
        w = self.param(
            "kernel", kernel_init, (self.kernel,) * nd + (C, self.features)
        )
        # flip spatial axes: conv_transpose applies the kernel unflipped,
        # which equals a regular (correlation) conv with flipped taps.
        w = jnp.flip(w, axis=tuple(range(nd)))
        lo = self.kernel - 1 - self.padding
        hi = lo + self.output_padding
        dn = {1: ("NHC", "HIO", "NHC"),
              2: ("NHWC", "HWIO", "NHWC"),
              3: ("NDHWC", "DHWIO", "NDHWC")}[nd]
        out = jax.lax.conv_general_dilated(
            x, w, window_strides=(1,) * nd, padding=[(lo, hi)] * nd,
            lhs_dilation=(self.stride,) * nd, dimension_numbers=dn,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros_init(), (self.features,))
            out = out + b
        return out
