"""Pallas status for the dense-flow warp (and why the XLA path is the
shipped kernel).

A fused grid-sample needs per-pixel dynamic gathers (4 corners in 2-D, 8 in
3-D at data-dependent coordinates).  On this toolchain Mosaic cannot lower
in-kernel dynamic gathers: ``jnp.take_along_axis`` inside a pallas kernel
fails to compile on both the sublane and lane axes (verified on TPU v5e —
trivial VMEM kernels compile and run fine, gather kernels are rejected by
the Mosaic compiler).  The gather-free alternatives are all worse than XLA's
native lowering:

- one-hot matmul sampling costs O(H*W) MACs per output pixel — more FLOPs
  than the surrounding convolutions at 256^2;
- dynamic-slice loops serialize over rows and still need a lane gather for
  the x coordinate;
- roll-based shifting only handles spatially-uniform integer displacement.

The XLA implementation in ``dfmir_tpu.ops.warp`` is therefore the TPU-native
design: corner indices are linearized so each corner is ONE gather over a
flattened (B, H*W, C) view (4 gathers total in 2-D), all index/weight math
fuses into the gather's producer, and coordinates stay in f32 under the
bf16 compute path (bf16's 8-bit mantissa cannot address 256 pixels to
sub-pixel precision).  ``AVAILABLE`` stays False so ``warp(impl='auto')``
dispatches to XLA; re-evaluate if Mosaic gains gather support.

Also measured and rejected (v5e): fetching all interpolation corners with
ONE ``lax.gather`` of 2x2 (2x2x2) slices per output point — XLA lowers the
per-point small slices serially, collapsing the 256^2 inference benchmark
from ~172 to ~6 pairs/s, and the 160^3 trilinear variant faults the TPU
worker.  The linearized per-corner take_along_axis formulation is the
fastest lowering available on this stack.
"""

from __future__ import annotations

AVAILABLE = False


def warp_pallas(src, flow, mode="bilinear"):
    from dfmir_tpu.ops.warp import warp

    return warp(src, flow, mode=mode, impl="xla")
