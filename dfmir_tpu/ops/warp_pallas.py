"""Fused Pallas TPU kernel for the 2-D bilinear dense-flow warp.

Placeholder module: ``AVAILABLE`` gates dispatch from ``dfmir_tpu.ops.warp``.
The pure-XLA gather path is used until the fused kernel lands.
"""

from __future__ import annotations

AVAILABLE = False


def warp_pallas(src, flow, mode="bilinear"):
    from dfmir_tpu.ops.warp import warp

    return warp(src, flow, mode=mode, impl="xla")
