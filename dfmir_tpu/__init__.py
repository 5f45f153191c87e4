"""dfmir_tpu — TPU-native unsupervised multi-modal medical image registration.

A from-scratch JAX / Flax / Optax / Pallas framework with the capabilities of
the DFMIR reference (discriminator-free image-to-image translation + VoxelMorph
dense deformable registration), redesigned TPU-first:

- all compute runs inside jitted functions (no host round-trips in the step),
- tensors are laid out NHWC / NDHWC (TPU conv-friendly),
- dense-flow warping is a fused grid-sample with align_corners=True semantics,
- parallelism is expressed via ``jax.sharding.Mesh`` + NamedSharding (data
  parallel by default; spatial sharding for large 3-D volumes).

Tensor conventions
------------------
Images:  ``(B, H, W, C)`` for 2-D, ``(B, D, H, W, C)`` for 3-D, float32 in
[-1, 1] (dataset normalization ``(x - 0.5) / 0.5``).
Flows:   ``(B, *spatial, ndims)`` displacement fields in *pixel* units, with
channel order matching spatial axis order (``flow[..., 0]`` displaces axis 0).
This mirrors the reference's VoxelMorph convention
(/root/reference/models/voxelmorph/torchvoxelmorph/layers.py:30-48) where the
grid+flow is built per-axis and the channel order is reversed before
``grid_sample`` precisely so that channel 0 = first spatial axis.
"""

__version__ = "0.1.0"
