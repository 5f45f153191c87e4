"""Image-similarity losses: windowed NCC, masked L1, MSE, NMI, Dice.

- ``ncc_loss``: the reference NCC_Loss (/root/reference/util/losses.py:132-261):
  local sums via a windowed (mean or gaussian) depthwise conv, Eugenio's
  squared-cross formulation ``cc = cross^2 / (I_var * J_var + eps)``, and a
  masked ``-sqrt(mean)`` reduction.
- ``masked_l1``: reference calculate_L1_loss
  (/root/reference/models/registration_model.py:255-263): sum(|a-b| * mask) /
  sum(mask), plain mean when mask is None.
- ``nmi_loss``: Parzen-window (Gaussian bins) global mutual information,
  semantics of the reference NMI_Loss (util/losses.py:263-348).
- ``dice_loss`` (util/losses.py:350-397), ``mse_loss``.

All functions take NHWC / NDHWC tensors and run under jit.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _window_kernel(kernel_type: str, kernel_var, nd: int):
    if kernel_type == "mean":
        k = np.ones(tuple(kernel_var), np.float32)
    elif kernel_type == "gaussian":
        sigma = kernel_var[0]
        size = sigma * 3
        size += (size + 1) % 2
        coords = np.arange(size) - (size - 1) / 2.0
        grids = np.meshgrid(*([coords] * nd), indexing="ij")
        sq = sum(g ** 2 for g in grids)
        k = (1.0 / (np.sqrt(2 * np.pi) * sigma)) * np.exp(-sq / (2 * sigma ** 2))
        k = k.astype(np.float32)
    else:
        raise NotImplementedError(f"kernel {kernel_type} not implemented")
    return k


def _local_sums(I, J, filt_np):
    """Windowed sums of I, J, I^2, J^2, IJ via one batched depthwise conv."""
    nd = I.ndim - 2
    pad = filt_np.shape[-1] // 2
    stack = jnp.concatenate([I, J, I * I, J * J, I * J], axis=-1)
    C = stack.shape[-1]
    rhs = jnp.asarray(filt_np, I.dtype).reshape(filt_np.shape + (1, 1))
    rhs = jnp.tile(rhs, (1,) * nd + (1, C))
    dn = {1: ("NHC", "HIO", "NHC"),
          2: ("NHWC", "HWIO", "NHWC"),
          3: ("NDHWC", "DHWIO", "NDHWC")}[nd]
    out = jax.lax.conv_general_dilated(
        stack, rhs, window_strides=(1,) * nd, padding=[(pad, pad)] * nd,
        dimension_numbers=dn, feature_group_count=C)
    c = I.shape[-1]
    return (out[..., :c], out[..., c:2 * c], out[..., 2 * c:3 * c],
            out[..., 3 * c:4 * c], out[..., 4 * c:])


def _local_sums_integral(I, J, win):
    """Windowed (zero-padded 'same') box sums via summed-area tables: one
    cumsum per axis + shifted differences — O(1) work per voxel instead of
    O(prod(win)), the decisive formulation for 3-D windows (9^3 = 729 taps).

    Accuracy note: the differencing subtracts large running sums in f32;
    relative error stays ~1e-6 for O(1)-valued images at 160^3.
    """
    nd = I.ndim - 2
    stack = jnp.concatenate([I, J, I * I, J * J, I * J], axis=-1)
    stack = stack.astype(jnp.float32)
    for axis, k in zip(range(1, 1 + nd), win):
        pad_lo = k // 2 + 1          # one extra leading zero for S[i-1]
        pad_hi = k - 1 - k // 2
        widths = [(0, 0)] * stack.ndim
        widths[axis] = (pad_lo, pad_hi)
        s = jnp.cumsum(jnp.pad(stack, widths), axis=axis)
        n = I.shape[axis]
        hi = jax.lax.slice_in_dim(s, k, k + n, axis=axis)
        lo = jax.lax.slice_in_dim(s, 0, n, axis=axis)
        stack = hi - lo
    c = I.shape[-1]
    return (stack[..., :c], stack[..., c:2 * c], stack[..., 2 * c:3 * c],
            stack[..., 3 * c:4 * c], stack[..., 4 * c:])


def ncc_map(prediction, target, kernel_var=None, kernel_type="mean",
            eps: float = 1e-5, method: str = "auto"):
    """Pointwise windowed-NCC map cc = cross^2 / (I_var * J_var + eps).

    method: 'conv' (depthwise window conv), 'integral' (summed-area tables,
    mean kernel only), or 'auto' (integral whenever the kernel is mean)."""
    nd = prediction.ndim - 2
    if kernel_var is None:
        kernel_var = [3] * nd if kernel_type == "gaussian" else [9] * nd
    if method == "auto":
        # even windows keep the conv path: torch's pad=k//2 'same' conv
        # yields n+1 outputs there and we preserve that reference behavior
        method = ("integral" if kernel_type == "mean"
                  and all(k % 2 == 1 for k in kernel_var) else "conv")
    if method == "integral":
        if kernel_type != "mean":
            raise ValueError("integral method requires a mean kernel")
        sums = _local_sums_integral(prediction, target, kernel_var)
        I_sum, J_sum, I2_sum, J2_sum, IJ_sum = sums
        win_size = float(np.prod(kernel_var))
        u_I = I_sum / win_size
        u_J = J_sum / win_size
        cross = (IJ_sum - u_J * I_sum - u_I * J_sum
                 + u_I * u_J * win_size)
        I_var = I2_sum - 2 * u_I * I_sum + u_I * u_I * win_size
        J_var = J2_sum - 2 * u_J * J_sum + u_J * u_J * win_size
        return cross * cross / (I_var * J_var + eps)
    filt = _window_kernel(kernel_type, kernel_var, nd)
    I_sum, J_sum, I2_sum, J2_sum, IJ_sum = _local_sums(prediction, target, filt)
    win_size = float(filt.sum())
    u_I = I_sum / win_size
    u_J = J_sum / win_size
    cross = IJ_sum - u_J * I_sum - u_I * J_sum + u_I * u_J * win_size
    I_var = I2_sum - 2 * u_I * I_sum + u_I * u_I * win_size
    J_var = J2_sum - 2 * u_J * J_sum + u_J * u_J * win_size
    return cross * cross / (I_var * J_var + eps)


def ncc_loss(prediction, target, mask=None, kernel_var=None,
             kernel_type="mean", eps: float = 1e-5, method: str = "auto"):
    cc = ncc_map(prediction, target, kernel_var, kernel_type, eps, method)
    if mask is None:
        return -1.0 * jnp.sqrt(jnp.mean(cc))
    mask = mask.astype(cc.dtype)
    denom = jnp.sum(mask)
    val = -1.0 * jnp.sqrt(jnp.sum(cc * mask) / jnp.maximum(denom, 1.0))
    return jnp.where(denom == 0, jnp.zeros((), cc.dtype), val)


def masked_l1(src, tgt, mask=None):
    diff = jnp.abs(src - tgt)
    if mask is None:
        return jnp.mean(diff)
    mask = mask.astype(diff.dtype)
    denom = jnp.sum(mask)
    val = jnp.sum(diff * mask) / jnp.maximum(denom, 1.0)
    return jnp.where(denom == 0, jnp.zeros((), diff.dtype), val)


def mse_loss(prediction, target):
    return jnp.mean(jnp.square(prediction - target))


def masked_l2(src, tgt, mask=None):
    """Masked MSE with sum(res*mask)/sum(mask) reduction (reference L2_Loss
    via the masked SSIM wrapper, util/losses.py:19-60)."""
    diff = jnp.square(src - tgt)
    if mask is None:
        return jnp.mean(diff)
    mask = mask.astype(diff.dtype)
    denom = jnp.sum(mask)
    val = jnp.sum(diff * mask) / jnp.maximum(denom, 1.0)
    return jnp.where(denom == 0, jnp.zeros((), diff.dtype), val)


def tukey_biweight(prediction, target, c: float = 0.8, mask=None):
    """Tukey biweight robust loss, clamped to its saturation value c^2/6
    (reference TukeyBiweight, util/losses.py:64-79)."""
    error = prediction - target
    max_loss = c ** 2 / 6.0
    loss = max_loss * (1.0 - (1.0 - jnp.square(error / c)) ** 3)
    loss = jnp.clip(loss, 0.0, max_loss)
    if mask is None:
        return jnp.mean(loss)
    mask = mask.astype(loss.dtype)
    denom = jnp.sum(mask)
    val = jnp.sum(loss * mask) / jnp.maximum(denom, 1.0)
    return jnp.where(denom == 0, jnp.zeros((), loss.dtype), val)


def cross_entropy_loss(logits, target_onehot, mask=None):
    """Softmax cross entropy over a channels-last class axis (reference
    CrossEntropy, util/losses.py:400-430)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.sum(target_onehot * logp, axis=-1)
    if mask is None:
        return jnp.mean(ce)
    mask = jnp.squeeze(mask, axis=-1) if mask.ndim == ce.ndim + 1 else mask
    mask = mask.astype(ce.dtype)
    denom = jnp.sum(mask)
    val = jnp.sum(ce * mask) / jnp.maximum(denom, 1.0)
    return jnp.where(denom == 0, jnp.zeros((), ce.dtype), val)


def nll_loss(log_probs, target_onehot, mask=None):
    """Negative log likelihood given channels-last log-probabilities
    (reference NLL, util/losses.py:433-455)."""
    ce = -jnp.sum(target_onehot * log_probs, axis=-1)
    if mask is None:
        return jnp.mean(ce)
    mask = jnp.squeeze(mask, axis=-1) if mask.ndim == ce.ndim + 1 else mask
    mask = mask.astype(ce.dtype)
    denom = jnp.sum(mask)
    val = jnp.sum(ce * mask) / jnp.maximum(denom, 1.0)
    return jnp.where(denom == 0, jnp.zeros((), ce.dtype), val)


def dice_loss(prediction, target, eps: float = 1e-5):
    """Soft Dice over spatial dims; returns 1 - mean Dice."""
    axes = tuple(range(1, prediction.ndim - 1))
    inter = jnp.sum(prediction * target, axis=axes)
    denom = jnp.sum(prediction, axis=axes) + jnp.sum(target, axis=axes)
    dice = (2.0 * inter + eps) / (denom + eps)
    return 1.0 - jnp.mean(dice)


def nmi_loss(prediction, target, num_bins: int = 32, vmin: float = -1.0,
             vmax: float = 1.0, sigma_ratio: float = 0.5):
    """Negative global mutual information via Parzen windowing."""
    centers = jnp.linspace(vmin, vmax, num_bins)
    sigma = (centers[1] - centers[0]) * sigma_ratio
    preterm = 1.0 / (2 * sigma ** 2)

    def soft_bin(x):
        x = x.reshape(x.shape[0], -1, 1)
        w = jnp.exp(-preterm * jnp.square(x - centers.reshape(1, 1, -1)))
        return w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-10)

    pa = soft_bin(prediction)  # (B, N, bins)
    pb = soft_bin(target)
    n = pa.shape[1]
    pab = jnp.einsum("bni,bnj->bij", pa, pb) / n
    pa_m = jnp.mean(pa, axis=1)
    pb_m = jnp.mean(pb, axis=1)
    papb = pa_m[:, :, None] * pb_m[:, None, :]
    mi = jnp.sum(pab * jnp.log((pab + 1e-10) / (papb + 1e-10)), axis=(1, 2))
    return -jnp.mean(mi)
