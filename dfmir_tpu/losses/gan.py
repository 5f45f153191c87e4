"""GAN objectives (lsgan / vanilla / wgangp / nonsaturating).

Mirrors the reference GANLoss (/root/reference/models/networks.py:381-453).
The paper model instantiates this with weight 0 (discriminator-free); it is
provided for the full --lambda_GAN surface and the discriminator zoo.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gan_loss(prediction, target_is_real: bool, gan_mode: str = "lsgan",
             target_real_label: float = 1.0, target_fake_label: float = 0.0):
    if gan_mode in ("lsgan", "vanilla"):
        target = target_real_label if target_is_real else target_fake_label
        target = jnp.full_like(prediction, target)
        if gan_mode == "lsgan":
            return jnp.mean(jnp.square(prediction - target))
        # BCEWithLogits
        return jnp.mean(
            jnp.maximum(prediction, 0) - prediction * target
            + jnp.log1p(jnp.exp(-jnp.abs(prediction)))
        )
    if gan_mode == "wgangp":
        return -jnp.mean(prediction) if target_is_real else jnp.mean(prediction)
    if gan_mode == "nonsaturating":
        bs = prediction.shape[0]
        x = -prediction if target_is_real else prediction
        return jnp.mean(jax.nn.softplus(x).reshape(bs, -1), axis=1)
    raise NotImplementedError(f"gan mode {gan_mode} not implemented")


def gradient_penalty(disc_fn, real, fake, key, kind: str = "mixed",
                     constant: float = 1.0, lambda_gp: float = 10.0):
    """WGAN-GP penalty (reference networks.py:456-490)."""
    if lambda_gp <= 0.0:
        return 0.0
    if kind == "real":
        x = real
    elif kind == "fake":
        x = fake
    elif kind == "mixed":
        alpha = jax.random.uniform(key, (real.shape[0],) + (1,) * (real.ndim - 1))
        x = alpha * real + (1 - alpha) * fake
    else:
        raise NotImplementedError(kind)

    def scalar_out(xi):
        return jnp.sum(disc_fn(xi[None]))

    grads = jax.vmap(jax.grad(scalar_out))(x)
    grads = grads.reshape(real.shape[0], -1)
    norm = jnp.linalg.norm(grads + 1e-16, axis=1)
    return jnp.mean(jnp.square(norm - constant)) * lambda_gp
