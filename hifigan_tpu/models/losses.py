"""GAN losses for the vocoder (parity with reference src/models.py:251-282).

All are pure functions over lists/pytrees of arrays, returning float32
scalars; jit/pjit/grad compose directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def feature_loss(fmap_r, fmap_g) -> jax.Array:
    """L1 feature-matching over all layers of all sub-discriminators, x2
    (reference src/models.py:251-257). Real feature maps are treated as
    constants (torch computes them under the generator loss with D frozen;
    stop_gradient makes that explicit here)."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            rl = jax.lax.stop_gradient(rl)
            loss += jnp.mean(jnp.abs(rl.astype(jnp.float32) - gl.astype(jnp.float32)))
    return loss * 2


def discriminator_loss(
    disc_real_outputs, disc_generated_outputs
) -> tuple[jax.Array, list[jax.Array], list[jax.Array]]:
    """LSGAN discriminator loss (1-D(y))^2 + D(G(z))^2 (ref src/models.py:260-271)."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real_outputs, disc_generated_outputs):
        r_loss = jnp.mean(jnp.square(1.0 - dr.astype(jnp.float32)))
        g_loss = jnp.mean(jnp.square(dg.astype(jnp.float32)))
        loss += r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs) -> tuple[jax.Array, list[jax.Array]]:
    """LSGAN generator loss (1-D(G(z)))^2 (ref src/models.py:274-282)."""
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean(jnp.square(1.0 - dg.astype(jnp.float32)))
        gen_losses.append(l)
        loss += l
    return loss, gen_losses


def mel_l1_loss(mel_real: jax.Array, mel_gen: jax.Array) -> jax.Array:
    """L1 mel reconstruction term (weight 45 in the HiFi-GAN recipe)."""
    return jnp.mean(jnp.abs(mel_real - mel_gen))
