"""Mean-squared-error loss (spi/criteria/l2_loss.py:3-8)."""

import jax.numpy as jnp


def l2_loss(a, b):
    return jnp.mean(jnp.square(a - b))
