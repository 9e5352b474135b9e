"""Frequency positional encoding + BARF coarse-to-fine masking (pure JAX).

Parity with reference source/models/frequency_nerf.py:42-69 (FrequencyEmbedder)
and :229-258 (c2f masking). Encoding layout per input channel c:
``[sin(f_0 x_c)..sin(f_{L-1} x_c), cos(f_0 x_c)..cos(f_{L-1} x_c)]`` flattened
channel-major, so a (L,)-weight applied to ``enc.reshape(-1, L)`` masks
frequency k everywhere — exactly the reference's view(-1,L) trick.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


def frequency_bands(L: int, include_pi: bool = True, log_sampling: bool = True) -> Array:
    if log_sampling:
        freq = 2.0 ** jnp.arange(L, dtype=jnp.float32)
        if include_pi:
            freq = freq * math.pi
    else:
        freq = jnp.linspace(2.0**0.0, 2.0 ** (L - 1), L, dtype=jnp.float32) * math.pi
    return freq


def positional_encoding(
    x: Array, L: int, include_pi: bool = True, log_sampling: bool = True
) -> Array:
    """(..., C) -> (..., C*2*L)."""
    freq = frequency_bands(L, include_pi, log_sampling)
    spectrum = x[..., None] * freq            # (..., C, L)
    sin, cos = jnp.sin(spectrum), jnp.cos(spectrum)
    enc = jnp.stack([sin, cos], axis=-2)      # (..., C, 2, L)
    return enc.reshape(*x.shape[:-1], -1)     # (..., C*2*L)


def c2f_weights(progress: Array, L: int, c2f: Optional[Sequence[float]]) -> Optional[Array]:
    """BARF frequency weights: w_k = (1-cos(clamp(alpha-k,0,1) pi))/2.

    progress is a traced scalar in [0,1] (reference keeps it as a checkpointed
    buffer-parameter, frequency_nerf.py:79-85; here it lives in TrainState).
    """
    if c2f is None:
        return None
    start, end = c2f
    alpha = (progress - start) / (end - start) * L
    k = jnp.arange(L, dtype=jnp.float32)
    return (1 - jnp.cos(jnp.clip(alpha - k, 0.0, 1.0) * math.pi)) / 2


def apply_c2f_mask(enc: Array, weight: Optional[Array]) -> Array:
    """Apply per-frequency weights; weight has shape (L,)."""
    if weight is None:
        return enc
    L = weight.shape[0]
    shape = enc.shape
    return (enc.reshape(-1, L) * weight).reshape(shape)
