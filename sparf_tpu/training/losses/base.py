"""Loss primitives + weighted combination (reference base_losses.py:26-238).

All functions are pure and jit-safe; "loss inactive before iteration X" is
masked arithmetic (multiply by a 0/1 gate) rather than a python branch, so the
whole training step stays one XLA program.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def l1_loss(pred: Array, label: Array) -> Array:
    return jnp.mean(jnp.abs(pred - label))


def mse_loss(pred: Array, label: Array) -> Array:
    d = (pred - label) ** 2
    return jnp.sum(d) / (d.size + 1e-6)


def huber(diff: Array, delta: float) -> Array:
    """Elementwise huber: 0.5 x^2 if |x|<delta else delta(|x|-0.5 delta)."""
    abs_d = jnp.abs(diff)
    return jnp.where(abs_d < delta, 0.5 * diff**2, delta * (abs_d - 0.5 * delta))


def huber_loss(pred: Array, label: Array, delta: float = 0.5) -> Array:
    """Reference photometric huber: torch delta=0.5, scaled x2 (base_losses.py:155-156)."""
    return jnp.mean(huber(pred - label, delta)) * 2.0


def compute_diff_loss(
    loss_type: str,
    diff: Array,
    weights: Optional[Array] = None,
    mask: Optional[Array] = None,
    dim: int = -1,
) -> Array:
    """Generic masked/weighted reduction (base_losses.py:198-226).

    huber here uses delta=1 (reference compute_diff_loss), unlike the
    photometric huber above.
    """
    lt = loss_type.lower()
    if lt == "epe":
        loss = jnp.linalg.norm(diff, axis=dim, keepdims=True)
    elif lt == "l1":
        loss = jnp.abs(diff)
    elif lt == "mse":
        loss = diff**2
    elif lt == "huber":
        loss = huber(diff, delta=1.0)
    else:
        raise ValueError(f"wrong loss type: {loss_type}")

    if weights is not None:
        assert weights.ndim == loss.ndim
        loss = loss * weights
    if mask is not None:
        assert mask.ndim == loss.ndim
        loss = loss * mask.astype(loss.dtype)
        return jnp.sum(loss) / (jnp.sum(mask.astype(loss.dtype)) + 1e-6)
    return jnp.sum(loss) / (loss.size + 1e-6)


def summarize_loss_w_predefined_weights(
    loss_dict: Dict[str, Array], loss_weight: Dict, parametrization: str = "exp"
) -> Dict[str, Array]:
    """total = sum 10^w_k * loss_k (base_losses.py:113-135)."""
    loss_all = jnp.asarray(0.0)
    updated = {}
    for key, value in loss_dict.items():
        w_cfg = loss_weight.get(key)
        if w_cfg is None:
            continue
        w = 10.0 ** float(w_cfg) if parametrization == "exp" else float(w_cfg)
        weighted = w * value
        loss_all = loss_all + weighted
        updated[key + "_after_w"] = weighted
    out = dict(loss_dict)
    out["all"] = loss_all
    out.update(updated)
    return out


def summarize_loss_w_equal_weights(loss_dict: Dict[str, Array], loss_weight: Dict) -> Dict[str, Array]:
    """Scale every loss to the render loss's magnitude (base_losses.py:84-111)."""
    assert "render" in loss_dict
    render_loss = jax.lax.stop_gradient(loss_dict["render"])
    loss_all = jnp.asarray(0.0)
    updated = {}
    for key, value in loss_dict.items():
        if loss_weight.get(key) is None:
            continue
        w = jnp.where(value != 0.0, render_loss / (jax.lax.stop_gradient(value) + 1e-6), 1.0)
        weighted = w * value
        loss_all = loss_all + weighted
        updated[key + "_after_w"] = weighted
    out = dict(loss_dict)
    out["all"] = loss_all
    out.update(updated)
    return out


def iteration_gate(iteration: Array, start_iter: float) -> Array:
    """1.0 once iteration >= start_iter else 0.0 (traced; replaces python branches)."""
    return (iteration >= start_iter).astype(jnp.float32)
