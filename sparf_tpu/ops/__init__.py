"""Pallas TPU kernels for the rendering hot path.

Importing this package registers the 'pallas' forward implementation with the
renderer (sparf_tpu.models.renderer.register_forward_impl).
"""
from sparf_tpu.ops import fused_mlp  # noqa: F401
from sparf_tpu.ops import fused_mlp_vjp  # noqa: F401
