"""sparf_tpu: a TPU-native JAX/Pallas framework for joint pose-NeRF optimization.

Re-implements the capabilities of google-research/sparf (SPARF: Neural Radiance
Fields from Sparse and Noisy Poses, CVPR 2023) as a TPU-first framework:

- functional JAX core (pure pytrees, one jitted train step),
- Pallas TPU kernels for the fused PE->MLP->compositing hot path,
- SPMD ray-sharding over a `jax.sharding.Mesh` for multi-chip scale-out,
- orbax checkpointing, optax optimizers.

Layer map (mirrors SURVEY.md section 1):
  L1 foundations:  sparf_tpu.utils (camera/Lie/geometry/alignment), sparf_tpu.datasets
  L2 models:       sparf_tpu.models (embedder, nerf_mlp, renderer, pose_params, flow_net)
  L3 engine:       sparf_tpu.training (losses, sampling, metrics, engine, checkpointing)
  L4 trainers:     sparf_tpu.training.trainers
  L5 config:       sparf_tpu.configs
  L6 CLI:          run_trainval.py / eval.py at the repo root
"""

__version__ = "0.1.0"
