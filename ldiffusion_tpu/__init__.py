"""ldiffusion_tpu — a TPU-native JAX framework for Laplace-diffusion pathology segmentation.

A ground-up rebuild of the capabilities of L-Diffusion (ICML 2025, reference:
``ldiffusion.py``/``segmentor.py`` of Lweihan/LDiffusion) as an idiomatic
JAX/XLA/Pallas framework:

* Stable-Diffusion v1.5 VAE + UNet2DCondition + CLIP text encoder in flax,
  NHWC layout, bf16-friendly, loadable from an SD checkpoint directory.
* Laplace (not Gaussian) forward noising and the trajectory-feature training
  loop as a single ``lax.scan`` under ``jit``.
* FSDP/DP sharding via ``jax.sharding`` meshes (replacing DeepSpeed ZeRO-3).
* nnUNet-style auto-planned segmentor: fingerprint → plan → preprocess →
  patch-sampled training → sliding-window gaussian-blended prediction
  (replacing the vendored nnUNetv2 fork).
* Cell path: instance proposer + patch classifier (replacing cellpose+ResNet).

Public API mirrors the reference: ``LDiffusionModel(diffusion_path, level)``
with ``.train(...)`` / ``.inference(...)`` (reference ``ldiffusion.py:31-324``).
"""

__version__ = "0.1.0"

from ldiffusion_tpu.api import LDiffusionModel  # noqa: F401
