"""cvnets_tpu: a TPU-native computer-vision training framework.

A from-scratch JAX/Flax/XLA/Pallas rebuild of the capabilities of apple/ml-cvnets
(surveyed in SURVEY.md): registry-driven, YAML-configured training/eval for
classification, detection, segmentation, multimodal (CLIP) and byte/audio models,
running as a single program under GSPMD data parallelism over a `jax.sharding.Mesh`
instead of DDP processes over NCCL.
"""

__version__ = "0.1.0"
