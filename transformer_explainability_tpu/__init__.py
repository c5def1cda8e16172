"""TPU-native transformer explainability framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
hila-chefer/Transformer-Explainability (CVPR 2021, "Transformer Interpretability
Beyond Attention Visualization"): class-conditional relevance heatmaps for
Transformer classifiers via layer-wise relevance propagation (LRP) combined with
gradient-weighted attention aggregation and rollout.

Design (vs. the PyTorch reference):
  * The reference's stateful module hooks + ``torch.autograd.grad`` reverse walk
    (reference ``modules/layers_ours.py:16-46``) become *pure functions*:
    ``forward_collect`` returns residuals explicitly, and each LRP rule is a
    closed-form function in :mod:`transformer_explainability_tpu.ops.relprop`.
  * ``explain()`` is ONE jitted program: forward (+residual collection),
    attention-gradient VJP (replacing ``one_hot.backward`` + hooks), reverse
    ``lax.scan`` relprop over stacked blocks, and the method post-processing.
  * Batch via ``vmap``; multi-chip via ``jax.sharding.Mesh`` + NamedSharding
    over a ``data`` axis (the workload is embarrassingly parallel per image).
"""

__version__ = "0.1.0"

from transformer_explainability_tpu.ops import relprop  # noqa: F401
