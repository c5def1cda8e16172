from transformer_explainability_tpu.ops import relprop  # noqa: F401
