from transformer_explainability_tpu.params import convert  # noqa: F401
