from transformer_explainability_tpu.eval import seg, visualize, perturbation  # noqa: F401
