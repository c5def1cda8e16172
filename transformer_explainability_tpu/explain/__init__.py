from transformer_explainability_tpu.explain.generator import (  # noqa: F401
    METHODS, Explainer, make_explain_fn,
)
