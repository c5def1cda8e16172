from transformer_explainability_tpu.models import vit  # noqa: F401
