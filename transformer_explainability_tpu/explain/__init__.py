from transformer_explainability_tpu.explain.generator import (  # noqa: F401
    METHODS, Explainer, make_explain_fn, make_guarded_explain_fn,
    PRECISION_PRESETS, precision_kwargs, preprocess_uint8,
)
from transformer_explainability_tpu.explain.bert_generator import (  # noqa: F401,E501
    BertExplainer, make_guarded_bert_explain_fn,
)
