from transformer_explainability_tpu.utils import metrics, render, saver, iou  # noqa: F401
