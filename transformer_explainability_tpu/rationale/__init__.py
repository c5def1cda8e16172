"""ERASER rationale-benchmark stack (data, metrics, pipeline, rendering).

TPU-native counterpart of the reference's ``BERT_rationale_benchmark/``
package: jsonl annotation loading (``utils.py``), the full scorer
(``metrics.py``), and the end-to-end fine-tune + explain + hard-rationale
pipeline (``models/pipeline/bert_pipeline.py``).
"""

from transformer_explainability_tpu.rationale.data import (  # noqa: F401
    Annotation, Evidence, annotations_from_jsonl, annotations_to_jsonl,
    load_datasets, load_documents, load_flattened_documents, load_jsonl,
    write_jsonl)
