"""Generate the committed BERT demo golden artifacts (VERDICT r4 missing
#1 — the one user-facing surface with no golden: the captum-style
colored-text rendering of per-token relevance the reference ships in
``BERT_explainability.ipynb`` cell 6).

Mirrors that cell end-to-end at FULL scale (bert-base 12L/768, seed-0
random weights — zero egress, so "golden" pins the implementation on the
golden input), f64 on CPU:

  sentence -> local wordpiece vocab -> transformer_attribution
  (start_layer=0, predicted class) -> min-max normalize -> sign-flip when
  the predicted class is NEGATIVE -> render_text_heatmap_html.

Writes (committed, regression-compared by tests/test_golden.py):
  tests/golden/bert_demo_vocab.txt    the tokenizer vocab (reproducibility)
  tests/golden/bert_demo_scores_f64.npy  signed per-token scores (S,) f64
  tests/golden/bert_demo_meta.json    tokens, pred class/prob, labels
  tests/golden/bert_demo.html         the rendered colored-text record

Run on CPU in its own process (x64 flips global dtypes):
    python experiments/make_bert_golden.py
"""
import json
import os as _os
import sys as _sys

REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, REPO)

import numpy as np

GOLDEN_DIR = _os.path.join(REPO, "tests", "golden")

# the reference notebook's positive-sentiment example (cell 6)
SENTENCE = ("This movie was the best movie I have ever seen! some scenes "
            "were ridiculous, but acting was great.")
# local wordpiece vocab covering it (zero egress — no HF hub); includes
# '##'-pieces so the renderer's wordpiece-joining path is exercised
VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "this", "movie", "was", "the", "best", "i", "have", "ever",
         "seen", "!", "some", "scene", "##s", "were", "ridiculous", ",",
         "but", "act", "##ing", "great", "."]
CLASSIFICATIONS = ["NEGATIVE", "POSITIVE"]   # SST-2 label order (cell 4)
TRUE_CLASS = 1


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from transformers import BertTokenizerFast
    from transformer_explainability_tpu.models import bert as bert_mod
    from transformer_explainability_tpu.models.bert import BertConfig
    from transformer_explainability_tpu.explain.bert_generator import (
        explain_single)
    from transformer_explainability_tpu.rationale.render import (
        render_text_heatmap_html)

    _os.makedirs(GOLDEN_DIR, exist_ok=True)
    vocab_path = _os.path.join(GOLDEN_DIR, "bert_demo_vocab.txt")
    with open(vocab_path, "w") as f:
        f.write("\n".join(VOCAB))
    tok = BertTokenizerFast(vocab_file=vocab_path, do_lower_case=True)
    enc = tok(SENTENCE, return_attention_mask=True)
    ids = np.asarray(enc["input_ids"], np.int64)
    mask = np.asarray(enc["attention_mask"], np.float64)
    tokens = tok.convert_ids_to_tokens(ids.tolist())
    assert "[UNK]" not in tokens, tokens

    # full-scale bert-base; vocab rows beyond the demo ids are fixture
    # memory only (embedding lookups are not relprop-ed — BERT.py:58-94)
    cfg = BertConfig(vocab_size=4096, num_labels=2)
    params32 = bert_mod.init_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda a: jnp.asarray(np.asarray(a), jnp.float64),
                          params32)

    jids, jmask = jnp.asarray(ids, jnp.int32), jnp.asarray(mask)
    logits = np.asarray(bert_mod.forward(params, jids, jmask, cfg))
    probs = np.exp(logits - logits.max())
    probs = probs / probs.sum()
    pred = int(probs.argmax())

    # the notebook's cell-6 recipe: predicted class, start_layer=0
    expl = np.asarray(explain_single(
        params, jids, jmask, jnp.int32(pred), cfg, start_layer=0,
        matmul_precision="float32")).astype(np.float64)
    expl = (expl - expl.min()) / (expl.max() - expl.min())
    if CLASSIFICATIONS[pred] == "NEGATIVE":
        expl = expl * (-1)

    html = render_text_heatmap_html(
        tokens, expl, true_label=CLASSIFICATIONS[TRUE_CLASS],
        pred_label=CLASSIFICATIONS[pred], pred_prob=float(probs[pred]),
        attr_label=CLASSIFICATIONS[pred])

    np.save(_os.path.join(GOLDEN_DIR, "bert_demo_scores_f64.npy"), expl)
    meta = {"sentence": SENTENCE, "tokens": tokens, "pred": pred,
            "pred_prob": float(probs[pred]),
            "classifications": CLASSIFICATIONS, "true_class": TRUE_CLASS,
            "start_layer": 0, "seed": 0,
            "config": {"vocab_size": 4096, "num_labels": 2}}
    with open(_os.path.join(GOLDEN_DIR, "bert_demo_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    with open(_os.path.join(GOLDEN_DIR, "bert_demo.html"), "w") as f:
        f.write(html)
    print("wrote", GOLDEN_DIR, "pred:", CLASSIFICATIONS[pred],
          "prob %.4f" % probs[pred], "scores[:4]:", expl[:4])


if __name__ == "__main__":
    main()
