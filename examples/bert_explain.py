"""Runnable analog of the reference's ``BERT_explainability.ipynb``: explain a
sentence classification, print per-token relevance, write a LaTeX heatmap.

    python examples/bert_explain.py --text "a truly great movie" \
        [--checkpoint textattack/bert-base-uncased-SST-2 | /path/to/dir] \
        [--vocab /path/to/vocab-or-name] [--target 1]

Without a checkpoint the model runs with random weights (pipeline demo only).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--text", required=True)
    p.add_argument("--checkpoint", default=None,
                   help="HF dir / file with BertForSequenceClassification "
                        "weights")
    p.add_argument("--vocab", default="bert-base-uncased")
    p.add_argument("--target", type=int, default=None,
                   help="class index (default: predicted)")
    p.add_argument("--method", default="transformer_attribution")
    p.add_argument("--start-layer", type=int, default=11)
    p.add_argument("--latex-out", default=None)
    p.add_argument("--html-out", default=None,
                   help="captum-style colored-text rendering (the "
                        "BERT_explainability.ipynb surface)")
    p.add_argument("--num-labels", type=int, default=2)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (skip any TPU relay)")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from transformers import BertTokenizerFast
    from transformer_explainability_tpu.models import bert as bert_mod
    from transformer_explainability_tpu.models.bert import BertConfig
    from transformer_explainability_tpu.explain.bert_generator import (
        BertExplainer)

    if os.path.isfile(args.vocab):     # a bare vocab.txt (zero-egress path)
        tokenizer = BertTokenizerFast(vocab_file=args.vocab,
                                      do_lower_case=True)
    else:
        tokenizer = BertTokenizerFast.from_pretrained(args.vocab)
    cfg = BertConfig(num_labels=args.num_labels)
    if args.checkpoint:
        from transformer_explainability_tpu.params.convert import (
            load_bert_checkpoint)
        params = load_bert_checkpoint(args.checkpoint, cfg)
    else:
        print("WARNING: no checkpoint — random weights")
        params = bert_mod.init_params(jax.random.PRNGKey(0), cfg)

    enc = tokenizer(args.text, return_attention_mask=True)
    ids = np.asarray([enc["input_ids"]], np.int32)
    mask = np.asarray([enc["attention_mask"]], np.float32)

    logits = np.asarray(jax.vmap(
        lambda i, m: bert_mod.forward(params, i, m, cfg))(
            jax.numpy.asarray(ids), jax.numpy.asarray(mask)))[0]
    pred = int(logits.argmax())
    print(f"logits: {logits}  predicted class: {pred}")

    target = args.target if args.target is not None else pred
    explainer = BertExplainer(params, cfg)
    scores = np.asarray(explainer.explain(
        ids, mask, indices=[target], method=args.method,
        start_layer=args.start_layer))[0]
    scores = np.clip(scores, 0, None)
    tokens = tokenizer.convert_ids_to_tokens(ids[0].tolist())
    norm = scores / (scores.max() + 1e-12)
    print(f"\ntoken relevance (class {target}, {args.method}):")
    for tok, s in zip(tokens, norm):
        bar = "#" * int(s * 40)
        print(f"  {tok:16s} {s:6.3f} {bar}")

    if args.latex_out:
        from transformer_explainability_tpu.rationale.render import (
            generate_latex)
        generate_latex(tokens, scores, args.latex_out)
        print("wrote", args.latex_out)

    if args.html_out:
        # the notebook's postprocess: min-max normalize, sign-flip when the
        # rendered class is class 0 (NEGATIVE in SST-2 label order)
        from transformer_explainability_tpu.rationale.render import (
            render_text_heatmap_html)
        signed = norm if target != 0 else -norm
        probs = np.exp(logits - logits.max())
        probs = probs / probs.sum()
        with open(args.html_out, "w") as f:
            f.write(render_text_heatmap_html(
                tokens, signed, pred_label=f"class {pred}",
                pred_prob=float(probs[pred]),
                attr_label=f"class {target}"))
        print("wrote", args.html_out)


if __name__ == "__main__":
    main()
