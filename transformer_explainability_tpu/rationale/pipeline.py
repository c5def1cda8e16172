"""End-to-end ERASER pipeline: fine-tune a BERT classifier, explain the test
split, decode hard rationales, render LaTeX heatmaps.

TPU-native counterpart of reference
``BERT_rationale_benchmark/models/pipeline/bert_pipeline.py`` (589 LoC).
Same stages, redesigned for XLA:

  * tokenize + cache (``:254-273``) — identical pickle contract, but
    encodings are padded to ``max_length`` so every train/eval/explain batch
    has ONE static shape (one compiled program each, no per-length recompiles);
  * fine-tune (``:289-418``) — optax Adam, sum-CE loss, optional grad-norm
    clip, val-accuracy early stopping with patience, epoch checkpointing via
    npz (the torch ``classifier.pt``/``classifier_epoch_data.pt`` analog);
    the whole update is one jitted train step, batched (vs. the reference's
    batch-size-16 Python loop it is the same math — sum-reduced loss);
  * explain (``:439-585``) — the same method table, run through the batched
    :class:`~transformer_explainability_tpu.explain.bert_generator.BertExplainer`
    instead of a batch-1 loop; ground-truth and counterfactual LaTeX
    heatmaps; wordpiece→word max-pooling; top-k (k=5..80 step 5) hard
    rationales into ``identifier_results_{k}.json``.
"""

from __future__ import annotations

import json
import logging
import os
import pickle
import random
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from transformer_explainability_tpu.models import bert as bert_mod
from transformer_explainability_tpu.models.bert import BertConfig
from transformer_explainability_tpu.explain.bert_generator import BertExplainer
from transformer_explainability_tpu.rationale import render
from transformer_explainability_tpu.rationale.data import (
    Annotation, load_datasets, load_documents)
from transformer_explainability_tpu.utils.checkpoint import (
    load_pytree as _load_pytree, save_pytree as _save_pytree)

logger = logging.getLogger(__name__)

# explanation method -> (explainer call name, rule variant, start_layer)
# (reference bert_pipeline.py:443-448: "ours" runs on the ours-rules model,
#  every baseline on the orig-LRP model. start_layer: the reference's
#  generate_LRP uses 11 for transformer_attribution (bert_pipeline.py:456)
#  but generate_rollout defaults to 0 — ALL 12 layers roll out
#  (ExplanationGenerator.py:115); None = the explainer's method default)
METHOD_TABLE = {
    "transformer_attribution": ("transformer_attribution", "ours", None),
    "partial_lrp": ("last_layer", "lrp", None),
    "last_attn": ("last_layer_attn", "lrp", None),
    "attn_gradcam": ("attn_gradcam", "lrp", None),
    "lrp": ("full", "lrp", None),
    "rollout": ("rollout", "lrp", 0),
}
METHOD_FOLDER = {
    "transformer_attribution": "ours", "partial_lrp": "partial_lrp",
    "last_attn": "last_attn", "attn_gradcam": "attn_gradcam", "lrp": "lrp",
    "rollout": "rollout", "ground_truth": "ground_truth",
}


def docid_of(ann: Annotation) -> str:
    return next(iter(ann.evidences))[0].docid


def evidence_group_of(ann: Annotation):
    return next(iter(ann.evidences))


# ---------------------------------------------------------------------------
# Tokenization + cache
# ---------------------------------------------------------------------------

def intern_documents_bert(documents: Dict[str, str], tokenizer,
                          max_length: int, cache_path: Optional[str] = None
                          ) -> Dict[str, Dict[str, np.ndarray]]:
    """docid -> {"input_ids": (max_length,), "attention_mask": (max_length,)}
    — the reference's ``preprocessed.pkl`` stage (:254-273), with
    pad-to-max-length for static shapes."""
    if cache_path and os.path.exists(cache_path):
        logger.info("loading interned documents from %s", cache_path)
        with open(cache_path, "rb") as f:
            return pickle.load(f)
    interned = {}
    for d, doc in documents.items():
        enc = tokenizer(doc, add_special_tokens=True, max_length=max_length,
                        truncation=True, padding="max_length",
                        return_token_type_ids=False,
                        return_attention_mask=True)
        interned[d] = {
            "input_ids": np.asarray(enc["input_ids"], np.int32),
            "attention_mask": np.asarray(enc["attention_mask"], np.int32),
        }
    if cache_path:
        with open(cache_path, "wb") as f:
            pickle.dump(interned, f)
    return interned


def _batch_arrays(anns: List[Annotation], interned, classes: Dict[str, int]):
    ids = np.stack([interned[docid_of(a)]["input_ids"] for a in anns])
    mask = np.stack([interned[docid_of(a)]["attention_mask"] for a in anns])
    targets = np.asarray([classes[a.classification] for a in anns], np.int32)
    return ids, mask, targets


def _padded_batch(anns: List[Annotation], interned, classes: Dict[str, int]):
    """Batch arrays padded (edge-replicated) to a power-of-two bucket, plus
    the 0/1 row-weight vector and the real row count — so ragged final
    batches never trigger a fresh XLA compile (minutes on the relay)."""
    from transformer_explainability_tpu.utils.batching import bucket_size
    ids, mask, targets = _batch_arrays(anns, interned, classes)
    B = len(anns)
    Bp = bucket_size(B)
    weights = np.zeros(Bp, np.float32)
    weights[:B] = 1.0
    if Bp != B:
        pad = Bp - B
        ids = np.concatenate([ids, np.repeat(ids[-1:], pad, axis=0)])
        mask = np.concatenate([mask, np.repeat(mask[-1:], pad, axis=0)])
        targets = np.concatenate([targets, np.repeat(targets[-1:], pad)])
    return ids, mask, targets, weights, B


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------

def make_train_step(cfg: BertConfig, opt, max_grad_norm: Optional[float],
                    dropout: float = 0.1):
    """One jitted step: sum-CE loss over the batch (reference uses
    ``CrossEntropyLoss(reduction='none').sum()``, :345), Adam update,
    optional global-norm clip (:349-351).

    ``weights`` (B,) multiplies the per-example losses: 1 for real rows, 0
    for batch-padding rows, so a ragged final batch can be padded to the
    compiled shape without perturbing the update (compile-once discipline)."""

    def loss_fn(params, ids, mask, targets, weights, rng):
        rngs = jax.random.split(rng, ids.shape[0])
        logits = jax.vmap(
            lambda i, m, r: bert_mod.train_forward(
                params, i, m, cfg, r, hidden_dropout=dropout,
                attn_dropout=dropout))(ids, mask, rngs)
        losses = optax.softmax_cross_entropy_with_integer_labels(
            logits, targets)
        return (losses * weights).sum(), logits

    chain = [optax.clip_by_global_norm(max_grad_norm)] if max_grad_norm else []
    tx = optax.chain(*chain, opt)

    @jax.jit
    def step(params, opt_state, ids, mask, targets, weights, rng):
        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, ids, mask, targets, weights, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        correct = jnp.sum((jnp.argmax(logits, -1) == targets) * weights)
        return params, opt_state, loss, correct

    return tx, step


def make_eval_step(cfg: BertConfig):
    @jax.jit
    def step(params, ids, mask):
        return jax.vmap(
            lambda i, m: bert_mod.forward(params, i, m, cfg))(ids, mask)
    return step


def train_classifier(params, cfg: BertConfig, train: List[Annotation],
                     val: List[Annotation], interned,
                     classes: Dict[str, int], output_dir: str,
                     batch_size: int = 16, epochs: int = 10,
                     patience: int = 3, lr: float = 2e-5,
                     max_grad_norm: Optional[float] = 1.0,
                     dropout: float = 0.1, seed: int = 12345):
    """Fine-tune with val-acc early stopping + epoch checkpoint/resume
    (reference :289-418). Returns (best_params, results dict)."""
    os.makedirs(os.path.join(output_dir, "classifier"), exist_ok=True)
    model_file = os.path.join(output_dir, "classifier", "classifier.npz")
    epoch_file = os.path.join(output_dir, "classifier", "epoch_data.json")

    tx, step = make_train_step(cfg, optax.adam(lr), max_grad_norm, dropout)
    eval_step = make_eval_step(cfg)
    opt_state = tx.init(params)
    rng = jax.random.PRNGKey(seed)
    pyrandom = random.Random(seed)

    results = {"train_loss": [], "train_acc": [], "val_loss": [],
               "val_acc": []}
    best_epoch, best_val_acc, best_val_loss = -1, 0.0, float("inf")
    start_epoch = 0
    if os.path.exists(epoch_file):
        with open(epoch_file) as f:
            epoch_data = json.load(f)
        params = _load_pytree(model_file, params)
        start_epoch = epoch_data["epoch"] + 1
        if epoch_data.get("done"):
            start_epoch = epochs
        results = epoch_data["results"]
        best_val_acc = epoch_data["best_val_acc"]
        # the saved checkpoint IS the best one: keep its epoch/loss so a
        # resumed run neither overwrites it with an equal-accuracy,
        # higher-loss epoch nor shifts the patience window
        best_epoch = epoch_data.get("best_epoch", epoch_data["epoch"])
        best_val_loss = epoch_data.get("best_val_loss", float("inf"))
        logger.info("restored training at epoch %d (best epoch %d)",
                    start_epoch, best_epoch)
    epoch_data = {}

    def run_val():
        total_loss, total_correct = 0.0, 0
        for s in range(0, len(val), 32):
            anns = val[s:s + 32]
            ids, mask, tgt, _, nb = _padded_batch(anns, interned, classes)
            logits = np.asarray(eval_step(params, ids, mask))[:nb]
            tgt = tgt[:nb]
            total_correct += int((logits.argmax(-1) == tgt).sum())
            shifted = logits - logits.max(-1, keepdims=True)
            logp = shifted - np.log(np.exp(shifted).sum(-1, keepdims=True))
            total_loss += float(-logp[np.arange(len(tgt)), tgt].sum())
        return total_loss / len(val), total_correct / len(val)

    for epoch in range(start_epoch, epochs):
        order = pyrandom.sample(range(len(train)), k=len(train))
        epoch_loss, epoch_correct = 0.0, 0
        for s in range(0, len(order), batch_size):
            anns = [train[i] for i in order[s:s + batch_size]]
            ids, mask, tgt, w, _ = _padded_batch(anns, interned, classes)
            rng, sub = jax.random.split(rng)
            params, opt_state, loss, correct = step(
                params, opt_state, ids, mask, tgt, w, sub)
            epoch_loss += float(loss)
            epoch_correct += int(correct)
        epoch_loss /= len(train)
        results["train_loss"].append(epoch_loss)
        results["train_acc"].append(epoch_correct / len(train))
        val_loss, val_acc = run_val()
        results["val_loss"].append(val_loss)
        results["val_acc"].append(val_acc)
        logger.info("epoch %d: train loss %.4f acc %.4f | val loss %.4f "
                    "acc %.4f", epoch, epoch_loss,
                    epoch_correct / len(train), val_loss, val_acc)
        if val_acc > best_val_acc or (val_acc == best_val_acc
                                      and val_loss < best_val_loss):
            best_epoch, best_val_acc, best_val_loss = epoch, val_acc, val_loss
            _save_pytree(model_file, params)
            epoch_data = {"epoch": epoch, "results": results,
                          "best_val_acc": best_val_acc,
                          "best_epoch": best_epoch,
                          "best_val_loss": best_val_loss, "done": 0}
            with open(epoch_file, "w") as f:
                json.dump(epoch_data, f)
        if epoch - best_epoch > patience:
            logger.info("early stop after epoch %d", epoch)
            break

    epoch_data = {"epoch": max(best_epoch, start_epoch), "results": results,
                  "best_val_acc": best_val_acc, "best_epoch": best_epoch,
                  "best_val_loss": best_val_loss, "done": 1}
    with open(epoch_file, "w") as f:
        json.dump(epoch_data, f)
    if os.path.exists(model_file):
        params = _load_pytree(model_file, params)
    return params, results


# ---------------------------------------------------------------------------
# Explanation + hard-rationale decoding
# ---------------------------------------------------------------------------

def decode_hard_rationales(word_scores, topk_range=range(5, 85, 5)):
    """Per-k hard-rationale spans from per-word scores — the decode math of
    reference ``bert_pipeline.py:567-582``. Token-SET identical to the
    reference for every k: the reference re-runs ``cam.topk(k)`` each
    iteration and keeps appending to one list, so its k-file carries the
    top-5 spans again inside the top-10 etc. (duplicates, which the ERASER
    scorer collapses to a token set); this decode emits each span once,
    cumulatively, and tolerates docs shorter than k (the reference's
    ``topk`` would raise). Returns ``[spans_for_k for k in topk_range]``
    where each span is ``{"start_token": i, "end_token": i+1}``."""
    hard = []
    out = []
    order = np.argsort(word_scores)[::-1]
    for k in topk_range:
        for idx in order[len(hard):min(k, len(order))]:
            hard.append({"start_token": int(idx),
                         "end_token": int(idx) + 1})
        out.append(list(hard))
    return out


def explain_test_split(params, cfg: BertConfig, test: List[Annotation],
                       interned, documents: Dict[str, str],
                       classes: Dict[str, int], tokenizer, output_dir: str,
                       method: str = "transformer_attribution",
                       batch_size: int = 16,
                       topk_range=range(5, 85, 5),
                       write_latex: bool = True,
                       write_soft: bool = True,
                       matmul_precision: str = "float32") -> List[str]:
    """Explain every test annotation, write per-k hard-rationale result files
    + GT/counterfactual LaTeX heatmaps (reference :439-585). Returns the list
    of result-file paths.

    ``write_soft`` additionally emits per-word ``soft_rationale_predictions``
    (zero beyond the truncated encoding) — the input the scorer's AUPRC/AP
    soft metrics need (the paper reports AUPRC; the reference pipeline only
    ever wrote hard top-k spans)."""
    call_name, variant, m_start_layer = METHOD_TABLE[method]
    # tensorfloat32 routes transformer_attribution through the fused Pallas
    # layer kernels on TPU (explain_single's auto-gate) — ~10x the XLA f32
    # throughput at S=512 at heatmap corr ~0.999. The tf32 preset also pins
    # the attention island to f32 and drops the inter/out dense dots to
    # 1-pass bf16 (+11% at ~3e-4 median corr cost — PERF.md BERT table).
    tf32 = matmul_precision == "tensorfloat32"
    explainer = BertExplainer(params, cfg, variant=variant,
                              matmul_precision=matmul_precision,
                              attn_precision="float32" if tf32 else None,
                              mlp_precision="bfloat16" if tf32 else None)
    eval_step = make_eval_step(cfg)
    folder = os.path.join(output_dir, METHOD_FOLDER[method])
    os.makedirs(folder, exist_ok=True)
    paths = [os.path.join(folder, f"identifier_results_{k}.json")
             for k in topk_range]
    files = [open(p, "w") for p in paths]

    n_cls = len(classes)
    try:
        for s in range(0, len(test), batch_size):
            anns = test[s:s + batch_size]
            pids, pmask, tgt, _, nb = _padded_batch(anns, interned, classes)
            logits = np.asarray(eval_step(params, pids, pmask))[:nb]
            ids, mask, tgt = pids[:nb], pmask[:nb], tgt[:nb]
            skw = {} if m_start_layer is None else {
                "start_layer": m_start_layer}
            cam_t = np.asarray(explainer.explain(
                ids, mask, indices=tgt, method=call_name, **skw))
            cam_t = np.clip(cam_t, 0, None)
            # the counterfactual map is only consumed by the LaTeX heatmaps;
            # it is a FULL second explain pass per batch — skip when latex
            # output is off
            if write_latex and n_cls == 2 and method in (
                    "transformer_attribution", "partial_lrp",
                    "attn_gradcam", "lrp"):
                cam_cf = np.asarray(explainer.explain(
                    ids, mask, indices=1 - tgt, method=call_name, **skw))
                cam_cf = np.clip(cam_cf, 0, None)
            else:
                cam_cf = None

            for b, ann in enumerate(anns):
                j = s + b
                doc_name = docid_of(ann)
                doc_words = documents[doc_name].split()
                length = int(mask[b].sum())
                wordpieces = tokenizer.convert_ids_to_tokens(
                    ids[b][:length].tolist())
                classification = "neg" if tgt[b] == 0 else "pos"
                correct = int(logits[b].argmax() == tgt[b])
                if write_latex:
                    render.generate_latex(
                        wordpieces, cam_t[b][:length],
                        os.path.join(folder,
                                     f"{j}_GT_{classification}_{correct}.tex"))
                    if cam_cf is not None:
                        render.generate_latex(
                            wordpieces, cam_cf[b][:length],
                            os.path.join(folder, f"{j}_CF.tex"))
                word_scores = render.scores_per_word_from_scores_per_token(
                    doc_words, wordpieces, cam_t[b][:length])
                soft = None
                if write_soft:
                    soft = np.zeros(len(doc_words))
                    soft[:len(word_scores)] = word_scores
                    soft = soft.tolist()
                per_k = decode_hard_rationales(word_scores, topk_range)
                for fi, k in enumerate(topk_range):
                    rat = {"docid": doc_name,
                           "hard_rationale_predictions": per_k[fi]}
                    if soft is not None:
                        rat["soft_rationale_predictions"] = soft
                    # NOTE: the reference writes the docid as annotation_id
                    # (:575) — correct only for movies where they coincide;
                    # the scorer joins on annotation_id, so use the real one.
                    files[fi].write(json.dumps({
                        "annotation_id": ann.annotation_id,
                        "rationales": [rat],
                    }) + "\n")
    finally:
        for f in files:
            f.close()
    return paths


def write_ground_truth_latex(test: List[Annotation],
                             interned, documents: Dict[str, str], tokenizer,
                             output_dir: str) -> None:
    """Green ground-truth heatmaps (reference method=="ground_truth",
    :537-548)."""
    folder = os.path.join(output_dir, METHOD_FOLDER["ground_truth"])
    os.makedirs(folder, exist_ok=True)
    for j, ann in enumerate(test):
        doc_name = docid_of(ann)
        enc = interned[doc_name]
        length = int(np.asarray(enc["attention_mask"]).sum())
        wordpieces = tokenizer.convert_ids_to_tokens(
            np.asarray(enc["input_ids"])[:length].tolist())
        words = render.get_input_words(documents[doc_name].split(),
                                       wordpieces)
        cam = np.zeros(len(words))
        for ev in evidence_group_of(ann):
            if ev.start_token >= len(cam):
                break
            cam[ev.start_token:ev.end_token] = 1
        render.generate_latex(words, cam,
                              os.path.join(folder, f"visual_results_{j}.tex"),
                              color="green")


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def run_pipeline(data_dir: str, output_dir: str, model_params: dict,
                 method: str = "transformer_attribution",
                 pretrained: Optional[str] = None,
                 write_latex: bool = True, seed: int = 12345,
                 matmul_precision: str = "float32"):
    """Full reference main() (:213-585): load data, tokenize+cache, train (or
    restore), explain test split, decode rationales."""
    from transformers import BertTokenizerFast

    os.makedirs(output_dir, exist_ok=True)
    train, val, test = load_datasets(data_dir)
    docids = set(ev.docid for ann in (*train, *val, *test)
                 for ev in ann.all_evidences())
    documents = load_documents(data_dir, docids)
    logger.info("loaded %d documents", len(documents))

    ec = model_params["evidence_classifier"]
    classes = {c: i for i, c in enumerate(ec["classes"])}
    tokenizer = BertTokenizerFast.from_pretrained(model_params["bert_vocab"])
    cfg = BertConfig(num_labels=len(classes))
    interned = intern_documents_bert(
        documents, tokenizer, model_params["max_length"],
        cache_path=os.path.join(output_dir, "preprocessed.pkl"))

    if pretrained:
        from transformer_explainability_tpu.params.convert import (
            load_bert_checkpoint)
        params = load_bert_checkpoint(pretrained, cfg)
    else:
        params = bert_mod.init_params(jax.random.PRNGKey(seed), cfg)

    params, results = train_classifier(
        params, cfg, train, val, interned, classes, output_dir,
        batch_size=ec["batch_size"], epochs=ec["epochs"],
        patience=ec["patience"], lr=ec["lr"],
        max_grad_norm=ec.get("max_grad_norm"), seed=seed)

    if write_latex:
        write_ground_truth_latex(test, interned, documents, tokenizer,
                                 output_dir)
    paths = explain_test_split(params, cfg, test, interned, documents,
                               classes, tokenizer, output_dir, method,
                               batch_size=ec.get("batch_size", 16),
                               write_latex=write_latex,
                               matmul_precision=matmul_precision)
    return params, results, paths


def main(argv=None):
    import argparse
    parser = argparse.ArgumentParser(
        description="ERASER BERT pipeline: fine-tune, explain, decode "
                    "hard rationales")
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--model_params", required=True,
                        help="JSON task config in the reference BERT_params "
                             "schema; shipped ones live in configs/ "
                             "(e.g. configs/movies_bert.json)")
    parser.add_argument("--method", default="transformer_attribution",
                        choices=sorted(METHOD_TABLE))
    parser.add_argument("--pretrained", default=None,
                        help="HF checkpoint dir/name to initialize from")
    parser.add_argument("--no_latex", action="store_true")
    parser.add_argument("--matmul_precision", default="float32",
                        choices=["float32", "tensorfloat32", "bfloat16"],
                        help="MXU pass precision for the explain stage; "
                             "tensorfloat32 enables the fused Pallas layer "
                             "kernels on TPU (near-parity, much faster)")
    args = parser.parse_args(argv)
    with open(args.model_params) as f:
        model_params = json.load(f)
    logger.info("params: %s", json.dumps(model_params, indent=2,
                                         sort_keys=True))
    run_pipeline(args.data_dir, args.output_dir, model_params, args.method,
                 pretrained=args.pretrained, write_latex=not args.no_latex,
                 matmul_precision=args.matmul_precision)


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
