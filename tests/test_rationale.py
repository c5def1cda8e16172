"""ERASER rationale stack tests: data round-trip, metric parity vs. the
reference scorer on synthetic predictions, render parity, and an end-to-end
tiny-pipeline smoke test."""

import json
import os

import numpy as np
import pytest

from conftest import requires_reference

from transformer_explainability_tpu.rationale import data as rdata
from transformer_explainability_tpu.rationale import metrics as rmetrics
from transformer_explainability_tpu.rationale import render as rrender


VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "good", "bad", "movie", "plot", "actor", "the", "a", "was", "film",
         "scene", "what", "is", "sentiment", "of", "this", "review", "?",
         "great", "##ly", "fun", "un", "##forget", "##table",
         "masterpiece", "with", "breath", "##taking", "an", "cinema",
         "##tog", "##raphy"]


def _mk_tokenizer(tmp_path):
    """Offline wordpiece tokenizer over a tiny local vocab (zero egress —
    no HF hub)."""
    from transformers import BertTokenizerFast
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(VOCAB))
    return BertTokenizerFast(vocab_file=str(p), do_lower_case=True)


def _mk_dataset(tmp_path, n_docs=6, doc_len=40, seed=0):
    """Synthetic ERASER layout: docs/ + {train,val,test}.jsonl."""
    rng = np.random.RandomState(seed)
    docs_dir = tmp_path / "docs"
    docs_dir.mkdir(exist_ok=True)
    vocab = ["good", "bad", "movie", "plot", "actor", "the", "a", "was",
             "film", "scene"]
    anns = []
    for i in range(n_docs):
        words = [vocab[rng.randint(len(vocab))] for _ in range(doc_len)]
        # two sentences
        text = " ".join(words[:doc_len // 2]) + "\n" + \
            " ".join(words[doc_len // 2:])
        docid = f"doc_{i}"
        (docs_dir / docid).write_text(text)
        start = int(rng.randint(0, doc_len - 6))
        ev = rdata.Evidence(text=" ".join(words[start:start + 5]),
                            docid=docid, start_token=start,
                            end_token=start + 5, start_sentence=0,
                            end_sentence=1)
        anns.append(rdata.Annotation(
            annotation_id=docid, query="what is the sentiment of this review?",
            evidences=frozenset([(ev,)]),
            classification="POS" if i % 2 == 0 else "NEG"))
    k = n_docs // 3
    for split, sub in (("train", anns[:k]), ("val", anns[k:2 * k]),
                       ("test", anns)):
        rdata.annotations_to_jsonl(sub, str(tmp_path / f"{split}.jsonl"))
    return anns


def test_annotation_jsonl_roundtrip(tmp_path):
    anns = _mk_dataset(tmp_path)
    loaded = rdata.annotations_from_jsonl(str(tmp_path / "test.jsonl"))
    assert sorted(a.annotation_id for a in loaded) == \
        sorted(a.annotation_id for a in anns)
    by_id = {a.annotation_id: a for a in anns}
    for a in loaded:
        orig = by_id[a.annotation_id]
        assert a.classification == orig.classification
        # evidences survive as tuples of Evidence with identical spans
        (ev,) = next(iter(a.evidences))
        (ev0,) = next(iter(orig.evidences))
        assert (ev.start_token, ev.end_token, ev.docid) == \
            (ev0.start_token, ev0.end_token, ev0.docid)


def test_document_loading(tmp_path):
    _mk_dataset(tmp_path, n_docs=3, doc_len=10)
    docs = rdata.load_documents(str(tmp_path))
    assert len(docs) == 3 and isinstance(docs["doc_0"], str)
    flat = rdata.load_flattened_documents(str(tmp_path))
    assert all(len(v) == 10 for v in flat.values())
    sents = rdata.load_sentence_documents(str(tmp_path))
    assert all(len(v) == 2 for v in sents.values())


def _mk_results(anns, flat_docs, k=7, seed=1):
    """Synthetic hard+soft predictions overlapping gold ~half the time."""
    rng = np.random.RandomState(seed)
    results = []
    for ann in anns:
        docid = ann.annotation_id
        L = len(flat_docs[docid])
        (ev,) = next(iter(ann.evidences))
        scores = rng.rand(L)
        scores[ev.start_token:ev.start_token + 3] += 1.0  # partial overlap
        top = np.argsort(scores)[::-1][:k]
        results.append({
            "annotation_id": ann.annotation_id,
            "rationales": [{
                "docid": docid,
                "hard_rationale_predictions": [
                    {"start_token": int(t), "end_token": int(t) + 1}
                    for t in top],
                "soft_rationale_predictions": scores.tolist(),
            }],
            "classification": ann.classification if rng.rand() < 0.8
            else ("POS" if ann.classification == "NEG" else "NEG"),
        })
        p = rng.rand() * 0.5 + 0.4
        results[-1]["classification_scores"] = {"POS": p, "NEG": 1 - p}
    return results


def test_metrics_self_consistency(tmp_path):
    anns = _mk_dataset(tmp_path)
    flat = rdata.load_flattened_documents(str(tmp_path))
    results = _mk_results(anns, flat)
    scores = rmetrics.score_results(results, anns, str(tmp_path))
    assert {"iou_scores", "rationale_prf", "token_prf", "token_soft_metrics",
            "classification_scores"} <= set(scores)
    # perfect predictions -> all F1s 1.0
    perfect = []
    for ann in anns:
        (ev,) = next(iter(ann.evidences))
        perfect.append({
            "annotation_id": ann.annotation_id,
            "rationales": [{
                "docid": ann.annotation_id,
                "hard_rationale_predictions": [
                    {"start_token": ev.start_token,
                     "end_token": ev.end_token}]}]})
    s = rmetrics.score_results(perfect, anns, str(tmp_path))
    assert s["rationale_prf"]["instance_micro"]["f1"] == 1.0
    assert s["token_prf"]["instance_macro"]["f1"] == 1.0
    assert s["iou_scores"][0]["micro"]["f1"] == 1.0


@requires_reference
def test_metrics_parity_vs_reference(tmp_path):
    """Our scorer == the reference scorer on identical synthetic inputs."""
    from BERT_rationale_benchmark import metrics as ref_metrics
    from BERT_rationale_benchmark import utils as ref_utils

    anns = _mk_dataset(tmp_path)
    flat = rdata.load_flattened_documents(str(tmp_path))
    results = _mk_results(anns, flat)
    ref_anns = ref_utils.annotations_from_jsonl(str(tmp_path / "test.jsonl"))

    truth_ref = [r for a in ref_anns
                 for r in ref_metrics.Rationale.from_annotation(a)]
    pred_ref = [r for inst in results
                for r in ref_metrics.Rationale.from_instance(inst)]
    truth = [r for a in anns for r in rmetrics.Rationale.from_annotation(a)]
    pred = [r for inst in results
            for r in rmetrics.Rationale.from_instance(inst)]

    ref_pm = ref_metrics.partial_match_score(truth_ref, pred_ref, [0.1, 0.5])
    got_pm = rmetrics.partial_match_score(truth, pred, [0.1, 0.5])
    for r, g in zip(ref_pm, got_pm):
        for avg in ("micro", "macro"):
            for k in ("p", "r", "f1"):
                assert np.isclose(r[avg][k], g[avg][k]), (avg, k, r, g)

    ref_hard = ref_metrics.score_hard_rationale_predictions(
        truth_ref, pred_ref)
    got_hard = rmetrics.score_hard_rationale_predictions(truth, pred)
    for lvl in ("instance_micro", "instance_macro"):
        for k in ("p", "r", "f1"):
            assert np.isclose(ref_hard[lvl][k], got_hard[lvl][k])

    # soft-token metrics (both score vs the same flattened docs)
    ref_paired = ref_metrics.PositionScoredDocument.from_results(
        results, ref_anns, flat, use_tokens=True)
    got_paired = rmetrics.PositionScoredDocument.from_results(
        results, anns, flat, use_tokens=True)
    ref_soft = ref_metrics.score_soft_tokens(ref_paired)
    got_soft = rmetrics.score_soft_tokens(got_paired)
    for k in ("auprc", "average_precision", "roc_auc_score"):
        assert np.isclose(ref_soft[k], got_soft[k]), k


def test_verify_instances_rejects_overlap(tmp_path):
    anns = _mk_dataset(tmp_path, n_docs=3)
    flat = rdata.load_flattened_documents(str(tmp_path))
    bad = [{
        "annotation_id": anns[0].annotation_id,
        "rationales": [{
            "docid": anns[0].annotation_id,
            "hard_rationale_predictions": [
                {"start_token": 0, "end_token": 5},
                {"start_token": 3, "end_token": 8}],
        }]}]
    with pytest.raises(ValueError):
        rmetrics.verify_instances(bad, flat)


@requires_reference
def test_word_scores_parity_vs_reference(tmp_path):
    """wordpiece->word max-pooling matches the reference implementation."""
    import sys
    import types
    import torch
    # the reference transitively imports gensim (absent here) for a vestigial
    # word2vec path — stub it
    if "gensim" not in sys.modules:
        gensim = types.ModuleType("gensim")
        gensim_models = types.ModuleType("gensim.models")
        gensim_models.KeyedVectors = object
        gensim.models = gensim_models
        sys.modules["gensim"] = gensim
        sys.modules["gensim.models"] = gensim_models
    from BERT_rationale_benchmark.models.pipeline import bert_pipeline as ref

    tok = _mk_tokenizer(tmp_path)
    text = "an unforgettable masterpiece with breathtaking cinematography"
    doc_words = text.split()
    enc = tok(text, add_special_tokens=True, return_tensors=None)
    ids = enc["input_ids"]
    rng = np.random.RandomState(0)
    scores = rng.rand(len(ids))

    ref_out = ref.scores_per_word_from_scores_per_token(
        doc_words, tok, torch.tensor(ids), torch.tensor(scores))
    wordpieces = tok.convert_ids_to_tokens(ids)
    got = rrender.scores_per_word_from_scores_per_token(
        doc_words, wordpieces, scores)
    np.testing.assert_allclose(np.asarray(ref_out), got, rtol=1e-6)

    assert rrender.get_input_words(doc_words, wordpieces) == \
        ref.get_input_words(doc_words, tok, torch.tensor(ids))


def test_generate_latex(tmp_path):
    out = tmp_path / "vis.tex"
    rrender.generate_latex(["great", "##ly", "fun"], [0.1, 0.9, 0.5],
                           str(out))
    text = out.read_text()
    assert r"\begin{document}" in text and text.count("colorbox") >= 4
    # wordpiece box glued to the previous one (no leading space)
    assert "}\\colorbox" in text.replace("\n", "")


def test_pipeline_end_to_end(tmp_path):
    """Tiny-BERT fine-tune + explain + decode + score, all on CPU."""
    pytest.importorskip("transformers")
    from transformer_explainability_tpu.models.bert import BertConfig
    from transformer_explainability_tpu.rationale import pipeline as pl

    anns = _mk_dataset(tmp_path, n_docs=6, doc_len=24)
    tok = _mk_tokenizer(tmp_path)
    cfg = BertConfig(vocab_size=64, hidden_size=32, num_layers=2,
                     num_heads=2, intermediate_size=64, num_labels=2)
    import jax
    from transformer_explainability_tpu.models import bert as bert_mod
    params = bert_mod.init_params(jax.random.PRNGKey(0), cfg)

    documents = rdata.load_documents(str(tmp_path))
    interned = pl.intern_documents_bert(documents, tok, max_length=48)
    classes = {"NEG": 0, "POS": 1}
    train, val, test = rdata.load_datasets(str(tmp_path))

    out_dir = tmp_path / "out"
    params, results = pl.train_classifier(
        params, cfg, train, val, interned, classes, str(out_dir),
        batch_size=2, epochs=2, patience=1, lr=1e-3)
    assert len(results["train_loss"]) >= 1
    assert np.isfinite(results["train_loss"]).all()

    paths = pl.explain_test_split(
        params, cfg, test, interned, documents, classes, tok, str(out_dir),
        method="transformer_attribution", batch_size=3,
        topk_range=range(5, 15, 5))
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)
    with open(paths[0]) as f:
        rows = [json.loads(l) for l in f]
    assert len(rows) == len(test)
    assert all(len(r["rationales"][0]["hard_rationale_predictions"]) == 5
               for r in rows)
    # decoded rationales score cleanly end-to-end, incl. soft AUPRC
    scores = rmetrics.score_results(rows, test, str(tmp_path))
    assert 0.0 <= scores["token_prf"]["instance_micro"]["f1"] <= 1.0
    assert "token_soft_metrics" in scores
    assert 0.0 <= scores["token_soft_metrics"]["auprc"] <= 1.0
    # LaTeX artifacts written
    texs = [p for p in os.listdir(out_dir / "ours") if p.endswith(".tex")]
    assert len(texs) >= len(test)

    # checkpoint restore path: re-running training resumes as done
    params2, results2 = pl.train_classifier(
        params, cfg, train, val, interned, classes, str(out_dir),
        batch_size=2, epochs=2, patience=1, lr=1e-3)
    assert results2["train_loss"] == results["train_loss"]


def test_shipped_task_configs_schema():
    """configs/*.json must parse and carry everything run_pipeline consumes
    (max_length, bert_vocab, evidence_classifier.classes/batch_size/epochs/
    patience/lr/max_grad_norm) in the reference BERT_params schema."""
    import glob
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(repo, "configs", "*.json")))
    assert any(p.endswith("movies_bert.json") for p in paths), paths
    for p in paths:
        with open(p) as f:
            mp = json.load(f)
        assert isinstance(mp["max_length"], int) and mp["max_length"] > 0
        assert isinstance(mp["bert_vocab"], str)
        ec = mp["evidence_classifier"]
        assert isinstance(ec["classes"], list) and len(ec["classes"]) >= 2
        for k in ("batch_size", "epochs", "patience", "lr", "max_grad_norm"):
            assert k in ec, (p, k)


def test_hard_rationale_decode_parity_vs_reference():
    """Harness-vs-harness decode: our decode_hard_rationales vs the
    reference's verbatim bert_pipeline.py:567-582 loop (re-run
    ``cam.topk(k)`` per k, appending to ONE list across iterations) on the
    same per-word scores. The reference's k-file carries duplicate spans
    (each smaller top-k re-appended); the ERASER scorer consumes token
    SETS, so parity is set-equality per k — and our emission must be
    duplicate-free and cumulative."""
    import torch
    from transformer_explainability_tpu.rationale.pipeline import (
        decode_hard_rationales)

    rng = np.random.RandomState(0)
    word_scores = rng.rand(97)          # >= 80 so reference topk(80) works
    topk_range = range(5, 85, 5)

    # reference decode, verbatim semantics (:567-582)
    cam = torch.tensor(word_scores)
    hard_rationales = []
    ref_per_k = []
    for res, i in enumerate(topk_range):
        _, indices = cam.topk(k=i)
        for index in indices.tolist():
            hard_rationales.append({"start_token": index,
                                    "end_token": index + 1})
        ref_per_k.append(list(hard_rationales))

    ours_per_k = decode_hard_rationales(word_scores, topk_range)
    assert len(ours_per_k) == len(ref_per_k)
    for k, ours, ref in zip(topk_range, ours_per_k, ref_per_k):
        ours_set = {(h["start_token"], h["end_token"]) for h in ours}
        ref_set = {(h["start_token"], h["end_token"]) for h in ref}
        assert ours_set == ref_set, k
        # ours: exactly the top-k spans, each once, cumulative
        assert len(ours) == k
        assert ours[:k - 5] == ours_per_k[max(0, k // 5 - 2)][:k - 5]

    # short-doc robustness: the reference's topk would raise; ours truncates
    short = decode_hard_rationales(rng.rand(7), topk_range)
    assert len(short[0]) == 5 and all(len(s) == 7 for s in short[1:])
