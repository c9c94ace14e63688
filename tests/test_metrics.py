"""Parity tests for BLEU / ROUGE / CIDEr.

BLEU is checked against nltk's corpus_bleu, ROUGE against google-research's
rouge_score (the library torchmetrics wraps), and CIDEr against the exact
algorithm the reference vendors (wikiweb2m/cider/cider_scorer.py), loaded
from the read-only reference tree at test time.
"""

import importlib.util
import math

import pytest

from mmgl_tpu.metrics import bleu_score, cider_score, rouge_score, Cider

PREDS = [
    "the cat sat on the mat .",
    "a dog runs across the green field quickly",
    "transformers process sequences in parallel",
    "the weather today is sunny and warm",
    "",
]
REFS = [
    ["the cat sat on the mat ."],
    ["the dog ran across a green field", "a dog sprints over the field"],
    ["transformers process sequences in parallel on accelerators"],
    ["it is sunny and warm today"],
    ["empty candidate reference"],
]


def test_bleu_against_nltk():
    from nltk.translate.bleu_score import corpus_bleu

    for n in (1, 2, 3, 4):
        weights = tuple([1.0 / n] * n)
        expected = corpus_bleu(
            [[r.split() for r in refs] for refs in REFS],
            [p.split() for p in PREDS],
            weights=weights,
        )
        got = bleu_score(PREDS, REFS, n_gram=n)
        assert got == pytest.approx(expected, abs=1e-9), f"n={n}"


def test_bleu_perfect_match():
    assert bleu_score(["a b c d"], [["a b c d"]]) == pytest.approx(1.0)


def test_rouge_against_rouge_score_lib():
    from rouge_score import rouge_scorer as rs

    scorer = rs.RougeScorer(["rouge1", "rouge2", "rougeL", "rougeLsum"],
                            use_stemmer=False, split_summaries=False)
    keys = {"rouge1": "rouge1_fmeasure", "rouge2": "rouge2_fmeasure",
            "rougeL": "rougeL_fmeasure", "rougeLsum": "rougeLsum_fmeasure"}
    expected = {v: 0.0 for v in keys.values()}
    for pred, refs in zip(PREDS, REFS):
        best = {v: 0.0 for v in keys.values()}
        for ref in refs:
            out = scorer.score(ref, pred)
            for k, v in keys.items():
                best[v] = max(best[v], out[k].fmeasure)
        for v in keys.values():
            expected[v] += best[v] / len(PREDS)

    got = rouge_score(PREDS, REFS)
    for k in expected:
        assert got[k] == pytest.approx(expected[k], abs=1e-9), k


def _load_reference_cider():
    spec = importlib.util.spec_from_file_location(
        "ref_cider_scorer", "/root/reference/wikiweb2m/cider/cider_scorer.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_cider_against_reference_scorer():
    ref_mod = _load_reference_cider()
    scorer = ref_mod.CiderScorer(n=4, sigma=6.0)
    for pred, refs in zip(PREDS, REFS):
        scorer += (pred, refs)
    expected_mean, expected_scores = scorer.compute_score()

    got = cider_score(PREDS, REFS)
    assert got == pytest.approx(float(expected_mean), abs=1e-9)

    # and through the dict-based Cider API used by the eval loop
    cands = {i: [p] for i, p in enumerate(PREDS)}
    refs = {i: list(r) for i, r in enumerate(REFS)}
    mean, scores = Cider().compute_score(refs, cands)
    assert mean == pytest.approx(float(expected_mean), abs=1e-9)
    for a, b in zip(scores, expected_scores):
        assert a == pytest.approx(float(b), abs=1e-9)


def test_cider_identical_corpus_scores_high():
    preds = ["alpha beta gamma delta", "one two three four five"]
    refs = [[p] for p in preds]
    assert cider_score(preds, refs) > 5.0


def test_bleu_empty_pred_is_zero():
    assert bleu_score([""], [["something here"]]) == 0.0
    assert not math.isnan(bleu_score([""], [["x"]]))
