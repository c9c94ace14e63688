import numpy as np

from mmgl_tpu.utils.tokenizer import ByteTokenizer


def test_roundtrip():
    tok = ByteTokenizer()
    enc = tok("hello world", max_length=32, padding="max_length", truncation=True)
    assert enc.input_ids.shape == (1, 32)
    assert enc.attention_mask.sum() == 1 + len("hello world")
    assert tok.batch_decode(enc.input_ids) == ["hello world"]


def test_bos_prepended_and_truncation():
    tok = ByteTokenizer()
    enc = tok("abcdef", max_length=4, padding="do_not_pad", truncation=True)
    ids = enc.input_ids[0]
    assert ids[0] == tok.bos_token_id
    assert len(ids) == 4
    assert tok.decode(ids) == "abc"


def test_pad_api():
    tok = ByteTokenizer()
    ids = tok("hi", padding="do_not_pad").input_ids[0]
    out = tok.pad({"input_ids": [ids]}, max_length=10, padding="max_length")
    assert out.input_ids.shape == (1, 10)
    assert out.attention_mask[0].tolist() == [1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    assert (out.input_ids[0, 3:] == tok.pad_token_id).all()


def test_batch_call():
    tok = ByteTokenizer()
    enc = tok(["a", "bb", "ccc"], max_length=8, padding="max_length", truncation=True)
    assert enc.input_ids.shape == (3, 8)
    assert enc.attention_mask.sum(axis=1).tolist() == [2, 3, 4]
    assert tok.batch_decode(enc.input_ids) == ["a", "bb", "ccc"]


def test_decode_skips_label_padding():
    tok = ByteTokenizer()
    ids = np.array(tok.encode("xy") + [-100, tok.eos_token_id])
    assert tok.decode(ids) == "xy"


def _tiny_hf_tokenizer():
    """In-memory HF fast tokenizer (no network / files; tests the adapter
    the real-run path uses via --tokenizer_path)."""
    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    from transformers import PreTrainedTokenizerFast

    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        special_tokens=["<pad>", "<s>", "</s>", "<unk>"], vocab_size=220)
    tok.train_from_iterator(
        ["summarize: the cat sat on the mat , summary: cats sit",
         "a dog ran fast through the park", "context: page text here"],
        trainer)
    return PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="<pad>", bos_token="<s>",
        eos_token="</s>", unk_token="<unk>")


def test_hf_adapter_surface():
    from mmgl_tpu.utils.tokenizer import HFTokenizerAdapter

    tok = HFTokenizerAdapter(_tiny_hf_tokenizer())
    assert tok.pad_token_id == 0 and tok.eos_token_id == 2

    enc = tok("summarize: the cat", max_length=8, padding="max_length",
              truncation=True)
    assert enc.input_ids.shape == (1, 8)
    assert enc.input_ids.dtype == np.int32
    assert enc.attention_mask.shape == (1, 8)

    unpadded = tok("the cat sat", padding="do_not_pad")
    out = tok.pad({"input_ids": [unpadded.input_ids[0]]}, max_length=12,
                  padding="max_length")
    assert out.input_ids.shape == (1, 12)
    n = unpadded.input_ids.shape[1]
    assert (out.input_ids[0, n:] == tok.pad_token_id).all()

    # -100 labels decode like the reference's pad-replacement path
    labels = np.array([[*unpadded.input_ids[0], -100, -100]])
    decoded = tok.batch_decode(labels, skip_special_tokens=True)
    assert "cat" in decoded[0]


def test_hf_adapter_through_assembler():
    """The assembler's tokenizer calls (data.py:146-294 sequence) work
    unchanged with an HF tokenizer, not just the byte tokenizer."""
    from mmgl_tpu.data.assemble import AssemblerConfig, WikiWeb2MAssembler
    from mmgl_tpu.data.synthetic import make_synthetic_corpus
    from mmgl_tpu.utils.tokenizer import HFTokenizerAdapter

    tok = HFTokenizerAdapter(_tiny_hf_tokenizer())
    store, ids, provider = make_synthetic_corpus(num_pages=2, image_size=32,
                                                 seed=1)
    cfg = AssemblerConfig(context="text_only", decoder_only=True,
                          max_input_length=48, max_output_length=16)
    ds = WikiWeb2MAssembler(cfg, store, ids[:3], tok, provider)
    s = ds[0]
    assert s["input_ids"].shape == (64,)
    assert s["labels"].shape == (64,)
    assert s["attention_mask"].max() == 1


def test_padded_byte_tokenizer():
    """byte:<vocab> pads the REPORTED vocab (model embedding/logits width)
    while emitting only byte-range ids — the production-vocab soak knob."""
    from mmgl_tpu.utils import get_tokenizer

    tok = get_tokenizer("byte:50272")
    assert tok.vocab_size == 50272
    enc = tok("hi", max_length=8, padding="max_length", truncation=True)
    assert enc.input_ids.max() < 260
    assert tok.batch_decode(enc.input_ids)[0] == "hi"
    # the plain tokenizer is unaffected (class attr not mutated)
    assert get_tokenizer().vocab_size == 260
