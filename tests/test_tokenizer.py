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
