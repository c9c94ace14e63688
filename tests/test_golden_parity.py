"""Golden token-stream parity against the ACTUAL reference Dataset.

SURVEY hard-part #2 / VERDICT r1 item 3: feed `/root/reference/wikiweb2m/data.py`
(WikiWeb2M torch Dataset) and our WikiWeb2MAssembler the same synthetic
DataFrame and the same ByteTokenizer, and assert byte-identical
input_ids/attention_mask/labels for the raw contexts x {dec-only, enc-dec},
and identical neighbor tensors / pos-ids / locations (+ images) for embedding
mode. The reference side runs verbatim (torch_geometric stubbed — it is only
touched at import time and for position_type != none, data.py:11,430-438).

Documented divergences exercised here:
  * raw 'all'/'section_all': the reference emits a VARIABLE number of images
    per sample (torch collate can't even stack them); we pad to a fixed
    (1+max_image_neighbors) with sacrificial positions. Token streams are
    still asserted identical; image_positions are compared on the reference's
    prefix.
  * zero-image placeholders are uint8 host-side (normalized on device);
    value-equal to the reference's float zeros.
"""

import os
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.filterwarnings("ignore::DeprecationWarning")

REFERENCE = "/root/reference"


# ---------------------------------------------------------------------------
# reference import (stub torch_geometric; it ships no requirements entry, Q4)
# ---------------------------------------------------------------------------

def _load_reference():
    if "torch_geometric" not in sys.modules:
        tg = types.ModuleType("torch_geometric")
        tgd = types.ModuleType("torch_geometric.data")

        class Data:
            def __init__(self, **kw):
                self.__dict__.update(kw)

        tgd.Data = Data
        tg.data = tgd
        sys.modules["torch_geometric"] = tg
        sys.modules["torch_geometric.data"] = tgd
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from wikiweb2m.data import WikiWeb2M  # noqa: E501  reference data.py:34

    return WikiWeb2M


# ---------------------------------------------------------------------------
# a torch-returning shim over our ByteTokenizer for the reference side
# ---------------------------------------------------------------------------

class _TorchEncoding:
    def __init__(self, enc):
        import torch

        self.input_ids = torch.from_numpy(np.asarray(enc.input_ids)).long()
        self.attention_mask = torch.from_numpy(
            np.asarray(enc.attention_mask)).long()


class TorchByteTokenizer:
    """Our ByteTokenizer, returning torch tensors like an HF tokenizer."""

    def __init__(self):
        from mmgl_tpu.utils.tokenizer import ByteTokenizer

        self._tok = ByteTokenizer()
        self.pad_token_id = self._tok.pad_token_id
        self.bos_token_id = self._tok.bos_token_id
        self.eos_token_id = self._tok.eos_token_id

    def __call__(self, text, **kw):
        kw.pop("return_tensors", None)
        return _TorchEncoding(self._tok(text, **kw))

    def pad(self, inputs, **kw):
        kw.pop("return_tensors", None)
        seqs = {"input_ids": [np.asarray(t) for t in inputs["input_ids"]]}
        return _TorchEncoding(self._tok.pad(seqs, **kw))


# ---------------------------------------------------------------------------
# shared synthetic corpus (reference parquet schema, bytes values)
# ---------------------------------------------------------------------------

def _make_dataframe():
    import pandas as pd

    def b(s):
        return s.encode()

    rows = []
    # page 0: 3 sections, messy whitespace, long text to force truncation
    rows.append({
        "page_id": 0,
        "page_url": b("http://en.wikipedia.org/p0"),
        "page_title": b("Page  Zero\nTitle"),
        "page_description": b("A page about\nzeros and   spacing."),
        "section_title": np.array([b("Intro"), b("History"), b("Uses")],
                                  dtype=object),
        "section_depth": np.array([0, 1, 1]),
        "section_heading": np.array([1, 1, 1]),
        "section_parent_index": np.array([-1, 0, 0]),
        "section_summary": np.array(
            [b("Zero is a number."), b("Long\nhistory of zero."),
             b("Zeros are used in math.")], dtype=object),
        "section_rest_sentence": np.array(
            [b("The rest of the intro section talks about nothing " * 4),
             b("It was invented  long ago.\nIn many places."),
             b("Mathematics uses zero for  identity.")], dtype=object),
        "image_url": np.array(
            [b("http://img/0_0.jpg"), b("http://img/0_1.png"),
             b(""), b(""), b("http://img/2_0.jpg"), b("")], dtype=object),
        "image_caption": np.array(
            [b("a zero\nglyph"), b("another zero"), b(""), b(""),
             b("math  zero"), b("")], dtype=object),
    })
    # page 1: 2 sections
    rows.append({
        "page_id": 1,
        "page_url": b("http://en.wikipedia.org/p1"),
        "page_title": b("One"),
        "page_description": b("The first positive integer."),
        "section_title": np.array([b("Main"), b("Trivia")], dtype=object),
        "section_depth": np.array([0, 1]),
        "section_heading": np.array([1, 1]),
        "section_parent_index": np.array([-1, 0]),
        "section_summary": np.array(
            [b("One is unity."), b("Fun facts about one.")], dtype=object),
        "section_rest_sentence": np.array(
            [b("Multiplying by one changes nothing."),
             b("One is neither prime nor composite.")], dtype=object),
        "image_url": np.array([b("http://img/1_0.jpg"), b(""),
                               b(""), b("")], dtype=object),
        "image_caption": np.array([b("the one  glyph"), b(""),
                                   b(""), b("")], dtype=object),
    })
    return pd.DataFrame(rows)


ID_LIST = [(0, 0), (0, 1), (0, 2), (1, 0), (1, 1)]


def _ref_args(context, decoder_only, neighbor_mode):
    return types.SimpleNamespace(
        task="section", context=context, decoder_only=decoder_only,
        neighbor_mode=neighbor_mode, max_text_neighbors=5,
        max_image_neighbors=3, position_type="none", max_input_length=64,
        max_output_length=24, n_text_tokens=4, n_visual_tokens=4)


def _our_assembler(context, decoder_only, neighbor_mode, store,
                   image_provider=None, tokenizer=None):
    from mmgl_tpu.data.assemble import AssemblerConfig, WikiWeb2MAssembler
    from mmgl_tpu.data.assemble import no_images
    from mmgl_tpu.utils.tokenizer import ByteTokenizer

    cfg = AssemblerConfig(
        context=context, neighbor_mode=neighbor_mode,
        decoder_only=decoder_only, max_input_length=64, max_output_length=24,
        max_text_neighbors=5, max_image_neighbors=3, n_text_tokens=4,
        n_visual_tokens=4, image_size=224)
    return WikiWeb2MAssembler(cfg, store, ID_LIST,
                              tokenizer or ByteTokenizer(),
                              image_provider or no_images)


def _ref_dataset(context, decoder_only, neighbor_mode, df, extractor=None,
                 tokenizer=None):
    WikiWeb2M = _load_reference()
    args = _ref_args(context, decoder_only, neighbor_mode)
    return WikiWeb2M(args, df, ID_LIST, tokenizer or TorchByteTokenizer(),
                     visual_feature_extractor_model=extractor)


@pytest.fixture(scope="module")
def corpus():
    from mmgl_tpu.data.store import pages_from_dataframe

    df = _make_dataframe()
    return df, pages_from_dataframe(df)


# ---------------------------------------------------------------------------
# raw modes: byte-identical token streams
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("context", ["section_only", "text_only"])
@pytest.mark.parametrize("decoder_only", [True, False])
def test_raw_token_parity(corpus, context, decoder_only):
    df, store = corpus
    ref = _ref_dataset(context, decoder_only, "raw", df)
    ours = _our_assembler(context, decoder_only, "raw", store)
    for i in range(len(ID_LIST)):
        r, o = ref[i], ours[i]
        for key in ("input_ids", "attention_mask", "labels"):
            np.testing.assert_array_equal(
                np.asarray(r[key]), o[key],
                err_msg=f"{context} dec={decoder_only} sample={i} key={key}")


@pytest.mark.parametrize("context", ["section_all", "all"])
def test_raw_image_context_token_parity(corpus, context):
    """No image files exist -> the reference takes its no-image branches
    (pad-id visual slots); token streams must still match exactly."""
    df, store = corpus
    ref = _ref_dataset(context, True, "raw", df)   # extractor never touched
    ours = _our_assembler(context, True, "raw", store)
    for i in range(len(ID_LIST)):
        r, o = ref[i], ours[i]
        for key in ("input_ids", "attention_mask", "labels"):
            np.testing.assert_array_equal(
                np.asarray(r[key]), o[key],
                err_msg=f"{context} sample={i} key={key}")
        # reference image_positions are a prefix of our fixed-shape ones
        ref_pos = np.asarray(r["image_positions"])
        np.testing.assert_array_equal(ref_pos,
                                      o["image_positions"][: len(ref_pos)])
        # our padded slots point at the sacrificial index (= seq len)
        assert (o["image_positions"][len(ref_pos):]
                == o["input_ids"].shape[0]).all()


# ---------------------------------------------------------------------------
# embedding mode: neighbor tensors, pos ids, locations (+ images on disk)
# ---------------------------------------------------------------------------

def _fake_pixels(img):
    """Deterministic (3,224,224) float pixels from a PIL image."""
    arr = np.asarray(img.convert("RGB").resize((224, 224)),
                     dtype=np.float32) / 255.0
    return arr.transpose(2, 0, 1)


def _write_images(root):
    """Create small solid-color images matching the corpus image_urls."""
    from PIL import Image

    os.makedirs(root, exist_ok=True)
    made = []
    # (page_id, section_id, image_id, ext, color)
    specs = [(0, 0, 0, "jpg", (250, 10, 10)), (0, 2, 0, "jpg", (10, 250, 10)),
             (1, 0, 0, "jpg", (10, 10, 250))]
    for pid, sid, iid, ext, color in specs:
        p = os.path.join(root, f"{pid}_{sid}_{iid}.{ext}")
        Image.new("RGB", (16, 16), color).save(p)
        made.append(p)
    return made


class _OurImageProvider:
    """Mirror of the reference's first-openable-image loop
    (data.py:118-144) over the same on-disk files."""

    def __init__(self, root):
        self.root = root

    def __call__(self, page_id, section_id, page):
        from PIL import Image

        urls = page.image_url[section_id]
        caps = page.image_caption[section_id]
        for iid, url in enumerate(urls):
            ext = os.path.splitext(url)[1][1:]
            path = os.path.join(self.root, f"{page_id}_{section_id}_{iid}.{ext}")
            if os.path.exists(path):
                try:
                    return _fake_pixels(Image.open(path)), caps[iid]
                except Exception:
                    continue
        return None, None


@pytest.mark.parametrize("decoder_only", [True, False])
def test_embedding_mode_parity(corpus, decoder_only, tmp_path, monkeypatch):
    import torch

    df, store = corpus
    img_root = str(tmp_path / "wikiweb2m" / "raw" / "images")
    _write_images(img_root)

    # run the reference from tmp_path so its hardcoded relative open path
    # ('./wikiweb2m/raw/images/...', data.py:138) resolves to our files
    monkeypatch.chdir(tmp_path)
    import language_modelling.utils as ref_utils

    monkeypatch.setattr(ref_utils, "get_feature_extractor_for_model",
                        lambda name: object())
    monkeypatch.setattr(ref_utils, "get_pixel_values_for_model",
                        lambda fe, img: torch.from_numpy(_fake_pixels(img)))

    ref = _ref_dataset("section_all", decoder_only, "embedding", df,
                       extractor="stub-clip")
    ref.image_path = img_root  # Q9: existence checked under a cluster path

    ours = _our_assembler("section_all", decoder_only, "embedding", store,
                          image_provider=_OurImageProvider(img_root))

    keys = ("input_ids", "attention_mask", "labels", "neighbor_input_ids",
            "neighbor_attention_mask", "neighbor_pos_ids", "text_locations",
            "neighbor_images_pos_ids", "image_locations")
    for i in range(len(ID_LIST)):
        r, o = ref[i], ours[i]
        for key in keys:
            np.testing.assert_array_equal(
                np.asarray(r[key]), o[key],
                err_msg=f"dec={decoder_only} sample={i} key={key}")
        np.testing.assert_allclose(
            np.asarray(r["neighbor_images"], dtype=np.float32),
            o["neighbor_images"].astype(np.float32), atol=1e-6,
            err_msg=f"dec={decoder_only} sample={i} neighbor_images")
        # at least one sample must actually contain a real image neighbor
    assert any(np.asarray(ref[i]["neighbor_images_pos_ids"]).max() > 0
               for i in range(len(ID_LIST)))
