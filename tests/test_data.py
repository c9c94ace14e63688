"""Data layer: assembly shapes/semantics for all context x mode combinations."""

import numpy as np
import pytest

from mmgl_tpu.data.assemble import AssemblerConfig, WikiWeb2MAssembler
from mmgl_tpu.data.loader import PrefetchLoader
from mmgl_tpu.data.synthetic import make_synthetic_corpus
from mmgl_tpu.utils.tokenizer import ByteTokenizer

S_IN, S_OUT = 64, 16


def _assembler(context, mode, decoder_only=True, position_type="none"):
    store, ids, images = make_synthetic_corpus(num_pages=4, seed=1)
    cfg = AssemblerConfig(context=context, neighbor_mode=mode,
                          decoder_only=decoder_only,
                          max_input_length=S_IN, max_output_length=S_OUT,
                          max_text_neighbors=5, max_image_neighbors=3,
                          n_text_tokens=2, n_visual_tokens=2,
                          position_type=position_type, image_size=32)
    return WikiWeb2MAssembler(cfg, store, ids, ByteTokenizer(), images)


@pytest.mark.parametrize("context", ["section_only", "section_all",
                                     "text_only", "all"])
def test_raw_shapes_decoder_only(context):
    ds = _assembler(context, "raw")
    for i in range(4):
        s = ds[i]
        assert s["input_ids"].shape == (S_IN + S_OUT,)
        assert s["attention_mask"].shape == (S_IN + S_OUT,)
        assert s["labels"].shape == (S_IN + S_OUT,)
        if context in ("section_all", "all"):
            n_img = 1 if context == "section_all" else 4  # 1 + max_image
            assert s["images"].shape == (n_img, 3, 32, 32)
            assert s["image_positions"].shape == (n_img * 2,)
            # real positions are inside the input span; padded ones point at
            # the sacrificial slot == total length
            assert s["image_positions"].max() <= S_IN + S_OUT


def test_raw_encdec_label_masking():
    store, ids, images = make_synthetic_corpus(num_pages=4, seed=1)
    cfg = AssemblerConfig(context="section_only", neighbor_mode="raw",
                          decoder_only=False, max_input_length=S_IN,
                          max_output_length=96, image_size=32)
    ds = WikiWeb2MAssembler(cfg, store, ids, ByteTokenizer(), images)
    s = ds[0]
    assert s["input_ids"].shape == (S_IN,)
    assert s["labels"].shape == (96,)
    # pad positions must be -100 (data.py:284)
    assert (s["labels"][s["labels"] != -100] != 0).all()
    assert (s["labels"] == -100).any()


def test_decoder_only_label_strip_bos_append_eos():
    ds = _assembler("section_only", "raw")
    tok = ByteTokenizer()
    s = ds[0]
    out_part = s["input_ids"][S_IN:]
    # first token of the output span must NOT be BOS (stripped, data.py:273)
    assert out_part[0] != tok.bos_token_id
    # EOS appended at end of the unpadded span
    valid = s["attention_mask"][S_IN:].sum()
    assert out_part[valid - 1] == tok.eos_token_id
    # the output text starts with the ", summary: " prompt
    decoded = tok.decode(out_part[: valid - 1])
    assert decoded.startswith(", summary: ")


def test_conext_typo_preserved():
    """Metric parity depends on byte-identical prompts, typo included."""
    store, ids, images = make_synthetic_corpus(num_pages=4, seed=1)
    cfg = AssemblerConfig(context="all", neighbor_mode="raw",
                          decoder_only=True, max_input_length=512,
                          max_output_length=S_OUT, image_size=32)
    ds = WikiWeb2MAssembler(cfg, store, ids, ByteTokenizer(), images)
    tok = ByteTokenizer()
    found = False
    for i in range(len(ds)):
        s = ds[i]
        text = tok.decode(s["input_ids"][:512])
        if ", conext: " in text:
            found = True
            break
    assert found, "expected the reference's literal 'conext: ' prompt"


def test_embedding_mode_shapes():
    ds = _assembler("all", "embedding")
    s = ds[0]
    assert s["input_ids"].shape == (S_IN + S_OUT,)
    assert s["neighbor_input_ids"].shape == (5, S_IN)
    assert s["neighbor_attention_mask"].shape == (5, S_IN)
    assert s["neighbor_pos_ids"].shape == (5,)
    assert s["text_locations"].shape == (5,)
    assert s["neighbor_images"].shape == (3, 3, 32, 32)
    assert s["neighbor_images_pos_ids"].shape == (3,)
    assert s["image_locations"].shape == (3,)
    # locations must be a permutation of 0..7 (text+image interleave)
    locs = np.concatenate([s["text_locations"], s["image_locations"]])
    assert sorted(locs.tolist()) == list(range(8))
    # first text neighbor is the page info at location 0, pos id 1
    assert s["neighbor_pos_ids"][0] == 1
    assert s["text_locations"][0] == 0
    # padded neighbors have pos id 0
    n_real = (s["neighbor_pos_ids"] > 0).sum()
    assert (s["neighbor_pos_ids"][n_real:] == 0).all()


def test_embedding_mode_graph_outputs():
    ds_lpe = _assembler("all", "embedding", position_type="laplacian")
    s = ds_lpe[0]
    node_num = 1 + 5 + 3
    assert s["lpe"].shape == (node_num, node_num - 5)
    assert np.isfinite(s["lpe"]).all()

    ds_gnn = _assembler("all", "embedding", position_type="gnn")
    s = ds_gnn[0]
    adj = s["graph"]
    assert adj.shape == (node_num, node_num)
    np.testing.assert_allclose(adj, adj.T, atol=1e-6)  # symmetric
    assert (np.diag(adj) > 0).all()  # self loops


def test_loader_determinism_and_sharding():
    ds = _assembler("section_only", "raw")
    full = PrefetchLoader(ds, batch_size=2, shuffle=True, seed=3)
    full.set_epoch(1)
    a = [b["input_ids"] for b in full]
    full2 = PrefetchLoader(ds, batch_size=2, shuffle=True, seed=3)
    full2.set_epoch(1)
    b = [b["input_ids"] for b in full2]
    assert len(a) == len(b) > 0
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)

    # two shards partition the (unshuffled) index space
    s0 = PrefetchLoader(ds, batch_size=1, shard_id=0, num_shards=2)
    s1 = PrefetchLoader(ds, batch_size=1, shard_id=1, num_shards=2)
    n0, n1 = len(s0), len(s1)
    assert n0 + n1 <= len(ds)
    assert abs(n0 - n1) <= 1


class _IdxDataset:
    """Samples carry their own index so shard contents are inspectable."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"idx": np.asarray([i])}


def _shard_indices(loader):
    return [int(v) for b in loader for v in b["idx"].ravel()]


def test_loader_equal_shard_lengths_when_uneven():
    """n % num_shards != 0: every shard must get the same batch count
    (DistributedSampler truncation) or multi-host per-batch collectives
    deadlock. n=7, 2 shards, bs=2 -> 1 batch each, NOT 2 vs 1."""
    ds = _IdxDataset(7)
    s0 = PrefetchLoader(ds, batch_size=2, shard_id=0, num_shards=2)
    s1 = PrefetchLoader(ds, batch_size=2, shard_id=1, num_shards=2)
    assert len(s0) == len(s1) == 1
    i0, i1 = _shard_indices(s0), _shard_indices(s1)
    assert len(i0) == len(i1) == 2
    assert set(i0).isdisjoint(i1)


def test_loader_multipass_epoch_determinism():
    """Mid-epoch reshuffles derive from (seed, epoch, pass) — identical on
    every process and distinct across passes (fixes the epoch*1000+u
    re-seed hazard)."""
    ds = _IdxDataset(12)

    def run(shard):
        out = []
        ld = PrefetchLoader(ds, batch_size=2, shuffle=True, seed=7,
                            shard_id=shard, num_shards=2)
        for pass_idx in range(3):
            ld.set_epoch(4, pass_idx)
            out.append(_shard_indices(ld))
        return out

    a, b = run(0), run(1)
    for pass_idx in range(3):
        # shard disjointness holds on every pass
        assert set(a[pass_idx]).isdisjoint(b[pass_idx])
    # passes reshuffle (not a repeat of the same order)
    assert a[0] != a[1] or a[1] != a[2]
    # and the whole schedule is reproducible
    assert run(0) == a and run(1) == b


def test_loader_prefetch_bound():
    """Workers must honor the prefetch bound: at most prefetch+num_workers
    batches may be assembled ahead of the consumer (r4: the bound was dead
    code — every pass materialized fully, ~780 MB transient at the 27-batch
    raw-image shape)."""
    import threading
    import time

    fetched = []
    lock = threading.Lock()

    class _Counting:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            with lock:
                fetched.append(i)
            return {"i": np.asarray([i], np.int32)}

    prefetch, workers, bs = 2, 2, 2
    ld = PrefetchLoader(_Counting(), batch_size=bs, prefetch=prefetch,
                        num_workers=workers)
    max_ahead = 0
    consumed = 0
    for _ in ld:
        consumed += 1
        time.sleep(0.03)  # slow consumer lets workers run as far as allowed
        with lock:
            ahead = len(fetched) // bs - consumed
        max_ahead = max(max_ahead, ahead)
    assert consumed == 32
    assert max_ahead <= prefetch + workers, (
        f"workers ran {max_ahead} batches ahead (bound {prefetch + workers})")
