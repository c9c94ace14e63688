"""Neighbor-embedding cache: cached pooled features == live tower encode."""

import jax
import numpy as np

from mmgl_tpu.config import Arguments
from mmgl_tpu.data.assemble import AssemblerConfig, WikiWeb2MAssembler
from mmgl_tpu.data.neighbor_cache import CachedNeighborDataset
from mmgl_tpu.data.synthetic import make_synthetic_corpus
from mmgl_tpu.models.factory import build_model
from mmgl_tpu.utils.tokenizer import ByteTokenizer


def test_cached_equals_live():
    args = Arguments(model_name_or_path="opt-tiny", context="all",
                     neighbor_mode="embedding", max_input_length=32,
                     max_output_length=8, max_text_neighbors=3,
                     max_image_neighbors=2, n_text_tokens=2,
                     n_visual_tokens=2, use_pallas=False)
    model, fcfg = build_model(args, vocab_size=260)

    store, ids, images = make_synthetic_corpus(num_pages=3, image_size=32,
                                               seed=2)
    acfg = AssemblerConfig.from_args(args)
    acfg.image_size = 32
    ds = WikiWeb2MAssembler(acfg, store, ids[:4], ByteTokenizer(), images)

    def stack(dataset):
        samples = [dataset[i] for i in range(4)]
        return {k: np.stack([s[k] for s in samples])
                for k in samples[0]}

    raw_batch = stack(ds)
    variables = model.init(jax.random.PRNGKey(0), raw_batch)

    cached = CachedNeighborDataset(ds, model, variables, batch_size=2,
                                   verbose=False)
    cached_batch = stack(cached)
    assert "neighbor_text_pooled" in cached_batch
    assert "neighbor_input_ids" not in cached_batch
    assert "neighbor_images" not in cached_batch

    live = model.apply(variables, raw_batch)
    fast = model.apply(variables, cached_batch)
    np.testing.assert_allclose(np.asarray(fast["logits"]),
                               np.asarray(live["logits"]),
                               rtol=2e-4, atol=2e-4)
