"""Image loading + CLIP preprocessing (host side).

Counterpart of the reference's AutoFeatureExtractor usage
(language_modelling/utils.py:15-23) and the per-section first-openable-image
scan (wikiweb2m/data.py:118-144), without requiring a downloaded HF
preprocessor config: the CLIP pipeline is fixed (resize shortest side,
center crop, scale 1/255, normalize with the CLIP mean/std).
"""

from __future__ import annotations

import os

import numpy as np

def clip_preprocess(img, image_size: int = 224) -> np.ndarray:
    """PIL image -> (3, S, S) uint8: resize shortest side + center crop.

    Scaling and CLIP mean/std normalization run ON DEVICE
    (models/clip.py normalize_pixels) so images travel host->device as uint8
    — 4x less transfer than normalized f32, which profiling showed dominates
    the raw-image training step on the tunneled chip."""
    from PIL import Image

    img = img.convert("RGB")
    w, h = img.size
    scale = image_size / min(w, h)
    img = img.resize((max(image_size, int(round(w * scale))),
                      max(image_size, int(round(h * scale)))),
                     Image.BICUBIC)
    w, h = img.size
    left = (w - image_size) // 2
    top = (h - image_size) // 2
    img = img.crop((left, top, left + image_size, top + image_size))
    return np.asarray(img, np.uint8).transpose(2, 0, 1)


def disk_image_provider(data_dir: str, visual_model: str = "",
                        image_size: int = 224):
    """ImageProvider over the reference's image layout:
    {data_dir}/images/{page_id}_{section_id}_{image_id}.{ext}
    (wikiweb2m/data.py:135-138). Returns the first openable image per
    section plus its caption."""
    image_dir = os.path.join(data_dir, "images")

    def provider(page_id: int, section_id: int, page):
        from PIL import Image

        urls = (page.image_url[section_id]
                if section_id < len(page.image_url) else [])
        caps = (page.image_caption[section_id]
                if section_id < len(page.image_caption) else [])
        for image_id, url in enumerate(urls):
            if not url:
                continue
            ext = os.path.splitext(url)[1][1:]
            fname = os.path.join(image_dir,
                                 f"{page_id}_{section_id}_{image_id}.{ext}")
            if not os.path.exists(fname):
                continue
            try:
                img = Image.open(fname)
                pixels = clip_preprocess(img, image_size)
            except Exception:
                continue
            caption = caps[image_id] if image_id < len(caps) else ""
            return pixels, caption
        return None, None

    return provider
