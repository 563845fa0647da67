"""Hub embedding API (the HOW_TO_USE contract)."""

import numpy as np

from chadavit_tpu.hub import collate_images, extract_embeddings, load_chadavit16_moyen


def test_hub_mixed_channel_embeddings(rng):
    model, variables = load_chadavit16_moyen(None, img_size=32)
    images = [rng.random((c, 32, 32)).astype(np.float32) for c in (1, 4, 10, 3, 7)]
    embs = extract_embeddings(model, variables, images, batch_size=3)
    assert embs.shape == (5, 192)  # num_embeddings == num_images (cell-26)
    assert np.isfinite(embs).all()

    x, cc = collate_images(images[:2])
    assert x.shape == (2, 10, 32, 32)
    assert list(np.asarray(cc)) == [1, 4]
