"""Stateful model-scoring stage — the T1 analog (actor pool, weights loaded once).

The reference loads a Keras InceptionTime model once and scores every record
sequentially (/root/reference/challenge2020/get_model.py:11-49).  Here the
same shape is an actor-pool `map_batches` class: ``__init__`` materializes
the "weights" (a deterministic seeded projection matrix — no external model
downloads in this environment; the seam where real weights would load),
``__call__`` does batched inference over decoded pixel features.

Output: ``score: fixed_size_list<float64>[9]`` per row (9 ≙ the reference's
9-class head) plus the argmax class.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset

from ..functions.codec import decode_image

N_CLASSES = 9
FEAT_DIM = 16


class DeepScorer:
    """Deterministic stand-in 'model': fixed seeded projection + softmax."""

    def __init__(self, seed: int = 7):
        rng = np.random.default_rng(seed)
        # "load_weights once per actor" (get_model.py:17)
        self.w1 = rng.normal(size=(FEAT_DIM, 32))
        self.w2 = rng.normal(size=(32, N_CLASSES))

    def _featurize(self, px: np.ndarray) -> np.ndarray:
        g = px.astype(np.float64).mean(axis=2) / 255.0
        h, w = g.shape
        qh, qw = max(h // 4, 1), max(w // 4, 1)
        pooled = g[: qh * 4, : qw * 4].reshape(4, qh, 4, qw).mean(axis=(1, 3)).ravel()
        return pooled  # 16 pooled luminance cells

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch.column("bytes").to_pylist()
        feats = np.vstack([self._featurize(decode_image(b)[0]) for b in blobs])
        logits = np.tanh(feats @ self.w1) @ self.w2
        z = logits - logits.max(axis=1, keepdims=True)
        p = np.exp(z)
        p /= p.sum(axis=1, keepdims=True)
        return pa.table(
            {
                "image_id": batch.column("image_id"),
                "ts": batch.column("ts"),
                "score": pa.FixedSizeListArray.from_arrays(
                    pa.array(p.ravel(), pa.float64()), N_CLASSES
                ),
                "pred_class": pa.array(np.argmax(p, axis=1).astype(np.int32)),
            }
        )


def deep_score_stage(
    ds: Dataset, concurrency: int | tuple[int, int] = (2, 8), batch_size: int = 128
) -> Dataset:
    return ds.map_batches(
        DeepScorer,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
    )
