"""Per-record scalar/array transforms — the reference's M-section maps.

All stateless, vectorized, usable inside ``map_batches``:

- :func:`scale_input`     ≙ log-compressor (preprocess-300hz.py:405-422)
- :func:`normalize`       ≙ ``normalize_data`` zero-mean/unit-var (QRS_features.py:32-57)
- :func:`labels_onehot`   ≙ utils/data.py:35-38 (9-dim 0/1 vector)
- :func:`smooth_labels`   ≙ challenge2020/utils/tools.py:206-224
- :func:`flatten`         ≙ utils.py:58-63
- :func:`zero_pad`        ≙ fixed-length stacking (preprocess-300hz.py:161-169)
- :func:`wrap_pad`        ≙ ``Pad_1d`` cyclic pad (HRV_features.py:75)
- :func:`nan_to_num`      ≙ NaN/Inf scrub (preprocess-300hz.py:108)
- :func:`gender_num` / :func:`label_num`  ≙ utils.py:16-40 vocab codes
"""

from __future__ import annotations

import numpy as np

N_CLASSES = 9
LABEL_VOCAB = ["AF", "I-AVB", "LBBB", "Normal", "PAC", "PVC", "RBBB", "STD", "STE"]
_LABEL_CODE = {name: i + 1 for i, name in enumerate(LABEL_VOCAB)}  # codes 1–9


def scale_input(x: np.ndarray) -> np.ndarray:
    """Signed log10 compression around the mean: sign(d)·log10(|d|+1)."""
    d = x - x.mean()
    return np.sign(d) * np.log10(np.abs(d) + 1.0)


def normalize(x: np.ndarray) -> np.ndarray:
    """Zero-mean unit-variance; zero-std series map to zeros."""
    s = x.std()
    c = x - x.mean()
    return c / s if s > 0 else c


def labels_onehot(codes: np.ndarray, n_classes: int = N_CLASSES) -> np.ndarray:
    """int codes (1-based) → (n, n_classes) 0/1 int8 matrix."""
    out = np.zeros((codes.size, n_classes), dtype=np.int8)
    valid = (codes >= 1) & (codes <= n_classes)
    out[np.flatnonzero(valid), codes[valid] - 1] = 1
    return out


def smooth_labels(onehot: np.ndarray, eps: float = 0.1) -> np.ndarray:
    """Label smoothing: 1→1-eps+eps/K, 0→eps/K."""
    k = onehot.shape[1]
    return onehot * (1.0 - eps) + eps / k


def flatten(nested) -> list:
    """List-of-lists → flat list (feature assembly order preserved)."""
    return [x for sub in nested for x in sub]


def zero_pad(x: np.ndarray, target_len: int) -> np.ndarray:
    """Right-pad with zeros / truncate to ``target_len``."""
    if x.size >= target_len:
        return x[:target_len]
    out = np.zeros(target_len, dtype=x.dtype)
    out[: x.size] = x
    return out


def wrap_pad(x: np.ndarray, target_len: int) -> np.ndarray:
    """Cyclic (wraparound) pad to ``target_len`` — the reference's partial-
    window tail policy (HRV_features.py:51-56)."""
    if x.size == 0:
        return np.zeros(target_len, dtype=float)
    reps = int(np.ceil(target_len / x.size))
    return np.tile(x, reps)[:target_len]


def nan_to_num(x: np.ndarray) -> np.ndarray:
    return np.nan_to_num(x)


def gender_num(s: str) -> int:
    return 1 if s == "Male" else 0


def label_num(name: str) -> int:
    """Vocab name → 1-based code; unknown → 0."""
    return _LABEL_CODE.get(name, 0)
