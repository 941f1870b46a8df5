"""Alignment-risk classifier: (octree overlap, alignability) -> P(failure).

TPU-native replacement for the reference's OpenCV SVM
(aicp_core/src/classification/svm.cpp): C_SVC with POLY kernel of degree 3
(svm.cpp:7-13). A degree-3 polynomial kernel on 2-D features is exactly a
linear SVM in the 10-dimensional monomial feature space
{1, x1, x2, x1^2, x1x2, x2^2, x1^3, x1^2x2, x1x2^2, x2^3}, so we train a
linear max-margin model there with hinge loss + L2 (full-batch gradient
descent — the dataset is hundreds of rows). Probability output matches the
reference's sigmoid link: P(failure) = 1 - 1/(1 + exp(-f)) with f oriented
so that positive decision values mean predicted failure (svm.cpp:81-83).

Data format compatibility: `load_label_file` parses the reference's
data/labels/*.txt rows `id overlap alignability label`
(aicp_core/data/labels, classification/main.cpp:116-153).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def poly3_features(x: jax.Array) -> jax.Array:
    """(.., 2) -> (..., 10) monomial embedding of a degree-3 poly kernel."""
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack(
        [
            jnp.ones_like(x1),
            x1, x2,
            x1 * x1, x1 * x2, x2 * x2,
            x1 ** 3, x1 * x1 * x2, x1 * x2 * x2, x2 ** 3,
        ],
        axis=-1,
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SVMModel:
    w: jax.Array          # (10,)
    b: jax.Array          # ()
    mean: jax.Array       # (2,) feature standardization
    std: jax.Array        # (2,)

    def decision(self, x: jax.Array) -> jax.Array:
        z = (x - self.mean) / self.std
        return poly3_features(z) @ self.w + self.b

    def predict_probability(self, x: jax.Array) -> jax.Array:
        """P(alignment failure) in [0, 1]; >= threshold => high risk."""
        return jax.nn.sigmoid(self.decision(x))


@partial(jax.jit, static_argnames=("steps",))
def _train(z, y, steps: int = 4000, lr: float = 0.05, l2: float = 1e-3):
    phi = poly3_features(z)                     # (n, 10)
    s = 2.0 * y - 1.0                           # labels {0,1} -> {-1,+1}
    n = phi.shape[0]
    # class-balanced sample weights (failure sets are small)
    pos = jnp.maximum(jnp.sum(y), 1.0)
    neg = jnp.maximum(n - jnp.sum(y), 1.0)
    sw = jnp.where(y > 0.5, n / (2.0 * pos), n / (2.0 * neg))

    def loss(params):
        w, b = params
        f = phi @ w + b
        hinge = jnp.maximum(0.0, 1.0 - s * f)
        return jnp.mean(sw * hinge) + l2 * jnp.sum(w * w)

    grad = jax.grad(loss)

    def step(i, state):
        (w, b), (mw, mb) = state
        gw, gb = grad((w, b))
        mw = 0.9 * mw + gw
        mb = 0.9 * mb + gb
        return ((w - lr * mw, b - lr * mb), (mw, mb))

    w0 = jnp.zeros((10,), jnp.float32)
    b0 = jnp.float32(0.0)
    (w, b), _ = jax.lax.fori_loop(0, steps, step, ((w0, b0), (w0, b0)))
    return w, b


class RiskClassifier:
    """train/test/save/load API mirroring the reference AbstractClassification
    (abstract_classification.hpp:10-18)."""

    def __init__(self, threshold: float = 0.50):
        self.threshold = threshold  # aicp_config.yaml:28
        self.model: SVMModel | None = None

    def train(self, features: np.ndarray, labels: np.ndarray,
              steps: int = 4000) -> None:
        features = jnp.asarray(features, jnp.float32).reshape(-1, 2)
        labels = jnp.asarray(labels, jnp.float32).reshape(-1)
        mean = jnp.mean(features, axis=0)
        std = jnp.maximum(jnp.std(features, axis=0), 1e-6)
        z = (features - mean) / std
        w, b = _train(z, labels, steps=steps)
        self.model = SVMModel(w=w, b=b, mean=mean, std=std)

    def test(self, features: np.ndarray, labels: np.ndarray | None = None):
        """Returns probabilities; with labels also a confusion-matrix dict
        (classification/common.hpp:10-35 semantics)."""
        assert self.model is not None, "train() or load() first"
        probs = self.model.predict_probability(
            jnp.asarray(features, jnp.float32).reshape(-1, 2))
        if labels is None:
            return probs
        pred = np.asarray(probs) >= self.threshold
        lab = np.asarray(labels).reshape(-1) > 0.5
        stats = {
            "tp": int(np.sum(pred & lab)),
            "fp": int(np.sum(pred & ~lab)),
            "tn": int(np.sum(~pred & ~lab)),
            "fn": int(np.sum(~pred & lab)),
        }
        total = max(len(lab), 1)
        stats["accuracy"] = (stats["tp"] + stats["tn"]) / total
        return probs, stats

    def save(self, path: str) -> None:
        assert self.model is not None
        np.savez(
            path,
            w=np.asarray(self.model.w),
            b=np.asarray(self.model.b),
            mean=np.asarray(self.model.mean),
            std=np.asarray(self.model.std),
            threshold=self.threshold,
        )

    def load(self, path: str) -> None:
        d = np.load(path if path.endswith(".npz") else path + ".npz")
        self.model = SVMModel(
            w=jnp.asarray(d["w"]), b=jnp.asarray(d["b"]),
            mean=jnp.asarray(d["mean"]), std=jnp.asarray(d["std"]),
        )
        self.threshold = float(d["threshold"])


def load_label_file(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Parse the reference's labelled dataset format:
    `id overlap alignability label` per line (data/labels/*.txt).

    Alignability is stored in [0, 1] in the files but the runtime feature is
    0-100 (alignabilityFilter returns 100*lambda_min/lambda_max), so it is
    scaled by 100 on load — exactly as the reference trainer does
    (classification/main.cpp:124 `training_data.col(1) = 100.0 * ...`)."""
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 4:
                rows.append((float(parts[1]), float(parts[2]), float(parts[3])))
    arr = np.asarray(rows, dtype=np.float32)
    if arr.size == 0:
        return np.zeros((0, 2), np.float32), np.zeros((0,), np.float32)
    features = arr[:, :2].copy()
    features[:, 1] *= 100.0
    return features, arr[:, 2]
