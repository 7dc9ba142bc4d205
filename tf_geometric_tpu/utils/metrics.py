"""Metrics (the reference uses tf.keras.metrics.Accuracy/AUC + sklearn f1 in
demos, SURVEY §5): functional jit-friendly equivalents with a tiny stateful
accumulator for streaming evaluation loops."""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = ["accuracy", "masked_accuracy", "micro_f1", "binary_auc",
           "Accumulator"]


def accuracy(preds, labels):
    preds = jnp.asarray(preds)
    labels = jnp.asarray(labels)
    return jnp.mean((preds == labels).astype(jnp.float32))


def masked_accuracy(preds, labels, mask):
    mask = jnp.asarray(mask, jnp.float32)
    correct = (jnp.asarray(preds) == jnp.asarray(labels)).astype(jnp.float32)
    return jnp.sum(correct * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def micro_f1(preds, labels):
    """Multi-label micro-F1 over {0,1} arrays."""
    preds = np.asarray(preds).astype(bool)
    labels = np.asarray(labels).astype(bool)
    tp = (preds & labels).sum()
    fp = (preds & ~labels).sum()
    fn = (~preds & labels).sum()
    denom = 2 * tp + fp + fn
    return float(2 * tp / denom) if denom else 0.0


def binary_auc(scores, labels):
    """ROC-AUC via the rank statistic (no sklearn dependency needed)."""
    scores = np.asarray(scores, np.float64)
    labels = np.asarray(labels).astype(bool)
    n_pos = int(labels.sum())
    n_neg = len(labels) - n_pos
    if n_pos == 0 or n_neg == 0:
        return 0.5
    # vectorized midranks: equal scores share the mean of their 1-based rank
    # range (a python tie loop was O(n) interpreter iterations at Reddit scale)
    uniq, inverse, counts = np.unique(scores, return_inverse=True,
                                      return_counts=True)
    ends = np.cumsum(counts).astype(np.float64)          # last rank per group
    midranks = ends - (counts - 1) / 2.0                 # mean of the range
    ranks = midranks[inverse]
    pos_rank_sum = ranks[labels].sum()
    return float((pos_rank_sum - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


class Accumulator:
    """Streaming mean over batches: ``update(value, weight)`` → ``result()``."""

    def __init__(self):
        self.total = 0.0
        self.weight = 0.0

    def update(self, value, weight=1.0):
        self.total += float(value) * float(weight)
        self.weight += float(weight)

    def result(self) -> float:
        return self.total / self.weight if self.weight else 0.0

    def reset(self):
        self.total = self.weight = 0.0
