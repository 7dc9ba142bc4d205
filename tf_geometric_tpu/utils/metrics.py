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
    order = np.argsort(scores, kind="stable")
    ranks = np.empty(len(scores), np.float64)
    ranks[order] = np.arange(1, len(scores) + 1)
    # midrank ties
    sorted_scores = scores[order]
    i = 0
    while i < len(scores):
        j = i
        while j + 1 < len(scores) and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        if j > i:
            ranks[order[i:j + 1]] = (i + j + 2) / 2.0
        i = j + 1
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
