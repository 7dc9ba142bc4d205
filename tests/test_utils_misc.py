"""Tests for metrics, profiling, data_utils, and union_utils helpers."""
import pytest
import numpy as np
import jax.numpy as jnp

from tf_geometric_tpu.utils import metrics
from tf_geometric_tpu.utils.profiling import estimate_spmm_roofline, measure_step_time
from tf_geometric_tpu.utils.union_utils import convert_union_to_numpy, union_len


def test_accuracy_and_masked():
    preds = jnp.asarray([0, 1, 2, 2])
    labels = jnp.asarray([0, 1, 1, 2])
    assert abs(float(metrics.accuracy(preds, labels)) - 0.75) < 1e-6
    mask = jnp.asarray([1.0, 1.0, 0.0, 1.0])
    assert abs(float(metrics.masked_accuracy(preds, labels, mask)) - 1.0) < 1e-6


def test_micro_f1_multilabel():
    preds = jnp.asarray([[1, 0], [1, 1], [0, 0]])
    labels = jnp.asarray([[1, 0], [0, 1], [0, 1]])
    # tp=2, fp=1, fn=1 -> micro f1 = 2*2/(2*2+1+1) = 0.6667
    assert abs(float(metrics.micro_f1(preds, labels)) - 2 / 3) < 1e-4


def test_binary_auc_perfect_and_random():
    labels = jnp.asarray([0, 0, 1, 1])
    assert abs(float(metrics.binary_auc(jnp.asarray([.1, .2, .8, .9]), labels)) - 1.0) < 1e-6
    assert abs(float(metrics.binary_auc(jnp.asarray([.9, .8, .2, .1]), labels)) - 0.0) < 1e-6


def test_accumulator():
    acc = metrics.Accumulator()
    acc.update(1.0, weight=1.0)
    acc.update(3.0, weight=3.0)
    assert abs(acc.result() - 2.5) < 1e-6
    acc.reset()
    assert acc.result() == 0.0


def test_roofline_monotonic():
    # more features per row -> more bytes -> fewer edges/sec
    lo = estimate_spmm_roofline(1000, 100, 256)
    hi = estimate_spmm_roofline(1000, 100, 32)
    assert hi > lo > 0


def test_measure_step_time_chains():
    calls = []

    def step(x):
        calls.append(1)
        return (x + 1,)

    t = measure_step_time(step, (jnp.zeros(4),), lo=2, hi=4)
    assert isinstance(t, float)  # slope fit can be ~0 (even <0 noise) here
    assert len(calls) == 2 + 2 + 4  # warmup + lo + hi


def test_union_utils():
    assert union_len([1, 2, 3]) == 3
    assert union_len(np.zeros((5, 2))) == 5
    out = convert_union_to_numpy(jnp.asarray([1, 2]), np.float32)
    assert out.dtype == np.float32
    assert convert_union_to_numpy(None) is None


def test_function_makes_training_static():
    from tf_geometric_tpu.utils.jax_utils import function

    @function
    def f(x, training=False):
        if training:          # Python-level branch — needs static training
            return x * 2.0
        return x

    x = jnp.ones(3)
    np.testing.assert_allclose(np.asarray(f(x, training=True)), 2.0)
    np.testing.assert_allclose(np.asarray(f(x, training=False)), 1.0)


def test_function_forwards_jit_kwargs():
    from tf_geometric_tpu.utils.jax_utils import function

    @function(static_argnums=(1,))
    def g(x, n):
        return x.reshape(n, -1)

    assert g(jnp.ones(6), 2).shape == (2, 3)


def test_binary_auc_with_ties():
    from sklearn.metrics import roc_auc_score
    from tf_geometric_tpu.utils import metrics
    scores = np.array([0.5, 0.5, 0.5, 0.9, 0.1, 0.9])
    labels = np.array([1, 0, 1, 1, 0, 0])
    assert metrics.binary_auc(scores, labels) == pytest.approx(
        roc_auc_score(labels, scores), abs=1e-9)


def test_native_sort_fallback_matches_native_for_strays():
    from tf_geometric_tpu import native
    rows = np.array([-1, 0, 2, 1, 5, 0], np.int32)  # stray -1 and 5 (>num_rows sentinel region)
    if native.available():
        got_native = native.sort_by_row(rows, 4)
    real = native.available
    native.available = lambda: False
    try:
        import importlib
        got_numpy = native.sort_by_row(rows, 4)
    finally:
        native.available = real
    # numpy fallback must put strays in the trailing sentinel bucket too
    assert list(rows[got_numpy[-2:]]) in ([-1, 5], [5, -1]) or \
        set(rows[got_numpy[-2:]].tolist()) == {-1, 5}
    if native.available():
        np.testing.assert_array_equal(got_native, got_numpy)


def test_slow_host_path_warnings(monkeypatch):
    """The ragged O(N)-Python paths warn past the size threshold and point
    at their vectorized fixed-k replacements (VERDICT r1 #9)."""
    import warnings
    import pytest
    import importlib
    topk_mod = importlib.import_module("tf_geometric_tpu.nn.pool.topk_pool")
    from tf_geometric_tpu.utils import graph_utils as gu

    monkeypatch.setattr(topk_mod, "_SLOW_PATH_WARN_THRESHOLD", 4)
    monkeypatch.setattr(gu, "_SLOW_PATH_WARN_THRESHOLD", 4)

    src = np.array([0, 0, 1, 2, 3, 4, 5])
    score = np.arange(7, dtype=np.float32)
    with pytest.warns(RuntimeWarning, match="topk_pool_fixed"):
        topk_mod.topk_pool(src, score, k=1)

    ei = np.stack([np.arange(8) % 6, (np.arange(8) + 1) % 6]).astype(np.int32)
    sampler = gu.RandomNeighborSampler(ei, rng=0)
    with pytest.warns(RuntimeWarning, match="padding=True"):
        sampler.sample(k=2)
    # the vectorized fixed-k path stays silent at any size
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        sampler.sample(k=2, padding=True)


def test_split_hybrid_constants_matches_direct_path():
    """The hybrid constants/arguments jit mode (bench.py, Reddit bench) must
    reconstruct the exact pytree: an ELL-packed SpMM through split/rebuild
    equals the direct call, with index leaves as constants."""
    import jax

    from tf_geometric_tpu.nn.conv.gcn import (compute_cache_key, gcn_norm_adj,
                                              maybe_compile_ell)
    from tf_geometric_tpu.sparse import SparseMatrix
    from tf_geometric_tpu.utils.jax_utils import split_hybrid_constants

    rng = np.random.default_rng(0)
    n, e, f = 64, 256, 8
    edge_index = jnp.asarray(rng.integers(0, n, size=(2, e)).astype(np.int32))
    cache = {}
    normed = gcn_norm_adj(SparseMatrix(edge_index, None, (n, n)), cache=cache)
    adj = maybe_compile_ell(normed, cache,
                            compute_cache_key("both", True, True, True, False))
    x = jnp.asarray(rng.normal(size=(n, f)), jnp.float32)

    vals, rebuild = split_hybrid_constants(adj)
    assert all(jnp.issubdtype(v.dtype, jnp.floating) for v in vals)
    # rebuild must round-trip every leaf exactly
    import jax.tree_util as jtu
    for a, b in zip(jtu.tree_leaves(rebuild(vals)), jtu.tree_leaves(adj)):
        assert a.dtype == b.dtype and a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    direct = adj.matmul(x)

    @jax.jit
    def hybrid_matmul(vals_, x_):
        return rebuild(vals_).matmul(x_)

    np.testing.assert_allclose(np.asarray(hybrid_matmul(vals, x)),
                               np.asarray(direct), rtol=1e-6, atol=1e-6)
