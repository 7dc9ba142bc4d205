"""TRUE parity tests: repo ops vs the ACTUAL reference library, executed.

Unlike the dense-oracle tests (tests/test_conv.py etc., which compare against
formulas written by the same author), these cases run the on-disk reference at
/root/reference under TF 2.21 via the pure-TF ``tf_sparse`` shim
(tests/tfref/) and assert per-op activation allclose on shared random inputs.

Fixture protocol (so the suite stays green without TF):
- Each case has a golden npz under tests/fixtures/golden_reference/ storing
  the exact inputs and the reference outputs.
- When the fixture exists it is used directly (no TF import).
- When it is missing (or TFG_REFERENCE_LIVE=1), the reference is imported and
  executed to (re)generate it; with TFG_REFERENCE_LIVE=1 a drift check also
  asserts the freshly-executed reference still matches the stored golden.

Reference anchors: nn/conv/gcn.py:32-130,225-291 ( gcn_norm_adj + gcn ),
nn/conv/gat.py:13-122, nn/conv/graph_sage.py, nn/conv/{appnp,sgc,ssgc,tagcn,
chebynet,gin,le_conv}.py, nn/pool/*.py, nn/kernel/*.py, utils/graph_utils.py.
"""
import functools
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "golden_reference")
LIVE = os.environ.get("TFG_REFERENCE_LIVE") == "1"

# ---------------------------------------------------------------------------
# shared input builders (all deterministic in `seed`)
# ---------------------------------------------------------------------------


def _graph(seed, n=24, e=70, f=8, sym=False, weighted=True):
    rng = np.random.RandomState(seed)
    ei = rng.randint(0, n, size=(2, e)).astype(np.int32)
    ew = (rng.uniform(0.5, 1.5, e).astype(np.float32) if weighted
          else np.ones(e, np.float32))
    if sym:
        ei = np.concatenate([ei, ei[::-1]], axis=1)
        ew = np.concatenate([ew, ew], axis=0)
    x = rng.randn(n, f).astype(np.float32)
    return x, ei, ew


def _batch_graph(seed, sizes=(8, 12, 10), f=6, edges_per_graph=20):
    rng = np.random.RandomState(seed)
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    n = int(offsets[-1])
    ei_parts, ngi_parts = [], []
    for g, sz in enumerate(sizes):
        local = rng.randint(0, sz, size=(2, edges_per_graph)).astype(np.int32)
        ei_parts.append(local + offsets[g])
        ngi_parts.append(np.full(sz, g, np.int32))
    ei = np.concatenate(ei_parts, axis=1)
    # dedupe: the reference's pooling path densifies through tf.SparseTensor
    # which rejects repeated coordinates (nn/pool/asap.py, min_cut_pool.py)
    ei = np.unique(ei, axis=1).astype(np.int32)
    ew = rng.uniform(0.5, 1.5, ei.shape[1]).astype(np.float32)
    ngi = np.concatenate(ngi_parts)
    x = rng.randn(n, f).astype(np.float32)
    return x, ei, ew, ngi


def _dense(rng, *shape):
    return rng.randn(*shape).astype(np.float32) * 0.5


def _lstm_weights(rng, input_dim, units):
    return (_dense(rng, input_dim, 4 * units), _dense(rng, units, 4 * units),
            (rng.randn(4 * units) * 0.1).astype(np.float32))


def _jax_lstm_step(W, U, b):
    """One Keras-gate-order (i,f,c,o) LSTM step in jax."""
    units = W.shape[1] // 4

    def step_full(carry, x_t):
        h, c = carry
        z = x_t @ W + h @ U + b
        i = jax.nn.sigmoid(z[:, :units])
        f = jax.nn.sigmoid(z[:, units:2 * units])
        g = jnp.tanh(z[:, 2 * units:3 * units])
        o = jax.nn.sigmoid(z[:, 3 * units:])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    return step_full


def _edges_to_dense(edge_index, edge_weight, num_rows, num_cols=None):
    """Canonical dense form for edge-list outputs (order/duplicate agnostic)."""
    num_cols = num_rows if num_cols is None else num_cols
    dense = np.zeros((int(num_rows), int(num_cols)), np.float64)
    ei = np.asarray(edge_index)
    ew = np.ones(ei.shape[1]) if edge_weight is None else np.asarray(edge_weight)
    np.add.at(dense, (ei[0], ei[1]), ew)
    return dense.astype(np.float32)


# ---------------------------------------------------------------------------
# case registry
# ---------------------------------------------------------------------------

CASES = {}


def case(name, rtol=1e-4, atol=1e-5):
    def deco(fn):
        CASES[name] = (fn, rtol, atol)
        return fn
    return deco


def _ref_modules():
    import tests.tfref as tfref
    tfg = tfref.load_reference()
    if tfg is None:
        pytest.skip("reference unavailable: {}".format(tfref.load_failure()))
    import tensorflow as tf
    import tf_sparse as tfs
    return tfg, tf, tfs


# ----- GCN family -----------------------------------------------------------

def _gcn_case(seed, norm, add_self_loop, sym, renorm, improved, splits=None):
    def build():
        x, ei, ew = _graph(seed, sym=(sym and norm == "both"))
        rng = np.random.RandomState(seed + 1)
        inputs = dict(x=x, ei=ei, ew=ew, w=_dense(rng, 8, 5),
                      b=(rng.randn(5) * 0.1).astype(np.float32))

        def ref(inp):
            tfg, tf, tfs = _ref_modules()
            n = inp["x"].shape[0]
            adj = tfs.SparseMatrix(inp["ei"], inp["ew"], [n, n])
            out = tfg.nn.gcn(tf.constant(inp["x"]), adj, tf.constant(inp["w"]),
                             tf.constant(inp["b"]), activation=tf.nn.relu,
                             norm=norm, add_self_loop=add_self_loop, sym=sym,
                             renorm=renorm, improved=improved,
                             num_or_size_splits=splits)
            return {"out": out.numpy()}

        def repo(inp):
            from tf_geometric_tpu import nn as tnn
            from tf_geometric_tpu.sparse import SparseMatrix
            n = inp["x"].shape[0]
            adj = SparseMatrix(inp["ei"], inp["ew"], (n, n))
            out = tnn.gcn(jnp.asarray(inp["x"]), adj, jnp.asarray(inp["w"]),
                          jnp.asarray(inp["b"]), activation=jax.nn.relu,
                          norm=norm, add_self_loop=add_self_loop, sym=sym,
                          renorm=renorm, improved=improved,
                          num_or_size_splits=splits)
            return {"out": np.asarray(out)}

        return inputs, ref, repo
    return build


for _name, _cfg in {
    "gcn_both_sl_renorm": ("both", True, True, True, False),
    "gcn_both_sl_norenorm": ("both", True, True, False, False),
    "gcn_both_sl_renorm_improved": ("both", True, True, True, True),
    "gcn_both_nosl": ("both", False, True, True, False),
    "gcn_both_asym": ("both", True, False, True, False),
    "gcn_left_sl": ("left", True, False, True, False),
    "gcn_left_nosl": ("left", False, False, True, False),
    "gcn_right_sl": ("right", True, False, True, False),
    "gcn_right_nosl": ("right", False, False, True, False),
}.items():
    case(_name)(_gcn_case(hash(_name) % 10000, *_cfg))

case("gcn_split_matmul")(_gcn_case(77, "both", True, True, True, False,
                                   splits=[2, 3]))


# ----- GAT ------------------------------------------------------------------

def _gat_case(seed, num_heads, split_value_heads):
    def build():
        x, ei, _ = _graph(seed, n=18, e=50, f=8)
        rng = np.random.RandomState(seed + 1)
        units = 6
        # reference layer convention (layers/conv/gat.py:74-79): with
        # split_value_heads=False the value kernel is [F, units*heads] and the
        # head mean yields [N, units]
        v_dim = units if split_value_heads else units * num_heads
        inputs = dict(x=x, ei=ei,
                      wq=_dense(rng, 8, units), bq=(rng.randn(units) * 0.1).astype(np.float32),
                      wk=_dense(rng, 8, units), bk=(rng.randn(units) * 0.1).astype(np.float32),
                      wv=_dense(rng, 8, v_dim),
                      b=(rng.randn(units) * 0.1).astype(np.float32))

        def ref(inp):
            tfg, tf, tfs = _ref_modules()
            out = tfg.nn.gat(tf.constant(inp["x"]), tf.constant(inp["ei"]),
                             inp["wq"], inp["bq"], tf.nn.relu,
                             inp["wk"], inp["bk"], tf.nn.relu,
                             inp["wv"], bias=inp["b"], activation=tf.nn.relu,
                             num_heads=num_heads,
                             split_value_heads=split_value_heads)
            return {"out": out.numpy()}

        def repo(inp):
            from tf_geometric_tpu import nn as tnn
            out = tnn.gat(jnp.asarray(inp["x"]), jnp.asarray(inp["ei"]),
                          jnp.asarray(inp["wq"]), jnp.asarray(inp["bq"]), jax.nn.relu,
                          jnp.asarray(inp["wk"]), jnp.asarray(inp["bk"]), jax.nn.relu,
                          jnp.asarray(inp["wv"]), bias=jnp.asarray(inp["b"]),
                          activation=jax.nn.relu, num_heads=num_heads,
                          split_value_heads=split_value_heads)
            return {"out": np.asarray(out)}

        return inputs, ref, repo
    return build


case("gat_h1", rtol=2e-4, atol=1e-5)(_gat_case(101, 1, True))
case("gat_h2_split", rtol=2e-4, atol=1e-5)(_gat_case(102, 2, True))
case("gat_h2_mean", rtol=2e-4, atol=1e-5)(_gat_case(103, 2, False))


# ----- GraphSAGE family -----------------------------------------------------

def _sage_case(seed, variant, concat=True, normalize=False):
    def build():
        x, ei, ew = _graph(seed, n=20, e=60, f=8)
        if variant in ("gcn", "mean_pool", "max_pool"):
            # the reference overwrites user weights with ones in these
            # variants (graph_sage.py:139-140,190-193,253-254 — the known
            # bug SURVEY says not to replicate); parity is scored on the
            # shared unit-weight semantics
            ew = np.ones_like(ew)
        if variant == "max_pool":
            # TF unsorted_segment_max fills no-in-edge nodes with float-min;
            # the TPU kernels zero-fill (padding discipline) — cover every
            # node so parity scores the shared semantics
            rng_c = np.random.RandomState(seed + 2)
            n = x.shape[0]
            cover = np.stack([np.arange(n, dtype=np.int32),
                              rng_c.permutation(n).astype(np.int32)])
            ei = np.concatenate([ei, cover], axis=1)
            ew = np.concatenate([ew, np.ones(n, np.float32)])
        rng = np.random.RandomState(seed + 1)
        u = 5
        inputs = dict(x=x, ei=ei, ew=ew,
                      w_self=_dense(rng, 8, u), w_neigh=_dense(rng, 8, u),
                      w_mlp=_dense(rng, 8, 8),
                      b_mlp=(rng.randn(8) * 0.1).astype(np.float32),
                      w_pool_neigh=_dense(rng, 8, u),
                      b=(rng.randn(2 * u if concat else u) * 0.1).astype(np.float32),
                      w_gcn=_dense(rng, 8, u))

        def ref(inp):
            tfg, tf, tfs = _ref_modules()
            gs = tfg.nn
            args = [tf.constant(inp["x"]), tf.constant(inp["ei"]), tf.constant(inp["ew"])]
            if variant == "mean":
                out = gs.mean_graph_sage(*args, inp["w_self"], inp["w_neigh"],
                                         bias=inp["b"], activation=tf.nn.relu,
                                         concat=concat, normalize=normalize)
            elif variant == "sum":
                out = gs.sum_graph_sage(*args, inp["w_self"], inp["w_neigh"],
                                        bias=inp["b"], activation=tf.nn.relu,
                                        concat=concat, normalize=normalize)
            elif variant == "mean_pool":
                out = gs.mean_pool_graph_sage(*args, inp["w_self"], inp["w_mlp"],
                                              inp["w_pool_neigh"],
                                              neighbor_mlp_bias=inp["b_mlp"],
                                              bias=inp["b"], activation=tf.nn.relu,
                                              concat=concat, normalize=normalize)
            elif variant == "max_pool":
                out = gs.max_pool_graph_sage(*args, inp["w_self"], inp["w_mlp"],
                                             inp["w_pool_neigh"],
                                             neighbor_mlp_bias=inp["b_mlp"],
                                             bias=inp["b"], activation=tf.nn.relu,
                                             concat=concat, normalize=normalize)
            elif variant == "gcn":
                # NOTE: reference gcn_graph_sage passes `cache` POSITIONALLY
                # into gcn_norm_edge's `renorm` slot (graph_sage.py:141); all
                # live call paths hand it a falsy value, so the executed
                # semantics are renorm=False — which the repo replicates.
                out = gs.gcn_graph_sage(*args, inp["w_gcn"], bias=None,
                                        activation=tf.nn.relu, normalize=normalize)
            return {"out": out.numpy()}

        def repo(inp):
            from tf_geometric_tpu import nn as tnn
            args = [jnp.asarray(inp["x"]), jnp.asarray(inp["ei"]), jnp.asarray(inp["ew"])]
            if variant == "mean":
                out = tnn.mean_graph_sage(*args, jnp.asarray(inp["w_self"]),
                                          jnp.asarray(inp["w_neigh"]),
                                          bias=jnp.asarray(inp["b"]), activation=jax.nn.relu,
                                          concat=concat, normalize=normalize)
            elif variant == "sum":
                out = tnn.sum_graph_sage(*args, jnp.asarray(inp["w_self"]),
                                         jnp.asarray(inp["w_neigh"]),
                                         bias=jnp.asarray(inp["b"]), activation=jax.nn.relu,
                                         concat=concat, normalize=normalize)
            elif variant == "mean_pool":
                out = tnn.mean_pool_graph_sage(*args, jnp.asarray(inp["w_self"]),
                                               jnp.asarray(inp["w_mlp"]),
                                               jnp.asarray(inp["w_pool_neigh"]),
                                               neighbor_mlp_bias=jnp.asarray(inp["b_mlp"]),
                                               bias=jnp.asarray(inp["b"]),
                                               activation=jax.nn.relu,
                                               concat=concat, normalize=normalize)
            elif variant == "max_pool":
                out = tnn.max_pool_graph_sage(*args, jnp.asarray(inp["w_self"]),
                                              jnp.asarray(inp["w_mlp"]),
                                              jnp.asarray(inp["w_pool_neigh"]),
                                              neighbor_mlp_bias=jnp.asarray(inp["b_mlp"]),
                                              bias=jnp.asarray(inp["b"]),
                                              activation=jax.nn.relu,
                                              concat=concat, normalize=normalize)
            elif variant == "gcn":
                out = tnn.gcn_graph_sage(*args, jnp.asarray(inp["w_gcn"]), bias=None,
                                         activation=jax.nn.relu, normalize=normalize)
            return {"out": np.asarray(out)}

        return inputs, ref, repo
    return build


case("sage_mean_concat")(_sage_case(201, "mean"))
case("sage_mean_add_norm")(_sage_case(202, "mean", concat=False, normalize=True))
case("sage_sum")(_sage_case(203, "sum"))
case("sage_mean_pool")(_sage_case(204, "mean_pool"))
case("sage_max_pool")(_sage_case(205, "max_pool"))
case("sage_gcn")(_sage_case(206, "gcn", normalize=True))


@case("sage_lstm", rtol=2e-4, atol=1e-5)
def _case_sage_lstm():
    seed = 207
    x, ei, _ = _graph(seed, n=16, e=48, f=6)
    rng = np.random.RandomState(seed + 1)
    units = 6
    W, U, b = _lstm_weights(rng, 6, units)
    inputs = dict(x=x, ei=ei, W=W, U=U, b=b,
                  w_self=_dense(rng, 6, 4), w_neigh=_dense(rng, units, 4))

    def ref(inp):
        tfg, tf, tfs = _ref_modules()
        lstm = tf.keras.layers.LSTM(units, return_sequences=True)
        lstm.build((None, None, 6))
        lstm.set_weights([inp["W"], inp["U"], inp["b"]])
        out = tfg.nn.lstm_graph_sage(tf.constant(inp["x"]), tf.constant(inp["ei"]),
                                     lstm, inp["w_self"], inp["w_neigh"],
                                     activation=tf.nn.relu)
        return {"out": out.numpy()}

    def repo(inp):
        from tf_geometric_tpu import nn as tnn
        step = _jax_lstm_step(jnp.asarray(inp["W"]), jnp.asarray(inp["U"]),
                              jnp.asarray(inp["b"]))

        def lstm(seq, training=False):  # [N, K, F] -> [N, K, H]
            n = seq.shape[0]
            carry = (jnp.zeros((n, units), seq.dtype), jnp.zeros((n, units), seq.dtype))
            _, hs = jax.lax.scan(step, carry, jnp.transpose(seq, (1, 0, 2)))
            return jnp.transpose(hs, (1, 0, 2))

        out = tnn.lstm_graph_sage(jnp.asarray(inp["x"]), jnp.asarray(inp["ei"]),
                                  lstm, jnp.asarray(inp["w_self"]),
                                  jnp.asarray(inp["w_neigh"]), activation=jax.nn.relu)
        return {"out": np.asarray(out)}

    return inputs, ref, repo


# ----- propagation family ---------------------------------------------------

@case("appnp")
def _case_appnp():
    seed = 301
    x, ei, ew = _graph(seed, sym=True)
    rng = np.random.RandomState(seed + 1)
    inputs = dict(x=x, ei=ei, ew=ew, w0=_dense(rng, 8, 12), b0=np.zeros(12, np.float32),
                  w1=_dense(rng, 12, 4), b1=np.zeros(4, np.float32))

    def ref(inp):
        tfg, tf, tfs = _ref_modules()
        out = tfg.nn.appnp(tf.constant(inp["x"]), tf.constant(inp["ei"]),
                           tf.constant(inp["ew"]), [inp["w0"], inp["w1"]],
                           [inp["b0"], inp["b1"]], dense_activation=tf.nn.relu,
                           activation=None, k=10, alpha=0.1, training=False)
        return {"out": out.numpy()}

    def repo(inp):
        from tf_geometric_tpu import nn as tnn
        out = tnn.appnp(jnp.asarray(inp["x"]), jnp.asarray(inp["ei"]),
                        jnp.asarray(inp["ew"]),
                        [jnp.asarray(inp["w0"]), jnp.asarray(inp["w1"])],
                        [jnp.asarray(inp["b0"]), jnp.asarray(inp["b1"])],
                        dense_activation=jax.nn.relu, activation=None,
                        k=10, alpha=0.1, training=False)
        return {"out": np.asarray(out)}

    return inputs, ref, repo


@case("sgc_k2")
def _case_sgc():
    seed = 302
    x, ei, ew = _graph(seed, sym=True)
    rng = np.random.RandomState(seed + 1)
    inputs = dict(x=x, ei=ei, ew=ew, w=_dense(rng, 8, 4),
                  b=(rng.randn(4) * 0.1).astype(np.float32))

    def ref(inp):
        tfg, tf, tfs = _ref_modules()
        out = tfg.nn.sgc(tf.constant(inp["x"]), tf.constant(inp["ei"]),
                         tf.constant(inp["ew"]), 2, inp["w"], bias=inp["b"],
                         activation=tf.nn.relu)
        return {"out": out.numpy()}

    def repo(inp):
        from tf_geometric_tpu import nn as tnn
        out = tnn.sgc(jnp.asarray(inp["x"]), jnp.asarray(inp["ei"]),
                      jnp.asarray(inp["ew"]), 2, jnp.asarray(inp["w"]),
                      bias=jnp.asarray(inp["b"]), activation=jax.nn.relu)
        return {"out": np.asarray(out)}

    return inputs, ref, repo


@case("ssgc_k5")
def _case_ssgc():
    seed = 303
    x, ei, ew = _graph(seed, sym=True)
    rng = np.random.RandomState(seed + 1)
    inputs = dict(x=x, ei=ei, ew=ew, w0=_dense(rng, 8, 10), b0=np.zeros(10, np.float32),
                  w1=_dense(rng, 10, 4), b1=np.zeros(4, np.float32))

    def ref(inp):
        tfg, tf, tfs = _ref_modules()
        out = tfg.nn.ssgc(tf.constant(inp["x"]), tf.constant(inp["ei"]),
                          tf.constant(inp["ew"]), kernels=[inp["w0"], inp["w1"]],
                          biases=[inp["b0"], inp["b1"]], k=5, alpha=0.1,
                          dense_activation=tf.nn.relu, training=False)
        return {"out": out.numpy()}

    def repo(inp):
        from tf_geometric_tpu import nn as tnn
        out = tnn.ssgc(jnp.asarray(inp["x"]), jnp.asarray(inp["ei"]),
                       jnp.asarray(inp["ew"]),
                       kernels=[jnp.asarray(inp["w0"]), jnp.asarray(inp["w1"])],
                       biases=[jnp.asarray(inp["b0"]), jnp.asarray(inp["b1"])],
                       k=5, alpha=0.1, dense_activation=jax.nn.relu, training=False)
        return {"out": np.asarray(out)}

    return inputs, ref, repo


@case("tagcn_k3")
def _case_tagcn():
    seed = 304
    x, ei, ew = _graph(seed, sym=True)
    rng = np.random.RandomState(seed + 1)
    inputs = dict(x=x, ei=ei, ew=ew, w=_dense(rng, 8 * 4, 4),
                  b=(rng.randn(4) * 0.1).astype(np.float32))

    def ref(inp):
        tfg, tf, tfs = _ref_modules()
        out = tfg.nn.tagcn(tf.constant(inp["x"]), tf.constant(inp["ei"]),
                           tf.constant(inp["ew"]), 3, inp["w"], bias=inp["b"],
                           activation=tf.nn.relu)
        return {"out": out.numpy()}

    def repo(inp):
        from tf_geometric_tpu import nn as tnn
        out = tnn.tagcn(jnp.asarray(inp["x"]), jnp.asarray(inp["ei"]),
                        jnp.asarray(inp["ew"]), 3, jnp.asarray(inp["w"]),
                        bias=jnp.asarray(inp["b"]), activation=jax.nn.relu)
        return {"out": np.asarray(out)}

    return inputs, ref, repo


def _chebynet_case(seed, normalization_type, use_dynamic_lambda_max):
    def build():
        x, ei, ew = _graph(seed, n=30, e=90, f=8, sym=True)
        rng = np.random.RandomState(seed + 1)
        k = 3
        inputs = dict(x=x, ei=ei, ew=ew,
                      **{"w{}".format(i): _dense(rng, 8, 4) for i in range(k)},
                      b=(rng.randn(4) * 0.1).astype(np.float32))

        def ref(inp):
            tfg, tf, tfs = _ref_modules()
            kernels = [tf.constant(inp["w{}".format(i)]) for i in range(k)]
            out = tfg.nn.chebynet(tf.constant(inp["x"]), tf.constant(inp["ei"]),
                                  tf.constant(inp["ew"]), k, kernels, bias=inp["b"],
                                  activation=tf.nn.relu,
                                  normalization_type=normalization_type,
                                  use_dynamic_lambda_max=use_dynamic_lambda_max)
            return {"out": out.numpy()}

        def repo(inp):
            from tf_geometric_tpu import nn as tnn
            kernels = [jnp.asarray(inp["w{}".format(i)]) for i in range(k)]
            out = tnn.chebynet(jnp.asarray(inp["x"]), jnp.asarray(inp["ei"]),
                               jnp.asarray(inp["ew"]), k, kernels,
                               bias=jnp.asarray(inp["b"]), activation=jax.nn.relu,
                               normalization_type=normalization_type,
                               use_dynamic_lambda_max=use_dynamic_lambda_max)
            return {"out": np.asarray(out)}

        return inputs, ref, repo
    return build


case("chebynet_sym")(_chebynet_case(305, "sym", False))
case("chebynet_rw")(_chebynet_case(306, "rw", False))
case("chebynet_sym_dynamic", rtol=5e-4, atol=5e-5)(_chebynet_case(307, "sym", True))


@case("gin")
def _case_gin():
    seed = 308
    x, ei, _ = _graph(seed)
    rng = np.random.RandomState(seed + 1)
    inputs = dict(x=x, ei=ei, w0=_dense(rng, 8, 10), b0=(rng.randn(10) * 0.1).astype(np.float32),
                  w1=_dense(rng, 10, 4), b1=(rng.randn(4) * 0.1).astype(np.float32))

    def ref(inp):
        tfg, tf, tfs = _ref_modules()

        def mlp(h, training=None):
            return tf.nn.relu(h @ inp["w0"] + inp["b0"]) @ inp["w1"] + inp["b1"]

        out = tfg.nn.gin(tf.constant(inp["x"]), tf.constant(inp["ei"]), mlp, eps=0.3)
        return {"out": out.numpy()}

    def repo(inp):
        from tf_geometric_tpu import nn as tnn

        def mlp(h, training=None):
            return jax.nn.relu(h @ inp["w0"] + inp["b0"]) @ inp["w1"] + inp["b1"]

        out = tnn.gin(jnp.asarray(inp["x"]), jnp.asarray(inp["ei"]), mlp, eps=0.3)
        return {"out": np.asarray(out)}

    return inputs, ref, repo


@case("le_conv")
def _case_le_conv():
    seed = 309
    x, ei, ew = _graph(seed)
    rng = np.random.RandomState(seed + 1)
    u = 4
    inputs = dict(x=x, ei=ei, ew=ew,
                  ws=_dense(rng, 8, u), bs=(rng.randn(u) * 0.1).astype(np.float32),
                  was=_dense(rng, 8, u), bas=(rng.randn(u) * 0.1).astype(np.float32),
                  wan=_dense(rng, 8, u), ban=(rng.randn(u) * 0.1).astype(np.float32))

    def ref(inp):
        tfg, tf, tfs = _ref_modules()
        out = tfg.nn.le_conv(tf.constant(inp["x"]), tf.constant(inp["ei"]),
                             tf.constant(inp["ew"]),
                             inp["ws"], inp["bs"], inp["was"], inp["bas"],
                             inp["wan"], inp["ban"], activation=tf.nn.sigmoid)
        return {"out": out.numpy()}

    def repo(inp):
        from tf_geometric_tpu import nn as tnn
        out = tnn.le_conv(jnp.asarray(inp["x"]), jnp.asarray(inp["ei"]),
                          jnp.asarray(inp["ew"]),
                          jnp.asarray(inp["ws"]), jnp.asarray(inp["bs"]),
                          jnp.asarray(inp["was"]), jnp.asarray(inp["bas"]),
                          jnp.asarray(inp["wan"]), jnp.asarray(inp["ban"]),
                          activation=jax.nn.sigmoid)
        return {"out": np.asarray(out)}

    return inputs, ref, repo


# ----- pooling --------------------------------------------------------------

@case("common_pools")
def _case_common_pools():
    x, _, _, ngi = _batch_graph(401)
    inputs = dict(x=x, ngi=ngi)

    def ref(inp):
        tfg, tf, tfs = _ref_modules()
        from tf_geometric.nn.pool.common_pool import mean_pool, sum_pool, max_pool, min_pool
        xs, gi = tf.constant(inp["x"]), tf.constant(inp["ngi"])
        return {"mean": mean_pool(xs, gi).numpy(), "sum": sum_pool(xs, gi).numpy(),
                "max": max_pool(xs, gi).numpy(), "min": min_pool(xs, gi).numpy()}

    def repo(inp):
        from tf_geometric_tpu import nn as tnn
        xs, gi = jnp.asarray(inp["x"]), jnp.asarray(inp["ngi"])
        return {"mean": np.asarray(tnn.mean_pool(xs, gi)),
                "sum": np.asarray(tnn.sum_pool(xs, gi)),
                "max": np.asarray(tnn.max_pool(xs, gi)),
                "min": np.asarray(tnn.min_pool(xs, gi))}

    return inputs, ref, repo


def _topk_case(seed, k, ratio):
    def build():
        x, _, _, ngi = _batch_graph(seed)
        rng = np.random.RandomState(seed + 1)
        score = rng.randn(x.shape[0]).astype(np.float32)
        inputs = dict(ngi=ngi, score=score)

        def ref(inp):
            tfg, tf, tfs = _ref_modules()
            from tf_geometric.nn.pool.topk_pool import topk_pool
            idx = topk_pool(tf.constant(inp["ngi"]), tf.constant(inp["score"]),
                            k=k, ratio=ratio)
            return {"idx": np.sort(idx.numpy())}

        def repo(inp):
            from tf_geometric_tpu.nn.pool.topk_pool import topk_pool
            idx = topk_pool(inp["ngi"], inp["score"], k=k, ratio=ratio)
            return {"idx": np.sort(np.asarray(idx))}

        return inputs, ref, repo
    return build


case("topk_pool_k3")(_topk_case(402, 3, None))
case("topk_pool_ratio")(_topk_case(403, None, 0.5))


@case("cluster_pool")
def _case_cluster_pool():
    seed = 404
    x, ei, ew = _graph(seed, n=20, e=60, f=6)
    rng = np.random.RandomState(seed + 1)
    C = 4
    assign_ei = np.stack([np.arange(20, dtype=np.int32),
                          rng.randint(0, C, 20).astype(np.int32)])
    assign_ew = rng.rand(20).astype(np.float32)
    inputs = dict(x=x, ei=ei, ew=ew, aei=assign_ei, aew=assign_ew)

    def ref(inp):
        tfg, tf, tfs = _ref_modules()
        from tf_geometric.nn.pool.cluster_pool import cluster_pool
        px, pei, pew = cluster_pool(tf.constant(inp["x"]), tf.constant(inp["ei"]),
                                    tf.constant(inp["ew"]), tf.constant(inp["aei"]),
                                    tf.constant(inp["aew"]), C, num_nodes=20)
        return {"px": px.numpy(),
                "adj": _edges_to_dense(pei.numpy(), pew.numpy(), C)}

    def repo(inp):
        from tf_geometric_tpu.nn.pool.cluster_pool import cluster_pool
        px, pei, pew = cluster_pool(jnp.asarray(inp["x"]), jnp.asarray(inp["ei"]),
                                    jnp.asarray(inp["ew"]), jnp.asarray(inp["aei"]),
                                    jnp.asarray(inp["aew"]), C, num_nodes=20)
        return {"px": np.asarray(px),
                "adj": _edges_to_dense(np.asarray(pei), np.asarray(pew), C)}

    return inputs, ref, repo


@case("diff_pool_coarsen")
def _case_diff_pool_coarsen():
    seed = 405
    x, ei, ew, ngi = _batch_graph(seed)
    rng = np.random.RandomState(seed + 1)
    C = 3
    logits = rng.randn(x.shape[0], C).astype(np.float32)
    assign = (np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)).astype(np.float32)
    G = int(ngi.max()) + 1
    inputs = dict(x=x, ei=ei, ew=ew, ngi=ngi, assign=assign)

    def ref(inp):
        tfg, tf, tfs = _ref_modules()
        from tf_geometric.nn.pool.diff_pool import diff_pool_coarsen
        px, pei, pew, pngi = diff_pool_coarsen(
            tf.constant(inp["x"]), tf.constant(inp["ei"]), tf.constant(inp["ew"]),
            tf.constant(inp["ngi"]), tf.constant(inp["assign"]))
        return {"px": px.numpy(), "pngi": pngi.numpy().astype(np.int32),
                "adj": _edges_to_dense(pei.numpy(), pew.numpy(), C * G)}

    def repo(inp):
        from tf_geometric_tpu.nn.pool.diff_pool import diff_pool_coarsen
        px, pei, pew, pngi = diff_pool_coarsen(
            jnp.asarray(inp["x"]), jnp.asarray(inp["ei"]), jnp.asarray(inp["ew"]),
            jnp.asarray(inp["ngi"]), jnp.asarray(inp["assign"]))
        return {"px": np.asarray(px), "pngi": np.asarray(pngi).astype(np.int32),
                "adj": _edges_to_dense(np.asarray(pei), np.asarray(pew), C * G)}

    return inputs, ref, repo


@case("min_cut_coarsen")
def _case_min_cut_coarsen():
    seed = 406
    x, ei, ew, ngi = _batch_graph(seed)
    rng = np.random.RandomState(seed + 1)
    C = 3
    logits = rng.randn(x.shape[0], C).astype(np.float32)
    assign = (np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)).astype(np.float32)
    G = int(ngi.max()) + 1
    inputs = dict(x=x, ei=ei, ew=ew, ngi=ngi, assign=assign)

    def ref(inp):
        tfg, tf, tfs = _ref_modules()
        from tf_geometric.nn.pool.min_cut_pool import min_cut_pool_coarsen
        px, pei, pew, pngi = min_cut_pool_coarsen(
            tf.constant(inp["x"]), tf.constant(inp["ei"]), tf.constant(inp["ew"]),
            tf.constant(inp["ngi"]), tf.constant(inp["assign"]))
        return {"px": px.numpy(), "pngi": pngi.numpy().astype(np.int32),
                "adj": _edges_to_dense(pei.numpy(), pew.numpy(), C * G)}

    def repo(inp):
        from tf_geometric_tpu.nn.pool.min_cut_pool import min_cut_pool_coarsen
        px, pei, pew, pngi = min_cut_pool_coarsen(
            jnp.asarray(inp["x"]), jnp.asarray(inp["ei"]), jnp.asarray(inp["ew"]),
            jnp.asarray(inp["ngi"]), jnp.asarray(inp["assign"]))
        return {"px": np.asarray(px), "pngi": np.asarray(pngi).astype(np.int32),
                "adj": _edges_to_dense(np.asarray(pei), np.asarray(pew), C * G)}

    return inputs, ref, repo


@case("min_cut_losses", rtol=1e-4, atol=1e-5)
def _case_min_cut_losses():
    seed = 407
    x, ei, ew, ngi = _batch_graph(seed)
    rng = np.random.RandomState(seed + 1)
    C = 3
    logits = rng.randn(x.shape[0], C).astype(np.float32)
    assign = (np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)).astype(np.float32)
    inputs = dict(ei=ei, ew=ew, ngi=ngi, assign=assign)

    def ref(inp):
        tfg, tf, tfs = _ref_modules()
        from tf_geometric.nn.pool.min_cut_pool import min_cut_pool_compute_losses
        cut, orth = min_cut_pool_compute_losses(
            tf.constant(inp["ei"]), tf.constant(inp["ew"]), tf.constant(inp["ngi"]),
            tf.constant(inp["assign"]))
        return {"cut": np.float32(cut.numpy()), "orth": np.float32(orth.numpy())}

    def repo(inp):
        from tf_geometric_tpu.nn.pool.min_cut_pool import min_cut_pool_compute_losses
        cut, orth = min_cut_pool_compute_losses(
            jnp.asarray(inp["ei"]), jnp.asarray(inp["ew"]), jnp.asarray(inp["ngi"]),
            jnp.asarray(inp["assign"]))
        return {"cut": np.float32(cut), "orth": np.float32(orth)}

    return inputs, ref, repo


@case("sag_pool_ratio")
def _case_sag_pool():
    seed = 408
    x, ei, ew, ngi = _batch_graph(seed)
    rng = np.random.RandomState(seed + 1)
    w_score = _dense(rng, x.shape[1], 1)
    n = x.shape[0]
    inputs = dict(x=x, ei=ei, ew=ew, ngi=ngi, w=w_score)

    def ref(inp):
        tfg, tf, tfs = _ref_modules()
        from tf_geometric.nn.pool.sag_pool import sag_pool

        def score_gnn(args, training=None):
            return args[0] @ inp["w"]

        px, pei, pew, pngi = sag_pool(tf.constant(inp["x"]), tf.constant(inp["ei"]),
                                      tf.constant(inp["ew"]), tf.constant(inp["ngi"]),
                                      score_gnn, ratio=0.5,
                                      score_activation=tf.nn.tanh)
        return {"px": px.numpy(), "pngi": pngi.numpy().astype(np.int32),
                "adj": _edges_to_dense(pei.numpy(), pew.numpy(), px.shape[0])}

    def repo(inp):
        from tf_geometric_tpu.nn.pool.sag_pool import sag_pool

        def score_gnn(args, training=None):
            return jnp.asarray(args[0]) @ inp["w"]

        px, pei, pew, pngi = sag_pool(jnp.asarray(inp["x"]), jnp.asarray(inp["ei"]),
                                      jnp.asarray(inp["ew"]), jnp.asarray(inp["ngi"]),
                                      score_gnn, ratio=0.5,
                                      score_activation=jnp.tanh)
        return {"px": np.asarray(px), "pngi": np.asarray(pngi).astype(np.int32),
                "adj": _edges_to_dense(np.asarray(pei), np.asarray(pew), px.shape[0])}

    return inputs, ref, repo


@case("sort_pool")
def _case_sort_pool():
    seed = 409
    x, ei, ew, ngi = _batch_graph(seed)
    inputs = dict(x=x, ei=ei, ew=ew, ngi=ngi)

    def ref(inp):
        tfg, tf, tfs = _ref_modules()
        from tf_geometric.nn.pool.sort_pool import sort_pool
        px, pei, pew, pngi = sort_pool(tf.constant(inp["x"]), tf.constant(inp["ei"]),
                                       tf.constant(inp["ew"]), tf.constant(inp["ngi"]),
                                       ratio=0.5, sort_index=-1)
        return {"px": px.numpy(), "pngi": pngi.numpy().astype(np.int32),
                "adj": _edges_to_dense(pei.numpy(), pew.numpy(), px.shape[0])}

    def repo(inp):
        from tf_geometric_tpu.nn.pool.sort_pool import sort_pool
        px, pei, pew, pngi = sort_pool(jnp.asarray(inp["x"]), jnp.asarray(inp["ei"]),
                                       jnp.asarray(inp["ew"]), jnp.asarray(inp["ngi"]),
                                       ratio=0.5, sort_index=-1)
        return {"px": np.asarray(px), "pngi": np.asarray(pngi).astype(np.int32),
                "adj": _edges_to_dense(np.asarray(pei), np.asarray(pew), px.shape[0])}

    return inputs, ref, repo


@case("set2set", rtol=2e-4, atol=1e-5)
def _case_set2set():
    seed = 410
    x, _, _, ngi = _batch_graph(seed)
    rng = np.random.RandomState(seed + 1)
    units = x.shape[1]
    W, U, b = _lstm_weights(rng, units * 2, units)
    inputs = dict(x=x, ngi=ngi, W=W, U=U, b=b)

    def ref(inp):
        tfg, tf, tfs = _ref_modules()
        lstm = tf.keras.layers.LSTM(units, return_sequences=True, return_state=True)
        lstm.build((None, None, units * 2))
        lstm.set_weights([inp["W"], inp["U"], inp["b"]])
        out = tfg.nn.set2set(tf.constant(inp["x"]), tf.constant(inp["ngi"]), lstm, 3)
        return {"out": out.numpy()}

    def repo(inp):
        from tf_geometric_tpu.nn.pool.set2set import set2set
        step = _jax_lstm_step(jnp.asarray(inp["W"]), jnp.asarray(inp["U"]),
                              jnp.asarray(inp["b"]))

        def lstm(h, state):
            # Match the reference quirk (nn/pool/set2set.py:29-33): graphs are
            # TIME steps with batch 1, state persists across iterations.
            if state is None:
                state = (jnp.zeros((1, units), h.dtype), jnp.zeros((1, units), h.dtype))
            carry, hs = jax.lax.scan(step, state, h[:, None, :])
            return hs[:, 0, :], carry

        out = set2set(jnp.asarray(inp["x"]), jnp.asarray(inp["ngi"]), lstm, 3)
        return {"out": np.asarray(out)}

    return inputs, ref, repo


@case("asap", rtol=5e-4, atol=5e-5)
def _case_asap():
    seed = 411
    x, ei, ew, ngi = _batch_graph(seed)
    rng = np.random.RandomState(seed + 1)
    f = x.shape[1]
    u = f  # attention gcn keeps feature dim for the LeConv scoring
    inputs = dict(
        x=x, ei=ei, ew=ew, ngi=ngi,
        att_gcn_w=_dense(rng, f, u), att_gcn_b=(rng.randn(u) * 0.1).astype(np.float32),
        att_q_w=_dense(rng, u, u), att_q_b=(rng.randn(u) * 0.1).astype(np.float32),
        att_s_w=_dense(rng, 2 * u, 1), att_s_b=(rng.randn(1) * 0.1).astype(np.float32),
        le_s_w=_dense(rng, u, 1), le_s_b=(rng.randn(1) * 0.1).astype(np.float32),
        le_as_w=_dense(rng, u, 1), le_as_b=(rng.randn(1) * 0.1).astype(np.float32),
        le_an_w=_dense(rng, u, 1), le_an_b=(rng.randn(1) * 0.1).astype(np.float32))

    def ref(inp):
        tfg, tf, tfs = _ref_modules()
        import tf_geometric.nn.pool.asap as ref_asap_mod
        from tf_geometric.nn.pool.asap import asap

        # The reference's asap calls gcn with the PRE-tf_sparse positional
        # signature gcn(x, edge_index, edge_weight, kernel, bias) (asap.py:54)
        # which raises under its own refactored gcn(x, sparse_adj, kernel,...)
        # (gcn.py:225) — verified by test_reference_asap_incompatible below.
        # Repair it with a compat wrapper expressing the intended call so the
        # rest of asap can be parity-checked.
        real_gcn = ref_asap_mod.gcn
        real_cluster_pool = ref_asap_mod.cluster_pool

        def gcn_compat(x, edge_index, edge_weight, kernel, bias, cache=None):
            n = int(tf.shape(x)[0])
            adj = tfs.SparseMatrix(edge_index, edge_weight, [n, n])
            return real_gcn(x, adj, kernel, bias, cache=cache)

        def cluster_pool_compat(x, ei, ew, aei, aew, num_clusters, num_nodes=None):
            # asap builds assign edges as (cluster, node) (asap.py:110-116)
            # while cluster_pool expects (node, cluster) (cluster_pool.py:16,
            # used that way by diff_pool) — a second API break; flip to the
            # expected orientation.
            return real_cluster_pool(x, ei, ew, tf.stack([aei[1], aei[0]], axis=0),
                                     aew, num_clusters, num_nodes=num_nodes)

        ref_asap_mod.gcn = gcn_compat
        ref_asap_mod.cluster_pool = cluster_pool_compat
        try:
            outs = _run_ref_asap(asap, tf, inp)
        finally:
            ref_asap_mod.gcn = real_gcn
            ref_asap_mod.cluster_pool = real_cluster_pool
        px, pei, pew, pngi = outs
        return {"px": px.numpy(), "pngi": pngi.numpy().astype(np.int32),
                "adj": _edges_to_dense(pei.numpy(), pew.numpy(), px.shape[0])}

    def _run_ref_asap(asap, tf, inp):
        return asap(tf.constant(inp["x"]), tf.constant(inp["ei"]),
                    tf.constant(inp["ew"]), tf.constant(inp["ngi"]),
                    inp["att_gcn_w"], inp["att_gcn_b"], inp["att_q_w"], inp["att_q_b"],
                    inp["att_s_w"], inp["att_s_b"], inp["le_s_w"], inp["le_s_b"],
                    inp["le_as_w"], inp["le_as_b"], inp["le_an_w"], inp["le_an_b"],
                    ratio=0.5, drop_rate=0.0, training=False)

    def repo(inp):
        from tf_geometric_tpu.nn.pool.asap import asap
        outs = asap(jnp.asarray(inp["x"]), jnp.asarray(inp["ei"]),
                    jnp.asarray(inp["ew"]), jnp.asarray(inp["ngi"]),
                    jnp.asarray(inp["att_gcn_w"]), jnp.asarray(inp["att_gcn_b"]),
                    jnp.asarray(inp["att_q_w"]), jnp.asarray(inp["att_q_b"]),
                    jnp.asarray(inp["att_s_w"]), jnp.asarray(inp["att_s_b"]),
                    jnp.asarray(inp["le_s_w"]), jnp.asarray(inp["le_s_b"]),
                    jnp.asarray(inp["le_as_w"]), jnp.asarray(inp["le_as_b"]),
                    jnp.asarray(inp["le_an_w"]), jnp.asarray(inp["le_an_b"]),
                    ratio=0.5, drop_rate=0.0, training=False)
        px, pei, pew, pngi = outs
        return {"px": np.asarray(px), "pngi": np.asarray(pngi).astype(np.int32),
                "adj": _edges_to_dense(np.asarray(pei), np.asarray(pew), px.shape[0])}

    return inputs, ref, repo


# ----- kernel + utils -------------------------------------------------------

@case("aggregate_neighbors")
def _case_aggregate():
    seed = 501
    x, ei, ew = _graph(seed)
    # give every node >=1 in-edge: TF's unsorted_segment_max fills empty
    # segments with float-min while the TPU kernels zero-fill (padding
    # discipline, _segment_core.py) — a deliberate deviation we don't score.
    rng = np.random.RandomState(seed + 2)
    n = x.shape[0]
    cover = np.stack([np.arange(n, dtype=np.int32),
                      rng.permutation(n).astype(np.int32)])
    ei = np.concatenate([ei, cover], axis=1)
    ew = np.concatenate([ew, rng.uniform(0.5, 1.5, n).astype(np.float32)])
    inputs = dict(x=x, ei=ei, ew=ew)

    def ref(inp):
        tfg, tf, tfs = _ref_modules()
        from tf_geometric.nn.kernel.map_reduce import (
            aggregate_neighbors, identity_mapper, sum_reducer, mean_reducer,
            max_reducer, identity_updater, sum_updater)
        from tf_geometric.nn.conv.gcn import gcn_mapper
        xs, eis, ews = tf.constant(inp["x"]), tf.constant(inp["ei"]), tf.constant(inp["ew"])
        return {
            "sum_gcn": aggregate_neighbors(xs, eis, ews, gcn_mapper, sum_reducer,
                                           identity_updater).numpy(),
            "mean_id": aggregate_neighbors(xs, eis, None, identity_mapper,
                                           mean_reducer, sum_updater).numpy(),
            "max_id": aggregate_neighbors(xs, eis, None, identity_mapper,
                                          max_reducer, identity_updater).numpy(),
        }

    def repo(inp):
        from tf_geometric_tpu import nn as tnn
        xs, eis, ews = (jnp.asarray(inp["x"]), jnp.asarray(inp["ei"]),
                        jnp.asarray(inp["ew"]))
        return {
            "sum_gcn": np.asarray(tnn.aggregate_neighbors(
                xs, eis, ews, tnn.gcn_mapper, tnn.sum_reducer, tnn.identity_updater)),
            "mean_id": np.asarray(tnn.aggregate_neighbors(
                xs, eis, None, tnn.identity_mapper, tnn.mean_reducer, tnn.sum_updater)),
            "max_id": np.asarray(tnn.aggregate_neighbors(
                xs, eis, None, tnn.identity_mapper, tnn.max_reducer, tnn.identity_updater)),
        }

    return inputs, ref, repo


@case("segment_ops")
def _case_segment_ops():
    rng = np.random.RandomState(502)
    data = rng.randn(50, 4).astype(np.float32)
    seg = np.sort(rng.randint(0, 8, 50)).astype(np.int32)
    inputs = dict(data=data, seg=seg)

    def ref(inp):
        tfg, tf, tfs = _ref_modules()
        from tf_geometric.nn.kernel.segment import (segment_softmax, segment_count,
                                                    segment_op_with_pad)
        d, s = tf.constant(inp["data"]), tf.constant(inp["seg"])
        return {
            "softmax": segment_softmax(d, s, 8).numpy(),
            "count": segment_count(s, 8).numpy().astype(np.int32),
            "pad_max": segment_op_with_pad(tf.math.segment_max, d, s, 8).numpy(),
        }

    def repo(inp):
        from tf_geometric_tpu import nn as tnn
        import jax.ops
        d, s = jnp.asarray(inp["data"]), jnp.asarray(inp["seg"])
        return {
            "softmax": np.asarray(tnn.segment_softmax(d, s, 8)),
            "count": np.asarray(tnn.segment_count(s, 8)).astype(np.int32),
            "pad_max": np.asarray(tnn.segment_op_with_pad(
                functools.partial(jax.ops.segment_max, indices_are_sorted=True), d, s, 8)),
        }

    return inputs, ref, repo


@case("graph_utils")
def _case_graph_utils():
    seed = 503
    rng = np.random.RandomState(seed)
    n = 15
    ei = rng.randint(0, n, size=(2, 40)).astype(np.int32)
    ew = rng.uniform(0.5, 1.5, 40).astype(np.float32)
    sym_ei = np.concatenate([ei, ei[::-1]], axis=1)
    sym_ew = np.concatenate([ew, ew])
    node_index = np.unique(rng.randint(0, n, 6)).astype(np.int32)
    inputs = dict(ei=ei, ew=ew, sym_ei=sym_ei, sym_ew=sym_ew, node_index=node_index)

    def ref(inp):
        tfg, tf, tfs = _ref_modules()
        gu = tfg.utils.graph_utils
        d_ei, [d_ew] = gu.convert_edge_to_directed(inp["ei"], [inp["ew"]], ["sum"])
        r_ei, r_ew = gu.remove_self_loop_edge(tf.constant(inp["ei"]), tf.constant(inp["ew"]))
        a_ei, a_ew = gu.add_self_loop_edge(tf.constant(inp["ei"]), 15,
                                           tf.constant(inp["ew"]), fill_weight=0.5)
        l_ei, l_ew = gu.get_laplacian(tf.constant(inp["sym_ei"]), 15,
                                      tf.constant(inp["sym_ew"]), "sym")
        n_ei, n_ew = gu.adj_norm_edge(tf.constant(inp["sym_ei"]), 15,
                                      tf.constant(inp["sym_ew"]), add_self_loop=False)
        mask = gu.compute_edge_mask_by_node_index(tf.constant(inp["ei"]),
                                                  tf.constant(inp["node_index"]))
        return {
            "directed": _edges_to_dense(np.asarray(d_ei), np.asarray(d_ew), 15),
            "removed": _edges_to_dense(r_ei.numpy(), r_ew.numpy(), 15),
            "added": _edges_to_dense(a_ei.numpy(), a_ew.numpy(), 15),
            "laplacian": _edges_to_dense(l_ei.numpy(), l_ew.numpy(), 15),
            "normed": _edges_to_dense(n_ei.numpy(), n_ew.numpy(), 15),
            "mask": np.asarray(mask).astype(np.int32),
        }

    def repo(inp):
        from tf_geometric_tpu.utils import graph_utils as gu
        d_ei, [d_ew] = gu.convert_edge_to_directed(inp["ei"], [inp["ew"]], ["sum"])
        r_ei, r_ew = gu.remove_self_loop_edge(inp["ei"], inp["ew"])
        a_ei, a_ew = gu.add_self_loop_edge(inp["ei"], 15, inp["ew"], fill_weight=0.5)
        l_ei, l_ew = gu.get_laplacian(inp["sym_ei"], 15, inp["sym_ew"], "sym")
        n_ei, n_ew = gu.adj_norm_edge(inp["sym_ei"], 15, inp["sym_ew"],
                                      add_self_loop=False)
        mask = gu.compute_edge_mask_by_node_index(inp["ei"], inp["node_index"])
        return {
            "directed": _edges_to_dense(np.asarray(d_ei), np.asarray(d_ew), 15),
            "removed": _edges_to_dense(np.asarray(r_ei), np.asarray(r_ew), 15),
            "added": _edges_to_dense(np.asarray(a_ei), np.asarray(a_ew), 15),
            "laplacian": _edges_to_dense(np.asarray(l_ei), np.asarray(l_ew), 15),
            "normed": _edges_to_dense(np.asarray(n_ei), np.asarray(n_ew), 15),
            "mask": np.asarray(mask).astype(np.int32),
        }

    return inputs, ref, repo


# ---------------------------------------------------------------------------
# runner
# ---------------------------------------------------------------------------


def _fixture_path(name):
    return os.path.join(FIXTURE_DIR, name + ".npz")


def _load_fixture(name):
    path = _fixture_path(name)
    if not os.path.exists(path):
        return None, None
    data = np.load(path)
    inputs = {k[3:]: data[k] for k in data.files if k.startswith("in_")}
    expected = {k[4:]: data[k] for k in data.files if k.startswith("out_")}
    return inputs, expected


def _save_fixture(name, inputs, expected):
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    payload = {"in_" + k: v for k, v in inputs.items()}
    payload.update({"out_" + k: v for k, v in expected.items()})
    np.savez_compressed(_fixture_path(name), **payload)


def test_reference_asap_incompatible():
    """Documents that the reference's asap is broken against its own current
    gcn API: asap.py:54 still uses the pre-tf_sparse positional signature
    gcn(x, edge_index, edge_weight, kernel, bias), which gcn.py:225 rejects.
    The repo implements the intended semantics (gcn over the adjacency);
    the "asap" parity case above checks them against a repaired reference."""
    import tests.tfref as tfref
    if tfref.load_reference() is None:
        pytest.skip("reference unavailable")
    import tensorflow as tf
    from tf_geometric.nn.pool.asap import asap
    rng = np.random.RandomState(0)
    n, f = 10, 4
    ei = rng.randint(0, n, size=(2, 30)).astype(np.int32)
    ew = rng.rand(30).astype(np.float32)
    d = lambda *s: rng.randn(*s).astype(np.float32)  # noqa: E731
    with pytest.raises(Exception, match="add_self_loop"):
        asap(tf.constant(rng.randn(n, f).astype(np.float32)), tf.constant(ei),
             tf.constant(ew), tf.constant(np.zeros(n, np.int32)),
             d(f, f), d(f), d(f, f), d(f), d(2 * f, 1), d(1),
             d(f, 1), d(1), d(f, 1), d(1), d(f, 1), d(1), ratio=0.5)


@pytest.mark.parametrize("name", sorted(CASES))
def test_reference_parity(name):
    build, rtol, atol = CASES[name]
    inputs, ref_fn, repo_fn = build()

    fix_inputs, fix_expected = _load_fixture(name)
    if fix_expected is not None and not LIVE:
        inputs, expected = fix_inputs, fix_expected
    else:
        expected = ref_fn(inputs)  # skips via _ref_modules if TF unavailable
        if fix_expected is not None and LIVE:
            for k in fix_expected:
                np.testing.assert_allclose(
                    expected[k], fix_expected[k], rtol=rtol, atol=atol,
                    err_msg="reference drifted vs stored golden: {}[{}]".format(name, k))
        else:
            _save_fixture(name, inputs, expected)

    got = repo_fn(inputs)
    assert set(got) == set(expected), (set(got), set(expected))
    for k in sorted(expected):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(expected[k]), rtol=rtol, atol=atol,
            err_msg="{}[{}]".format(name, k))
