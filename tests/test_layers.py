"""Layer wrappers: init/apply shapes, rng plumbing, losses collection."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tf_geometric_tpu as tfg
from tf_geometric_tpu.layers import (APPNP, ASAP, GAT, GCN, GIN, LEConv,
                                     LSTMGraphSage, MaxPool, MaxPoolGraphSage,
                                     MeanGraphSage, MeanPool, MeanPoolGraphSage,
                                     MinCutPool, SAGPool, Set2Set, SGC, SortPool,
                                     SSGC, SumGraphSage, GCNGraphSage, TAGCN,
                                     ChebyNet, DiffPool, DropEdge, MapReduceGNN)
from tests.conftest import random_graph


@pytest.fixture
def inputs(rng):
    x, ei, ew = random_graph(rng, 16, 40, 8)
    return [jnp.asarray(x), jnp.asarray(ei), jnp.asarray(ew)]


def init_apply(layer, inputs, **kwargs):
    key = jax.random.PRNGKey(0)
    variables = layer.init({"params": key, "dropout": key}, inputs, **kwargs)
    return layer.apply(variables, inputs, rngs={"dropout": key}, **kwargs)


def test_conv_layer_shapes(inputs):
    n = 16
    assert init_apply(GCN(units=7), inputs).shape == (n, 7)
    assert init_apply(GAT(units=6, num_heads=2), inputs).shape == (n, 6)
    assert init_apply(GAT(units=6, num_heads=2, split_value_heads=False),
                      inputs).shape == (n, 6)
    assert init_apply(SGC(units=5, k=2), inputs).shape == (n, 5)
    assert init_apply(TAGCN(units=5, k=2), inputs).shape == (n, 5)
    assert init_apply(APPNP(units_list=[8, 5], k=3), inputs).shape == (n, 5)
    assert init_apply(SSGC(units_list=[5], k=3), inputs).shape == (n, 5)
    assert init_apply(ChebyNet(units=5, k=3), inputs).shape == (n, 5)
    assert init_apply(LEConv(units=5), inputs).shape == (n, 5)


def test_gin_layer_with_flax_mlp(inputs):
    import flax.linen as nn

    class MLP(nn.Module):
        @nn.compact
        def __call__(self, h, training=False):
            h = nn.Dense(10)(h)
            return nn.Dense(4)(jax.nn.relu(h))

    class GINNet(nn.Module):
        @nn.compact
        def __call__(self, inputs, training=False):
            mlp = MLP()
            return GIN(mlp_model=mlp, train_eps=True)(inputs, training=training)

    net = GINNet()
    key = jax.random.PRNGKey(0)
    variables = net.init(key, inputs)
    out = net.apply(variables, inputs)
    assert out.shape == (16, 4)
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    assert any("eps" in str(p) for p, _ in flat)


def test_graph_sage_layers(inputs):
    n = 16
    assert init_apply(MeanGraphSage(units=8), inputs).shape == (n, 8)
    assert init_apply(SumGraphSage(units=8, concat=False), inputs).shape == (n, 8)
    assert init_apply(GCNGraphSage(units=8), inputs).shape == (n, 8)
    assert init_apply(MeanPoolGraphSage(units=8), inputs).shape == (n, 8)
    assert init_apply(MaxPoolGraphSage(units=8), inputs).shape == (n, 8)
    assert init_apply(LSTMGraphSage(units=8), inputs).shape == (n, 8)


def test_drop_edge_layer(inputs):
    edge_inputs = inputs[1:]  # DropEdge takes [edge_index, *edge_attrs]
    layer = DropEdge(rate=0.5, num_nodes=16)
    out = init_apply(layer, edge_inputs, training=True)
    assert out[0].shape == edge_inputs[0].shape
    out_eval = init_apply(layer, edge_inputs, training=False)
    np.testing.assert_array_equal(np.asarray(out_eval[0]), np.asarray(edge_inputs[0]))


def test_map_reduce_gnn(inputs):
    from tf_geometric_tpu.nn import mean_reducer

    class MyGNN(MapReduceGNN):
        def map(self, repeated_x, neighbor_x, edge_weight=None):
            return neighbor_x * 2.0

        def reduce(self, neighbor_msg, node_index, num_nodes=None):
            return mean_reducer(neighbor_msg, node_index, num_nodes)

        def update(self, x, reduced):
            return x + reduced

    gnn = MyGNN()
    out = gnn.apply({}, inputs)
    assert out.shape == inputs[0].shape


def batch_inputs(rng):
    x, ei, ew = random_graph(rng, 18, 50, 6)
    ngi = np.repeat(np.arange(3), 6).astype(np.int32)
    # keep edges within graphs
    ei = np.stack([ei[0] % 6 + (ei[0] % 3) * 6, ei[1] % 6 + (ei[0] % 3) * 6])
    return [jnp.asarray(x), jnp.asarray(ei.astype(np.int32)), jnp.asarray(ew),
            jnp.asarray(ngi)]


def test_pool_layers(rng):
    inputs4 = batch_inputs(rng)
    x = inputs4[0]

    assert init_apply(MeanPool(num_graphs=3), [x, inputs4[3]]).shape == (3, 6)
    assert init_apply(MaxPool(num_graphs=3), [x, inputs4[3]]).shape == (3, 6)

    def make_gnn(units):
        layer = GCN(units=units)
        variables = layer.init(jax.random.PRNGKey(1), inputs4[:3])
        def fn(ins, training=None, cache=None):
            return layer.apply(variables, ins, cache=cache)
        return fn

    dp = DiffPool(feature_gnn=make_gnn(5), assign_gnn=make_gnn(2),
                  units=5, num_clusters=2, num_graphs=3)
    px, pei, pew, pngi = init_apply(dp, inputs4)
    assert px.shape == (6, 5)

    mcp = MinCutPool(feature_gnn=make_gnn(5), assign_gnn=make_gnn(2),
                     units=5, num_clusters=2, num_graphs=3)
    key = jax.random.PRNGKey(0)
    variables = mcp.init({"params": key}, inputs4)
    (outputs, losses), state = mcp.apply(variables, inputs4, return_losses=True,
                                         mutable=["losses"])
    cut, orth = losses
    assert np.isfinite(float(cut)) and np.isfinite(float(orth))
    assert "min_cut_losses" in state["losses"]

    sag = SAGPool(score_gnn=make_gnn(1), k=2, score_activation=jax.nn.tanh,
                  num_graphs=3)
    px, pei, pew, pngi = init_apply(sag, inputs4)
    assert px.shape == (6, 6)

    sp = SortPool(k=2, num_graphs=3)
    px, _, _, _ = init_apply(sp, inputs4)
    assert px.shape == (6, 6)

    a = ASAP(units=4, ratio=0.5)
    px, pei, pew, pngi = init_apply(a, inputs4)
    assert np.isfinite(np.asarray(px)).all()

    s2s = Set2Set(num_iterations=2, num_graphs=3)
    out = init_apply(s2s, [x, inputs4[3]])
    assert out.shape == (3, 12)


def test_layer_rejects_one_element_inputs():
    import pytest
    import tf_geometric_tpu.layers as L
    layer = L.GCN(units=3)
    with pytest.raises(ValueError, match="layer inputs"):
        layer.init(jax.random.PRNGKey(0), [jnp.ones((2, 4))])


def test_appnp_ssgc_no_rng_needed_without_dropout(rng):
    """training=True with all drop rates 0 must not demand a dropout RNG."""
    import numpy as np
    from tf_geometric_tpu.layers import APPNP, SSGC, DropEdge
    x = jnp.asarray(rng.normal(size=(6, 4)), jnp.float32)
    ei = jnp.asarray(np.array([[0, 1, 2], [1, 2, 3]], np.int32))
    for cls in (APPNP, SSGC):
        layer = cls(units_list=[3])
        params = layer.init(jax.random.PRNGKey(0), [x, ei])
        out = layer.apply(params, [x, ei], training=True)  # no rngs needed
        assert out.shape == (6, 3)
    de = DropEdge(rate=0.0)
    p = de.init(jax.random.PRNGKey(0), [ei])
    (out_ei,) = de.apply(p, [ei], training=True)
    np.testing.assert_array_equal(np.asarray(out_ei), np.asarray(ei))


def test_map_reduce_gnn_accepts_two_element_inputs(rng):
    import numpy as np
    from tf_geometric_tpu.layers import MapReduceGNN
    from tf_geometric_tpu.nn import identity_mapper, sum_reducer, identity_updater

    class SumGNN(MapReduceGNN):
        def map(self, repeated_x, neighbor_x, edge_weight=None):
            return identity_mapper(repeated_x, neighbor_x, edge_weight)

        def reduce(self, neighbor_msg, node_index, num_nodes=None):
            return sum_reducer(neighbor_msg, node_index, num_nodes)

        def update(self, x, reduced_neighbor_msg):
            return identity_updater(x, reduced_neighbor_msg)

    x = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    ei = jnp.asarray(np.array([[0, 1], [1, 2]], np.int32))
    layer = SumGNN()
    params = layer.init(jax.random.PRNGKey(0), [x, ei])
    out = layer.apply(params, [x, ei])  # 2-element form now accepted
    assert out.shape[0] == 5
