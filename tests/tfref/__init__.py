"""Loader that makes the on-disk reference library executable for parity tests.

The reference at /root/reference needs two things this environment lacks:
the external ``tf_sparse`` package (reference setup.py:27) and ``ogb_lite``
(reference datasets/ogb.py:6).  We register a pure-TF shim for the former and
a name-only stub for the latter, then import ``tf_geometric`` straight from
the reference checkout.  ``TF_USE_LEGACY_KERAS=1`` selects Keras 2 so the
reference's ``tf.keras.Model`` layer wrappers (e.g. reference
layers/conv/gcn.py:26-30 ``add_weight("kernel", shape=...)``) keep working
under TF 2.21.

Usage from a test:

    tfg = tfref.load_reference()   # None if TF/reference unavailable
"""
import os
import sys
import types

REFERENCE_PATH = "/root/reference"

_cached = None
_failed = None


def load_reference():
    """Import and return the reference ``tf_geometric`` package, or None."""
    global _cached, _failed
    if _cached is not None:
        return _cached
    if _failed is not None:
        return None
    if not os.path.isdir(os.path.join(REFERENCE_PATH, "tf_geometric")):
        _failed = "reference checkout not present"
        return None
    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    try:
        import tensorflow  # noqa: F401
    except Exception as exc:  # pragma: no cover - env without TF
        _failed = "tensorflow unavailable: {}".format(exc)
        return None

    from . import tf_sparse_shim
    sys.modules.setdefault("tf_sparse", tf_sparse_shim)

    if "ogb_lite" not in sys.modules:
        ogb_lite = types.ModuleType("ogb_lite")
        nodeproppred = types.ModuleType("ogb_lite.nodeproppred")

        class NodePropPredDataset(object):  # name-only stub; never constructed
            def __init__(self, *args, **kwargs):
                raise NotImplementedError("ogb_lite stub: downloads disabled")

        nodeproppred.NodePropPredDataset = NodePropPredDataset
        ogb_lite.nodeproppred = nodeproppred
        sys.modules["ogb_lite"] = ogb_lite
        sys.modules["ogb_lite.nodeproppred"] = nodeproppred

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    try:
        import tf_geometric
    except Exception as exc:
        _failed = "tf_geometric import failed: {}".format(exc)
        return None
    _cached = tf_geometric
    return _cached


def load_failure():
    return _failed
