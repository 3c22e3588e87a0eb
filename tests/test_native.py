"""A/B tests: native C++ graph packer vs the numpy+jnp reference path."""

import numpy as np
import pytest

from lanczosnet_tpu.core.graph_batch import batch_graphs
from lanczosnet_tpu.data import native
from lanczosnet_tpu.data.dataset import pack_dataset
from lanczosnet_tpu.data.qm8 import synthetic_qm8_graphs
from lanczosnet_tpu.ops.normalize import build_operator_stack

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native graphpack unavailable (no g++?)"
)


@pytest.mark.parametrize("kind", ["sym", "row"])
def test_native_matches_python_path(kind):
    graphs = synthetic_qm8_graphs(12, seed=5, n_lo=3, n_hi=14)
    n_max = 16
    out = native.pack_arrays(graphs, n_max, kind=kind)
    host = batch_graphs(graphs, n_max)
    mask = host["mask"].astype(np.float32)
    ops_ref = np.asarray(build_operator_stack(host["adj"], mask, kind=kind))
    np.testing.assert_array_equal(out["atom_type"], host["atom_type"])
    np.testing.assert_array_equal(out["mask"], mask)
    np.testing.assert_allclose(out["ops"], ops_ref, atol=2e-6)


def test_native_oversize_raises():
    graphs = synthetic_qm8_graphs(2, seed=0, n_lo=12, n_hi=14)
    with pytest.raises(ValueError, match="n_max"):
        native.pack_arrays(graphs, 8)


def test_pack_dataset_native_vs_python_equal():
    graphs = synthetic_qm8_graphs(8, seed=2, n_hi=12)
    a = pack_dataset(graphs, n_max=14, standardize=True, use_native=True)
    b = pack_dataset(graphs, n_max=14, standardize=True, use_native=False)
    np.testing.assert_allclose(a.ops, b.ops, atol=2e-6)
    np.testing.assert_array_equal(a.atom_type, b.atom_type)
    np.testing.assert_array_equal(a.mask, b.mask)
    np.testing.assert_allclose(a.label, b.label, atol=1e-6)


def test_native_multithreaded_deterministic():
    graphs = synthetic_qm8_graphs(40, seed=3, n_hi=12)
    a = native.pack_arrays(graphs, 14, num_threads=1)
    b = native.pack_arrays(graphs, 14, num_threads=8)
    np.testing.assert_array_equal(a["ops"], b["ops"])
    np.testing.assert_array_equal(a["atom_type"], b["atom_type"])
