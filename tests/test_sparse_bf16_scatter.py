"""Gradient-parity gate for the opt-in 16-bit sorted backward scatter.

`LANCZOSNET_BF16_SCATTER=1` makes `edge_gather`'s custom VJP accumulate
SORTED cotangent scatters in the cotangent's own 16-bit dtype instead
of widening to f32 first (ops/sparse.py:_bf16_sorted_scatter — VERDICT
r4 #2: the 9× bf16-scatter cliff was an unsorted-lowering artifact, so
the sorted form deserves its own measurement). 16-bit accumulation
loses mantissa on high-degree destinations; this test bounds the
deviation of the full train-step gradient so the perf knob can't
silently break training.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lanczosnet_tpu.ops import sparse as sp
from lanczosnet_tpu.ops.sparse import edge_gather, sparse_sym_operator


def _grads(x_bf16, op, flag, monkeypatch):
    monkeypatch.setenv("LANCZOSNET_BF16_SCATTER", "1" if flag else "0")

    def loss(x):
        e = edge_gather(op, x)  # [E, F] bf16 cotangents flow back
        w = (jnp.arange(e.shape[0]) % 7 + 1).astype(e.dtype)[:, None]
        return jnp.sum((e * w).astype(jnp.float32) ** 2)

    # fresh trace per flag value: the env is read at trace time
    return np.asarray(jax.jit(jax.grad(loss))(x_bf16), np.float32)


def test_bf16_sorted_scatter_grad_parity(monkeypatch):
    rng = np.random.default_rng(0)
    n, e, f = 400, 3000, 64
    edges = rng.integers(0, n, size=(e, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    op = sparse_sym_operator(edges, n)
    assert op.col_perm is not None  # sorted path must be reachable
    x = jnp.asarray(rng.standard_normal((n, f)), jnp.bfloat16)

    g_f32acc = _grads(x, op, False, monkeypatch)
    g_bf16acc = _grads(x, op, True, monkeypatch)

    assert np.isfinite(g_bf16acc).all()
    # bf16 has ~8 mantissa bits; per-element relative error of a
    # block-summed accumulation stays within a few ulps of the f32-
    # accumulated value at these degrees (~15 edges/node)
    scale = np.abs(g_f32acc).max()
    err = np.abs(g_bf16acc - g_f32acc).max() / max(scale, 1e-30)
    assert err < 0.02, f"bf16-accumulated grad deviates {err:.4f} rel"


def test_bf16_scatter_flag_ignored_without_sort(monkeypatch):
    """Unsorted fallback (no col_perm) must keep f32 accumulation even
    with the flag on — the unsorted 16-bit scatter IS the measured 9×
    cliff."""
    rng = np.random.default_rng(1)
    n, e, f = 100, 500, 32
    edges = rng.integers(0, n, size=(e, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    op = sparse_sym_operator(edges, n).replace(col_perm=None)
    monkeypatch.setenv("LANCZOSNET_BF16_SCATTER", "1")
    x = jnp.asarray(rng.standard_normal((n, f)), jnp.bfloat16)

    def loss(x):
        return jnp.sum(edge_gather(op, x).astype(jnp.float32) ** 2)

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g, np.float32)).all()


def test_f32_path_unchanged_by_flag(monkeypatch):
    """f32 primals never go near the 16-bit accumulator."""
    rng = np.random.default_rng(2)
    n, e, f = 100, 500, 32
    edges = rng.integers(0, n, size=(e, 2))
    edges = edges[edges[:, 0] != edges[:, 1]]
    op = sparse_sym_operator(edges, n)
    x = jnp.asarray(rng.standard_normal((n, f)), jnp.float32)

    def loss(x):
        return jnp.sum(edge_gather(op, x) ** 2)

    monkeypatch.setenv("LANCZOSNET_BF16_SCATTER", "0")
    g_off = np.asarray(jax.jit(jax.grad(loss))(x))
    monkeypatch.setenv("LANCZOSNET_BF16_SCATTER", "1")
    g_on = np.asarray(jax.jit(jax.grad(loss))(x))
    np.testing.assert_array_equal(g_off, g_on)
