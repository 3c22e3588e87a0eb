"""Multi-scale spectral convolution — LanczosNet's long-diffusion path.

Implements ``S^t X ≈ V · diag(f_t(D)) · V^T · X`` (arXiv:1901.01484
eq. 6-8; reference `model/lanczos_net.py`, SURVEY.md §2.3) for a set of
long diffusion scales t, where (D, V) are the K Ritz pairs of the graph
operator and ``f_t`` is a learned per-scale spectral filter evaluated
*outside* this op (it is a tiny MLP over K scalars; params live in the
model).

TPU shape: the whole thing is two batched matmuls — ``V^T X`` is
``[B,K,N]@[B,N,F]`` and the reconstruction is ``[B,N,K]@[B,K,SF]`` — so
it rides the MXU end to end; the per-scale diagonal scaling fuses into
the surrounding elementwise stream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def long_scale_features(
    ritz_vec: jnp.ndarray,
    filtered_vals: jnp.ndarray,
    x: jnp.ndarray,
) -> jnp.ndarray:
    """Apply S low-rank spectral filters to node features.

    Args:
      ritz_vec: ``[B, N, K]`` Ritz vectors V.
      filtered_vals: ``[B, S, K]`` per-scale filtered spectra
        ``f_t(D)`` (e.g. ``D**t`` or an MLP of Ritz-value features).
      x: ``[B, N, F]`` node features.

    Returns:
      ``[B, S, N, F]`` — one filtered signal per scale.
    """
    vtx = jax.lax.dot_general(
        ritz_vec,
        x,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [B, K, F]
    scaled = filtered_vals[:, :, :, None] * vtx[:, None, :, :]  # [B, S, K, F]
    out = jax.lax.dot_general(
        ritz_vec,
        scaled,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [B, N, S, F]
    return jnp.moveaxis(out, 1, 2)  # [B, S, N, F]
