"""The dense, padded, masked graph-batch contract shared by every model.

Mirrors the implicit contract of the reference's `collate_fn`
(lrjconan/LanczosNetwork `utils/data_helper.py`, see SURVEY.md §2.2):
variable-size molecular graphs become fixed-shape dense tensors with a
node-validity mask. Unlike the reference (which pads to the per-batch
max), we pad to a *global* static ``n_max`` so the entire training run
compiles to one XLA program — the single most important TPU-first
decision in this codebase.

Layout choices (TPU-first, deliberately different from the reference):

- operators are stored ``[B, E, N, N]`` (edge-type axis *leading*), not
  the reference's ``[B, N, N, E+1]``, so the trailing two axes are the
  matmul axes and XLA tiles them straight onto the MXU;
- the atom-type index is carried separately from continuous node
  features (the reference packs it into column 0 of ``node_feat``).

Channel convention for ``ops``: channel 0 is the symmetrically
normalized operator of the *full* adjacency (all edge types merged);
channels ``1..E`` are the per-edge-type normalized operators. Models
that want an explicit self channel use ``ops_with_self``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.struct
import jax.numpy as jnp
import numpy as np

Array = Any  # jnp.ndarray or np.ndarray; kept loose so host code can reuse it.


@flax.struct.dataclass
class GraphBatch:
    """A batch of padded dense graphs. All arrays share leading dim B.

    Attributes:
      atom_type: ``[B, N]`` int32 — categorical node (atom) type,
        0 reserved for padding.
      node_feat: ``[B, N, Fc]`` float — continuous per-node features
        (Fc may be 0).
      ops: ``[B, E, N, N]`` float — stack of normalized graph operators,
        channel 0 = full graph, channels 1..E-1 = per edge type.
      mask: ``[B, N]`` float32 — 1 for real nodes, 0 for padding.
      label: ``[B, T]`` float — regression targets.
      ritz_val: optional ``[B, K]`` — precomputed Ritz values (LanczosNet).
      ritz_vec: optional ``[B, N, K]`` — precomputed Ritz vectors.
      cluster: optional ``[B, N]`` int32 — partition assignment (GPNN),
        -1 for padding.
      node_label: optional ``[B, N]`` int32 — per-node class labels for
        full-graph node classification (citation configs); which nodes
        are supervised is a separate mask passed to the loss.
    """

    atom_type: Array
    node_feat: Array
    ops: Array
    mask: Array
    label: Array
    ritz_val: Optional[Array] = None
    ritz_vec: Optional[Array] = None
    cluster: Optional[Array] = None
    node_label: Optional[Array] = None

    @property
    def batch_size(self) -> int:
        return self.mask.shape[0]

    @property
    def n_max(self) -> int:
        return self.mask.shape[1]

    @property
    def num_ops(self) -> int:
        return self.ops.shape[1]

    def pair_mask(self) -> Array:
        """``[B, N, N]`` outer product of the node mask."""
        return self.mask[:, :, None] * self.mask[:, None, :]

    def ops_with_self(self) -> Array:
        """``[B, E+1, N, N]`` operator stack with a masked identity
        (self-loop) channel appended — the reference's explicit "self"
        channel in its ``[B,N,N,E+1]`` stacks (SURVEY.md §2.2)."""
        n = self.mask.shape[-1]
        eye = jnp.eye(n, dtype=self.ops.dtype) * self.mask[:, :, None]
        return jnp.concatenate([self.ops, eye[:, None]], axis=1)

    def num_nodes(self) -> Array:
        """``[B]`` number of real nodes per graph."""
        return jnp.sum(self.mask, axis=-1)


def pad_graph(
    atom_type: np.ndarray,
    node_feat: Optional[np.ndarray],
    adj: np.ndarray,
    n_max: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Pad one graph's host-side arrays to ``n_max`` nodes.

    Args:
      atom_type: ``[n]`` ints (>=1 for real atoms).
      node_feat: ``[n, Fc]`` floats or None.
      adj: ``[E_raw, n, n]`` per-edge-type adjacency (unnormalized).
      n_max: static global padding size.

    Returns:
      (atom_type ``[n_max]``, node_feat ``[n_max, Fc]``,
       adj ``[E_raw, n_max, n_max]``, mask ``[n_max]``).
    """
    n = int(atom_type.shape[0])
    if n > n_max:
        raise ValueError(f"graph has {n} nodes > n_max={n_max}")
    at = np.zeros((n_max,), dtype=np.int32)
    at[:n] = atom_type
    fc = 0 if node_feat is None else node_feat.shape[-1]
    nf = np.zeros((n_max, fc), dtype=np.float32)
    if node_feat is not None:
        nf[:n] = node_feat
    e = adj.shape[0]
    a = np.zeros((e, n_max, n_max), dtype=np.float32)
    a[:, :n, :n] = adj
    mask = np.zeros((n_max,), dtype=np.float32)
    mask[:n] = 1.0
    return at, nf, a, mask


def batch_graphs(graphs: Sequence[dict], n_max: int) -> dict:
    """Stack host-side graph dicts (as produced by the data pipeline)
    into numpy arrays ready to become a GraphBatch.

    Each graph dict must have keys ``atom_type [n]``, ``adj [E,n,n]``,
    ``label [T]`` and may have ``node_feat [n,Fc]``.
    """
    ats, nfs, adjs, masks, labels = [], [], [], [], []
    for g in graphs:
        at, nf, a, m = pad_graph(
            np.asarray(g["atom_type"]),
            np.asarray(g["node_feat"]) if g.get("node_feat") is not None else None,
            np.asarray(g["adj"]),
            n_max,
        )
        ats.append(at)
        nfs.append(nf)
        adjs.append(a)
        masks.append(m)
        labels.append(np.asarray(g["label"], dtype=np.float32))
    return {
        "atom_type": np.stack(ats),
        "node_feat": np.stack(nfs),
        "adj": np.stack(adjs),
        "mask": np.stack(masks),
        "label": np.stack(labels),
    }
