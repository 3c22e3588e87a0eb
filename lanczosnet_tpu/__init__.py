"""lanczosnet_tpu — a TPU-native graph neural network framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
lrjconan/LanczosNetwork (LanczosNet, ICLR 2019, arXiv:1901.01484):

- nine dense masked-batch GNN models (GCN, ChebyNet, DCNN, GAT,
  GraphSAGE, MPNN, GPNN, LanczosNet, AdaLanczosNet) sharing one
  operator library,
- a batched K-step Lanczos tridiagonalization (full
  reorthogonalization, differentiable) + batched tridiagonal
  eigensolver as the spectral core,
- a QM8-style molecular regression pipeline (config-driven runner,
  checkpointing, evaluation),
- data-parallel training over a `jax.sharding.Mesh`.

Design contract (see SURVEY.md §1): every model consumes fixed-shape,
padded, masked dense `GraphBatch` pytrees so the whole train step is a
single jit-compiled XLA program.
"""

__version__ = "0.1.0"

from lanczosnet_tpu.core.graph_batch import GraphBatch  # noqa: F401
