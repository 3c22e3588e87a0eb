"""Reference-style PyTorch twins of LanczosNet / AdaLanczosNet.

These modules re-state the *reference semantics* (SURVEY.md §2.3/§2.4,
reconstructed from lrjconan/LanczosNetwork `model/lanczos_net.py` and
`model/ada_lanczos_net.py`) in idiomatic eager PyTorch — Python loops of
`torch.bmm`, `nn.Linear`/`nn.Embedding` modules, per-graph Lanczos
loops — deliberately NOT a translation of the JAX code. They exist so
the flax models can be diffed layer-by-layer against an independent
implementation of the same math: any convention drift (operator sign /
normalization, filter featurization ``[D, D^t]``, readout gating,
Lanczos start vector / reorthogonalization) shows up as an activation
mismatch in tests/test_parity.py.

The moment real reference weights/data appear, the same harness asserts
1e-4 MAE parity: load reference weights into these twins (native torch)
and into the flax models via tests/parity/transfer.py.

Everything returns ``(prediction, intermediates: dict[str, Tensor])``
so the test can compare named cut points.
"""

from __future__ import annotations

import math
from typing import Dict, List, Sequence, Tuple

import torch
import torch.nn as nn

Tensor = torch.Tensor


# --------------------------------------------------------------- operators
def sym_normalize_t(adj: Tensor, mask: Tensor, eps: float = 1e-12) -> Tensor:
    """``D^{-1/2} A D^{-1/2}`` with zero-degree guard (torch twin of
    ops/normalize.py:sym_normalize)."""
    a = adj * mask.unsqueeze(-1) * mask.unsqueeze(-2)
    deg = a.sum(-1)
    inv_sqrt = torch.where(
        deg > eps, 1.0 / torch.sqrt(deg.clamp_min(eps)), torch.zeros_like(deg)
    )
    return a * inv_sqrt.unsqueeze(-1) * inv_sqrt.unsqueeze(-2)


def lanczos_start_vector_t(mask: Tensor, eps: float = 1e-6) -> Tensor:
    """Same quasi-random masked start vector as ops/lanczos.py —
    BOTH implementations must agree on q0 or the recursions diverge."""
    n = mask.shape[-1]
    i = torch.arange(n, dtype=torch.float32)
    v = 1.0 + torch.sin(1.9 * i + 0.7) + 0.5 * torch.cos(0.37 * i * i + 0.3)
    v = v * mask
    norm = torch.sqrt(torch.clamp((v * v).sum(-1, keepdim=True), min=eps * eps))
    return v / norm


def lanczos_tridiag_t(
    s: Tensor, mask: Tensor, k: int, eps: float = 1e-6
) -> Tuple[Tensor, Tensor, Tensor]:
    """Reference-style eager Lanczos on ONE graph: K sequential steps,
    full reorthogonalization (two classical Gram–Schmidt passes),
    ε-guarded breakdown. Returns (alphas [k], betas [k-1], Q [k, N])."""
    n = mask.shape[0]
    q0 = lanczos_start_vector_t(mask, eps)
    q_buf = torch.zeros(k, n)
    q_buf[0] = q0
    beta_prev = torch.zeros(())
    q_prev = torch.zeros(n)
    alphas, betas = [], []
    for j in range(k):
        q_j = q_buf[j]
        w = s @ q_j
        alpha = q_j @ w
        w = w - alpha * q_j - beta_prev * q_prev
        for _ in range(2):  # CGS2 against the whole (zero-padded) basis
            w = w - q_buf.T @ (q_buf @ w)
        beta = torch.sqrt(torch.clamp(w @ w, min=eps * eps))
        valid = (beta > eps).float()
        q_next = valid * w / beta
        if j + 1 < k:
            q_buf = q_buf.clone()
            q_buf[j + 1] = q_next
        alphas.append(alpha)
        betas.append(beta * valid)
        beta_prev = beta * valid
        q_prev = q_next
    return torch.stack(alphas), torch.stack(betas[:-1]), q_buf


def lanczos_ritz_t(
    s: Tensor, mask: Tensor, k: int, eps: float = 1e-6
) -> Tuple[Tensor, Tensor]:
    """Ritz pairs of one operator via eager Lanczos + dense eigh of the
    K×K tridiagonal. Returns (ritz_val [k] ascending, ritz_vec [N, k])."""
    alphas, betas, q = lanczos_tridiag_t(s, mask, k, eps)
    t = torch.diag(alphas)
    if k > 1:
        t = t + torch.diag(betas, 1) + torch.diag(betas, -1)
    w, u = torch.linalg.eigh(t)
    return w, q.T @ u


def batched_lanczos_ritz_t(
    s: Tensor, mask: Tensor, k: int, eps: float = 1e-6
) -> Tuple[Tensor, Tensor]:
    """Per-graph Python loop (the reference's batching style)."""
    vals, vecs = [], []
    for b in range(s.shape[0]):
        w, v = lanczos_ritz_t(s[b], mask[b], k, eps)
        vals.append(w)
        vecs.append(v)
    return torch.stack(vals), torch.stack(vecs)


# --------------------------------------------------------------- components
class SpectralFilterT(nn.Module):
    """Per-scale learned filter over Ritz values: [B,K] → [B,S,K].

    MLP featurization ``[D, D^t]`` per scale t, matching SURVEY.md §2.3.
    """

    def __init__(self, long_dists: Sequence[int], hidden: int, kind: str = "MLP"):
        super().__init__()
        self.long_dists = tuple(long_dists)
        self.kind = kind
        if kind.upper() == "MLP":
            self.filters = nn.ModuleDict(
                {
                    f"t{t}": nn.Sequential(
                        nn.Linear(2, hidden), nn.ReLU(), nn.Linear(hidden, 1)
                    )
                    for t in self.long_dists
                }
            )

    def forward(self, ritz_val: Tensor) -> Tensor:
        outs = []
        for t in self.long_dists:
            power = ritz_val**t
            if self.kind.upper() == "MLP":
                feat = torch.stack([ritz_val, power], dim=-1)  # [B,K,2]
                outs.append(self.filters[f"t{t}"](feat).squeeze(-1))
            else:
                outs.append(power)
        return torch.stack(outs, dim=1)  # [B,S,K]


class AttentionReadoutT(nn.Module):
    """Gated attention pooling: Σ_n mask·σ(a(h))·g(h) → [B,T]."""

    def __init__(self, in_dim: int, num_task: int, hidden: Sequence[int] = ()):
        super().__init__()
        self.att_gate = nn.Linear(in_dim, 1)
        dims = [in_dim, *hidden]
        self.out_hidden = nn.ModuleList(
            nn.Linear(dims[i], dims[i + 1]) for i in range(len(hidden))
        )
        self.out_proj = nn.Linear(dims[-1], num_task)

    def forward(self, h: Tensor, mask: Tensor) -> Tensor:
        gate = torch.sigmoid(self.att_gate(h))
        out = h
        for lin in self.out_hidden:
            out = torch.relu(lin(out))
        out = self.out_proj(out)
        return (gate * out * mask.unsqueeze(-1)).sum(1)


def _short_diffusion(s_op: Tensor, h: Tensor, dists: Sequence[int]) -> List[Tensor]:
    """Eager power loop: S^t h gathered at each t (reference style)."""
    feats, x = {}, h
    for p in range(1, max(dists) + 1):
        x = torch.bmm(s_op, x)
        if p in dists:
            feats[p] = x
    return [feats[t] for t in dists]


def _long_scales(ritz_vec: Tensor, filt: Tensor, h: Tensor) -> List[Tensor]:
    """V diag(f_t(D)) Vᵀ h per scale, eager bmm."""
    vtx = torch.bmm(ritz_vec.transpose(1, 2), h)  # [B,K,F]
    return [
        torch.bmm(ritz_vec, filt[:, s].unsqueeze(-1) * vtx)
        for s in range(filt.shape[1])
    ]


# --------------------------------------------------------------- models
class TorchLanczosNet(nn.Module):
    """Eager-torch LanczosNet consuming the same packed batch arrays
    (ops / mask / precomputed Ritz pairs) as the flax model."""

    def __init__(
        self,
        num_atom: int,
        embed_dim: int,
        hidden_dim: Sequence[int],
        num_task: int,
        short_diffusion_dist: Sequence[int] = (1, 2, 3),
        long_diffusion_dist: Sequence[int] = (5, 7, 10, 20, 30),
        filter_hidden_dim: int = 16,
        output_hidden_dim: Sequence[int] = (),
        num_ops: int = 3,
        node_feat_dim: int = 0,
        spectral_filter_kind: str = "MLP",
    ):
        super().__init__()
        self.short = tuple(short_diffusion_dist)
        self.long = tuple(long_diffusion_dist)
        self.atom_embed = nn.Embedding(num_atom, embed_dim)
        f_in = embed_dim + node_feat_dim
        self.layers = nn.ModuleList()
        self.spectral_filters = nn.ModuleList()
        for dim in hidden_dim:
            n_parts = 1 + len(self.short) + len(self.long) + (num_ops - 1)
            self.layers.append(nn.Linear(f_in * n_parts, dim))
            self.spectral_filters.append(
                SpectralFilterT(self.long, filter_hidden_dim, spectral_filter_kind)
            )
            f_in = dim
        self.readout = AttentionReadoutT(f_in, num_task, output_hidden_dim)

    def forward(self, batch: dict) -> Tuple[Tensor, Dict[str, Tensor]]:
        inter: Dict[str, Tensor] = {}
        mask = batch["mask"]
        h = self.atom_embed(batch["atom_type"])
        if batch.get("node_feat") is not None and batch["node_feat"].shape[-1] > 0:
            h = torch.cat([h, batch["node_feat"]], dim=-1)
        h = h * mask.unsqueeze(-1)
        inter["encoder"] = h
        s_op = batch["ops"][:, 0]
        for li, (lin, sf) in enumerate(zip(self.layers, self.spectral_filters)):
            parts = [h]
            if self.short:
                parts.extend(_short_diffusion(s_op, h, self.short))
            if self.long:
                filt = sf(batch["ritz_val"])
                inter[f"spectral_filter_{li}"] = filt
                parts.extend(_long_scales(batch["ritz_vec"], filt, h))
            for e in range(1, batch["ops"].shape[1]):
                parts.append(torch.bmm(batch["ops"][:, e], h))
            z = lin(torch.cat(parts, dim=-1))
            inter[f"layer_{li}"] = z
            h = torch.relu(z) * mask.unsqueeze(-1)
        pred = self.readout(h, mask)
        inter["pred"] = pred
        return pred, inter


class TorchAdaLanczosNet(nn.Module):
    """Eager-torch AdaLanczosNet: learned Gaussian kernel over node
    embeddings, in-forward per-graph Lanczos, LanczosNet downstream."""

    def __init__(
        self,
        num_atom: int,
        embed_dim: int,
        hidden_dim: Sequence[int],
        num_task: int,
        kernel_dim: int = 16,
        use_graph_support: bool = True,
        short_diffusion_dist: Sequence[int] = (1, 2, 3),
        long_diffusion_dist: Sequence[int] = (5, 7, 10, 20, 30),
        num_eig_vec: int = 8,
        filter_hidden_dim: int = 16,
        output_hidden_dim: Sequence[int] = (),
        num_ops: int = 3,
        node_feat_dim: int = 0,
        spectral_filter_kind: str = "MLP",
    ):
        super().__init__()
        self.short = tuple(short_diffusion_dist)
        self.long = tuple(long_diffusion_dist)
        self.k = num_eig_vec
        self.kernel_dim = kernel_dim
        self.use_graph_support = use_graph_support
        self.atom_embed = nn.Embedding(num_atom, embed_dim)
        f0 = embed_dim + node_feat_dim
        self.kernel_embed = nn.Linear(f0, kernel_dim)
        f_in = f0
        self.layers = nn.ModuleList()
        self.spectral_filters = nn.ModuleList()
        for dim in hidden_dim:
            n_parts = 1 + len(self.short) + len(self.long) + (num_ops - 1)
            self.layers.append(nn.Linear(f_in * n_parts, dim))
            self.spectral_filters.append(
                SpectralFilterT(self.long, filter_hidden_dim, spectral_filter_kind)
            )
            f_in = dim
        self.readout = AttentionReadoutT(f_in, num_task, output_hidden_dim)

    def _learned_operator(self, emb: Tensor, batch: dict) -> Tensor:
        mask = batch["mask"]
        sq = (emb * emb).sum(-1)
        d2 = sq.unsqueeze(2) + sq.unsqueeze(1) - 2.0 * torch.bmm(
            emb, emb.transpose(1, 2)
        )
        d2 = d2.clamp_min(0.0)
        kernel = torch.exp(-d2 / math.sqrt(float(emb.shape[-1])))
        if self.use_graph_support:
            n = mask.shape[-1]
            support = (batch["ops"][:, 0] > 0).float() + torch.eye(n).unsqueeze(0)
            kernel = kernel * support.clamp_max(1.0)
        kernel = kernel * mask.unsqueeze(-1) * mask.unsqueeze(-2)
        return sym_normalize_t(kernel, mask)

    def forward(self, batch: dict) -> Tuple[Tensor, Dict[str, Tensor]]:
        inter: Dict[str, Tensor] = {}
        mask = batch["mask"]
        h = self.atom_embed(batch["atom_type"])
        if batch.get("node_feat") is not None and batch["node_feat"].shape[-1] > 0:
            h = torch.cat([h, batch["node_feat"]], dim=-1)
        h = h * mask.unsqueeze(-1)
        inter["encoder"] = h
        emb = self.kernel_embed(h)
        inter["kernel_embed"] = emb  # pre-mask, = flax Dense capture point
        emb = emb * mask.unsqueeze(-1)
        s_op = self._learned_operator(emb, batch)
        inter["learned_operator"] = s_op
        ritz_val, ritz_vec = batched_lanczos_ritz_t(s_op, mask, self.k)
        inter["ritz_val"] = ritz_val
        for li, (lin, sf) in enumerate(zip(self.layers, self.spectral_filters)):
            parts = [h]
            if self.short:
                parts.extend(_short_diffusion(s_op, h, self.short))
            if self.long:
                filt = sf(ritz_val)
                inter[f"spectral_filter_{li}"] = filt
                long_feats = _long_scales(ritz_vec, filt, h)
                inter[f"long_scales_{li}"] = torch.stack(long_feats, dim=1)
                parts.extend(long_feats)
            for e in range(1, batch["ops"].shape[1]):
                parts.append(torch.bmm(batch["ops"][:, e], h))
            z = lin(torch.cat(parts, dim=-1))
            inter[f"layer_{li}"] = z
            h = torch.relu(z) * mask.unsqueeze(-1)
        pred = self.readout(h, mask)
        inter["pred"] = pred
        return pred, inter
