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


class TorchGAT(nn.Module):
    """Eager-torch GAT: per-edge-type additive attention with the
    neighborhood (plus self-loop) masked softmax — the reference
    `model/gat.py` semantics (SURVEY.md §2.5), stated with explicit
    [B,H,N,N] score tensors and eager softmax."""

    def __init__(
        self,
        num_atom: int,
        embed_dim: int,
        hidden_dim: Sequence[int],
        num_task: int,
        num_heads: int = 4,
        num_ops: int = 3,
        node_feat_dim: int = 0,
        output_hidden_dim: Sequence[int] = (),
        leaky_slope: float = 0.2,
    ):
        super().__init__()
        self.num_heads = num_heads
        self.leaky = leaky_slope
        self.atom_embed = nn.Embedding(num_atom, embed_dim)
        f_in = embed_dim + node_feat_dim
        self.layers = nn.ModuleList()
        for dim in hidden_dim:
            per_head = max(dim // num_heads, 1)
            layer = nn.ModuleDict()
            for e in range(num_ops):
                layer[f"w_{e}"] = nn.Linear(f_in, num_heads * per_head, bias=False)
                layer[f"a_src_{e}"] = nn.Linear(f_in, num_heads, bias=False)
                layer[f"a_dst_{e}"] = nn.Linear(f_in, num_heads, bias=False)
            layer.per_head = per_head
            self.layers.append(layer)
            f_in = num_heads * per_head
        self.readout = AttentionReadoutT(f_in, num_task, output_hidden_dim)

    def forward(self, batch: dict) -> Tuple[Tensor, Dict[str, Tensor]]:
        inter: Dict[str, Tensor] = {}
        mask = batch["mask"]
        ops = batch["ops"]
        b, n = mask.shape
        eye = torch.eye(n)
        h = self.atom_embed(batch["atom_type"])
        if batch.get("node_feat") is not None and batch["node_feat"].shape[-1] > 0:
            h = torch.cat([h, batch["node_feat"]], dim=-1)
        h = h * mask.unsqueeze(-1)
        inter["encoder"] = h
        for li, layer in enumerate(self.layers):
            outs = None
            for e in range(ops.shape[1]):
                z = layer[f"w_{e}"](h).reshape(b, n, self.num_heads, -1)
                a_src = layer[f"a_src_{e}"](h)  # [B, N, H]
                a_dst = layer[f"a_dst_{e}"](h)
                scores = a_src.permute(0, 2, 1).unsqueeze(3) + a_dst.permute(
                    0, 2, 1
                ).unsqueeze(2)  # [B,H,i,j]
                scores = torch.nn.functional.leaky_relu(scores, self.leaky)
                support = ((ops[:, e] > 0) | (eye > 0)).float()
                support = support * mask.unsqueeze(-1) * mask.unsqueeze(-2)
                sup = support.unsqueeze(1)  # [B,1,N,N]
                masked = torch.where(
                    sup > 0, scores, torch.full_like(scores, -1e30)
                )
                m = masked.max(dim=-1, keepdim=True).values
                unnorm = torch.exp(masked - m) * (sup > 0)
                att = unnorm / unnorm.sum(dim=-1, keepdim=True).clamp_min(1e-12)
                agg = torch.einsum("bhij,bjhf->bihf", att, z)
                outs = agg if outs is None else outs + agg
            h = outs.reshape(b, n, -1)
            inter[f"layer_{li}"] = h
            h = torch.nn.functional.elu(h) * mask.unsqueeze(-1)
        pred = self.readout(h, mask)
        inter["pred"] = pred
        return pred, inter


class TorchMPNN(nn.Module):
    """Eager-torch MPNN: per-edge-type linear messages aggregated by the
    normalized operators + a fused-gate GRU shared across propagation
    steps — the reference `model/mpnn.py` semantics (SURVEY.md §2.5)
    as an eager Python step loop."""

    def __init__(
        self,
        num_atom: int,
        state_dim: int,
        num_task: int,
        num_prop: int = 3,
        num_ops: int = 3,
        node_feat_dim: int = 0,
        output_hidden_dim: Sequence[int] = (),
    ):
        super().__init__()
        self.num_prop = num_prop
        self.atom_embed = nn.Embedding(num_atom, state_dim)
        self.in_proj = (
            nn.Linear(state_dim + node_feat_dim, state_dim)
            if node_feat_dim > 0
            else None
        )
        self.w_msg = nn.Parameter(torch.zeros(state_dim, num_ops * state_dim))
        self.w_in = nn.Parameter(torch.zeros(state_dim, 3 * state_dim))
        self.w_st = nn.Parameter(torch.zeros(state_dim, 3 * state_dim))
        self.b_gru = nn.Parameter(torch.zeros(3 * state_dim))
        self.readout = AttentionReadoutT(state_dim, num_task, output_hidden_dim)

    def forward(self, batch: dict) -> Tuple[Tensor, Dict[str, Tensor]]:
        inter: Dict[str, Tensor] = {}
        mask = batch["mask"]
        ops = batch["ops"]
        b, n = mask.shape
        num_e = ops.shape[1]
        h = self.atom_embed(batch["atom_type"])
        if batch.get("node_feat") is not None and batch["node_feat"].shape[-1] > 0:
            h = torch.cat([h, batch["node_feat"]], dim=-1)
        h = h * mask.unsqueeze(-1)
        if self.in_proj is not None:
            h = self.in_proj(h)
        inter["encoder"] = h
        dim = h.shape[-1]
        for step in range(self.num_prop):
            z = (h @ self.w_msg).reshape(b, n, num_e, dim).permute(0, 2, 1, 3)
            m = torch.einsum("beij,bejf->bif", ops, z)
            gates_in = m @ self.w_in + self.b_gru
            gates_st = h @ self.w_st
            zi, ri, ci = gates_in.chunk(3, dim=-1)
            zs, rs, cs = gates_st.chunk(3, dim=-1)
            update = torch.sigmoid(zi + zs)
            reset = torch.sigmoid(ri + rs)
            cand = torch.tanh(ci + reset * cs)
            h = ((1.0 - update) * h + update * cand) * mask.unsqueeze(-1)
            inter[f"prop_{step}"] = h
        pred = self.readout(h, mask)
        inter["pred"] = pred
        return pred, inter


class TorchGPNN(nn.Module):
    """Eager-torch GPNN in the *reference's* subgraph form: per graph,
    each intra step gathers every cluster's node set and propagates a
    dense subgraph operator over it; each cut step gathers the boundary
    node set and propagates only the partition-crossing edges. This is
    deliberately the scatter/gather formulation (`[R] model/gpnn.py` +
    `utils/spectral_graph_partition.py`), so agreement with the flax
    masked-dense schedule proves the two formulations compute the same
    function — the round-1 fidelity question."""

    def __init__(
        self,
        num_atom: int,
        embed_dim: int,
        hidden_dim: Sequence[int],
        num_task: int,
        num_prop: int = 2,
        num_intra_prop: int = 1,
        num_cut_prop: int = 1,
        num_ops: int = 3,
        node_feat_dim: int = 0,
        output_hidden_dim: Sequence[int] = (),
    ):
        super().__init__()
        self.schedule = (num_prop, num_intra_prop, num_cut_prop)
        self.atom_embed = nn.Embedding(num_atom, embed_dim)
        f_in = embed_dim + node_feat_dim
        self.intra = nn.ModuleDict()
        self.cut = nn.ModuleDict()
        self.carry = nn.ModuleDict()
        for li, dim in enumerate(hidden_dim):
            width = f_in
            for p in range(num_prop):
                for i in range(num_intra_prop):
                    self.intra[f"{li}_{p}_{i}"] = nn.Linear(
                        width * (1 + num_ops), dim
                    )
                    width = dim
                for c in range(num_cut_prop):
                    self.cut[f"{li}_{p}_{c}"] = nn.Linear(
                        width * (1 + num_ops), dim
                    )
                    if width != dim:
                        self.carry[f"{li}_{p}_{c}"] = nn.Linear(width, dim)
                    width = dim
            f_in = dim
        self.hidden_dim = tuple(hidden_dim)
        self.readout = AttentionReadoutT(f_in, num_task, output_hidden_dim)

    @staticmethod
    def _sub_step(lin: nn.Linear, ops_sub: Tensor, h_sub: Tensor) -> Tensor:
        """One propagation on a gathered subgraph: per-edge-type
        messages concat self state, linear, relu. ops_sub [E,m,m],
        h_sub [m,F]."""
        msgs = [ops_sub[e] @ h_sub for e in range(ops_sub.shape[0])]
        z = torch.cat([h_sub] + msgs, dim=-1)
        return torch.relu(lin(z))

    def forward(self, batch: dict) -> Tuple[Tensor, Dict[str, Tensor]]:
        inter: Dict[str, Tensor] = {}
        mask = batch["mask"]
        ops = batch["ops"]
        cluster = batch["cluster"].long()
        b, n = mask.shape
        num_prop, n_intra, n_cut = self.schedule
        h = self.atom_embed(batch["atom_type"])
        if batch.get("node_feat") is not None and batch["node_feat"].shape[-1] > 0:
            h = torch.cat([h, batch["node_feat"]], dim=-1)
        h = h * mask.unsqueeze(-1)
        inter["encoder"] = h

        outs = []
        for g in range(b):  # eager per-graph subgraph schedule
            hg = h[g].clone()
            mg = mask[g] > 0
            cg = cluster[g]
            same = (cg[:, None] == cg[None, :]) & mg[:, None] & mg[None, :]
            cross = (~(cg[:, None] == cg[None, :])) & mg[:, None] & mg[None, :]
            intra_ops = ops[g] * same.float()
            cut_ops = ops[g] * cross.float()
            boundary = (cut_ops[0] != 0.0).sum(-1) > 0
            boundary = boundary & mg
            idx_b = torch.nonzero(boundary).flatten()
            clusters = [
                torch.nonzero((cg == c) & mg).flatten()
                for c in cg[mg].unique()
            ]
            for li, dim in enumerate(self.hidden_dim):
                for p in range(num_prop):
                    for i in range(n_intra):
                        new = torch.zeros(n, dim)
                        for idx in clusters:
                            sub = intra_ops[:, idx][:, :, idx]
                            new[idx] = self._sub_step(
                                self.intra[f"{li}_{p}_{i}"], sub, hg[idx]
                            )
                        hg = new
                    for c in range(n_cut):
                        # the cut update consumes the PRE-carry state
                        # (flax feeds Dense_cut before the carry
                        # projection); the carry only re-widths the
                        # pass-through nodes
                        pre = hg
                        if f"{li}_{p}_{c}" in self.carry:
                            hg = torch.where(
                                mg[:, None],
                                self.carry[f"{li}_{p}_{c}"](pre),
                                torch.zeros(1),
                            )
                        else:
                            hg = pre.clone()
                        if idx_b.numel():
                            sub = cut_ops[:, idx_b][:, :, idx_b]
                            hg[idx_b] = self._sub_step(
                                self.cut[f"{li}_{p}_{c}"], sub, pre[idx_b]
                            )
            outs.append(hg)
        h = torch.stack(outs) * mask.unsqueeze(-1)
        inter["final_nodes"] = h
        pred = self.readout(h, mask)
        inter["pred"] = pred
        return pred, inter


class _SimpleConvBase(nn.Module):
    """Shared skeleton of the four 'easy' reference models (GCN /
    ChebyNet / DCNN / GraphSAGE, SURVEY.md §2.5): atom embedding ⊕
    continuous features → per-layer propagation features → Linear →
    nonlinearity → mask → gated-attention readout. Subclasses provide
    the per-layer feature list and the post-Linear activation."""

    def __init__(
        self,
        num_atom: int,
        embed_dim: int,
        hidden_dim: Sequence[int],
        num_task: int,
        feats_per_input: int,
        num_ops: int = 3,
        node_feat_dim: int = 0,
        output_hidden_dim: Sequence[int] = (),
    ):
        super().__init__()
        self.num_ops = num_ops
        self.atom_embed = nn.Embedding(num_atom, embed_dim)
        f_in = embed_dim + node_feat_dim
        self.layers = nn.ModuleList()
        for dim in hidden_dim:
            self.layers.append(nn.Linear(f_in * feats_per_input, dim))
            f_in = dim
        self.readout = AttentionReadoutT(f_in, num_task, output_hidden_dim)

    def _encode(self, batch: dict) -> Tensor:
        h = self.atom_embed(batch["atom_type"])
        if batch.get("node_feat") is not None and batch["node_feat"].shape[-1] > 0:
            h = torch.cat([h, batch["node_feat"]], dim=-1)
        return h * batch["mask"].unsqueeze(-1)

    def _layer_feats(self, batch: dict, h: Tensor) -> List[Tensor]:
        raise NotImplementedError

    def _activate(self, z: Tensor) -> Tensor:
        return torch.relu(z)

    def forward(self, batch: dict) -> Tuple[Tensor, Dict[str, Tensor]]:
        inter: Dict[str, Tensor] = {}
        mask = batch["mask"]
        h = self._encode(batch)
        inter["encoder"] = h
        for li, lin in enumerate(self.layers):
            z = lin(torch.cat(self._layer_feats(batch, h), dim=-1))
            inter[f"layer_{li}"] = z
            h = self._activate(z) * mask.unsqueeze(-1)
        pred = self.readout(h, mask)
        inter["pred"] = pred
        return pred, inter


class TorchGCN(_SimpleConvBase):
    """Eager-torch GCN (`[R] model/gcn.py`): per layer, self state concat
    one-hop propagation through every operator channel, Linear, ReLU."""

    def __init__(self, num_atom, embed_dim, hidden_dim, num_task,
                 num_ops=3, node_feat_dim=0, output_hidden_dim=()):
        super().__init__(
            num_atom, embed_dim, hidden_dim, num_task,
            feats_per_input=1 + num_ops, num_ops=num_ops,
            node_feat_dim=node_feat_dim, output_hidden_dim=output_hidden_dim,
        )

    def _layer_feats(self, batch, h):
        ops = batch["ops"]
        return [h] + [torch.bmm(ops[:, e], h) for e in range(ops.shape[1])]


class TorchChebyNet(_SimpleConvBase):
    """Eager-torch ChebyNet (`[R] model/chebynet.py`): per operator
    channel the Chebyshev features ``T_0 h .. T_P h`` with the eager
    recurrence ``T_k = 2 S T_{k-1} − T_{k-2}`` (T_0 = h)."""

    def __init__(self, num_atom, embed_dim, hidden_dim, num_task,
                 poly_order=3, num_ops=3, node_feat_dim=0,
                 output_hidden_dim=()):
        self.poly_order = poly_order
        super().__init__(
            num_atom, embed_dim, hidden_dim, num_task,
            feats_per_input=num_ops * (poly_order + 1), num_ops=num_ops,
            node_feat_dim=node_feat_dim, output_hidden_dim=output_hidden_dim,
        )

    def _layer_feats(self, batch, h):
        ops = batch["ops"]
        parts = []
        for e in range(ops.shape[1]):
            t_prev, t_cur = h, torch.bmm(ops[:, e], h)
            parts.append(t_prev)
            if self.poly_order >= 1:
                parts.append(t_cur)
            for _ in range(self.poly_order - 1):
                t_prev, t_cur = t_cur, 2.0 * torch.bmm(ops[:, e], t_cur) - t_prev
                parts.append(t_cur)
        return parts


class TorchDCNN(_SimpleConvBase):
    """Eager-torch DCNN (`[R] model/dcnn.py`): self state concat the
    hop features ``P h .. P^H h`` of every operator channel (eager
    power loop)."""

    def __init__(self, num_atom, embed_dim, hidden_dim, num_task,
                 max_hop=3, num_ops=3, node_feat_dim=0,
                 output_hidden_dim=()):
        self.max_hop = max_hop
        super().__init__(
            num_atom, embed_dim, hidden_dim, num_task,
            feats_per_input=1 + num_ops * max_hop, num_ops=num_ops,
            node_feat_dim=node_feat_dim, output_hidden_dim=output_hidden_dim,
        )

    def _layer_feats(self, batch, h):
        ops = batch["ops"]
        parts = [h]
        for e in range(ops.shape[1]):
            cur = h
            for _ in range(self.max_hop):
                cur = torch.bmm(ops[:, e], cur)
                parts.append(cur)
        return parts


class TorchGraphSAGE(_SimpleConvBase):
    """Eager-torch GraphSAGE (`[R] model/graph_sage.py`): exact neighbor
    mean over each channel's support (recomputed from the operator, so
    independent of its normalization), concat self, Linear, ReLU,
    L2-normalize."""

    def __init__(self, num_atom, embed_dim, hidden_dim, num_task,
                 num_ops=3, node_feat_dim=0, output_hidden_dim=()):
        super().__init__(
            num_atom, embed_dim, hidden_dim, num_task,
            feats_per_input=1 + num_ops, num_ops=num_ops,
            node_feat_dim=node_feat_dim, output_hidden_dim=output_hidden_dim,
        )

    def _layer_feats(self, batch, h):
        ops = batch["ops"]
        mask = batch["mask"]
        support = (ops > 0).float() * (
            mask.unsqueeze(-1) * mask.unsqueeze(-2)
        ).unsqueeze(1)
        deg = support.sum(-1, keepdim=True)
        mean_op = support / deg.clamp_min(1.0)
        return [h] + [
            torch.bmm(mean_op[:, e], h) for e in range(ops.shape[1])
        ]

    def _activate(self, z):
        h = torch.relu(z)
        norm = torch.sqrt((h * h).sum(-1, keepdim=True).clamp_min(1e-12))
        return h / norm
