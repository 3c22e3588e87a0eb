"""Flax ↔ torch weight transfer for the parity twins.

Flax `nn.Dense` kernels are ``[in, out]``; torch `nn.Linear` weights are
``[out, in]`` — transposed on copy. `nn.Embed.embedding` and
`nn.Embedding.weight` share the ``[num, dim]`` layout.

The maps are explicit (not generic tree walks) so that a model-structure
change breaks the test loudly instead of silently skipping params.
"""

from __future__ import annotations

import numpy as np
import torch


def _linear(tmod: torch.nn.Linear, fparams: dict) -> None:
    tmod.weight.data = torch.from_numpy(np.asarray(fparams["kernel"]).T.copy())
    tmod.bias.data = torch.from_numpy(np.asarray(fparams["bias"]).copy())


def _readout(treadout, fparams: dict) -> None:
    _linear(treadout.att_gate, fparams["att_gate"])
    for i, lin in enumerate(treadout.out_hidden):
        _linear(lin, fparams[f"out_hidden_{i}"])
    _linear(treadout.out_proj, fparams["out_proj"])


def _spectral_filters(tmodel, params: dict, num_layers: int, long_dists) -> None:
    """The flax filters are one cross-layer bank (w1 [L,S,2,H], b1
    [L,S,H], w2 [L,S,H,1], b2 [L,S,1]); the torch twin keeps the
    reference's per-(layer, scale) MLPs — slice (li, s) for each."""
    sf = params["spectral_filters"]
    w1, b1 = np.asarray(sf["w1"]), np.asarray(sf["b1"])
    w2, b2 = np.asarray(sf["w2"]), np.asarray(sf["b2"])
    for li in range(num_layers):
        for s, t in enumerate(long_dists):
            seq = tmodel.spectral_filters[li].filters[f"t{t}"]
            seq[0].weight.data = torch.from_numpy(w1[li, s].T.copy())
            seq[0].bias.data = torch.from_numpy(b1[li, s].copy())
            seq[2].weight.data = torch.from_numpy(w2[li, s].T.copy())
            seq[2].bias.data = torch.from_numpy(b2[li, s].copy())


def load_lanczos_net(tmodel, params: dict, num_layers: int, long_dists) -> None:
    """Copy flax LanczosNet params into a TorchLanczosNet."""
    tmodel.atom_embed.weight.data = torch.from_numpy(
        np.asarray(params["NodeEncoder_0"]["atom_embed"]["embedding"]).copy()
    )
    for li in range(num_layers):
        _linear(tmodel.layers[li], params[f"layer_{li}"])
    _spectral_filters(tmodel, params, num_layers, long_dists)
    _readout(tmodel.readout, params["AttentionReadout_0"])


def load_ada_lanczos_net(tmodel, params: dict, num_layers: int, long_dists) -> None:
    """Copy flax AdaLanczosNet params into a TorchAdaLanczosNet."""
    load_lanczos_net(tmodel, params, num_layers, long_dists)
    _linear(tmodel.kernel_embed, params["kernel_embed"])


def load_gat(tmodel, params: dict, num_layers: int, num_ops: int) -> None:
    """Copy flax GAT params into a TorchGAT (no-bias Linears: kernel
    only, transposed)."""
    tmodel.atom_embed.weight.data = torch.from_numpy(
        np.asarray(params["NodeEncoder_0"]["atom_embed"]["embedding"]).copy()
    )
    for li in range(num_layers):
        lp = params[f"layer_{li}"]
        layer = tmodel.layers[li]
        for e in range(num_ops):
            for name in (f"w_{e}", f"a_src_{e}", f"a_dst_{e}"):
                layer[name].weight.data = torch.from_numpy(
                    np.asarray(lp[name]["kernel"]).T.copy()
                )
    _readout(tmodel.readout, params["AttentionReadout_0"])


def load_mpnn(tmodel, params: dict) -> None:
    """Copy flax MPNN params into a TorchMPNN (raw param matrices share
    the [in, out] layout — no transpose)."""
    tmodel.atom_embed.weight.data = torch.from_numpy(
        np.asarray(params["NodeEncoder_0"]["atom_embed"]["embedding"]).copy()
    )
    if tmodel.in_proj is not None:
        _linear(tmodel.in_proj, params["in_proj"])
    for tname, fname in (
        ("w_msg", "w_msg"),
        ("w_in", "gru_w_in"),
        ("w_st", "gru_w_st"),
        ("b_gru", "gru_b"),
    ):
        getattr(tmodel, tname).data = torch.from_numpy(
            np.asarray(params[fname]).copy()
        )
    _readout(tmodel.readout, params["AttentionReadout_0"])


def load_gpnn(tmodel, params: dict, num_layers: int, schedule) -> None:
    """Copy flax GPNN params into a TorchGPNN (subgraph-form twin)."""
    num_prop, n_intra, n_cut = schedule
    tmodel.atom_embed.weight.data = torch.from_numpy(
        np.asarray(params["NodeEncoder_0"]["atom_embed"]["embedding"]).copy()
    )
    for li in range(num_layers):
        for p in range(num_prop):
            for i in range(n_intra):
                _linear(tmodel.intra[f"{li}_{p}_{i}"],
                        params[f"intra_{li}_{p}_{i}"])
            for c in range(n_cut):
                _linear(tmodel.cut[f"{li}_{p}_{c}"],
                        params[f"cut_{li}_{p}_{c}"])
                if f"carry_{li}_{p}_{c}" in params:
                    _linear(tmodel.carry[f"{li}_{p}_{c}"],
                            params[f"carry_{li}_{p}_{c}"])
    _readout(tmodel.readout, params["AttentionReadout_0"])


def load_simple_conv(tmodel, params: dict, num_layers: int) -> None:
    """Copy flax GCN / ChebyNet / DCNN / GraphSAGE params into their
    torch twins (shared skeleton: atom embedding, per-layer Dense,
    attention readout)."""
    tmodel.atom_embed.weight.data = torch.from_numpy(
        np.asarray(params["NodeEncoder_0"]["atom_embed"]["embedding"]).copy()
    )
    for li in range(num_layers):
        _linear(tmodel.layers[li], params[f"layer_{li}"])
    _readout(tmodel.readout, params["AttentionReadout_0"])
