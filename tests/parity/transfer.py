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


def _mlp2(tseq: torch.nn.Sequential, fparams: dict) -> None:
    """Flax base.MLP((hidden, 1)) → torch Sequential(Linear, ReLU, Linear)."""
    _linear(tseq[0], fparams["dense_0"])
    _linear(tseq[2], fparams["dense_1"])


def _readout(treadout, fparams: dict) -> None:
    _linear(treadout.att_gate, fparams["att_gate"])
    for i, lin in enumerate(treadout.out_hidden):
        _linear(lin, fparams[f"out_hidden_{i}"])
    _linear(treadout.out_proj, fparams["out_proj"])


def _spectral_filters(tmodel, params: dict, num_layers: int, long_dists) -> None:
    for li in range(num_layers):
        sf = params[f"spectral_filter_{li}"]
        for t in long_dists:
            _mlp2(tmodel.spectral_filters[li].filters[f"t{t}"], sf[f"filter_t{t}"])


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
