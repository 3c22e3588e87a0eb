"""Layer-by-layer activation parity: flax models vs eager-torch twins.

The torch twins (tests/parity/torch_twin.py) independently restate the
reference semantics (SURVEY.md §2.3/§2.4) in eager PyTorch. Fixed flax
weights are copied into them and per-layer activations are diffed on
three graph-shape regimes (mixed sizes, full/near-full with continuous
node features, tiny graphs forcing Lanczos breakdown). This is the
offline half of the 1e-4-MAE parity target (VERDICT round 1, item 1):
the moment real reference weights/data appear, the same transfer +
diff machinery asserts end-to-end parity.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from lanczosnet_tpu.models.ada_lanczos_net import AdaLanczosNet
from lanczosnet_tpu.models.base import mae_loss
from lanczosnet_tpu.models.lanczos_net import LanczosNet

from helpers import NUM_EDGE, NUM_TASK, make_batch, random_graphs
from parity.torch_twin import (
    TorchAdaLanczosNet,
    TorchLanczosNet,
    batched_lanczos_ritz_t,
    lanczos_tridiag_t,
    sym_normalize_t,
)
from parity.transfer import load_ada_lanczos_net, load_lanczos_net

HIDDEN = (20, 16, 12)
SHORT = (1, 2)
LONG = (3, 5)
FILTER_HIDDEN = 8
OUT_HIDDEN = (10,)


def _graphs_with_feat(rng, num, n_lo, n_hi, fc=3):
    graphs = random_graphs(rng, num, n_lo=n_lo, n_hi=n_hi)
    for g in graphs:
        n = g["atom_type"].shape[0]
        g["node_feat"] = rng.standard_normal((n, fc)).astype(np.float32)
    return graphs


def _shapes():
    """Three graph-shape regimes; k chosen so regime C hits breakdown."""
    rng = np.random.default_rng(7)
    return [
        ("mixed", make_batch(rng, num=3, n_max=12, with_ritz=True, k=6)),
        (
            "full+feat",
            make_batch(
                rng,
                num=2,
                n_max=16,
                with_ritz=True,
                k=8,
                graphs=_graphs_with_feat(rng, 2, 14, 16),
            ),
        ),
        (
            "tiny/breakdown",
            make_batch(
                rng,
                num=4,
                n_max=9,
                with_ritz=True,
                k=6,
                graphs=random_graphs(rng, 4, n_lo=2, n_hi=4),
            ),
        ),
    ]


def _to_torch_batch(batch):
    def _t(x):
        return torch.from_numpy(np.asarray(x).copy())

    d = {
        "atom_type": _t(batch.atom_type).long(),
        "node_feat": _t(batch.node_feat),
        "ops": _t(batch.ops),
        "mask": _t(batch.mask),
        "label": _t(batch.label),
    }
    if batch.ritz_val is not None:
        d["ritz_val"] = _t(batch.ritz_val)
        d["ritz_vec"] = _t(batch.ritz_vec)
    if batch.cluster is not None:
        d["cluster"] = _t(batch.cluster)
    return d


def _flax_intermediates(model, params, batch):
    out, state = model.apply(
        {"params": params},
        batch,
        deterministic=True,
        capture_intermediates=True,
        mutable=["intermediates"],
    )
    return out, state["intermediates"]


def _cmp(name, torch_val, flax_val, atol):
    t = torch_val.detach().numpy()
    f = np.asarray(flax_val)
    assert t.shape == f.shape, f"{name}: shape {t.shape} vs {f.shape}"
    err = np.abs(t - f).max()
    assert err <= atol, f"{name}: max abs diff {err:.2e} > {atol:.0e}"


@pytest.mark.parametrize("shape_name,batch", _shapes(), ids=lambda x: x if isinstance(x, str) else "")
def test_lanczos_net_activation_parity(shape_name, batch):
    """Per-layer activations of flax LanczosNet == torch twin ≤1e-5."""
    fc = batch.node_feat.shape[-1]
    k = batch.ritz_val.shape[-1]
    model = LanczosNet(
        num_atom=8,
        embed_dim=10,
        hidden_dim=HIDDEN,
        num_task=NUM_TASK,
        short_diffusion_dist=SHORT,
        long_diffusion_dist=LONG,
        num_eig_vec=k,
        filter_hidden_dim=FILTER_HIDDEN,
        output_hidden_dim=OUT_HIDDEN,
    )
    params = model.init(jax.random.PRNGKey(0), batch, deterministic=True)["params"]
    tmodel = TorchLanczosNet(
        num_atom=8,
        embed_dim=10,
        hidden_dim=HIDDEN,
        num_task=NUM_TASK,
        short_diffusion_dist=SHORT,
        long_diffusion_dist=LONG,
        filter_hidden_dim=FILTER_HIDDEN,
        output_hidden_dim=OUT_HIDDEN,
        num_ops=NUM_EDGE + 1,
        node_feat_dim=fc,
    )
    load_lanczos_net(tmodel, params, len(HIDDEN), LONG)

    fpred, inter = _flax_intermediates(model, params, batch)
    with torch.no_grad():
        tpred, tinter = tmodel(_to_torch_batch(batch))

    _cmp("encoder", tinter["encoder"], inter["NodeEncoder_0"]["__call__"][0], 1e-5)
    filt_bank = inter["spectral_filters"]["__call__"][0]  # [B,L,S,K]
    for li in range(len(HIDDEN)):
        _cmp(
            f"spectral_filter_{li}",
            tinter[f"spectral_filter_{li}"],
            filt_bank[:, li],
            1e-5,
        )
        _cmp(
            f"layer_{li}",
            tinter[f"layer_{li}"],
            inter[f"layer_{li}"]["__call__"][0],
            1e-5,
        )
    _cmp("pred", tpred, fpred, 1e-5)
    # loss parity: masked MAE == torch L1
    tloss = torch.nn.functional.l1_loss(tpred, torch.from_numpy(np.asarray(batch.label)))
    floss = mae_loss(fpred, batch.label)
    np.testing.assert_allclose(float(tloss), float(floss), atol=1e-6)


@pytest.mark.parametrize("shape_name,batch", _shapes(), ids=lambda x: x if isinstance(x, str) else "")
def test_ada_lanczos_net_activation_parity(shape_name, batch):
    """Flax AdaLanczosNet == torch twin through the learned operator,
    the in-forward Lanczos, and every layer. Post-Lanczos tolerances are
    wider (f32 recursion + eigh of near-degenerate tridiagonals)."""
    fc = batch.node_feat.shape[-1]
    k = int(batch.ritz_val.shape[-1])
    kwargs = dict(
        num_atom=8,
        embed_dim=10,
        hidden_dim=HIDDEN,
        num_task=NUM_TASK,
        kernel_dim=6,
        short_diffusion_dist=SHORT,
        long_diffusion_dist=LONG,
        num_eig_vec=k,
        filter_hidden_dim=FILTER_HIDDEN,
        output_hidden_dim=OUT_HIDDEN,
    )
    model = AdaLanczosNet(**kwargs, lanczos_impl="scan")
    params = model.init(jax.random.PRNGKey(1), batch, deterministic=True)["params"]
    tmodel = TorchAdaLanczosNet(
        **kwargs, num_ops=NUM_EDGE + 1, node_feat_dim=fc
    )
    load_ada_lanczos_net(tmodel, params, len(HIDDEN), LONG)

    fpred, inter = _flax_intermediates(model, params, batch)
    with torch.no_grad():
        tpred, tinter = tmodel(_to_torch_batch(batch))

    _cmp("encoder", tinter["encoder"], inter["NodeEncoder_0"]["__call__"][0], 1e-5)
    _cmp(
        "kernel_embed",
        tinter["kernel_embed"],
        inter["kernel_embed"]["__call__"][0],
        1e-5,
    )
    _cmp("learned_operator", tinter["learned_operator"], inter["s_op"][0], 1e-5)
    # Ritz values: both ascending; recursion in f32 → wider tolerance
    _cmp("ritz_val", tinter["ritz_val"], inter["ritz_val"][0], 5e-4)
    for li in range(len(HIDDEN)):
        _cmp(
            f"layer_{li}",
            tinter[f"layer_{li}"],
            inter[f"layer_{li}"]["__call__"][0],
            1e-3,
        )
    _cmp("pred", tpred, fpred, 1e-3)


def test_lanczos_recursion_parity():
    """alphas/betas of the jax scan vs the eager torch loop — the
    tridiagonal is unique given (operator, start vector), so this pins
    the recursion itself, not just rotation-invariant downstream
    features."""
    from lanczosnet_tpu.ops.lanczos import lanczos_tridiag

    rng = np.random.default_rng(11)
    batch = make_batch(rng, num=4, n_max=12)
    s = np.asarray(batch.ops[:, 0])
    mask = np.asarray(batch.mask)
    for b in range(s.shape[0]):
        a_j, b_j, q_j = lanczos_tridiag(jnp.asarray(s[b]), jnp.asarray(mask[b]), 6)
        a_t, b_t, q_t = lanczos_tridiag_t(
            torch.from_numpy(s[b]), torch.from_numpy(mask[b]), 6
        )
        np.testing.assert_allclose(np.asarray(a_j), a_t.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(b_j), b_t.numpy(), atol=2e-5)
        np.testing.assert_allclose(np.asarray(q_j), q_t.numpy(), atol=5e-5)


def test_ritz_reconstruction_parity():
    """V diag(D) Vᵀ from jax vs torch agree (rotation-invariant)."""
    from lanczosnet_tpu.ops.lanczos import batched_lanczos_ritz

    rng = np.random.default_rng(13)
    batch = make_batch(rng, num=3, n_max=10)
    s = batch.ops[:, 0]
    k = 5
    wv_j = batched_lanczos_ritz(s, batch.mask, k)
    w_t, v_t = batched_lanczos_ritz_t(
        torch.from_numpy(np.asarray(s)), torch.from_numpy(np.asarray(batch.mask)), k
    )
    rec_j = np.einsum(
        "bnk,bk,bmk->bnm", np.asarray(wv_j[1]), np.asarray(wv_j[0]), np.asarray(wv_j[1])
    )
    rec_t = np.einsum("bnk,bk,bmk->bnm", v_t.numpy(), w_t.numpy(), v_t.numpy())
    np.testing.assert_allclose(rec_j, rec_t, atol=5e-5)


def test_sym_normalize_parity():
    rng = np.random.default_rng(17)
    adj = rng.random((3, 8, 8)).astype(np.float32)
    adj = adj + adj.transpose(0, 2, 1)
    mask = np.ones((3, 8), np.float32)
    mask[0, 5:] = 0.0
    mask[2, 2:] = 0.0
    from lanczosnet_tpu.ops.normalize import sym_normalize

    j = np.asarray(sym_normalize(jnp.asarray(adj * (mask[:, :, None] * mask[:, None, :])), jnp.asarray(mask)))
    t = sym_normalize_t(torch.from_numpy(adj), torch.from_numpy(mask)).numpy()
    np.testing.assert_allclose(j, t, atol=1e-6)


def test_gat_activation_parity():
    """Flax GAT (dense masked multi-head attention) == torch twin: the
    masked neighborhood softmax incl. self-loops is the distinctive
    math not covered by the LanczosNet twins."""
    from lanczosnet_tpu.models.gat import GAT
    from parity.torch_twin import TorchGAT
    from parity.transfer import load_gat

    rng = np.random.default_rng(11)
    batch = make_batch(rng, num=3, n_max=12)
    fc = batch.node_feat.shape[-1]
    model = GAT(
        num_atom=8, embed_dim=10, hidden_dim=(16, 12), num_task=NUM_TASK,
        num_heads=4, output_hidden_dim=OUT_HIDDEN,
    )
    params = model.init(jax.random.PRNGKey(2), batch, deterministic=True)[
        "params"
    ]
    tmodel = TorchGAT(
        num_atom=8, embed_dim=10, hidden_dim=(16, 12), num_task=NUM_TASK,
        num_heads=4, num_ops=NUM_EDGE + 1, node_feat_dim=fc,
        output_hidden_dim=OUT_HIDDEN,
    )
    load_gat(tmodel, params, 2, NUM_EDGE + 1)

    fpred, inter = _flax_intermediates(model, params, batch)
    with torch.no_grad():
        tpred, tinter = tmodel(_to_torch_batch(batch))
    _cmp("encoder", tinter["encoder"], inter["NodeEncoder_0"]["__call__"][0], 1e-5)
    for li in range(2):
        _cmp(
            f"layer_{li}",
            tinter[f"layer_{li}"],
            inter[f"layer_{li}"]["__call__"][0],
            1e-4,
        )
    _cmp("pred", tpred, fpred, 1e-4)


def test_mpnn_activation_parity():
    """Flax MPNN (lax.scan of fused-gate GRU propagation) == torch twin
    (eager Python step loop): same messages, gates, and masked update —
    end-to-end pred equality is sensitive to every step."""
    from lanczosnet_tpu.models.mpnn import MPNN
    from parity.torch_twin import TorchMPNN
    from parity.transfer import load_mpnn

    rng = np.random.default_rng(12)
    batch = make_batch(rng, num=3, n_max=12)
    fc = batch.node_feat.shape[-1]
    model = MPNN(
        num_atom=8, hidden_dim=(16,), num_task=NUM_TASK, num_prop=3,
        output_hidden_dim=OUT_HIDDEN,
    )
    params = model.init(jax.random.PRNGKey(3), batch, deterministic=True)[
        "params"
    ]
    tmodel = TorchMPNN(
        num_atom=8, state_dim=16, num_task=NUM_TASK, num_prop=3,
        num_ops=NUM_EDGE + 1, node_feat_dim=fc,
        output_hidden_dim=OUT_HIDDEN,
    )
    load_mpnn(tmodel, params)

    fpred, inter = _flax_intermediates(model, params, batch)
    with torch.no_grad():
        tpred, tinter = tmodel(_to_torch_batch(batch))
    _cmp("pred", tpred, fpred, 1e-4)


def test_gpnn_subgraph_schedule_parity():
    """Flax GPNN (masked-dense schedule) == torch twin in the
    REFERENCE's explicit subgraph form (per-cluster gather/propagate/
    scatter, cut graph over the boundary node set): the two
    formulations must compute the same function — direct evidence for
    the round-1 schedule-fidelity question."""
    from lanczosnet_tpu.models.gpnn import GPNN
    from parity.torch_twin import TorchGPNN
    from parity.transfer import load_gpnn

    rng = np.random.default_rng(13)
    batch = make_batch(rng, num=3, n_max=12, with_cluster=True)
    fc = batch.node_feat.shape[-1]
    schedule = (2, 1, 1)
    model = GPNN(
        num_atom=8, embed_dim=10, hidden_dim=(14, 12), num_task=NUM_TASK,
        num_prop=schedule[0], num_intra_prop=schedule[1],
        num_cut_prop=schedule[2], output_hidden_dim=OUT_HIDDEN,
    )
    params = model.init(jax.random.PRNGKey(4), batch, deterministic=True)[
        "params"
    ]
    tmodel = TorchGPNN(
        num_atom=8, embed_dim=10, hidden_dim=(14, 12), num_task=NUM_TASK,
        num_prop=schedule[0], num_intra_prop=schedule[1],
        num_cut_prop=schedule[2], num_ops=NUM_EDGE + 1, node_feat_dim=fc,
        output_hidden_dim=OUT_HIDDEN,
    )
    load_gpnn(tmodel, params, 2, schedule)

    fpred, inter = _flax_intermediates(model, params, batch)
    with torch.no_grad():
        tpred, tinter = tmodel(_to_torch_batch(batch))
    _cmp("pred", tpred, fpred, 1e-4)


def _simple_parity_case(flax_cls, torch_cls, seed, flax_kwargs=None,
                        torch_kwargs=None, atol=1e-5):
    """Shared driver for the four 'easy' twins (GCN / ChebyNet / DCNN /
    GraphSAGE): init flax params, copy into the torch twin, diff
    encoder / per-layer Dense outputs / prediction (VERDICT r2 item 4 —
    the whole README table is parity-ready, not just the hard half)."""
    from parity.transfer import load_simple_conv

    rng = np.random.default_rng(seed)
    batch = make_batch(rng, num=3, n_max=12)
    fc = batch.node_feat.shape[-1]
    hidden = (16, 12)
    model = flax_cls(
        num_atom=8, embed_dim=10, hidden_dim=hidden, num_task=NUM_TASK,
        output_hidden_dim=OUT_HIDDEN, **(flax_kwargs or {}),
    )
    params = model.init(jax.random.PRNGKey(seed), batch, deterministic=True)[
        "params"
    ]
    tmodel = torch_cls(
        num_atom=8, embed_dim=10, hidden_dim=hidden, num_task=NUM_TASK,
        num_ops=NUM_EDGE + 1, node_feat_dim=fc,
        output_hidden_dim=OUT_HIDDEN, **(torch_kwargs or {}),
    )
    load_simple_conv(tmodel, params, len(hidden))

    fpred, inter = _flax_intermediates(model, params, batch)
    with torch.no_grad():
        tpred, tinter = tmodel(_to_torch_batch(batch))
    _cmp("encoder", tinter["encoder"], inter["NodeEncoder_0"]["__call__"][0], atol)
    for li in range(len(hidden)):
        _cmp(
            f"layer_{li}",
            tinter[f"layer_{li}"],
            inter[f"layer_{li}"]["__call__"][0],
            atol,
        )
    _cmp("pred", tpred, fpred, atol)
    # negative control: perturb one layer kernel — parity must break
    with torch.no_grad():
        tmodel.layers[0].weight += 1e-2
        tpred2, _ = tmodel(_to_torch_batch(batch))
    assert np.abs(tpred2.numpy() - np.asarray(fpred)).max() > atol


def test_gcn_activation_parity():
    from lanczosnet_tpu.models.gcn import GCN
    from parity.torch_twin import TorchGCN

    _simple_parity_case(GCN, TorchGCN, seed=21)


def test_chebynet_activation_parity():
    from lanczosnet_tpu.models.chebynet import ChebyNet
    from parity.torch_twin import TorchChebyNet

    _simple_parity_case(
        ChebyNet, TorchChebyNet, seed=22,
        flax_kwargs={"poly_order": 3}, torch_kwargs={"poly_order": 3},
    )


def test_dcnn_activation_parity():
    from lanczosnet_tpu.models.dcnn import DCNN
    from parity.torch_twin import TorchDCNN

    _simple_parity_case(
        DCNN, TorchDCNN, seed=23,
        flax_kwargs={"max_hop": 3}, torch_kwargs={"max_hop": 3},
    )


def test_graph_sage_activation_parity():
    from lanczosnet_tpu.models.graph_sage import GraphSAGE
    from parity.torch_twin import TorchGraphSAGE

    _simple_parity_case(GraphSAGE, TorchGraphSAGE, seed=24)
