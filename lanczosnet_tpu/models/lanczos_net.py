"""LanczosNet — multi-scale spectral graph convolution (arXiv:1901.01484).

Parity with reference `model/lanczos_net.py` (SURVEY.md §2.3):

- **short scales** ``t ∈ short_diffusion_dist``: exact powers ``S^t X``
  via the diffusion `lax.scan` (channel-0 operator);
- **long scales** ``t ∈ long_diffusion_dist``: low-rank approximation
  ``V · diag(f_t(D)) · Vᵀ · X`` from the K precomputed Ritz pairs
  (``batch.ritz_val/ritz_vec``, produced by ops/lanczos.py in the data
  pipeline), where ``f_t`` is a learned per-(layer, scale) MLP over
  Ritz-value features ``[D, D^t]`` (``spectral_filter_kind: MLP``) or
  the plain power ``D^t`` (ablation, ``spectral_filter_kind: none``);
- **one-hop per-edge-type terms** from the remaining operator channels;
- concat ``[X ‖ short ‖ long ‖ per-type]`` → Dense → ReLU → Dropout,
  then the shared gated-attention readout.

Everything is batched dense matmul. At molecular scale (N ≤ 128) the
step is op-count bound, so the layer fuses: all layers' filter MLPs
evaluate as one pre-loop bank, operator powers S^t are computed once
per forward, long scales become explicit ``V f(D) Vᵀ`` matrices, and
short + long + edge channels apply to ``h`` in ONE stacked batched
matmul per layer (`spectral_layer_channels`). Large graphs keep the
factored low-rank path (forming [B,S,N,N] matrices costs S·N²·K MACs
vs K·N·F·(1+S) factored — the crossover is ~N=F).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from lanczosnet_tpu.core.graph_batch import GraphBatch
from lanczosnet_tpu.models.base import compute_dtype, edge_message_concat, flatten_feature_stack, AttentionReadout, NodeEncoder, NodeHead, SumDense
from lanczosnet_tpu.ops.poly import diffusion_features_at
from lanczosnet_tpu.ops.spectral import long_scale_features


class SpectralFilterBank(nn.Module):
    """All layers' per-scale filters in one program: [B,K] → [B,L,S,K].

    Second stage of the filter-bank collapse: the filters depend only on
    the Ritz values (layer-independent input), so every layer's MLP
    evaluates before the layer loop in TWO einsums total instead of two
    per layer — profiled r2, the per-layer filter MLPs were ~38 µs of a
    253 µs step at L=3. Weights are stacked ``[L, S, ...]``; per-(layer,
    scale) math is unchanged vs the reference's independent MLPs
    (tests/test_parity.py diffs each slice against the torch twin).
    """

    num_layers: int
    long_dists: Sequence[int]
    kind: str = "MLP"
    filter_hidden_dim: int = 16

    @nn.compact
    def __call__(self, ritz_val: jnp.ndarray) -> jnp.ndarray:
        # integer powers via lax.integer_pow (repeated squaring — exact
        # for negative Ritz values, unlike float pow); elementwise ops
        # fuse, so the per-scale loop costs no extra kernels.
        power = jnp.stack(
            [jax.lax.integer_pow(ritz_val, int(t)) for t in self.long_dists],
            axis=1,
        )  # [B,S,K]
        b = ritz_val.shape[0]
        l, s, h = self.num_layers, len(self.long_dists), self.filter_hidden_dim
        if self.kind.upper() != "MLP":
            return jnp.broadcast_to(power[:, None], (b, l) + power.shape[1:])
        base = jnp.broadcast_to(ritz_val[:, None, :], power.shape)
        feat = jnp.stack([base, power], axis=-1)  # [B,S,K,2]
        lecun = nn.initializers.lecun_normal(batch_axis=(0, 1))
        zeros = nn.initializers.zeros_init()
        w1 = self.param("w1", lecun, (l, s, 2, h))
        b1 = self.param("b1", zeros, (l, s, h))
        w2 = self.param("w2", lecun, (l, s, h, 1))
        b2 = self.param("b2", zeros, (l, s, 1))
        z = nn.relu(
            jnp.einsum(
                "bskc,lsch->blskh", feat, w1, preferred_element_type=jnp.float32
            )
            + b1[None, :, :, None, :]
        )
        out = (
            jnp.einsum(
                "blskh,lsho->blsko", z, w2, preferred_element_type=jnp.float32
            )
            + b2[None, :, :, None, :]
        )
        return out[..., 0]  # [B,L,S,K]


# Above this many padded nodes the fused channel-stack path (explicit
# [B,S,N,N] long-scale matrices) costs more FLOPs/memory than the
# low-rank two-matmul application — S·N²·K MACs to form the matrices vs
# K·N·F·(1+S) to apply them — so large graphs keep the factored path.
_FUSED_N_MAX = 128


def operator_powers(
    s_op: jnp.ndarray, dists: Sequence[int]
) -> jnp.ndarray:
    """Stack ``[S^t for t in dists]`` → [B,T,N,N], computed once per forward.

    For small N this turns LanczosNet's per-layer sequential short-scale
    chain (max(dists) dependent matvecs per layer) into a single stacked
    matmul per layer: the operator powers are layer-independent, so the
    chain amortizes over all L layers.
    """
    max_t = max(dists)
    pows = {1: s_op}
    cur = s_op
    for t in range(2, max_t + 1):
        cur = jax.lax.dot_general(
            s_op,
            cur,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        pows[t] = cur
    return jnp.stack([pows[t] for t in dists], axis=1)


def channel_stack(
    short_ops: jnp.ndarray | None,
    ritz_vec: jnp.ndarray | None,
    filt: jnp.ndarray | None,
    edge_ops: jnp.ndarray | None,
    dtype=None,
) -> jnp.ndarray:
    """One layer's propagation operators as a single ``[B, C, N, N]``
    stack: ``[S^t… ‖ V f_s(D) Vᵀ… ‖ A_e…]`` in that (c-major) order —
    the layout both fused appliers below contract against. ``dtype``
    (model.dtype) casts each channel AFTER its f32 formation so the
    stack is stored once at activation precision."""
    cast = (lambda x: x.astype(dtype)) if dtype is not None else (lambda x: x)
    chans = []
    if short_ops is not None:
        chans.append(cast(short_ops))
    if filt is not None:
        # M_s = V · diag(f_s(D)) · Vᵀ — explicit low-rank matrices; for
        # N ≤ _FUSED_N_MAX forming them is cheaper than the factored
        # two-matmul application and joins the fused stack.
        scaled_v = filt[:, :, None, :] * ritz_vec[:, None, :, :]  # [B,S,N,K]
        m = jax.lax.dot_general(
            scaled_v,
            ritz_vec,
            dimension_numbers=(((3,), (2,)), ((0,), (0,))),
        )  # [B,S,N,N]
        chans.append(cast(m))
    if edge_ops is not None:
        chans.append(cast(edge_ops))
    return jnp.concatenate(chans, axis=1) if len(chans) > 1 else chans[0]


def spectral_layer_channels(
    h: jnp.ndarray,
    short_ops: jnp.ndarray | None,
    ritz_vec: jnp.ndarray | None,
    filt: jnp.ndarray | None,
    edge_ops: jnp.ndarray | None,
    dtype=None,
) -> jnp.ndarray:
    """One fused matmul for a LanczosNet layer's propagation channels.

    Applies :func:`channel_stack` to ``h`` in a single batched
    contraction — profiled r2: the step program is op-count bound at QM8
    scale (N=32 fills a quarter of the 128 lanes), so collapsing ~6
    small matmuls per layer (3 sequential short hops, 2 low-rank
    long-scale products, 1 edge einsum) into one [B,C·N,N]×[B,N,F]
    product is the direct win; the per-channel math is unchanged.
    Returns ``[B,N,C·F]``.
    """
    stack = channel_stack(short_ops, ritz_vec, filt, edge_ops, dtype)
    feats = jnp.einsum(
        "bcij,bjf->bcif", stack, h, preferred_element_type=jnp.float32
    )
    if dtype is not None:
        feats = feats.astype(dtype)  # accumulate f32, store at act dtype
    return flatten_feature_stack(feats)


class FusedChannelDense(nn.Module):
    """``Dense(concat([h, flatten(stack @ h)]))`` with the Dense kernel
    folded INTO the channel contraction — an attempted MXU-depth fix
    for the molecular regime that MEASURED SLOWER end to end, kept as
    a reproducible negative result (PARITY.md, VERDICT r2 item 5).

    The straightforward order contracts over the node axis first
    (``Σ_j stack[b,c,i,j] h[b,j,f]``, K = N = 32 at the bench config —
    a quarter of the MXU's 128-deep systolic column), then mixes with
    the layer kernel (K = C·F, fine). Reassociating — first
    ``G[b,c,j,d] = Σ_f h[b,j,f] W_p[c,f,d]`` (K = F = 128), then
    ``Σ_{c,j} stack[b,c,i,j] G[b,c,j,d]`` (K = C·N = 256) — performs
    the IDENTICAL total FLOPs with every contraction at full MXU depth
    and never materializes the ``[B,N,C·F]`` concat. Isolated fwd+bwd
    at bench shapes it wins (163.6 vs 188.4 µs/step, v5e); in the FULL
    train step it loses 1.4× (291k → 203k graphs/s): the layer's big
    Dense (M = B·N = 2048, K = (1+C)·F = 1152) was already perfectly
    MXU-shaped, and this trades it for B·C = 512 tiny [N,F]×[F,D]
    batched matmuls that tile worse than the one K=N einsum they
    replace. The models therefore keep `spectral_layer_channels`;
    parameter names/shapes/init here match ``nn.Dense(features)`` on
    the ``[h ‖ c-major flattened channels]`` concat (checkpoints are
    interchangeable — `tests/test_models.py` proves the equivalence).
    """

    features: int

    @nn.compact
    def __call__(self, h: jnp.ndarray, stack: jnp.ndarray) -> jnp.ndarray:
        c = stack.shape[1]
        f = h.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            ((1 + c) * f, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        w_h = kernel[:f]  # [F, D]
        w_p = kernel[f:].reshape(c, f, self.features)  # [C, F, D]
        g = jnp.einsum(
            "bjf,cfd->bcjd", h, w_p, preferred_element_type=jnp.float32
        )
        out = jax.lax.dot_general(
            stack,
            g,
            dimension_numbers=(((1, 3), (1, 2)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [B, N, D]
        return out + h @ w_h + bias


class LanczosNet(nn.Module):
    num_atom: int
    embed_dim: int
    hidden_dim: Sequence[int]
    num_task: int
    short_diffusion_dist: Sequence[int] = (1, 2, 3)
    long_diffusion_dist: Sequence[int] = (5, 7, 10, 20, 30)
    num_eig_vec: int = 20
    spectral_filter_kind: str = "MLP"
    filter_hidden_dim: int = 16
    output_hidden_dim: Sequence[int] = ()
    dropout: float = 0.0
    task: str = "graph"  # "graph" (regression readout) | "node" (per-node logits)
    # `model.sum_dense: true` — apply each layer's Dense as
    # SumDense([h, prop]) (two kernel-row-slice matmuls summed in f32)
    # instead of Dense(concat([h, prop], -1)). Identical params/init/
    # checkpoints and the same math to f32-accumulation tolerance
    # (tests/test_models.py). Why it exists: at batch ≥ 128 XLA's
    # layout assignment flips the [B, N, 13F] concat to a batch-in-
    # middle layout ({2,0,1}) to feed its OutputBatchInSublanes dot
    # emitter, and the concat's BACKWARD splits become strided slices
    # (~190k cycles each, HLO-verified) plus layout-conversion copies —
    # the measured reason MFU halves from batch 64 → 128 while the
    # matmuls themselves scale linearly (PARITY.md r5 batch sweep).
    # SumDense never materializes the concat, so there is nothing to
    # split. Default off: at the reference working point (batch 64)
    # the one-big-matmul form is already optimal.
    sum_dense: bool = False
    # `model.dtype: bfloat16` — activation/compute dtype for the layer
    # loop. Params, the spectral filter bank, operator-power formation,
    # and the readout/loss all stay f32; the propagation einsums pin
    # f32 accumulation via preferred_element_type, while the bf16
    # nn.Dense matmuls rely on the TPU MXU's native f32 accumulation
    # for bf16 inputs (on a backend whose bf16 dot accumulates in bf16
    # they would lose precision). What bf16 buys is halved VMEM/HBM
    # traffic on the elementwise+activation side (the r3 step profile
    # charges 16% of device time to loop fusions and 5.8% to data
    # formatting — both byte-bound, not FLOP-bound). Default f32 =
    # bit-identical to the pre-knob model.
    dtype: Any = jnp.float32

    @classmethod
    def from_config(cls, cfg: dict) -> "LanczosNet":
        return cls(
            num_atom=cfg["num_atom"],
            embed_dim=cfg.get("embed_dim", cfg["hidden_dim"][0]),
            hidden_dim=tuple(cfg["hidden_dim"]),
            num_task=cfg["num_task"],
            short_diffusion_dist=tuple(cfg.get("short_diffusion_dist", (1, 2, 3))),
            long_diffusion_dist=tuple(cfg.get("long_diffusion_dist", (5, 7, 10, 20, 30))),
            num_eig_vec=cfg.get("num_eig_vec", 20),
            spectral_filter_kind=cfg.get("spectral_filter_kind", "MLP"),
            filter_hidden_dim=cfg.get("filter_hidden_dim", 16),
            output_hidden_dim=tuple(cfg.get("output_hidden_dim", ())),
            dropout=cfg.get("dropout", 0.0),
            task=cfg.get("task", "graph"),
            sum_dense=bool(cfg.get("sum_dense", False)),
            dtype=compute_dtype(cfg.get("dtype")),
        )

    @nn.compact
    def __call__(self, batch: GraphBatch, deterministic: bool = True) -> jnp.ndarray:
        if batch.ritz_val is None or batch.ritz_vec is None:
            raise ValueError(
                "LanczosNet needs precomputed Ritz pairs in the batch "
                "(batch.ritz_val/ritz_vec); enable them in the dataset config "
                "or use AdaLanczosNet to compute them in-forward."
            )
        cdt = self.dtype
        mixed = cdt != jnp.float32
        h = NodeEncoder(self.num_atom, self.embed_dim)(batch).astype(cdt)
        b, n = batch.mask.shape
        mask = batch.mask.astype(cdt)
        s_op = batch.ops[:, 0]  # merged-graph operator drives diffusion

        filt_bank = None
        if self.long_diffusion_dist:
            filt_bank = SpectralFilterBank(
                len(self.hidden_dim),
                tuple(self.long_diffusion_dist),
                self.spectral_filter_kind,
                self.filter_hidden_dim,
                name="spectral_filters",
            )(batch.ritz_val)  # [B,L,S,K]

        fused = n <= _FUSED_N_MAX
        short_ops = None
        if fused and self.short_diffusion_dist:
            short_ops = operator_powers(s_op, tuple(self.short_diffusion_dist))
        edge_ops = batch.ops[:, 1:] if batch.num_ops > 1 else None

        for li, dim in enumerate(self.hidden_dim):
            filt = filt_bank[:, li] if filt_bank is not None else None
            has_chan = (
                short_ops is not None or filt is not None or edge_ops is not None
            )
            if fused and has_chan:
                prop = spectral_layer_channels(
                    h, short_ops, batch.ritz_vec, filt, edge_ops,
                    dtype=cdt if mixed else None,
                )
                parts = [h, prop]
                if self.sum_dense:
                    h = SumDense(dim, name=f"layer_{li}", dtype=cdt)(parts)
                else:
                    h = nn.Dense(dim, name=f"layer_{li}", dtype=cdt)(
                        jnp.concatenate(parts, axis=-1)
                    )
            else:
                # large-N factored path: helpers accumulate/emit f32;
                # cast each part so the concat+Dense run at act dtype
                parts = [h]
                if self.short_diffusion_dist:
                    short = diffusion_features_at(
                        s_op, h, tuple(self.short_diffusion_dist)
                    )
                    parts.append(flatten_feature_stack(short).astype(cdt))
                if filt is not None:
                    long = long_scale_features(batch.ritz_vec, filt, h)
                    parts.append(flatten_feature_stack(long).astype(cdt))
                if edge_ops is not None:
                    parts.append(edge_message_concat(edge_ops, h).astype(cdt))
                h = nn.Dense(dim, name=f"layer_{li}", dtype=cdt)(
                    jnp.concatenate(parts, axis=-1)
                )
            h = nn.relu(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = h * mask[..., None]
        h = h.astype(jnp.float32)  # readout/loss stay f32
        if self.task == "node":
            return NodeHead(self.num_task, self.output_hidden_dim)(h, batch.mask)
        return AttentionReadout(self.num_task, self.output_hidden_dim)(h, batch.mask)
