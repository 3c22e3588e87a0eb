"""Model registry — explicit, replacing the reference's `eval(config.model.name)`
reflection (SURVEY.md §1 item 3). Same public names as the reference so
its YAML configs port 1:1.
"""

from lanczosnet_tpu.models.ada_lanczos_net import AdaLanczosNet
from lanczosnet_tpu.models.base import mae_loss  # noqa: F401
from lanczosnet_tpu.models.chebynet import ChebyNet
from lanczosnet_tpu.models.dcnn import DCNN
from lanczosnet_tpu.models.gat import GAT
from lanczosnet_tpu.models.gcn import GCN
from lanczosnet_tpu.models.gpnn import GPNN
from lanczosnet_tpu.models.graph_sage import GraphSAGE
from lanczosnet_tpu.models.lanczos_net import LanczosNet
from lanczosnet_tpu.models.mpnn import MPNN

MODEL_REGISTRY = {
    "GCN": GCN,
    "ChebyNet": ChebyNet,
    "DCNN": DCNN,
    "GAT": GAT,
    "GraphSAGE": GraphSAGE,
    "MPNN": MPNN,
    "GPNN": GPNN,
    "LanczosNet": LanczosNet,
    "AdaLanczosNet": AdaLanczosNet,
}


def build_model(model_cfg: dict):
    """Instantiate a model from a config dict (the YAML `model:` section,
    with `num_task` merged in). Raises KeyError with the known names."""
    name = model_cfg["name"]
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[name].from_config(model_cfg)
