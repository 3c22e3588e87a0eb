from lanczosnet_tpu.core.graph_batch import (  # noqa: F401
    GraphBatch,
    pad_graph,
    batch_graphs,
)
