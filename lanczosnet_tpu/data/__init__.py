from lanczosnet_tpu.data.qm8 import (  # noqa: F401
    synthetic_qm8_graphs,
    import_reference_pickles,
)
from lanczosnet_tpu.data.dataset import (  # noqa: F401
    PackedDataset,
    pack_dataset,
    save_packed,
    load_packed,
    LabelStats,
)
from lanczosnet_tpu.data.loader import BatchLoader, prefetch_to_device  # noqa: F401
