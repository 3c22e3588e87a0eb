from lanczosnet_tpu.ops.normalize import (  # noqa: F401
    sym_normalize,
    row_normalize,
    build_operator_stack,
)
from lanczosnet_tpu.ops.masked import (  # noqa: F401
    masked_softmax,
    masked_mean,
    l2_normalize,
)
from lanczosnet_tpu.ops.poly import (  # noqa: F401
    chebyshev_features,
    diffusion_features,
)
from lanczosnet_tpu.ops.spectral import (  # noqa: F401
    long_scale_features,
)
from lanczosnet_tpu.ops.lanczos import (  # noqa: F401
    lanczos_tridiag,
    lanczos_ritz,
    batched_lanczos_ritz,
)
from lanczosnet_tpu.ops.eigh import safe_eigh  # noqa: F401
