from srm_tpu.utils.stats import (  # noqa: F401
    DataSummary,
    normalize,
    denormalize,
    normalize_diff,
    normalize_derivative,
    compute_statistics,
)
from srm_tpu.utils.profiling import trace, EpochTimer, log_tensor_to_file  # noqa: F401
from srm_tpu.utils.numerics import (  # noqa: F401
    finite_difference_derivative,
    l1_normalize_excluding_index,
)

