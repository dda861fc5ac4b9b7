from srm_tpu.utils.stats import (  # noqa: F401
    DataSummary,
    normalize,
    denormalize,
    normalize_diff,
    normalize_derivative,
    compute_statistics,
)
