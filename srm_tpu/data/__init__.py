from srm_tpu.data.kle import generate_kle_numpy, generate_kle_jax, split_realizations  # noqa: F401
from srm_tpu.data.weave import (  # noqa: F401
    weave_tensors,
    create_positional_grids,
    split_tensor_sequence,
    align_and_trim_pair_lists,
)
from srm_tpu.data.dataset import SRMDataProcessor, FEATURE_KEYS  # noqa: F401
from srm_tpu.data.batching import BatchGenerator, collapse_axes_fortran  # noqa: F401
from srm_tpu.data.pvt_table import load_pvt_table, load_pvt_table_summary  # noqa: F401
