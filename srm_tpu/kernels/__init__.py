from srm_tpu.kernels.stencil_pallas import (  # noqa: F401
    dg_stencil_residual,
    StencilConfig,
)
