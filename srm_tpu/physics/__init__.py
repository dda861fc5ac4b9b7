from srm_tpu.physics.relperm import RelativePermeability  # noqa: F401
from srm_tpu.physics.pvt import (  # noqa: F401
    PVTLayer,
    make_pvt_layer,
    solve_spline_weights,
    spline_eval,
    properties_for,
    DG_PROPERTIES,
    GC_PROPERTIES,
)
from srm_tpu.physics.wells import (  # noqa: F401
    WellDataProcessor,
    scatter_to_grid,
    conn_shutins_mask,
)
from srm_tpu.physics.well_solver import (  # noqa: F401
    WellRatesPressure,
    extract_pvt_properties,
    solve_newton,
    solve_chandrupatla,
)
