from srm_tpu.eval.plotting import ModelPlotter, pressure_rmse, saturation_rmse  # noqa: F401
from srm_tpu.eval.predictor import SRMPredictor  # noqa: F401
from srm_tpu.eval.serving import (  # noqa: F401
    ServingSurrogate,
    export_surrogate,
    load_surrogate,
)
from srm_tpu.eval.timestep_log import (  # noqa: F401
    TimestepRecorder,
    parse_timestep_log,
    plot_timesteps,
)
