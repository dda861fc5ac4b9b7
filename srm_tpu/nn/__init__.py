from srm_tpu.nn.common import (  # noqa: F401
    get_activation,
    get_initializer,
    scaled_tanh_lisht,
    network_width_list,
    safe_pow,
    fold_time,
)
from srm_tpu.nn.encoder_decoder import EncoderDecoderModel  # noqa: F401
from srm_tpu.nn.residual import ResidualBlock, ResidualNetworkLayer  # noqa: F401
from srm_tpu.nn.hard_layer import HardLayer  # noqa: F401
from srm_tpu.nn.modules import (  # noqa: F401
    CompleteTrainableModule,
    PVTModuleWithHardLayer,
    build_pressure_model,
    build_time_step_model,
    build_pvt_model,
    build_model_map,
)
