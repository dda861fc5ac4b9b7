from srm_tpu.training.optimizers import build_optimizer_from_config  # noqa: F401
from srm_tpu.training.trainer import Trainer, train_combined_models_unified  # noqa: F401
