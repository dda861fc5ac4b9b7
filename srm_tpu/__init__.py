"""srm_tpu — a TPU-native (JAX/XLA/Pallas/pjit) physics-informed surrogate
reservoir modeling (SRM) framework.

Re-designed from scratch with the capabilities of the reference project
``molokwuvictor/3d-physics-based-ai-surrogate-reservoir-model`` (a pure
TensorFlow-2 implementation): a multi-model PINN-style surrogate for 3D
single-phase (dry gas, "DG") and two-phase (gas condensate, "GC")
compressible flow, trained against finite-volume PDE stencil residuals with
hard-enforced initial conditions, learned adaptive PDE time steps, PVT
fluid-property layers and a Peaceman-type well rate/BHP solver.

Layering (bottom-up):
  config/    typed defaults + config-hash identity       (ref: default_configurations.py)
  utils/     statistics table + normalization transforms (ref: data_processing_utils.py DataSummary)
  data/      KLE realizations, weaving, splits, parsers  (ref: data_processing/)
  physics/   relperm, PVT, wells, rate/BHP solver        (ref: relative_permeability.py, PVT_Layer_Subclassed.py,
                                                               welldata_processor.py, well_rate_bhp_Subclassed.py)
  nn/        encoder-decoder, residual net, hard layer   (ref: EncoderDecoderSubclassed.py, residual_neural_network_subclassed.py,
                                                               Hard_Layer_Subclassed.py, complete_*_module.py)
  losses/    PhysicsLoss (PDE residuals + per-model grads) (ref: physics_loss.py + the missing physics_loss_Subclassed.py)
  training/  optax optimizers + jitted multi-model loop  (ref: training.py)
  parallel/  jax.sharding mesh + data-parallel pjit      (new; reference is single-device)
  ops/       vectorized stencil ops                      (new)
  kernels/   Pallas TPU kernels for the hot paths        (new)
  eval/      plotting + benchmarking                     (ref: plot_functions.py)

Everything on the compute path is pure-functional and jittable; the whole
train step (two model forwards + stencil residual + gradients + optimizer
updates) compiles to a single XLA program, data-parallel over a
``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"
