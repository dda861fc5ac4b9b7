from srm_tpu.losses.physics_loss import PhysicsLoss, LOSS_TERMS  # noqa: F401
