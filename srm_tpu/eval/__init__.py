from srm_tpu.eval.plotting import ModelPlotter, pressure_rmse  # noqa: F401
