"""ModelPlotter / RMSE tests with a lightweight stand-in pressure model."""

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from srm_tpu.eval.plotting import ModelPlotter, pressure_rmse


class TinyPressure(nn.Module):
    @nn.compact
    def __call__(self, x, training=False):
        w = self.param("w", nn.initializers.ones, (1,))
        return jnp.mean(x, axis=-1, keepdims=True) * w


def _setup():
    A, B, T, H, W, C = 2, 6, 1, 8, 8, 5
    rng = np.random.RandomState(0)
    feats = rng.uniform(-1, 1, (A, B, T, H, W, C)).astype(np.float32)
    model = TinyPressure()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, T, H, W, C)))
    true = np.mean(feats, axis=-1)  # matches the model with w=1
    labels = {"PRESSURE": true}
    models = {"pressure": model}
    params_map = {"pressure": params}
    return models, params_map, [(feats, labels)]


def test_predict_shapes_and_rmse():
    models, params, pairs = _setup()
    plotter = ModelPlotter(models, params, pairs)
    pred = plotter.predict(np.asarray(pairs[0][0]))
    assert pred.shape == (2, 6, 1, 8, 8, 1)
    rmse = pressure_rmse(models, params, pairs)
    assert rmse < 1e-5  # model reproduces labels exactly


def test_plot_line_and_images(tmp_path):
    models, params, pairs = _setup()
    plotter = ModelPlotter(models, params, pairs)
    plotter.set_unit_labels("days", "psia")
    plotter.set_font_settings(9.0)
    plotter.plot_line(key="PRESSURE", a_indices=[0], indices=[(0, 4, 4)],
                      save_path=str(tmp_path / "line.png"), title="test")
    assert os.path.isfile(tmp_path / "line.png")
    plotter.plot_images(key="PRESSURE", a_index=0, b_indices=[0, 1],
                        save_path=str(tmp_path / "img.png"))
    assert any(f.startswith("img") for f in os.listdir(tmp_path))
    # selectable temporal/depth slice (VERDICT r3 item 8; axis 2 of the
    # prediction, previously hard-coded to 0)
    figs = plotter.plot_images(key="PRESSURE", a_index=0, b_indices=[0],
                               t_index=0)
    assert figs
