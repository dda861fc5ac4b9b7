"""NN-layer tests: geometry golden tests for the encoder-decoder on 39x39
(SURVEY §7.3 #2: the parity-critical valid-padding stride-2 geometry),
residual net heads, HardLayer initial-condition enforcement, composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srm_tpu.nn.common import network_width_list, scaled_tanh_lisht, safe_pow
from srm_tpu.nn.encoder_decoder import EncoderDecoderModel
from srm_tpu.nn.residual import ResidualNetworkLayer
from srm_tpu.nn.hard_layer import HardLayer
from srm_tpu.nn.modules import (
    build_pressure_model, build_time_step_model, build_pvt_model, build_model_map,
)
from srm_tpu.config import get_configuration


def test_network_width_list():
    # ref geometry: bottom 32, growth 1.5, depth 4 → [32, 48, 72, 108]
    assert network_width_list(4, 32, 4, 1.5) == [32, 48, 72, 108]


def test_scaled_tanh_bounds():
    x = jnp.linspace(-10, 10, 101)
    y = scaled_tanh_lisht(x, min_val=0.1, max_val=10.0)
    assert float(y.min()) >= 0.1 - 1e-6
    assert float(y.max()) <= 10.0 + 1e-6
    assert float(scaled_tanh_lisht(jnp.asarray(0.0))) == pytest.approx(0.1)


def test_safe_pow_grad_at_zero():
    g = jax.grad(lambda e: float_sum(safe_pow(jnp.asarray([0.0, 0.5]), e)))(jnp.asarray(0.5))
    assert np.isfinite(np.asarray(g)).all()


def float_sum(x):
    return jnp.sum(x)


def test_encoder_decoder_geometry_39():
    """Depth-4 valid-pad geometry: 39→37→18→8→4 encoder, 4→9→19→39 decoder,
    no resize needed; output (B, T, 39, 39, 1)."""
    cfg = get_configuration("encoder_decoder")
    cfg["temporal"] = True
    cfg["residual_params"]["Skip_Connections"] = {"Add": False, "Layers": [1, 1, 1, 1]}
    model = EncoderDecoderModel.from_config(cfg)
    x = jnp.zeros((2, 1, 39, 39, 5))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 1, 39, 39, 1)


def test_encoder_decoder_with_skips():
    cfg = get_configuration("encoder_decoder")
    cfg["temporal"] = False
    cfg["residual_params"]["Skip_Connections"] = {"Add": True, "Layers": [1, 1, 1, 1]}
    model = EncoderDecoderModel.from_config(cfg)
    x = jnp.zeros((1, 39, 39, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 39, 39, 1)


def test_encoder_decoder_nonstandard_grid_resizes():
    cfg = get_configuration("encoder_decoder")
    cfg["depth"] = 3
    cfg["residual_params"]["Skip_Connections"] = {"Add": False, "Layers": []}
    model = EncoderDecoderModel.from_config(cfg)
    x = jnp.zeros((1, 50, 50, 2))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 50, 50, 1)


def test_residual_network_plain_head():
    cfg = get_configuration("residual")
    cfg["output_distribution"] = False
    cfg["temporal"] = True
    model = ResidualNetworkLayer.from_config(cfg)
    x = jnp.zeros((2, 1, 39, 39, 5))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 1, 39, 39, 1)


def test_residual_network_distribution_head():
    cfg = get_configuration("residual")
    cfg["output_distribution"] = True
    cfg["number_of_output_bins"] = 50
    model = ResidualNetworkLayer.from_config(cfg)
    x = jnp.zeros((2, 39, 39, 5))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 1, 1, 50)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-5)


def test_hard_layer_enforces_initial_condition():
    """At the normalized start time (t_norm = a = -1) the output equals Pi
    exactly, regardless of the network output."""
    hl = HardLayer(norm_limits=(-1.0, 1.0), init_value=5000.0,
                   exponent_init=0.5, exponent_min=0.1, exponent_max=1.0)
    t0 = jnp.full((2, 1, 4, 4, 1), -1.0)
    prop = jnp.zeros((2, 1, 4, 4, 1))
    p_net = jnp.full((2, 1, 4, 4, 1), 123.0)
    params = hl.init(jax.random.PRNGKey(0), t0, prop, p_net)
    out = hl.apply(params, t0, prop, p_net)
    np.testing.assert_allclose(np.asarray(out), 5000.0)
    # at a later time output = Pi - alpha_t^e * p_net < Pi
    t1 = jnp.full_like(t0, 0.0)  # alpha_t = 0.5
    out1 = np.asarray(hl.apply(params, t1, prop, p_net))
    np.testing.assert_allclose(out1, 5000.0 - (0.5 ** 0.5) * 123.0, rtol=1e-6)


def test_hard_layer_exponent_shape_and_grad():
    hl = HardLayer(init_value=5000.0)
    t = jnp.full((2, 1, 4, 4, 1), -1.0)
    prop = jnp.zeros((2, 1, 4, 4, 1))
    p_net = jnp.ones((2, 1, 4, 4, 1))
    params = hl.init(jax.random.PRNGKey(0), t, prop, p_net)
    kexp = params["params"]["kernel_exponent"]
    assert kexp.shape == (1, 4, 4, 1)

    def loss(p):
        return jnp.sum(hl.apply(p, t, prop, p_net) ** 2)

    g = jax.grad(loss)(params)
    assert np.isfinite(np.asarray(g["params"]["kernel_exponent"])).all()


def test_pressure_model_hard_start():
    model = build_pressure_model()
    x = jnp.zeros((2, 1, 39, 39, 5))
    x = x.at[..., 3].set(-1.0)  # normalized start time
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 1, 39, 39, 1)
    np.testing.assert_allclose(np.asarray(out), 5000.0, rtol=1e-6)


def test_time_step_model_bounds():
    model = build_time_step_model()
    x = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (2, 1, 39, 39, 5)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    out = np.asarray(model.apply(params, x))
    assert out.shape == (2, 1, 39, 39, 1)
    assert out.min() >= 0.1 - 1e-5 and out.max() <= 10.0 + 1e-5


def test_build_model_map_dg():
    from srm_tpu.utils.stats import DataSummary
    stats = {
        "z": {"min": 40.0, "max": 40.0, "mean": 40.0, "std": 1.0},
        "y": {"min": 37.0, "max": 2863.0, "mean": 1450.0, "std": 830.0},
        "x": {"min": 37.0, "max": 2863.0, "mean": 1450.0, "std": 830.0},
        "time": {"min": 0.0, "max": 255.0, "mean": 127.5, "std": 75.0},
        "permx": {"min": 0.26, "max": 24.0, "mean": 2.96, "std": 1.43},
    }
    models, params = build_model_map((60, 51, 1, 39, 39, 5), fluid_type="DG",
                                     data_summary=DataSummary([stats]))
    assert set(models) == {"pressure", "time_step", "pvt_model", "well_rate_bhp_model"}
    x = jnp.zeros((2, 1, 39, 39, 5))
    p = models["pressure"].apply(params["pressure"], x)
    dt = models["time_step"].apply(params["time_step"], x)
    pvt = models["pvt_model"].apply(params["pvt_model"], p)
    assert p.shape == (2, 1, 39, 39, 1)
    assert dt.shape == (2, 1, 39, 39, 1)
    assert pvt.shape == (2, 2, 2, 1, 39, 39, 1)


@pytest.mark.slow
def test_saturation_abs_rectifier_keeps_gradient_alive():
    """GC saturation head: with ``sat_input_activation='abs'`` the departure
    rectifier's zero-departure attractor sits at net=0 where |d act/d net|=1,
    so the Sg-label gradient through the inner network cannot vanish the way
    softplus's does at its net -> -inf attractor (tools/sg_head_probe.py
    measured the shipped softplus head dead: grad ~1e-26 after 10 epochs)."""
    import copy
    from srm_tpu.config import DEFAULT_GENERAL_CONFIG
    from srm_tpu.nn.modules import build_saturation_model

    g = copy.deepcopy(DEFAULT_GENERAL_CONFIG)
    g["sat_input_activation"] = "abs"
    sat = build_saturation_model(general_config=g)
    assert sat.hard_layer.input_activation == "abs"

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 39, 39, 5)) * 0.1
    params = sat.init(jax.random.PRNGKey(0), x)
    out = sat.apply(params, x)
    assert out.shape == (2, 1, 39, 39, 1)

    # label = a departure field; the grad through the inner net must be
    # non-negligible even when the net output is near the attractor
    lab = jnp.full_like(out, 0.5)

    def sse(p):
        return jnp.sum(jnp.square(sat.apply(p, x) - lab))

    grads = jax.grad(sse)(params)
    gsum = sum(float(jnp.sum(jnp.abs(l)))
               for l in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gsum) and gsum > 1e-3
