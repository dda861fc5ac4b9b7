"""Coverage for the remaining NN/physics variants the reference smoke-tested
(SURVEY §4): dense/cnn3d residual nets, hard-enforcement-only mode, RBF hard
layer, 3D encoder-decoder, blocking-factor integral, iterative-vs-direct BHP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srm_tpu.config import get_configuration
from srm_tpu.nn.encoder_decoder import EncoderDecoderModel
from srm_tpu.nn.residual import ResidualNetworkLayer
from srm_tpu.nn.hard_layer import HardLayer
from srm_tpu.nn.modules import CompleteTrainableModule


def test_residual_dense_variant():
    cfg = get_configuration("residual")
    cfg["network_type"] = "dense"
    cfg["output_distribution"] = False
    model = ResidualNetworkLayer.from_config(cfg)
    x = jnp.zeros((2, 7, 7, 5))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 7, 7, 1)


def test_residual_cnn3d_variant():
    cfg = get_configuration("residual")
    cfg["network_type"] = "cnn3d"
    cfg["output_distribution"] = False
    model = ResidualNetworkLayer.from_config(cfg)
    x = jnp.zeros((2, 3, 7, 7, 5))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 3, 7, 7, 1)


def test_residual_latent_vae_head():
    model = ResidualNetworkLayer(num_blocks=2, filters=8, latent_output=True,
                                 output_filters=1, latent_a=0.1, latent_b=10.0)
    x = jnp.zeros((2, 7, 7, 3))
    params = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x)
    out = model.apply(params, x, rngs={"sample": jax.random.PRNGKey(2)})
    assert out.shape == (2, 7, 7, 1)
    assert 0.1 <= float(out.min()) and float(out.max()) <= 10.0


def test_hard_enforcement_only_module():
    """hard_enforcement_only bypasses the DNN (ref
    complete_trainable_module.py:153-158)."""
    hl = HardLayer(init_value=5000.0)
    mod = CompleteTrainableModule(network=None, hard_layer=hl,
                                  hard_enforcement_only=True)
    x = jnp.zeros((2, 1, 7, 7, 5)).at[..., 3].set(-1.0)
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    assert out.shape == (2, 1, 7, 7, 1)
    np.testing.assert_allclose(np.asarray(out), 5000.0)


def test_hard_layer_rbf_modulation():
    hl = HardLayer(init_value=5000.0, use_rbf=True)
    t = jnp.full((2, 1, 4, 4, 1), 0.0)
    prop = jnp.ones((2, 1, 4, 4, 1)) * 0.5
    p_net = jnp.ones((2, 1, 4, 4, 1)) * 100.0
    params = hl.init(jax.random.PRNGKey(0), t, prop, p_net)
    assert "rbf_kernel" in params["params"]
    out = np.asarray(hl.apply(params, t, prop, p_net))
    assert np.isfinite(out).all()
    # RBF sigmoid factor in (0,1) shrinks alpha → output closer to Pi
    plain = HardLayer(init_value=5000.0)
    pp = plain.init(jax.random.PRNGKey(0), t, prop, p_net)
    base = np.asarray(plain.apply(pp, t, prop, p_net))
    assert (out >= base - 1e-3).all()


def test_hard_layer_rectifier_gc():
    rect = jax.nn.sigmoid
    hl = HardLayer(init_value=5000.0, rectifier=rect, pdew=4048.4, pmin=1000.0)
    t = jnp.full((1, 1, 4, 4, 1), 0.0)
    prop = jnp.zeros((1, 1, 4, 4, 1))
    p_net = jnp.ones((1, 1, 4, 4, 1)) * 100.0
    rect_in = jnp.full((1, 1, 4, 4, 1), 4500.0)
    params = hl.init(jax.random.PRNGKey(0), t, prop, p_net, rect_in)
    out = np.asarray(hl.apply(params, t, prop, p_net, rect_in))
    assert np.isfinite(out).all()


def test_encoder_decoder_3d():
    cfg = get_configuration("encoder_decoder", input_shape=(None, 5, 20, 20, 2))
    assert cfg["spatial_dims"] == 3
    cfg["depth"] = 3
    cfg["residual_params"]["Skip_Connections"] = {"Add": False, "Layers": []}
    cfg["residual_params"]["Extra_Conv_Layers"]["Count"] = 1
    cfg["residual_params"]["Extra_Dec_Conv_Layers"]["Count"] = 1
    model = EncoderDecoderModel.from_config(cfg)
    x = jnp.zeros((1, 5, 20, 20, 2))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 5, 20, 20, 1)


def test_blocking_factor_integral_path():
    """use_blocking_factor=True runs the trapezoid mobility integral; for DG
    on a monotone mobility curve the factor is positive and finite."""
    from srm_tpu.physics.well_solver import WellRatesPressure
    from srm_tpu.physics.pvt import make_pvt_layer
    from srm_tpu.utils.stats import DataSummary
    from tests.test_physics import STATS

    cfg = get_configuration("pvt_layer", fluid_type="DG", fitting_method="spline")
    cfg["spline_order"] = 1
    layer = make_pvt_layer(cfg)
    p0 = jnp.zeros((1, 1, 39, 39, 1))
    pr = layer.init(jax.random.PRNGKey(0), p0)
    pvt_fn = lambda p: layer.apply(pr, p)  # noqa: E731
    ws = WellRatesPressure(fluid_type="DG", data_summary=DataSummary([STATS]),
                           pvt_fn=pvt_fn, use_blocking_factor=True, n_intervals=4)
    p = jnp.full((1, 1, 39, 39, 1), 4600.0)
    pwf = jnp.full_like(p, 4200.0)
    Ig, Io, bg, bo = ws.compute_blocking_integral_and_factor(
        p, jnp.asarray(ws.Sg_max), ws.relperm, pvt_fn, pwf)
    assert np.isfinite(np.asarray(Ig)).all()
    assert float(jnp.max(bg)) > 0.0
    # rates through the blocking path stay bounded
    x = jnp.zeros((1, 1, 39, 39, 5))
    q, pwf_out = ws.compute_rates_and_bhp(x, p, None)
    assert np.isfinite(np.asarray(q)).all()


def test_mixed_precision_policy_f32_islands():
    """compute_dtype=bfloat16 runs the conv bulk at MXU rate; with
    precision_policy='mixed' the input conv and output head stay f32.
    The mixed output must track the full-f32 reference strictly better than
    the all-bf16 network (the policy's reason to exist)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from srm_tpu.config import get_configuration
    from srm_tpu.nn.encoder_decoder import EncoderDecoderModel

    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 39, 39, 5),
                           jnp.float32, -1.0, 1.0)

    outs = {}
    for tag, (cdt, f32_io) in {"f32": (None, False),
                               "bf16": ("bfloat16", False),
                               "mixed": ("bfloat16", True)}.items():
        cfg = get_configuration("encoder_decoder")
        cfg["compute_dtype"] = cdt
        cfg["f32_io"] = f32_io
        model = EncoderDecoderModel.from_config(cfg)
        params = model.init(jax.random.PRNGKey(0), x)
        out = model.apply(params, x)
        assert out.dtype == jnp.float32
        assert np.isfinite(np.asarray(out)).all()
        outs[tag] = np.asarray(out, np.float64)

    err_bf16 = np.abs(outs["bf16"] - outs["f32"]).mean()
    err_mixed = np.abs(outs["mixed"] - outs["f32"]).mean()
    assert err_bf16 > 0, "bf16 output should differ from f32"
    assert err_mixed < err_bf16, (err_mixed, err_bf16)


@pytest.mark.slow
def test_spatial_pad_to_preserves_shapes():
    """spatial_pad_to zero-pads H/W to a TPU-tile-friendly size inside the
    network and crops at the output: shapes must be unchanged and gradients
    finite, in 2D and 3D, for both network families."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from srm_tpu.config import get_configuration
    from srm_tpu.nn.encoder_decoder import EncoderDecoderModel
    from srm_tpu.nn.residual import ResidualNetworkLayer

    for nd, shape in ((2, (2, 39, 39, 5)), (3, (2, 10, 39, 39, 5))):
        cfg = get_configuration("encoder_decoder",
                                input_shape=(1, 10, 39, 39, 1) if nd == 3 else None)
        cfg["spatial_dims"] = nd
        cfg["temporal"] = False
        cfg["spatial_pad_to"] = 48
        model = EncoderDecoderModel.from_config(cfg)
        x = jax.random.uniform(jax.random.PRNGKey(0), shape, jnp.float32, -1, 1)
        params = model.init(jax.random.PRNGKey(1), x)
        y, grads = jax.value_and_grad(
            lambda p: jnp.sum(jnp.square(model.apply(p, x))))(params)
        assert model.apply(params, x).shape == shape[:-1] + (1,)
        assert np.isfinite(float(y))
        assert all(np.isfinite(np.asarray(g)).all()
                   for g in jax.tree_util.tree_leaves(grads))

    cfg = get_configuration("residual")
    cfg["network_type"] = "cnn"
    cfg["temporal"] = False
    cfg["output_distribution"] = False
    cfg["spatial_pad_to"] = 48
    m = ResidualNetworkLayer.from_config(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 39, 39, 5), jnp.float32, -1, 1)
    p = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(p, x)
    assert out.shape == (2, 39, 39, 1)
    assert np.isfinite(np.asarray(out)).all()
