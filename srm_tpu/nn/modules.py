"""Composition modules and the model-map factory.

TPU-native redesign of the reference's composition layers
(``/root/reference/complete_trainable_module.py:25-203``,
``/root/reference/complete_pvt_module.py:27-170``) and of the model zoo
builder (``/root/reference/srm_training_examples/training_case_dry_gas_i.py:
67-323``):

* :class:`CompleteTrainableModule` — {encoder_decoder | residual} backbone
  with optional HardLayer; slices the time (-2) and property (-1) channels
  for the HardLayer; ``hard_enforcement_only`` bypasses the DNN.
* :class:`PVTModuleWithHardLayer` — optional HardLayer + PVT layer; in the
  pipeline it runs with ``use_hard_layer=False`` on Model 1's pressure.
* :func:`build_model_map` — Model 1 (pressure), Model 2 (adaptive Δt),
  Model 3 (PVT), well-rate/BHP solver, and the GC saturation model, each as
  an (module, params) pair keyed by logical name.
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from srm_tpu.config import (
    DEFAULT_GENERAL_CONFIG,
    DEFAULT_RESERVOIR_CONFIG,
    get_configuration,
)
from srm_tpu.nn.common import get_activation, scaled_tanh_lisht
from srm_tpu.nn.encoder_decoder import EncoderDecoderModel
from srm_tpu.nn.hard_layer import HardLayer
from srm_tpu.nn.residual import ResidualNetworkLayer
from srm_tpu.physics.pvt import PVTLayer, make_pvt_layer

Array = jnp.ndarray
log = logging.getLogger(__name__)


class CompleteTrainableModule(nn.Module):
    """Backbone + optional HardLayer (ref complete_trainable_module.py:25-183)."""

    network: Optional[nn.Module] = None           # EncoderDecoderModel | ResidualNetworkLayer
    hard_layer: Optional[HardLayer] = None
    time_slice: Tuple[int, Optional[int]] = (-2, -1)
    property_slice: Tuple[int, Optional[int]] = (-1, None)
    hard_enforcement_only: bool = False

    @nn.compact
    def __call__(self, inputs: Array, rectifier_input: Optional[Array] = None,
                 training: bool = False) -> Array:
        if self.hard_enforcement_only:
            net_out = jnp.mean(inputs[..., -2:], axis=-1, keepdims=True)  # ref :155
        else:
            net_out = self.network(inputs, training=training)
            if self.hard_layer is None:
                return net_out
        t = inputs[..., slice(*self.time_slice)]
        prop = inputs[..., slice(*self.property_slice)]
        return self.hard_layer(t, prop, net_out, rect_input=rectifier_input)


class PVTModuleWithHardLayer(nn.Module):
    """Optional HardLayer + PVTLayer (ref complete_pvt_module.py:27-170)."""

    pvt_layer: PVTLayer = None
    hard_layer: Optional[HardLayer] = None
    use_hard_layer: bool = False
    time_slice: Tuple[int, Optional[int]] = (-2, -1)
    property_slice: Tuple[int, Optional[int]] = (-1, None)

    @nn.compact
    def __call__(self, inputs: Array, training: bool = False) -> Array:
        p = inputs
        if self.use_hard_layer and self.hard_layer is not None:
            t = inputs[..., slice(*self.time_slice)]
            prop = inputs[..., slice(*self.property_slice)]
            p = self.hard_layer(t, prop, inputs)
        return self.pvt_layer(p)


# --------------------------------------------------------------------------
# Model factories (ref training_case_dry_gas_i.py:67-323)
# --------------------------------------------------------------------------
def build_pressure_model(name: str = "encoder_decoder_with_hard",
                         general_config: Optional[Dict] = None,
                         reservoir_config: Optional[Dict] = None) -> CompleteTrainableModule:
    """Model 1: 2D temporal encoder–decoder + HardLayer, skip connections off
    (ref :67-133)."""
    g = general_config or DEFAULT_GENERAL_CONFIG
    res = reservoir_config or DEFAULT_RESERVOIR_CONFIG
    ed = get_configuration("encoder_decoder")
    if res.get("Nz", 1) > 1:
        # true-3D grids: volumetric convs over (D, H, W); the woven tensor
        # keeps a leading singleton axis that folds as the (trivial) temporal
        # axis (the reference's 3D config branch,
        # default_configurations.py:164-182)
        ed["spatial_dims"] = 3
        ed["temporal"] = True
    else:
        ed["spatial_dims"] = 2
        ed["temporal"] = True
    ed["residual_params"]["Extra_Conv_Layers"]["Count"] = 2
    ed["residual_params"]["Extra_Dec_Conv_Layers"]["Count"] = 2
    ed["residual_params"]["Latent_Layer"]["Depth"] = 1
    ed["residual_params"]["Latent_Layer"]["Activation"] = None
    ed["residual_params"]["Out_Activation_Func"] = None
    ed["residual_params"]["Skip_Connections"] = {"Add": False, "Layers": [1, 1, 1, 1]}
    ed["compute_dtype"] = g.get("compute_dtype")   # optional bf16 network compute
    ed["f32_io"] = g.get("precision_policy") == "mixed"
    ed["spatial_pad_to"] = g.get("spatial_pad_to")
    if g.get("network_width"):               # "TPU-mode" widened channels
        ed["width"]["Bottom_Size"] = int(g["network_width"])

    hard = get_configuration("hard_layer")
    hard["init_value"] = res["initialization"]["Pi"]
    hard["kernel_activation"] = None
    hard["kernel_exponent_config"]["initial_value"] = 0.5
    hard["kernel_exponent_config"]["min_value"] = 0.1
    hard["kernel_exponent_config"]["max_value"] = 1.0

    return CompleteTrainableModule(
        network=EncoderDecoderModel.from_config(ed),
        hard_layer=HardLayer.from_config(hard, fluid_type=g["fluid_type"]),
        name=name,
    )


def build_saturation_model(name: str = "saturation_model",
                           general_config: Optional[Dict] = None,
                           reservoir_config: Optional[Dict] = None,
                           scal_config: Optional[Dict] = None) -> CompleteTrainableModule:
    """Model 1S: the GC gas-saturation encoder–decoder.

    The reference builds this with the same helper as the pressure model
    (ref training_case_dry_gas_i.py:303-305), inheriting the PRESSURE
    initial value Pi for the HardLayer — which pins the output at ~Pi and,
    once clamped to the physical [0, Sgi] range, kills every saturation
    gradient (the model can never train). Fixed here: the hard initial
    condition is Sg(t=0) = Sgi = 1 − Swmin, and the net output passes
    through softplus so saturation monotonically *departs* from Sgi with
    time (liquid dropout) while staying inside the clamp.
    """
    from srm_tpu.config import DEFAULT_SCAL_CONFIG
    g = general_config or DEFAULT_GENERAL_CONFIG
    res = reservoir_config or DEFAULT_RESERVOIR_CONFIG
    scal = scal_config or DEFAULT_SCAL_CONFIG
    ed = get_configuration("encoder_decoder")
    ed["spatial_dims"] = 3 if res.get("Nz", 1) > 1 else 2
    ed["temporal"] = True
    ed["residual_params"]["Extra_Conv_Layers"]["Count"] = 2
    ed["residual_params"]["Extra_Dec_Conv_Layers"]["Count"] = 2
    ed["residual_params"]["Latent_Layer"]["Depth"] = 1
    ed["residual_params"]["Latent_Layer"]["Activation"] = None
    ed["residual_params"]["Out_Activation_Func"] = None
    ed["residual_params"]["Skip_Connections"] = {"Add": False, "Layers": [1, 1, 1, 1]}
    ed["compute_dtype"] = g.get("compute_dtype")
    ed["f32_io"] = g.get("precision_policy") == "mixed"
    ed["spatial_pad_to"] = g.get("spatial_pad_to")
    if g.get("network_width"):
        ed["width"]["Bottom_Size"] = int(g["network_width"])

    hard = get_configuration("hard_layer")
    hard["init_value"] = 1.0 - scal["end_points"]["Swmin"]
    hard["kernel_activation"] = None
    # Departure rectifier Sg = Sgi - alpha*act(net): softplus's zero-departure
    # attractor is net -> -inf where the gradient dies permanently (measured:
    # tools/sg_head_probe.py); "abs" keeps |grad|=1 at the attractor net=0.
    hard["input_activation"] = g.get("sat_input_activation") or "softplus"
    hard["kernel_exponent_config"]["initial_value"] = 0.5
    hard["kernel_exponent_config"]["min_value"] = 0.1
    hard["kernel_exponent_config"]["max_value"] = 1.0

    return CompleteTrainableModule(
        network=EncoderDecoderModel.from_config(ed),
        hard_layer=HardLayer.from_config(hard, fluid_type="GC"),
        name=name,
    )


def build_time_step_model(name: str = "residual_network_only",
                          general_config: Optional[Dict] = None,
                          reservoir_config: Optional[Dict] = None) -> CompleteTrainableModule:
    """Model 2: cnn residual net with scaled-x·tanh(x) Δt output in
    (min_srm_timestep, max_srm_timestep] (ref :135-195)."""
    g = general_config or DEFAULT_GENERAL_CONFIG
    res = reservoir_config or DEFAULT_RESERVOIR_CONFIG
    cfg = get_configuration("residual")
    cfg["number_of_output_bins"] = 50
    if res.get("Nz", 1) > 1:
        cfg["network_type"] = "cnn3d"
        cfg["temporal"] = True
    else:
        cfg["network_type"] = "cnn"
        cfg["temporal"] = True
    cfg["output_distribution"] = False
    max_lim = g["maximum_srm_timestep"]
    cfg["output_activation"] = partial(scaled_tanh_lisht, min_val=0.1, max_val=max_lim)
    cfg["compute_dtype"] = g.get("compute_dtype")
    cfg["spatial_pad_to"] = g.get("spatial_pad_to")
    return CompleteTrainableModule(
        network=ResidualNetworkLayer.from_config(cfg),
        hard_layer=None,
        name=name,
    )


def build_pvt_model(name: str = "pvt_model_only", fluid_type: Optional[str] = None,
                    fitting_method: str = "spline", spline_order: int = 1,
                    general_config: Optional[Dict] = None) -> PVTModuleWithHardLayer:
    """Model 3: spline PVT on Model 1's pressure output, no hard layer
    (ref :197-265)."""
    g = general_config or DEFAULT_GENERAL_CONFIG
    fluid_type = fluid_type or g["fluid_type"]
    fitting_method = fitting_method or "spline"
    pvt_cfg = get_configuration("pvt_layer", fluid_type=fluid_type,
                                fitting_method=fitting_method)
    pvt_cfg["spline_order"] = spline_order
    return PVTModuleWithHardLayer(pvt_layer=make_pvt_layer(pvt_cfg),
                                  use_hard_layer=False, name=name)


def build_model_map(input_shape: Tuple[int, ...], fluid_type: Optional[str] = None,
                    rng: Optional[jax.Array] = None,
                    general_config: Optional[Dict] = None,
                    reservoir_config: Optional[Dict] = None,
                    wells_config: Optional[Dict] = None,
                    data_summary=None,
                    well_solver_kwargs: Optional[Dict] = None):
    """Build all models + params (ref build_model_map, :268-323).

    ``input_shape`` is the training-data shape (K, T, D, H, W, C); the model
    input is (B, D, H, W, C) with D acting as the (weight-shared) temporal
    axis. Returns (model_map, params_map) with logical keys
    'pressure', 'time_step', 'pvt_model', 'well_rate_bhp_model'
    [+ 'saturation_model' for GC].

    ``well_solver_kwargs`` passes through to ``WellRatesPressure`` (e.g.
    ``use_non_iterative=False`` for the Newton BHP path — fully
    reverse-differentiable, so it may sit inside the training loss).
    """
    g = general_config or DEFAULT_GENERAL_CONFIG
    fluid_type = (fluid_type or g["fluid_type"]).upper()
    rng = rng if rng is not None else jax.random.PRNGKey(g["seed"])
    sample = jnp.zeros((1,) + tuple(input_shape[2:]), jnp.float32)

    k_main, k_ts, k_pvt, k_sat = jax.random.split(rng, 4)
    models: Dict[str, Any] = {}
    params: Dict[str, Any] = {}

    pressure = build_pressure_model(general_config=g, reservoir_config=reservoir_config)
    models["pressure"] = pressure
    params["pressure"] = pressure.init(k_main, sample)

    time_step = build_time_step_model(general_config=g, reservoir_config=reservoir_config)
    models["time_step"] = time_step
    params["time_step"] = time_step.init(k_ts, sample)

    pvt = build_pvt_model(fluid_type=fluid_type, general_config=g,
                          fitting_method=g.get("pvt_fitting_method", "spline"))
    models["pvt_model"] = pvt
    p_sample = pressure.apply(params["pressure"], sample)
    params["pvt_model"] = pvt.init(k_pvt, p_sample)

    from srm_tpu.physics.well_solver import WellRatesPressure
    pvt_fn = lambda p: pvt.apply(params["pvt_model"], p)  # noqa: E731
    models["well_rate_bhp_model"] = WellRatesPressure(
        fluid_type=fluid_type, data_summary=data_summary, pvt_fn=pvt_fn,
        general_config=g, reservoir_config=reservoir_config,
        wells_config=wells_config, **(well_solver_kwargs or {}))
    params["well_rate_bhp_model"] = {}

    if fluid_type == "GC":
        sat = build_saturation_model(general_config=g,
                                     reservoir_config=reservoir_config)
        models["saturation_model"] = sat
        params["saturation_model"] = sat.init(k_sat, sample)

    return models, params
