"""Minimal repro of an XLA:TPU fusion miscompile that motivated the
optimization_barrier guard in srm_tpu/nn/encoder_decoder.py.

Observed on TPU v5e (jax 0.8.x, 2026-08): jitting the full encoder–decoder
forward at SMALL grids — where the deconv chain cannot land exactly on the
input grid (9²: 1→3→7→15 then bilinear-resize to 9; 13²: 23→13) — returns
all-NaN for some batch sizes (b∈{10,16} at 9², b=32 at 13²) while

* the eager (op-by-op) forward of the identical program is finite,
* the identical input is finite under jit (checked with a jitted isnan sum),
* `capture_intermediates=True` (which changes the HLO) makes it finite,
* the isolated deconv chain and the isolated bilinear resize are finite,
* production grids (39², 39²×10, 117²) never reproduce it.

The NaN first appears in the decoder deconv chain when it is fused with the
encoder+latent stack (bisected by truncating the forward stage by stage), is
input-value independent (random Gaussian inputs reproduce it), and vanishes
with a single `jax.lax.optimization_barrier` between the latent stack and
the decoder. `--xla_disable_hlo_passes=fusion` cannot be tested end to end
here because compilation happens on the remote TPU service.

Run on a TPU host:  python tools/tpu_fusion_nan_repro.py
Expected with the guard in place: every row prints `nan 0.000`.
To see the raw miscompile, delete the `optimization_barrier` block in
EncoderDecoderModel.__call__ and re-run: the 9²/13² rows go `nan 1.000`.
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srm_tpu.config import get_configuration
from srm_tpu.nn.encoder_decoder import EncoderDecoderModel


def build_net():
    ed = get_configuration("encoder_decoder")
    ed["spatial_dims"] = 2
    ed["temporal"] = True
    ed["residual_params"]["Extra_Conv_Layers"]["Count"] = 2
    ed["residual_params"]["Extra_Dec_Conv_Layers"]["Count"] = 2
    ed["residual_params"]["Latent_Layer"]["Depth"] = 1
    ed["residual_params"]["Latent_Layer"]["Activation"] = None
    ed["residual_params"]["Out_Activation_Func"] = None
    ed["residual_params"]["Skip_Connections"] = {"Add": False, "Layers": [1, 1, 1, 1]}
    return EncoderDecoderModel.from_config(ed)


def main():
    net = build_net()
    print("devices:", jax.devices())
    bad = 0
    for batch, nx in [(10, 9), (16, 9), (32, 9), (10, 13), (32, 13), (10, 39)]:
        x = jnp.asarray(np.random.RandomState(0)
                        .randn(batch, 1, nx, nx, 5).astype(np.float32))
        params = net.init(jax.random.PRNGKey(0), x)
        jit_nan = float(jnp.isnan(jax.jit(lambda x: net.apply(params, x))(x)).mean())
        eager_nan = float(jnp.isnan(net.apply(params, x)).mean())
        print(f"b={batch:<3d} nx={nx:<3d} jit nan {jit_nan:.3f}  eager nan {eager_nan:.3f}")
        bad += jit_nan > 0 or eager_nan > 0
    print("CLEAN" if bad == 0 else f"{bad} case(s) produced NaN")
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
