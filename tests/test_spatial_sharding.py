"""2-D (data × space) mesh: spatial sharding of the H axis.

The stencil's shifted reads become XLA SPMD halo exchanges; these tests pin
(a) numerical equivalence with the unsharded loss and (b) that the sharding
actually engages (H divisible by the space axis).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def sp_case(tmp_path_factory):
    from srm_tpu.examples.training_case_dry_gas import setup_dry_gas_case
    base = str(tmp_path_factory.mktemp("sp") / "data")
    # even H so the 'space' axis (2) divides it
    return setup_dry_gas_case(base_dir=base, nx=12, n_realizations=8)


def test_spec_assignment():
    from srm_tpu.parallel.mesh import make_mesh, _spec_for_rank
    mesh = make_mesh(8, spatial=2)
    assert mesh.devices.shape == (4, 2)
    assert tuple(_spec_for_rank(mesh, 5)) == ("data", None, "space", None, None)
    assert tuple(_spec_for_rank(mesh, 4)) == ("data", None, "space", None)
    # batch-collapsed epoch stacks: batch axis 1
    assert tuple(_spec_for_rank(mesh, 6, batch_axis=1)) == \
        (None, "data", None, "space", None, None)
    # non-spatial arrays get no 'space' axis
    assert tuple(_spec_for_rank(mesh, 2)) == ("data", None)


def test_dp_sp_train_step_matches_unsharded(sp_case):
    from srm_tpu.parallel.mesh import make_mesh
    from srm_tpu.training.trainer import Trainer

    x, y = sp_case["train_groups"][0]
    xb = x[:2, :4].reshape((-1,) + x.shape[2:])
    yb = {k: v[:2, :4].reshape((-1,) + v.shape[2:]) for k, v in y.items()}

    t_ref, _ = sp_case["loss_fn"].loss_and_metrics(
        sp_case["params"], jnp.asarray(xb),
        {k: jnp.asarray(v) for k, v in yb.items()})

    mesh = make_mesh(8, spatial=2)
    tr = Trainer(sp_case["loss_fn"], sp_case["params"], mesh=mesh)
    m = tr.train_step(xb, yb)
    assert float(m["total"]) == pytest.approx(float(t_ref), rel=1e-3)

    # the feature batch really is sharded over both axes
    from srm_tpu.parallel.mesh import shard_batch
    xs = shard_batch(jnp.asarray(xb), mesh)
    spec = xs.sharding.spec
    assert tuple(spec) == ("data", None, "space", None, None)
