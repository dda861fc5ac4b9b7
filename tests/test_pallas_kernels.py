"""Pallas kernel parity tests (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from srm_tpu.kernels.stencil_pallas import (
    StencilConfig, dg_stencil_residual, _jnp_forward,
)


def _make_inputs(B=3, H=13, W=13, seed=0):
    rng = np.random.RandomState(seed)
    pad = lambda a: np.pad(a, [(0, 0), (1, 1), (1, 1)], mode="symmetric")  # noqa: E731
    p0 = rng.uniform(4500, 5000, (B, H, W)).astype(np.float32)
    p1 = p0 - rng.uniform(0, 50, (B, H, W)).astype(np.float32)
    kx = rng.uniform(0.5, 10.0, (B, H, W)).astype(np.float32)
    invBg = rng.uniform(0.9, 1.2, (B, H, W)).astype(np.float32)
    invug = rng.uniform(30, 40, (B, H, W)).astype(np.float32)
    invBg1 = invBg * 0.99
    dinvBg = rng.uniform(1e-4, 3e-4, (B, H, W)).astype(np.float32)
    q = np.zeros((B, H, W), np.float32)
    q[:, H // 2, W // 2] = 500.0
    qwell = np.zeros((H, W), np.float32)
    qwell[H // 2, W // 2] = 1.0
    tsteps = rng.uniform(1.0, 9.0, (B, 2)).astype(np.float32)
    cfg = StencilConfig(C=0.001127, D=5.6145833334, dx=74.36, dy=74.36, dz=80.0,
                        Sgi=0.78, krgo=0.8, phi=0.2)
    args = (jnp.asarray(pad(p0)), jnp.asarray(pad(p1)), jnp.asarray(pad(kx)),
            jnp.asarray(pad(invBg * invug)), jnp.asarray(invBg), jnp.asarray(invBg1),
            jnp.asarray(dinvBg), jnp.asarray(q), jnp.asarray(qwell),
            jnp.asarray(tsteps))
    return args, cfg


def test_pallas_stencil_matches_jnp():
    args, cfg = _make_inputs()
    dom_p, ibc_p, tde_p, mbc_p = dg_stencil_residual(*args, cfg)
    dom_j, ibc_j, tde_j, mbc_j = _jnp_forward(*args, cfg)
    # tolerance: the interpret-mode kernel evaluates as one fused program
    # while the jnp twin runs op-by-op, so FMA contraction/reassociation
    # differences of O(1e-3) relative are expected and backend-dependent
    np.testing.assert_allclose(np.asarray(dom_p), np.asarray(dom_j), rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ibc_p), np.asarray(ibc_j), rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(tde_p), np.asarray(tde_j), rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(mbc_p), np.asarray(mbc_j), rtol=5e-3)


def test_pallas_stencil_gradients():
    """The custom-vjp backward (vjp of the jnp twin) matches direct jnp grads."""
    args, cfg = _make_inputs(B=2, H=9, W=9)

    def loss_pallas(p1p):
        dom, ibc, tde, mbc = dg_stencil_residual(args[0], p1p, *args[2:], cfg)
        return jnp.sum(dom**2) + jnp.sum(ibc**2) + jnp.sum(mbc**2)

    def loss_jnp(p1p):
        dom, ibc, tde, mbc = _jnp_forward(args[0], p1p, *args[2:], cfg)
        return jnp.sum(dom**2) + jnp.sum(ibc**2) + jnp.sum(mbc**2)

    g_p = jax.grad(loss_pallas)(args[1])
    g_j = jax.grad(loss_jnp)(args[1])
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_j), rtol=5e-3, atol=5e-3)


def test_pallas_stencil_jit():
    args, cfg = _make_inputs()
    f = jax.jit(lambda *a: dg_stencil_residual(*a, cfg))
    outs = f(*args)
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)
