"""Golden test: the vectorized DG stencil residual against an independent
loop-based numpy implementation of the finite-volume math (the kind of
numerical regression test the reference lacked; SURVEY §4)."""

import jax.numpy as jnp
import numpy as np

from srm_tpu.kernels.stencil_pallas import StencilConfig, _jnp_forward

EPS = 1e-7


def loop_reference(p0, p1, kx, bgug, invBg0, invBg1, dinvBg0, q, qwell, t1, t2, cfg):
    """Straight-from-the-equations per-cell loop implementation with symmetric
    ghost cells (no shared code with the framework)."""
    H, W = p0.shape
    dv = cfg.dx * cfg.dy * cfg.dz
    cf = 97.32e-6 / (1 + 55.8721 * cfg.phi**1.428586)

    def ghost(f, j, i):
        jj = min(max(j, 0), H - 1)
        ii = min(max(i, 0), W - 1)
        return f[jj, ii]

    dom = np.zeros((H, W))
    ibc = np.zeros((H, W))
    tde = np.zeros((H, W))
    mbc_sum = 0.0
    for j in range(H):
        for i in range(W):
            k_ij = kx[j, i]
            k_e, k_w = ghost(kx, j, i + 1), ghost(kx, j, i - 1)
            k_s, k_n = ghost(kx, j + 1, i), ghost(kx, j - 1, i)
            kh_e = 2 * k_e * k_ij / (k_e + k_ij)
            kh_w = 2 * k_ij * k_w / (k_ij + k_w)
            kh_s = 2 * k_s * k_ij / (k_s + k_ij)
            kh_n = 2 * k_ij * k_n / (k_ij + k_n)

            b_ij = bgug[j, i]
            b_e = 0.5 * (ghost(bgug, j, i + 1) + b_ij)
            b_w = 0.5 * (b_ij + ghost(bgug, j, i - 1))
            b_s = 0.5 * (ghost(bgug, j + 1, i) + b_ij)
            b_n = 0.5 * (b_ij + ghost(bgug, j - 1, i))

            a_e = cfg.C * kh_e * cfg.krgo * b_e / cfg.dx**2
            a_w = cfg.C * kh_w * cfg.krgo * b_w / cfg.dx**2
            a_s = cfg.C * kh_s * cfg.krgo * b_s / cfg.dy**2
            a_n = cfg.C * kh_n * cfg.krgo * b_n / cfg.dy**2

            cr0 = cfg.phi * cf * invBg0[j, i]
            cp1 = cfg.Sgi * (cfg.phi * dinvBg0[j, i] + cr0)

            p_c = p1[j, i]
            p_e, p_w = ghost(p1, j, i + 1), ghost(p1, j, i - 1)
            p_s, p_n = ghost(p1, j + 1, i), ghost(p1, j - 1, i)

            divq = dv * (-a_w * p_w - a_n * p_n + (a_w + a_n + a_e + a_s) * p_c
                         - a_e * p_e - a_s * p_s + q[j, i] / dv)
            acc = dv * (cp1 / (cfg.D * t1)) * (p_c - p0[j, i])

            p2 = (p_c - p0[j, i]) * (1 + t2 / t1) + p0[j, i]
            tde[j, i] = (dv / cfg.D) * cp1 * (
                2 * EPS / t1 + (t2 * p0[j, i] + t1 * p2 - (t1 + t2) * p_c)
                / (t1 * t2 + t2**2))
            dom[j, i] = divq + acc
            ibc[j, i] = qwell[j, i] * divq
            mbc_sum += q[j, i] + dv * cfg.Sgi * cfg.phi * (invBg1[j, i] - invBg0[j, i]) / (cfg.D * t1)
    return dom, ibc, tde, -mbc_sum


def test_dg_residual_matches_loop_reference():
    rng = np.random.RandomState(1)
    H = W = 7
    p0 = rng.uniform(4500, 5000, (H, W))
    p1 = p0 - rng.uniform(0, 40, (H, W))
    kx = rng.uniform(0.5, 8.0, (H, W))
    invBg0 = rng.uniform(0.9, 1.1, (H, W))
    invBg1 = invBg0 * 0.99
    invug0 = rng.uniform(25, 35, (H, W))
    bgug = invBg1 * invug0
    dinvBg0 = rng.uniform(1e-4, 2e-4, (H, W))
    q = np.zeros((H, W))
    q[3, 3] = 400.0
    qwell = np.zeros((H, W))
    qwell[3, 3] = 1.0
    t1, t2 = 4.0, 6.0
    cfg = StencilConfig(C=0.001127, D=5.6145833334, dx=74.36, dy=74.36, dz=80.0,
                        Sgi=0.78, krgo=0.8, phi=0.2)

    dom_ref, ibc_ref, tde_ref, mbc_ref = loop_reference(
        p0, p1, kx, bgug, invBg0, invBg1, dinvBg0, q, qwell, t1, t2, cfg)

    pad = lambda a: np.pad(a, 1, mode="symmetric")[None].astype(np.float32)  # noqa: E731
    cent = lambda a: a[None].astype(np.float32)  # noqa: E731
    dom, ibc, tde, mbc = _jnp_forward(
        jnp.asarray(pad(p0)), jnp.asarray(pad(p1)), jnp.asarray(pad(kx)),
        jnp.asarray(pad(bgug)), jnp.asarray(cent(invBg0)), jnp.asarray(cent(invBg1)),
        jnp.asarray(cent(dinvBg0)), jnp.asarray(cent(q)), jnp.asarray(qwell.astype(np.float32)),
        jnp.asarray(np.asarray([[t1, t2]], np.float32)), cfg)

    np.testing.assert_allclose(np.asarray(dom[0]), dom_ref, rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(ibc[0]), ibc_ref, rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(tde[0]), tde_ref, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(mbc[0]), mbc_ref, rtol=2e-4)
