"""Pallas kernel tests (interpret mode on the CPU test backend): the ADMM
chunk kernel must be numerically equivalent to the jnp reference path."""

import jax
import jax.numpy as jnp
import numpy as np

from gpmpc_tpu.ops.pallas.admm_kernel import admm_chunk
from gpmpc_tpu.ops.qp import QPData
from gpmpc_tpu.ops.qp import admm as A


def _setup(rng, n=12, m=18):
    import sys
    sys.path.insert(0, "tests")
    from test_qp import random_qp

    data = random_qp(rng, n=n, m=m, eq_rows=4)
    rho_v = A._rho_vec(data.l, data.u, jnp.asarray(0.1))
    Minv = A._factor(data.P, data.A, rho_v, 1e-6)
    x = jnp.zeros(n)
    z = data.A @ x
    y = jnp.zeros(m)
    return data, Minv, rho_v, x, z, y


def _reference_iters(data, Minv, rho_v, x, z, y, iters, sigma=1e-6, alpha=1.6):
    for _ in range(iters):
        rhs = sigma * x - data.q + data.A.T @ (rho_v * z - y)
        xt = Minv @ rhs
        zt = data.A @ xt
        xn = alpha * xt + (1 - alpha) * x
        zr = alpha * zt + (1 - alpha) * z
        zn = jnp.clip(zr + y / rho_v, data.l, data.u)
        y = y + rho_v * (zr - zn)
        x, z = xn, zn
    return x, z, y


class TestADMMChunkKernel:
    def test_matches_jnp_path(self, rng):
        data, Minv, rho_v, x, z, y = _setup(rng)
        xr, zr, yr = _reference_iters(data, Minv, rho_v, x, z, y, 10)
        xp, zp, yp = admm_chunk(
            Minv, data.A, data.q, data.l, data.u, rho_v, x, z, y,
            iters=10, sigma=1e-6, alpha=1.6, interpret=True,
        )
        np.testing.assert_allclose(xp, xr, atol=3e-4)
        np.testing.assert_allclose(zp, zr, atol=3e-4)
        np.testing.assert_allclose(yp, yr, atol=2e-3)  # duals on rho-boosted rows amplify f32 reorder noise

    def test_vmap_batches(self, rng):
        datas = [_setup(np.random.default_rng(s)) for s in range(3)]
        stack = lambda i: jnp.stack([d[i] if not isinstance(d[i], QPData) else None
                                     for d in datas]) if i else None
        Minv = jnp.stack([d[1] for d in datas])
        Am = jnp.stack([d[0].A for d in datas])
        q = jnp.stack([d[0].q for d in datas])
        l = jnp.stack([d[0].l for d in datas])
        u = jnp.stack([d[0].u for d in datas])
        rho = jnp.stack([d[2] for d in datas])
        x = jnp.stack([d[3] for d in datas])
        z = jnp.stack([d[4] for d in datas])
        y = jnp.stack([d[5] for d in datas])
        xb, zb, yb = jax.vmap(
            lambda *a: admm_chunk(*a, iters=5, sigma=1e-6, alpha=1.6, interpret=True)
        )(Minv, Am, q, l, u, rho, x, z, y)
        for i, (data, Mi, rv, x0, z0, y0) in enumerate(datas):
            xr, zr, yr = _reference_iters(data, Mi, rv, x0, z0, y0, 5)
            np.testing.assert_allclose(xb[i], xr, atol=3e-4)

    def test_lanes_kernel_matches_jnp_path(self, rng):
        """Multi-lane VMEM-resident kernel (interpret mode): a vmapped batch
        of chunks matches the per-lane jnp reference to reduce-order noise."""
        from gpmpc_tpu.ops.pallas.admm_kernel import make_admm_chunk_lanes

        datas = [_setup(np.random.default_rng(s)) for s in range(4)]
        Minv = jnp.stack([d[1] for d in datas])
        Am = jnp.stack([d[0].A for d in datas])
        q = jnp.stack([d[0].q for d in datas])
        l = jnp.stack([d[0].l for d in datas])
        u = jnp.stack([d[0].u for d in datas])
        rho = jnp.stack([d[2] for d in datas])
        x = jnp.stack([d[3] for d in datas])
        z = jnp.stack([d[4] for d in datas])
        y = jnp.stack([d[5] for d in datas])
        chunk = make_admm_chunk_lanes(8, 1e-6, 1.6, interpret=True)
        # unbatched call = plain jnp fallback
        x1, z1, y1 = chunk(Minv[0], Am[0], q[0], l[0], u[0], rho[0],
                           x[0], z[0], y[0])
        xr, zr, yr = _reference_iters(datas[0][0], Minv[0], rho[0],
                                      x[0], z[0], y[0], 8)
        np.testing.assert_allclose(x1, xr, atol=3e-4)
        # vmapped call = the multi-lane Pallas kernel
        xb, zb, yb = jax.jit(jax.vmap(chunk))(Minv, Am, q, l, u, rho, x, z, y)
        for i, (data, Mi, rv, x0, z0, y0) in enumerate(datas):
            xi, zi, yi = _reference_iters(data, Mi, rv, x0, z0, y0, 8)
            np.testing.assert_allclose(xb[i], xi, atol=3e-4)
            np.testing.assert_allclose(zb[i], zi, atol=3e-4)
            np.testing.assert_allclose(yb[i], yi, atol=2e-3)

    def test_solver_lanes_mode_matches_off(self, rng):
        """solve(use_pallas='lanes_interpret') under vmap matches the jnp
        path per lane."""
        import sys
        sys.path.insert(0, "tests")
        from test_qp import random_qp

        datas = [random_qp(np.random.default_rng(s)) for s in range(4)]
        batch = QPData(
            P=jnp.stack([d.P for d in datas]),
            q=jnp.stack([d.q for d in datas]),
            A=jnp.stack([d.A for d in datas]),
            l=jnp.stack([d.l for d in datas]),
            u=jnp.stack([d.u for d in datas]),
        )
        cfg_off = A.ADMMConfig(max_iter=100, use_pallas="off")
        cfg_ln = A.ADMMConfig(max_iter=100, use_pallas="lanes_interpret")
        sol_off = jax.vmap(lambda d: A.solve(d, config=cfg_off))(batch)
        sol_ln = jax.vmap(lambda d: A.solve(d, config=cfg_ln))(batch)
        np.testing.assert_allclose(sol_ln.x, sol_off.x, atol=5e-4)
        np.testing.assert_array_equal(sol_ln.status, sol_off.status)

    def test_solver_pallas_on_equals_off(self, rng):
        """Full solve with the kernel (interpret mode) matches the jnp path."""
        import sys
        sys.path.insert(0, "tests")
        from test_qp import random_qp

        data = random_qp(rng)
        cfg_off = A.ADMMConfig(max_iter=100, use_pallas="off")
        sol_off = A.solve(data, config=cfg_off)
        # interpret-mode kernel: monkeypatch availability
        import gpmpc_tpu.ops.pallas.admm_kernel as K

        orig = K.admm_chunk
        K_interp = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
        K.admm_chunk = K_interp
        try:
            cfg_on = A.ADMMConfig(max_iter=100, use_pallas="on")
            sol_on = A.solve(data, config=cfg_on)
        finally:
            K.admm_chunk = orig
        np.testing.assert_allclose(sol_on.x, sol_off.x, atol=2e-4)
        assert int(sol_on.status) == int(sol_off.status)
