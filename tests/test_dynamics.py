"""Dynamics rollout tests vs hand-written Euler loops (SURVEY.md §4b)."""
import jax
import jax.numpy as jnp
import numpy as np

from dlp_admm_tpu.config import VehicleConfig
from dlp_admm_tpu.ops import dynamics

CFG = VehicleConfig()


def np_bicycle_step(x, u, dt, coupled=False):
    """Hand-written Euler step of the bicycle model for oracle comparison."""
    px, py, v, th, st = x
    a, sr = u
    beta = np.arctan(CFG.lr * np.tan(st) / (CFG.lr + CFG.lf))
    if coupled:
        th_dot = v / (CFG.lr + CFG.lf) * np.cos(beta) * np.tan(st)
    else:
        th_dot = v / CFG.lr * np.sin(beta)
    rhs = np.array([v * np.cos(th + beta), v * np.sin(th + beta), a, th_dot, sr])
    return x + dt * rhs


class TestBicycle:
    def test_rhs_straight(self):
        x = jnp.array([0.0, 0.0, 10.0, 0.0, 0.0])
        u = jnp.array([1.0, 0.0])
        rhs = dynamics.bicycle_rhs(x, u)
        np.testing.assert_allclose(np.asarray(rhs), [10, 0, 1, 0, 0], atol=1e-12)

    def test_rollout_matches_hand_euler(self):
        rng = np.random.default_rng(0)
        x0 = jnp.array([0.0, 0.0, 5.0, 0.2, 0.05])
        us = jnp.asarray(rng.uniform(-1, 1, size=(12, 2)))
        traj = dynamics.euler_rollout(dynamics.bicycle_rhs, x0, us, CFG.dt)
        x = np.asarray(x0, dtype=np.float64)
        for k in range(12):
            x = np_bicycle_step(x, np.asarray(us[k]), CFG.dt)
            np.testing.assert_allclose(np.asarray(traj[k + 1]), x, atol=1e-9)

    def test_coupled_variant_algebraically_equivalent(self):
        """v/lr*sin(beta) == v/(lr+lf)*cos(beta)*tan(steer) given
        tan(beta) = lr*tan(steer)/(lr+lf) — the two reference forms
        (decentralized/optimizer.py:77 vs centralized/optimizer.py:69) are the
        same dynamics written differently."""
        x = jnp.array([1.0, 2.0, 8.0, 0.3, 0.2])
        u = jnp.array([0.5, -0.1])
        r1 = np.asarray(dynamics.bicycle_rhs(x, u))
        r2 = np.asarray(dynamics.bicycle_rhs_coupled(x, u))
        np.testing.assert_allclose(r1, r2, rtol=1e-7)
        expect = np_bicycle_step(np.asarray(x), np.asarray(u), 1.0, coupled=True)
        np.testing.assert_allclose(np.asarray(x) + r2, expect, atol=1e-12)


def np_unicycle_local(xt, u, spd, dt, L, H):
    """Oracle: sequential loop port of dynamic_update_local semantics."""
    x = np.zeros(H + 1); y = np.zeros(H + 1); th = np.zeros(H + 1)
    x[0], y[0], th[0] = xt
    th0 = xt[2]
    for k in range(H):
        x_dot = -spd * np.sin(th0) * th[k] + (spd * np.cos(th0)
                                              + spd * th0 * np.sin(th0))
        y_dot = spd * np.cos(th0) * th[k] + (spd * np.sin(th0)
                                             - spd * th0 * np.cos(th0))
        x[k + 1] = x[k] + dt * x_dot
        y[k + 1] = y[k] + dt * y_dot
        th[k + 1] = th[k] + dt * spd / L * u[k]
    return x, y, th


def np_unicycle_edge(xt, u, spd, dt, L, H):
    """Oracle: relinearize at the propagated heading each step."""
    x = np.zeros(H + 1); y = np.zeros(H + 1); th = np.zeros(H + 1)
    x[0], y[0], th[0] = xt
    for k in range(H):
        x_dot = -spd * np.sin(th[k]) * th[k] + (spd * np.cos(th[k])
                                                + spd * th[k] * np.sin(th[k]))
        y_dot = spd * np.cos(th[k]) * th[k] + (spd * np.sin(th[k])
                                               - spd * th[k] * np.cos(th[k]))
        x[k + 1] = x[k] + dt * x_dot
        y[k + 1] = y[k] + dt * y_dot
        th[k + 1] = th[k] + dt * spd / L * u[k]
    return x, y, th


class TestUnicycle:
    H, DT, L = 7, 0.1, 1.0

    def test_local_matches_oracle(self):
        rng = np.random.default_rng(1)
        xt = np.array([-10.0, 0.5, 0.4])
        u = rng.uniform(-0.5, 0.5, self.H)
        x, y, th = dynamics.unicycle_rollout_local(
            jnp.asarray(xt), jnp.asarray(u)[None, :].squeeze(0),
            jnp.asarray(4.0), self.DT, self.L)
        ex, ey, eth = np_unicycle_local(xt, u, 4.0, self.DT, self.L, self.H)
        np.testing.assert_allclose(np.asarray(x), ex, atol=1e-9)
        np.testing.assert_allclose(np.asarray(y), ey, atol=1e-9)
        np.testing.assert_allclose(np.asarray(th), eth, atol=1e-9)

    def test_local_is_linear_in_u(self):
        """The local rollout must be linear in u (it becomes a QP objective)."""
        xt = jnp.array([0.0, 20.0, -np.pi / 2])
        u1 = jnp.asarray(np.random.default_rng(2).uniform(-0.3, 0.3, self.H))
        u2 = jnp.asarray(np.random.default_rng(3).uniform(-0.3, 0.3, self.H))

        def pos(u):
            x, y, _ = dynamics.unicycle_rollout_local(
                xt, u, jnp.asarray(8.0), self.DT, self.L)
            return jnp.concatenate([x, y])

        p1, p2 = pos(u1), pos(u2)
        pm = pos(0.5 * (u1 + u2))
        np.testing.assert_allclose(np.asarray(pm),
                                   0.5 * np.asarray(p1 + p2), atol=1e-9)

    def test_edge_matches_oracle_batched(self):
        rng = np.random.default_rng(4)
        xt = np.array([[-10.0, 0.0, 0.0], [0.0, 20.0, -np.pi / 2]])
        u = rng.uniform(-0.5, 0.5, (2, self.H))
        spd = np.array([4.0, 8.0])
        x, y, th = dynamics.unicycle_rollout_edge(
            jnp.asarray(xt), jnp.asarray(u), jnp.asarray(spd), self.DT, self.L)
        for i in range(2):
            ex, ey, eth = np_unicycle_edge(xt[i], u[i], spd[i],
                                           self.DT, self.L, self.H)
            np.testing.assert_allclose(np.asarray(x[i]), ex, atol=1e-9)
            np.testing.assert_allclose(np.asarray(y[i]), ey, atol=1e-9)
            np.testing.assert_allclose(np.asarray(th[i]), eth, atol=1e-9)

    def test_edge_equals_exact_cos_identity(self):
        """-v sin(t)t + v cos(t) + v t sin(t) == v cos(t): the edge rollout is
        the exact unicycle with linear (small-angle) steering response."""
        xt = jnp.array([[1.0, 2.0, 0.7]])
        u = jnp.zeros((1, self.H))
        x, y, _ = dynamics.unicycle_rollout_edge(
            xt, u, jnp.asarray([3.0]), self.DT, self.L)
        expect_x = 1.0 + 3.0 * np.cos(0.7) * self.DT * np.arange(self.H + 1)
        expect_y = 2.0 + 3.0 * np.sin(0.7) * self.DT * np.arange(self.H + 1)
        np.testing.assert_allclose(np.asarray(x[0]), expect_x, atol=1e-9)
        np.testing.assert_allclose(np.asarray(y[0]), expect_y, atol=1e-9)

    def test_exact_plant_tan_model(self):
        xt = jnp.array([[0.0, 0.0, 0.0]])
        u = jnp.full((1, 3), 0.2)
        x, y, th = dynamics.unicycle_rollout_exact(
            xt, u, jnp.asarray([5.0]), self.DT, self.L)
        ex, ey, eth = 0.0, 0.0, 0.0
        for _ in range(3):
            ex += self.DT * 5.0 * np.cos(eth)
            ey += self.DT * 5.0 * np.sin(eth)
            eth += self.DT * 5.0 / self.L * np.tan(0.2)
        np.testing.assert_allclose(float(x[0, -1]), ex, atol=1e-9)
        np.testing.assert_allclose(float(y[0, -1]), ey, atol=1e-9)
        np.testing.assert_allclose(float(th[0, -1]), eth, atol=1e-9)

    def test_vmap_over_vehicles(self):
        xt = jnp.array([[-10.0, 0.0, 0.0], [0.0, 20.0, -np.pi / 2]])
        u = jnp.zeros((2, self.H))
        spd = jnp.array([4.0, 8.0])
        x, y, th = jax.vmap(
            lambda a, b, c: dynamics.unicycle_rollout_local(
                a, b, c, self.DT, self.L))(xt, u, spd)
        assert x.shape == (2, self.H + 1)
        np.testing.assert_allclose(np.asarray(x[0]),
                                   -10.0 + 0.4 * np.arange(self.H + 1) * 1.0,
                                   atol=1e-9)


class TestRK4:
    def test_rk4_more_accurate_than_euler(self):
        """Circular motion: RK4 must beat Euler against the exact circle."""
        import jax.numpy as jnp
        from dlp_admm_tpu.ops.dynamics import euler_rollout, rk4_rollout

        def rhs(x, u):  # unit circle: xdot = -y, ydot = x
            return jnp.stack([-x[..., 1], x[..., 0]], axis=-1)

        x0 = jnp.array([1.0, 0.0])
        us = jnp.zeros((50, 1))
        dt = 0.1
        eu = euler_rollout(rhs, x0, us, dt)
        rk = rk4_rollout(rhs, x0, us, dt)
        t = dt * np.arange(51)
        exact = np.stack([np.cos(t), np.sin(t)], axis=-1)
        err_eu = np.abs(np.asarray(eu) - exact).max()
        err_rk = np.abs(np.asarray(rk) - exact).max()
        assert err_rk < err_eu / 100
        assert err_rk < 1e-5
