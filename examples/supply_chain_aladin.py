"""Supply-chain MPC with the ALADIN coordinator (SURVEY.md C17).

The analogue of ``reference/ALADIN-master/supply_chain.ipynb``: two companies
(echelons) each control their own linear inventory dynamics over a horizon;
the flow shipped by company 1 must equal the flow received by company 2 —
a shared variable handled as an ALADIN coupling constraint, so neither
company reveals its internal model to the other.

Per agent i, decision y_i = [x_i (T+1, NX) | u_i (T, NU)] flattened:
    dynamics  x[t+1] = x[t] + B_i u[t] - d_i      (h_i = 0)
    objective tracking to target inventory + effort
Coupling: u_0[t, OUT] - u_1[t, IN] = 0 for all t.

Run:  JAX_PLATFORMS=cpu python examples/supply_chain_aladin.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from dlp_admm_tpu.config import SolverConfig
from dlp_admm_tpu.models.aladin import AladinEngine, AladinProblem

NX, NU, T = 3, 2, 6
NY = (T + 1) * NX + T * NU


def split(y):
    xs = y[:(T + 1) * NX].reshape(T + 1, NX)
    us = y[(T + 1) * NX:].reshape(T, NU)
    return xs, us


def make_problem():
    # company 0: produces and ships (u[:,1] = outbound flow)
    # company 1: receives (u[:,0] = inbound flow) and sells
    b0 = jnp.asarray(np.array([[1.0, -1.0], [0.5, 0.0], [0.0, 1.0]]))
    b1 = jnp.asarray(np.array([[1.0, -0.5], [0.0, 1.0], [0.5, 0.0]]))
    demand0 = jnp.asarray(np.array([0.3, 0.1, 0.0]))
    demand1 = jnp.asarray(np.array([0.0, 0.4, 0.2]))
    target = jnp.asarray(np.array([2.0, 1.0, 1.0]))
    x_init = jnp.asarray(np.array([[2.0, 1.0, 1.0], [1.5, 0.8, 1.2]]))

    def f(y, p):
        xs, us = split(y)
        return (jnp.sum((xs - p["target"]) ** 2)
                + 0.1 * jnp.sum(us ** 2))

    def h(y, p):
        xs, us = split(y)
        r0 = xs[0] - p["x0"]
        rdyn = xs[1:] - (xs[:-1] + us @ p["b"].T - p["d"])
        return jnp.concatenate([r0, rdyn.reshape(-1)])

    # coupling rows: one per horizon step, u_0[t, 1] == u_1[t, 0]
    a0 = np.zeros((T, NY))
    a1 = np.zeros((T, NY))
    for t in range(T):
        a0[t, (T + 1) * NX + t * NU + 1] = 1.0     # company 0 outbound
        a1[t, (T + 1) * NX + t * NU + 0] = -1.0    # company 1 inbound
    prob = AladinProblem(f=f, h=h,
                         a_mats=jnp.asarray(np.stack([a0, a1])),
                         b=jnp.zeros(T))
    params = dict(b=jnp.stack([b0, b1]),
                  d=jnp.stack([demand0, demand1]),
                  target=jnp.stack([target, target]),
                  x0=x_init)
    return prob, params, x_init


def main():
    prob, params, x_init = make_problem()
    eng = AladinEngine(prob, rho=5.0, mu=1e4,
                       scfg=SolverConfig(ip_iters=40, ip_tol=1e-8))
    y0 = jnp.zeros((2, NY))
    y0 = y0.at[:, :(T + 1) * NX].set(
        jnp.tile(x_init[:, None, :], (1, T + 1, 1)).reshape(2, -1))
    state, ys = eng.run(y0, params, n_iters=25)
    xs0, us0 = split(ys[0])
    xs1, us1 = split(ys[1])
    ship_gap = float(jnp.abs(us0[:, 1] - us1[:, 0]).max())
    print("coupling residual:", float(state.coupling_res))
    print("max |shipped - received|:", ship_gap)
    print("company0 inventories:\n", np.round(np.asarray(xs0), 3))
    print("company1 inventories:\n", np.round(np.asarray(xs1), 3))
    assert ship_gap < 1e-4, "flows must agree at convergence"
    return state, ys


if __name__ == "__main__":
    main()
