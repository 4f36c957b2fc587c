"""Vehicle dynamics kernels: bicycle and unicycle models + rollouts.

TPU-native re-implementation of the reference's dynamics layer (SURVEY.md C3/C4):

* :func:`bicycle_rhs`          — 5-state kinematic bicycle,
  ref ``Distributed_planner/decentralized/optimizer.py:61-82`` (``local_build_model``)
* :func:`bicycle_rhs_coupled`  — centralized variant with
  ``theta_dot = v/(lr+lf) * cos(beta) * tan(steer)``,
  ref ``Distributed_planner/centralized/optimizer.py:68-70``
* :func:`unicycle_rollout_local` / :func:`unicycle_rollout_edge` — 3-state
  linearized unicycle rollouts, ref ``casadi/PI_ADMM_class.py:45-105``
  (``dynamic_update_local`` / ``dynamic_update_edge``)
* :func:`unicycle_rollout_exact` — exact ``tan(u)`` unicycle used to advance the
  plant, ref ``reference/admm-edge-yalmip-main/dynamic_update_simulation.m``

Rollouts are ``lax.scan`` over the horizon; everything carries an arbitrary
batch prefix so ``vmap`` over (scenario, vehicle) is free. All functions are
pure and traceable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import VehicleConfig

# %% 5-state kinematic bicycle (OBCA line). State = (x, y, v, theta, steer),
# control = (acc, steer_rate).


def bicycle_rhs(state: jnp.ndarray, control: jnp.ndarray,
                cfg: VehicleConfig = VehicleConfig()) -> jnp.ndarray:
    """dx/dt of the kinematic bicycle (ref ``decentralized/optimizer.py:75-77``).

    ``beta = atan(lr*tan(steer)/(lr+lf))``;
    ``[v cos(th+b), v sin(th+b), a, v/lr sin(b), steer_rate]``.
    """
    v, theta, steer = state[..., 2], state[..., 3], state[..., 4]
    a, steer_rate = control[..., 0], control[..., 1]
    beta = jnp.arctan(cfg.lr * jnp.tan(steer) / (cfg.lr + cfg.lf))
    return jnp.stack([
        v * jnp.cos(theta + beta),
        v * jnp.sin(theta + beta),
        a,
        v / cfg.lr * jnp.sin(beta),
        steer_rate,
    ], axis=-1)


def bicycle_rhs_coupled(state: jnp.ndarray, control: jnp.ndarray,
                        cfg: VehicleConfig = VehicleConfig()) -> jnp.ndarray:
    """Centralized-planner variant of the heading rate.

    Ref ``centralized/optimizer.py:68-69``:
    ``theta_dot = v/(lr+lf) * cos(beta) * tan(steer)`` (other rows identical).
    """
    v, theta, steer = state[..., 2], state[..., 3], state[..., 4]
    a, steer_rate = control[..., 0], control[..., 1]
    beta = jnp.arctan(cfg.lr * jnp.tan(steer) / (cfg.lr + cfg.lf))
    return jnp.stack([
        v * jnp.cos(theta + beta),
        v * jnp.sin(theta + beta),
        a,
        v / (cfg.lr + cfg.lf) * jnp.cos(beta) * jnp.tan(steer),
        steer_rate,
    ], axis=-1)


def euler_rollout(rhs, x0: jnp.ndarray, us: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Forward-Euler rollout ``x[k+1] = x[k] + dt * rhs(x[k], u[k])``.

    Matches the equality-constraint discretization of the reference
    (``decentralized/optimizer.py:92-100``). ``us`` has shape ``[H, ...]``;
    returns the trajectory including ``x0``, shape ``[H+1, ...]``.
    """
    def step(x, u):
        x_next = x + dt * rhs(x, u)
        return x_next, x_next

    _, xs = jax.lax.scan(step, x0, us)
    return jnp.concatenate([x0[None], xs], axis=0)


def rk4_rollout(rhs, x0: jnp.ndarray, us: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Classic RK4 rollout with zero-order-hold controls.

    The higher-order integrator of the third-party ALADIN optimal-control
    notebooks (ref ``reference/ALADIN-master/ALADIN_legacy.ipynb`` — SURVEY.md
    C17); usable as a drop-in for :func:`euler_rollout` in any planner for a
    more accurate plant/prediction model.
    """
    def step(x, u):
        k1 = rhs(x, u)
        k2 = rhs(x + 0.5 * dt * k1, u)
        k3 = rhs(x + 0.5 * dt * k2, u)
        k4 = rhs(x + dt * k3, u)
        x_next = x + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
        return x_next, x_next

    _, xs = jax.lax.scan(step, x0, us)
    return jnp.concatenate([x0[None], xs], axis=0)


# %% 3-state linearized unicycle (PI-ADMM line). State = (x, y, theta),
# control = steering angle u; constant speed per vehicle; wheel base L.


def unicycle_rollout_local(xt: jnp.ndarray, u: jnp.ndarray, spd: jnp.ndarray,
                           dt: float, wheel_base: float):
    """Vehicle-side rollout linearized about the *current* heading.

    Port of ``dynamic_update_local`` (``casadi/PI_ADMM_class.py:45-70``): with
    ``th0 = xt[2]`` fixed,
    ``x_dot = -v sin(th0) th_k + v cos(th0) + v th0 sin(th0)`` and
    ``y_dot =  v cos(th0) th_k + v sin(th0) - v th0 cos(th0)``;
    ``th_{k+1} = th_k + v/L u_k dt``. Linear in ``u``.

    Args:
        xt: ``[..., 3]`` current (x, y, theta).
        u: ``[..., H]`` steering inputs over the horizon.
        spd: ``[...]`` constant speed.

    Returns:
        ``(x, y, theta)`` each ``[..., H+1]`` including the current state.
    """
    xt = jnp.asarray(xt)
    spd = jnp.asarray(spd)
    th0 = xt[..., 2]
    sin0, cos0 = jnp.sin(th0), jnp.cos(th0)
    # theta is a cumulative sum of inputs: th_k = th0 + dt*v/L * cumsum(u)[:k]
    dth = dt * spd[..., None] / wheel_base * u
    theta = jnp.concatenate(
        [th0[..., None], th0[..., None] + jnp.cumsum(dth, axis=-1)], axis=-1)
    x_dot = (-spd[..., None] * sin0[..., None] * theta[..., :-1]
             + (spd * cos0 + spd * th0 * sin0)[..., None])
    y_dot = (spd[..., None] * cos0[..., None] * theta[..., :-1]
             + (spd * sin0 - spd * th0 * cos0)[..., None])
    x = jnp.concatenate(
        [xt[..., 0:1], xt[..., 0:1] + jnp.cumsum(dt * x_dot, axis=-1)], axis=-1)
    y = jnp.concatenate(
        [xt[..., 1:2], xt[..., 1:2] + jnp.cumsum(dt * y_dot, axis=-1)], axis=-1)
    return x, y, theta


def unicycle_rollout_edge(xt: jnp.ndarray, u: jnp.ndarray, spd: jnp.ndarray,
                          dt: float, wheel_base: float):
    """Edge-side rollout re-linearized about the propagated heading.

    Port of ``dynamic_update_edge`` (``casadi/PI_ADMM_class.py:77-105``): the
    Taylor point is ``theta_pred[k]`` itself, so
    ``x_dot = v cos(th_k) (sequentially evaluated via the identity
    -v sin(th_k) th_k + v cos(th_k) + v th_k sin(th_k))``. Because the
    linearization point moves with the state this is a genuine scan.

    Shapes as :func:`unicycle_rollout_local`.
    """
    xt = jnp.asarray(xt)
    v = jnp.asarray(spd)

    def step(carry, uk):
        x, y, th = carry
        # written exactly as the reference's linearized form evaluated at th
        x_dot = -v * jnp.sin(th) * th + (v * jnp.cos(th) + v * th * jnp.sin(th))
        y_dot = v * jnp.cos(th) * th + (v * jnp.sin(th) - v * th * jnp.cos(th))
        th_dot = v / wheel_base * uk
        nxt = (x + dt * x_dot, y + dt * y_dot, th + dt * th_dot)
        return nxt, nxt

    init = (xt[..., 0], xt[..., 1], xt[..., 2])
    _, (xs, ys, ths) = jax.lax.scan(step, init, jnp.moveaxis(u, -1, 0))
    x = jnp.concatenate([init[0][None], xs], axis=0)
    y = jnp.concatenate([init[1][None], ys], axis=0)
    th = jnp.concatenate([init[2][None], ths], axis=0)
    return (jnp.moveaxis(x, 0, -1), jnp.moveaxis(y, 0, -1),
            jnp.moveaxis(th, 0, -1))


def unicycle_rollout_exact(xt: jnp.ndarray, u: jnp.ndarray, spd: jnp.ndarray,
                           dt: float, wheel_base: float):
    """Exact nonlinear unicycle used as the simulation plant.

    Port of ``dynamic_update_simulation.m:1-22``:
    ``x_dot = v cos(th)``, ``y_dot = v sin(th)``,
    ``th_dot = v/L tan(u)``. The NilsEdit driver plans on the linearized model
    but advances the plant with this one (SURVEY.md C16).
    """
    xt = jnp.asarray(xt)
    v = jnp.asarray(spd)

    def step(carry, uk):
        x, y, th = carry
        nxt = (x + dt * v * jnp.cos(th),
               y + dt * v * jnp.sin(th),
               th + dt * v / wheel_base * jnp.tan(uk))
        return nxt, nxt

    init = (xt[..., 0], xt[..., 1], xt[..., 2])
    _, (xs, ys, ths) = jax.lax.scan(step, init, jnp.moveaxis(u, -1, 0))
    x = jnp.concatenate([init[0][None], xs], axis=0)
    y = jnp.concatenate([init[1][None], ys], axis=0)
    th = jnp.concatenate([init[2][None], ths], axis=0)
    return (jnp.moveaxis(x, 0, -1), jnp.moveaxis(y, 0, -1),
            jnp.moveaxis(th, 0, -1))
