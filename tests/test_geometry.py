"""Geometry kernel tests against closed-form cases (SURVEY.md §4a)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlp_admm_tpu.config import VehicleConfig
from dlp_admm_tpu.ops import geometry

CFG = VehicleConfig()


def state(x, y, v=0.0, th=0.0, steer=0.0):
    return jnp.array([x, y, v, th, steer])


class TestVertices:
    def test_axis_aligned(self):
        v = geometry.vehicle_vertices(state(1.0, 2.0))
        # center-based rectangle: L/2 = 1.75 fore/aft, W/2 = 1.0 lateral
        expect = np.array([[1 + 1.75, 2 + 1], [1 + 1.75, 2 - 1],
                           [1 - 1.75, 2 - 1], [1 - 1.75, 2 + 1]])
        np.testing.assert_allclose(np.asarray(v), expect, atol=1e-12)

    def test_base_link(self):
        v = geometry.vehicle_vertices(state(0.0, 0.0), base_link=True)
        # baselink_to_front=3, baselink_to_rear=0.5
        expect = np.array([[3, 1], [3, -1], [-0.5, -1], [-0.5, 1]])
        np.testing.assert_allclose(np.asarray(v), expect, atol=1e-12)

    def test_rotation_90deg(self):
        v = geometry.vehicle_vertices(state(0.0, 0.0, th=np.pi / 2))
        expect = np.array([[-1, 1.75], [1, 1.75], [1, -1.75], [-1, -1.75]])
        np.testing.assert_allclose(np.asarray(v), expect, atol=1e-12)

    def test_batched(self):
        states = jnp.stack([state(0, 0), state(5, 1, th=0.3)])
        v = geometry.vehicle_vertices(states)
        assert v.shape == (2, 4, 2)
        np.testing.assert_allclose(
            np.asarray(v[1]),
            np.asarray(geometry.vehicle_vertices(state(5, 1, th=0.3))))


class TestHalfspaces:
    def test_axis_aligned_known_values(self):
        verts = geometry.vehicle_vertices(state(0.0, 0.0))
        a_mat, b = geometry.halfspaces_from_vertices(verts)
        # each row is a unit normal; box is |x| <= 1.75, |y| <= 1
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(a_mat), axis=-1), 1.0, atol=1e-12)
        got = sorted(zip(np.asarray(a_mat).round(9).tolist(),
                         np.asarray(b).round(9).tolist()))
        expect = sorted([([1.0, 0.0], 1.75), ([-1.0, 0.0], 1.75),
                         ([0.0, 1.0], 1.0), ([0.0, -1.0], 1.0)])
        for (ga, gb), (ea, eb) in zip(got, expect):
            np.testing.assert_allclose(ga, ea, atol=1e-9)
            np.testing.assert_allclose(gb, eb, atol=1e-9)

    @pytest.mark.parametrize("th", [0.0, 0.4, -1.2, np.pi / 2, 3.0])
    def test_interior_point_satisfies(self, th):
        s = state(2.0, -3.0, th=th)
        verts = geometry.vehicle_vertices(s)
        a_mat, b = geometry.halfspaces_from_vertices(verts)
        center = np.array([2.0, -3.0])
        assert np.all(np.asarray(a_mat) @ center <= np.asarray(b) + 1e-9)
        # a point well outside violates at least one halfspace
        outside = center + 10.0 * np.array([np.cos(th), np.sin(th)])
        assert np.any(np.asarray(a_mat) @ outside > np.asarray(b))

    @pytest.mark.parametrize("th", [0.0, 0.7, -2.1])
    def test_vertices_on_boundary(self, th):
        verts = geometry.vehicle_vertices(state(1.0, 1.0, th=th))
        a_mat, b = geometry.halfspaces_from_vertices(verts)
        prod = np.asarray(verts) @ np.asarray(a_mat).T  # [4 verts, 4 faces]
        assert np.all(prod <= np.asarray(b)[None, :] + 1e-9)
        # every vertex lies exactly on two faces
        on_face = np.isclose(prod, np.asarray(b)[None, :], atol=1e-9)
        assert np.all(on_face.sum(axis=1) == 2)

    @pytest.mark.parametrize("th", [0.0, 0.9, -0.5])
    def test_rot_form_equivalent_set(self, th):
        """Rotation form describes the same rectangle as the vertex form."""
        s = state(3.0, 2.0, v=5.0, th=th)
        a_rot, b_rot = geometry.halfspaces_rot(s)
        verts = np.asarray(geometry.vehicle_vertices(s))
        prod = verts @ np.asarray(a_rot).T
        assert np.all(prod <= np.asarray(b_rot)[None, :] + 1e-9)
        center = np.array([3.0, 2.0])
        np.testing.assert_allclose(
            np.asarray(a_rot) @ center,
            np.asarray(b_rot) - np.array([CFG.length / 2, CFG.width / 2,
                                          CFG.length / 2, CFG.width / 2]),
            atol=1e-9)

    def test_prob_tightening_formula(self):
        """Chance-tightened b matches the closed form of util.py:81-99."""
        s = state(1.0, 2.0, v=6.0, th=0.5)
        a_p, b_p = geometry.halfspaces_prob(s)
        a_r, b_r = geometry.halfspaces_rot(s)
        np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_r), atol=1e-12)
        v, th = 6.0, 0.5
        d_avg = CFG.avg_delay * v * np.array([np.cos(th), np.sin(th)])
        d_var = (CFG.var_delay * v) ** 2 * np.array(
            [np.cos(th) ** 2, np.sin(th) ** 2])
        shift = d_avg + np.sqrt(CFG.prob / (1 - CFG.prob)) * d_var
        np.testing.assert_allclose(
            np.asarray(b_p) - np.asarray(b_r),
            np.asarray(a_r) @ shift, atol=1e-9)

    def test_jit_and_grad(self):
        f = jax.jit(lambda s: geometry.halfspaces_from_vertices(
            geometry.vehicle_vertices(s))[1].sum())
        s = state(1.0, 2.0, th=0.3)
        assert np.isfinite(float(f(s)))
        g = jax.grad(f)(s)
        assert np.all(np.isfinite(np.asarray(g)))


class TestNormalizeAngle:
    @pytest.mark.parametrize("a,expect", [
        (0.0, 0.0), (np.pi / 2, np.pi / 2), (np.pi, np.pi),
        (3 * np.pi / 2, -np.pi / 2), (2 * np.pi, 0.0), (-np.pi / 2, -np.pi / 2),
        (7 * np.pi, np.pi),
    ])
    def test_values(self, a, expect):
        np.testing.assert_allclose(
            float(geometry.normalize_angle(jnp.array(a))), expect, atol=1e-12)
