"""Scenario generator tests (ref veh_config trajectory generators)."""
import numpy as np

from dlp_admm_tpu.config import PiAdmmConfig, VehicleConfig
from dlp_admm_tpu.scenarios import (pi_admm_crossing_refs,
                                    pi_admm_initial_states,
                                    pi_admm_overtake_refs,
                                    ref_traj_intersection, ref_traj_overtake)


class TestObcaScenarios:
    def test_overtake_matches_reference_values(self):
        """ref decentralized/veh_config.py:30-47: v=20 from x=0 and v=10
        from x=20, straight lane."""
        cfg = VehicleConfig()
        refs = ref_traj_overtake(cfg, 2)
        assert refs.shape == (2, 51, 5)
        np.testing.assert_allclose(refs[0, :, 0], np.linspace(0, 100, 51))
        np.testing.assert_allclose(refs[1, :, 0], np.linspace(20, 70, 51))
        np.testing.assert_allclose(refs[:, :, 1], 0.0)
        np.testing.assert_allclose(refs[0, :, 2], 20.0)
        np.testing.assert_allclose(refs[1, :, 2], 10.0)

    def test_intersection_matches_reference_values(self):
        """ref centralized/veh_config.py:50-67: crossing at right angles,
        both 10 m/s, veh2 heading -pi/2."""
        cfg = VehicleConfig()
        refs = ref_traj_intersection(cfg, 2)
        np.testing.assert_allclose(refs[0, :, 0], np.linspace(0, 50, 51))
        np.testing.assert_allclose(refs[1, :, 1], np.linspace(25, -25, 51))
        np.testing.assert_allclose(refs[1, :, 0], 25.0)
        np.testing.assert_allclose(refs[1, :, 3], -np.pi / 2)

    def test_16_vehicle_lanes_disjoint(self):
        refs = ref_traj_overtake(VehicleConfig(), 16)
        assert refs.shape[0] == 16
        lanes = sorted(set(np.round(refs[:, 0, 1], 3)))
        assert len(lanes) == 8  # two vehicles per lane


class TestPiAdmmScenarios:
    def test_crossing_matches_reference(self):
        """ref casadi_old_PI_ADMM/PI_ADMM_class.py:30-37 + main.py:23."""
        cfg = PiAdmmConfig()
        refs = pi_admm_crossing_refs(cfg)
        np.testing.assert_allclose(refs[0, 0], np.linspace(-10, 10, 50))
        np.testing.assert_allclose(refs[1, 1], np.linspace(20, -20, 50))
        states = pi_admm_initial_states(cfg)
        np.testing.assert_allclose(states,
                                   [[-10, 0, 0], [0, 20, -np.pi / 2]])

    def test_overtake_benchmark_workload(self):
        cfg = PiAdmmConfig(num_veh=16,
                           speeds=tuple(8.0 if i % 2 == 0 else 4.0
                                        for i in range(16)),
                           horizon=30)
        refs, states = pi_admm_overtake_refs(cfg)
        assert refs.shape == (16, 2, 50)
        assert states.shape == (16, 3)
        # fast vehicle starts 10 m behind its lane partner
        np.testing.assert_allclose(states[0], [-10, 0, 0])
        np.testing.assert_allclose(states[1], [0, 0, 0])
        # lanes 6 m apart
        np.testing.assert_allclose(states[2, 1], 6.0)
