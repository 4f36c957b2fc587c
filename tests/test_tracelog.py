"""Native trace logger + RunMetrics streaming tests (C++ tracelog + ctypes bindings)."""
import os
import tempfile

import numpy as np

from dlp_admm_tpu.utils.tracelog import (TraceLog, native_available,
                                         read_tracelog)


class TestTraceLog:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        data = rng.normal(size=(257, 9)).astype(np.float32)
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "run.dlplog")
            with TraceLog(path, 9) as log:
                log.append(data[:100])
                log.append(data[100:])
                assert log.n_records == 257
                log.flush()
            back = read_tracelog(path)
            np.testing.assert_array_equal(back, data)

    def test_single_record_and_dtype_coercion(self):
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "one.dlplog")
            with TraceLog(path, 4) as log:
                log.append(np.arange(4, dtype=np.float64))  # coerced f32
            back = read_tracelog(path)
            np.testing.assert_allclose(back, [[0, 1, 2, 3]])

    def test_native_library_builds(self):
        """The C++ runtime must actually be in use on this toolchain."""
        assert native_available()

    def test_high_rate_append(self):
        """64k records through the buffered writer."""
        data = np.ones((1024, 16), np.float32)
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "hr.dlplog")
            with TraceLog(path, 16) as log:
                for _ in range(64):
                    log.append(data)
            back = read_tracelog(path)
            assert back.shape == (64 * 1024, 16)
            assert float(back.sum()) == 64 * 1024 * 16


class TestRunMetricsStreaming:
    def test_log_step_streams_records(self):
        """RunMetrics(trace_path=...) streams per-step telemetry through the
        native logger: [step, iterations, extras sorted by key, padding]."""
        from dlp_admm_tpu.utils.metrics import RunMetrics
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "metrics.dlplog")
            m = RunMetrics(trace_path=path)
            m.log_step(0, 5, rho=1.5, primal=0.25)
            m.log_step(1, 7, rho=2.0, primal=0.125)
            m.close()
            back = read_tracelog(path)
        assert back.shape == (2, 8)
        # extras sorted: primal before rho
        np.testing.assert_allclose(back[0], [0, 5, 0.25, 1.5, 0, 0, 0, 0])
        np.testing.assert_allclose(back[1], [1, 7, 0.125, 2.0, 0, 0, 0, 0])
