"""Native host runtime (C++ ring buffer + codecs) vs the Python fallbacks."""

import threading

import numpy as np
import pytest

from otslam_tpu.adapters.native import (
    FrameRing, depth_m_to_u16, depth_u16_to_m, load_native,
    native_available, write_ply_points_native)
from otslam_tpu.core import io as tio


class TestNativeBuild:
    def test_builds_and_loads(self):
        assert native_available(), "g++ toolchain expected in this image"


class TestDepthConversions:
    def test_roundtrip_matches_python(self):
        d = np.array([[0.5, 6.0, np.nan], [2.0011, 0.0, -1.0]], np.float32)
        u16 = depth_m_to_u16(d)
        # scanner semantics: NaN/far/negative -> 0; rounding like convertTo
        np.testing.assert_array_equal(u16, [[500, 0, 0], [2001, 0, 0]])
        back = depth_u16_to_m(u16)
        np.testing.assert_allclose(back, [[0.5, 0, 0], [2.001, 0, 0]],
                                   atol=5e-4)


class TestFrameRing:
    def test_push_pop_order(self):
        ring = FrameRing(4, 6, capacity=4)
        for i in range(3):
            ring.push(np.full((4, 6), float(i), np.float32),
                      np.full((4, 6, 3), i, np.uint8), stamp=float(i))
        assert len(ring) == 3
        d, c, s = ring.pop()
        assert s == 0.0 and d[0, 0] == 0.0 and c[0, 0, 0] == 0
        d, c, s = ring.pop()
        assert s == 1.0

    def test_drop_oldest_when_full(self):
        ring = FrameRing(2, 2, capacity=2)
        for i in range(5):
            ring.push(np.full((2, 2), float(i), np.float32),
                      np.zeros((2, 2, 3), np.uint8), stamp=float(i))
        assert ring.dropped >= 3
        d, c, s = ring.pop()
        assert s >= 3.0  # oldest were dropped

    def test_pop_latest_flushes(self):
        ring = FrameRing(2, 2, capacity=8)
        for i in range(5):
            ring.push(np.full((2, 2), float(i), np.float32),
                      np.zeros((2, 2, 3), np.uint8), stamp=float(i))
        d, c, s = ring.pop_latest()
        assert s == 4.0
        assert len(ring) == 0 and ring.pop() is None

    def test_threaded_producer_consumer(self):
        ring = FrameRing(8, 8, capacity=16)
        n = 200

        def produce():
            for i in range(n):
                ring.push(np.full((8, 8), float(i), np.float32),
                          np.zeros((8, 8, 3), np.uint8), stamp=float(i))

        got = []
        t = threading.Thread(target=produce)
        t.start()
        while t.is_alive() or len(ring):
            item = ring.pop()
            if item is not None:
                got.append(item[2])
        t.join()
        assert len(got) + ring.dropped == n
        assert got == sorted(got)  # FIFO order preserved


class TestNativePly:
    def test_matches_python_reader(self, tmp_path, rng):
        pts = rng.standard_normal((500, 3)).astype(np.float32)
        cols = rng.uniform(0, 1, (500, 3)).astype(np.float32)
        p = str(tmp_path / "native.ply")
        assert write_ply_points_native(p, pts, cols)
        back = tio.read_ply(p)
        np.testing.assert_allclose(back["points"], pts, atol=1e-6)
        np.testing.assert_allclose(back["colors"], cols, atol=1.0 / 255)
