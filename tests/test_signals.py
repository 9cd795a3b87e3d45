"""m-sequence generator tests: the defining LFSR/correlation properties,
and the end-to-end tomography story — an m-sequence transmission through
a multipath channel pulse-compresses back to the arrival pattern."""

import numpy as np
import pytest

import pygenray_tpu as pt


class TestCode:
    @pytest.mark.parametrize("order", [3, 5, 7, 10])
    def test_defining_properties(self, order):
        c = pt.msequence_code(order)
        L = 2**order - 1
        assert c.size == L
        assert set(np.unique(c)) == {-1.0, 1.0}
        # balance: one more +1 than -1 (or vice versa depending on
        # mapping) -> |sum| == 1
        assert abs(c.sum()) == 1.0
        # two-valued circular autocorrelation: L at lag 0, -1 elsewhere
        for lag in (1, 2, L // 3, L - 1):
            r = float(np.dot(c, np.roll(c, lag)))
            assert r == -1.0
        assert float(np.dot(c, c)) == L

    def test_maximal_period(self):
        """The LFSR state visits all 2^order - 1 nonzero states: the
        sequence must NOT repeat with any shorter period dividing L."""
        order, L = 6, 63
        c = pt.msequence_code(order)
        for p in (7, 9, 21):  # proper divisors of 63
            assert not np.array_equal(c, np.roll(c, p))

    def test_seed_is_a_cyclic_shift(self):
        a = pt.msequence_code(7, seed=1)
        b = pt.msequence_code(7, seed=73)
        assert any(np.array_equal(b, np.roll(a, k)) for k in range(a.size))

    def test_bad_args(self):
        with pytest.raises(ValueError, match="order"):
            pt.msequence_code(99)
        with pytest.raises(ValueError, match="seed"):
            pt.msequence_code(5, seed=0)


class TestSignal:
    def test_duration_and_modulation(self):
        fc, fs, order, cpd = 75.0, 600.0, 5, 2
        s = pt.msequence_signal(order, fc, fs, cycles_per_digit=cpd)
        L = 2**order - 1
        assert s.size == int(round(L * cpd / fc * fs))
        assert np.abs(s).max() <= 1.0
        # the phase-modulated carrier keeps a carrier line at fc:
        # |sum s(t) e^{-2pi i fc t}| ~ N cos(phi) / 2, far above any
        # other bin of a balanced modulation
        t = np.arange(s.size) / fs
        carrier = abs(np.dot(s, np.exp(-2j * np.pi * fc * t)))
        phi = np.arctan(np.sqrt(L))
        assert carrier == pytest.approx(s.size * np.cos(phi) / 2, rel=0.05)

    def test_bad_sampling(self):
        with pytest.raises(ValueError, match="fs"):
            pt.msequence_signal(5, 100.0, 150.0)

    def test_multipath_pulse_compression(self):
        """Two overlapping m-sequence receptions compress to two clean
        peaks at the travel times with the arrival amplitudes."""
        import dataclasses

        from tests.test_response import cat, one_arrival

        fc, fs = 100.0, 800.0
        s = pt.msequence_signal(8, fc, fs, cycles_per_digit=4)
        ab = cat(one_arrival(0.5, 1.0, 0.0),
                 one_arrival(0.25, 1.5, -np.pi / 2))
        rw = pt.received_waveform(ab, s, fs)
        cc = rw.correlate(s, fs)
        env = cc.envelope()
        for tk, amp in [(1.0, 0.5), (1.5, 0.25)]:
            w = (cc.t > tk - 0.05) & (cc.t < tk + 0.05)
            i = np.argmax(env[w])
            assert abs(cc.t[w][i] - tk) < 3e-3
            assert env[w][i] == pytest.approx(amp, rel=0.15)
        # processing gain: the compressed peak dominates the sidelobe
        # floor away from both arrivals by >= an order of magnitude
        far = (cc.t < 0.95) | ((cc.t > 1.08) & (cc.t < 1.42)) | (cc.t > 1.58)
        assert env[far].max() < 0.1 * env.max()
