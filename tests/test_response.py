"""Impulse-response synthesis tests.

The synthesis layer is pure host-side post-processing, so the unit tests
pin it exactly against hand-built wave packets: a zero-phase arrival IS
the Gaussian-cosine wavelet scaled and delayed; a surface bounce
(phase pi) inverts it; a caustic (phase -pi/2) rotates the carrier by a
quarter cycle (the Hilbert-transformed packet); superposition is linear.
The end-to-end test runs the real pipeline (fan -> eigenrays ->
amplitudes -> waveform) on an isovelocity slab, where the direct path's
arrival time and spreading amplitude are known in closed form.
"""

import numpy as np
import pytest

import pygenray_tpu as pt
from pygenray_tpu.amplitudes import Arrivals
from pygenray_tpu.envdata import make_env_data
from pygenray_tpu.response import synthesize_response


def one_arrival(amplitude=0.5, t=1.0, phase=0.0, alive=True):
    """Minimal single-arrival Arrivals for synthesis unit tests."""
    f = lambda v: np.asarray([v], float)
    return Arrivals(
        theta0=f(0.0),
        amplitude=f(amplitude),
        tl_db=f(-20 * np.log10(amplitude)),
        phase=f(phase),
        kmah=np.asarray([0]),
        travel_time=f(t),
        z_r=f(-500.0),
        theta_r=f(0.0),
        n_surf=np.asarray([0]),
        n_bott=np.asarray([0]),
        alive=np.asarray([alive]),
        death_code=np.asarray([0 if alive else 2]),
    )


def cat(a, b):
    """Concatenate two Arrivals field-wise."""
    import dataclasses

    return Arrivals(**{
        k: np.concatenate([getattr(a, k), getattr(b, k)])
        for k in (fld.name for fld in dataclasses.fields(Arrivals))
        if getattr(a, k) is not None and getattr(b, k) is not None
    })


FC, BW = 100.0, 40.0
SIGMA = np.sqrt(2 * np.log(2)) / (np.pi * BW)


def expected_packet(t, t0, amp, phase):
    tau = t - t0
    return amp * np.exp(-0.5 * (tau / SIGMA) ** 2) * np.cos(
        2 * np.pi * FC * tau + phase
    )


class TestSynthesis:
    def test_single_arrival_is_the_wavelet(self):
        r = synthesize_response(one_arrival(0.5, 1.0), FC, bandwidth=BW)
        np.testing.assert_allclose(
            r.waveform, expected_packet(r.t, 1.0, 0.5, 0.0), atol=1e-12
        )
        # envelope peaks at the travel time, at the arrival amplitude
        i = np.argmax(r.envelope())
        assert abs(r.t[i] - 1.0) <= 1.0 / (8 * FC)
        # the grid need not sample the exact peak; 1/(2 fs) off costs ~3e-6
        np.testing.assert_allclose(r.envelope()[i], 0.5, rtol=1e-5)

    def test_time_grid_covers_the_packet(self):
        r = synthesize_response(one_arrival(1.0, 2.0), FC, bandwidth=BW)
        assert r.t[0] <= 2.0 - 3 * SIGMA and r.t[-1] >= 2.0 + 3 * SIGMA
        # edge values are negligible (packet fully inside the window)
        assert abs(r.waveform[0]) < 1e-3 and abs(r.waveform[-1]) < 1e-3

    def test_surface_phase_inverts_the_packet(self):
        t = np.linspace(0.8, 1.2, 2001)
        r0 = synthesize_response(one_arrival(phase=0.0), FC, bandwidth=BW, t=t)
        rp = synthesize_response(one_arrival(phase=np.pi), FC, bandwidth=BW, t=t)
        np.testing.assert_allclose(rp.waveform, -r0.waveform, atol=1e-12)

    def test_kmah_rotates_the_carrier_a_quarter_cycle(self):
        t = np.linspace(0.8, 1.2, 2001)
        r = synthesize_response(
            one_arrival(1.0, 1.0, phase=-np.pi / 2), FC, bandwidth=BW, t=t
        )
        # cos(x - pi/2) = sin(x): the Hilbert-rotated packet
        tau = t - 1.0
        want = np.exp(-0.5 * (tau / SIGMA) ** 2) * np.sin(2 * np.pi * FC * tau)
        np.testing.assert_allclose(r.waveform, want, atol=1e-12)
        # same envelope as the unrotated packet
        r0 = synthesize_response(one_arrival(1.0, 1.0), FC, bandwidth=BW, t=t)
        np.testing.assert_allclose(r.envelope(), r0.envelope(), atol=1e-12)

    def test_superposition_is_linear(self):
        a = one_arrival(0.5, 1.0, 0.0)
        b = one_arrival(0.25, 1.05, np.pi)
        t = np.linspace(0.8, 1.3, 4001)
        rab = synthesize_response(cat(a, b), FC, bandwidth=BW, t=t)
        ra = synthesize_response(a, FC, bandwidth=BW, t=t)
        rb = synthesize_response(b, FC, bandwidth=BW, t=t)
        np.testing.assert_allclose(
            rab.waveform, ra.waveform + rb.waveform, atol=1e-12
        )

    def test_dead_arrivals_are_skipped_and_all_dead_raises(self):
        a = one_arrival(0.5, 1.0)
        d = one_arrival(2.0, 1.1, alive=False)
        d = Arrivals(**{
            **{f: getattr(d, f) for f in (
                "theta0", "tl_db", "phase", "kmah", "travel_time", "z_r",
                "theta_r", "n_surf", "n_bott", "alive", "death_code")},
            "amplitude": np.asarray([np.nan]),
        })
        t = np.linspace(0.8, 1.3, 1001)
        r = synthesize_response(cat(a, d), FC, bandwidth=BW, t=t)
        ra = synthesize_response(a, FC, bandwidth=BW, t=t)
        np.testing.assert_allclose(r.waveform, ra.waveform, atol=1e-12)
        with pytest.raises(ValueError, match="no alive arrivals"):
            synthesize_response(d, FC, bandwidth=BW, t=t)

    def test_chunked_sum_matches_direct(self):
        # many arrivals force the chunk loop; compare against one shot
        rng = np.random.RandomState(0)
        n = 257
        arr = Arrivals(**{
            "theta0": np.zeros(n),
            "amplitude": rng.uniform(0.1, 1.0, n),
            "tl_db": np.zeros(n),
            "phase": rng.uniform(-np.pi, np.pi, n),
            "kmah": np.zeros(n, int),
            "travel_time": rng.uniform(1.0, 1.2, n),
            "z_r": np.zeros(n),
            "theta_r": np.zeros(n),
            "n_surf": np.zeros(n, int),
            "n_bott": np.zeros(n, int),
            "alive": np.ones(n, bool),
            "death_code": np.zeros(n, int),
        })
        t = np.linspace(0.9, 1.3, 50000)  # big grid -> small chunks
        r = synthesize_response(arr, FC, bandwidth=BW, t=t)
        tau = t[None, :] - arr.travel_time[:, None]
        direct = (
            arr.amplitude[:, None]
            * np.exp(-0.5 * (tau / SIGMA) ** 2)
            * np.cos(2 * np.pi * FC * tau + arr.phase[:, None])
        ).sum(axis=0)
        np.testing.assert_allclose(r.waveform, direct, atol=1e-9)


class TestEndToEnd:
    def test_isovelocity_direct_path(self):
        """Direct arrival on a 1500 m/s slab: t = s/c, peak amp = 1/s."""
        c0, depth, rng_km = 1500.0, 2000.0, 5e3
        z = np.linspace(0.0, depth, 64)
        r = np.linspace(0.0, 10e3, 8)
        c = np.full((r.size, z.size), c0)
        env = make_env_data(c, r, z, np.full(r.size, depth), r,
                            dtype=np.float64)
        resp = pt.impulse_response(
            1000.0, 0.0, 1000.0, rng_km, env, center_frequency=50.0,
            bandwidth=25.0, num_rays=33, max_angle=8.0, num_save=200,
            dx=25.0, flatearth=False,
        )
        t_direct = rng_km / c0
        env_peaks = resp.envelope()
        i = np.argmax(env_peaks)
        assert abs(resp.t[i] - t_direct) < 2e-3
        np.testing.assert_allclose(env_peaks[i], 1.0 / rng_km, rtol=0.05)
        # the arrivals the waveform was built from are in the container
        assert resp.arrivals.alive.any()
        assert np.isfinite(resp.waveform).all()

    def test_no_eigenrays_raises(self):
        c0, depth = 1500.0, 2000.0
        z = np.linspace(0.0, depth, 64)
        r = np.linspace(0.0, 10e3, 8)
        c = np.full((r.size, z.size), c0)
        env = make_env_data(c, r, z, np.full(r.size, depth), r,
                            dtype=np.float64)
        with pytest.raises(ValueError, match="no eigenrays"):
            # a 2-ray steep fan cannot bracket the shallow receiver
            pt.impulse_response(
                1000.0, 0.0, 10.0, 5e3, env, center_frequency=50.0,
                launch_angles=np.asarray([7.9, 8.0]), num_save=100,
                dx=50.0, flatearth=False,
            )


class TestIO:
    def test_arrivals_npz_round_trip(self, tmp_path):
        import dataclasses

        a = cat(one_arrival(0.5, 1.0, 0.0), one_arrival(0.25, 1.1, np.pi))
        p = tmp_path / "arr.npz"
        a.save_npz(p)
        b = Arrivals.load_npz(p)
        for f in dataclasses.fields(Arrivals):
            np.testing.assert_array_equal(getattr(a, f.name),
                                          getattr(b, f.name))

    def test_response_npz_round_trip(self, tmp_path):
        a = cat(one_arrival(0.5, 1.0, 0.0), one_arrival(0.25, 1.1, np.pi))
        r = synthesize_response(a, FC, bandwidth=BW)
        p = tmp_path / "resp.npz"
        r.save_npz(p)
        q = type(r).load_npz(p)
        np.testing.assert_array_equal(r.t, q.t)
        np.testing.assert_array_equal(r.waveform, q.waveform)
        np.testing.assert_array_equal(r.analytic, q.analytic)
        assert q.center_frequency == FC and q.bandwidth == BW
        np.testing.assert_array_equal(r.arrivals.travel_time,
                                      q.arrivals.travel_time)


class TestArrivalsSlicing:
    def test_getitem_index_types(self):
        a = cat(one_arrival(0.5, 1.0, 0.0), one_arrival(0.25, 1.1, np.pi))
        one = a[0]
        assert len(one) == 1 and one.amplitude[0] == 0.5
        sl = a[0:2]
        assert len(sl) == 2
        mask = a[np.asarray([False, True])]
        assert len(mask) == 1 and mask.amplitude[0] == 0.25
        np.testing.assert_array_equal(a[[1, 0]].travel_time,
                                      np.asarray([1.1, 1.0]))


class TestArrayResponse:
    def _env(self):
        c0, depth = 1500.0, 2000.0
        z = np.linspace(0.0, depth, 64)
        r = np.linspace(0.0, 10e3, 8)
        c = np.full((r.size, z.size), c0)
        return make_env_data(c, r, z, np.full(r.size, depth), r,
                             dtype=np.float64), c0

    def test_isovelocity_array(self):
        """3 receivers on one grid; the unreachable deep element gets a
        zero row while the reachable ones peak at their direct slant
        times with 1/s amplitudes."""
        env, c0 = self._env()
        rng_km = 5e3
        zd = np.asarray([900.0, 1100.0, 1950.0])  # 1950 m: outside ±8° fan
        ar = pt.array_response(
            1000.0, 0.0, zd, rng_km, env, center_frequency=50.0,
            bandwidth=25.0, num_rays=33, max_angle=8.0, num_save=200,
            dx=25.0, flatearth=False,
        )
        assert ar.waveform.shape == (3, ar.t.size)
        # shared grid: every per-depth Response rides the same axis
        for resp in ar.responses:
            np.testing.assert_array_equal(resp.t, ar.t)
        for d, z_r in enumerate(zd[:2]):
            s = np.hypot(rng_km, z_r - 1000.0)
            i = np.argmax(np.abs(ar.responses[d].envelope()))
            assert abs(ar.t[i] - s / c0) < 2e-3
            np.testing.assert_allclose(
                np.abs(ar.responses[d].envelope())[i], 1.0 / s, rtol=0.05
            )
        # unreachable element: zero row, empty arrivals
        assert not ar.waveform[2].any()
        assert len(ar.responses[2].arrivals) == 0

    def test_no_eigenrays_anywhere_raises(self):
        env, _ = self._env()
        with pytest.raises(ValueError, match="no eigenrays at any depth"):
            pt.array_response(
                1000.0, 0.0, np.asarray([10.0]), 5e3, env,
                center_frequency=50.0,
                launch_angles=np.asarray([7.9, 8.0]), num_save=100,
                dx=50.0, flatearth=False,
            )

    def test_record_section_plot(self, tmp_path):
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt

        env, _ = self._env()
        ar = pt.array_response(
            1000.0, 0.0, np.asarray([900.0, 1100.0]), 5e3, env,
            center_frequency=50.0, bandwidth=25.0, num_rays=17,
            max_angle=8.0, num_save=100, dx=50.0, flatearth=False,
        )
        ax = ar.plot()
        ax.figure.savefig(tmp_path / "record_section.png")
        plt.close("all")


class TestAttenuation:
    def _arr(self, L):
        import dataclasses

        a = one_arrival(0.5, 1.0)
        return dataclasses.replace(a, path_length=np.asarray([L], float))

    def test_thorp_formula_pin(self):
        # canonical values: ~0.069 dB/km at 1 kHz, ~0.003 dB/km floor
        assert abs(pt.thorp_attenuation(1000.0) - 0.0690) < 2e-3
        assert pt.thorp_attenuation(1.0) == pytest.approx(0.003, rel=1e-2)
        # 75 Hz over 100 km: a fraction of a dB
        assert 0.1 < pt.thorp_attenuation(75.0) * 100.0 < 1.0

    def test_float_and_callable_attenuation_scale_the_packet(self):
        t = np.linspace(0.8, 1.2, 1001)
        a = self._arr(100e3)  # 100 km
        r0 = synthesize_response(a, FC, bandwidth=BW, t=t)
        r1 = synthesize_response(a, FC, bandwidth=BW, t=t, attenuation=1.0)
        np.testing.assert_allclose(r1.waveform, 1e-5 * r0.waveform,
                                   atol=1e-18)
        r2 = synthesize_response(a, FC, bandwidth=BW, t=t,
                                 attenuation=lambda f: 0.2)
        np.testing.assert_allclose(r2.waveform, 1e-1 * r0.waveform,
                                   atol=1e-14)
        # "thorp" resolves through the formula at fc
        r3 = synthesize_response(a, FC, bandwidth=BW, t=t,
                                 attenuation="thorp")
        scale = 10 ** (-pt.thorp_attenuation(FC) * 100.0 / 20.0)
        np.testing.assert_allclose(r3.waveform, scale * r0.waveform,
                                   atol=1e-14)

    def test_missing_path_length_raises(self):
        t = np.linspace(0.8, 1.2, 101)
        with pytest.raises(ValueError, match="path_length"):
            synthesize_response(one_arrival(), FC, bandwidth=BW, t=t,
                                attenuation="thorp")

    def test_path_length_is_the_slant_distance(self):
        """Isovelocity straight rays: arc length == R / cos(theta0)."""
        c0, depth = 1500.0, 20000.0
        z = np.linspace(0.0, depth, 64)
        r = np.linspace(0.0, 300e3, 8)
        c = np.full((r.size, z.size), c0)
        env = make_env_data(c, r, z, np.full(r.size, depth), r,
                            dtype=np.float64)
        th = np.asarray([0.0, 5.0, 12.0])
        arr = pt.arrival_amplitudes(10000.0, 0.0, th, 100e3, env,
                                    num_save=512, flatearth=False)
        want = 100e3 / np.cos(np.radians(th))
        np.testing.assert_allclose(arr.path_length, want, rtol=1e-4)


class TestReceivedWaveform:
    """Arbitrary-source reception: the FFT path must reproduce the
    analytic-packet path exactly when fed the same Gaussian wavelet, and
    matched filtering must compress a chirp back to the arrival pattern."""

    FC2, BW2 = 100.0, 25.0  # fc*sigma ~ 1.5: negative-freq leakage ~1e-19
    SIG2 = np.sqrt(2 * np.log(2)) / (np.pi * BW2)

    def _packet_source(self, fs):
        """Causal Gaussian-cosine wavelet peaking at t_p; returns (s, t_p)."""
        t_p = 8.0 * self.SIG2
        ts = np.arange(int(round(2 * t_p * fs)) + 1) / fs
        tau = ts - t_p
        s = np.exp(-0.5 * (tau / self.SIG2) ** 2) * np.cos(
            2 * np.pi * self.FC2 * tau
        )
        return s, t_p

    def _grid(self, fs, lo, hi):
        n = int(np.ceil((hi - lo) * fs)) + 1
        return lo + np.arange(n) / fs

    def _shift(self, a, dt):
        import dataclasses

        return dataclasses.replace(
            a, travel_time=np.asarray(a.travel_time, float) + dt
        )

    @pytest.mark.parametrize("phase", [0.0, np.pi, -np.pi / 2])
    def test_packet_source_matches_synthesize(self, phase):
        fs = 8.0 * self.FC2
        s, t_p = self._packet_source(fs)
        a = one_arrival(0.5, 1.0, phase)
        t = self._grid(fs, 0.8, 1.4)
        rw = pt.received_waveform(a, s, fs, t=t)
        sr = synthesize_response(self._shift(a, t_p), self.FC2,
                                 bandwidth=self.BW2, t=t)
        np.testing.assert_allclose(rw.waveform, sr.waveform, atol=1e-9)
        np.testing.assert_allclose(np.abs(rw.analytic), np.abs(sr.analytic),
                                   atol=1e-9)

    def test_two_arrivals_superpose(self):
        fs = 8.0 * self.FC2
        s, t_p = self._packet_source(fs)
        ab = cat(one_arrival(0.5, 1.0, 0.0), one_arrival(0.25, 1.13, np.pi))
        t = self._grid(fs, 0.8, 1.5)
        rw = pt.received_waveform(ab, s, fs, t=t)
        sr = synthesize_response(self._shift(ab, t_p), self.FC2,
                                 bandwidth=self.BW2, t=t)
        np.testing.assert_allclose(rw.waveform, sr.waveform, atol=1e-9)

    def test_constant_broadband_attenuation_matches_narrowband(self):
        import dataclasses

        fs = 8.0 * self.FC2
        s, t_p = self._packet_source(fs)
        a = dataclasses.replace(one_arrival(0.5, 1.0),
                                path_length=np.asarray([80e3]))
        t = self._grid(fs, 0.8, 1.4)
        rw = pt.received_waveform(a, s, fs, t=t, attenuation=0.7)
        sr = synthesize_response(self._shift(a, t_p), self.FC2,
                                 bandwidth=self.BW2, t=t, attenuation=0.7)
        np.testing.assert_allclose(rw.waveform, sr.waveform, atol=1e-9)
        # and it actually attenuated: 0.7 dB/km * 80 km = 56 dB
        r0 = pt.received_waveform(a, s, fs, t=t)
        assert np.abs(rw.waveform).max() == pytest.approx(
            10 ** (-56.0 / 20.0) * np.abs(r0.waveform).max(), rel=1e-6
        )

    def test_default_grid_covers_source_duration(self):
        fs = 8.0 * self.FC2
        s, _ = self._packet_source(fs)
        r = pt.received_waveform(one_arrival(1.0, 2.0), s, fs)
        assert r.t[0] <= 2.0 and r.t[-1] >= 2.0 + s.size / fs
        assert abs(r.waveform[0]) < 1e-6 and abs(r.waveform[-1]) < 1e-6

    def test_nonuniform_grid_raises(self):
        fs = 8.0 * self.FC2
        s, _ = self._packet_source(fs)
        with pytest.raises(ValueError, match="uniform"):
            pt.received_waveform(one_arrival(), s, fs,
                                 t=np.linspace(0.9, 1.1, 777))

    def test_chirp_matched_filter_recovers_arrival_pattern(self):
        """LFM chirp through a 2-arrival channel: pulse compression puts
        envelope peaks at the travel times with the arrival amplitudes."""
        fs = 800.0
        dur, f0, f1 = 0.5, 50.0, 150.0
        ts = np.arange(int(dur * fs)) / fs
        chirp = np.sin(2 * np.pi * (f0 * ts + 0.5 * (f1 - f0) / dur * ts**2))
        ab = cat(one_arrival(0.5, 1.0, 0.0), one_arrival(0.25, 1.12, np.pi))
        rw = pt.received_waveform(ab, chirp, fs)
        # raw reception: overlapping chirps, no visible arrival structure
        c = rw.correlate(chirp, fs)
        env = c.envelope()
        # two separated peaks at the travel times with the right heights
        for tk, amp in [(1.0, 0.5), (1.12, 0.25)]:
            w = (c.t > tk - 0.02) & (c.t < tk + 0.02)
            i = np.argmax(env[w])
            assert abs(c.t[w][i] - tk) < 2e-3
            assert env[w][i] == pytest.approx(amp, rel=0.1)
        # peaks dominate away from the arrivals: an unwindowed LFM has
        # -13 dB (~0.22) sinc time-sidelobes, decaying with lag
        far = (c.t < 0.97) | ((c.t > 1.03) & (c.t < 1.09)) | (c.t > 1.15)
        assert env[far].max() < 0.2 * env.max()

    def test_correlate_rejects_wrong_fs(self):
        fs = 8.0 * self.FC2
        s, _ = self._packet_source(fs)
        r = pt.received_waveform(one_arrival(), s, fs)
        with pytest.raises(ValueError, match="sample rate"):
            r.correlate(s, fs * 2)


class TestArrayResponseIO:
    def test_npz_round_trip(self, tmp_path):
        import dataclasses

        from pygenray_tpu.response import ArrayResponse, Response

        t = np.linspace(0.9, 1.3, 801)
        resps, rows = [], []
        for k, (amp, tk) in enumerate([(0.5, 1.0), (0.25, 1.1)]):
            r = synthesize_response(one_arrival(amp, tk), FC, bandwidth=BW,
                                    t=t)
            resps.append(r)
            rows.append(r.waveform)
        ar = ArrayResponse(receiver_depths=np.asarray([100.0, 200.0]), t=t,
                           waveform=np.stack(rows), responses=resps)
        p = tmp_path / "ar.npz"
        ar.save_npz(p)
        ar2 = ArrayResponse.load_npz(p)
        np.testing.assert_array_equal(ar2.receiver_depths,
                                      ar.receiver_depths)
        np.testing.assert_array_equal(ar2.t, ar.t)
        np.testing.assert_array_equal(ar2.waveform, ar.waveform)
        assert len(ar2.responses) == 2
        for r0, r1 in zip(ar.responses, ar2.responses):
            np.testing.assert_array_equal(r1.analytic, r0.analytic)
            assert r1.center_frequency == r0.center_frequency
            for f in dataclasses.fields(Arrivals):
                v0 = getattr(r0.arrivals, f.name)
                v1 = getattr(r1.arrivals, f.name)
                if v0 is None:
                    assert v1 is None
                else:
                    np.testing.assert_array_equal(v1, v0)


class TestBottomLoss:
    def _arr3(self, a=None):
        import dataclasses

        return dataclasses.replace(a or one_arrival(0.5, 1.0),
                                   n_bott=np.asarray([3]))

    def test_scales_by_bounce_count(self):
        t = np.linspace(0.8, 1.2, 1001)
        a3 = self._arr3()
        r0 = synthesize_response(a3, FC, bandwidth=BW, t=t)
        r1 = synthesize_response(a3, FC, bandwidth=BW, t=t,
                                 bottom_loss_db=2.0)
        np.testing.assert_allclose(r1.waveform,
                                   10 ** (-6.0 / 20.0) * r0.waveform,
                                   atol=1e-14)
        # zero bounces: no effect
        a0 = one_arrival(0.5, 1.0)
        r2 = synthesize_response(a0, FC, bandwidth=BW, t=t,
                                 bottom_loss_db=2.0)
        rr = synthesize_response(a0, FC, bandwidth=BW, t=t)
        np.testing.assert_array_equal(r2.waveform, rr.waveform)

    def test_received_waveform_applies_the_same_loss(self):
        fs = 800.0
        ts = np.arange(400) / fs
        src = np.sin(2 * np.pi * 100.0 * ts) * np.hanning(ts.size)
        a3 = self._arr3()
        t = 0.9 + np.arange(int(0.8 * fs)) / fs
        r0 = pt.received_waveform(a3, src, fs, t=t)
        r1 = pt.received_waveform(a3, src, fs, t=t, bottom_loss_db=2.0)
        np.testing.assert_allclose(r1.waveform,
                                   10 ** (-6.0 / 20.0) * r0.waveform,
                                   atol=1e-15)

    def test_composes_with_attenuation(self):
        import dataclasses

        t = np.linspace(0.8, 1.2, 1001)
        a = dataclasses.replace(self._arr3(),
                                path_length=np.asarray([50e3]))
        r0 = synthesize_response(a, FC, bandwidth=BW, t=t)
        r1 = synthesize_response(a, FC, bandwidth=BW, t=t,
                                 attenuation=0.1, bottom_loss_db=1.0)
        # 0.1 dB/km * 50 km + 1 dB * 3 bounces = 8 dB
        np.testing.assert_allclose(r1.waveform,
                                   10 ** (-8.0 / 20.0) * r0.waveform,
                                   atol=1e-14)


def test_arrivals_save_mat_round_trip(tmp_path):
    from scipy import io

    a = cat(one_arrival(0.5, 1.0, 0.0), one_arrival(0.25, 1.1, np.pi))
    p = tmp_path / "arr.mat"
    a.save_mat(p)
    m = io.loadmat(p, simplify_cells=True)["arrivals"]
    np.testing.assert_allclose(m["amplitude"], a.amplitude)
    np.testing.assert_allclose(m["travel_time"], a.travel_time)
    np.testing.assert_allclose(m["phase"], a.phase)
    np.testing.assert_array_equal(m["n_bott"], a.n_bott)
