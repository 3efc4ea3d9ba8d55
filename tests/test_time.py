"""Time-domain (Fourier) tests against analytic transform pairs.

System with F(ω) = 1/(a + iω)  <->  impulse response e^{-at} u(t),
switch-on response (1 - e^{-at})/a.
"""
import numpy as np
import pytest

from emg3d_tpu.time import (Fourier, design_dlf_filter, dlf_transform,
                            fftlog_transform)

A = 2.0


def F_omega(w):
    return 1.0 / (A + 1j * w)


class TestKernels:
    def test_dlf_sin(self):
        t = np.logspace(-2, 1.2, 20)
        g = dlf_transform(lambda w: w / (A**2 + w**2), t, kind='sin')
        exact = np.pi / 2 * np.exp(-A * t)
        assert np.max(np.abs(g - exact) / exact.max()) < 1e-7

    def test_dlf_cos(self):
        t = np.logspace(-2, 1.2, 20)
        g = dlf_transform(lambda w: 1 / (A**2 + w**2), t, kind='cos')
        exact = np.pi / (2 * A) * np.exp(-A * t)
        assert np.max(np.abs(g - exact) / exact.max()) < 1e-5

    def test_fftlog_sin(self):
        freq = np.logspace(-5, 4, 400) / (2 * np.pi)
        w = 2 * np.pi * freq
        t = np.logspace(-1.5, 1, 8)
        g = fftlog_transform(freq, w / (A**2 + w**2), t, kind='sin')
        exact = np.pi / 2 * np.exp(-A * t)
        assert np.max(np.abs(g - exact) / exact.max()) < 1e-3

    def test_filter_cache(self):
        b1, w1 = design_dlf_filter('sin')
        b2, w2 = design_dlf_filter('sin')
        assert b1 is b2 and w1 is w2


class TestFourier:
    time = np.logspace(-1.5, 0.8, 12)

    def _check(self, ft, signal, tol, **ftarg):
        ff = Fourier(self.time, fmin=1e-4, fmax=1e3, signal=signal,
                     ft=ft, ftarg=ftarg or None)
        fdata = F_omega(2 * np.pi * ff.freq_compute)
        resp = ff.freq2time(fdata)
        if signal == 0:
            exact = np.exp(-A * self.time)
        elif signal == 1:
            exact = (1 - np.exp(-A * self.time)) / A
        else:
            exact = np.exp(-A * self.time) / A
        err = np.max(np.abs(resp - exact) / np.abs(exact).max())
        assert err < tol, (ft, signal, err)

    def test_impulse_dlf(self):
        self._check('dlf', 0, 1e-4)

    def test_switch_on_dlf(self):
        self._check('dlf', 1, 1e-4)

    def test_switch_off_dlf(self):
        self._check('dlf', -1, 1e-3)

    def test_impulse_fftlog(self):
        # The Mellin/FFTLog path needs a wide band (truncation error of
        # the slowly-decaying 1/ω kernel tail dominates otherwise).
        self._check('fftlog', 0, 1e-2, pts_per_dec=30,
                    add_dec=[-4, 3])

    def test_freq_ranges(self):
        ff = Fourier(self.time, fmin=1e-2, fmax=10.0)
        assert ff.freq_req.size > 0
        assert np.all(ff.freq_compute >= 1e-2)
        assert np.all(ff.freq_compute <= 10.0)
        assert np.all(ff.freq_extrapolate < 1e-2)
        assert np.all(ff.freq_interpolate > 10.0)
        # Coarse subsampling.
        f2 = Fourier(self.time, 1e-2, 10.0, every_x_freq=3)
        assert f2.freq_coarse.size < ff.freq_coarse.size
        f3 = Fourier(self.time, 1e-2, 10.0,
                     freq_inp=np.logspace(-2, 1, 11))
        assert f3.freq_compute.size == 11
        with pytest.raises(ValueError, match='mutually exclusive'):
            Fourier(self.time, 1e-2, 10.0, every_x_freq=2,
                    freq_inp=np.ones(3))

    def test_band_limited_interpolation(self):
        """Limited band + interpolation still recovers the response."""
        ff = Fourier(self.time, fmin=5e-3, fmax=50.0, signal=0)
        fdata = F_omega(2 * np.pi * ff.freq_compute)
        resp = ff.freq2time(fdata)
        exact = np.exp(-A * self.time)
        err = np.max(np.abs(resp - exact) / np.abs(exact).max())
        # Band truncation (zero-fill above fmax) costs a few percent at
        # the earliest times; that is inherent, not a transform error.
        assert err < 5e-2
