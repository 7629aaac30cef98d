"""Kernel-level invariants: wavelet perfect reconstruction, stat formula
spot-checks against straightforward (independent) implementations."""

import numpy as np
import pytest

from ecg_feature_engineering_ray.functions import entropy, spectral, stats, wavelet


@pytest.mark.parametrize("order", [6, 7])
@pytest.mark.parametrize("n", [64, 257, 1700])
def test_wavelet_roundtrip(order, n):
    rng = np.random.default_rng(n)
    x = rng.normal(size=n)
    coeffs = wavelet.wavedec(x, order, 5)
    rec = wavelet.waverec(coeffs, order, out_len=n)
    m = n - (n % 2)  # odd tails are sample-extended before transform
    assert np.allclose(rec[:m], x[:m], atol=1e-9)


def test_wavelet_stat_short_series_is_zero():
    assert np.all(wavelet.wavelet_stat(np.ones(100)) == 0.0)
    assert len(wavelet.wavelet_stat_names()) == 48


def test_denoise_removes_trend_and_keeps_length():
    rng = np.random.default_rng(0)
    n = 4096
    x = np.linspace(0, 10, n) + np.sin(np.linspace(0, 60 * np.pi, n))
    out = wavelet.wt_denoise(x)
    assert out.shape == x.shape
    # baseline (approximation band) removed → mean near zero vs original mean 5
    assert abs(out.mean()) < 0.5


def test_zero_crossings_simple():
    assert stats.zero_crossings(np.array([1.0, -1.0, 1.0, -1.0])) == 3
    assert stats.zero_crossings(np.array([1.0, 2.0, 3.0])) == 0
    assert stats.zero_crossings(np.array([1.0, 0.0, -1.0])) == 1


def test_zigzag_simple():
    assert stats.zigzag(np.array([0.0, 1.0, 0.0, 1.0, 0.0])) == 3
    assert stats.zigzag(np.arange(5.0)) == 0


def test_skew_kurtosis_match_moment_formulas():
    rng = np.random.default_rng(1)
    x = rng.normal(2.0, 3.0, 500)
    m = x - x.mean()
    skew_ref = np.mean(m**3) / np.mean(m**2) ** 1.5
    kurt_ref = np.mean(m**4) / np.mean(m**2) ** 2 - 3
    assert np.isclose(stats.skewness(x), skew_ref)
    assert np.isclose(stats.kurtosis(x), kurt_ref)


def test_rmssd_pnn():
    d = np.array([10.0, -20.0, 30.0, -40.0])
    assert np.isclose(stats.rmssd(d), np.sqrt(np.mean(d**2)))
    assert np.isclose(stats.pnn_fraction(d, 25.0), 0.5)


def test_rolling_median3():
    x = np.array([5.0, 1.0, 4.0, 2.0, 9.0])
    out = stats.rolling_median3(x)
    assert out[0] == 5.0 and out[-1] == 9.0
    assert np.allclose(out[1:-1], [4.0, 2.0, 4.0])


def test_bin_stat_first_match_semantics():
    # value 250 → |250-240|=10 ≥ 8 → bin '8' (first offset, descending, that it exceeds)
    x = np.array([250.0])
    out = stats.bin_stat(x)
    names = stats.bin_stat_names()
    assert out[names.index("bin_a_cnt_8")] == 1
    assert out[names.index("bin_a_cnt_4")] == 0


def test_periodogram_parseval():
    rng = np.random.default_rng(2)
    x = rng.normal(size=512)
    freqs, pxx = spectral.periodogram(x, fs=300.0)
    # one-sided PSD integrates (× fs/n) to signal power
    assert np.isclose(pxx.sum() * 300.0 / 512, np.mean(x**2), rtol=1e-6)


def test_band_power_partitions_total():
    rng = np.random.default_rng(3)
    x = rng.normal(size=600)
    bp = spectral.band_power(x, fs=300.0, bands=(0.0, 5.0, 150.1))
    _, pxx = spectral.periodogram(x, fs=300.0)
    assert np.isclose(bp.sum(), pxx.sum(), rtol=1e-9)


def test_sampen_known_behaviour():
    # constant series: every template matches → sampen ≈ 0 (finite-n correction)
    out = entropy.sampen_hrv(np.ones(50))
    assert (out >= 0).all() and (out < 0.1).all()
    # random series has positive entropy
    rng = np.random.default_rng(4)
    out = entropy.sampen_hrv(rng.normal(800, 50, 150))
    assert (out > 0).all() or (out == -1).any()


def test_autocorr_lag0_is_one():
    rng = np.random.default_rng(5)
    x = rng.normal(size=200)
    ac = stats.autocorr(x, 3)
    assert np.isclose(ac[0], 1.0)
