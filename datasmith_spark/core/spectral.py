"""Spectral audio-quality kernel: SNR estimation + effective-bandwidth.

Two decoded-PCM quality filters a training-data curation pipeline runs that
the time-domain VAD kernel (core/vad.py) cannot express:

  * **Spectral SNR estimate** — the corpus payload is tonal content over a
    noise floor; the filter separates "harmonic" bins (power above a
    multiple of the median bin power = the noise-floor estimate) from
    residual bins and compares the two energy sums. Clips whose estimated
    harmonic-to-noise ratio is below the floor are drop candidates (noisy
    recordings, line hum, near-silence that still passed VAD).
  * **Effective bandwidth** — the smallest frequency below which ~all
    (199/200) spectral energy lives. Narrowband content stored at a high
    nominal sample rate (the classic 8 kHz telephone recording upsampled to
    16 kHz) wastes training tokens and often marks low-quality transcodes;
    the filter flags clips whose effective bandwidth is ≤ Nyquist/4.

The reference's quality heuristics are transcript-only
(/root/reference/src/datasmith/scrape/filter_dashboards.py:113-121); these
extend the same keep/drop shape to the decoded PCM, like core/vad.py.

Determinism / host-portability contract (committed-fixture requirement,
same as core/vad.py):

  * The per-frame power spectrum uses numpy's rfft (pocketfft) — accepted
    as portable by the q37 log-mel precedent — and every cross-frame /
    cross-bin reduction is an explicitly pinned elementwise left fold,
    never np.sum/BLAS.
  * NO transcendental libm calls (no log10/pow): the SNR "dB-ish" figure is
    floor(log2(ratio)) computed exactly via math.frexp, and every keep
    predicate is a multiply-compare against an exact power-of-two or small
    integer constant. IEEE-754 +,*,/ and frexp are exactly specified, so
    the committed oracle fixture reproduces bit-for-bit across hosts.
  * All EMITTED metrics are integers/booleans; floats stay internal.
"""

from __future__ import annotations

import math

import numpy as np

# 512-sample analysis frames (no overlap, rectangular window: the estimate
# feeds threshold predicates, not resynthesis; leakage is identical on both
# sides of every compare). 257 one-sided bins at any sample rate.
N_FFT = 512
N_BINS = N_FFT // 2 + 1

# a bin is "harmonic" when its average power is >= 8x the median bin power
HARMONIC_X = 8
# keep when harmonic energy >= 2^SNR_KEEP_LOG2 * residual energy (~15 dB)
SNR_KEEP_LOG2 = 5
# effective bandwidth: smallest bin with 200*cum >= 199*total (99.5% energy)
BW_NUM, BW_DEN = 199, 200
# narrowband flag: effective bandwidth <= Nyquist/4
NARROW_DIV = 4


def avg_power_spectrum(pcm: np.ndarray, n_fft: int = N_FFT) -> np.ndarray | None:
    """Mean one-sided power spectrum over non-overlapping n_fft frames.

    Pinned-order: per-bin accumulation is a strict left fold over frames
    (one IEEE add per bin per frame); the final 1/n scale is a single exact-
    ish division applied uniformly. Returns None when the clip is shorter
    than one frame. The tail partial frame is dropped (standard framing).

    >>> sr = 8000
    >>> t = np.arange(sr) / sr
    >>> spec = avg_power_spectrum(np.sin(2 * np.pi * 1000.0 * t))
    >>> int(np.argmax(spec)) == round(1000.0 * 512 / sr)
    True
    >>> avg_power_spectrum(np.zeros(100)) is None
    True
    """
    n_frames = pcm.size // n_fft
    if n_frames == 0:
        return None
    frames = pcm[: n_frames * n_fft].reshape(n_frames, n_fft)
    spec = np.fft.rfft(frames, axis=1)
    p = spec.real * spec.real + spec.imag * spec.imag
    acc = np.zeros(n_fft // 2 + 1, dtype=np.float64)
    for j in range(n_frames):
        np.add(acc, p[j], out=acc)
    return acc / n_frames


def _pinned_sum(x: np.ndarray) -> float:
    """Strict left-fold sum (math.fsum-free, order-pinned, portable)."""
    acc = 0.0
    for v in x:
        acc = acc + float(v)
    return acc


def _floor_log2_ratio(num: float, den: float) -> int:
    """floor(log2(num/den)) for num,den > 0 with NO libm log.

    frexp gives the exact binary exponent; one exact multiply-compare
    settles the off-by-one. Portable across hosts by IEEE-754.

    >>> _floor_log2_ratio(8.0, 1.0)
    3
    >>> _floor_log2_ratio(7.999, 1.0)
    2
    >>> _floor_log2_ratio(1.0, 3.0)
    -2
    """
    # num/den in [2^k, 2^(k+1))  <=>  den*2^k <= num < den*2^(k+1)
    _, en = math.frexp(num)  # num = m * 2^en, m in [0.5, 1)
    _, ed = math.frexp(den)
    k = en - ed  # first guess; off by at most 1
    if num >= math.ldexp(den, k + 1):
        k += 1
    elif num < math.ldexp(den, k):
        k -= 1
    return k


def spectral_metrics(
    pcm: np.ndarray | None,
    harmonic_x: int = HARMONIC_X,
    snr_keep_log2: int = SNR_KEEP_LOG2,
) -> tuple[int, int, int | None, bool, int | None, bool]:
    """(n_bins, n_harmonic, snr_log2, snr_ok, bw_bin, narrowband).

    * n_bins       — one-sided spectrum size (0 when clip < one frame)
    * n_harmonic   — bins with power >= harmonic_x * median bin power
    * snr_log2     — floor(log2(harmonic energy / residual energy));
                     None when either side is zero (pure tone / silence)
    * snr_ok       — harmonic >= 2^snr_keep_log2 * residual (~15 dB), and
                     True when residual is exactly zero (noise-free)
    * bw_bin       — smallest bin index with BW_NUM/BW_DEN of total energy
                     at or below it (pinned cumulative, cross-multiplied);
                     None when total energy is zero
    * narrowband   — bw_bin <= (n_bins - 1) / NARROW_DIV (integer compare)

    >>> sr = 8000
    >>> t = np.arange(4 * sr) / sr
    >>> clean = np.sin(2 * np.pi * 500.0 * t)
    >>> nb, nh, s, ok, bw, narrow = spectral_metrics(clean)
    >>> (nb, ok, narrow)          # clean low tone: keep, but narrowband
    (257, True, True)
    >>> rng = np.random.default_rng(7)
    >>> noisy = 0.1 * clean + rng.standard_normal(t.size)
    >>> nb, nh, s, ok, bw, narrow = spectral_metrics(noisy)
    >>> (ok, narrow)              # buried tone: drop; noise is broadband
    (False, False)
    >>> spectral_metrics(None)
    (0, 0, None, False, None, False)
    """
    if pcm is None or pcm.size < N_FFT:
        return 0, 0, None, False, None, False
    spec = avg_power_spectrum(pcm)
    n_bins = int(spec.size)
    med = float(np.median(spec))  # exact: selection, no arithmetic
    harm_mask = spec >= harmonic_x * med
    n_harm = int(np.count_nonzero(harm_mask))
    harm = _pinned_sum(spec[harm_mask])
    resid = _pinned_sum(spec[~harm_mask])
    if harm > 0.0 and resid > 0.0:
        snr_log2: int | None = _floor_log2_ratio(harm, resid)
        snr_ok = harm >= math.ldexp(resid, snr_keep_log2)
    else:
        snr_log2 = None
        snr_ok = harm > 0.0  # all energy harmonic -> noise-free keep
    total = harm + resid if (harm > 0.0 or resid > 0.0) else 0.0
    if total > 0.0:
        cum = 0.0
        bw_bin: int | None = n_bins - 1
        for i in range(n_bins):
            cum = cum + float(spec[i])
            if BW_DEN * cum >= BW_NUM * total:
                bw_bin = i
                break
        narrowband = bw_bin * NARROW_DIV <= (n_bins - 1)
    else:
        bw_bin = None
        narrowband = False
    return n_bins, n_harm, snr_log2, snr_ok, bw_bin, narrowband


def bw_bin_to_hz(bw_bin: int | None, sr: int, n_fft: int = N_FFT) -> int | None:
    """Exact integer bin->Hz conversion (floor): bin * sr // n_fft.

    >>> bw_bin_to_hz(64, 16000)
    2000
    >>> bw_bin_to_hz(None, 16000) is None
    True
    """
    if bw_bin is None:
        return None
    return int(bw_bin) * int(sr) // int(n_fft)


def speaking_rate_keep(
    n_chars: int, active_ms: int | None, cps_min: int = 2, cps_max: int = 40
) -> bool:
    """Transcript-vs-audio speaking-rate sanity: keep when the implied
    characters-per-second over the VAD-active time is in [cps_min, cps_max].
    Integer cross-multiplied (1000 * n_chars vs cps * active_ms) — exactly
    re-derivable in SQL. No active audio (or empty transcript) -> False:
    a transcript with no voiced audio to carry it cannot be validated.

    >>> speaking_rate_keep(120, 10_000)   # 12 cps
    True
    >>> speaking_rate_keep(5, 10_000)     # 0.5 cps: transcript too thin
    False
    >>> speaking_rate_keep(900, 10_000)   # 90 cps: transcript impossible
    False
    >>> speaking_rate_keep(100, None)
    False
    >>> speaking_rate_keep(0, 10_000)
    False
    """
    if active_ms is None or active_ms <= 0 or n_chars <= 0:
        return False
    k = 1000 * n_chars
    return cps_min * active_ms <= k <= cps_max * active_ms


# --------------------------------------------------------------- alignment


def xcorr_lag(x: np.ndarray, y: np.ndarray, max_lag: int) -> tuple[int, float]:
    """Integer lag in [0, max_lag] maximizing sum_n x[n] * y[n + lag] —
    "how far ahead of x does y's copy of x start": with y[n] = g*x[n - d]
    (a delayed, gain-scaled re-record of x) the correlation peaks at
    lag = d.

    FFT-based linear cross-correlation (conj(FFT(x)) * FFT(y), zero-padded
    past len(x) + max_lag so the circular wrap cannot alias into the
    searched lag range) — O((L+max_lag) log) instead of the O(L * max_lag)
    direct scan; numpy's pocketfft is the same deterministic kernel the
    committed log-mel/spectral fixtures already rely on. Ties break to the
    LOWEST lag (np.argmax), so the estimate is deterministic on silent or
    constant inputs too. Returns (lag, peak_value).
    """
    if max_lag < 0:
        raise ValueError(f"max_lag must be >= 0: {max_lag}")
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    # tight alias-free bound: every c[l] term for l <= max_lag indexes
    # y[n+l] with n < len(x), so n+l < len(x) + max_lag rules out circular
    # wrap as long as nfft also covers y un-truncated — ~2x smaller FFTs
    # than the earlier len(x) + max(...) bound, same exact linear sums
    # (integer-stable argmax; the committed q156 fixture re-verifies every
    # estimate bit-for-bit)
    n = int(max(len(y), len(x) + max_lag))
    nfft = 1
    while nfft < n:
        nfft <<= 1
    spec = np.conj(np.fft.rfft(x, nfft)) * np.fft.rfft(y, nfft)
    c = np.fft.irfft(spec, nfft)[: max_lag + 1]
    lag = int(np.argmax(c))
    return lag, float(c[lag])
