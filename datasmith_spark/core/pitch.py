"""Autocorrelation pitch / voicing kernel: per-frame F0 lag + clip prosody
statistics.

The TTS-/speech-curation features the energy (core/vad.py) and spectrum
(core/spectral.py) kernels cannot express: whether a clip contains VOICED
periodic content at all, how much of it, and at what fundamental — the
signals that separate speech/singing from hum, hiss, and unpitched noise,
and that let a pipeline bucket clips by speaker register (F0 band) before
augmentation.

Method: the classic autocorrelation pitch detector (Rabiner 1977, "On the
use of autocorrelation analysis for pitch detection") — per frame, the
autocorrelation r(k) over the candidate lag range [PITCH_LAG_MIN,
PITCH_LAG_MAX] (80–400 Hz at 16 kHz); the frame is VOICED iff the peak
autocorrelation clears half the frame energy (NAC > 0.5, evaluated as the
cross-multiplied compare 2*r(k*) > r(0), never a division), and the frame's
pitch is the peak lag in SAMPLES (argmax, first-max-wins tie rule).

Determinism / host-portability contract (committed-fixture requirement):
  * autocorrelation via numpy rfft/irfft (pocketfft — the q37 log-mel
    precedent accepts it as portable),
  * reductions use numpy's fixed pairwise summation over pinned shapes
    (the log-mel convention),
  * NO libm transcendentals; voicing is a multiply-compare and every
    emitted metric is an integer (lags in samples, counts, integer-rounded
    Hz) — floats stay internal.

>>> import numpy as np
>>> t = np.arange(16000) / 16000.0
>>> x = 0.5 * np.sin(2 * np.pi * 125.0 * t)  # 125 Hz -> lag 128
>>> st = pitch_stats(x, 16000)
>>> st["n_voiced"] == st["n_frames"] and st["med_lag"] == 128
True
>>> st["f0_hz"]
125
>>> pitch_stats(np.random.default_rng(0).normal(size=16000) * 0.1, 16000)["n_voiced"]
0
>>> pitch_stats(np.zeros(100), 16000)["n_frames"]
0
"""

from __future__ import annotations

import numpy as np

from .resample import resample

PITCH_SR = 16000  # common analysis rate, like LM_SR / FP_SR
PITCH_NFFT = 512  # 32 ms frames
PITCH_HOP = 256
PITCH_LAG_MIN = 40  # 400 Hz at 16 kHz
PITCH_LAG_MAX = 200  # 80 Hz at 16 kHz
PITCH_MAX_S = 5.0  # analyze the first 5 s: bounds cost per row


def frame_lags16(x16: np.ndarray) -> np.ndarray:
    """(n_frames, 2) int32 array of [lag, voiced] per 512-sample frame of an
    LM-rate signal: lag = argmax of the FFT autocorrelation over
    [PITCH_LAG_MIN, PITCH_LAG_MAX] (first max wins), voiced = 1 iff
    2*r(lag) > r(0) > 0. Frames are full windows only (no padded tail)."""
    x = np.asarray(x16, dtype=np.float64)
    if x.size < PITCH_NFFT:
        return np.zeros((0, 2), dtype=np.int32)
    n_frames = 1 + (x.size - PITCH_NFFT) // PITCH_HOP
    idx = np.arange(PITCH_NFFT)[None, :] + PITCH_HOP * np.arange(n_frames)[:, None]
    frames = x[idx]
    # remove per-frame DC (a constant offset masquerades as lag-0 energy)
    frames = frames - (frames.sum(axis=1) / PITCH_NFFT)[:, None]
    spec = np.fft.rfft(frames, n=2 * PITCH_NFFT, axis=1)
    r = np.fft.irfft(spec.real * spec.real + spec.imag * spec.imag, axis=1)
    cand = r[:, PITCH_LAG_MIN : PITCH_LAG_MAX + 1]
    lag = (cand.argmax(axis=1) + PITCH_LAG_MIN).astype(np.int32)
    peak = cand[np.arange(n_frames), lag - PITCH_LAG_MIN]
    voiced = ((2.0 * peak > r[:, 0]) & (r[:, 0] > 0.0)).astype(np.int32)
    return np.stack([lag, voiced], axis=1)


def pitch_stats(pcm: np.ndarray, sr: int) -> dict:
    """Clip-level prosody statistics from the frame detector:
    n_frames, n_voiced, voiced_pct (integer floor percent), med_lag (the
    LOWER median of voiced lags in samples — integer by construction,
    0 when unvoiced), f0_hz (round-half-up 16000/med_lag, 0 when
    unvoiced). Resamples to PITCH_SR via the shared sinc kernel and
    analyzes at most the first PITCH_MAX_S seconds."""
    x = np.asarray(pcm, dtype=np.float64)[: int(round(PITCH_MAX_S * sr))]
    if sr != PITCH_SR:
        x = resample(x, sr, PITCH_SR)
    x = x[: int(PITCH_MAX_S * PITCH_SR)]
    fl = frame_lags16(x)
    n_frames = int(fl.shape[0])
    voiced_lags = np.sort(fl[fl[:, 1] == 1, 0])
    n_voiced = int(voiced_lags.size)
    if n_voiced:
        med_lag = int(voiced_lags[(n_voiced - 1) // 2])
        f0_hz = (2 * PITCH_SR + med_lag) // (2 * med_lag)
    else:
        med_lag = 0
        f0_hz = 0
    voiced_pct = (100 * n_voiced) // n_frames if n_frames else 0
    return {
        "n_frames": n_frames,
        "n_voiced": n_voiced,
        "voiced_pct": voiced_pct,
        "med_lag": med_lag,
        "f0_hz": f0_hz,
    }
