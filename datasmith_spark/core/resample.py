"""Sample-rate conversion + log-mel spectrogram kernels (pure numpy).

Training-data audio prep the reference's text-only pipeline never needed but
a 100 TB speech-curation deployment does: normalize every clip to one sample
rate before model featurization, and emit compact log-mel features for
downstream filtering/training. Both kernels are deterministic, per-row-only
(no cross-row state, so results are invariant to Arrow batch boundaries —
SURVEY.md §7.4 risk 1), and chunked to bounded memory so a 120 s 48 kHz clip
never materializes an (n_out, taps) matrix bigger than a few MB.

Quality: windowed-sinc (Lanczos) interpolation, ~-60 dB stopband at a=8 —
a mid-band sine survives 16k->8k->16k round-trips at SNR well above the
pipeline's 30 dB gate. Linear interpolation is available as the cheap mode.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

# Output samples per block. Bounds the (chunk, taps) gather, and small enough
# (~3 MB of float64 temporaries at 46 taps) that the intermediates stay in the
# allocator's warm arena — this sandbox's kernel serializes page faults, so
# 24 MB-per-temporary blocks measured ~2x slower. Chunking cannot change
# results: each output sample depends only on its own position.
_CHUNK = 1 << 13


def resample(
    pcm: np.ndarray, sr_in: int, sr_out: int, mode: str = "sinc", taps: int = 8
) -> np.ndarray:
    """Resample float PCM from sr_in to sr_out.

    mode='sinc' uses Lanczos-windowed sinc interpolation with `taps` lobes
    per side (edge-padded); mode='linear' is 2-tap linear interpolation.
    Output length is round(n * sr_out / sr_in). Downsampling first applies
    the same kernel at the DOWN rate (cutoff scaled) to suppress aliasing.
    """
    x = np.asarray(pcm, dtype=np.float64)
    n = x.size
    if n == 0 or sr_in == sr_out:
        return x.copy()
    if sr_in <= 0 or sr_out <= 0:
        raise ValueError("sample rates must be positive")
    n_out = int(round(n * sr_out / sr_in))
    if n_out == 0:
        return np.zeros(0, dtype=np.float64)
    ratio = sr_in / sr_out  # input samples per output sample
    # anti-alias: when downsampling, widen the kernel by the ratio so its
    # cutoff lands at the OUTPUT Nyquist
    scale = max(ratio, 1.0)
    if mode == "linear":
        pos = np.arange(n_out, dtype=np.float64) * ratio
        i0 = np.minimum(pos.astype(np.int64), n - 1)
        i1 = np.minimum(i0 + 1, n - 1)
        frac = pos - i0
        return x[i0] * (1.0 - frac) + x[i1] * frac
    if mode != "sinc":
        raise ValueError(f"unknown mode: {mode}")
    half = int(np.ceil(taps * scale))
    pad = np.pad(x, (half, half), mode="edge")
    out = np.empty(n_out, dtype=np.float64)
    for start in range(0, n_out, _CHUNK):
        stop = min(start + _CHUNK, n_out)
        pos = np.arange(start, stop, dtype=np.float64) * ratio
        base = np.floor(pos).astype(np.int64)
        frac = pos - base
        # tap offsets -half+1 .. half relative to base
        offs = np.arange(-half + 1, half + 1, dtype=np.int64)
        # The sinc weights depend on frac only, and for integer rate pairs
        # frac cycles through <= sr_out/gcd distinct values (up to 1-ulp
        # rounding per index): evaluate the expensive sinc rows once per
        # UNIQUE frac and gather. Bit-identical to evaluating every row —
        # each output row still uses the weights of its exact frac value —
        # so committed digest fixtures are unaffected; ~100x fewer sinc
        # evaluations per chunk for the standard rates.
        uf, inv = np.unique(frac, return_inverse=True)
        t = (offs[None, :] - uf[:, None]) / scale  # (n_unique, taps) in lobes
        w = np.sinc(t) * np.sinc(t / taps)
        w[np.abs(t) >= taps] = 0.0
        w /= w.sum(axis=1, keepdims=True)
        # row gather via a strided sliding-window view instead of a 2-D
        # fancy index: pad[base+offs+half] row i is exactly the contiguous
        # slice pad[base[i]+1 : base[i]+1+2*half], so sw[base+1] copies
        # whole rows (measured ~1.5x) — same values, same multiply and
        # same left-to-right tap summation, so digests are unchanged.
        sw = np.lib.stride_tricks.sliding_window_view(pad, 2 * half)
        out[start:stop] = (sw[base + 1] * w[inv]).sum(axis=1)
    return out


# ------------------------------------------------------------------ log-mel

def _hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float = 0.0, fmax: float | None = None) -> np.ndarray:
    """(n_mels, n_fft//2+1) triangular HTK-mel filterbank."""
    fmax = sr / 2.0 if fmax is None else fmax
    mels = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz = _mel_to_hz(mels)
    bins = np.floor((n_fft + 1) * hz / sr).astype(np.int64)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for m in range(1, n_mels + 1):
        lo, ctr, hi = bins[m - 1], bins[m], bins[m + 1]
        if ctr == lo:
            ctr = lo + 1
        if hi == ctr:
            hi = ctr + 1
        fb[m - 1, lo:ctr] = (np.arange(lo, ctr) - lo) / (ctr - lo)
        fb[m - 1, ctr:hi] = (hi - np.arange(ctr, hi)) / (hi - ctr)
    return fb


@lru_cache(maxsize=64)
def _fb_and_supports(
    sr: int, n_fft: int, n_mels: int
) -> tuple[np.ndarray, list[tuple[int, int]]]:
    """mel_filterbank plus each filter's [lo, hi) nonzero support, cached per
    (sr, n_fft, n_mels) — rebuilding the bank per clip was ~15% of the q37
    digest scan. The cached array is only ever read (sliced), never written."""
    fb = mel_filterbank(sr, n_fft, n_mels)
    supports = []
    for m in range(n_mels):
        (nz,) = np.nonzero(fb[m])
        supports.append((int(nz[0]), int(nz[-1]) + 1) if nz.size else (0, 0))
    return fb, supports


def logmel(
    pcm: np.ndarray,
    sr: int,
    n_fft: int = 512,
    hop: int = 256,
    n_mels: int = 40,
) -> np.ndarray:
    """float PCM -> (n_frames, n_mels) float64 log-mel spectrogram.

    Hann-windowed rfft power spectra through an HTK-mel filterbank, log10
    with a 1e-10 floor (the engine-wide epsilon convention, core/rules.py).
    Frames are full windows only (no partial tail); a clip shorter than
    n_fft yields an empty (0, n_mels) array rather than a padded frame.

    The mel projection is computed per-bin over the filter's support with
    numpy's fixed pairwise summation rather than a BLAS matmul, so results
    are bit-identical across hosts/BLAS builds — the committed audio-ops
    oracle fixture depends on this (same portability rule as the
    fixed-order rms reduction in core/audio.py).
    """
    x = np.asarray(pcm, dtype=np.float64)
    if x.size < n_fft:
        return np.zeros((0, n_mels))
    n_frames = 1 + (x.size - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = x[idx] * np.hanning(n_fft)[None, :]
    power = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    fb, supports = _fb_and_supports(int(sr), n_fft, n_mels)
    mel = np.empty((n_frames, n_mels))
    for m in range(n_mels):
        lo, hi = supports[m]
        if hi == lo:
            mel[:, m] = 0.0
            continue
        mel[:, m] = (power[:, lo:hi] * fb[m, lo:hi][None, :]).sum(axis=1)
    return np.log10(mel + 1e-10)


def cmvn(feats: np.ndarray, var_floor: float = 1e-10) -> np.ndarray:
    """Per-utterance cepstral mean-variance normalization (Kaldi's
    per-utterance cmvn): each feature band is shifted to zero mean and
    scaled to unit variance ACROSS THE CLIP'S OWN FRAMES — the standard
    featurization step between log-mel and the acoustic model, and a pure
    per-row transform at the corpus level (no global pass).

    Portability: mean and the squared-deviation sum use numpy's pairwise
    summation over a fixed axis (deterministic for a given shape, the same
    convention as the mel projection above); variance gets the engine-wide
    1e-10 floor so constant bands normalize to exactly zero instead of
    dividing by zero.

    >>> f = np.array([[1.0, 5.0], [3.0, 5.0]])
    >>> out = cmvn(f)
    >>> np.allclose(out[:, 0], [-1.0, 1.0])  # zero mean, unit variance
    True
    >>> np.all(out[:, 1] == 0.0)  # constant band -> exactly zero
    True
    >>> cmvn(np.zeros((0, 3))).shape
    (0, 3)
    """
    x = np.asarray(feats, dtype=np.float64)
    if x.shape[0] == 0:
        return x.copy()
    mean = x.sum(axis=0) / x.shape[0]
    dev = x - mean[None, :]
    var = (dev * dev).sum(axis=0) / x.shape[0]
    return dev / np.sqrt(var + var_floor)[None, :]


@lru_cache(maxsize=16)
def _dct_basis(n_mfcc: int, n_mels: int) -> np.ndarray:
    """Orthonormal DCT-II basis rows (the HTK/Kaldi cepstral transform):
    basis[k, n] = s_k * cos(pi/n_mels * (n + 0.5) * k), s_0 = sqrt(1/n_mels),
    s_k = sqrt(2/n_mels). Cached per (n_mfcc, n_mels) and only ever read,
    like the mel filterbank cache above."""
    n = np.arange(n_mels, dtype=np.float64)
    basis = np.cos(np.pi / n_mels * (n + 0.5)[None, :] * np.arange(n_mfcc)[:, None])
    basis *= np.sqrt(2.0 / n_mels)
    basis[0] *= np.sqrt(0.5)
    return basis


def delta(feats: np.ndarray, window: int = 2) -> np.ndarray:
    """Regression delta features (HTK eq. 5.16 / Kaldi add-deltas): per
    frame t, sum_{d=1..window} d * (x[t+d] - x[t-d]) / (2 * sum d^2), with
    edge frames replicated — the standard derivative estimate an acoustic
    model stacks on static cepstra. A pure per-clip transform: at the
    corpus level this never leaves the Arrow batch.

    Portability: the numerator accumulates in fixed d order (window is 2,
    so two terms), no BLAS — same digest-fixture rule as logmel/cmvn.

    >>> delta(np.ones((5, 3))).max() == 0.0  # constant signal -> zero slope
    True
    >>> f = np.arange(6, dtype=float)[:, None] * np.ones((1, 2))
    >>> bool(np.allclose(delta(f)[2:-2], 1.0))  # unit ramp -> unit slope
    True
    >>> delta(np.zeros((0, 4))).shape
    (0, 4)
    """
    x = np.asarray(feats, dtype=np.float64)
    if x.shape[0] == 0:
        return x.copy()
    pad = np.pad(x, ((window, window), (0, 0)), mode="edge")
    num = np.zeros_like(x)
    for d in range(1, window + 1):
        num += d * (pad[window + d : window + d + x.shape[0]]
                    - pad[window - d : window - d + x.shape[0]])
    denom = 2.0 * sum(d * d for d in range(1, window + 1))
    return num / denom


def mfcc(
    pcm: np.ndarray,
    sr: int,
    n_fft: int = 512,
    hop: int = 256,
    n_mels: int = 40,
    n_mfcc: int = 13,
    deltas: bool = True,
) -> np.ndarray:
    """float PCM -> (n_frames, n_mfcc * 3 if deltas else n_mfcc) float64
    MFCC front-end: log-mel (the logmel kernel above, shared floor/window
    conventions) -> orthonormal DCT-II cepstra -> regression delta and
    delta-delta stacked column-wise — the classic ASR feature pipeline
    (Davis & Mermelstein 1980; HTK book ch. 5). Completes the featurization
    chain q37 (log-mel) -> q56 (CMVN) -> q57 (SpecAugment) with the
    cepstral lane the reference-class curation pipelines feed to AM
    scoring.

    Portability: the DCT projection is computed per coefficient over the
    full mel row with numpy's fixed pairwise summation (no BLAS matmul),
    the same bit-reproducibility contract as the mel projection — the
    committed MFCC oracle fixture depends on it.

    >>> x = np.sin(np.arange(4000) / 8.0) * 0.4
    >>> f = mfcc(x, 16000)
    >>> f.shape == (14, 39)
    True
    >>> mfcc(x, 16000, deltas=False).shape
    (14, 13)
    >>> mfcc(np.zeros(10), 16000).shape  # shorter than one window
    (0, 39)
    """
    m = logmel(pcm, sr, n_fft=n_fft, hop=hop, n_mels=n_mels)
    basis = _dct_basis(n_mfcc, n_mels)
    cep = np.empty((m.shape[0], n_mfcc))
    for k in range(n_mfcc):
        cep[:, k] = (m * basis[k][None, :]).sum(axis=1)
    if not deltas:
        return cep
    d1 = delta(cep)
    d2 = delta(d1)
    return np.concatenate([cep, d1, d2], axis=1)


def spec_augment(
    feats: np.ndarray,
    key: str,
    n_freq_masks: int = 2,
    max_f: int = 8,
    n_time_masks: int = 2,
    time_frac_tenths: int = 1,
) -> np.ndarray:
    """SpecAugment masking (Park et al. 2019) with DETERMINISTIC mask
    placement: the mask geometry is derived from md5(key || lane index), so
    the augmentation is seedless and reproducible — the same clip always
    gets the same masks (re-runs and retries are idempotent, and a
    committed fixture can pin the output bit-for-bit), while across clips
    the placements are uniform. Masked cells are set to exactly 0.0 — the
    per-band mean after cmvn, so masking never shifts the feature
    statistics the acoustic model normalizes against.

    Each frequency mask zeroes a band range [f0, f0+w), w uniform in
    [0, max_f]; each time mask zeroes a frame range with width up to
    time_frac_tenths/10 of the clip's frames (the paper's p=1.0 bound
    scaled down for short clips). All arithmetic is integer on md5 bytes —
    no RNG object, no float.

    >>> f = np.ones((100, 40))
    >>> out = spec_augment(f, "clip_7")
    >>> out.shape == f.shape and (out == 0.0).any() and (out == 1.0).any()
    True
    >>> bool((spec_augment(f, "clip_7") == out).all())  # deterministic
    True
    >>> spec_augment(np.zeros((0, 40)), "x").shape
    (0, 40)
    """
    import hashlib

    x = np.asarray(feats, dtype=np.float64).copy()
    n_t, n_f = x.shape if x.ndim == 2 else (0, 0)
    if n_t == 0:
        return x

    def _draws(lane: str, lo_mod: int, hi_mod: int) -> tuple[int, int]:
        h = hashlib.md5(f"{key}|{lane}".encode()).digest()
        a = int.from_bytes(h[:8], "big")
        b = int.from_bytes(h[8:], "big")
        return a % lo_mod, b % hi_mod

    for i in range(n_freq_masks):
        w, f0 = _draws(f"f{i}", max_f + 1, n_f)
        x[:, f0 : min(f0 + w, n_f)] = 0.0
    max_t = max(1, n_t * time_frac_tenths // 10)
    for i in range(n_time_masks):
        w, t0 = _draws(f"t{i}", max_t + 1, n_t)
        x[t0 : min(t0 + w, n_t), :] = 0.0
    return x


def add_noise(
    pcm: np.ndarray, key: str, snr_db: int = 10
) -> np.ndarray | None:
    """Additive white-noise augmentation at an exact target SNR, with a
    DETERMINISTIC noise stream: the generator is counter-based Philox keyed
    by md5(key), so the same clip always gets the same noise (idempotent
    under task retries, fixture-pinnable) while streams are independent
    across clips. Returns None for empty/silent input (nothing to scale
    against) — callers pass those rows through.

    Portability: snr_db must be a multiple of 10 so the amplitude factor
    10^(snr/20) = sqrt(10)^(snr/10) is computed by IEEE sqrt and repeated
    multiplication — no libm pow/exp (the engine's digest-fixture rule).
    Noise is uniform on [-1, 1) (53-bit division, exact); both RMS terms
    use the fixed-order _sumsq_tree reduction.

    >>> x = np.sin(np.arange(8000) / 10.0) * 0.5
    >>> y = add_noise(x, "clip_1")
    >>> y.shape == x.shape and not np.array_equal(y, x)
    True
    >>> bool(np.array_equal(add_noise(x, "clip_1"), y))  # deterministic
    True
    >>> add_noise(np.zeros(100), "clip_1") is None  # silent -> passthrough
    True
    """
    import hashlib

    from .audio import _sumsq_tree

    if snr_db % 10 != 0:
        raise ValueError("snr_db must be a multiple of 10 (libm-free factor)")
    x = np.asarray(pcm, dtype=np.float64)
    n = x.size
    if n == 0:
        return None
    sig_ss = _sumsq_tree(x)
    if sig_ss <= 0.0:
        return None
    seed = int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "big")
    rng = np.random.Generator(np.random.Philox(key=seed))
    noise = 2.0 * rng.random(n) - 1.0
    noise_ss = _sumsq_tree(noise)
    if noise_ss <= 0.0:
        return None
    f = 1.0
    root10 = np.sqrt(10.0)
    for _ in range(abs(snr_db) // 10):
        f *= root10
    if snr_db < 0:
        f = 1.0 / f
    # sig_rms / (scale * noise_rms) == f  ->  scale
    scale = np.sqrt(sig_ss / noise_ss) / f
    return x + scale * noise


def wsola(
    pcm: np.ndarray,
    rate_num: int,
    rate_den: int,
    frame: int = 512,
    delta: int = 64,
) -> np.ndarray | None:
    """Time-stretch WITHOUT pitch change (WSOLA — waveform-similarity
    overlap-add, Verhelst & Roelands ICASSP 1995): the tempo-perturbation
    complement of the resampling speed change (which shifts pitch too).
    rate = num/den; >1 plays faster (shorter output), <1 slower.

    Output frames sit on a fixed Hann 50%-overlap grid; each takes the
    input segment near k*hop*rate whose alignment (within +/-delta) best
    continues the previously chosen segment. The alignment score is an
    EXACT int64 cross-correlation over pcm16-quantized frames, so the
    argmax — the one decision where a 1-ulp float difference would flip
    the whole output — is host-portable by construction; the synthesis
    overlap-add is elementwise IEEE float64.

    Returns None when the clip is too short to stretch (< 2 frames) —
    callers pass those rows through, the engine's flag-don't-crash rule.

    >>> sr = 16000
    >>> t = np.arange(2 * sr) / sr
    >>> x = 0.5 * np.sin(2 * np.pi * 440 * t)
    >>> y = wsola(x, 11, 10)  # 1.1x faster
    >>> abs(y.size - round(x.size * 10 / 11)) <= 512
    True
    >>> spec = np.abs(np.fft.rfft(y * np.hanning(y.size)))
    >>> peak_hz = spec.argmax() * sr / y.size
    >>> abs(peak_hz - 440.0) < 5.0  # pitch preserved (resample would give 484)
    True
    >>> wsola(x[:300], 11, 10) is None
    True
    """
    x = np.asarray(pcm, dtype=np.float64)
    n = x.size
    hop = frame // 2
    if n < 2 * frame or rate_num <= 0 or rate_den <= 0:
        return None
    n_out = int(round(n * rate_den / rate_num))
    n_frames = max(1, (n_out - frame) // hop + 1)
    win = np.hanning(frame)
    # pcm16-quantized frames kept as float64: every product is <= 32767^2
    # (< 2^31) and every window sum < 2^40, far inside float64's 2^53 exact
    # range — so the sliding correlation below is EXACT integer arithmetic
    # regardless of summation order (bit-identical to an int64 dot), while
    # running on the fast float path (~3x the int64 matmul).
    q = np.rint(np.clip(x, -1.0, 1.0) * 32767.0)
    out = np.zeros(n_frames * hop + frame, dtype=np.float64)
    norm = np.zeros_like(out)
    prev_start = 0
    for k in range(n_frames):
        nominal = (k * hop * rate_num) // rate_den
        if k == 0:
            start = min(nominal, n - frame)
        else:
            ref_start = prev_start + hop
            lo = max(0, nominal - delta)
            hi = min(n - frame, nominal + delta)
            if hi <= lo or ref_start + frame > n:
                start = min(max(nominal, 0), n - frame)
            else:
                ref = q[ref_start : ref_start + frame]
                # exact integer-valued sliding dot products (see q above)
                scores = np.correlate(q[lo : hi + frame], ref, mode="valid")[
                    : hi - lo + 1
                ]
                start = lo + int(np.argmax(scores))
        seg = x[start : start + frame]
        o = k * hop
        out[o : o + frame] += seg * win
        norm[o : o + frame] += win
        prev_start = start
    body = out[: n_out]
    nz = norm[: n_out] > 1e-12
    body[nz] /= norm[: n_out][nz]
    return body


def reverb(pcm: np.ndarray, key: str, sr: int, tail_ms: int = 200) -> np.ndarray | None:
    """Reverberation augmentation: convolve the clip with a DETERMINISTIC
    synthetic room impulse response keyed by md5(key) — the third standard
    robustness augmentation next to additive noise (add_noise) and prosody
    perturbation (wsola / resample speed).

    RIR construction (all from the clip's own counter-based Philox stream,
    so retries and re-runs reproduce it exactly, independent across clips):
    a unit direct path at t=0, six early reflections at random lags within
    the first quarter of the tail with signed gains in [0.3, 0.7), and an
    exponentially decaying uniform-noise tail (factor 0.998 per sample at
    16 kHz, rate-scaled) at gain 0.2. The RIR is then energy-normalized
    (IEEE sqrt of the fixed-order _sumsq_tree) so output loudness is
    comparable to the input.

    Convolution runs in the frequency domain (numpy pocketfft — the same
    deterministic FFT the log-mel/fingerprint fixtures already pin) and the
    output is truncated to the input length and clipped to [-1, 1].

    Returns None for empty input or degenerate sample rates.

    >>> x = np.sin(np.arange(16000) / 8.0) * 0.4
    >>> y = reverb(x, "clip_1", 16000)
    >>> y.shape == x.shape and not np.array_equal(y, x)
    True
    >>> bool(np.array_equal(reverb(x, "clip_1", 16000), y))  # deterministic
    True
    >>> bool(np.array_equal(reverb(x, "clip_2", 16000), y))  # per-key stream
    False
    >>> reverb(np.zeros(0), "clip_1", 16000) is None
    True
    >>> reverb(np.zeros(100), "clip_1", 16000) is None  # silent -> passthrough
    True
    """
    import hashlib

    from .audio import _sumsq_tree

    x = np.asarray(pcm, dtype=np.float64)
    n = x.size
    if n == 0 or sr <= 0 or not np.any(x):
        return None
    taps = max(2, (sr * tail_ms) // 1000)
    seed = int.from_bytes(hashlib.md5(key.encode()).digest()[:8], "big")
    rng = np.random.Generator(np.random.Philox(key=seed))
    h = np.zeros(taps, dtype=np.float64)
    h[0] = 1.0
    early_span = max(1, taps // 4)
    lags = 1 + (rng.random(6) * (early_span - 1)).astype(np.int64)
    gains = 0.3 + 0.4 * rng.random(6)
    signs = np.where(rng.random(6) < 0.5, -1.0, 1.0)
    np.add.at(h, lags, signs * gains)
    decay = np.float64(0.998) ** (np.arange(taps) * (16000.0 / sr))
    h += 0.2 * (2.0 * rng.random(taps) - 1.0) * decay
    ss = _sumsq_tree(h)
    if ss <= 0.0:
        return None
    h /= np.sqrt(ss)
    m = 1
    while m < n + taps - 1:
        m <<= 1
    y = np.fft.irfft(np.fft.rfft(x, m) * np.fft.rfft(h, m), m)[:n]
    return np.clip(y, -1.0, 1.0)


def pitch_shift(
    pcm: np.ndarray,
    num: int,
    den: int,
    frame: int = 512,
    delta: int = 64,
) -> np.ndarray | None:
    """Pitch shift WITHOUT tempo change — the third prosody axis beside
    resampling speed change (pitch+tempo together) and WSOLA tempo change
    (tempo only). Factor num/den > 1 shifts pitch UP.

    Classical two-stage construction: Lanczos-resample the waveform to
    den/num of its length (when replayed at the original rate every
    frequency scales by num/den — and so does duration), then WSOLA
    time-stretch by den/num to restore the original duration without
    touching the new pitch. Both stages are the engine's existing
    deterministic kernels, so the composition inherits their
    host-portability (exact int64 alignment argmax; fixed-order sinc).

    Returns None (caller passes the row through) when the clip is too
    short for the WSOLA stage — the same flag-don't-crash contract.

    >>> sr = 16000
    >>> t = np.arange(2 * sr) / sr
    >>> x = 0.5 * np.sin(2 * np.pi * 440 * t)
    >>> y = pitch_shift(x, 9, 8)  # up ~2 semitones
    >>> abs(y.size - x.size) <= 512  # duration preserved
    True
    >>> spec = np.abs(np.fft.rfft(y * np.hanning(y.size)))
    >>> peak_hz = spec.argmax() * sr / y.size
    >>> abs(peak_hz - 440.0 * 9 / 8) < 5.0  # pitch moved to 495 Hz
    True
    >>> pitch_shift(x[:700], 9, 8) is None  # too short to stretch
    True
    """
    x = np.asarray(pcm, dtype=np.float64)
    if x.size == 0 or num <= 0 or den <= 0:
        return None
    if num == den:
        return x.copy()
    # stage 1: time-compress by num/den (only the RATIO matters to the
    # resampler; anti-aliasing engages on the down direction)
    y1 = resample(x, num, den)
    # stage 2: stretch back to the original length, pitch untouched
    return wsola(y1, den, num, frame=frame, delta=delta)


def mix_overlay(
    base: np.ndarray,
    base_sr: int,
    ovl: np.ndarray,
    ovl_sr: int,
    sir_db: int = 10,
) -> np.ndarray | None:
    """Overlap-mix a second clip under a base clip at an exact target
    signal-to-interference ratio — the speech-overlap / babble
    augmentation, and the only augmentation whose input is a PAIR of
    clips. The overlay is resampled to the base rate when the rates
    differ (the engine's own anti-aliased Lanczos kernel), then truncated
    or zero-padded to the base length, scaled so
    rms(base) / rms(scaled overlay) == 10^(sir_db/20), and added.

    Returns None (callers pass the base through unmixed) when either side
    is empty or silent — same contract as add_noise. Portability matches
    add_noise: sir_db must be a multiple of 10 so the amplitude factor is
    IEEE sqrt(10) repeated (no libm pow); both RMS terms use the
    fixed-order _sumsq_tree reduction; the resample and the elementwise
    mix are fixed-order IEEE float64.

    >>> t = np.arange(16000) / 16000.0
    >>> b = 0.5 * np.sin(2 * np.pi * 440 * t)
    >>> o = 0.3 * np.sin(2 * np.pi * 1000 * t[:8000])
    >>> y = mix_overlay(b, 16000, o, 16000)
    >>> y.shape == b.shape
    True
    >>> bool(np.array_equal(y[8000:], b[8000:]))  # zero-padded tail
    True
    >>> mix_overlay(b, 16000, np.zeros(100), 16000) is None  # silent ovl
    True
    """
    from .audio import _sumsq_tree

    if sir_db % 10 != 0:
        raise ValueError("sir_db must be a multiple of 10 (libm-free factor)")
    x = np.asarray(base, dtype=np.float64)
    o = np.asarray(ovl, dtype=np.float64)
    if x.size == 0 or o.size == 0:
        return None
    if ovl_sr != base_sr:
        if ovl_sr <= 0 or base_sr <= 0:
            return None
        o = resample(o, ovl_sr, base_sr)
    if o.size >= x.size:
        o = o[: x.size]
    else:
        o = np.concatenate([o, np.zeros(x.size - o.size, dtype=np.float64)])
    sig_ss = _sumsq_tree(x)
    ovl_ss = _sumsq_tree(o)
    if sig_ss <= 0.0 or ovl_ss <= 0.0:
        return None
    f = 1.0
    root10 = np.sqrt(10.0)
    for _ in range(abs(sir_db) // 10):
        f *= root10
    if sir_db < 0:
        f = 1.0 / f
    scale = np.sqrt(sig_ss / ovl_ss) / f
    return x + scale * o


# fixed-point scale for corpus-level feature statistics: log-mel values are
# quantized to q = rint(value * 2^12) BEFORE summation so the global
# sums are exact integers — order-independent across any shuffle/reduce
# schedule, which float partial sums are not. 2^12 keeps sumsq comfortably
# inside int64 at the pinned corpus (and ~10^7 clips); beyond that the
# aggregation column widens to decimal(38,0), the values do not change.
QSTATS_SCALE = 4096


def logmel_qstats(
    pcm: np.ndarray,
    sr: int,
    n_fft: int = 512,
    hop: int = 256,
    n_mels: int = 40,
    scale: int = QSTATS_SCALE,
) -> tuple[int, np.ndarray, np.ndarray]:
    """Per-clip fixed-point log-mel statistics: (n_frames, sum_q[int64
    per mel bin], sumsq_q[int64 per bin]) with q = rint(logmel * scale).

    The partial-aggregate kernel for CORPUS-level feature normalization
    (global CMVN): quantizing before summation makes every downstream
    sum exact in integers, so the global statistics are reproducible
    bit-for-bit regardless of aggregation order — the property that lets
    a distributed reduce and a single-process oracle agree exactly.
    rint is round-half-even (IEEE), deterministic per element."""
    m = logmel(pcm, sr, n_fft=n_fft, hop=hop, n_mels=n_mels)
    q = np.rint(m * scale).astype(np.int64)
    return int(m.shape[0]), q.sum(axis=0), (q * q).sum(axis=0)


def corpus_cmvn_apply(
    pcm: np.ndarray,
    sr: int,
    mean_q: np.ndarray,
    istd_q: np.ndarray,
    n_fft: int = 512,
    hop: int = 256,
    n_mels: int = 40,
    scale: int = QSTATS_SCALE,
) -> np.ndarray:
    """Corpus-CMVN log-mel: (q_ij - mean_q[b]) * istd_q[b] per element,
    computed in the SAME quantized domain the statistics were collected
    in (q = rint(logmel * scale) as float64). mean_q / istd_q come from
    the global q-statistics via corpus_cmvn_constants — because both
    engines derive them from identical integers with identical IEEE
    ops, the normalized features (and their digests) are bit-exact."""
    m = logmel(pcm, sr, n_fft=n_fft, hop=hop, n_mels=n_mels)
    q = np.rint(m * scale)
    return (q - mean_q[None, :]) * istd_q[None, :]


def corpus_cmvn_constants(
    n: int, sum_q: np.ndarray, sumsq_q: np.ndarray, var_floor: float = 1e-10
) -> tuple[np.ndarray, np.ndarray]:
    """(mean_q, istd_q) float64 per bin from exact global integer stats.

    mean = sum/n and var = sumsq/n - mean^2 are single IEEE ops on exact
    integers, so every engine that holds the same (n, sum_q, sumsq_q)
    derives bit-identical constants. istd = 1/sqrt(var + var_floor) with
    the engine-wide 1e-10 epsilon (negative rounding residue clamped)."""
    mean = sum_q.astype(np.float64) / float(n)
    var = sumsq_q.astype(np.float64) / float(n) - mean * mean
    var = np.maximum(var, 0.0)
    return mean, 1.0 / np.sqrt(var + var_floor)
