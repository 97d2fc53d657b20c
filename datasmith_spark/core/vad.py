"""Energy-based voice-activity / trim / clipping metrics kernel.

Per-clip audio quality heuristics for a training-data curation pipeline:
frame-level activity detection (fixed-size non-overlapping energy frames
against an absolute dBFS threshold), lead/tail trim points, and hard-clipping
sample counts. The graft's audio-side counterpart of the transcript quality
rules (core/rules.py) — the reference's quality heuristics are text-only
(/root/reference/src/datasmith/scrape/filter_dashboards.py:113-121); this is
the same keep/drop shape applied to the decoded PCM itself.

Determinism contract (same as core/audio.py pcm_features): per-row-only math,
and every float reduction uses an explicitly pinned elementwise fold — never
np.sum/BLAS, whose reduction order varies across hosts — so the committed
oracle fixture (fixtures/oracle_audio_vad_n*.parquet) is host-portable and
results are invariant to Arrow batch size and partitioning.

All emitted metrics are integers or booleans: frame counts, sample counts,
millisecond trim points. The only floats are internal (energy sums), compared
against a constant threshold — a deterministic predicate given pinned-order
sums.
"""

from __future__ import annotations

import numpy as np

# defaults: 20 ms non-overlapping frames, -35 dBFS activity floor, |x|>=0.999
# counts as a clipped sample (the codec headroom convention pcm_features uses)
FRAME_MS = 20
ACTIVE_DB = -35.0
CLIP_T = 0.999

# q41's threshold over the synthetic corpus (shared by the fixture script and
# the query so they cannot drift): datagen clips are continuous tones with
# peak ~ U(0.05, 0.95), so the public -35 dBFS floor marks everything active;
# -20 dBFS puts the quietest ~10% below the activity rule and exercises the
# keep/drop split end to end.
Q41_ACTIVE_DB = -20.0

VAD_FIELDS = (
    "n_samples",
    "n_frames",
    "n_active",
    "trim_start_ms",
    "trim_end_ms",
    "n_clipped",
)


def _frame_sumsq(x: np.ndarray, frame: int) -> np.ndarray:
    """Per-frame sum of squares over non-overlapping frames, pinned order.

    Strict left fold over the in-frame axis using only elementwise adds
    (one IEEE-754 add per output element per step — nothing for SIMD or
    blocking to reorder), same construction as core/audio._sumsq_tree.
    Cost: one pass over the signal. The tail partial frame is dropped
    (standard framing; a <frame_ms tail cannot flip activity decisions).
    """
    n_frames = x.size // frame
    if n_frames == 0:
        return np.zeros(0, dtype=np.float64)
    s = x[: n_frames * frame]
    s = s * s
    blk = s.reshape(n_frames, frame)
    acc = np.zeros(n_frames, dtype=np.float64)
    for j in range(frame):
        np.add(acc, blk[:, j], out=acc)
    return acc


def vad_metrics(
    pcm: np.ndarray | None,
    sr: int,
    frame_ms: int = FRAME_MS,
    active_db: float = ACTIVE_DB,
) -> tuple[int, int, int, int | None, int | None, int]:
    """(n_samples, n_frames, n_active, trim_start_ms, trim_end_ms, n_clipped).

    A frame is active when its mean-square energy is at least
    (10^(active_db/20))^2 — i.e. frame RMS >= active_db dBFS. Trim points are
    the start of the first active frame and the end of the last one, in
    integer milliseconds; None/None when no frame is active.

    >>> sr = 1000
    >>> sil = np.zeros(sr)                       # 1 s silence
    >>> tone = 0.5 * np.ones(sr)                 # 1 s loud
    >>> vad_metrics(np.concatenate([sil, tone, sil]), sr)
    (3000, 150, 50, 1000, 2000, 0)
    >>> vad_metrics(np.zeros(100), 1000)         # all silent
    (100, 5, 0, None, None, 0)
    >>> vad_metrics(None, 16000)
    (0, 0, 0, None, None, 0)
    >>> vad_metrics(np.ones(40), 1000)           # hard-clipped
    (40, 2, 2, 0, 40, 40)
    """
    if pcm is None or pcm.size == 0 or sr <= 0:
        return 0, 0, 0, None, None, 0
    frame = max(1, sr * frame_ms // 1000)
    e = _frame_sumsq(pcm, frame)
    n_frames = int(e.size)
    thr = (10.0 ** (active_db / 20.0)) ** 2 * frame  # sum-sq threshold
    active = e >= thr
    n_active = int(np.count_nonzero(active))
    if n_active:
        first = int(np.argmax(active))
        last = n_frames - 1 - int(np.argmax(active[::-1]))
        trim_start_ms: int | None = int(round(first * frame / sr * 1000.0))
        trim_end_ms: int | None = int(round((last + 1) * frame / sr * 1000.0))
    else:
        trim_start_ms = trim_end_ms = None
    n_clipped = int(np.count_nonzero(pcm >= CLIP_T)) + int(
        np.count_nonzero(pcm <= -CLIP_T)
    )
    return int(pcm.size), n_frames, n_active, trim_start_ms, trim_end_ms, n_clipped


def active_span_samples(
    pcm: np.ndarray | None,
    sr: int,
    frame_ms: int = FRAME_MS,
    active_db: float = ACTIVE_DB,
) -> tuple[int, int] | None:
    """Sample-index span [lo, hi) covering the first..last active frame, or
    None when no frame is active. The sample-domain twin of vad_metrics'
    ms trim points — used by the lossless byte-cut trim operator.

    >>> sr = 1000
    >>> x = np.concatenate([np.zeros(sr), 0.5 * np.ones(sr), np.zeros(sr)])
    >>> active_span_samples(x, sr)
    (1000, 2000)
    >>> active_span_samples(np.zeros(100), 1000) is None
    True
    """
    if pcm is None or pcm.size == 0 or sr <= 0:
        return None
    frame = max(1, sr * frame_ms // 1000)
    e = _frame_sumsq(pcm, frame)
    if e.size == 0:
        return None
    thr = (10.0 ** (active_db / 20.0)) ** 2 * frame
    active = e >= thr
    if not active.any():
        return None
    first = int(np.argmax(active))
    last = e.size - 1 - int(np.argmax(active[::-1]))
    return first * frame, min((last + 1) * frame, int(pcm.size))


def vad_keep(
    ok: bool, n_samples: int, n_frames: int, n_active: int, n_clipped: int
) -> bool:
    """Composite audio-quality keep rule — integer cross-multiplied compares
    (no float ratios, so the rule is exactly re-derivable in SQL):

      * decodable with at least one full frame
      * >= 20% of frames active (not mostly silence)
      * <= 1% of samples hard-clipped

    >>> vad_keep(True, 1000, 50, 10, 10)
    True
    >>> vad_keep(True, 1000, 50, 9, 0)     # 18% active
    False
    >>> vad_keep(True, 1000, 50, 50, 11)   # 1.1% clipped
    False
    >>> vad_keep(False, 0, 0, 0, 0)
    False
    """
    return (
        bool(ok)
        and n_frames > 0
        and 5 * n_active >= n_frames
        and 100 * n_clipped <= n_samples
    )
