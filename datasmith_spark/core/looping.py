"""Looped-content audio audit: exact k-fold tiling detection.

The structural-duplication defect inside ONE clip that the cross-clip
dedup lanes (q38 fingerprints, q157 landmarks) cannot express: scraped and
synthetically-padded audio is often a short segment tiled 2-4x to reach a
target duration — worthless extra training tokens, and a length-fraud
signal on duration-weighted sampling. Exactly detectable in the sample
domain: a clip is a k-fold tiling of a p = n/k segment iff x[i] == x[i-p]
for all i >= p (checked as one vectorized array equality per k), the same
exact-value reasoning as the integrity audit's zero/stuck runs (q166) —
run-free content never repeats bit-identically because the corpus carries
additive noise, so the test is an audit, not a threshold guess.

The verdict scans k in {4, 3, 2} (largest first) and reports the FIRST
k whose tiling holds; silence is unjudgeable (zeros tile trivially) and
emitted keep, like the other lanes' degenerate rows. Measured on the
pinned corpus (4 000 clips): zero natural loops (the datagen noise floor
breaks exact equality everywhere), so base false positives are
structurally zero while plants are bit-exact tilings by construction.

Determinism / host-portability contract (committed-fixture rule, same as
core/bitdepth.py): exact float64 equality only — no arithmetic at all in
the verdict. All EMITTED metrics are integers/booleans.

>>> import numpy as np
>>> rng = np.random.default_rng(7)
>>> x = np.sin(np.arange(16000) / 7.0) * 0.5 + 0.01 * rng.standard_normal(16000)
>>> m = looping_metrics(x)
>>> (m["loop_k"], m["looped"], m["keep"])
(1, False, True)
>>> m = looping_metrics(looping_variant(x, "u-7"))
>>> (m["loop_k"] >= 2, m["looped"], m["keep"])
(True, True, False)
"""

from __future__ import annotations

import zlib

import numpy as np

LOOP_KS = (4, 3, 2)  # tiling factors checked, largest first
PLANT_KS = (2, 3, 4)  # id-hashed planted tiling factors


def looping_metrics(pcm: np.ndarray | None) -> dict:
    """Integer/boolean looped-content audit of decoded PCM:

    * n_samples   — decoded length (0: nothing to judge, keep)
    * loop_k      — largest k in {4,3,2} whose exact k-fold tiling holds
                    (1 when none); silence reports 1 (unjudgeable)
    * loop_period — n_samples // loop_k when looped, else None
    * looped      — loop_k >= 2
    * keep        — not looped

    >>> looping_metrics(None)["keep"]
    True
    >>> looping_metrics(np.zeros(100))["loop_k"]  # silence: unjudgeable
    1
    >>> looping_metrics(np.tile(np.array([0.1, -0.2, 0.3]), 4))["loop_k"]
    4
    """
    out = {
        "n_samples": 0,
        "loop_k": 1,
        "loop_period": None,
        "looped": False,
        "keep": True,
    }
    if pcm is None:
        return out
    x = np.asarray(pcm, dtype=np.float64)
    n = x.size
    out["n_samples"] = int(n)
    if n == 0 or not np.any(x != 0.0):
        return out
    for k in LOOP_KS:
        if n % k or n < 2 * k:
            continue
        p = n // k
        if np.array_equal(x[p:], x[: n - p]):
            out["loop_k"] = k
            out["loop_period"] = p
            out["looped"] = True
            out["keep"] = False
            break
    return out


def looping_variant(pcm: np.ndarray, clip_id: str) -> np.ndarray | None:
    """Deterministic planted LOOPED variant: the clip's leading n//k
    segment tiled k times (id-hashed k in {2,3,4}, same total length
    truncated to k*(n//k)) — ground truth for q173. Id-HASH derivation
    only (the q156 rule): defined for arbitrary ids.

    A tiling is bit-exact by construction, so detection needs no plant-
    side numeric care at all. Returns None for input too short to tile
    (n < 2k) or whose leading segment is silent (zeros tile trivially —
    the kernel deliberately reports those unjudgeable).
    """
    x = np.asarray(pcm, dtype=np.float64)
    k = PLANT_KS[zlib.crc32((clip_id + "#loop").encode()) % len(PLANT_KS)]
    p = x.size // k
    if p < 2 or not np.any(x[:p] != 0.0):
        return None
    return np.tile(x[:p], k)
