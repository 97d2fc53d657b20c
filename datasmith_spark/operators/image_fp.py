"""Image perceptual near-duplicate detection (Spark operators).

The image-modality twin of operators/audio_fp.py, completing the near-dup
matrix (text: MinHash/SimHash/winnowing/spans; audio: Haitsma-Kalker exact
+ Hamming-ball lanes; embeddings: LSH-prefiltered cosine; images: THIS).

Flow — the proven three-stage shape:

  1. hash: Arrow-batched narrow map decoding each image worker-side
     (PNG/JPEG/rgb8 via the shared pure-python codecs; bytes never enter
     the JVM on the fused-scan path) and emitting the 64-bit dHash as four
     16-bit bands (core/image_fp.py — integer-exact end to end).
  2. candidates: ids sharing ANY band, via the shared hot-key-capped band
     join (operators/pairs.py) — a meme re-uploaded a million times costs
     O(m) star pairs, never O(m^2).
  3. verify: exact 64-bit Hamming distance, computed JVM-side from the four
     band columns (bitwiseXOR + bit_count — whole-stage codegen, no Python)
     for candidate pairs only.

At 10^12 images: stage 1 is a shuffle-free narrow map, stage 2 shuffles
short uniform int keys through the cap, stage 3 touches candidates only.

The planted-duplicate derivation (core/image_fp.aug_exposure_variant — a
deterministic gain+brightness levels adjustment) rides the same scan: every
aug_every-th decodable image also emits the hash of its adjusted copy under
an `imgaug_` id, giving integer-exact ground truth for recall tests and the
DuckDB oracle from the SAME decode pass.

Reference ancestry: exact-key asset dedup at
/root/reference/src/datasmith/scrape/code_coverage.py:83-88; the perceptual
generalization is public technique (Krawetz dHash / Monga-Evans).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.image_fp import DH_MAX_HAMMING, aug_exposure_variant, dhash_bands

IMG_HASH_DDL = "img_id string, b0 int, b1 int, b2 int, b3 int"
_BAND_COLS = ["b0", "b1", "b2", "b3"]

# q65's planting cadence on the pinned n=4000 image table: an exposure
# variant for every 40th decodable image (98 imgaug_ rows — indices 0 and
# 2040 fall on the corrupt-JPEG lane). Shared by the Spark query, the
# fixture script and the tests, like audio_fp.FP_AUG_EVERY.
IMG_AUG_EVERY = 40


def _img_index(img_id: str) -> int:
    """Row index from an `img_<i>` / `imgaug_<i>` id (datagen naming)."""
    return int(img_id.rsplit("_", 1)[1])


def _hash_rows(pdf: pd.DataFrame, aug_every: int) -> pd.DataFrame:
    """One pandas batch of images -> (img_id, b0..b3) dHash rows (+ planted
    exposure variants under imgaug_ ids every aug_every-th decodable image).
    Undecodable / too-small rows emit nothing (flag-not-crash contract)."""
    from .multimodal import decode_image

    ids: list[str] = []
    bands: list[list[int]] = []
    for iid, buf, w, h, fmt in zip(
        pdf["img_id"], pdf["bytes"], pdf["width"], pdf["height"], pdf["fmt"]
    ):
        img = decode_image(buf, int(w), int(h), fmt)
        if img is None:
            continue
        bs = dhash_bands(img)
        if bs is None:
            continue
        ids.append(iid)
        bands.append(bs)
        # The datagen index is a test-harness concern (planting ground-truth
        # duplicates); the composable default (aug_every=0) must accept
        # arbitrary image ids, so only parse when planting is on — the same
        # contract as audio_fp._fp_rows_generic.
        if aug_every and _img_index(iid) % aug_every == 0:
            bs2 = dhash_bands(aug_exposure_variant(img))
            if bs2 is not None:
                ids.append(f"imgaug_{_img_index(iid):012d}")
                bands.append(bs2)
    cols = list(zip(*bands)) if bands else [[], [], [], []]
    return pd.DataFrame(
        {
            "img_id": ids,
            **{c: pd.array(v, dtype="int32") for c, v in zip(_BAND_COLS, cols)},
        }
    )


def image_hashes(images: DataFrame, aug_every: int = 0) -> DataFrame:
    """(img_id, b0..b3) dHash rows from an images DataFrame (composable
    path; image bytes cross the JVM<->Python socket once on the way in)."""
    from collections.abc import Iterator

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _hash_rows(pdf, aug_every)

    from .multimodal import IMAGE_COLUMNS

    return images.select(*IMAGE_COLUMNS).mapInPandas(_run, schema=IMG_HASH_DDL)


def image_hash_scan(spark: SparkSession, input_dir: str, aug_every: int = 0) -> DataFrame:
    """image_hashes over a parquet directory via the fused manifest scan
    (image bytes never enter the JVM). The pure-python codecs are the
    kernel, so this takes full session parallelism like the other
    kernel-bound scans, not the byte-bound I/O cap."""
    from .audio_ops import _kernel_parallelism, _manifest_scan
    from .multimodal import IMAGE_COLUMNS

    return _manifest_scan(
        spark,
        input_dir,
        lambda pdf: _hash_rows(pdf, aug_every),
        IMG_HASH_DDL,
        scan_parallelism=_kernel_parallelism(spark, input_dir),
        columns=IMAGE_COLUMNS,
    )


def image_neardup_pairs(
    hashes: DataFrame, max_hamming: int = DH_MAX_HAMMING, cap: int | None = None
) -> DataFrame:
    """(img_a, img_b, hamming) near-duplicate pairs: candidates share ANY
    16-bit band (hot-key-capped), verified by exact 64-bit Hamming distance
    <= max_hamming — all-integer columns, so the value check is exact.

    The verify is JVM-native (two broadcast-eligible joins back to the
    four band columns, bitwiseXOR + bit_count inside whole-stage codegen);
    only candidate pairs pay it.
    """
    from .pairs import capped_band_pairs

    h = hashes.select(F.col("img_id").alias("id"), *_BAND_COLS)
    cand = capped_band_pairs(h, _BAND_COLS, "id", cap)
    ha = h.select(F.col("id").alias("a"), *[F.col(c).alias(f"{c}_a") for c in _BAND_COLS])
    hb = h.select(F.col("id").alias("b"), *[F.col(c).alias(f"{c}_b") for c in _BAND_COLS])
    dist = None
    for c in _BAND_COLS:
        term = F.bit_count(F.col(f"{c}_a").bitwiseXOR(F.col(f"{c}_b")))
        dist = term if dist is None else dist + term
    return (
        cand.join(ha, "a")
        .join(hb, "b")
        .select(
            F.col("a").alias("img_a"),
            F.col("b").alias("img_b"),
            dist.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
