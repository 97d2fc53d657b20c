"""Curriculum binning (q48) + deterministic sequence packing (q49)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def crafted_docs(spark):
    # lang, lengths chosen so pack boundaries are known by hand
    rows = [
        (1, "a" * 1000, "en", "s", 1000),
        (2, "b" * 2000, "en", "s", 2000),
        (3, "c" * 3000, "en", "s", 3000),
        (4, "d" * 500, "de", "s", 500),
        (5, "e" * 4000, "de", "s", 4000),
        (6, "f" * 100, "de", "s", 100),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


class TestSequencePacking:
    def test_first_fit_semantics(self, spark, crafted_docs, tmp_path):
        """pack_id = floor(start_offset / budget): a doc belongs to the pack
        its first char lands in, in md5-shuffle order within lang."""
        import hashlib

        from datasmith_spark.queries import QUERIES

        p = str(tmp_path / "sf")
        crafted_docs.write.mode("overwrite").parquet(f"{p}/documents.parquet")
        out = QUERIES["q49_sequence_packing"](spark, p).toPandas()
        assert len(out) == 6
        # recompute the greedy packing by hand per lang
        rows = crafted_docs.collect()
        for lang in ("en", "de"):
            sub = sorted(
                (r for r in rows if r.lang == lang),
                key=lambda r: (hashlib.md5(str(r.doc_id).encode()).hexdigest(), r.doc_id),
            )
            cum = 0
            for r in sub:
                start = cum
                cum += r.n_chars
                got = out[out.doc_id == r.doc_id].iloc[0]
                assert int(got.cum_chars) == cum, r.doc_id
                assert int(got.pack_id) == start // 4096, r.doc_id

    def test_packs_are_contiguous_and_bounded(self, spark):
        """Over the real corpus: per (lang, pack) the char total overflows
        the budget by at most one document, and pack ids are contiguous."""
        from datasmith_spark.queries import QUERIES

        out = QUERIES["q49_sequence_packing"](spark, SF_DIR).toPandas()
        for (lang, pid), grp in out.groupby(["lang", "pack_id"]):
            # pack starts strictly inside [pid*4096, (pid+1)*4096)
            starts = grp.cum_chars - grp.n_chars
            assert ((starts >= pid * 4096) & (starts < (pid + 1) * 4096)).all()
        for lang, grp in out.groupby("lang"):
            pids = sorted(grp.pack_id.unique())
            assert pids == list(range(pids[-1] + 1))  # contiguous from 0


class TestCurriculumBuckets:
    def test_balanced_buckets(self, spark):
        from datasmith_spark.queries import QUERIES

        out = QUERIES["q48_curriculum_buckets"](spark, SF_DIR).toPandas()
        out = out.sort_values("bucket").reset_index(drop=True)
        assert list(out.bucket) == list(range(1, 9))
        # ntile balance: counts differ by at most 1
        assert out.n_docs.max() - out.n_docs.min() <= 1
        # buckets are ordered by difficulty (length): ranges do not invert
        assert (out.min_chars.values[1:] >= out.max_chars.values[:-1] - 0).all() or (
            out.min_chars.is_monotonic_increasing
        )

    def test_registry(self):
        from datasmith_spark.queries import ORACLE_SQL, QUERIES

        for q in ("q48_curriculum_buckets", "q49_sequence_packing"):
            assert q in QUERIES and q in ORACLE_SQL


class TestTemperatureResample:
    def test_multiplicities_sum_to_target(self, spark):
        from datasmith_spark.queries import QUERIES

        out = QUERIES["q51_temperature_resample"](spark, SF_DIR).toPandas()
        g = out.groupby("lang").agg(
            n=("doc_id", "count"), k=("k_l", "first"),
            n_l=("n_l", "first"), copies=("n_copies", "sum"),
        )
        # T=0.5 never drops: every doc of every stratum is present once
        assert (g.n == g.n_l).all()
        # per-lang multiplicities sum exactly to the temperature target
        assert (g.copies == g.k).all()
        # the largest stratum is unchanged; smaller strata are upweighted
        top = g.k.idxmax()
        assert g.loc[top, "k"] == g.loc[top, "n_l"]
        rest = g.drop(index=top)
        assert (rest.k > rest.n_l).all()
        # k_l is the exact IEEE sqrt target
        import math
        for _, r in g.iterrows():
            assert r.k == math.ceil(math.sqrt(r.n_l * g.n_l.max()))

    def test_registry(self):
        from datasmith_spark.queries import ORACLE_SQL, QUERIES

        assert "q51_temperature_resample" in QUERIES
        assert "q51_temperature_resample" in ORACLE_SQL
