"""Boilerplate-sentence audit (q175): threshold semantics, plant recovery,
broadcast plan shape."""

from __future__ import annotations

from datasmith_spark.operators.text_analysis import BOILER_SENTENCE, boilerplate_audit


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestSemantics:
    def test_shared_sentence_flagged_at_min_docs(self, spark):
        tpl = "all rights reserved"
        rows = [
            (1, f"alpha beta. {tpl}"),
            (2, f"gamma delta. {tpl}"),
            (3, f"epsilon zeta. {tpl}"),
            (4, "eta theta only content"),
        ]
        out = {r.doc_key: r for r in boilerplate_audit(_docs(spark, rows)).collect()}
        for k in ("doc_1", "doc_2", "doc_3"):
            assert out[k].suspect and out[k].n_boiler == 1 and out[k].n_sentences == 2
        assert not out["doc_4"].suspect and out["doc_4"].n_boiler == 0

    def test_two_docs_sharing_is_below_the_line(self, spark):
        rows = [(1, "shared tail. unique one"), (2, "shared tail. unique two"),
                (3, "nothing common here")]
        out = {r.doc_key: r for r in boilerplate_audit(_docs(spark, rows)).collect()}
        assert not any(r.suspect for r in out.values())

    def test_repeated_occurrences_counted_per_occurrence(self, spark):
        tpl = "click here now"
        rows = [
            (1, f"{tpl}. body text. {tpl}"),
            (2, f"{tpl}. other body"),
            (3, f"{tpl}. third body"),
        ]
        out = {r.doc_key: r for r in boilerplate_audit(_docs(spark, rows)).collect()}
        assert out["doc_1"].n_boiler == 2 and out["doc_1"].n_sentences == 3
        assert out["doc_2"].n_boiler == 1

    def test_null_and_empty_text(self, spark):
        rows = [(1, None), (2, ""), (3, "real content here")]
        out = {r.doc_key: r for r in boilerplate_audit(_docs(spark, rows)).collect()}
        assert out["doc_1"].n_sentences == 0 and not out["doc_1"].suspect
        assert out["doc_2"].n_sentences == 0
        assert out["doc_3"].n_sentences == 1

    def test_planting_recovers_and_base_clean(self, spark):
        rows = [(i, f"doc body number {i} words") for i in range(60)]
        got = boilerplate_audit(_docs(spark, rows), plant_every=20).toPandas()
        plants = got[got.doc_key.str.startswith("bo_")]
        base = got[~got.doc_key.str.startswith("bo_")]
        assert len(plants) == 3 and plants.suspect.all()
        assert (plants.n_boiler == 1).all()
        assert not base.suspect.any()

    def test_plant_sentence_is_the_flagged_one(self, spark):
        # the planted variant's extra sentence is exactly BOILER_SENTENCE.
        rows = [(i, f"unique body {i}") for i in range(40)]
        got = boilerplate_audit(_docs(spark, rows), plant_every=10).toPandas()
        plants = got[got.doc_key.str.startswith("bo_")]
        assert (plants.n_sentences == 2).all()  # own body + the template
        assert BOILER_SENTENCE  # referenced: the appended template constant


class TestPlan:
    def test_flagged_set_joins_broadcast(self, spark):
        rows = [(i, f"body {i}. all rights reserved") for i in range(9)]
        plan = boilerplate_audit(_docs(spark, rows))._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_registry_has_q175(self):
        from datasmith_spark.queries import ORACLE_SQL, QUERIES

        assert "q175_boilerplate_audit" in QUERIES and "q175_boilerplate_audit" in ORACLE_SQL
