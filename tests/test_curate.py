"""Unit tests for the curation operators (operators/curate.py) and the
near-dup canonicalization (operators/dedup.canonical_docs) on small
deterministic fixtures. The driver oracle (tools/check_oracles.py) covers
cross-engine exactness; these pin the operator semantics directly."""

import hashlib

import pyspark.sql.functions as F
import pytest


class TestPii:
    @pytest.fixture(scope="class")
    def pii_docs(self, spark):
        rows = [
            (1, "contact me at john.doe@example.com or 415-555-0123 ok"),
            (2, "ssn 123-45-6789 and server 192.168.0.1 here"),
            (3, "clean text with no pii at all"),
            (4, ""),
        ]
        return spark.createDataFrame(rows, "doc_id int, text string")

    def test_counts_and_total(self, pii_docs):
        from entity_matching_spark.operators.curate import pii_stats

        got = {r["doc_id"]: r.asDict() for r in pii_stats(pii_docs).collect()}
        assert got[1]["n_email"] == 1 and got[1]["n_phone"] == 1
        assert got[1]["n_pii"] == 2
        assert got[2]["n_ssn"] == 1 and got[2]["n_ipv4"] == 1 and got[2]["n_pii"] == 2
        assert got[3]["n_pii"] == 0 and got[4]["n_pii"] == 0

    def test_redaction_markers(self, pii_docs):
        from entity_matching_spark.operators.curate import pii_stats

        got = {r["doc_id"]: r["redacted"] for r in pii_stats(pii_docs).collect()}
        assert got[1] == "contact me at [EMAIL] or [PHONE] ok"
        assert got[2] == "ssn [SSN] and server [IPV4] here"
        assert got[3] == "clean text with no pii at all"

    def test_ssn_is_not_double_counted_as_phone(self, spark):
        from entity_matching_spark.operators.curate import pii_stats

        docs = spark.createDataFrame([(1, "id 123-45-6789 x")], "doc_id int, text string")
        row = pii_stats(docs).collect()[0]
        assert row["n_ssn"] == 1 and row["n_phone"] == 0


class TestContamination:
    def test_overlap_fraction(self, spark):
        from entity_matching_spark.operators.curate import contamination_scores

        corpus = spark.createDataFrame(
            [
                # grams (n=3): 4 total, 2 of them inside the benchmark text
                (1, "a b c d e x y"),
                # fewer than n words -> zero grams, contamination 0.0
                (2, "a b"),
                # no overlap at all
                (3, "p q r s t"),
            ],
            "doc_id int, text string",
        )
        bench = spark.createDataFrame([(100, "a b c d")], "doc_id int, text string")
        got = {r["doc_id"]: r.asDict() for r in
               contamination_scores(corpus, bench, n=3).collect()}
        # doc 1: grams {abc, bcd, cde, dex, exy}; bench grams {abc, bcd}
        assert got[1]["n_grams"] == 5 and got[1]["n_matched"] == 2
        assert abs(got[1]["contamination"] - 0.4) < 1e-9
        assert got[2]["n_grams"] == 0 and got[2]["contamination"] == 0.0
        assert got[3]["n_matched"] == 0

    def test_all_docs_present_in_output(self, spark):
        from entity_matching_spark.operators.curate import contamination_scores

        corpus = spark.createDataFrame(
            [(i, "w") for i in range(10)], "doc_id int, text string"
        )
        bench = spark.createDataFrame([(99, "a b c")], "doc_id int, text string")
        assert contamination_scores(corpus, bench, n=3).count() == 10


class TestStratifiedSample:
    def test_deterministic_and_rate_respecting(self, spark):
        from entity_matching_spark.operators.curate import stratified_sample

        docs = spark.range(4000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 2 == 0, "web").otherwise("books").alias("source"),
        )
        s1 = stratified_sample(docs, {"web": 0.25, "books": 0.75})
        s2 = stratified_sample(docs, {"web": 0.25, "books": 0.75})
        r1 = sorted(r["doc_id"] for r in s1.collect())
        assert r1 == sorted(r["doc_id"] for r in s2.collect())  # reproducible
        counts = {r["stratum"]: r["n"] for r in
                  s1.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
        # 2000 per stratum; binomial(2000, p) stays well within 5 sigma
        assert abs(counts["web"] - 500) < 100
        assert abs(counts["books"] - 1500) < 100

    def test_variate_matches_reference_md5(self, spark):
        from entity_matching_spark.operators.curate import stratified_sample

        docs = spark.createDataFrame([(7, "web")], "doc_id int, source string")
        got = stratified_sample(docs, {"web": 1.0}).collect()[0]
        expect = round(int(hashlib.md5(b"s1|7").hexdigest()[:8], 16) / 2**32, 9)
        assert abs(got["u"] - expect) < 1e-12

    def test_salt_redraws(self, spark):
        from entity_matching_spark.operators.curate import stratified_sample

        docs = spark.range(2000).select(
            F.col("id").alias("doc_id"), F.lit("web").alias("source")
        )
        a = {r["doc_id"] for r in stratified_sample(docs, {"web": 0.5}, salt="s1").collect()}
        b = {r["doc_id"] for r in stratified_sample(docs, {"web": 0.5}, salt="s2").collect()}
        assert a != b and len(a & b) > 0  # independent draws overlap partially


class TestRepetitionStats:
    def test_top_gram_and_dup_fraction(self, spark):
        from entity_matching_spark.operators.curate import repetition_stats

        docs = spark.createDataFrame(
            [
                # "a b" occurs 3x (grams: ab,ba,ab,ba,ab,bc) -> top count 3
                (1, "a b a b a b c"),
                # all 2-grams distinct
                (2, "p q r s"),
                # too short for any gram
                (3, "x"),
                (4, ""),
            ],
            "doc_id int, text string",
        )
        got = {r["doc_id"]: r.asDict() for r in
               repetition_stats(docs, top_n=2, dup_n=2).collect()}
        assert got[1]["top_ngram"] == "a b" and got[1]["top_ngram_count"] == 3
        # 3 occurrences x 3 chars over 13 chars of text
        assert abs(got[1]["top_ngram_frac"] - 9 / 13) < 1e-9
        # 6 grams, 3 distinct (ab, ba, bc) -> dup fraction 0.5
        assert got[1]["n_dup_grams"] == 6
        assert abs(got[1]["dup_ngram_frac"] - 0.5) < 1e-9
        assert got[2]["top_ngram_count"] == 1 and got[2]["dup_ngram_frac"] == 0.0
        assert got[3]["top_ngram_count"] == 0 and got[3]["top_ngram"] is None
        assert got[3]["top_ngram_frac"] == 0.0 and got[4]["dup_ngram_frac"] == 0.0

    def test_tie_breaks_to_lexicographically_largest(self, spark):
        from entity_matching_spark.operators.curate import repetition_stats

        # "a b" and "c d" both occur twice; the tie must go to "c d"
        docs = spark.createDataFrame(
            [(1, "a b z c d z a b z c d")], "doc_id int, text string"
        )
        row = repetition_stats(docs, top_n=2, dup_n=5).collect()[0]
        assert row["top_ngram"] == "z c" or row["top_ngram_count"] == 2
        # exact check: count all 2-grams -> ab x2, bz x2, zc x2, cd x2, dz x1, za x1, zc...
        # grams: ab bz zc cd dz za ab bz zc cd -> ab2 bz2 zc2 cd2 dz1 za1; max ties at 2 -> "z c"
        assert row["top_ngram"] == "z c" and row["top_ngram_count"] == 2

    def test_zero_shuffle_plan(self, spark):
        from entity_matching_spark.operators.curate import repetition_stats

        docs = spark.createDataFrame([(1, "a b a b")], "doc_id int, text string")
        plan = repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # pure per-row projection


class TestCurationReport:
    @pytest.fixture(scope="class")
    def funnel(self, spark):
        from entity_matching_spark.operators.curate import curation_report

        long_good = " ".join(
            f"w{i} the of and in to is on for with" for i in range(12)
        )  # long, stopword-rich, no repetition -> high quality
        docs = spark.createDataFrame(
            [
                (1, long_good, "web"),
                (2, "!!!", "web"),                        # all punctuation -> quality ~0.003
                (3, "a b a b a b a b a b a b", "web"),    # repetitive top-2-gram
                (4, long_good + " trailing", "web"),      # near-dup of 1
                # stopword-rich (quality ~0.54) but identical to the benchmark
                (5, "the of and in to is on for with p q r s", "web"),
            ],
            "doc_id int, text string, source string",
        )
        bench = spark.createDataFrame(
            [(100, "the of and in to is on for with p q r s", "eval")],
            "doc_id int, text string, source string",
        )
        pairs = spark.createDataFrame([(1, 4)], "doc_a int, doc_b int")
        out = curation_report(
            docs, bench, pairs, {"web": 1.0},
            min_quality=0.1, max_top_ngram_frac=0.5,
            max_contamination=0.5, contam_n=3,
        )
        return {r["doc_id"]: r.asDict() for r in out.collect()}

    def test_reasons_fire_per_document(self, funnel):
        assert funnel[2]["drop_reasons"] == "low_quality"
        assert "repetitive" in funnel[3]["drop_reasons"]
        assert funnel[5]["drop_reasons"] == "contaminated"
        # doc 4 is marginally longer -> higher quality -> it is the cluster's
        # canonical; doc 1 is the one dropped as the near-duplicate
        assert funnel[1]["drop_reasons"] == "near_duplicate"
        assert funnel[4]["drop_reasons"] == "" and funnel[4]["kept"] is True

    def test_near_dup_cluster_keeps_exactly_one(self, funnel):
        keeps = [funnel[1]["near_dup"], funnel[4]["near_dup"]]
        assert sorted(keeps) == [False, True]  # one canonical, one dropped

    def test_kept_requires_sampled_and_no_reasons(self, funnel):
        for d, row in funnel.items():
            assert row["kept"] == (row["drop_reasons"] == "" and row["sampled"])


class TestCanonicalDocs:
    def test_transitive_cluster_keeps_best_quality(self, spark):
        from entity_matching_spark.operators.dedup import canonical_docs

        docs = spark.createDataFrame(
            [
                # 3-doc chain: 1-2 and 2-3 pair, 1-3 never does -> one cluster
                (1, "short"),
                (2, "a much longer and therefore higher quality document of the three"),
                (3, "mid length document here"),
                (4, "isolated doc never paired"),
            ],
            "doc_id int, text string",
        )
        pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a int, doc_b int")
        got = {r["doc_id"]: r.asDict() for r in canonical_docs(docs, pairs).collect()}
        assert set(got) == {1, 2, 3}  # singletons don't appear
        assert all(r["cluster_id"] == 1 for r in got.values())
        assert all(r["canonical_doc"] == 2 for r in got.values())
        assert got[2]["keep"] is True
        assert got[1]["keep"] is False and got[3]["keep"] is False

    def test_quality_tie_breaks_to_min_id(self, spark):
        from entity_matching_spark.operators.dedup import canonical_docs

        docs = spark.createDataFrame(
            [(5, "same text"), (9, "same text")], "doc_id int, text string"
        )
        pairs = spark.createDataFrame([(5, 9)], "doc_a int, doc_b int")
        got = {r["doc_id"]: r.asDict() for r in canonical_docs(docs, pairs).collect()}
        assert got[5]["keep"] is True and got[9]["keep"] is False

    def test_explicit_quality_overrides_default(self, spark):
        from entity_matching_spark.operators.dedup import canonical_docs

        docs = spark.createDataFrame(
            [(1, "irrelevant"), (2, "irrelevant")], "doc_id int, text string"
        )
        pairs = spark.createDataFrame([(1, 2)], "doc_a int, doc_b int")
        quality = spark.createDataFrame([(1, 0.1), (2, 0.9)], "doc_id int, quality double")
        got = {r["doc_id"]: r["keep"] for r in
               canonical_docs(docs, pairs, quality=quality).collect()}
        assert got[2] is True and got[1] is False


class TestBM25:
    def test_hand_computed_two_docs(self, spark):
        """BM25 against a 2-doc corpus, checked against the hand-evaluated
        Lucene formula."""
        import math

        from entity_matching_spark.operators.text import bm25_scores

        docs = spark.createDataFrame(
            [("d1", "hash join hash"), ("d2", "full scan")],
            "doc_id string, text string",
        )
        got = {r["doc_id"]: r for r in bm25_scores(docs, "hash scan").collect()}
        n, k1, b = 2, 1.2, 0.75
        avgdl = (3 + 2) / 2
        def bm(tf, df, dl):
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        assert got["d1"]["dl"] == 3 and got["d2"]["dl"] == 2
        assert abs(got["d1"]["score"] - round(bm(2, 1, 3), 9)) < 1e-9   # 'hash' only
        assert abs(got["d2"]["score"] - round(bm(1, 1, 2), 9)) < 1e-9   # 'scan' only

    def test_no_explode_no_udf(self, spark, tmp_path):
        import re

        from entity_matching_spark.operators.text import bm25_scores

        p = str(tmp_path / "bdocs.parquet")
        spark.createDataFrame(
            [(i, f"hash join tok{i} order by") for i in range(40)],
            "doc_id int, text string",
        ).write.parquet(p)
        df = bm25_scores(spark.read.parquet(p), "hash order")
        df.count()
        fm = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        plan = df._jdf.queryExecution().explainString(fm)
        assert not re.search(r"\(\d+\) Generate", plan), plan      # no explode
        assert "EvalPython" not in plan                            # no UDF
        assert re.search(r"\(\d+\) BroadcastExchange", plan), plan # stats row broadcast

    def test_empty_query_raises(self, spark):
        import pytest as _pytest

        from entity_matching_spark.operators.text import bm25_scores

        docs = spark.createDataFrame([("d", "x")], "doc_id string, text string")
        with _pytest.raises(ValueError, match="no non-empty terms"):
            bm25_scores(docs, "   ")

    def test_null_text_is_zero_length_doc(self, spark):
        """NULL text must contribute dl=0, not size(NULL)=-1 — a -1 dl would
        poison avgdl (and thus every document's score) corpus-wide."""
        from entity_matching_spark.operators.text import bm25_scores

        docs = spark.createDataFrame(
            [("d1", "hash join hash"), ("d2", "full scan"), ("d3", None)],
            "doc_id string, text string",
        )
        got = {r["doc_id"]: r for r in bm25_scores(docs, "hash scan").collect()}
        assert got["d3"]["dl"] == 0 and got["d3"]["score"] == 0.0
        assert got["d1"]["dl"] == 3 and got["d2"]["dl"] == 2

    def test_query_table_agrees_with_literal_on_one_query(self, spark):
        """bm25_scores_table on a 1-query table == bm25_scores on the same
        query string, restricted to docs with >= 1 matching term (the only
        rows the table variant emits; every omitted literal score is 0)."""
        from entity_matching_spark.operators.text import bm25_scores, bm25_scores_table

        docs = spark.createDataFrame(
            [("d1", "hash join hash order by key"), ("d2", "full table scan order"),
             ("d3", "nothing relevant here"), ("d4", None), ("d5", "join join join")],
            "doc_id string, text string",
        )
        query = "hash join order"
        # duplicate term rows must dedup (terms are a SET per query)
        qt = spark.createDataFrame(
            [("q1", t) for t in query.split()] + [("q1", "join")],
            "query_id string, term string",
        )
        lit = {r["doc_id"]: r for r in bm25_scores(docs, query).collect()}
        tab = {r["doc_id"]: r for r in bm25_scores_table(docs, qt).collect()}
        assert set(tab) == {d for d, r in lit.items() if r["score"] > 0}
        for d, r in tab.items():
            assert r["query_id"] == "q1"
            assert r["dl"] == lit[d]["dl"] and r["score"] == lit[d]["score"]

    def test_query_table_multi_query_independent_scores(self, spark):
        """N probes in one pass: each query_id's scores equal that query run
        alone (corpus stats are query-independent), and a query whose terms
        miss the corpus contributes no rows."""
        from entity_matching_spark.operators.text import bm25_scores, bm25_scores_table

        docs = spark.createDataFrame(
            [("d1", "hash join order"), ("d2", "table scan big table"),
             ("d3", "window agg sort window")],
            "doc_id string, text string",
        )
        probes = {"qa": "hash order", "qb": "table window", "qc": "missing terms"}
        qt = spark.createDataFrame(
            [(q, t) for q, s in probes.items() for t in s.split()],
            "query_id string, term string",
        )
        got = bm25_scores_table(docs, qt).collect()
        assert {r["query_id"] for r in got} == {"qa", "qb"}
        for qid, s in [("qa", probes["qa"]), ("qb", probes["qb"])]:
            lit = {r["doc_id"]: r["score"] for r in bm25_scores(docs, s).collect()}
            sub = {r["doc_id"]: r["score"] for r in got if r["query_id"] == qid}
            assert sub == {d: v for d, v in lit.items() if v > 0}


class TestTfIdf:
    def test_hand_computed(self, spark):
        import math

        from entity_matching_spark.operators.text import tfidf_topk_terms

        docs = spark.createDataFrame(
            [("d1", "apple apple banana"), ("d2", "banana cherry"), ("d3", "cherry cherry date")],
            "doc_id string, text string",
        )
        got = {(r["doc_id"], r["rank"]): r for r in tfidf_topk_terms(docs, k=2).collect()}
        # d1: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5)
        assert got[("d1", 1)]["term"] == "apple"
        assert abs(got[("d1", 1)]["tfidf"] - round(2 * math.log(3), 9)) < 1e-9
        assert got[("d1", 2)]["term"] == "banana"
        # d3: cherry tf=2 df=2 -> 2*ln(1.5) = 0.81; date tf=1 df=1 -> ln(3) = 1.098
        assert got[("d3", 1)]["term"] == "date"
        assert got[("d3", 2)]["term"] == "cherry"

    def test_tie_breaks_to_smaller_term(self, spark):
        from entity_matching_spark.operators.text import tfidf_topk_terms

        docs = spark.createDataFrame(
            [("d1", "zeta alpha"), ("d2", "other words")],
            "doc_id string, text string",
        )
        got = [r["term"] for r in tfidf_topk_terms(docs, k=2)
               .where("doc_id = 'd1'").orderBy("rank").collect()]
        assert got == ["alpha", "zeta"]  # equal tfidf -> lexicographic


class TestPackDocuments:
    def test_streams_are_contiguous_and_chunked(self, spark):
        """Within every shard the doc intervals tile the token stream with no
        gaps/overlaps in md5 order, and chunk ids are offset//chunk_tokens."""
        from entity_matching_spark.operators.curate import pack_documents

        docs = spark.createDataFrame(
            [(i, " ".join(["tok"] * (3 + i % 7))) for i in range(40)],
            "doc_id int, text string",
        )
        rows = pack_documents(docs, chunk_tokens=10, n_shards=3).collect()
        by_shard: dict = {}
        for r in rows:
            by_shard.setdefault(r["shard"], []).append(r)
        assert set(by_shard) <= {0, 1, 2} and len(rows) == 40
        for shard, rs in by_shard.items():
            rs.sort(key=lambda r: r["start_tok"])
            pos = 0
            for r in rs:
                assert r["start_tok"] == pos          # contiguous, no gaps
                assert r["end_tok"] == pos + r["n_tokens"]
                assert r["first_chunk"] == r["start_tok"] // 10
                assert r["last_chunk"] == (r["end_tok"] - 1) // 10
                pos = r["end_tok"]

    def test_deterministic_and_zero_token_docs(self, spark):
        from entity_matching_spark.operators.curate import pack_documents

        docs = spark.createDataFrame(
            [(1, "a b c"), (2, ""), (3, "   "), (4, "d e"), (5, None)],
            "doc_id int, text string",
        )
        a = sorted(map(tuple, pack_documents(docs, 4, 2).collect()))
        b = sorted(map(tuple, pack_documents(docs, 4, 2).collect()))
        assert a == b
        z = {r["doc_id"]: r for r in pack_documents(docs, 4, 2).collect()}
        assert z[2]["n_tokens"] == 0 and z[2]["start_tok"] == z[2]["end_tok"]
        assert z[2]["first_chunk"] == z[2]["last_chunk"]
        # NULL text = zero tokens (never size(NULL) = -1, which would run
        # the shard cumsum backwards and corrupt every later offset)
        assert z[5]["n_tokens"] == 0 and z[5]["start_tok"] == z[5]["end_tok"]
        for r in z.values():
            assert r["n_tokens"] >= 0 and r["start_tok"] >= 0
            assert r["end_tok"] >= r["start_tok"]
