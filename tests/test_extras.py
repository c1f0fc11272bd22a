"""Dedup family, text analysis, suffix-array, SQL similarity expressions."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lexis_minhash_spark.config import EngineConfig
from lexis_minhash_spark.functions.similarity import (
    char_shingles_expr,
    cosine_expr,
    jaccard_expr,
    overlap_expr,
    shared_bands_expr,
    sig_similarity_expr,
    weighted_overlap_expr,
)
from lexis_minhash_spark.operators import dedup, suffix, textstats

CFG = EngineConfig(seed=12345)


class TestSqlExpressions:
    def test_sig_similarity_expr(self, spark):
        df = spark.createDataFrame(
            [([1, 2, 3, 4], [1, 2, 3, 4]), ([1, 2, 3, 4], [1, 2, 0, 0]), ([], []), ([1], [1, 2])],
            "s1 array<int>, s2 array<int>",
        )
        got = [r[0] for r in df.select(sig_similarity_expr("s1", "s2")).collect()]
        assert got == [1.0, 0.5, 0.0, 0.0]

    def test_overlap_and_jaccard(self, spark):
        df = spark.createDataFrame(
            [([0, 2, 4], [2, 4, 6])], "a array<int>, b array<int>"
        )
        row = df.select(
            overlap_expr("a", "b").alias("o"), jaccard_expr("a", "b").alias("j")
        ).head()
        assert row.o == pytest.approx(2 / 3)
        assert row.j == pytest.approx(2 / 4)

    def test_weighted_overlap_expr(self, spark):
        df = spark.createDataFrame(
            [({"machine": 0.8, "learning": 0.9, "data": 0.5}, {"machine": 0.8, "learning": 0.6, "model": 0.7})],
            "a map<string,double>, b map<string,double>",
        )
        got = df.select(weighted_overlap_expr("a", "b")).head()[0]
        assert got == pytest.approx((0.8 + 0.6) / 2.1)

    def test_shared_bands_expr(self, spark):
        df = spark.createDataFrame([([1, 2, 3], [1, 0, 3])], "a array<long>, b array<long>")
        assert df.select(shared_bands_expr("a", "b")).head()[0] == 2

    def test_cosine_expr(self, spark):
        df = spark.createDataFrame([([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])], "a array<double>, b array<double>")
        got = [r[0] for r in df.select(cosine_expr("a", "b")).collect()]
        assert got[0] == pytest.approx(1.0)
        assert got[1] == pytest.approx(0.0)

    def test_char_shingles_expr(self, spark):
        df = spark.createDataFrame([("Hello",), ("ab",)], "text string")
        got = [r[0] for r in df.select(char_shingles_expr("text", 3)).collect()]
        assert got[0] == ["hel", "ell", "llo"]
        assert got[1] == []


class TestDedup:
    def test_exact_duplicate_groups(self, spark):
        df = spark.createDataFrame(
            [(1, "same text"), (2, "same text"), (3, "other"), (4, "same text")],
            "doc_id long, text string",
        )
        groups = dedup.exact_duplicate_groups(df).collect()
        assert len(groups) == 1
        assert groups[0].doc_ids == [1, 2, 4] and groups[0].keeper == 1
        kept = {r.doc_id for r in dedup.exact_dedup(df).collect()}
        assert kept == {1, 3}

    def test_ngram_jaccard_pairs(self, spark):
        df = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "the quick brown fox jumps over the lazy cat"),
                (3, "completely different words entirely here now"),
            ],
            "doc_id long, text string",
        )
        pairs = dedup.ngram_jaccard_pairs(df, n=3, threshold=0.3).collect()
        got = {(r.a, r.b): r.jaccard for r in pairs}
        assert (1, 2) in got
        assert (1, 3) not in got
        # exact check: 7 distinct trigrams each; all shared except the one
        # containing the last word → inter=6, union=8, jaccard=0.75
        assert got[(1, 2)] == pytest.approx(6 / 8, abs=1e-6)

    def test_simhash_pairs(self, spark):
        df = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog and runs away"),
                (2, "the quick brown fox jumps over the lazy dog and runs home"),
                (3, "completely unrelated text about cooking pasta with tomato sauce"),
            ],
            "doc_id long, text string",
        )
        sim = dedup.with_simhash(df, CFG)
        # near-dup transcripts land at hamming ~10-15 on full-entropy
        # 64-bit fingerprints; 16 blocks guarantee recall to distance 15
        pairs = dedup.simhash_candidate_pairs(
            sim, num_blocks=16, max_hamming=15
        ).collect()
        got = {(r.a, r.b) for r in pairs}
        assert (1, 2) in got
        assert (1, 3) not in got and (2, 3) not in got

    def test_embedding_cosine_pairs_and_topk(self, spark):
        df = spark.createDataFrame(
            [
                (1, [1.0, 0.0, 0.0], 0),
                (2, [0.999, 0.04, 0.0], 0),
                (3, [0.0, 1.0, 0.0], 0),
                (4, [1.0, 0.0, 0.0], 1),
            ],
            "vec_id long, embedding array<float>, label int",
        )
        pairs = {(r.a, r.b) for r in dedup.embedding_cosine_pairs(df, threshold=0.95).collect()}
        assert (1, 2) in pairs and (1, 4) in pairs and (1, 3) not in pairs
        blocked = {(r.a, r.b) for r in dedup.embedding_cosine_pairs(df, threshold=0.95, block_col="label").collect()}
        assert (1, 2) in blocked and (1, 4) not in blocked
        topk = dedup.cosine_topk(df, [1.0, 0.0, 0.0], k=2).collect()
        assert [r.vec_id for r in topk] == [1, 4]

    def test_lsh_bucketed_cosine_recall(self, spark):
        rng = np.random.default_rng(7)
        base = rng.standard_normal((40, 16)).astype(np.float32)
        rows = []
        vid = 0
        for i in range(40):
            rows.append((vid, base[i].tolist())); vid += 1
            if i % 4 == 0:  # planted near-dup
                rows.append((vid, (base[i] + rng.standard_normal(16).astype(np.float32) * 0.01).tolist())); vid += 1
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        exact = {(r.a, r.b) for r in dedup.embedding_cosine_pairs(df, threshold=0.99).collect()}
        approx = {(r.a, r.b) for r in dedup.lsh_bucketed_cosine_pairs(df, dim=16, threshold=0.99, n_planes=8, n_tables=6).collect()}
        assert approx <= exact
        assert len(approx) >= 0.8 * len(exact)


class TestTextStats:
    def test_token_counts(self, spark):
        df = spark.createDataFrame([(1, "Hello, world! 42 times"), (2, "")], "doc_id long, text string")
        rows = {r.doc_id: r for r in textstats.with_token_counts(df).collect()}
        assert rows[1].n_words == 4
        # Hello , world ! 42 times → 6 sub-tokens
        assert rows[1].n_subword_tokens == 6
        assert rows[2].n_words == 0

    def test_quality(self, spark):
        df = spark.createDataFrame(
            [(1, "The quick brown fox jumps over the lazy dog."), (2, "x")],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r for r in textstats.with_quality(df).collect()}
        assert rows[1].n_words == 9
        assert rows[1].stopword_ratio == pytest.approx(2 / 9, abs=1e-6)
        assert rows[1].quality_keep is True
        assert rows[2].quality_keep is False

    def test_langid(self, spark):
        df = spark.createDataFrame(
            [
                (1, "the cat and the dog of the house"),
                (2, "der hund und die katze ist hier"),
                (3, "zzz qqq www"),
            ],
            "doc_id long, text string",
        )
        rows = {r.doc_id: r.lang_pred for r in textstats.with_langid(df).collect()}
        assert rows[1] == "en" and rows[2] == "de" and rows[3] == "und"

    def test_fingerprint_deterministic(self, spark):
        df = spark.createDataFrame([(1, "some document text"), (2, "some document text"), (3, "different")], "doc_id long, text string")
        rows = {r.doc_id: r.fingerprint for r in textstats.with_fingerprint(df).collect()}
        assert rows[1] == rows[2] != rows[3]


class TestSuffixArray:
    def test_exact_substring_matches(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "xxxx the shared exact substring sequence here yyyy"),
                (2, "zzzz the shared exact substring sequence here wwww"),
                (3, "totally unrelated content without overlap aaaa"),
            ],
            "doc_id long, text string",
        )
        groups = spark.createDataFrame([(1, 10), (2, 10), (3, 10)], "doc_id long, cluster_id long")
        m = suffix.exact_substring_matches(docs, groups, min_len=20, emit_substring=True).collect()
        assert len(m) == 1
        row = m[0]
        assert (row.a, row.b) == (1, 2)
        assert "the shared exact substring sequence here" in row.substring
        assert row.common_len >= 40

    def test_singleton_groups_skipped(self, spark):
        docs = spark.createDataFrame([(1, "abc def ghi jkl")], "doc_id long, text string")
        groups = spark.createDataFrame([(1, 5)], "doc_id long, cluster_id long")
        assert suffix.exact_substring_matches(docs, groups, min_len=3).count() == 0
