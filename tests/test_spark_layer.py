"""Spark-layer tests: extraction operator, chunked resumable job, and the
training-data operators, on a shared local session."""

import os

import pytest
from pyspark.sql import functions as F

from go_boilerpipe_spark.operators import dedup, similarity
from go_boilerpipe_spark.operators.extract import extract_articles
from go_boilerpipe_spark.operators.multimodal import decode_media
from go_boilerpipe_spark.plans.extract_job import ExtractJob, read_extracted
from go_boilerpipe_spark.sources.pages import (
    golden_df,
    synthesize_pages,
    write_pages_table,
)
from go_boilerpipe_spark.spark_session import build_session


@pytest.fixture(scope="module")
def spark():
    s = build_session(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("corpus") / "pages")
    write_pages_table(spark, path, 140, skew=True, null_html_every=35)
    return path


def test_skew_mode_urls_stay_unique(spark):
    # ADVICE r1: skew mode remapped d but kept k=id//7, colliding on (d,k)
    pages = synthesize_pages(spark, 200, skew=True, partitions=4)
    assert pages.select("url").distinct().count() == 200


class TestExtractOperator:
    def test_golden_parity_through_spark(self, spark, corpus):
        pages = spark.read.parquet(corpus).filter(F.col("html").isNotNull())
        extracted = extract_articles(pages, parallelism=16)
        g = golden_df(spark)
        base = extracted.withColumn(
            "base_url", F.regexp_replace("url", r"[?&]rep=\d+$", "")
        )
        row = (
            base.join(F.broadcast(g), base.base_url == g.url)
            .agg(
                F.avg((F.col("content") == F.col("exp_content")).cast("int")).alias("ok"),
                F.avg((F.col("title") == F.col("exp_title")).cast("int")).alias("tok"),
                F.count("*").alias("n"),
            )
            .collect()[0]
        )
        assert row["n"] == 136  # 140 - 4 nulls
        assert row["ok"] == 1.0
        assert row["tok"] == 1.0

    def test_partitioning_invariance(self, spark, corpus):
        pages = spark.read.parquet(corpus).filter(F.col("html").isNotNull())
        checksum = lambda df: df.agg(  # noqa: E731
            F.sum(
                F.conv(F.substring(F.md5(F.col("content").cast("binary")), 1, 8), 16, 10)
                .cast("long")
            )
        ).collect()[0][0]
        a = checksum(extract_articles(pages, parallelism=3))
        b = checksum(extract_articles(pages, parallelism=17))
        c = checksum(extract_articles(pages, repartition=False))
        assert a == b == c

    def test_column_pruning_reaches_scan(self, spark, corpus):
        pages = spark.read.parquet(corpus)
        plan = extract_articles(pages)._jdf.queryExecution().executedPlan().toString()
        assert "ReadSchema: struct<url:string,html:binary>" in plan

    def test_invalid_utf8_page_survives(self):
        # ADVICE r1 (high): a raw 0xFF in <title>/body used to raise
        # UnicodeEncodeError inside pa.array() and kill the Arrow batch.
        import pyarrow as pa

        from go_boilerpipe_spark.kernel.document import extract_article
        from go_boilerpipe_spark.operators.extract import extract_record_batches

        bad = (
            b"<html><head><title>bad \xff title</title></head><body>"
            b"<p>seven words of real body text \xfe\xff here to pass the "
            b"minimum plus some more words so the classifier keeps it as "
            b"content for sure definitely</p></body></html>"
        )
        # kernel contract: binary garbage must return a Document, never raise
        doc = extract_article(bad)
        assert doc.title.startswith("bad ")

        batch = pa.RecordBatch.from_arrays(
            [
                pa.array(["http://x.test/bad", "http://x.test/ok"]),
                pa.array([bad, b"<html><body><p>plain ok page with enough "
                               b"words to form one content block right here "
                               b"today definitely absolutely because the "
                               b"number of words rules classifier wants a "
                               b"reasonably dense block of prose before it "
                               b"will mark anything as content at all"
                               b"</p></body></html>"],
                         pa.binary()),
            ],
            names=["url", "html"],
        )
        out = list(extract_record_batches(iter([batch])))
        assert sum(b.num_rows for b in out) == 2
        rows = {u: (t, c, e) for u, t, c, e in zip(
            out[0].column("url").to_pylist(),
            out[0].column("title").to_pylist(),
            out[0].column("content").to_pylist(),
            out[0].column("parse_error").to_pylist(),
        )}
        t, c, e = rows["http://x.test/bad"]
        assert e is None and "�" in t and "�" in c
        # outputs are valid UTF-8 (encodable strictly)
        t.encode("utf-8"); c.encode("utf-8")
        _, c_ok, e_ok = rows["http://x.test/ok"]
        assert e_ok is None and "plain ok page" in c_ok

    def test_adversarial_docs_through_operator(self, spark):
        # the named adversarial classes (attribute bombs, deep nesting,
        # long entities/tokens, lone-surrogate-dense) must flow through
        # the mapInArrow operator end-to-end: one row per doc, zero
        # parse_error, every output string valid UTF-8 for Arrow
        from tests.adversarial_inputs import adversarial_classes

        docs = [d for cls in adversarial_classes().values() for d in cls]
        rows = [
            (f"http://adv.test/{i}", d.encode("utf-8", "surrogateescape"))
            for i, d in enumerate(docs)
        ]
        df = spark.createDataFrame(rows, "url string, html binary")
        out = extract_articles(df, repartition=False).collect()
        assert len(out) == len(docs)
        errs = [r for r in out if r["parse_error"] is not None]
        assert not errs, errs[:3]
        for r in out:
            for col in ("title", "content"):
                if r[col] is not None:
                    r[col].encode("utf-8")

    def test_null_html_yields_error_row(self, spark):
        pages = synthesize_pages(spark, 14, null_html_every=2, partitions=2)
        out = extract_articles(pages, repartition=False)
        errs = out.filter(F.col("parse_error").isNotNull()).count()
        assert errs == 7


class TestExtractLinks:
    def test_links_through_spark(self, spark, corpus):
        from go_boilerpipe_spark.operators.links import extract_links_df

        pages = spark.read.parquet(corpus)
        links = extract_links_df(pages, parallelism=8)
        per_page = {
            r["url"]: r["n"]
            for r in links.groupBy("url").agg(F.count("*").alias("n")).collect()
        }
        # every replica of golden doc 1 carries its 128 anchors
        doc1 = [u for u in per_page if "lease-no-rent" in u]
        assert doc1 and all(per_page[u] == 128 for u in doc1)
        # null-html rows contribute no links and kill no tasks
        assert links.filter(F.col("href").isNull()).count() == 0
        # resolved links parse to hosts JVM-side
        hosts = (
            links.select(
                F.try_parse_url("resolved", F.lit("HOST")).alias("h")
            ).filter(F.col("h").isNotNull()).distinct().count()
        )
        assert hosts > 1

    def test_link_graph_feeds_pagerank(self, spark, corpus):
        # composition: pages -> edges -> pagerank, all DataFrame algebra
        from go_boilerpipe_spark.operators import graph
        from go_boilerpipe_spark.operators.links import extract_links_df

        pages = spark.read.parquet(corpus)
        links = extract_links_df(pages, parallelism=8)
        edges = links.select(
            F.try_parse_url("url", F.lit("HOST")).alias("src"),
            F.try_parse_url("resolved", F.lit("HOST")).alias("dst"),
        ).filter(F.col("dst").isNotNull())
        ranks = graph.pagerank(edges, iters=2).collect()
        assert len(ranks) > 1
        assert all(r["rank"] > 0 for r in ranks)


class TestExtractJob:
    def test_run_and_resume(self, spark, corpus, tmp_path):
        sink = str(tmp_path / "sink")
        job = ExtractJob(spark, corpus, sink, parallelism=8,
                         chunk_target_bytes=1 << 19)
        stats = job.run()
        assert stats["chunks_done"] >= 2
        assert stats["parse_errors"] == 0
        res = read_extracted(spark, sink)
        assert res.count() == 136
        # resume: nothing to redo
        stats2 = job.run()
        assert stats2["chunks_done"] == 0
        assert stats2["chunks_skipped"] == stats["chunks_total"]
        # lineage written per partition per chunk
        lineage = spark.read.parquet(os.path.join(sink, "_lineage"))
        assert lineage.count() > 0
        assert lineage.agg(F.sum("docs_out")).collect()[0][0] == 136


class TestDedup:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        base = (
            "the quick brown fox jumps over the lazy dog again and again today"
        )
        rows = [
            (0, base),
            (1, base),  # exact dup of 0
            (2, base.replace("today", "tomorrow")),  # near dup
            (3, "completely different content about spark query engines ok"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_exact(self, docs):
        out = {r["doc_id"]: r for r in dedup.exact_dedup(docs).collect()}
        assert out[1]["is_duplicate"] and out[1]["keeper_id"] == 0
        assert not out[0]["is_duplicate"]
        assert not out[3]["is_duplicate"]

    def test_minhash_lsh_finds_near_dup(self, docs):
        pairs = {
            (r["id_a"], r["id_b"])
            for r in dedup.minhash_lsh_pairs(docs, num_hashes=8, bands=8).collect()
        }
        assert (0, 1) in pairs  # identical docs always collide
        assert (0, 2) in pairs or (1, 2) in pairs  # near dup collides in ≥1 band
        assert (0, 3) not in pairs

    def test_simhash_identical_and_near(self, docs):
        sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
        assert sh[0] == sh[1]
        ham = bin(sh[0] ^ sh[2]).count("1")
        assert 0 < ham <= 20
        assert bin(sh[0] ^ sh[3]).count("1") > ham

    def test_jaccard_verify(self, docs):
        pairs = dedup.minhash_lsh_pairs(docs, num_hashes=8, bands=8)
        out = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup.jaccard_verify_pairs(docs, pairs, threshold=0.5).collect()
        }
        assert out[(0, 1)] == 1.0
        assert all(j >= 0.5 for j in out.values())

    def test_jaccard_prune_candidates_identical(self, docs):
        # r5: the materialized-pairs prune path (shingles only for docs
        # appearing in a candidate pair) must give identical results
        pairs = dedup.minhash_lsh_pairs(docs, num_hashes=8, bands=8)
        pairs = pairs.persist()
        try:
            base = sorted(map(tuple, dedup.jaccard_verify_pairs(
                docs, pairs, threshold=0.5).collect()))
            pruned = sorted(map(tuple, dedup.jaccard_verify_pairs(
                docs, pairs, threshold=0.5, prune_candidates=True
            ).collect()))
            assert pruned == base and base
        finally:
            pairs.unpersist()

    def test_simhash_batched_bit_identical(self, spark):
        # r5: the map-side Arrow SimHash must equal the explode/56-agg
        # plan exactly, including tokenizer edges, tie votes, and the
        # null-text row-absence semantics
        rows = [
            (0, "the quick brown fox"),
            (1, "the quick brown fox"),
            (2, "a\tb\nc\x0bd\fe\rf g"),
            (3, ""),
            (4, "   "),
            (5, "x y"),                      # NBSP not a separator
            (6, None),                       # absent from BOTH outputs
            (7, "汉字 token mix"),
            (8, "  spaced   out  "),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        for bits in (56, 32):
            jvm = sorted(map(tuple, dedup.simhash(
                docs, bits=bits, use_arrow=False).collect()))
            arrow = sorted(map(tuple, dedup.simhash(
                docs, bits=bits, use_arrow=True).collect()))
            assert arrow == jvm, bits
            assert all(r[0] != 6 for r in arrow)  # null text dropped

    def test_minhash_iter_kernel_matches_batch_kernel(self):
        # r6: the per-partition iterator kernel (cross-doc shingle-digest
        # dedup) must equal the original per-batch kernel byte-for-byte,
        # across arrow-batch boundaries and with the cache cap exercised
        # (past the cap digests are computed per occurrence — values must
        # not change).
        import random

        import pandas as pd

        from go_boilerpipe_spark.operators import dedup as dd

        rng = random.Random(7)
        vocab = ["alpha", "beta", "gamma", "delta", "x", "汉字", "a b"]
        texts = [None, "", "   ", "a\tb\nc\x0bd\fe\rf g", "\tlead trail\t"]
        texts += [
            " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40)))
            for _ in range(800)
        ]
        s = pd.Series(texts, dtype="object")
        for nh, sn in ((12, 3), (8, 2)):
            ref = list(dd._minhash_kernel_factory(nh, sn)(s))
            batches = [s[i : i + 97] for i in range(0, len(s), 97)]
            got = list(
                pd.concat(
                    list(dd._minhash_kernel_iter_factory(nh, sn)(iter(batches))),
                    ignore_index=True,
                )
            )
            assert got == ref, (nh, sn)
        # cache-cap path: cap of 3 forces most shingles down the uncached
        # branch; output must be identical
        orig = dd._MINHASH_CACHE_CAP
        try:
            dd._MINHASH_CACHE_CAP = 3
            capped = list(
                pd.concat(
                    list(dd._minhash_kernel_iter_factory(12, 3)(iter([s]))),
                    ignore_index=True,
                )
            )
        finally:
            dd._MINHASH_CACHE_CAP = orig
        assert capped == list(dd._minhash_kernel_factory(12, 3)(s))

    def test_jaccard_verify_arrow_identical(self, spark):
        # r6: the Arrow shingle-set kernel must produce the same verify
        # OUTPUT (jaccard rows) as the Catalyst HOF path — the arrays
        # are consumed as sets, so element order is free but membership
        # must be exact.
        rows = [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy cat"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "one two"), (4, "completely different text entirely here"),
            (5, "  spaced   out  "), (6, "a\tb\nc d e f g h"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = spark.createDataFrame(
            [(0, 1), (0, 2), (1, 2), (0, 4), (3, 5)],
            "id_a long, id_b long",
        )
        for prune in (False, True):
            jvm = sorted(map(tuple, dedup.jaccard_verify_pairs(
                docs, pairs, threshold=0.1, prune_candidates=prune,
                use_arrow=False).collect()))
            arrow = sorted(map(tuple, dedup.jaccard_verify_pairs(
                docs, pairs, threshold=0.1, prune_candidates=prune,
                use_arrow=True).collect()))
            assert arrow == jvm, prune

    def test_winnow_arrow_bit_identical(self, spark):
        # r6: the Arrow winnowing kernel must equal the pure-Catalyst
        # plan byte-for-byte on every tokenization edge, including the
        # null-text case where the JVM's array_join SKIPS the null
        # minimum and md5-hashes the empty string.
        rows = [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "one two"),
            (2, "single"),
            (3, ""),
            (4, "   "),
            (5, "a\tb\nc\x0bd\fe\rf g"),
            (6, "a b c d"),
            (7, "x y z x y z x y z"),
            (8, "汉字 token mix 汉字 token mix extra"),
            (9, "\tleading and trailing\t"),
            (10, None),
            (11, "  spaced   out   tokens   here  "),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        for sn, w in ((3, 4), (2, 3), (5, 2)):
            jvm = sorted(map(tuple, dedup.winnow_fingerprint(
                docs, shingle_n=sn, window=w, use_arrow=False).collect()))
            arrow = sorted(map(tuple, dedup.winnow_fingerprint(
                docs, shingle_n=sn, window=w, use_arrow=True).collect()))
            assert arrow == jvm, (sn, w)

    def test_minhash_batched_bit_identical(self, spark):
        # VERDICT r4 item 2: the Arrow-batched signature kernel must equal
        # the pure-Catalyst explode/min-agg plan byte-for-byte on every
        # tokenization edge: short docs (< n tokens), empty + space-only
        # text, tab/newline/vertical-tab separators, non-breaking space
        # (NOT a Java \s separator), duplicate shingles, unicode text,
        # leading whitespace after trim, and null text.
        rows = [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "one two"),                       # < shingle_n tokens
            (3, "single"),
            (4, ""),
            (5, "   "),
            (6, "a\tb\nc\x0bd\fe\rf g"),          # every Java \s char
            (7, "a b c d"),                  # NBSP is NOT a separator
            (8, "x y z x y z x y z"),             # duplicate shingles
            (9, "汉字 token mix 汉字 token mix extra"),
            (10, "\tleading and trailing\t"),     # trim strips spaces only
            (11, None),
            (12, "  spaced   out   tokens   here  "),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        for nh, sn in ((12, 3), (8, 2)):
            jvm = sorted(map(tuple, dedup.minhash_signatures(
                docs, num_hashes=nh, shingle_n=sn, use_arrow=False
            ).collect()))
            arrow = sorted(map(tuple, dedup.minhash_signatures(
                docs, num_hashes=nh, shingle_n=sn, use_arrow=True
            ).collect()))
            assert arrow == jvm, (nh, sn)


class TestSimilarity:
    def test_ivf_cells_staged_vnorm_identical(self, spark):
        # r6: ivf_cells accepts a pre-staged vector norm so the fold is
        # not re-evaluated per centroid; both paths must pick identical
        # cells (same dot/(na*nb) op order), including duplicated (tie)
        # vectors. (Zero-norm vectors raise under ANSI on both paths —
        # pre-existing _cosine behavior, not exercised here.)
        import math

        rows = [(i, [math.sin(i * 3.0 + j) for j in range(8)])
                for i in range(40)]
        rows += [(41, [1.0] * 8), (42, [1.0] * 8)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        cents = spark.createDataFrame(
            [(c, [math.cos(c * 5.0 + j) for j in range(8)]) for c in range(4)],
            "cid long, cvec array<float>",
        )
        packed = similarity.centroids_struct(cents)
        base = emb.crossJoin(packed)
        inline = base.select(
            "vec_id",
            similarity.ivf_cells(
                F.col("embedding"), F.col("_cents"), 2
            ).alias("cells"),
        )
        staged = base.select(
            "vec_id", "embedding", "_cents",
            similarity._sq_norm_root(F.col("embedding")).alias("_vn"),
        ).select(
            "vec_id",
            similarity.ivf_cells(
                F.col("embedding"), F.col("_cents"), 2, vnorm=F.col("_vn")
            ).alias("cells"),
        )
        assert sorted(map(tuple, inline.collect())) == sorted(
            map(tuple, staged.collect())
        )

    def test_panel_matches_per_arm_composition(self, spark):
        # r6: cosine_topk_panel must return row-for-row what running the
        # three arms separately returns (same candidates per method, same
        # scorer/rounding, per-method window) — including bucket
        # collisions across methods and the k cutoff.
        import math

        rows = [(i, [math.sin(i * 7.0 + j) for j in range(8)])
                for i in range(60)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        q = emb.filter(F.col("vec_id") < 4).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        cents = emb.filter(F.col("vec_id").between(5, 8)).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
        )
        e = similarity.with_lsh_bucket(emb, h=8)
        panel = similarity.cosine_topk_panel(
            e, q,
            arms=[("m_lsh1", "lsh", 1), ("m_lsh2", "lsh", 2),
                  ("m_ivf", "ivf", 2)],
            centroids=cents, k=5, h=8, bucket_col="bucket",
        ).collect()
        got = sorted(map(tuple, panel))
        exp = []
        for m, df in [
            ("m_lsh1", similarity.cosine_topk_lsh_multiprobe(
                e, q, k=5, h=8, flips=1, bucket_col="bucket")),
            ("m_lsh2", similarity.cosine_topk_lsh_multiprobe(
                e, q, k=5, h=8, flips=2, bucket_col="bucket")),
            ("m_ivf", similarity.cosine_topk_ivf(
                e, q, cents, k=5, nprobe=2)),
        ]:
            exp += [(m, *r) for r in map(tuple, df.collect())]
        assert got == sorted(exp)

    def test_self_is_rank_one(self, spark):
        import math

        rows = [
            (i, [math.sin(i * 7.0 + j) for j in range(8)]) for i in range(30)
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        q = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        top = similarity.cosine_topk(emb, q, k=3).collect()
        rank1 = {r["query_id"]: r["vec_id"] for r in top if r["rank"] == 1}
        assert rank1 == {0: 0, 1: 1, 2: 2}

    def test_lsh_bucket_recall_of_self(self, spark):
        rows = [(i, [float(i + 1), float(-i - 1), 1.0, -1.0]) for i in range(10)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        q = emb.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        top = similarity.cosine_topk_lsh(emb, q, k=1, h=4).collect()
        assert {r["query_id"]: r["vec_id"] for r in top} == {i: i for i in range(10)}


class TestScaleHardening:
    """VERDICT r1 items 2/3/8: LSH duplicate-cluster cap, broadcast-IVF,
    Rademacher sign-LSH."""

    def test_capped_lsh_bounds_duplicate_cluster(self, spark):
        # 30 byte-identical docs + 2 distinct: without pre-dedup the cluster
        # alone yields C(30,2)=435 pairs; capped+deduped yields none of them
        base = "the quick brown fox jumps over the lazy dog again today"
        rows = [(i, base) for i in range(30)]
        rows += [(100, base.replace("today", "tomorrow")),
                 (101, "completely unrelated text about query engines here")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = dedup.minhash_lsh_pairs_capped(
            docs, num_hashes=8, bands=8, max_bucket_size=8
        ).collect()
        ids = {(r["id_a"], r["id_b"]) for r in pairs}
        # only the keeper (doc 0) survives the exact-dedup; near-dup found
        assert (0, 100) in ids
        assert all(a == 0 or a >= 100 for a, _ in ids), ids
        assert len(ids) <= 3

    def test_dropped_bucket_audit(self, spark):
        docs = spark.createDataFrame(
            [(i, "same text for every doc here") for i in range(20)],
            "doc_id long, text string",
        )
        dropped = dedup.lsh_dropped_buckets(
            docs, num_hashes=8, bands=8, max_bucket_size=5
        ).collect()
        assert dropped and all(r["n_docs"] == 20 for r in dropped)

    def test_sign_lsh_spreads_all_positive_vectors(self, spark):
        # post-ReLU-style (all-positive) embeddings: the old first-h-signs
        # bucketer mapped EVERY vector to bucket 2^h-1; the Rademacher
        # projection must spread them
        import random

        rng = random.Random(7)
        rows = [
            (i, [rng.uniform(0.01, 2.0) for _ in range(32)]) for i in range(60)
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        buckets = (
            emb.select(similarity.sign_lsh_bucket(F.col("embedding"), 8).alias("b"))
            .distinct()
            .count()
        )
        assert buckets >= 8, f"only {buckets} distinct buckets"
        # the Arrow-batched projection must spread them identically
        buckets_b = (
            emb.select(
                similarity.sign_lsh_bucket_batched(F.col("embedding"), 8).alias("b")
            )
            .distinct()
            .count()
        )
        assert buckets_b == buckets

    def test_sign_lsh_batched_bit_identical(self, spark):
        # VERDICT r2 item 2: the numpy path must produce the SAME bucket as
        # the Catalyst fold for every vector — same signs, same float64
        # accumulation order. Mixed dims, all-positive, zero, and null
        # vectors included.
        import math
        import random

        rng = random.Random(42)
        rows = []
        for i in range(200):
            d = rng.choice([8, 32, 64])
            rows.append(
                (i, [rng.uniform(-1, 1) for _ in range(d)])
            )
        rows += [
            (200, [0.5] * 16),              # all-positive
            (201, [0.0] * 16),              # zero vector
            (202, []),                      # empty
            (203, None),                    # null
            (204, [math.pi * 1e-8] * 64),   # tiny magnitudes
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        got = (
            emb.select(
                "vec_id",
                similarity.sign_lsh_bucket(F.col("embedding"), 8).alias("bc"),
                similarity.sign_lsh_bucket_batched(F.col("embedding"), 8).alias("bb"),
            )
            .collect()
        )
        for r in got:
            assert r["bb"] == r["bc"], (r["vec_id"], r["bb"], r["bc"])

    def test_cosine_batched_bit_identical(self, spark):
        # same contract for the pair-scoring cosine: numpy path must equal
        # the Catalyst fold bit-for-bit (null/mismatched pairs → NULL)
        import random

        rng = random.Random(13)
        rows = []
        for i in range(150):
            d = rng.choice([8, 32])
            rows.append(
                (i,
                 [rng.uniform(-1, 1) for _ in range(d)],
                 [rng.uniform(-1, 1) for _ in range(d)])
            )
        rows += [
            (150, [1.0, 2.0], [1.0, 2.0, 3.0]),  # length mismatch → NULL
            (151, None, [1.0]),                  # null → NULL
            (152, [0.25] * 8, [0.25] * 8),       # identical → 1.0
        ]
        df = spark.createDataFrame(
            rows, "i long, a array<float>, b array<float>"
        )
        got = df.select(
            "i",
            similarity._cosine(F.col("a"), F.col("b")).alias("cf"),
            similarity.cosine_batched(F.col("a"), F.col("b")).alias("cb"),
        ).collect()
        for r in got:
            assert r["cb"] == r["cf"] or (
                r["cb"] is None and r["cf"] is None
            ), (r["i"], r["cb"], r["cf"])

    def test_stored_bucket_col_matches_derived(self, spark):
        # VERDICT r3 item 3: a stored with_lsh_bucket column consumed via
        # bucket_col must give the SAME results as in-plan derivation for
        # every sign-LSH consumer (same h → same buckets → same joins).
        import random

        from go_boilerpipe_spark.operators import dedup

        rng = random.Random(99)
        rows = [
            (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(80)
        ]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        q = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        staged = similarity.with_lsh_bucket(emb, h=8)

        for fn in (similarity.cosine_topk_lsh,
                   similarity.cosine_topk_lsh_multiprobe):
            derived = sorted(map(tuple, fn(emb, q, k=5, h=8).collect()))
            stored = sorted(
                map(tuple, fn(staged, q, k=5, h=8, bucket_col="bucket").collect())
            )
            assert stored == derived, fn.__name__

        d_pairs = sorted(map(tuple, dedup.embedding_near_dup_pairs(
            emb, threshold=0.3).collect()))
        s_pairs = sorted(map(tuple, dedup.embedding_near_dup_pairs(
            staged, threshold=0.3, bucket_col="bucket").collect()))
        assert s_pairs == d_pairs

    def test_stored_bucket_h_mismatch_fails_fast(self, spark, tmp_path):
        # ADVICE r4: a stored bucket built with one h consumed by a query
        # side using another h silently empties the join — the recorded
        # lsh_h metadata must make every consumer raise instead.
        import pytest as _pytest

        from go_boilerpipe_spark.operators import dedup

        emb = spark.createDataFrame(
            [(i, [float(i), 1.0 - i]) for i in range(8)],
            "vec_id long, embedding array<float>",
        )
        q = emb.limit(1).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        staged = similarity.with_lsh_bucket(emb, h=8)
        assert staged.schema["bucket"].metadata["lsh_h"] == 8

        # metadata survives a parquet round trip — the 10^9-vector case
        # is a bucket column written at ingest and read back much later
        p = str(tmp_path / "emb_bucketed")
        staged.write.mode("overwrite").parquet(p)
        reread = spark.read.parquet(p)
        assert reread.schema["bucket"].metadata["lsh_h"] == 8

        for consumer in (
            lambda df: similarity.cosine_topk_lsh(
                df, q, k=3, h=12, bucket_col="bucket"),
            lambda df: similarity.cosine_topk_lsh_multiprobe(
                df, q, k=3, h=12, bucket_col="bucket"),
            lambda df: dedup.embedding_near_dup_pairs(
                df, h=12, bucket_col="bucket"),
        ):
            with _pytest.raises(ValueError, match="h=8"):
                consumer(reread)
        # matching h passes through unchanged
        assert similarity.cosine_topk_lsh(
            reread, q, k=3, h=8, bucket_col="bucket"
        ).count() >= 1

    def test_ivf_broadcast_centroids_no_collect(self, spark):
        import math

        rows = [(i, [math.sin(i * 3.1 + j) for j in range(8)]) for i in range(40)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        cents = emb.filter(F.col("vec_id") >= 36).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
        )
        q = emb.filter(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        top = similarity.cosine_topk_ivf(emb, q, cents, k=3, nprobe=2).collect()
        rank1 = {r["query_id"]: r["vec_id"] for r in top if r["rank"] == 1}
        # each query's own vector lives in its own assigned cell → rank 1
        assert rank1 == {0: 0, 1: 1, 2: 2}


class TestMultimodal:
    def test_decode_schema_and_determinism(self, spark):
        rows = [(i, bytearray(f"payload-{i}".encode()), "image") for i in range(6)]
        df = spark.createDataFrame(
            rows, "doc_id long, payload binary, media_type string"
        )
        out = decode_media(df).collect()
        assert len(out) == 6
        byid = {r["doc_id"]: r for r in out}
        assert byid[0]["width"] >= 64 and byid[0]["height"] >= 64
        out2 = {r["doc_id"]: r for r in decode_media(df).collect()}
        assert out2[3] == byid[3]


class TestCuration:
    def test_duplicate_clusters_chain_and_singleton(self, spark):
        # chain 1-2, 2-3 plus singleton 9: component min propagates the
        # full chain even though 1 and 3 never share a pair
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
        )
        ids = spark.createDataFrame([(i,) for i in (1, 2, 3, 5, 6, 9)],
                                    "doc_id long")
        out = {r["doc_id"]: r["cluster_id"]
               for r in dedup.duplicate_clusters(pairs, ids).collect()}
        assert out == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5, 9: 9}

    def test_duplicate_clusters_chain_logn_rounds(self, spark):
        # VERDICT r2 item 3: a 100-doc pairwise-chained dup cluster must
        # converge in O(log n) rounds (min-label propagation needs ~100)
        n = 100
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
        )
        ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
        # local_threshold=0 forces the distributed star rounds (the
        # driver-local union-find fast path would otherwise absorb a
        # 99-edge graph)
        out = {r["doc_id"]: r["cluster_id"]
               for r in dedup.duplicate_clusters(
                   pairs, ids, local_threshold=0).collect()}
        assert out == {i: 0 for i in range(n)}
        assert dedup.duplicate_clusters.last_path == "star"
        assert dedup.duplicate_clusters.last_rounds <= 10, (
            dedup.duplicate_clusters.last_rounds
        )

    def test_duplicate_clusters_paths_agree(self, spark):
        # the driver-local union-find fast path and the distributed star
        # rounds must produce identical cluster maps
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 13),
             (20, 21)],
            "id_a long, id_b long",
        )
        ids = spark.createDataFrame(
            [(i,) for i in (1, 2, 3, 7, 10, 11, 12, 13, 20, 21)],
            "doc_id long",
        )
        local = {r["doc_id"]: r["cluster_id"]
                 for r in dedup.duplicate_clusters(pairs, ids).collect()}
        assert dedup.duplicate_clusters.last_path == "local"
        star = {r["doc_id"]: r["cluster_id"]
                for r in dedup.duplicate_clusters(
                    pairs, ids, local_threshold=0).collect()}
        assert dedup.duplicate_clusters.last_path == "star"
        assert local == star == {1: 1, 2: 1, 3: 1, 7: 7, 10: 10, 11: 10,
                                 12: 10, 13: 10, 20: 20, 21: 20}

    def test_duplicate_clusters_max_iter_safe(self, spark):
        # ADVICE r3: exhausting max_iter before the star fixpoint must
        # warn and still emit exactly ONE row per id (single-valued map),
        # never duplicate rows with nondeterministic labels
        n = 40
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
        )
        ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
        with pytest.warns(RuntimeWarning, match="fixpoint"):
            rows = dedup.duplicate_clusters(
                pairs, ids, max_iter=1, local_threshold=0
            ).collect()
        assert len(rows) == n
        assert len({r["doc_id"] for r in rows}) == n

    def test_duplicate_clusters_string_ids(self, spark):
        # ADVICE r2: string ids must not hit a decimal cast — the cluster
        # id is the lexicographic min, chains fully merged
        pairs = spark.createDataFrame(
            [("b", "c"), ("c", "d"), ("d", "a2")], "id_a string, id_b string"
        )
        ids = spark.createDataFrame(
            [(x,) for x in ("a2", "b", "c", "d", "zz")], "doc_id string"
        )
        out = {r["doc_id"]: r["cluster_id"]
               for r in dedup.duplicate_clusters(pairs, ids).collect()}
        assert out == {"a2": "a2", "b": "a2", "c": "a2", "d": "a2",
                       "zz": "zz"}

    def test_contamination_indexed_equals_scan(self, spark):
        # the anchor-token inverted join must return EXACTLY the pairs the
        # broadcast-contains scan returns, including mid-word probe
        # starts, whitespace runs, and short probes (fallback branch)
        from go_boilerpipe_spark.operators import curation

        docs = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "prefix quick brown fox suffix"),
                (3, "quick  brown fox double space"),
                (4, "nothing to see here at all"),
                (5, "ick brown fo appears mid word"),
                (6, "singletoken standalone words"),
                (7, " leading space quick brown fox"),
            ],
            "doc_id long, text string",
        )
        probes = spark.createDataFrame(
            [
                (10, "quick brown fox"),      # interior token 'brown'
                (11, "ick brown fo"),         # cut edges, interior 'brown'
                (12, "singletoken"),          # no interior -> fallback
                (13, "zz qq absent phrase"),  # matches nothing
                (14, "quick  brown fox"),     # whitespace run preserved
            ],
            "probe_id long, phrase string",
        )
        scan = {(r["doc_id"], r["probe_id"]) for r in
                curation.contamination_pairs(docs, probes).collect()}
        idx = {(r["doc_id"], r["probe_id"]) for r in
               curation.contamination_pairs_indexed(docs, probes).collect()}
        assert idx == scan
        assert (1, 10) in idx and (6, 12) in idx and (3, 14) in idx
        assert (5, 11) in idx and (2, 10) in idx

    def test_scrub_pii_counts_and_masking(self, spark):
        from go_boilerpipe_spark.operators import curation

        rows = [
            (0, "mail a@b.com and c.d@e.org, ip 10.1.2.3, tel +1 555 0123 99"),
            (1, "no pii here at all"),
            (2, "ip-ish 999.1.1.1 still matches the conservative class"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in curation.scrub_pii(df).collect()}
        assert out[0]["pii_email"] == 2 and out[0]["pii_ipv4"] == 1
        assert out[0]["pii_phone"] == 1 and out[0]["pii_hits"] == 4
        assert "a@b.com" not in out[0]["clean_text"]
        assert "10.1.2.3" not in out[0]["clean_text"]
        assert out[0]["clean_text"].count("<PII>") == 4
        assert out[1]["pii_hits"] == 0
        assert out[1]["clean_text"] == "no pii here at all"
        assert out[2]["pii_ipv4"] == 1  # documented: purely syntactic

    def test_sample_to_mix_deterministic(self, spark):
        from go_boilerpipe_spark.operators import curation

        rows = [(i, "en" if i % 10 < 6 else ("zh" if i % 10 < 9 else "xx"))
                for i in range(1000)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        out = curation.sample_to_mix(df, "lang", {"en": 0.7, "zh": 0.3})
        got = out.collect()
        langs = {r["lang"] for r in got}
        assert "xx" not in langs  # unweighted groups drop
        # binding group (min n/w): en has 600/0.7 < 300/0.3 -> rate 1.0,
        # so EVERY en doc is kept; zh downsampled toward 0.3/0.7 * 600
        n_en = sum(1 for r in got if r["lang"] == "en")
        n_zh = sum(1 for r in got if r["lang"] == "zh")
        assert n_en == 600
        assert 180 <= n_zh <= 330  # binomial around 257
        ids1 = sorted(r["doc_id"] for r in got)
        ids2 = sorted(
            r["doc_id"]
            for r in curation.sample_to_mix(
                df.repartition(17), "lang", {"en": 0.7, "zh": 0.3}
            ).collect()
        )
        assert ids1 == ids2  # partitioning-invariant kept set

    def test_cap_per_host_deterministic(self, spark):
        # r5: per-host cap keeps EXACTLY max_docs on a hot host, the
        # whole tail elsewhere, and the kept subset is identical across
        # partitionings (stable md5 rank, no nondeterministic ordering)
        from go_boilerpipe_spark.operators import curation

        rows = [
            (i, f"https://hot.example.com/p/{i}" if i < 80
             else f"https://h{i % 7}.example.org/p/{i}")
            for i in range(120)
        ]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        kept = curation.cap_per_host(df, F.col("url"), max_docs=10)
        by_host = {
            r["host"]: r["n"]
            for r in kept.groupBy(
                F.regexp_extract("url", "//([^/]+)", 1).alias("host")
            ).agg(F.count("*").alias("n")).collect()
        }
        assert by_host["hot.example.com"] == 10
        assert sum(v for k, v in by_host.items() if k != "hot.example.com") == 40
        ids1 = sorted(r["doc_id"] for r in kept.collect())
        ids2 = sorted(
            r["doc_id"]
            for r in curation.cap_per_host(
                df.repartition(13), F.col("url"), max_docs=10
            ).collect()
        )
        assert ids1 == ids2

    def test_drop_common_lines(self, spark):
        # r5: cross-document boilerplate-line removal — a line over the
        # df threshold is dropped from EVERY doc (unlike segment_dedup's
        # keep-first), empties never count, order is positional, and a
        # doc whose every line is boilerplate vanishes.
        from go_boilerpipe_spark.operators import curation

        rows = [
            (1, "common\nunique one\n\n  common  "),
            (2, "common\nunique two"),
            (3, "common\nunique three"),
            (4, "common"),
            (5, "z line\na line"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r
               for r in curation.drop_common_lines(df, max_df=2).collect()}
        assert 4 not in out  # all-boilerplate doc disappears
        assert out[1]["clean_text"] == "unique one"  # BOTH commons dropped
        assert out[1]["n_kept"] == 1
        assert out[2]["clean_text"] == "unique two"
        assert out[5]["clean_text"] == "z line\na line"  # positional order
        # partitioning invariance of the reassembled text
        out2 = {r["doc_id"]: r["clean_text"]
                for r in curation.drop_common_lines(
                    df.repartition(7), max_df=2).collect()}
        assert out2 == {k: v["clean_text"] for k, v in out.items()}

    def test_pagerank_integer_exact(self, spark):
        # r5: 1 iteration over A->B, A->C, B->C, hand-computed at scale
        # 10^12 with damping 85/100: base = 150e9//3 = 50e9;
        # contrib(B) = (1e12//3)//2 = 166666666666 -> rank(B) =
        # 50e9 + (166666666666*85)//100 = 191666666666;
        # contrib(C) = 166666666666 + 333333333333 -> rank(C) =
        # 50e9 + (499999999999*85)//100 = 474999999999.
        from go_boilerpipe_spark.operators import graph

        edges = spark.createDataFrame(
            [("A", "B"), ("A", "C"), ("B", "C"),
             ("A", "B"),  # duplicate edge: dropped
             ("C", "C")],  # self-loop: dropped
            "src string, dst string",
        )
        expect1 = {"A": 50000000000, "B": 191666666666,
                   "C": 474999999999}
        got = {r["node"]: r["rank"]
               for r in graph.pagerank(edges, iters=1).collect()}
        assert got == expect1
        # hand-computed values hold on the forced distributed path too
        got_d = {r["node"]: r["rank"]
                 for r in graph.pagerank(
                     edges, iters=1, local_threshold=0).collect()}
        assert got_d == expect1
        # more iterations keep the authority ordering and determinism
        # across partitionings
        r3a = {r["node"]: r["rank"]
               for r in graph.pagerank(edges, iters=3).collect()}
        r3b = {r["node"]: r["rank"]
               for r in graph.pagerank(
                   edges.repartition(5), iters=3).collect()}
        assert r3a == r3b
        assert r3a["C"] > r3a["B"] > r3a["A"]

    def test_url_rules_filter(self, spark):
        # r5: robots-style longest-prefix allow/deny — deny-all with a
        # longer allow carve-out, exact tie toward allow, no-rule pass
        from go_boilerpipe_spark.operators import curation

        docs = spark.createDataFrame(
            [
                (1, "https://a.com/private/x"),   # denied (/private/)
                (2, "https://a.com/private/ok/x"),  # allowed (longer)
                (3, "https://a.com/pub"),          # no rule -> pass
                (4, "https://b.com/t"),            # tie -> allow
                (5, "https://c.com/private/x"),    # other host -> pass
                (6, "https://a.com"),              # empty path -> '/' rule?
            ],
            "doc_id long, url string",
        )
        rules = spark.createDataFrame(
            [
                ("a.com", "/private/", False),
                ("a.com", "/private/ok/", True),
                ("b.com", "/t", True),
                ("b.com", "/t", False),
            ],
            "host string, path_prefix string, allow boolean",
        )
        kept = sorted(
            r["doc_id"]
            for r in curation.url_rules_filter(docs, rules).collect()
        )
        assert kept == [2, 3, 4, 5, 6]

    def test_incremental_new_docs(self, spark):
        # r5: cross-snapshot delta — membership against old, but new
        # docs are NOT deduped against each other
        from go_boilerpipe_spark.operators import curation

        old = spark.createDataFrame(
            [(1, "seen"), (2, "also seen"), (3, "seen")],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(10, "seen"), (11, "fresh"), (12, "fresh"), (13, "also seen")],
            "doc_id long, text string",
        )
        kept = sorted(
            r["doc_id"]
            for r in curation.incremental_new_docs(new, old).collect()
        )
        assert kept == [11, 12]  # both 'fresh' copies survive

    def test_drop_common_lines_scoped(self, spark):
        # r5: RefinedWeb semantics — df counted WITHIN a scope (host):
        # a line shared across scopes survives, the same line repeated
        # within one scope drops
        from go_boilerpipe_spark.operators import curation

        rows = [
            (1, "a.com", "chrome\nunique one"),
            (2, "a.com", "chrome\nunique two"),
            (3, "b.com", "chrome\nunique three"),
            (4, "b.com", "other\nunique four"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, host string, text string")
        out = {r["doc_id"]: r["clean_text"]
               for r in curation.drop_common_lines(
                   df, max_df=1, scope_col="host").collect()}
        # 'chrome' df=2 within a.com -> dropped there; df=1 within
        # b.com -> kept there
        assert out[1] == "unique one" and out[2] == "unique two"
        assert out[3] == "chrome\nunique three"
        assert out[4] == "other\nunique four"
        # global form (no scope) drops 'chrome' everywhere
        g = {r["doc_id"]: r["clean_text"]
             for r in curation.drop_common_lines(df, max_df=2).collect()}
        assert g[3] == "unique three"

    def test_drop_common_lines_differential(self, spark):
        # seeded random corpora vs a pure-Python reference of the
        # documented semantics (trim, skip empties, df over distinct
        # docs, drop > max_df everywhere, positional reassembly)
        import random

        from go_boilerpipe_spark.operators import curation

        rng = random.Random(20260817)
        vocab = [f"line {i}" for i in range(12)] + ["", "  ", "\t"]
        rows = [
            (d, "\n".join(rng.choice(vocab)
                          for _ in range(rng.randrange(0, 9))))
            for d in range(60)
        ]
        for max_df in (1, 3, 10):
            # pure reference
            per_doc = {}
            df_count = {}
            for d, text in rows:
                lines = [(p, t.strip()) for p, t in
                         enumerate(text.split("\n")) if t.strip()]
                per_doc[d] = lines
                for t in {t for _p, t in lines}:
                    df_count[t] = df_count.get(t, 0) + 1
            expected = {}
            for d, lines in per_doc.items():
                kept = [t for _p, t in lines if df_count[t] <= max_df]
                if kept:
                    expected[d] = (len(kept), "\n".join(kept))
            got = {
                r["doc_id"]: (r["n_kept"], r["clean_text"])
                for r in curation.drop_common_lines(
                    spark.createDataFrame(rows, "doc_id long, text string"),
                    max_df=max_df,
                ).collect()
            }
            assert got == expected, f"max_df={max_df}"

    def test_duplicated_ngram_stats(self, spark):
        # r5: cross-doc exact-substring audit, hand-computed. A and B
        # are byte-identical short docs (one whole-doc window each); C
        # and D share exactly their first 13-token window; C/D's other
        # two windows are unique.
        from go_boilerpipe_spark.operators import curation

        base = " ".join(f"t{i}" for i in range(1, 14))  # 13 tokens
        docs = spark.createDataFrame(
            [
                (1, "a b c d e f g h i j"),
                (2, "a b c d e f g h i j"),
                (3, base + " c14 c15"),
                (4, base + " d14 d15"),
                (5, "totally unique words " + " ".join(
                    f"u{i}" for i in range(20))),
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (r["total_windows"], r["dup_windows"],
                          r["dup_permille"])
            for r in curation.duplicated_ngram_stats(docs).collect()
        }
        assert got[1] == (1, 1, 1000) and got[2] == (1, 1, 1000)
        assert got[3] == (3, 1, 333) and got[4] == (3, 1, 333)
        assert got[5] == (11, 0, 0)
        # partitioning invariance
        got2 = {
            r["doc_id"]: (r["total_windows"], r["dup_windows"],
                          r["dup_permille"])
            for r in curation.duplicated_ngram_stats(
                docs.repartition(7)).collect()
        }
        assert got2 == got

    def test_pagerank_differential(self, spark):
        # seeded random digraph vs a pure-Python replica of the
        # integer-exact recurrence (same div/floor semantics)
        import random

        from go_boilerpipe_spark.operators import graph
        from go_boilerpipe_spark.operators.graph import RANK_SCALE

        rng = random.Random(7)
        edges = {(rng.randrange(50), rng.randrange(50)) for _ in range(220)}
        edges = [(s, d) for s, d in edges if s != d]

        nodes = sorted({n for e in edges for n in e})
        n = len(nodes)
        outdeg = {}
        for s, _d in edges:
            outdeg[s] = outdeg.get(s, 0) + 1
        rank = {v: RANK_SCALE // n for v in nodes}
        base = (RANK_SCALE * 15 // 100) // n
        for _ in range(3):
            cin = {}
            for s, d in edges:
                cin[d] = cin.get(d, 0) + rank[s] // outdeg[s]
            rank = {v: base + (cin.get(v, 0) * 85) // 100 for v in nodes}

        edf = spark.createDataFrame(edges, "src long, dst long")
        # default gate → driver-local path on this tiny graph
        got_local = {
            r["node"]: r["rank"]
            for r in graph.pagerank(edf, iters=3).collect()
        }
        assert graph.pagerank.last_path == "local"
        assert got_local == rank
        # local_threshold=0 forces the distributed join rounds — both
        # paths must be bit-identical to the replica
        got_dist = {
            r["node"]: r["rank"]
            for r in graph.pagerank(
                edf, iters=3, local_threshold=0
            ).collect()
        }
        assert graph.pagerank.last_path == "joins"
        assert got_dist == rank

    def test_stratified_sample_deterministic(self, spark):
        from go_boilerpipe_spark.operators import curation

        df = spark.createDataFrame(
            [(i, "en" if i % 2 == 0 else "zh") for i in range(200)],
            "doc_id long, lang string",
        )
        a = curation.stratified_sample(df, "lang", {"en": 0.5, "zh": 0.0})
        b = curation.stratified_sample(df, "lang", {"en": 0.5, "zh": 0.0})
        ra = sorted(r["doc_id"] for r in a.collect())
        rb = sorted(r["doc_id"] for r in b.collect())
        assert ra == rb  # same salt → same sample
        assert all(i % 2 == 0 for i in ra)  # zh rate 0 → excluded
        assert 20 <= len(ra) <= 80  # ~50% of 100 en docs
        c = curation.stratified_sample(df, "lang", {"en": 0.5, "zh": 0.0},
                                       salt="other")
        assert sorted(r["doc_id"] for r in c.collect()) != ra

    def test_contamination_pairs(self, spark):
        from go_boilerpipe_spark.operators import curation

        docs = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog"),
             (2, "a totally clean document with nothing shared"),
             (3, "prefix text then the quick brown fox appears here")],
            "doc_id long, text string",
        )
        probes = spark.createDataFrame(
            [(100, "the quick brown fox")], "probe_id long, phrase string"
        )
        hits = {(r["doc_id"], r["probe_id"])
                for r in curation.contamination_pairs(docs, probes).collect()}
        assert hits == {(1, 100), (3, 100)}

    def test_top_terms_tiebreak(self, spark):
        from go_boilerpipe_spark.operators import curation

        docs = spark.createDataFrame(
            [(1, "zebra apple zebra apple banana")], "doc_id long, text string"
        )
        rows = curation.top_terms(docs, k=2, min_len=5).collect()
        assert [(r["term"], r["n"]) for r in rows] == [
            ("apple", 2), ("zebra", 2)  # tie → term asc
        ]

    def test_segment_dedup_marks_shared_chunks(self, spark):
        from go_boilerpipe_spark.operators import curation

        shared = "one two three four five six seven eight nine ten"
        docs = spark.createDataFrame(
            [(1, shared + " unique tail of first doc here now ok yes"),
             (2, shared + " different ending for the second document here")],
            "doc_id long, text string",
        )
        rows = curation.segment_dedup(docs, seg_tokens=10).collect()
        by_key = {(r["doc_id"], r["seg_idx"]): r for r in rows}
        # segment 0 is identical across docs: doc 1 keeps, doc 2 is dup
        assert not by_key[(1, 0)]["is_dup_segment"]
        assert by_key[(2, 0)]["is_dup_segment"]
        assert by_key[(2, 0)]["keeper_doc"] == 1
        # the differing tails are not duplicates
        assert not by_key[(1, 1)]["is_dup_segment"]
        assert not by_key[(2, 1)]["is_dup_segment"]

    def test_token_rarity_orders_docs(self, spark):
        from go_boilerpipe_spark.operators import curation

        docs = spark.createDataFrame(
            [(1, "common common common"),      # df=2 tokens only
             (2, "common rareword"),           # mixes df=2 and df=1
             (3, "unique singleton tokens")],  # all df=1
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in curation.doc_token_rarity(docs).collect()}
        assert out[1]["mean_df"] > out[2]["mean_df"] > out[3]["mean_df"]
        assert out[3]["mean_df"] == 1.0
        assert out[1]["n_tokens"] == 3 and out[1]["sum_df"] == 6

    def test_sample_frame_indices(self, spark):
        from go_boilerpipe_spark.operators.multimodal import (
            decode_media,
            sample_frame_indices,
        )

        rows = [(i, bytearray(f"video-{i}".encode()), "video") for i in range(4)]
        rows.append((9, bytearray(b"img"), "image"))
        df = spark.createDataFrame(
            rows, "doc_id long, payload binary, media_type string"
        )
        out = {r["doc_id"]: r for r in
               sample_frame_indices(decode_media(df), k=8).collect()}
        assert 9 not in out  # image rows excluded
        for r in out.values():
            idx = [int(x) for x in r["frame_idx_csv"].split(",")]
            assert len(idx) == min(r["n_frames"], 8)
            assert idx == sorted(idx) and idx[0] == 0
            assert all(0 <= i < r["n_frames"] for i in idx)

    def test_sample_frame_indices_zero_frames(self, spark):
        # ADVICE r2: n_frames == 0 made sequence(0, -1) step DOWN to
        # [0, -1]; must yield an empty index list once real decoders can
        # report zero frames
        from go_boilerpipe_spark.operators.multimodal import (
            sample_frame_indices,
        )

        decoded = spark.createDataFrame(
            [(1, 0, "video"), (2, 3, "video")],
            "doc_id long, n_frames int, media_type string",
        )
        out = {r["doc_id"]: r["frame_idx_csv"]
               for r in sample_frame_indices(decoded, k=8).collect()}
        assert out[1] == ""
        assert out[2] == "0,1,2"

    def test_ivf_plan_size_constant_in_centroid_count(self, spark):
        # VERDICT r1 item 3: centroids are data, not expression tree —
        # the physical plan must not grow with the quantizer size
        import math

        rows = [(i, [math.sin(i * 1.7 + j) for j in range(8)]) for i in range(200)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        q = emb.limit(2).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )

        def plan_len(n_cents):
            cents = emb.filter(F.col("vec_id") < n_cents).select(
                F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
            )
            df = similarity.cosine_topk_ivf(emb, q, cents, k=3, nprobe=2)
            return len(df._jdf.queryExecution().executedPlan().toString())

        small, big = plan_len(4), plan_len(64)
        assert abs(big - small) < 0.2 * small, (small, big)

    def test_quantize_int8_roundtrip_error(self, spark):
        vals = [0.5, -1.0, 0.25, 0.125]
        emb = spark.createDataFrame(
            [(1, vals), (2, [0.0, 0.0, 0.0, 0.0])],
            "vec_id long, embedding array<float>",
        )
        out = {r["vec_id"]: r for r in similarity.quantize_int8(emb).collect()}
        r1 = out[1]
        q = [int(x) for x in r1["q_csv"].split(",")]
        assert max(abs(v) for v in vals) == r1["absmax"]
        scale = 127.0 / r1["absmax"]
        for orig, qi in zip(vals, q):
            assert abs(qi / scale - orig) <= 0.5 / scale + 1e-9
        assert -128 <= min(q) and max(q) <= 127
        # zero vector: absmax 0 → scale 1, all-zero codes
        assert out[2]["q_csv"] == "0,0,0,0"

    def test_repetition_stats_flags_spam(self, spark):
        from go_boilerpipe_spark.operators import curation

        docs = spark.createDataFrame(
            [(1, "buy now " * 20),                       # one bigram repeated
             (2, "each word here appears exactly once today friends")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in
               curation.repetition_stats(docs).collect()}
        assert out[1]["top_bigram_share"] > 0.4
        assert out[1]["dup_bigram_frac"] > 0.9
        assert out[2]["dup_bigram_frac"] == 0.0

    def test_repetition_arrow_bit_identical(self, spark):
        # r6: the Arrow repetition kernel (Counter over bigrams) must
        # equal the Catalyst sort+run-length fold byte-for-byte,
        # including mixed casing, CJK, whitespace edges, and the null
        # text case (JVM: single-null bigram -> (1, 1.0, 1.0)).
        from go_boilerpipe_spark.operators import curation

        rows = [
            (0, "a b a b a b"), (1, "one two"), (2, "single"), (3, ""),
            (4, "   "), (5, "a\tb\nc\x0bd\fe\rf g"),
            (6, "A B a b MiXeD mixed"), (7, "x y z x y z x y z"),
            (8, "汉字 token mix 汉字 token mix extra"),
            (9, "\tlead trail\t"), (10, None),
            (11, "  spaced   out   tokens   here  "),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        jvm = sorted(map(tuple, curation.repetition_stats(
            docs, use_arrow=False).collect()))
        arrow = sorted(map(tuple, curation.repetition_stats(
            docs, use_arrow=True).collect()))
        assert arrow == jvm

    def test_token_rarity_arrow_bit_identical(self, spark):
        # r6: the distinct (term, count)-pair formulation must equal the
        # occurrence-explode plan exactly — counts are BIGINT so
        # sum(cnt·df) == sum over occurrences of df; null-text docs are
        # absent from both outputs.
        from go_boilerpipe_spark.operators import curation

        rows = [
            (0, "a b a b a b"), (1, "one two"), (2, "single"), (3, ""),
            (4, "   "), (5, "a\tb\nc\x0bd\fe\rf g"),
            (6, "A B a b MiXeD mixed"), (7, "x y z x y z x y z"),
            (8, "汉字 token mix 汉字 token mix extra"),
            (9, "\tlead trail\t"), (10, None),
            (11, "  spaced   out   tokens   here  "),
            # duplicated doc_id: df must stay count_distinct over ids
            (12, "dup id a b"), (12, "dup id c d"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        jvm = sorted(map(tuple, curation.doc_token_rarity(
            docs, use_arrow=False).collect()))
        arrow = sorted(map(tuple, curation.doc_token_rarity(
            docs, use_arrow=True).collect()))
        assert arrow == jvm
        assert all(r[0] != 10 for r in arrow)  # null text dropped

    def test_dup_ngrams_arrow_bit_identical(self, spark):
        # r6: the Arrow window-hash kernel must equal the Catalyst
        # window-md5 transform exactly, across short docs, duplicated
        # windows, and null text (JVM: one null window row via
        # greatest(null,1); totals 1, dup 0).
        from go_boilerpipe_spark.operators import curation

        rows = [
            (0, "a b c d e f g h i j k l m n o p"), (1, "one two"),
            (2, "single"), (3, ""), (4, "   "),
            (5, "a\tb\nc\x0bd\fe\rf g h i j k l m n"),
            (6, "x " * 30 + "y"), (7, ("w " * 13) * 3),
            (8, "汉字 token mix 汉字 token mix extra a b c d e f g"),
            (9, "\tlead trail\t"), (10, None),
            (11, "  spaced   out   tokens   here  "),
            (12, "a b c d e f g h i j k l m"),
            (13, "a b c d e f g h i j k l m"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        for nn, md in ((13, 2), (5, 2), (3, 3)):
            jvm = sorted(map(tuple, curation.duplicated_ngram_stats(
                docs, n=nn, min_docs=md, use_arrow=False).collect()))
            arrow = sorted(map(tuple, curation.duplicated_ngram_stats(
                docs, n=nn, min_docs=md, use_arrow=True).collect()))
            assert arrow == jvm, (nn, md)

    def test_segment_dedup_arrow_bit_identical(self, spark):
        # r6: the Arrow segment-hash kernel must equal the Catalyst
        # segment transform exactly across segment sizes, short docs,
        # and null text (one (0, null) segment row on both paths).
        from go_boilerpipe_spark.operators import curation

        rows = [
            (0, "a b c d e f g h i j k l m n o p"), (1, "one two"),
            (2, "single"), (3, ""), (4, "   "),
            (5, "a\tb\nc\x0bd\fe\rf g h i j k l m n"),
            (6, "x " * 30 + "y"), (7, ("w " * 10) * 3),
            (8, "汉字 token mix 汉字 token mix extra a b c d e f g"),
            (9, "\tlead trail\t"), (10, None),
            (11, "  spaced   out   tokens   here  "),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        for st in (10, 3, 1):
            jvm = sorted(map(tuple, curation.segment_dedup(
                docs, seg_tokens=st, use_arrow=False).collect()))
            arrow = sorted(map(tuple, curation.segment_dedup(
                docs, seg_tokens=st, use_arrow=True).collect()))
            assert arrow == jvm, st

    def test_blocklist_filter_anti_join(self, spark):
        from go_boilerpipe_spark.operators import curation

        docs = spark.createDataFrame(
            [(1, "http://a.spam.com/x"), (2, "http://ok.site.org/y"),
             (3, "https://www.spam.com/z")],
            "doc_id long, url string",
        )
        blocked = spark.createDataFrame([("spam.com",)], "root string")
        kept = curation.blocklist_filter(docs, blocked, F.col("url"))
        assert [r["doc_id"] for r in kept.collect()] == [2]
        # plan: broadcast anti-join, corpus side unshuffled
        plan = kept._jdf.queryExecution().executedPlan().toString()
        assert "LeftAnti" in plan and "Broadcast" in plan

    def test_pdf_parse_plumbing(self, spark):
        from go_boilerpipe_spark.operators.pdf import parse_pdfs

        rows = [(1, bytearray(b"doc one")), (2, None), (3, bytearray(b""))]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = {r["doc_id"]: r for r in parse_pdfs(df).collect()}
        assert out[2]["parse_error"] == "payload is null"
        assert out[1]["parse_error"] is None
        assert 1 <= out[1]["n_pages"] <= 32
        assert out[1]["text"].count("\n") == out[1]["n_pages"] - 1
        assert out[1]["n_chars"] == len(out[1]["text"])
        # deterministic: same payload, same output
        again = {r["doc_id"]: r for r in parse_pdfs(df).collect()}
        assert again[1] == out[1]
        # column pruning reaches the scan-side projection
        plan = parse_pdfs(df)._jdf.queryExecution().executedPlan().toString()
        assert "doc_id" in plan and "payload" in plan

    def test_extract_deduped_matches_plain(self, spark, corpus):
        # crawl-dedup extraction: same per-url results as the plain
        # operator (including null-html error rows), kernel runs once per
        # unique payload
        from go_boilerpipe_spark.operators.extract import (
            extract_articles,
            extract_articles_deduped,
        )

        pages = spark.read.parquet(corpus)
        plain = {r["url"]: (r["title"], r["content"], r["parse_error"])
                 for r in extract_articles(pages, parallelism=8).collect()}
        dedup_ = {r["url"]: (r["title"], r["content"], r["parse_error"])
                  for r in extract_articles_deduped(pages, parallelism=8).collect()}
        assert plain == dedup_
        assert sum(1 for v in plain.values() if v[2] is not None) == 4

    def test_curation_plan_shapes(self, spark):
        from go_boilerpipe_spark.operators import curation

        df = spark.createDataFrame(
            [(i, "en" if i % 2 else "zh") for i in range(50)],
            "doc_id long, lang string",
        )
        # stratified sampling: pure filter, zero exchanges
        plan = (
            curation.stratified_sample(df, "lang", {"en": 0.5})
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
        # contamination: broadcast join, corpus side unshuffled
        docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
        probes = spark.createDataFrame([(9, "b")], "probe_id long, phrase string")
        plan2 = (
            curation.contamination_pairs(docs, probes)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Broadcast" in plan2
        assert "Exchange hashpartitioning" not in plan2


class TestLangIdBatched:
    def test_batched_matches_catalyst_on_adversarial_inputs(self, spark):
        # r6: the Arrow lang-id kernel must agree with the staged
        # Catalyst expression on every edge the regexes see — NULL,
        # empty, pure whitespace (tab/newline/\x0b are Java \s), CJK
        # gate boundaries, non-ASCII casing, adjacent markers, markers
        # shared between languages ("que": fr+es), and argmax ties
        # (strictly-greater keeps the earlier LANG_MARKERS entry).
        from go_boilerpipe_spark.functions import textstats

        rows = [
            (0, None),
            (1, ""),
            (2, "   \t\n\x0b  "),
            (3, "the and of to is in"),
            (4, "THE AND OF"),
            (5, "der die und das"),
            (6, "le la les et"),
            (7, "el los las es"),
            (8, "que que que"),
            (9, "the und"),          # 1-1 tie -> first dict order wins
            (10, "一二三四五"),        # all CJK
            (11, "一二 the and of to is in that it was x"),  # CJK below gate
            (12, "一一一 ab"),         # 3*5 > 6 -> zh
            (13, "FÜR für MÁS más"),
            (14, "of\tthe\nand\x0bto"),
            (15, "theory anded ofx"),  # substrings must not count
            (16, " the "),
            (17, "x" * 5 + " the the und und"),  # 2-2 tie -> en
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        staged = df.select(
            "doc_id", "text",
            textstats.padded_lc(F.col("text")).alias("_padded"),
        )
        catalyst = {
            r["doc_id"]: r["p"]
            for r in staged.select(
                "doc_id",
                textstats.lang_id(
                    F.col("text"), padded=F.col("_padded")
                ).alias("p"),
            ).collect()
        }
        batched = {
            r["doc_id"]: r["p"]
            for r in df.select(
                "doc_id", textstats.lang_id_batched(F.col("text")).alias("p")
            ).collect()
        }
        assert batched == catalyst
