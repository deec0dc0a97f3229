"""Capstone pipeline invariants: the composed corpus-prep run must
produce a deduplicated, fully-split corpus with monotone stage counts,
stable under re-execution."""

from __future__ import annotations

from pyspark.sql import functions as F

from corral_spark.pipelines import prepare_pretraining_corpus
from corral_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_pipeline_invariants(spark):
    docs = load_table(spark, SF, "documents")
    corpus, report = prepare_pretraining_corpus(docs)

    # Monotone survival through the funnel.
    assert (
        report["input"]
        >= report["after_quality_filter"]
        >= report["after_exact_dedup"]
        >= report["after_near_dedup"]
        > 0
    )
    # Split partitions the survivors.
    assert report["train"] + report["test"] == report["after_near_dedup"]
    assert set(r.split for r in corpus.select("split").distinct().collect()) <= {
        "train",
        "test",
    }
    # No duplicate texts survive.
    n = corpus.count()
    assert corpus.select("clean_text").distinct().count() == n
    # Near-dedup kept each component's min id: no survivor equals a
    # dropped doc's text prefix... cheap proxy: ids unique.
    assert corpus.select("doc_id").distinct().count() == n


def test_pipeline_deterministic_across_runs(spark):
    docs = load_table(spark, SF, "documents")
    c1, r1 = prepare_pretraining_corpus(docs)
    c2, r2 = prepare_pretraining_corpus(docs)
    assert r1 == r2
    ids1 = sorted(r.doc_id for r in c1.select("doc_id").collect())
    ids2 = sorted(r.doc_id for r in c2.select("doc_id").collect())
    assert ids1 == ids2
    splits1 = {r.doc_id: r.split for r in c1.select("doc_id", "split").collect()}
    splits2 = {r.doc_id: r.split for r in c2.select("doc_id", "split").collect()}
    assert splits1 == splits2


def test_pipeline_hygiene_stages_drop_targeted_docs(spark):
    # A benchmark doc, a candidate quoting it verbatim (contaminated),
    # a degenerate repetitive candidate, and a normal candidate. Texts
    # are >= 20 distinct-enough words so only the hygiene stages can
    # drop them.
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " \
           "lam mu nu xi omicron pi rho sigma tau upsilon"
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps over the lazy dog near a river bank "
               "while birds sing softly above the calm green valley floor")],
        ["doc_id", "text"],
    )
    docs = spark.createDataFrame(
        [
            # contains the benchmark 5-gram "quick brown fox jumps over"
            (1, base + " quick brown fox jumps over"),
            # top token 'spam' dominates: ttf = 21/41 > 0.3
            (2, base + " " + " ".join(["spam"] * 21)),
            (3, base + " zeta2 eta2 theta2 iota2 kappa2"),
        ],
        ["doc_id", "text"],
    )
    corpus, report = prepare_pretraining_corpus(
        docs,
        benchmark=bench,
        max_top_token_fraction=0.3,
        near_dup="verified",
    )
    kept = sorted(r.doc_id for r in corpus.select("doc_id").collect())
    assert kept == [3]
    assert report["input"] == 3
    assert report["after_decontamination"] == 2
    assert report["after_quality_filter"] == 1


def test_pipeline_boilerplate_stage_drops_templated_doc(spark):
    # Doc 2 is a 10-word template (shared by 3 docs -> df=3 > max_df=2)
    # plus filler that alone is under the 20-word floor; removing the
    # template must drop doc 2 at the quality stage while docs with
    # enough unique content survive with the template stripped.
    template = "click here to subscribe to our newsletter for daily updates"
    unique_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " \
               "lam mu nu xi omicron pi rho sigma tau upsilon"
    unique_b = "one two three four five six seven eight nine ten " \
               "eleven twelve thirteen fourteen fifteen sixteen " \
               "seventeen eighteen nineteen twenty"
    docs = spark.createDataFrame(
        [
            (1, template + " " + unique_a),
            (2, template + " short filler only"),
            (3, template + " " + unique_b),
        ],
        ["doc_id", "text"],
    )
    corpus, report = prepare_pretraining_corpus(
        docs, boilerplate_max_df=2, near_dup="verified"
    )
    kept = sorted(r.doc_id for r in corpus.select("doc_id").collect())
    assert kept == [1, 3]
    assert report["after_boilerplate_removal"] == 3  # all still non-empty
    assert report["after_quality_filter"] == 2  # doc 2 fell under the floor
    # The surviving text must not contain the template segment.
    texts = {r.doc_id: r.clean_text for r in corpus.collect()}
    assert "subscribe" not in texts[1] and "subscribe" not in texts[3]


def test_pipeline_gram_dedup_stage_strips_unaligned_repeat(spark):
    # Doc 2 embeds a 20-word run from doc 1 mid-document at an offset
    # no fixed segment boundary would align with. With k=8, tokens
    # within k-1 of the repeat's edges are protected by mixed windows
    # (unique flank context makes those windows first occurrences), so
    # only the strictly-interior tokens — offsets [k-1, L-k] = [7, 12]
    # of the 20-word run, including the "zanzibar" marker at offset 9
    # — are removable; a repeat shorter than 2k-1 loses nothing.
    shared = (
        "the quick brown fox jumps over a lazy dog zanzibar sleeps "
        "while birds sing sweet songs above the green meadow"
    )  # 20 words, marker at offset 9
    unique_1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    unique_2a = "one two three four five six seven eight nine ten"
    unique_2b = "eleven twelve thirteen fourteen fifteen sixteen " \
                "seventeen eighteen nineteen twenty"
    docs = spark.createDataFrame(
        [
            (1, shared + " " + unique_1),
            (2, unique_2a + " " + shared + " " + unique_2b),
        ],
        ["doc_id", "text"],
    )
    corpus, report = prepare_pretraining_corpus(
        docs, gram_dedup_k=8, near_dup="verified"
    )
    texts = {r.doc_id: r.clean_text for r in corpus.collect()}
    assert sorted(texts) == [1, 2]
    assert "zanzibar" in texts[1]  # first occurrence untouched
    assert "zanzibar" not in texts[2]  # interior of the repeat stripped
    assert "the quick brown fox" in texts[2]  # edge tokens protected
    assert "one two three" in texts[2] and "twenty" in texts[2]
    assert report["after_gram_dedup"] == 2
