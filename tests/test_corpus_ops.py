"""Training-data corpus operators (dedup / similarity / text-analysis /
multimodal): oracle parity at sf0.001 plus semantic checks on the planted
near-duplicate structure."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from credix_data_pipeline_spark.plans.corpus_ops import (
    ANN_K,
    CORPUS_QUERIES,
    JACCARD_THRESHOLD,
)
from tests.duck_compare import compare, duckdb_conn

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    return duckdb_conn(SF_DIR)


@pytest.mark.parametrize("name", sorted(CORPUS_QUERIES))
def test_corpus_query_matches_oracle(spark, con, name):
    fn, sql = CORPUS_QUERIES[name]
    problems = compare(fn(spark, SF_DIR), con, sql, name)
    assert not problems, "\n".join(problems)


def test_minhash_lsh_recall_vs_exact_jaccard(spark):
    """LSH candidates (verified) recover nearly all true Jaccard near-dups —
    the planted pairs sit at ~0.98 so banded MinHash should find them."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in CORPUS_QUERIES["dedup_ngram_jaccard"][0](spark, SF_DIR).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in CORPUS_QUERIES["dedup_minhash_lsh"][0](spark, SF_DIR).collect()
    }
    assert exact, "expected planted near-dup pairs in the corpus"
    assert lsh <= exact  # verification step guarantees no false positives
    recall = len(lsh) / len(exact)
    assert recall >= 0.9, f"LSH recall too low: {recall}"


def test_ngram_jaccard_pairs_are_high_similarity(spark):
    rows = CORPUS_QUERIES["dedup_ngram_jaccard"][0](spark, SF_DIR).collect()
    assert rows, "expected planted near-dup pairs"
    assert all(r.jaccard >= JACCARD_THRESHOLD for r in rows)


def test_ann_topk_shape_and_ordering(spark):
    df = CORPUS_QUERIES["ann_cosine_topk"][0](spark, SF_DIR)
    rows = df.collect()
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    for q, rs in per_q.items():
        assert len(rs) == ANN_K
        ranked = sorted(rs, key=lambda r: r.rank)
        cosines = [r.cosine for r in ranked]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r.neighbor_id != q for r in rs)


def test_lsh_ann_neighbor_is_bucket_local_and_suboptimal_at_worst(spark):
    """Bucketed ANN returns a neighbor whose cosine is <= the brute-force
    top-1 (approximation never beats the exact answer)."""
    brute = {
        r.query_id: r.cosine
        for r in CORPUS_QUERIES["ann_cosine_topk"][0](spark, SF_DIR)
        .filter(F.col("rank") == 1)
        .collect()
    }
    for r in CORPUS_QUERIES["ann_lsh_bucketed"][0](spark, SF_DIR).collect():
        if r.query_id in brute:
            assert r.cosine <= brute[r.query_id] + 1e-9


def test_ivf_ann_never_beats_brute_force(spark):
    """IVF probes a subset of cells, so its best neighbor is at most the
    brute-force top-1; every query must still return ANN_K rows."""
    brute = {
        r.query_id: r.cosine
        for r in CORPUS_QUERIES["ann_cosine_topk"][0](spark, SF_DIR)
        .filter(F.col("rank") == 1)
        .collect()
    }
    rows = CORPUS_QUERIES["ann_ivf_topk"][0](spark, SF_DIR).collect()
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    assert len(per_q) == len(brute)
    for q, rs in per_q.items():
        assert len(rs) == ANN_K
        best = max(r.cosine for r in rs)
        assert best <= brute[q] + 1e-9


def test_near_dup_components_cover_pairs_transitively(spark):
    """Every verified near-dup pair lands in the same component; component
    ids are the min doc_id of the member set (canonical keeper)."""
    pairs = CORPUS_QUERIES["dedup_minhash_lsh"][0](spark, SF_DIR).collect()
    comp = {
        r.doc_id: r.component_id
        for r in CORPUS_QUERIES["near_dup_components"][0](spark, SF_DIR).collect()
    }
    assert pairs and comp
    for p in pairs:
        assert comp[p.doc_a] == comp[p.doc_b]
    # canonical = min member; exactly one non-dup (the keeper) per component
    members: dict[int, list[int]] = {}
    for doc, c in comp.items():
        members.setdefault(c, []).append(doc)
    for c, docs in members.items():
        assert c == min(docs)
        assert len(docs) >= 2  # singletons are excluded by construction


def test_tfidf_ranks_are_dense_and_deterministic(spark):
    rows = CORPUS_QUERIES["tfidf_top_terms"][0](spark, SF_DIR).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert len(per_doc) == 500
    for doc, rs in per_doc.items():
        rs = sorted(rs, key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)
        # rarer terms score higher for equal tf
        for r in rs:
            assert r.idf_bp == 500 * 10000 // r.term_df


def test_text_redaction_scrubs_sensitive_terms(spark):
    from credix_data_pipeline_spark.plans.corpus_ops import SENSITIVE_TERMS

    rows = CORPUS_QUERIES["text_redaction"][0](spark, SF_DIR).collect()
    assert len(rows) == 500
    fired = [r for r in rows if r.changed]
    assert fired, "expected sensitive terms to occur in the corpus"
    for r in rows:
        for term in SENSITIVE_TERMS:
            # no bare sensitive token survives redaction
            assert f" {term} " not in f" {r.clean_text} "
        if r.n_sensitive_terms:
            assert "<ENTITY>" in r.clean_text


def test_train_test_split_is_deterministic_and_proportional(spark):
    fn = CORPUS_QUERIES["train_test_split"][0]
    a = {r.doc_id: r.split for r in fn(spark, SF_DIR).collect()}
    b = {r.doc_id: r.split for r in fn(spark, SF_DIR).collect()}
    assert a == b and len(a) == 500  # stable across runs
    from collections import Counter

    c = Counter(a.values())
    assert 0.7 < c["train"] / 500 < 0.9
    assert c["valid"] > 0 and c["test"] > 0
    # growth stability: the split of a doc never depends on other docs
    sub = {r.doc_id: r.split
           for r in fn(spark, SF_DIR).filter(F.col("doc_id") < 100).collect()}
    assert all(a[k] == v for k, v in sub.items())


def test_corpus_curation_ladder_is_consistent(spark):
    """The keep/reject decision composes the underlying operators with the
    P7 first-failing-rule order."""
    cur = {r.doc_id: r for r in
           CORPUS_QUERIES["corpus_curation"][0](spark, SF_DIR).collect()}
    dup = {r.doc_id: r.is_dup for r in
           CORPUS_QUERIES["dedup_exact"][0](spark, SF_DIR).collect()}
    lang = {r.doc_id: r.is_match for r in
            CORPUS_QUERIES["lang_id_ngram"][0](spark, SF_DIR).collect()}
    band = {r.doc_id: r.quality_band for r in
            CORPUS_QUERIES["text_quality"][0](spark, SF_DIR).collect()}
    assert len(cur) == 500
    for doc, r in cur.items():
        if dup[doc]:
            assert r.reject_reason == "DUPLICATE"
        elif band[doc] == "REJECT":
            assert r.reject_reason == "LOW_QUALITY"
        elif not lang[doc]:
            assert r.reject_reason == "LANG_MISMATCH"
        else:
            assert r.reject_reason == "VALID" and r.keep


def test_multimodal_features_deterministic_and_typed(spark):
    fn = CORPUS_QUERIES["multimodal_features"][0]
    a = {r.doc_id: (r.n_bytes, r.content_md5, r.width, r.height, r.n_frames)
         for r in fn(spark, SF_DIR).collect()}
    b = {r.doc_id: (r.n_bytes, r.content_md5, r.width, r.height, r.n_frames)
         for r in fn(spark, SF_DIR).collect()}
    assert a == b and len(a) == 500
    for n_bytes, md5hex, w, h, fr in a.values():
        assert len(md5hex) == 32
        assert 64 <= w < 576 and 64 <= h < 576 and 1 <= fr <= 16


def test_multimodal_decode_stubs_raise():
    from credix_data_pipeline_spark.functions import multimodal

    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"RIFF")


def test_minhash_incremental_is_arrival_slice_of_full(spark):
    """The incremental op's pair set is exactly the full LSH dedup result
    restricted to pairs touching the deterministic arrival batch — the
    index-probe never invents pairs and never misses an arrival pair."""
    from credix_data_pipeline_spark.plans.corpus_ops import ARRIVAL_HEX

    full_fn, _ = CORPUS_QUERIES["dedup_minhash_lsh"]
    inc_fn, _ = CORPUS_QUERIES["dedup_minhash_incremental"]
    full = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in full_fn(spark, SF_DIR).collect()
    }
    inc = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in inc_fn(spark, SF_DIR).collect()
    }

    def is_arrival(doc_id: int) -> bool:
        import hashlib

        return (
            hashlib.md5(str(doc_id).encode()).hexdigest()[0] == ARRIVAL_HEX
        )

    expected = {
        pair: j
        for pair, j in full.items()
        if is_arrival(pair[0]) or is_arrival(pair[1])
    }
    assert inc == expected
    assert inc, "the sf0.001 corpus plants near-dups in the arrival slice"


def test_repetition_score_flags_exactly_the_integer_rule(spark):
    """dup/top percentages are bounded and ``repetitive`` is the exact
    integer-arithmetic threshold (dup_frac > 1/50), not a float compare."""
    from credix_data_pipeline_spark.plans.corpus_ops import (
        REPETITION_DEN,
        REPETITION_NUM,
        q_repetition_score,
    )

    rows = q_repetition_score(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r.distinct_ngrams <= r.total_ngrams
        assert r.top_ngram_count <= r.total_ngrams
        assert 0.0 <= r.dup_ngram_pct <= 100.0
        # rounded to 2 decimals, so allow half-ulp slack below 100/total
        assert r.top_ngram_pct >= 100.0 / r.total_ngrams - 0.005 - 1e-9
        dup = r.total_ngrams - r.distinct_ngrams
        assert r.repetitive == (
            dup * REPETITION_DEN > r.total_ngrams * REPETITION_NUM
        )


def test_benchmark_decontam_excludes_test_split_and_bounds_overlap(spark):
    """Decontamination scores only train/valid docs; overlap is bounded by
    the doc's own shingle count; the contaminated flag matches the ratio."""
    from credix_data_pipeline_spark.plans.corpus_ops import (
        DECONTAM_DEN,
        DECONTAM_NUM,
        q_benchmark_decontam,
    )

    rows = q_benchmark_decontam(spark, SF_DIR).collect()
    assert rows
    assert all(r.split in ("train", "valid") for r in rows)
    for r in rows:
        assert 0 <= r.bench_overlap <= r.n_sh
        assert r.contaminated == (
            r.bench_overlap * DECONTAM_DEN >= r.n_sh * DECONTAM_NUM
        )


def test_stratified_sample_within_binomial_envelope_and_deterministic(spark):
    """The hash-threshold sample tracks the exact-rank oracle's quota per
    stratum within the binomial envelope (±4√n + 1), two independent runs
    pick the identical doc set, and the production plan carries NO window
    or sort (the r4 scale-cliff fix)."""
    import math

    from credix_data_pipeline_spark.plans.corpus_ops import (
        SAMPLE_DEN,
        SAMPLE_NUM,
        q_stratified_sample,
        q_stratified_sample_exact_rank,
    )

    a = q_stratified_sample(spark, SF_DIR).collect()
    by_lang: dict[str, list] = {}
    for r in a:
        by_lang.setdefault(r.lang, []).append(r)
    assert len(by_lang) > 1
    oracle = q_stratified_sample_exact_rank(spark, SF_DIR).collect()
    oracle_quota = {}
    for r in oracle:
        if r.in_sample:
            oracle_quota[r.lang] = oracle_quota.get(r.lang, 0) + 1
    for lang, rs in by_lang.items():
        n = rs[0].stratum_n
        assert len(rs) == n
        got = sum(r.in_sample for r in rs)
        # the exact-rank oracle's quota is ceil(n/DEN); the hash form must
        # land within the binomial envelope around it
        quota = (n * SAMPLE_NUM + SAMPLE_DEN - 1) // SAMPLE_DEN
        assert oracle_quota.get(lang, 0) == quota
        assert abs(got - quota) <= 4 * math.sqrt(n) + 1, (lang, got, quota, n)
    b = q_stratified_sample(spark, SF_DIR).collect()
    assert {r.doc_id for r in a if r.in_sample} == {
        r.doc_id for r in b if r.in_sample
    }
    # scale posture: membership is a per-row projection — no per-stratum
    # sort/window anywhere in the optimized plan, and the lang-count join
    # is broadcast
    plan = q_stratified_sample(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "Sort" not in plan and "Window" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_dup_passage_score_agrees_with_pure_python(spark):
    """dup_spans is exactly the count of the doc's distinct trigrams seen in
    >=2 docs (pure-Python recount over the raw corpus), and the corpus-
    relative flag is the integer cross-multiplied mean compare."""
    from credix_data_pipeline_spark.plans.corpus_ops import (
        q_dup_passage_score,
    )

    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    tris: dict[int, set] = {}
    for did, text in docs.items():
        toks = [w for w in text.lower().split(" ") if w]
        tris[did] = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
    from collections import Counter

    freq = Counter(s for ss in tris.values() for s in ss)
    rows = q_dup_passage_score(spark, SF_DIR).collect()
    assert rows and {r.doc_id for r in rows} == {
        d for d, ss in tris.items() if ss
    }
    permilles = {}
    for r in rows:
        want_dup = sum(1 for s in tris[r.doc_id] if freq[s] >= 2)
        assert (r.n_spans, r.dup_spans) == (len(tris[r.doc_id]), want_dup)
        permilles[r.doc_id] = r.dup_spans * 1000 // r.n_spans
    tot, n = sum(permilles.values()), len(permilles)
    for r in rows:
        assert r.duplicated == (permilles[r.doc_id] * n > tot)
    assert 0 < sum(r.duplicated for r in rows) < len(rows)


def test_lm_familiarity_is_the_integer_log2_bigram_model(spark):
    """familiarity == sum of floor(log2(corpus bigram count)) over the
    doc's bigram occurrences (pure-Python recount), and the flag is the
    corpus-relative mean compare."""
    from credix_data_pipeline_spark.plans.corpus_ops import q_lm_familiarity

    docs = {
        r.doc_id: [
            w
            for w in r.text.lower().split(" ")
            if w
        ]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    from collections import Counter

    bis = {
        did: [f"{t[i]} {t[i+1]}" for i in range(len(t) - 1)]
        for did, t in docs.items()
    }
    cnt = Counter(b for bb in bis.values() for b in bb)
    rows = q_lm_familiarity(spark, SF_DIR).collect()
    assert rows and {r.doc_id for r in rows} == {
        d for d, bb in bis.items() if bb
    }
    permilles = {}
    for r in rows:
        want = sum(cnt[b].bit_length() - 1 for b in bis[r.doc_id])
        assert (r.n_bigrams, r.familiarity) == (len(bis[r.doc_id]), want)
        assert r.familiarity_permille == want * 1000 // r.n_bigrams
        permilles[r.doc_id] = r.familiarity_permille
    tot, n = sum(permilles.values()), len(permilles)
    for r in rows:
        assert r.familiar == (permilles[r.doc_id] * n > tot)
    assert 0 < sum(r.familiar for r in rows) < len(rows)


def test_sequence_packing_is_the_global_concat_and_chunk(spark):
    """The two-level prefix scan must equal the straight global cumsum:
    spans are contiguous in doc_id order, chunk math matches a pure-Python
    recount, and total sequences == ceil(total_tokens / PACK_SEQ_LEN)."""
    from credix_data_pipeline_spark.plans.corpus_ops import (
        PACK_SEQ_LEN,
        q_sequence_packing,
    )

    toks = {
        r.doc_id: [w for w in r.text.lower().split(" ") if w]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    rows = {r.doc_id: r for r in q_sequence_packing(spark, SF_DIR).collect()}
    assert set(rows) == set(toks)
    cum = 0
    for did in sorted(toks):
        r = rows[did]
        n = len(toks[did])
        assert r.n_tokens == n
        assert r.tok_start == cum  # contiguity: no gaps, no overlaps
        assert r.seq_first == cum // PACK_SEQ_LEN
        assert r.seq_last == (cum + max(n, 1) - 1) // PACK_SEQ_LEN
        assert r.n_seqs == r.seq_last - r.seq_first + 1
        assert r.offset_in_first == cum % PACK_SEQ_LEN
        cum += n
    total = sum(len(v) for v in toks.values())
    n_seqs = -(-total // PACK_SEQ_LEN)
    assert max(r.seq_last for r in rows.values()) == n_seqs - 1
    assert any(r.n_seqs > 1 for r in rows.values())  # docs straddle chunks


def test_corpus_mixture_weights_upsample_low_resource(spark):
    """alpha < 1 multinomial weights: weights sum to 1, the smallest
    language is upsampled (factor > 1), the largest downsampled, and the
    ordering by weight preserves the ordering by token mass."""
    from credix_data_pipeline_spark.plans.corpus_ops import (
        q_corpus_mixture_weights,
    )

    rows = q_corpus_mixture_weights(spark, SF_DIR).collect()
    assert len(rows) >= 2
    assert abs(sum(r.sample_weight for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.natural_share for r in rows) - 1.0) < 1e-3
    by_tokens = sorted(rows, key=lambda r: r.n_tokens)
    assert by_tokens[0].upsample_factor > 1.0
    assert by_tokens[-1].upsample_factor < 1.0
    weights = [r.sample_weight for r in by_tokens]
    assert weights == sorted(weights)  # monotone in token mass
    # alpha < 1 compresses the spread: weight ratio < natural ratio
    assert (by_tokens[-1].sample_weight / by_tokens[0].sample_weight) < (
        by_tokens[-1].natural_share / by_tokens[0].natural_share
    )
