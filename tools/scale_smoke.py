"""Scale-smoke: measure how the heavy pipeline operators scale with
corpus size, as evidence for the 100 TB design claims.

Builds synthetic 10x corpora by unioning the sf0.1 tables with shifted
ids (docs stay realistic: same length/vocab distribution; duplicates
across copies are REAL near-dups the dedup ops must catch), runs each
headline operator at 1x and 10x, and reports the scaling exponent
log10(t10/t1) — 1.0 = perfectly linear, 2.0 = quadratic blow-up.

Usage: python tools/scale_smoke.py [sf_dir] [factor] [op ...]
(op names filter the table to just those rows, for incremental runs)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from ballista_extensions_spark.io import load_table
    from ballista_extensions_spark.operators import dedup as D
    from ballista_extensions_spark.operators import similarity as S
    from ballista_extensions_spark.operators import text as T
    from ballista_extensions_spark.operators.components import (
        dedup_by_components,
    )
    from ballista_extensions_spark.session import get_session

    spark = get_session("scale-smoke")
    docs1 = load_table(spark, sf_dir, "documents")
    emb1 = load_table(spark, sf_dir, "embeddings")
    ev1 = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    n_docs = docs1.count()
    n_emb = emb1.count()
    n_ev = ev1.count()

    def amplify(df, id_col, n_base):
        # union `factor` shifted copies, then repartition so the blown-up
        # frame has production-like parallelism instead of factor x 1
        # single-row-group slices.
        out = df
        for k in range(1, factor):
            out = out.unionByName(
                df.withColumn(id_col, F.col(id_col) + F.lit(k * n_base))
            )
        return out.repartition(64).localCheckpoint()

    def _mat(df):
        # Materialize through the noop sink: .count() wraps the plan
        # in Aggregate(count(1)) and Catalyst prunes projection-only
        # operator bodies (and final joins to unique-key aggregates)
        # out of the timed plan entirely — the exponent then measures
        # a hollow shell (found round 12; bench.py fixed the same way)
        df.write.format("noop").mode("overwrite").save()
        return True

    docs10 = amplify(docs1, "doc_id", n_docs)
    emb10 = amplify(emb1, "vec_id", n_emb)
    ev10 = amplify(ev1, "event_id", n_ev)
    # the 1x frames must carry the SAME production-like parallelism as
    # the amplified frames: sf0.1 parquet is a single row-group, so an
    # un-repartitioned 1x runs on ONE core while the 10x runs on 64
    # partitions — t_1x inflates and the exponent reads low (for the
    # chunk-memoizing Arrow BPE applier it even went NEGATIVE, round
    # 13's catch). Same repartition+checkpoint shape on both sides.
    docs1 = docs1.repartition(64).localCheckpoint()
    emb1 = emb1.repartition(64).localCheckpoint()
    ev1 = ev1.repartition(64).localCheckpoint()
    print(f"# corpora: {n_docs} -> {docs10.count()} docs, "
          f"{n_emb} -> {emb10.count()} vectors, "
          f"{n_ev} -> {ev10.count()} events", file=sys.stderr)

    def _curation(d, pair_fn):
        # gate -> exact dedup -> closure -> summary (the end-to-end chain)
        rep = T.repetition_stats(d)
        ids = rep.filter(
            (F.col("distinct_ratio") >= 0.2)
            & (F.col("dup_trigram_frac") <= 0.5)
            & (F.col("top_token_frac") <= 0.5)
        ).select("doc_id")
        gated = d.join(ids, "doc_id")
        keep = (
            gated.groupBy(F.md5("text").alias("h"))
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        exact = gated.join(keep, "doc_id").localCheckpoint()
        pairs = pair_fn(exact)
        comp = dedup_by_components(exact, pairs)
        return comp.filter(F.col("is_representative")).count()

    def _pairs_exact(d):
        return D.near_dup_pairs_exact(d, threshold=0.35, probe_mod=1)

    def _pairs_lsh(d):
        return D.near_dup_pairs_lsh_verified(d, threshold=0.35)

    def _media_near_dup(adapter, hasher, threshold):
        # the full round-10 multimodal loop: encode fixture payloads ->
        # REAL codec decode -> 64-bit perceptual hash -> banded
        # multi-index Hamming pairs. Linear-by-construction up to the
        # per-(band, slice) collision join; the amplified corpus has
        # REAL cross-copy duplicates every band must bucket together.
        from ballista_extensions_spark.operators.imagedup import (
            image_dhash,
            phash_near_dup_pairs,
        )

        def run(d, e):
            hashes = image_dhash(adapter(d), hasher=hasher)
            return phash_near_dup_pairs(
                hashes, threshold=threshold, bands=8
            ).count()

        return run

    def _jpeg_decode(d, e):
        from ballista_extensions_spark.operators.jpegcodec import (
            decode_jpeg_to_array,
        )
        from ballista_extensions_spark.operators.multimodal import (
            decode_pixel_stats,
            docs_as_jpeg_media,
        )

        return decode_pixel_stats(
            docs_as_jpeg_media(d), decode_jpeg_to_array
        ).count()

    def _video_frames(d, e):
        from ballista_extensions_spark.operators.multimodal import (
            docs_as_avi_media,
        )
        from ballista_extensions_spark.operators.videocodec import (
            video_frame_samples,
        )

        return video_frame_samples(docs_as_avi_media(d), stride=2).count()

    def _media_ops():
        from ballista_extensions_spark.operators.audiocodec import (
            audio_dhash64,
        )
        from ballista_extensions_spark.operators.multimodal import (
            docs_as_avi_media,
            docs_as_png_media,
            docs_as_wav_media,
        )
        from ballista_extensions_spark.operators.videocodec import (
            video_dhash64,
        )

        return {
            "image_phash_near_dup": _media_near_dup(
                docs_as_png_media, None, 6
            ),
            "audio_energy_near_dup": _media_near_dup(
                docs_as_wav_media, audio_dhash64, 5
            ),
            "video_keyframe_near_dup": _media_near_dup(
                docs_as_avi_media, video_dhash64, 6
            ),
            "jpeg_decode_checksum": _jpeg_decode,
            "video_frame_sample": _video_frames,
        }

    # NOTE: PageRank-over-near-dup-pairs is intentionally absent: its
    # cost profile is dedup_components' (pair generation dominates; the
    # rank loop adds O(iterations) cheap stages).
    ops = {
        "dedup_exact": lambda d, e: D.dedup_exact(d).count(),
        "near_dup_char_ngram": lambda d, e: D.near_dup_pairs_char_ngram(
            d
        ).count(),
        "dedup_near_minhash": lambda d, e: D.dedup_near_minhash(d).count(),
        "dedup_components": lambda d, e: dedup_by_components(
            d, D.near_dup_pairs_exact(d, threshold=0.35, probe_mod=1)
        ).count(),
        "repetition_stats": lambda d, e: _mat(T.repetition_stats(d)),
        "rare_token_fraction": lambda d, e: T.rare_token_fraction(d).count(),
        "quantize_int8": lambda d, e: _mat(S.quantize_int8(e)),
        "lsh_ann_topk": lambda d, e: S.lsh_topk(
            e, e.filter(F.col("vec_id") % 199 == 0), dim=64, k=10
        ).count(),
        # exact-vs-LSH crossover evidence (same contract, threshold 0.35):
        # the LSH path's justification is corpus-scale behavior — its
        # exponent and the ratio t_lsh/t_exact at 1x vs factor-x are the
        # measurements BASELINE.md's scale table records.
        "near_dup_exact_full": lambda d, e: _pairs_exact(d).count(),
        "near_dup_lsh_verified": lambda d, e: _pairs_lsh(d).count(),
        "curation_chain": lambda d, e: _curation(d, _pairs_exact),
        "curation_chain_lsh": lambda d, e: _curation(d, _pairs_lsh),
        # round-6 families: bounded-summary heavy hitters, global-window-
        # free mixture quotas, sweep-line concurrency, shingle-df novelty
        "heavy_hitter_tokens": lambda d, e: _heavy_hitters(d),
        "domain_mix_resample": lambda d, e: _mix(d),
        "ngram_novelty": lambda d, e: T.ngram_novelty(d).count(),
        # round-7 additions (VERDICT r6 directive #4): the remaining
        # round-6 operators whose linearity was asserted but unmeasured
        "percentile_disc_distributed": lambda d, e: _pctl(d),
        # round-7 operators, measured the round they landed
        "hamming_sign_topk": lambda d, e: _hamming(e),
        # round-9 (VERDICT r8 directive #3): token_len_quartiles_by_lang's
        # shape — token counts into a FEW-group grouped percentile
        "token_len_quartiles": lambda d, e: _token_quartiles(d),
        # round-9 (directive #8): per-batch centroid drift
        "centroid_drift": lambda d, e: _drift(e),
        # round-11: web-crawl prep + compression proxy + snapshot diff
        "url_frontier_dedup": lambda d, e: _url_dedup(d),
        "html_extract": lambda d, e: _html_extract(d),
        "compression_ratio": lambda d, e: _compress(d),
        "corpus_snapshot_diff": lambda d, e: _snap_diff(d),
        # round-12 (VERDICT r11 directives #1-#3): SemDeDup with the
        # documented n_lists ∝ corpus scaling (constant target cell
        # size — the operator's 100-TB control), span scrub, and the
        # composed crawl-curation chain
        "semantic_dedup": lambda d, e: _semdedup(e),
        "semantic_dedup_trained": lambda d, e: _semdedup(e, trained=True),
        # aggregate over the rebuilt text / token counts: a bare
        # count() lets Catalyst prune the heavy rebuild expressions
        # out of the plan and times a hollow shell
        "exact_span_scrub": lambda d, e: D.exact_span_scrub(d, n=10)
        .agg(
            F.sum(F.length("clean_text")).alias("b"),
            F.sum("n_after").alias("t"),
        )
        .collect()[0]["t"],
        "crawl_curation_pipeline": lambda d, e: _crawl(d),
        "bpe_tokenize": lambda d, e: _bpe(d),
        # round-13 (VERDICT r12 directives #1, #3): the Arrow-batched
        # rank-priority applier at the 384-merge frozen vocab (the plan
        # shape that survives a 32k production vocabulary), and the
        # hashed-BoW quality-classifier gate (one codegen'd narrow pass)
        "bpe_large_vocab": lambda d, e: _bpe_stream(d),
        "quality_classifier": lambda d, e: _quality(d),
        # round-13: DSIR importance scoring (one narrow projection —
        # the aggregate defeats column pruning of the fold expression)
        "dsir_weights": lambda d, e: _dsir(d),
        # round-13: the full budget-prefix composition (score + min/max
        # + histogram + boundary-band distributed prefix); budget
        # scales with the corpus so the boundary work stays comparable
        "dsir_budget_select": lambda d, e: _dsir_budget(d),
        # round-14: deterministic training shards (seeded hash-shuffle
        # rank + cumsum via one range shuffle, O(partitions) offsets,
        # manifest groupBy), NFC normalization (one Arrow-batched
        # narrow pass), and the cross-modality funnel (routing +
        # per-modality dedup + keeper attribution)
        "training_shards": lambda d, e: _shards(d),
        "nfc_normalize": lambda d, e: _nfc(d),
        "multimodal_funnel": lambda d, e: _mm_funnel(d),
        # round-15 (VERDICT r14 directives #2/#5/#6/#7): the two shard
        # siblings previously inheriting 0.26 "by plan identity" now
        # measured (query shapes as registered), plus sequence packing
        # (whitespace costs — isolates the span/groupBy machinery from
        # the separately-measured BPE applier), curriculum ordering,
        # and the byte-level pretokenizer projection
        "shards_incremental": lambda d, e: _shards_inc(d),
        "shards_bpe_budget": lambda d, e: _shards_bpe(d),
        "sequence_packing": lambda d, e: _packing(d),
        "packed_emit": lambda d, e: _packed_emit(d),
        "curriculum_shards": lambda d, e: _curriculum(d),
        "pretokenize_counts": lambda d, e: _pretok(d),
        # round-16 (VERDICT r15 directives #3/#5): BM25 lexical
        # retrieval, and curriculum ordering from the PERSISTED score
        # store — the production path where the classifier fold was
        # paid once at gate time (the memoized score frame below; with
        # reps>=2, min-of-reps times the schedule step alone, which is
        # the directive's re-measurement target)
        "bm25_retrieval": lambda d, e: _bm25(d),
        "curriculum_from_store": lambda d, e: _curriculum_store(d),
        # round-16 (directive #6): per-sequence attention-reset masks
        # (whitespace costs — isolates the span/HOF machinery from the
        # separately-measured BPE applier, same isolation as
        # sequence_packing)
        "segment_ids": lambda d, e: _segment_ids(d),
        # late round-16 (r17 registration pending): the persisted BM25
        # posting store. Probe cost should track the query terms'
        # posting-list length (never corpus scan/tokenize cost), and a
        # FIXED-size increment's ingest should be flat vs store size —
        # the store-family contracts (sigstore/annstore/scorestore).
        "posting_store_probe": lambda d, e: _posting_probe(d),
        "posting_store_ingest": lambda d, e: _posting_ingest(d),
        # fixed 220-query benchmark suite against the 1x vs 100x
        # store: one batch job, cost bounded by the suite's posting
        # lists (the decontamination posture)
        "posting_store_batch": lambda d, e: _posting_batch(d),
        # late round-16: structural Gopher repetition signals — one
        # narrow zero-shuffle projection (aggregate defeats pruning)
        "line_repetition": lambda d, e: _line_rep(d),
    }

    def _segment_ids(d):
        from ballista_extensions_spark.operators.packing import (
            packed_segment_ids,
        )

        base = d.filter(F.col("text").isNotNull())
        out = packed_segment_ids(base, 1024, 20260816)
        # aggregate over the mask arrays: a bare count() would let
        # Catalyst prune the HOF lambda bodies out of the timed plan
        return out.agg(
            F.sum(F.expr(
                "aggregate(segment_ids, CAST(0 AS BIGINT), "
                "(a, x) -> a + x)"
            )).alias("s"),
            F.sum("n_segments").alias("n"),
        ).collect()[0]["n"]

    def _bm25(d):
        from ballista_extensions_spark.operators.retrieval import (
            bm25_topk,
        )

        return bm25_topk(
            d, ("vector", "spark", "merge", "filter"), k=20
        ).count()

    _score_cache: dict[int, tuple] = {}

    def _curriculum_store(d):
        # the documented production posture: corpus AND score store
        # persisted bucketed by doc_id (build_score_store's contract),
        # so the curriculum join is exchange-free — built once per
        # corpus (the gate-time pass; rep 1 pays it, min-of-reps then
        # times curriculum-from-store itself)
        from ballista_extensions_spark.io import write_bucketed
        from ballista_extensions_spark.operators.scorestore import (
            build_score_store,
            curriculum_from_scores,
        )

        spark = d.sparkSession
        cached = _score_cache.get(id(d))
        if cached is None:
            n = len(_score_cache)
            dt, st = f"smoke_curr_docs_{n}", f"smoke_curr_scores_{n}"
            write_bucketed(
                d.filter(F.col("text").isNotNull()).select(
                    "doc_id", "text"
                ),
                dt, "doc_id", 32, sort_by="doc_id",
            )
            build_score_store(d, st, buckets=32)
            # hold d in the cache value: the id(d) key stays valid
            # (no GC id-reuse) for the run; tables drop at exit below
            cached = (d, dt, st)
            _score_cache[id(d)] = cached
        _, dt, st = cached
        return curriculum_from_scores(
            spark.table(dt), spark.table(st), 2048, 20260815
        ).count()

    _posting_cache: dict[int, tuple] = {}
    _PROBE_TERMS = ("vector", "spark", "merge", "filter")

    def _posting_probe(d):
        # store built once per corpus (the ingest-time pass; rep 1 of
        # the FIRST probe pays nothing extra since build happens before
        # timing starts inside this helper's memo-miss branch — the
        # timed op is bm25_from_store alone on later reps via min-of-n)
        from ballista_extensions_spark.operators.postingstore import (
            bm25_from_store,
            build_posting_store,
        )

        spark = d.sparkSession
        cached = _posting_cache.get(id(d))
        if cached is None:
            pt = f"smoke_postings_{len(_posting_cache)}"
            build_posting_store(d, pt, buckets=32)
            cached = (d, pt)
            _posting_cache[id(d)] = cached
        _, pt = cached
        return len(bm25_from_store(spark, pt, _PROBE_TERMS, 20).collect())

    def _posting_batch(d):
        # deterministic 220-query suite: all 2- and 3-subsets of a
        # 12-word lexicon drawn from the corpus domain (no RNG)
        import itertools

        from ballista_extensions_spark.operators.postingstore import (
            bm25_batch_topk,
        )

        spark = d.sparkSession
        cached = _posting_cache.get(id(d))
        if cached is None:
            # share the probe op's store (built on miss, same corpus)
            _posting_probe(d)
            cached = _posting_cache[id(d)]
        _, pt = cached
        lex = (
            "vector", "spark", "merge", "filter", "data", "model",
            "training", "quality", "join", "stream", "token", "batch",
        )
        suite = [
            (i, list(c))
            for i, c in enumerate(
                list(itertools.combinations(lex, 2))
                + list(itertools.combinations(lex, 3))[:154]
            )
        ]
        queries = spark.createDataFrame(
            suite, "query_id long, terms array<string>"
        )
        return bm25_batch_topk(spark, pt, queries, k=10).count()

    _posting_inc_cache: dict[int, tuple] = {}

    def _posting_ingest(d):
        # FIXED increment (original-copy doc_ids ≡ 3 mod 7) extended
        # into a store built from everything else: ingest cost must be
        # flat vs store size (the extend plan never scans stored
        # postings)
        from ballista_extensions_spark.operators.postingstore import (
            build_posting_store,
            extend_posting_store,
        )

        inc_pred = (F.col("doc_id") % 7 == 3) & (
            F.col("doc_id") < F.lit(n_docs)
        )
        cached = _posting_inc_cache.get(id(d))
        if cached is None:
            pt = f"smoke_postings_inc_{len(_posting_inc_cache)}"
            build_posting_store(d.filter(~inc_pred), pt, buckets=32)
            cached = (d, pt)
            _posting_inc_cache[id(d)] = cached
        _, pt = cached
        handle = extend_posting_store(d.filter(inc_pred), pt, buckets=32)
        return handle is not None

    def _line_rep(d):
        from ballista_extensions_spark.operators.text import (
            line_repetition_stats,
        )

        out = line_repetition_stats(d)
        return out.agg(
            F.sum("n_lines").alias("l"),
            F.sum("dup_line_char_frac").alias("c"),
            F.sum("dup_para_char_frac").alias("p"),
        ).collect()[0]["l"]

    def _shards(d):
        from ballista_extensions_spark.operators.shards import (
            training_shard_manifest,
        )

        man = training_shard_manifest(d, 2048, 20260816)
        return man.agg(F.sum("n_docs").alias("n")).collect()[0]["n"]

    def _shards_inc(d):
        from ballista_extensions_spark.operators.shards import (
            extend_training_shards,
            training_shard_manifest,
        )

        base = d.filter(F.col("text").isNotNull())
        b1 = base.filter(F.col("doc_id") % 3 < 2)
        b2 = base.filter(F.col("doc_id") % 3 == 2)
        hist = training_shard_manifest(b1, 2048, 3)
        inc = extend_training_shards(b2, hist, 2048, 4)
        return inc.agg(F.sum("n_docs").alias("n")).collect()[0]["n"]

    def _shards_bpe(d):
        from ballista_extensions_spark.operators.bpe_stream import (
            FROZEN_STREAM_MERGES,
            bpe_stream_token_counts,
        )
        from ballista_extensions_spark.operators.shards import (
            training_shard_manifest,
        )

        base = d.filter(F.col("text").isNotNull())
        counts = bpe_stream_token_counts(
            base, FROZEN_STREAM_MERGES
        ).select("doc_id", F.col("n_tokens").alias("bpe_tokens"))
        with_cost = base.select("doc_id", "text").join(counts, "doc_id")
        man = training_shard_manifest(
            with_cost, 4096, 20260817, cost_col="bpe_tokens"
        )
        return man.agg(F.sum("n_docs").alias("n")).collect()[0]["n"]

    def _packing(d):
        from ballista_extensions_spark.operators.packing import (
            pack_sequences_manifest,
        )

        base = d.filter(F.col("text").isNotNull())
        man = pack_sequences_manifest(base, 1024, 20260816)
        return man.agg(F.sum("n_tokens").alias("n")).collect()[0]["n"]

    def _packed_emit(d):
        from ballista_extensions_spark.operators.bpe_stream import (
            FROZEN_STREAM_MERGES,
        )
        from ballista_extensions_spark.operators.packing import (
            emit_packed_sequences,
        )

        seqs = emit_packed_sequences(d, FROZEN_STREAM_MERGES, 1024, 7)
        return seqs.agg(F.sum("n_tokens").alias("n")).collect()[0]["n"]

    def _curriculum(d):
        from ballista_extensions_spark.operators.qualityclassifier import (
            quality_logit_sql,
        )
        from ballista_extensions_spark.operators.shards import (
            assign_training_shards,
            manifest_agg,
        )

        base = d.filter(F.col("text").isNotNull())
        scored = base.select(
            "doc_id",
            "text",
            F.expr(
                f"CAST(floor(({quality_logit_sql('text')}) * 1000000.0)"
                " AS BIGINT)"
            ).alias("qscore"),
        )
        assigned = assign_training_shards(
            scored, 2048, 20260815, carry_cols=("qscore",)
        )
        man = manifest_agg(
            assigned,
            (
                F.sum("qscore").cast("double")
                / F.lit(1e6)
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_score"),
        )
        return man.count()

    def _pretok(d):
        from ballista_extensions_spark.operators.pretokenize import (
            pretok_segments_sql_spark,
            seg_sig_sql_spark,
        )

        base = d.filter(F.col("text").isNotNull())
        segged = base.select(
            "doc_id",
            F.expr(pretok_segments_sql_spark("text")).alias("segs"),
        )
        return segged.select(
            F.expr("size(segs)").alias("n"),
            F.expr(seg_sig_sql_spark("segs")).alias("sig"),
        ).agg(
            F.sum("n").alias("t"), F.sum("sig").alias("s")
        ).collect()[0]["t"]

    def _nfc(d):
        from ballista_extensions_spark.functions.udf import (
            py_nfc_normalize,
        )

        base = d.filter(F.col("text").isNotNull())
        return _mat(
            base.select(
                "doc_id",
                F.length(py_nfc_normalize(F.col("text"))).alias("n"),
            )
        )

    def _mm_funnel(d):
        from ballista_extensions_spark.operators.imagedup import (
            image_dhash,
        )
        from ballista_extensions_spark.operators.multimodal import (
            detect_media_kind,
            docs_as_png_media,
        )

        base = d.filter(F.col("text").isNotNull()).localCheckpoint(
            eager=False
        )
        text_part = base.filter(F.col("doc_id") % 2 == 0).select(
            F.col("doc_id").alias("media_id"),
            F.col("text").cast("binary").alias("payload"),
        )
        png_part = docs_as_png_media(base.filter(F.col("doc_id") % 2 == 1))
        mixed = text_part.unionByName(png_part)
        routed = mixed.withColumn("kind", detect_media_kind("payload"))
        tkeep = (
            routed.filter(F.col("kind") != "png")
            .groupBy(F.md5("payload").alias("h"))
            .agg(F.min("media_id").alias("keep_id"))
            .count()
        )
        ikeep = (
            image_dhash(routed.filter(F.col("kind") == "png"))
            .groupBy("dhash")
            .agg(F.min("id").alias("keep_id"))
            .count()
        )
        return tkeep + ikeep

    def _dsir_budget(d):
        from pyspark.sql import functions as FF

        from ballista_extensions_spark.operators.dsir import (
            dsir_logweights,
        )
        from ballista_extensions_spark.operators.text import (
            budget_prefix_select,
            tokens,
        )

        base = d.filter(FF.col("text").isNotNull())
        with_cost = base.select(
            "doc_id",
            FF.size(tokens(FF.col("text"))).cast("long").alias("n_tokens"),
            "text",
        )
        scored = dsir_logweights(with_cost, keep=("n_tokens",)).drop(
            "n_feats"
        )
        total = scored.agg(FF.sum("n_tokens").alias("t")).collect()[0]["t"]
        sel = budget_prefix_select(
            scored, int(total * 0.55),
            cost_col="n_tokens", score_col="logweight",
        )
        return sel.agg(FF.sum("n_tokens").alias("t")).collect()[0]["t"]

    def _dsir(d):
        from ballista_extensions_spark.operators.dsir import dsir_logweights

        return dsir_logweights(d).agg(
            F.sum("n_feats").alias("nf"),
            F.min("logweight").alias("lo"),
            F.max("logweight").alias("hi"),
        ).collect()[0]["nf"]

    def _bpe_stream(d):
        from ballista_extensions_spark.operators.bpe_stream import (
            FROZEN_STREAM_MERGES,
            bpe_stream_token_counts,
        )

        return bpe_stream_token_counts(d, FROZEN_STREAM_MERGES).agg(
            F.sum("n_tokens").alias("t")
        ).collect()[0]["t"]

    def _quality(d):
        from ballista_extensions_spark.operators.qualityclassifier import (
            quality_scores,
        )

        return quality_scores(d).agg(
            F.sum(F.col("passes").cast("long")).alias("p"),
            F.sum("n_words").alias("w"),
        ).collect()[0]["w"]

    def _semdedup(em, trained=False):
        # trained=True is the PRODUCTION configuration: k-means cells
        # adapt to the data so cell sizes stay balanced; the lattice
        # variant (the oracle-checkable correctness twin) assigns by
        # data-independent points and skews, so its exponent leans on
        # the distinct-vector collapse alone
        from ballista_extensions_spark.operators import semdedup as SD
        from ballista_extensions_spark.operators.annstore import (
            lattice_centroids,
            train_centroids,
        )

        n = em.count()
        n_lists = max(8, n // 125)  # ~125 vectors/cell at every scale
        cents = (
            train_centroids(em, n_lists, seed=42)
            if trained
            else lattice_centroids(n_lists, 64)
        )
        # aggregate over kept: a bare count() lets Catalyst remove the
        # final join-to-distinct entirely (unique-per-key aggregate)
        # and would time assignment only, never the pairwise stage
        return (
            SD.semantic_dedup(em, cents, tau=0.4)
            .agg(F.sum(F.col("kept").cast("int")).alias("k"))
            .collect()[0]["k"]
        )

    def _crawl(d):
        # the SAME body as the crawl_curation_pipeline query (shared
        # via webprep.crawl_curation_funnel — a hand-copied smoke body
        # diverged once; code-review r12), materialized fully
        from ballista_extensions_spark.operators.webprep import (
            crawl_curation_funnel,
            docs_fixture_frontier_key,
        )

        rows = crawl_curation_funnel(d, docs_fixture_frontier_key()).collect()
        return sum(r["n_gated"] for r in rows)

    def _bpe(d):
        from ballista_extensions_spark.operators.bpe import (
            FROZEN_MERGES,
            bpe_token_counts,
        )

        return bpe_token_counts(d, FROZEN_MERGES).agg(
            F.sum("n_tokens").alias("t")
        ).collect()[0]["t"]

    def _url_dedup(d):
        from ballista_extensions_spark.operators.webprep import (
            docs_as_urls,
            url_dedup,
        )

        return url_dedup(docs_as_urls(d)).count()

    def _html_extract(d):
        from ballista_extensions_spark.operators.webprep import (
            docs_as_html,
            html_extract_stats,
        )

        return _mat(html_extract_stats(docs_as_html(d)))

    def _compress(d):
        from ballista_extensions_spark.operators.text import (
            compression_stats,
        )

        return compression_stats(d).count()

    def _snap_diff(d):
        from ballista_extensions_spark.operators.dedup import (
            corpus_snapshot_diff,
        )

        old_snap = d.filter(F.col("doc_id") % 7 != 0)
        new_snap = d.filter(F.col("doc_id") % 5 != 0).withColumn(
            "text",
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(F.col("text"), F.lit(" [rev2]")),
            ).otherwise(F.col("text")),
        )
        return corpus_snapshot_diff(old_snap, new_snap).count()

    def _drift(em):
        from ballista_extensions_spark.operators.similarity import (
            centroid_drift,
        )

        return centroid_drift(
            em.withColumn("batch", F.col("vec_id") % 5), "batch",
            ref_batch=0,
        ).count()

    def _token_quartiles(d):
        from ballista_extensions_spark.operators.prefix import (
            grouped_percentile_disc,
        )

        s = d.select(
            "lang", T.token_count(F.col("text")).alias("n_tokens"), "doc_id"
        )
        return grouped_percentile_disc(
            s, "lang", "n_tokens", [0.25, 0.5, 0.75],
            tiebreak_cols=("doc_id",),
        ).count()

    def _heavy_hitters(d):
        from ballista_extensions_spark.operators.frequent import exact_top_k

        toks = d.select(
            F.explode(F.expr(T.TOKENS_SQL.format(col="text"))).alias("tok")
        ).filter(F.length("tok") > 0)
        return exact_top_k(toks, "tok", k=30, counters=4096).count()

    def _mix(d):
        from ballista_extensions_spark.operators.mixing import (
            resample_to_mixture,
        )

        weights = {"en": 0.5, "de": 0.125, "fr": 0.125, "es": 0.125,
                   "zh": 0.125}
        return resample_to_mixture(
            d.select("lang", "doc_id"), "lang", weights, "doc_id"
        ).count()

    def _pctl(d):
        from ballista_extensions_spark.operators.prefix import (
            distributed_percentile_disc,
        )

        return distributed_percentile_disc(
            d.select("n_chars", "doc_id"),
            "n_chars",
            [0.1, 0.5, 0.9, 0.99],
            tiebreak_cols=("doc_id",),
        ).count()

    def _sweep(ev):
        from ballista_extensions_spark.operators.intervals import (
            interval_concurrency,
        )

        iv = ev.select(
            F.col("ts").alias("s"),
            F.expr("timestampadd(MINUTE, CAST(value AS INT), ts)").alias("e"),
        )
        return interval_concurrency(iv, "s", "e").count()

    def _gapfill(ev):
        from ballista_extensions_spark.operators.timeseries import (
            time_bucket_gapfill,
        )

        return time_bucket_gapfill(
            ev,
            "ts",
            ["user_id"],
            [
                F.count(F.lit(1)).cast("long").alias("n_events"),
                F.max("value").alias("max_value"),
            ],
            bucket="hour",
            zero_cols=["n_events"],
            locf_cols=["max_value"],
        ).count()

    def _bloom_join(ev):
        from ballista_extensions_spark.functions.bloom import (
            bloom_filtered_join,
        )

        # ~1/50 of users survive: the guaranteed-prune shape — most probe
        # rows die before the join exchange.
        keep = (
            ev.select("user_id")
            .distinct()
            .filter(F.col("user_id") % 50 == 0)
        )
        return bloom_filtered_join(ev, keep, "user_id").count()

    def _ols(ev):
        from ballista_extensions_spark.operators.regression import group_ols

        return group_ols(
            ev.filter(F.col("value").isNotNull()),
            ["event_type"],
            F.hour("ts").cast("long"),
            F.col("value"),
        ).count()

    def _hamming(em):
        from ballista_extensions_spark.operators.similarity import (
            sign_pack64,
        )
        from pyspark.sql.window import Window

        sig = sign_pack64(em)
        probes = sig.filter(F.col("vec_id") % 199 == 0).select(
            F.col("vec_id").alias("probe_id"), F.col("sig").alias("psig")
        )
        scored = (
            sig.crossJoin(F.broadcast(probes))
            .filter(F.col("vec_id") != F.col("probe_id"))
            .select(
                "probe_id",
                "vec_id",
                F.bit_count(F.col("psig").bitwiseXOR(F.col("sig")))
                .cast("long")
                .alias("hamming"),
            )
            .withColumn("__pid", F.spark_partition_id())
        )
        lw = Window.partitionBy("probe_id", "__pid").orderBy(
            "hamming", "vec_id"
        )
        fw = Window.partitionBy("probe_id").orderBy("hamming", "vec_id")
        return (
            scored.withColumn("l", F.row_number().over(lw))
            .filter(F.col("l") <= 10)
            .withColumn("r", F.row_number().over(fw))
            .filter(F.col("r") <= 10)
            .count()
        )

    def _skyline(ev):
        from ballista_extensions_spark.operators.skyline import skyline_2d

        pts = ev.select(
            F.col("value").cast("int").alias("lvl"), "event_id"
        )
        return skyline_2d(pts, "lvl", "event_id").count()

    def _grouped_pctl(ev):
        from ballista_extensions_spark.operators.prefix import (
            grouped_percentile_disc,
        )

        return grouped_percentile_disc(
            ev.select("event_type", "value", "event_id"),
            "event_type",
            "value",
            [0.1, 0.5, 0.9],
            tiebreak_cols=("event_id",),
        ).count()

    def _wmedian(ev):
        from ballista_extensions_spark.operators.prefix import (
            distributed_cumsum,
        )

        w = ev.select(
            F.col("value").alias("v"),
            (F.pmod(F.col("event_id"), F.lit(7)) + 1)
            .cast("decimal(12,2)")
            .alias("wt"),
            "event_id",
        )
        cum = distributed_cumsum(w, ["v", "event_id"], "wt", out_col="cw")
        tot = w.agg(F.sum("wt").alias("tot"))
        return (
            cum.crossJoin(F.broadcast(tot))
            .filter(F.col("cw") >= F.lit("0.5").cast("decimal(2,1)") * F.col("tot"))
            .agg(F.min("v"))
            .count()
        )

    def _cdc(ev):
        snapshot = ev.filter(F.col("event_id") % 10 != 9)
        last = F.col("event_id") % 10
        changes = ev.filter(last.isin(9, 0, 1)).select(
            F.col("event_id").alias("c_id"),
            F.when(last == 9, F.lit("I"))
            .when(last == 0, F.lit("U"))
            .otherwise(F.lit("D"))
            .alias("op"),
        )
        merged = snapshot.join(
            changes, snapshot["event_id"] == changes["c_id"], "full_outer"
        ).filter(F.col("op").isNull() | (F.col("op") != "D"))
        return merged.count()

    def _pit(ev):
        # pit_priority_revenue's shape (VERDICT r7 directive #6): SCD2
        # compaction of a per-key attribute history, then the
        # point-in-time interval join + rollup.
        from ballista_extensions_spark.operators.weighted import scd2_compact

        dim = scd2_compact(
            ev.select("user_id", "ts", "event_id", "event_type"),
            "user_id",
            ["ts", "event_id"],
            "event_type",
        ).select(
            F.col("user_id").alias("d_user"),
            F.col("event_type").alias("pit_type"),
            "valid_from",
            "valid_to",
        )
        joined = ev.join(
            dim,
            (ev["user_id"] == dim["d_user"])
            & (dim["valid_from"] <= ev["ts"])
            & (dim["valid_to"].isNull() | (ev["ts"] < dim["valid_to"])),
        )
        return joined.groupBy("pit_type").count().count()

    def _rolling(ev):
        # orders_rolling_7d_revenue's shape: RANGE-framed window over a
        # value axis, partitioned by the natural key.
        from pyspark.sql.window import Window as W

        d = ev.select(
            "user_id",
            "event_id",
            (F.unix_timestamp("ts") / 3600).cast("long").alias("hr"),
            F.col("value").cast("decimal(12,2)").alias("v"),
        )
        w = W.partitionBy("user_id").orderBy("hr").rangeBetween(-6, 0)
        return d.select(
            "user_id", "event_id", F.sum("v").over(w).alias("roll")
        ).count()

    def _mad(ev):
        # events_value_mad_anomalies' shape: two chained grouped
        # percentiles (global distributed rank each) + broadcast
        # re-joins + one aggregate.
        from ballista_extensions_spark.operators.prefix import (
            grouped_percentile_disc,
        )

        vals = ev.select("event_type", "value", "event_id")
        med = grouped_percentile_disc(
            vals, "event_type", "value", [0.5], tiebreak_cols=("event_id",)
        ).select(
            F.col("event_type").alias("__g"),
            F.col("value").alias("med"),
        )
        withmed = vals.join(
            F.broadcast(med), vals["event_type"].eqNullSafe(med["__g"])
        ).withColumn("dev", F.abs(F.col("value") - F.col("med")))
        mad = grouped_percentile_disc(
            withmed.select("event_type", "dev", "event_id"),
            "event_type",
            "dev",
            [0.5],
            tiebreak_cols=("event_id",),
        ).select(F.col("event_type").alias("__g2"), F.col("dev").alias("mad"))
        # round-9 shape: ONE combined broadcast stats frame, single
        # fact re-join (mirrors events_value_mad_anomalies at HEAD)
        stats = med.join(
            mad, med["__g"].eqNullSafe(mad["__g2"])
        ).select("__g", "med", "mad")
        return (
            vals.join(
                F.broadcast(stats),
                vals["event_type"].eqNullSafe(stats["__g"]),
            )
            .groupBy("event_type")
            .agg(
                F.sum(
                    F.when(
                        F.abs(F.col("value") - F.col("med"))
                        > 3 * F.col("mad"),
                        1,
                    ).otherwise(0)
                ).alias("n_anomalies")
            )
            .count()
        )

    def _user_p95_window(ev):
        # events_user_p95_value's shape: HIGH-cardinality group key via
        # PARTITION BY — parallelism grows with keys; the crossover
        # complement of grouped_percentile_disc below.
        from pyspark.sql.window import Window as W

        w = W.partitionBy("user_id").orderBy("value", "event_id")
        wn = W.partitionBy("user_id")
        r = ev.select(
            "user_id",
            "value",
            F.row_number().over(w).cast("long").alias("rn"),
            F.count(F.lit(1)).over(wn).cast("long").alias("n"),
        )
        return r.filter(
            (20 * F.col("rn") >= 19 * F.col("n"))
            & (20 * (F.col("rn") - 1) < 19 * F.col("n"))
        ).count()

    def _user_p95_grouped(ev):
        # the SAME high-cardinality task forced through
        # grouped_percentile_disc (built for FEW groups): its global
        # rank + per-group offset frame costs more as the group count
        # approaches the row count — measured, not asserted, so
        # BASELINE.md can state the crossover empirically.
        from ballista_extensions_spark.operators.prefix import (
            grouped_percentile_disc,
        )

        return grouped_percentile_disc(
            ev.select("user_id", "value", "event_id"),
            "user_id",
            "value",
            [0.95],
            tiebreak_cols=("event_id",),
        ).count()

    def _interarrival(ev):
        # orders_interarrival_median's shape: per-key LAG gap feeds the
        # GLOBAL distributed percentile (range-partitioned rank, no
        # single-task sort).
        from ballista_extensions_spark.operators.prefix import (
            distributed_percentile_disc,
        )
        from pyspark.sql.window import Window as W

        w = W.partitionBy("user_id").orderBy("ts", "event_id")
        g = ev.select(
            "user_id",
            "event_id",
            (
                F.unix_timestamp("ts")
                - F.unix_timestamp(F.lag("ts").over(w))
            ).alias("gap"),
        ).filter(F.col("gap").isNotNull())
        return distributed_percentile_disc(
            g, "gap", [0.5], tiebreak_cols=("user_id", "event_id")
        ).count()

    def _sample_audit(ev):
        # sample_contract_audit's expensive checks (Bernoulli count +
        # band arithmetic, determinism set-equality via full-outer join,
        # stratified per-stratum counts) over the amplified corpus: the
        # audit's cost model is a few narrow scans + O(1) aggregates,
        # so its exponent should be near zero at these scales.
        from ballista_extensions_spark.operators.sample import (
            sample,
            sample_by,
        )

        s1 = sample(ev, 0.3, seed=7).select("event_id")
        s2 = sample(ev, 0.3, seed=7).select(
            F.col("event_id").alias("e2")
        )
        mism = (
            s1.join(s2, s1["event_id"] == s2["e2"], "full_outer")
            .filter(F.col("event_id").isNull() | F.col("e2").isNull())
            .count()
        )
        kept = s1.count()
        strata = sample_by(
            ev, "event_type", {"click": 0.5, "view": 0.25}, seed=11
        )
        per = strata.groupBy("event_type").count().count()
        return mism + kept + per

    ev_ops = {
        "interval_sweepline": _sweep,
        "gapfill_locf": _gapfill,
        "bloom_filtered_join": _bloom_join,
        "group_ols": _ols,
        # round-7 operators
        "skyline_2d": _skyline,
        "grouped_percentile_disc": _grouped_pctl,
        "weighted_median_cumsum": _wmedian,
        "cdc_merge": _cdc,
        # round-8 (VERDICT r7 directive #6): the unmeasured r7 shapes
        "pit_scd2_join": _pit,
        "rolling_range_window": _rolling,
        "grouped_mad_anomalies": _mad,
        # round-9 (VERDICT r8 directive #3): the round-8 shapes + the
        # grouped-vs-window percentile cardinality crossover + one
        # contract-audit battery
        "user_p95_window": _user_p95_window,
        "user_p95_grouped": _user_p95_grouped,
        "interarrival_median": _interarrival,
        "sample_audit_battery": _sample_audit,
    }

    print(f"| op | t_1x (s) | t_{factor}x (s) | exponent |")
    print("|---|---|---|---|")
    import math

    import gc

    # min-of-2 per scale: the first execution of a plan shape pays
    # whole-stage-codegen compilation and JIT warmup, which measured up
    # to 3x on the heavy pair joins (near_dup_exact_full 58s first /
    # 19s second in one process) — the min is the steady-state cost the
    # exponent claim is about.
    reps = int(os.environ.get("SPARK_GRAFT_SMOKE_REPS", "2"))

    def best(fn, args):
        ts = []
        for _ in range(reps):
            t0 = time.time()
            r = fn(*args)
            ts.append(time.time() - t0)
            if r is None:
                return None
        return min(ts)

    only = set(sys.argv[3:])
    ops.update(_media_ops())
    runs = [(name, fn, (docs1, emb1), (docs10, emb10))
            for name, fn in ops.items()]
    runs += [(name, fn, (ev1,), (ev10,)) for name, fn in ev_ops.items()]
    if only:
        runs = [r for r in runs if r[0] in only]
    for name, fn, args1, args10 in runs:
        try:
            t1 = best(fn, args1)
            if t1 is None:
                continue
            t10 = best(fn, args10)
            exp = math.log(t10 / t1) / math.log(factor)
            print(f"| {name} | {t1:.2f} | {t10:.2f} | {exp:.2f} |")
        except Exception as e:  # noqa: BLE001
            print(f"| {name} | ERROR {type(e).__name__}: {str(e)[:300]} | | |")
        # release each op's lazily-checkpointed frames before the next
        # op's run — in local mode those blocks share the one JVM with
        # broadcast build memory
        gc.collect()

    # drop the measurement tables of the store-backed ops (the only
    # ops with persistent side effects; every other op is
    # side-effect-free)
    for _, dt, st in _score_cache.values():
        for t in (dt, st):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
    from ballista_extensions_spark.operators.postingstore import (
        drop_posting_store,
    )

    for cache in (_posting_cache, _posting_inc_cache):
        for _, pt in cache.values():
            drop_posting_store(spark, pt)


if __name__ == "__main__":
    main()
