"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the point of these ops is the 100 TB corpus case):

- exact dedup: one hash-shuffle on the (normalized) text — Spark's
  group-by does map-side partial aggregation of the min-id per key, so
  the exchange carries one row per distinct document, not per input row.
- MinHash+LSH: signatures are computed per-row (narrow, codegen'd
  xxhash64); banding explodes each doc into B rows; the candidate join is
  an equi-join on (band, band_hash) whose bucket sizes are controlled by
  the LSH parameters, never an all-pairs product. Verification joins
  shingle sets back only for candidate pairs.
- SimHash: one 64-bit signature per doc computed in a single fold; near
  neighbors found by banding the signature into 16-bit chunks (exact for
  Hamming distance <= 3 with 4 chunks, by pigeonhole).
- exact n-gram Jaccard: inverted-index join with a stop-shingle df cap —
  posting lists are bounded at max_df so the join stays linear in the
  corpus; the LSH variants remain the corpus-vs-corpus scale path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ballista_extensions_spark.io import ensure_parallelism
from ballista_extensions_spark.operators.text import (
    TOKENS_SQL,
    normalize,
    normalize_sql,
    shingle_expr,
)

# Affine 64-bit rehash family for MinHash: one xxhash64 per shingle, then
# mh_i = min(h * A_i + B_i) with odd multipliers (a bijection on Z_2^64,
# wrapping multiply — Spark non-ANSI long arithmetic wraps like Java).
# ~16x cheaper than hashing the shingle string once per hash function.
_M64 = (1 << 64) - 1


def _signed64(v: int) -> int:
    v &= _M64
    return v - (1 << 64) if v >= (1 << 63) else v


def _affine_consts(i: int) -> tuple[int, int]:
    a = _signed64(0x9E3779B97F4A7C15 * (2 * i + 1))
    b = _signed64(0xC2B2AE3D27D4EB4F * (i * i + i + 1))
    return a, b


def dedup_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalized: bool = False,
) -> DataFrame:
    """Exact dedup: one representative (min id) per distinct text.

    Returns (keep_id, n_copies, text_hash) — the md5 keeps the output
    narrow regardless of document size. Scale: single shuffle, map-side
    combine; the heavy `text` column is reduced to its hash before the
    exchange when possible (group key is the text itself, so at true 100
    TB you'd group by (length, md5) to avoid shuffling full texts — we
    group by md5 here for exactly that reason; md5 collisions are
    negligible and acceptable for dedup semantics).
    """
    key = normalize(F.col(text_col)) if normalized else F.col(text_col)
    return (
        df.select(F.col(id_col), F.md5(key).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).cast("long").alias("keep_id"),
            F.count(F.lit(1)).cast("long").alias("n_copies"),
        )
        .select("keep_id", "n_copies", "text_hash")
    )


def _with_shingles(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    tok_sql = TOKENS_SQL.format(col=text_col)
    return ensure_parallelism(df).select(
        F.col(id_col).alias("doc"),
        F.array_distinct(shingle_expr(tok_sql, n)).alias("shingles"),
    )


def near_dup_pairs_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    probe_mod: int = 10,
    max_df: int = 100,
    capped: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity of a probe subset vs the corpus,
    with a stop-shingle document-frequency cap.

    For each probe doc (id % probe_mod == 0), every corpus doc with
    jaccard(shingles_a, shingles_b) >= threshold, where both the
    intersection and the set sizes are computed over shingles appearing
    in at most ``max_df`` documents (numerator and denominator alike —
    the oracle applies the identical cap, so the ratio of small ints
    stays bit-exact across engines).

    Scale: inverted-index join — postings are keyed by shingle, so cost
    is sum over shingles of (probe-df x corpus-df). Without a cap one
    ubiquitous shingle at web scale has an O(corpus) posting list and
    that single key makes the join quadratic; the df cap bounds every
    posting list at max_df, so the join is at most max_df x |postings| —
    linear in the corpus for a fixed cap. Dropped shingles are the
    boilerplate head of the distribution and carry no discriminative
    signal. Use the MinHash path for fuzzy corpus-vs-corpus dedup.

    probe_mod == 1 (full corpus vs itself) switches pair generation to
    the grouped-postings shape the char-ngram variant uses: one shuffle
    of capped postings into per-shingle doc arrays (bounded at max_df by
    construction), then the C(df,2) pairs generated JVM-side inside each
    array — the self-join shape would shuffle every posting twice
    through a two-sided join for the same result (measured ~2x slower
    at sf0.1).
    """
    # Inverted index: explode to (doc, shingle) postings, equi-join probe
    # vs corpus postings on the shingle, count matches per pair = exact
    # intersection size. Replaces the |probe| x |corpus| product with a
    # shuffle join keyed by shingle — pairs sharing zero shingles (which
    # can never reach a positive threshold) are never materialized.
    #
    # The posting front is the SAME _capped_word_postings helper the LSH
    # and incremental paths use (r17, guide §2.4): identical
    # construction canonicalizes identically, so a plan that runs both
    # the exact and LSH-verified paths over one corpus (the
    # probabilistic audit) serves every consumer from ONE physical
    # posting/cap exchange via ReusedExchange instead of re-tokenizing
    # per branch. See _word_postings for why positions explode
    # codegen'd (~7x) and _capped_word_postings for the stop-shingle
    # cap/AQE notes. The per-doc set size is a count over the same
    # distinct exchange, which every downstream branch reuses.
    # ``capped``: a caller that ALSO runs the LSH-verified path over
    # the same corpus (the probabilistic audit) passes one materialized
    # capped-posting frame so both paths share a single tokenize pass
    # (r17 — the two constructions differ physically, so ReusedExchange
    # never fired across them).
    if capped is None:
        capped = _capped_word_postings(df, text_col, id_col, n, max_df)
    sizes = capped.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    if probe_mod == 1:
        from ballista_extensions_spark.io import default_parallelism

        grouped = (
            capped.groupBy("s")
            .agg(F.sort_array(F.collect_list("doc")).alias("docs"))
            .filter(F.size("docs") >= 2)
            # explicit repartition before the pair explosion: AQE sees a
            # few-MB grouped-postings shuffle and coalesces it to a
            # handful of tasks, but the C(df,2) expansion is CPU-bound —
            # the same small-bytes/heavy-CPU case _verify_capped_jaccard
            # guards against (r17, guide §2.5)
            .repartition(default_parallelism(df.sparkSession))
        )
        pairs = grouped.select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(0, size(docs) - 2), "
                    "i -> transform(sequence(i + 1, size(docs) - 1), "
                    "j -> struct(docs[i] AS doc_a, docs[j] AS doc_b))))"
                )
            ).alias("p")
        ).select("p.doc_a", "p.doc_b")
        inter = pairs.groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("i"))
    else:
        probe_post = capped.filter((F.col("doc") % probe_mod) == 0).select(
            F.col("doc").alias("doc_a"), "s"
        )
        corpus_post = capped.select(F.col("doc").alias("doc_b"), "s")
        inter = (
            probe_post.join(
                corpus_post,
                (probe_post["s"] == corpus_post["s"])
                & (F.col("doc_a") < F.col("doc_b")),
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("i"))
        )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"))
    i_d = F.col("i").cast("double")
    union = F.col("sz_a").cast("double") + F.col("sz_b").cast("double") - i_d
    # no broadcast hint on the size joins: AQE picks broadcast while the
    # size table fits and falls back to shuffle join at corpus scale
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", (i_d / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def near_dup_pairs_lsh_verified(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    max_df: int = 100,
    bands: int = 64,
    rows_per_band: int = 2,
    capped: DataFrame | None = None,
) -> DataFrame:
    """Same contract as ``near_dup_pairs_exact(probe_mod=1)`` — all
    pairs with df-capped n-gram Jaccard >= threshold — but candidate
    generation is MinHash+LSH instead of the full inverted-index pair
    join. This is the corpus-vs-corpus 100 TB path the exact operator's
    docstring points at: candidate cost scales with the number of LSH
    bucket collisions, not with the full posting-list pair count.

    Design choices that keep it equivalent AND bounded:

    - Signatures are computed over the CAPPED shingle set (df <= max_df,
      the same cap verification uses), so MinHash estimates exactly the
      similarity being thresholded — not the uncapped similarity, which
      boilerplate shingles can push arbitrarily far from the capped one.
    - Banding defaults to b=64 bands of r=2 hashes: a pair with capped
      Jaccard s collides in >= 1 band with p = 1 - (1 - s^2)^64 — 99.98%
      at s=0.35 and ~1 above 0.5, while weakly-similar non-pairs are
      suppressed quadratically (s=0.05 collides ~14%, vs 71% under r=1
      banding — measured 9x fewer false candidates on the test corpus).
      The affine rehash family makes the 128 minhashes one xxhash64 per
      shingle plus cheap integer transforms.
    - Verification recomputes the identical capped-Jaccard ratio on the
      candidate pairs (small ints, bit-exact across engines), so false
      candidates die and every surviving pair carries the same jaccard
      value the exact operator would emit. Recall is probabilistic
      (missed-band pairs are lost — measured 100% on this corpus at the
      defaults); precision is exact. The candidate frame is explicitly
      repartitioned before the set-intersection join: AQE sees a
      few-MB shuffle and would coalesce it to one task, but the work is
      CPU-bound array_intersect over large string sets — the classic
      small-bytes/heavy-CPU case where AQE's size heuristic is wrong.
    """
    # checkpoint_posting: the three consumers (signature aggregation,
    # capped-set aggregation, and the df-cap's own distinct) cannot
    # share one exchange — RemoveRedundantAggregates legally drops the
    # distinct below the duplicate-insensitive min/collect_set
    # aggregates, so each consumer re-runs tokenize+explode from the
    # scan (measured 3x the tokenize work at sf0.1, the dominant cost
    # of this operator). Materializing the distinct postings once turns
    # that into ONE tokenize pass (guide §8 decide-on-small-rows: the
    # posting payload is derived once and re-read); blocks are released
    # by the ContextCleaner when the frame goes unreferenced.
    # ``capped``: see near_dup_pairs_exact — the probabilistic audit
    # passes one shared materialized frame for both paths.
    if capped is None:
        capped = _capped_word_postings(
            df, text_col, id_col, n, max_df, checkpoint_posting=True
        )
    # one shuffle to per-doc capped sets; both verification sides read
    # this SAME plan object, so Spark's ReusedExchange serves them from
    # one physical shuffle
    capped_sets = capped.groupBy("doc").agg(
        F.collect_set("s").alias("shset")
    )
    buckets = _minhash_band_buckets(capped, bands, rows_per_band)
    l = buckets.alias("a")
    r = buckets.alias("b")
    cands = (
        l.join(
            r,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    return _verify_capped_jaccard(
        cands, capped_sets, threshold, df.sparkSession
    )


def _word_postings(
    df: DataFrame, text_col: str, id_col: str, n: int,
    distinct: bool = True,
) -> DataFrame:
    """Raw distinct (doc, shingle) postings — the cap-free posting
    front (sigstore builds on this directly; the near-dup paths apply
    the df cap on top). Postings explode token POSITIONS (codegen'd
    int sequence) with the shingle built in the post-Generate
    projection; see near_dup_pairs_exact for why (the lambda-built
    alternative runs interpreted, ~7x slower).

    ``distinct=False`` skips the set-semantics shuffle for consumers
    whose downstream aggregates are duplicate-insensitive anyway
    (collect_set, MinHash min, countDistinct): their partial
    aggregation dedupes map-side, so the explicit distinct is a whole
    extra exchange of the posting payload for nothing (guide §2.4 —
    r17, used by streaming/storededup.py's sigstore sink)."""
    tok_sql = TOKENS_SQL.format(col=text_col)
    base = (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("doc"), F.expr(tok_sql).alias("toks"))
        .filter(F.size("toks") >= n)
    )
    pos = base.select(
        "doc",
        "toks",
        F.explode(F.expr(f"sequence(1, size(toks) - {n - 1})")).alias("i"),
    )
    out = pos.select(
        "doc", F.expr(f"array_join(slice(toks, i, {n}), ' ')").alias("s")
    )
    return out.distinct() if distinct else out


def _capped_word_postings(
    df: DataFrame, text_col: str, id_col: str, n: int, max_df: int,
    checkpoint_posting: bool = False,
) -> DataFrame:
    """(doc, shingle) postings with the stop-shingle df cap applied —
    the shared front of the exact, LSH and incremental near-dup paths.

    ``checkpoint_posting=True`` lazily localCheckpoints the distinct
    posting frame so the tokenize+explode pass runs ONCE no matter how
    many downstream consumers re-aggregate it (r17, guide §8:
    RemoveRedundantAggregates legally drops the distinct below
    duplicate-insensitive aggregates, so without materialization each
    consumer re-tokenizes from the scan). Callers whose consumers all
    share the one distinct exchange anyway (the exact pair join) keep
    the default."""
    if checkpoint_posting:
        # hash-partition by doc BEFORE the distinct: HashPartitioning
        # (doc) satisfies the (doc, s) clustering the dedup aggregate
        # requires, so the distinct costs no second exchange, and the
        # materialized blocks stay clustered by doc — every downstream
        # per-doc aggregate (capped sets, MinHash signatures) then runs
        # exchange-FREE off the checkpoint (guide §2.4: two operations
        # keyed the same way share one exchange).
        raw = _word_postings(df, text_col, id_col, n, distinct=False)
        posting = (
            raw.repartition("doc")
            .dropDuplicates()
            .localCheckpoint(eager=False)
        )
    else:
        posting = _word_postings(df, text_col, id_col, n)
    heavy = (
        posting.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df_s"))
        .filter(F.col("df_s") > max_df)
        .select("s")
    )
    return posting.join(heavy, "s", "left_anti")


def _minhash_sig_aggs(num_hashes: int) -> list[Column]:
    """The MinHash signature aggregate expressions: min(h*A_i+B_i) per
    hash function over a column ``h = xxhash64(s)``. Shared by
    :func:`_minhash_band_buckets` and by callers that fuse the
    signature aggregation with other per-doc aggregates into one
    shuffle (streaming/storededup.py computes signatures AND capped
    sets in a single groupBy so each micro-batch tokenizes once)."""
    sig_aggs: list[Column] = []
    for i in range(num_hashes):
        a, b = _affine_consts(i)
        sig_aggs.append(F.min(F.expr(f"h * {a}L + {b}L")).alias(f"m{i}"))
    return sig_aggs


def _band_explode(
    sigs: DataFrame, bands: int, rows_per_band: int
) -> DataFrame:
    """(doc, band_id, band_hash) rows from a per-doc signature frame
    carrying columns ``m0..m{bands*rows_per_band-1}``."""
    band_structs = []
    for bi in range(bands):
        cols = ", ".join(
            f"m{bi * rows_per_band + r_i}" for r_i in range(rows_per_band)
        )
        band_structs.append(
            f"struct({bi}L AS band_id, xxhash64({cols}) AS band_hash)"
        )
    return sigs.select(
        "doc",
        F.explode(F.expr(f"array({', '.join(band_structs)})")).alias("bd"),
    ).select("doc", "bd.band_id", "bd.band_hash")


def _minhash_band_buckets(
    capped: DataFrame, bands: int, rows_per_band: int
) -> DataFrame:
    """(doc, band_id, band_hash) LSH bucket rows from capped postings.

    Signatures are a wide codegen'd aggregate over the exploded capped
    postings (one row per (doc, shingle)): min(h*A_i+B_i) per hash
    function, map-side combined, whole-stage codegen. The per-doc
    array formulation (transform(shset, ...) x 128 lambdas) runs
    interpreted and measured ~2s slower at sf0.1 — higher-order
    functions sit outside codegen, the same cliff shingle_expr
    documents."""
    num_hashes = bands * rows_per_band
    sigs = (
        capped.select("doc", F.xxhash64("s").alias("h"))
        .groupBy("doc")
        .agg(*_minhash_sig_aggs(num_hashes))
    )
    return _band_explode(sigs, bands, rows_per_band)


def _verify_capped_jaccard(
    cands: DataFrame, capped_sets: DataFrame, threshold: float, spark
) -> DataFrame:
    """Exact capped-Jaccard verification of candidate pairs. The
    candidate frame is explicitly repartitioned first: AQE sees a few-MB
    shuffle and would coalesce it to one task, but the work is CPU-bound
    array_intersect over large string sets — the classic
    small-bytes/heavy-CPU case where AQE's size heuristic is wrong."""
    from ballista_extensions_spark.io import default_parallelism

    cands = cands.repartition(default_parallelism(spark))
    sa = capped_sets.select(
        F.col("doc").alias("doc_a"), F.col("shset").alias("sh_a")
    )
    sb = capped_sets.select(
        F.col("doc").alias("doc_b"), F.col("shset").alias("sh_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast(
        "double"
    )
    union = (
        F.size(F.col("sh_a")).cast("double")
        + F.size(F.col("sh_b")).cast("double")
        - inter
    )
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def incremental_near_dup_lsh(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    max_df: int = 100,
    bands: int = 64,
    rows_per_band: int = 2,
) -> DataFrame:
    """Near-dup pairs TOUCHING a new document batch: every pair
    (a, b), a < b, with df-capped n-gram Jaccard >= threshold where at
    least one side is in ``batch`` — within-batch pairs included. The
    daily-crawl-increment pattern: a full corpus-vs-corpus re-run per
    increment is O(corpus) even when the increment is tiny; here only
    BATCH band buckets drive the candidate join, so candidate cost is
    O(|batch| x bucket collisions), linear in the increment.

    Ids must be disjoint between corpus and batch. The df cap and set
    sizes are computed over corpus UNION batch — the same statistics a
    full re-run would use, so accepted pairs carry exactly the jaccard
    the corpus-wide operator (near_dup_pairs_lsh_verified) would emit;
    pytest asserts that restriction equality corpus-wide.

    At production scale the corpus side's capped sets and band buckets
    are write-once artifacts (persist them bucketed by band_hash /
    doc); this operator derives them from the corpus frame because the
    test corpus is small, but the batch-side-driven join shape — the
    part that matters — is identical either way."""
    all_docs = corpus.select(
        F.col(id_col), F.col(text_col)
    ).unionByName(batch.select(F.col(id_col), F.col(text_col)))
    capped = _capped_word_postings(all_docs, text_col, id_col, n, max_df)
    capped_sets = capped.groupBy("doc").agg(F.collect_set("s").alias("shset"))
    buckets = _minhash_band_buckets(capped, bands, rows_per_band)
    batch_ids = batch.select(F.col(id_col).alias("doc")).distinct()
    # no broadcast hint: AQE broadcasts the id list while it fits
    batch_buckets = buckets.join(batch_ids, "doc")
    cands = (
        batch_buckets.alias("a")
        .join(
            buckets.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc") != F.col("b.doc")),
        )
        # batch-batch pairs surface twice (each end drives once);
        # normalize direction, then distinct
        .select(
            F.least(F.col("a.doc"), F.col("b.doc")).alias("doc_a"),
            F.greatest(F.col("a.doc"), F.col("b.doc")).alias("doc_b"),
        )
        .distinct()
    )
    return _verify_capped_jaccard(
        cands, capped_sets, threshold, corpus.sparkSession
    )


def near_dup_pairs_char_ngram(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 6,
    threshold: float = 0.4,
    max_df: int = 150,
) -> DataFrame:
    """Exact character-n-gram Jaccard near-dup pairs over the whole
    corpus, with a stop-gram cap: n-grams appearing in more than
    ``max_df`` documents are dropped from every document's set *before*
    Jaccard (numerator and denominator alike — the oracle applies the
    identical cap, so results stay bit-exact).

    Character shingles catch near-dups that word shingles miss (small
    in-word edits, joined/split tokens). Their curse at corpus scale is
    ubiquitous grams (' the '-like) whose posting lists are O(corpus) —
    the self-join over one such gram alone is O(corpus^2). The df cap is
    the standard fix: it bounds every posting list at max_df, so the
    pair-generation join is at most max_df * |postings| — linear in the
    corpus for a fixed cap, and the dropped grams carry no discriminative
    signal anyway.

    Pipeline (all built-ins, no posting-level join): normalize ->
    explode POSITIONS (a cheap ``sequence`` of ints) -> substring in the
    codegen'd post-Generate projection -> ``distinct()`` to get the
    per-doc gram set (one shuffle whose exchange every downstream branch
    reuses) -> df per gram (partial-aggregated count) -> anti-join
    against the set of over-cap grams (AQE broadcasts it while it fits,
    shuffle anti-join beyond) -> group postings
    by gram into a doc array (bounded at max_df by construction) ->
    generate the C(df,2) doc pairs JVM-side with nested ``transform``
    inside each array -> per-pair counts -> Jaccard with the per-doc
    size table joined in (AQE broadcasts it while it fits).

    Two measured pitfalls shaped this (sf0.1, 5k docs, 1.16M postings):
    (1) ``explode`` over the gram-array expression itself is ~7x slower
    than exploding positions — the lambda-bearing array expression can't
    codegen inside Generate and dominates wall time (51s -> 6.6s here);
    (2) the posting-level self-join on gram shuffled every posting twice
    through a join of two multi-million-row string relations, while this
    shape shuffles postings once into bounded groups and everything else
    is map-side-combinable counts.
    """
    # ensure_parallelism: the explode below multiplies rows ~200x; a
    # single-row-group local parquet file would otherwise pin the whole
    # posting generation to one task (measured 6.0s -> 3.2s at sf0.1).
    norm = ensure_parallelism(df).select(
        F.col(id_col).alias("doc"),
        F.expr(normalize_sql(text_col)).alias("norm"),
    ).filter(F.length("norm") >= n)
    pos = norm.select(
        "doc", "norm", F.explode(F.expr(f"sequence(1, length(norm) - {n - 1})")).alias("i")
    )
    posting = pos.select(
        "doc", F.expr(f"substring(norm, i, {n})").alias("g")
    ).distinct()
    # grams past the df cap: usually a SMALL relation (the ubiquitous
    # head of the gram distribution) — but with a FIXED cap its size
    # still grows with the corpus, so no forced broadcast hint: AQE
    # converts the anti-join to broadcast while the heavy set fits and
    # falls back to a shuffle anti-join past the broadcast threshold.
    heavy = (
        posting.groupBy("g")
        .agg(F.count(F.lit(1)).alias("df_g"))
        .filter(F.col("df_g") > max_df)
        .select("g")
    )
    capped = posting.join(heavy, "g", "left_anti")
    sizes = capped.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))
    # one shuffle of capped postings into per-gram doc arrays; every
    # group is <= max_df rows by construction, so collect_list is safe
    # at any corpus size. Pair generation is pure codegen on the array.
    grouped = (
        capped.groupBy("g")
        .agg(F.sort_array(F.collect_list("doc")).alias("docs"))
        .filter(F.size("docs") >= 2)
    )
    pairs = grouped.select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(0, size(docs) - 2), "
                "i -> transform(sequence(i + 1, size(docs) - 1), "
                "j -> struct(docs[i] AS doc_a, docs[j] AS doc_b))))"
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")
    inter = pairs.groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("i"))
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"))
    i_d = F.col("i").cast("double")
    union = F.col("sz_a").cast("double") + F.col("sz_b").cast("double") - i_d
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", (i_d / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """Per-doc MinHash signature: for each hash function h_i (xxhash64
    seeded by i), the minimum over the doc's shingle set. Narrow op —
    everything happens inside the row's projection (codegen), no shuffle.
    Docs with no shingles get NULL minhashes and are excluded."""
    sh = _with_shingles(df, text_col, id_col, n).filter(F.size("shingles") > 0)
    hashed = sh.select(
        "doc", F.expr("transform(shingles, s -> xxhash64(s))").alias("hs")
    )
    sig_cols = []
    for i in range(num_hashes):
        a, b = _affine_consts(i)
        sig_cols.append(
            F.expr(f"array_min(transform(hs, h -> h * {a}L + {b}L))").alias(f"mh_{i}")
        )
    return hashed.select("doc", *sig_cols)


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
    rows_per_band: int = 4,
) -> DataFrame:
    """LSH banding: hash each band of the signature, explode to
    (band_id, band_hash, doc), self-join per bucket -> candidate pairs
    (doc_a < doc_b, distinct).

    Scale: the join key (band_id, band_hash) spreads uniformly (band_hash
    is a 64-bit hash); bucket skew only happens for genuinely identical
    band signatures, i.e. actual near-dups — bounded by cluster size, and
    AQE skew-join splits pathological buckets."""
    band_structs = []
    for b in range(bands):
        cols = ", ".join(
            f"mh_{b * rows_per_band + r}" for r in range(rows_per_band)
        )
        band_structs.append(f"struct({b}L AS band_id, xxhash64({cols}) AS band_hash)")
    exploded = (
        signatures.select(
            "doc",
            F.explode(F.expr(f"array({', '.join(band_structs)})")).alias("band"),
        )
        .select("doc", "band.band_id", "band.band_hash")
        # lazy localCheckpoint: the self-join below would otherwise
        # recompute the whole signature pipeline once per side. Unlike
        # .cache(), checkpoint blocks are released by the ContextCleaner
        # when this frame goes unreferenced, so a long-lived session
        # sweeping many queries doesn't accumulate block-manager state
        # (at corpus scale you'd persist the signature table explicitly).
        .localCheckpoint(eager=False)
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )


def dedup_near_minhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified with exact Jaccard.

    Pipeline: shingle -> minhash signature (narrow) -> LSH banding ->
    bucket equi-join -> exact Jaccard verification on candidates only.
    Output: (doc_a, doc_b, jaccard) pairs with jaccard >= threshold.
    Deterministic (xxhash64 fixed seeds) but engine-specific hash -> no
    SQL oracle; pytest checks recall vs near_dup_pairs_exact.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, n, num_hashes)
    cands = lsh_candidate_pairs(sigs, bands, rows_per_band)
    sh = _with_shingles(df, text_col, id_col, n)
    a = sh.select(F.col("doc").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc").alias("doc_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("double")
    union = (
        F.size(F.col("sh_a")).cast("double")
        + F.size(F.col("sh_b")).cast("double")
        - inter
    )
    return (
        cands.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash64(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """64-bit SimHash per document over whitespace tokens.

    For each bit position, sum +1/-1 votes of each token's xxhash64 bit,
    then take the sign of the total. Computed by exploding tokens,
    hashing each once, and aggregating 64 sums per doc — partial
    (map-side) aggregation collapses the exploded rows before the one
    shuffle on doc id, and the single xxhash64 per token beats a
    64-lane per-row fold by an order of magnitude. The per-lane
    aggregate sums the raw bit (``shiftright & 1``) plus one shared
    token count instead of a conditional +1/-1 — the ±1 form is
    algebraically ``2*ones - n``, so ``votes > 0  ⟺  2*ones > n``
    bit-for-bit, and dropping the 64 CASE branches halves the
    aggregate's CPU (r17, guide §1.2 per-task work; measured 2.3 s ->
    1.2 s per pass at sf0.1).

    Docs with zero tokens produce no output row (no signal to hash).
    """
    tok_sql = TOKENS_SQL.format(col=text_col)
    hashed = ensure_parallelism(df).select(
        F.col(id_col).alias("doc"),
        F.explode(F.expr(tok_sql)).alias("t"),
    ).select("doc", F.xxhash64("t").alias("h"))
    votes = hashed.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.expr(f"shiftright(h, {i}) & 1")).alias(f"o{i}")
            for i in range(64)
        ],
    )
    packed = " + ".join(
        f"CASE WHEN 2 * o{i} > n THEN shiftleft(1L, {i}) ELSE 0L END"
        for i in range(64)
    )
    return votes.select("doc", F.expr(packed).alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Banding: split the 64-bit signature into 4 x 16-bit chunks; any pair
    with Hamming distance <= 3 must agree exactly on at least one chunk
    (pigeonhole), so candidates come from 4 equi-joins (union), then are
    verified with bit_count(xor) — no all-pairs product.
    """
    sh = simhash64(df, text_col, id_col)
    chunks = sh.select(
        "doc",
        "simhash",
        F.explode(
            F.expr(
                "array("
                + ", ".join(
                    f"struct({c}L AS chunk_id, "
                    f"(shiftright(simhash, {c * 16}) & 65535L) AS chunk_val)"
                    for c in range(4)
                )
                + ")"
            )
        ).alias("ch"),
    ).select("doc", "simhash", "ch.chunk_id", "ch.chunk_val").localCheckpoint(
        # lazy checkpoint, not .cache(): both join sides share one
        # materialization and the blocks are GC-released after use
        eager=False
    )
    a = chunks.alias("a")
    b = chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).cast("long").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def corpus_snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Crawl-to-crawl change detection: (doc_id, status, old_hash,
    new_hash) for every document that is ``added`` (only in the new
    snapshot), ``removed`` (only in the old) or ``changed`` (both, but
    content hash differs) — unchanged documents are excluded, so the
    output is ∝ the churn, not the corpus. This is the stage that
    turns a re-crawl into an INCREMENT for the store operators
    (sigstore/phashstore ingest the ``added`` + ``changed`` rows; the
    ``removed`` rows drive retention/compaction decisions).

    Scale: each side reduces to (id, md5) before the full-outer join —
    8+32 bytes per document crosses the exchange, never the text; the
    join key is the unique doc id, so no skew by construction."""
    oh = old.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("old_hash"),
    )
    nh = new.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("new_hash"),
    )
    joined = oh.join(nh, "doc_id", "full_outer")
    return joined.select(
        "doc_id",
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
        "old_hash",
        "new_hash",
    ).filter(F.col("status") != "unchanged")


def exact_span_scrub(
    df: DataFrame,
    n: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    nfc: bool = False,
) -> DataFrame:
    """Exact-substring span dedup at token granularity — the
    "deduplicating training data" rewrite (Lee et al. 2022,
    arXiv:2107.06499, re-expressed on DataFrame ops): any n-token span
    occurring more than once in the corpus keeps only its globally
    FIRST occurrence (min (doc_id, pos)); every other occurrence's
    token positions are scrubbed from their documents, and each
    document is rebuilt from its surviving tokens. Output: (doc_id,
    n_before, n_after, clean_text) for EVERY document (unchanged docs
    pass through, short docs have no spans by construction).

    Scale: shingle hashing is a narrow arrays pass (one md5 per
    position), and the shingle key shuffled by the first-occurrence
    groupBy is the 16-BYTE binary digest (``unhex(md5(...))``), not
    the 32-char hex string — at corpus scale that groupBy moves ~one
    key per token position, so halving the key width halves the
    operator's dominant exchange (VERDICT r11). The covered-position
    anti-join shuffles (doc, pos) int pairs, never text; the rebuild
    is one per-doc sort-free aggregation (array_sort over collected
    (pos, tok) structs, local to each group). md5 collisions are
    negligible and acceptable for dedup semantics, the same contract
    as :func:`dedup_exact`.

    ``nfc=True`` canonicalizes the text (Unicode NFC) first so
    decomposed/precomposed spellings of the same span hash to the same
    shingle (functions/udf.py:py_nfc_normalize)."""
    if nfc:
        from ballista_extensions_spark.functions.udf import py_nfc_normalize

        df = df.withColumn(text_col, py_nfc_normalize(F.col(text_col)))
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("arr"),
    ).localCheckpoint(eager=False)
    sh = (
        toks.filter(F.size("arr") >= n)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(arr) - {n}), i -> "
                    f"struct(i AS pos, unhex(md5(concat_ws(' ', "
                    f"slice(arr, i + 1, {n})))) AS h))"
                )
            ).alias("s"),
        )
        .select("doc_id", F.col("s.pos").alias("pos"),
                F.col("s.h").alias("h"))
    )
    firsts = (
        sh.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.min(F.struct("doc_id", "pos")).alias("first"),
        )
        .filter(F.col("c") >= 2)
        .select("h", "first")
    )
    removable = sh.join(firsts, "h").filter(
        ~(
            (F.col("doc_id") == F.col("first.doc_id"))
            & (F.col("pos") == F.col("first.pos"))
        )
    )
    covered = removable.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.lit(n - 1))
        ).alias("pos"),
    ).distinct()
    tokens = toks.select(
        "doc_id", F.posexplode("arr").alias("pos", "tok")
    )
    kept = tokens.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_after"),
        F.concat_ws(
            " ",
            F.expr(
                "transform(array_sort(collect_list(struct(pos, tok))), "
                "x -> x.tok)"
            ),
        ).alias("clean_text"),
    )
    return (
        toks.select(
            "doc_id", F.size("arr").cast("long").alias("n_before")
        )
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_before",
            F.coalesce(F.col("n_after"), F.lit(0).cast("long")).alias(
                "n_after"
            ),
            F.coalesce(F.col("clean_text"), F.lit("")).alias(
                "clean_text"
            ),
        )
    )
