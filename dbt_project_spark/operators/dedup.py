"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

All DataFrame-native (no Python UDFs): tokenization and shingling are
codegen'd array expressions; hashes are the cross-engine md5-prefix
integer (functions/expressions.py), so every step is reproducible in
ANSI SQL for the oracle.

Scale notes (100 TB):
- exact dedup groups on the 128-bit content hash, not the text — the
  shuffle carries 16-byte keys, not documents.
- candidate generation is always bucket-local (shared shingle, shared
  LSH band, shared SimHash band): never an O(n²) cross join. Hot
  buckets (stop-shingles) are the skew risk; ``max_bucket`` caps them
  (standard practice: a shingle shared by >N docs is useless for
  dedup anyway and only inflates the join).
- MinHash signatures are fixed-width (K ints/doc), so the
  signature-stage shuffle is O(docs), independent of doc length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dbt_project_spark.functions.expressions import md5_int

# MinHash permutation constants: h_i(x) = (A[i]*x + B[i]) mod P.
# Shared with the oracle SQL — single source of truth.
MINHASH_P = 2147483647
MINHASH_A = [7, 13, 31, 43, 59, 87, 101, 127, 151, 163, 179, 199, 211, 229, 241, 263]
MINHASH_B = [3, 17, 29, 47, 61, 79, 103, 131, 149, 167, 181, 193, 223, 233, 251, 269]
SIMHASH_BITS = 32


def tokens_col(text_col: str = "text"):
    """Lowercased alphanumeric tokens (regexp-extracted, order kept)."""
    return F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")


def shingles_col(tokens: str = "tokens", n: int = 3):
    """Distinct word n-grams of a token array column (codegen arrays).

    Built as chained ``zip_with`` over ``slice``s rather than
    ``transform(sequence(...), i -> tokens[i+j])``: higher-order
    function ARGUMENTS are evaluated once per row, while lambda-body
    references to an outer column get re-evaluated per element after
    Catalyst inlines the (possibly expensive) token expression into the
    lambda — with a regexp tokenizer that was an O(tokens²) blowup
    (measured ~9× on the sf0.1 dedup benchmark). ``concat``
    null-propagates over zip_with's padding, so trailing partial
    n-grams filter out.
    """
    expr = tokens
    for j in range(1, n):
        expr = (
            f"zip_with({expr}, "
            f"slice({tokens}, {j + 1}, greatest(size({tokens}) - {j}, 0)), "
            f"(a, b) -> concat(a, ' ', b))"
        )
    return F.expr(f"array_distinct(filter({expr}, x -> x IS NOT NULL))")


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content, keeping
    the smallest id. Groups on md5(text) so the shuffle key is 16
    bytes regardless of document size."""
    return (
        df.select(F.md5(F.col(text_col)).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exploded_shingles(df: DataFrame, id_col: str, n: int = 3) -> DataFrame:
    """(doc, set_size, shingle) — one row per distinct shingle per doc.
    Expects a ``__toks`` column (see ``_with_tokens``).

    Deliberately shuffle-free: the alternative (explode once, sz =
    count() over doc) inserts a full postings exchange on doc — at
    100 TB an extra full-data shuffle loses to linear map-side CPU.

    r13 (guide §1.2 per-task work; sf100 stage evidence — the fill
    stage was ~40% of dedup_minhash_lsh's executor time): the old
    select(sh) → withColumn(sz) → select(explode(sh)) shape let the
    optimizer inline the tokenize+shingle chain into BOTH the size()
    and the Generate expression (the docstring's measured ~3×
    re-evaluation). Building ONE struct(size(sh), sh) projection
    forces a single ProjectExec where codegen subexpression
    elimination computes the chain once; the Generate then explodes a
    plain struct field. Measured sf10 (500k docs): 6.4 → 2.9 s for
    the postings pass, identical rows."""
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.struct(
            F.size(shingles_col("__toks", n)).alias("sz"),
            shingles_col("__toks", n).alias("sh"),
        ).alias("t"),
    )
    return sh.select(
        "doc", F.col("t.sz").alias("sz"), F.explode("t.sh").alias("sg")
    )


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Starved-scan parallelism floor (r13, guide §6/§2.5): parquet
    scan tasks are bounded by file/row-group count, so a small-SF
    corpus (documents.parquet is 1 file at sf0.1, 4 at sf1) runs the
    whole tokenize+shingle map work on 1-4 of the session's cores.
    When the planned scan has fewer partitions than the default
    parallelism, spread the (by premise small) input with one
    round-robin exchange so per-row CPU uses every core. At scale the
    branch never fires — split count >> cores — so no exchange is
    added where the docstring trade-off in ``exploded_shingles``
    (map-side CPU beats a full-data shuffle at 100 TB) applies.
    Deterministic under retries: the input is a parquet scan and
    ``spark.sql.execution.sortBeforeRepartition`` (default on) pins
    the row-to-partition assignment."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # exotic plan — leave the layout alone
        return df
    return df.repartition(target) if n < target else df


def _with_tokens(df: DataFrame, text_col: str) -> DataFrame:
    return spread_small_scan(df).withColumn("__toks", tokens_col(text_col))


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    n: int = 3,
    max_bucket: int | None = None,
    persist_postings: bool = True,
) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard via shared-shingle join.

    intersection = count of co-occurring shingles; |A∪B| by
    inclusion-exclusion — integer arithmetic end-to-end, so the final
    ratio is bit-deterministic.

    ``persist_postings`` caches the shingle postings (MEMORY_AND_DISK):
    the self-join consumes them twice and Spark does NOT reuse the
    subtree across the two sides (measured 2× tokenization, ~2×
    wall-clock without it). At cluster scale the equivalent is
    checkpointing postings to parquet once per corpus.
    """
    from dbt_project_spark.caching import persist_tracked

    ex = exploded_shingles(_with_tokens(df, text_col), id_col, n)
    if persist_postings:
        ex = persist_tracked(ex)
    # r13 (VERDICT r12 task 5, guide §2.3/§3.2): a shingle held by ONE
    # doc can produce no pair, and in real corpora singletons are the
    # posting majority — drop them BEFORE the self-join so the pair
    # exchange moves only pair-capable postings. The df counts ride
    # ONE map-side-combined aggregate (the same one the hot-shingle
    # cap already paid), the keep set [2, max_bucket] comes out
    # partitioned by sg, and the semi-join re-partitions the postings
    # by sg — which the self-join then reuses (zero further exchanges
    # on the join inputs; the r10 broadcast-anti hot cap is subsumed:
    # count > max_bucket simply falls out of the keep range).
    # Semantics: identical — df=1 rows produced no a<b pair, and sz
    # (the full set size) is computed per row before any drop.
    counts = ex.groupBy("sg").agg(F.count(F.lit(1)).alias("__n"))
    lo, hi = 2, max_bucket if max_bucket is not None else None
    keep = counts.filter(
        (F.col("__n") >= lo)
        if hi is None
        else (F.col("__n") >= lo) & (F.col("__n") <= hi)
    ).select("sg")
    ex2 = persist_tracked(ex.join(keep, on="sg", how="left_semi"))
    a = ex2.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"), "sg")
    b = ex2.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"), "sg")
    pairs = (
        a.join(b, on="sg")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.max("sz_a").alias("sa"),
            F.max("sz_b").alias("sb"),
        )
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sa") + F.col("sb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return pairs.select("doc_a", "doc_b", "jaccard")


def editdistance_pairs(
    df: DataFrame,
    name_col: str,
    max_dist: int = 4,
    max_block: int | None = None,
) -> DataFrame:
    """Near-dup string pairs by bounded edit distance with
    (2-char-prefix, length-band) equi-blocking.

    Each name is emitted into length bands ⌊len/w⌋ and ⌊len/w⌋+1 with
    w = max_dist, so any pair within ``max_dist`` edits (hence
    |len_a−len_b| ≤ max_dist) meets on at least one (pfx, band) key —
    the banding itself loses zero recall.

    ``max_block`` caps hot blocks the same way ``jaccard_pairs`` caps
    hot shingles: block sizes are counted with a map-side-combined
    groupBy, the (tiny) hot-key list is broadcast, and members are
    anti-joined out before the self-join — pair generation is then
    O(max_block²) per block instead of O(block²). Recall trade
    (documented, mirrored in the oracle): a pair is lost only when
    EVERY (pfx, band) key it shares is hot — same-length pairs meet on
    two keys, so a single hot band does not lose them. Real name
    distributions are Zipfian ("ma…", "jo…" prefixes), which is
    exactly the regime the cap is for.
    """
    band = F.floor(F.length(name_col) / max_dist).cast("int")
    blocked = df.select(
        name_col,
        F.substring(name_col, 1, 2).alias("pfx"),
        F.explode(F.array(band, band + F.lit(1))).alias("band"),
    )
    if max_block is not None:
        hot = (
            blocked.groupBy("pfx", "band")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > max_block)
            .select("pfx", "band")
        )
        blocked = blocked.join(F.broadcast(hot), on=["pfx", "band"], how="left_anti")
    a = blocked.select(F.col(name_col).alias("name_a"), "pfx", "band")
    b = blocked.select(F.col(name_col).alias("name_b"), "pfx", "band")
    return (
        a.join(b, on=["pfx", "band"])
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
        .withColumn("edit_distance", F.levenshtein("name_a", "name_b").cast("int"))
        .filter(F.col("edit_distance") <= max_dist)
        .select("name_a", "name_b", "edit_distance")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    postings: DataFrame | None = None,
) -> DataFrame:
    """K=len(A) minhash values per doc, as columns mh0..mh{K-1}.

    Signature stage is a single groupBy(doc) over exploded shingles
    with K min() aggregates — map-side partials make the shuffle
    O(docs × K). Pass ``postings`` (a possibly-persisted
    exploded_shingles result) to share the tokenization with other
    stages."""
    ex = (
        postings
        if postings is not None
        else exploded_shingles(_with_tokens(df, text_col), id_col, n)
    )
    h = ex.withColumn("h", md5_int("sg"))
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_P)).alias(f"mh{i}")
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]
    return h.groupBy(F.col("doc")).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """Banded-LSH candidate pairs, verified with exact Jaccard.

    Docs sharing ANY band (band = md5 of r consecutive signature
    values) become candidates; candidates are then verified against
    the exact n-gram Jaccard so output precision is 1.0 — LSH only
    trades recall for scale.
    """
    k = len(MINHASH_A)
    r = k // bands
    from dbt_project_spark.caching import persist_tracked

    # One persisted postings relation feeds the signature stage AND
    # both verify sides (3 consumers — Spark won't dedup the subtrees).
    # Tracked: released when the next catalog query is built.
    postings = persist_tracked(
        exploded_shingles(_with_tokens(df, text_col), id_col, n)
    )
    sig = minhash_signatures(df, id_col, text_col, n, postings=postings)
    # r13 (guide §2.4 / sf100 stage evidence): the band self-join's two
    # sides are materialized as CONCURRENT AQE stage-jobs, and a lazy
    # persist cannot dedupe work still in flight — both sides computed
    # the full postings→md5→16-min-agg signature pipeline (2 × ~600 s
    # executor at sf100, 5M docs). One eager materialization of the
    # persisted band stack runs tokenize→postings→signatures→bands
    # exactly once, sequentially filling all three caches; the join
    # sides then read the stacked cache. The count itself aggregates
    # during the fill pass — no extra corpus scan.
    stacked = persist_tracked(minhash_band_stack(sig, bands))
    stacked.count()
    a = stacked.select(F.col("doc").alias("doc_a"), "bid", "bv")
    b = stacked.select(F.col("doc").alias("doc_b"), "bid", "bv")
    cand = (
        a.join(b, on=["bid", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # Verify ONLY candidate pairs (the point of LSH at scale): join the
    # candidates back to the (shared, persisted) shingle postings.
    return verify_jaccard(cand, postings, threshold)


def minhash_band_stack(sig: DataFrame, bands: int) -> DataFrame:
    """(doc, bid, bv): one row per (doc, band); bv = md5-int of the
    band's r consecutive signature values. The stacked layout is what
    both the self-join path and the persisted index store — band joins
    shuffle (id, 2 ints) rows regardless of document size."""
    k = len(MINHASH_A)
    r = k // bands
    band_cols = []
    for bnd in range(bands):
        parts = [f"mh{bnd * r + j}" for j in range(r)]
        band_cols.append(
            md5_int(F.concat_ws(",", *[F.col(p).cast("string") for p in parts])).alias(
                f"band{bnd}"
            )
        )
    banded = sig.select("doc", *band_cols)
    return banded.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(bnd).alias("bid"), F.col(f"band{bnd}").alias("bv"))
                    for bnd in range(bands)
                ]
            )
        ).alias("bx"),
    ).select("doc", "bx.bid", "bx.bv")


def verify_jaccard(
    cand: DataFrame,
    postings: DataFrame,
    threshold: float,
    broadcast_docs: bool = True,
    hash_nchars: int = 15,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate (doc_a, doc_b) pairs from a
    shingle-postings relation — precision 1.0 regardless of how the
    candidates were generated.

    Candidate-local (r10): the postings are first semi-joined down to
    docs that appear in SOME candidate pair, so every later join moves
    O(|pairs| × shingles-per-doc) rows, independent of corpus size.
    Without this the (doc_b, sg) join's probe side (cand ⋈ exa) grows
    with the pair count, and once it crosses the broadcast threshold
    AQE falls back to shuffling the FULL postings relation — measured
    at sf10 (500k docs): 1.8 GB of the dedup chain's 1.9 GB shuffle
    was exactly that, invisible at sf1 where the probe side stayed
    broadcastable.

    ``broadcast_docs``: the doc list is ids-only (≤ 2·|pairs| rows) —
    bounded by the near-dup count, so broadcastable for every shipped
    consumer (banded LSH + hot-bucket caps keep pairs ≈ O(dups)). A
    caller whose candidate set can be corpus-sized passes False and
    gets a plain semi-join (postings shuffle once on doc — the honest
    cost when the pair set itself is corpus-scale). Deliberately NOT
    decided by an eager count(): a build-time job per verify call
    re-ordered the whole pipeline's materialization and measured
    +17 s on the CC-backed catalog rows at sf0.1.

    Both persists are lazy (filled at first materialization): cand
    fans out to the docs list and the pair join, needed to both verify
    sides — Spark does not dedup repeated subtrees, so without the
    caches the LSH pipeline and the postings scan each run twice."""
    from dbt_project_spark.caching import persist_tracked

    cand = persist_tracked(cand.select("doc_a", "doc_b"))
    docs = (
        cand.select(F.col("doc_a").alias("doc"))
        .unionByName(cand.select(F.col("doc_b").alias("doc")))
        .distinct()
    )
    if broadcast_docs:
        docs = F.broadcast(docs)
    # r13 note (VERDICT r12 task 5): a candidate-local df≥2 prune of
    # the postings (drop shingles held by one candidate doc before the
    # pair joins) was implemented and MEASURED COUNTERPRODUCTIVE at
    # sf0.1/sf1 — the extra aggregate + semi-join exchanges cost more
    # than the (already join-eliminated) df=1 rows' shuffle saves on
    # the CC-backed queries (split_group_aware +1.3 s, dedup_clusters
    # +0.8 s at sf0.1). The prune landed in jaccard_pairs instead,
    # where the hot-cap aggregate already pays for the counts.
    # r13 (guide §2.3 "shuffle keys and metadata instead of payloads";
    # sf100 stage evidence): the intersection join shuffled the raw
    # shingle STRINGS — 10.4 GiB of row data on the (doc_b, sg)
    # exchange alone at 5M docs, and every sort comparison was a string
    # compare. The join now runs on h = md5_int(sg, 15) (60-bit BIGINT)
    # with EXACT collision routing: an h that maps to more than one
    # distinct sg within the candidate-doc postings (expected count ~0:
    # ~(3e7)²/2⁶¹ ≈ 4e-4 per run) is detected by a one-pass aggregate,
    # and its rows take the original string-equality join; all other h
    # are injective over `needed`, so h-equality ⇔ sg-equality and the
    # union of the two branches is row-for-row the old join. The
    # detect aggregate's count doubles as the eager materializer that
    # fills the cand/needed caches sequentially (the lazy persists
    # otherwise race in concurrent AQE stage-jobs).
    # hash_nchars=15 in production (60 bits); tests shrink it to force
    # real collisions through the string branch.
    needed = persist_tracked(
        postings.join(docs, on="doc", how="left_semi").withColumn(
            "h", md5_int(F.col("sg"), hash_nchars)
        )
    )
    coll = persist_tracked(
        needed.groupBy("h")
        .agg(F.countDistinct("sg").alias("nsg"))
        .filter(F.col("nsg") > 1)
        .select("h")
    )
    branches = (
        [(needed, "h")]
        if coll.count() == 0
        else [
            (needed.join(F.broadcast(coll), on="h", how="left_anti"), "h"),
            (needed.join(F.broadcast(coll), on="h", how="left_semi"), "sg"),
        ]
    )
    parts = []
    for src, key in branches:
        exa = src.select(
            F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"), key
        )
        exb = src.select(
            F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"), key
        )
        parts.append(
            cand.join(exa, on="doc_a")
            .join(exb, on=["doc_b", key])
            .select("doc_a", "doc_b", "sz_a", "sz_b")
        )
    inter_rows = (
        parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
    )
    return (
        inter_rows.groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.max("sz_a").alias("sa"),
            F.max("sz_b").alias("sb"),
        )
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sa") + F.col("sb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def build_minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    index_dir: str,
    bands: int = 4,
    n: int = 3,
) -> None:
    """Persist the corpus-side MinHash dedup index: the banded
    signature stack (``bands.parquet``) and the shingle postings
    (``postings.parquet``).

    This is the batch half of production incremental dedup: the corpus
    is signed ONCE, and each daily batch joins against the saved index
    instead of re-reading corpus text (``incremental_minhash_pairs``).
    At cluster scale both tables would be bucketed — bands by
    (bid, bv) so the lookup join is shuffle-free on the index side,
    postings by doc for the verify join."""
    import os

    ex = exploded_shingles(_with_tokens(df, text_col), id_col, n)
    sig = minhash_signatures(df, id_col, text_col, n, postings=ex)
    minhash_band_stack(sig, bands).write.mode("overwrite").parquet(
        os.path.join(index_dir, "bands.parquet")
    )
    ex.write.mode("overwrite").parquet(os.path.join(index_dir, "postings.parquet"))


def incremental_minhash_pairs(
    spark,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    index_dir: str,
    threshold: float,
    bands: int = 4,
    n: int = 3,
    update_index: bool = False,
) -> DataFrame:
    """Near-dup pairs involving a NEW batch, against a saved index.

    Computes signatures/postings for the new batch only, then joins
    new bands against (saved ∪ new) bands — so candidates are exactly
    the new-vs-corpus and new-vs-new pairs; corpus-vs-corpus pairs
    (already found when the index was built) are never regenerated and
    corpus text is never re-read. Cost per batch is
    O(|batch| + matching index buckets), not O(|corpus|): the shape
    production dedup runs daily.

    Verification reads shingle postings from the index for the corpus
    side, so precision stays 1.0 without touching corpus text.

    ``update_index=True`` appends the batch's bands/postings to the
    index so the next batch sees this one.
    """
    import os

    from dbt_project_spark.caching import persist_tracked

    new_postings = persist_tracked(
        exploded_shingles(_with_tokens(new_df, text_col), id_col, n)
    )
    sig = minhash_signatures(new_df, id_col, text_col, n, postings=new_postings)
    new_stack = persist_tracked(minhash_band_stack(sig, bands))
    # r13 note: minhash_lsh_pairs eagerly materializes its band stack
    # to kill the concurrent-side signature race; HERE the race only
    # duplicates the NEW BATCH's signature pass (the corpus side comes
    # from the on-disk index), and a daily batch is small relative to
    # the corpus at every scale — measured at sf0.1 the extra count
    # job costs more than the duplicated batch sig saves, so no eager
    # fill.
    # The corpus side is the index MINUS this batch's ids. The
    # anti-join matters for correctness, not just hygiene: parquet
    # scans resolve files at EXECUTION time, so once update_index has
    # appended, a (lazy) re-execution of the returned pairs would see
    # the batch on the index side too and double-count every shingle
    # in the verify stage. Stripping batch ids makes the result
    # identical no matter when the plan runs (and makes re-running an
    # already-indexed batch idempotent).
    new_ids = new_df.select(F.col(id_col).alias("doc")).distinct()
    old_stack = spark.read.parquet(
        os.path.join(index_dir, "bands.parquet")
    ).join(new_ids, on="doc", how="left_anti")
    old_postings = spark.read.parquet(
        os.path.join(index_dir, "postings.parquet")
    ).join(new_ids, on="doc", how="left_anti")

    a = new_stack.select(F.col("doc").alias("doc_a"), "bid", "bv")
    b = old_stack.unionByName(new_stack).select(
        F.col("doc").alias("doc_b"), "bid", "bv"
    )
    # least/greatest ordering dedups the new-vs-new pairs that would
    # otherwise appear from both sides of the asymmetric join.
    cand = (
        a.join(b, on=["bid", "bv"])
        .filter(F.col("doc_a") != F.col("doc_b"))
        .select(
            F.least("doc_a", "doc_b").alias("doc_a"),
            F.greatest("doc_a", "doc_b").alias("doc_b"),
        )
        .distinct()
    )
    pairs = verify_jaccard(
        cand, old_postings.unionByName(new_postings), threshold
    )
    if update_index:
        new_stack.write.mode("append").parquet(
            os.path.join(index_dir, "bands.parquet")
        )
        new_postings.write.mode("append").parquet(
            os.path.join(index_dir, "postings.parquet")
        )
    return pairs


# Truncate CC label lineage every N rounds (lazy localCheckpoint —
# materialized by the round's own signature aggregate).
_CC_CHECKPOINT_EVERY = 4


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    jump_from: int = 2,
) -> DataFrame:
    """Connected components by min-label propagation WITH pointer
    jumping: (node, component_id=min node id in component).

    Each round does (a) one-hop propagation over the symmetrized
    edge list (shuffle join + groupBy-min with map-side partials)
    and — from round ``jump_from`` on — (b) a pointer-jump: every
    node adopts its label's label, halving remaining label-tree
    depth. (a) alone converges in O(diameter) rounds, which a path
    graph turns into O(n); with (b) the loop is O(log diameter) —
    the Hash-to-Min shape, the difference between 30 rounds and 5 on
    a 30-node chain, and between hundreds and ~10 at 100 TB.

    The jump is DEFERRED (``jump_from=2``, r04): it costs an extra
    nodes-sized self-join per round, and real dedup graphs are
    near-diameter-≤3 (small near-duplicate clusters) — they converge
    before a jump would ever fire, so the shallow common case pays
    r02's plain-propagation price (the r03 always-jump loop measured
    +57% on dedup_clusters at sf0.1) while deep/chain graphs — the
    r03 driver-OOM case — still engage the jump from round 3 and
    keep the O(log diameter) bound. The fixpoint itself is
    jump-independent (min reachable id per node).

    Labels are localCheckpoint'ed every ``_CC_CHECKPOINT_EVERY``
    rounds: persistence alone does NOT truncate the logical plan, and
    the per-round lineage growth otherwise makes driver-side plan
    processing (UI/AQE descriptions) quadratic — measured as a
    driver OOM on deep graphs. Checkpoints are the bounded tracked
    kind (caching.RoundCache): eager, no double-store, superseded
    blocks freed as soon as the next checkpoint lands. Deterministic:
    the fixpoint (min reachable id per node) is independent of
    iteration or partition order."""
    from dbt_project_spark.caching import (
        RoundCache,
        local_checkpoint_tracked,
        persist_tracked,
    )

    # CHECKPOINT (not persist) the raw edge list BEFORE symmetrizing:
    # the union has two branches over the same (possibly expensive —
    # e.g. MinHash) edge pipeline, and Spark does not dedup the
    # subtree; beyond that, every CC round REPLANS its whole analyzed
    # tree (caches substitute only at physical planning), so the edge
    # pipeline's lineage is re-analyzed per round. With r10's
    # candidate-local verify lineage (persists + broadcast semi-join)
    # that replanning measured +17 s over the loop at sf0.1 — the
    # checkpoint truncates it to a LogicalRDD leaf and returns round
    # planning to edges-up only. Tracked: blocks freed at the next
    # catalog query (the checkpointed edges are never re-derivable
    # afterwards, which every consumer already honors).
    edges = local_checkpoint_tracked(edges).df
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    sym = persist_tracked(sym)
    labels = persist_tracked(
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("lab", F.col("node"))
    )
    # Convergence signal: per-node labels only ever DECREASE (min of a
    # shrinking set), so the exact sum of labels is strictly monotone
    # until the fixpoint — an unchanged sum ⇔ no node changed. One
    # map-side-combined aggregate per round instead of an exceptAll
    # (which would re-shuffle both label relations). DECIMAL(38,0)
    # keeps the sum exact at any corpus size.
    def _sig(lbl: DataFrame):
        return lbl.agg(
            F.sum(F.col("lab").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    prev_sig = _sig(labels)
    rounds = RoundCache(_CC_CHECKPOINT_EVERY)
    init_labels = labels
    for i in range(max_iter):
        prop = sym.join(labels, sym.u == labels.node).select(
            F.col("v").alias("node"), "lab"
        )
        hop = (
            labels.unionByName(prop)
            .groupBy("node")
            .agg(F.min("lab").alias("lab"))
        )
        if i >= jump_from:
            # pointer jump: adopt the label's own label (always <= lab,
            # same component) — halves remaining label-tree depth. hop
            # appears on both sides, but its expensive half (the
            # aggregate's exchange) is a byte-identical subtree in both
            # branches, so ReuseExchange shares it — only the cheap
            # reduce-side HashAggregate runs twice (measured:
            # materializing hop instead is strictly slower).
            jump = hop.select(
                F.col("node").alias("jn"), F.col("lab").alias("jl")
            )
            new = hop.join(jump, hop.lab == jump.jn).select(
                "node", F.col("jl").alias("lab")
            )
        else:
            new = hop
        # _sig doubles as the round's materializing action: one Spark
        # job per round (the sig aggregate), not count + sig — the r08
        # advance() count was a redundant second job per CC round
        # (VERDICT r08 §wrong 2: +14% on both CC-backed bench queries).
        new, new_sig = rounds.advance(new, _sig)
        if i == 0:
            init_labels.unpersist()
        labels = new
        if new_sig == prev_sig:
            break
        prev_sig = new_sig
    else:  # pragma: no cover - defensive
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    sym.unpersist()
    return labels


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, bits: int = SIMHASH_BITS
) -> DataFrame:
    """Per-doc SimHash: bit b of the signature is the sign of the sum
    of ±1 votes from every token occurrence's hash bit b.

    Computed as `bits` conditional-sum aggregates over exploded tokens
    — one shuffle, no per-bit explode (input rows × 1, not × bits).
    Band columns (8-bit slices) support hamming-bucketed candidate
    generation at scale.
    """
    tok = (
        _with_tokens(df, text_col)
        .select(F.col(id_col).alias("doc"), F.explode("__toks").alias("tk"))
        .withColumn("h", md5_int("tk"))
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), bit).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"v{bit}")
        for bit in range(bits)
    ]
    per_doc = tok.groupBy("doc").agg(*votes)
    sig = sum(
        [
            F.when(F.col(f"v{bit}") > 0, F.lit(2**bit)).otherwise(F.lit(0))
            for bit in range(bits)
        ],
        start=F.lit(0),
    ).cast("bigint")
    out = per_doc.withColumn("simhash", sig).select("doc", "simhash")
    for bnd in range(bits // 8):
        out = out.withColumn(
            f"band{bnd}",
            F.shiftright(F.col("simhash"), bnd * 8).bitwiseAND(255).cast("int"),
        )
    return out


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Near-dup pairs: candidates share ≥1 signature band — by
    pigeonhole, any pair with hamming distance < nbands must agree on
    at least one 8-bit band, so recall is exact for max_hamming <=
    nbands-1 — then verified by exact popcount hamming distance."""
    sig = simhash_signatures(df, id_col, text_col, bits)
    nbands = bits // 8
    stacked = sig.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(bnd).alias("bid"), F.col(f"band{bnd}").alias("bv"))
                    for bnd in range(nbands)
                ]
            )
        ).alias("bx"),
    ).select("doc", "simhash", "bx.bid", "bx.bv")
    a = stacked.select(
        F.col("doc").alias("doc_a"), F.col("simhash").alias("sig_a"), "bid", "bv"
    )
    b = stacked.select(
        F.col("doc").alias("doc_b"), F.col("simhash").alias("sig_b"), "bid", "bv"
    )
    return (
        a.join(b, on=["bid", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    n: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Asymmetric CONTAINMENT pairs: inter / |smaller shingle set| —
    the quote/inclusion detector Jaccard structurally misses (a small
    doc fully quoted inside a large one has containment 1.0 but
    Jaccard ≈ |small|/|large| → 0). Same shared-shingle candidate
    machinery, postings cache, and hot-shingle cap as
    ``jaccard_pairs``; only the verification ratio differs. Both
    metrics are emitted so the gap is visible per pair.
    """
    from dbt_project_spark.caching import persist_tracked

    ex = persist_tracked(exploded_shingles(_with_tokens(df, text_col), id_col, n))
    if max_bucket is not None:
        hot = (
            ex.groupBy("sg")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > max_bucket)
            .select("sg")
        )
        ex = ex.join(F.broadcast(hot), on="sg", how="left_anti")
    a = ex.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"), "sg")
    b = ex.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"), "sg")
    return (
        a.join(b, on="sg")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.max("sz_a").alias("sa"),
            F.max("sz_b").alias("sb"),
        )
        .withColumn(
            "containment", F.col("inter") / F.least(F.col("sa"), F.col("sb"))
        )
        .filter(F.col("containment") >= threshold)
        .select(
            "doc_a",
            "doc_b",
            "containment",
            (F.col("inter") / (F.col("sa") + F.col("sb") - F.col("inter"))).alias(
                "jaccard"
            ),
        )
    )
