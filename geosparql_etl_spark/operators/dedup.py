"""Deduplication family for large-scale training-data pipelines:
exact, MinHash+LSH, SimHash, n-gram Jaccard.

No reference counterpart (engine charter operators). Design notes for
100 TB:

  - exact: hash-groupBy on a digest of the normalized text — shuffles
    16-byte digests + ids, never the documents.
  - minhash LSH: signatures are computed scan-side (native expressions,
    no UDF), banding explodes to (band, band_hash, id) — the self-join
    on band hash is an equi-join whose build side is only candidate
    buckets, so the cross product never materializes.
  - all hash functions are md5-derived (md5_long) so every step is
    bit-reproducible in ANSI SQL — the DuckDB oracle can verify the
    whole pipeline, not just row counts.

Skew: stop-shingles (e.g. boilerplate headers) create hot LSH buckets;
``lsh_candidate_pairs`` caps bucket width (default 64) — buckets wider
than the cap are dropped, trading recall for bounded work, and the cap
is logged in the plan via a filter so it is visible, not silent.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from geosparql_etl_spark.functions.hashing import md5_long
from geosparql_etl_spark.functions.textstats import shingles
from geosparql_etl_spark.operators.partitioning import spread as _spread


# --- exact -------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per exact (normalized) text digest."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    digest = F.md5(norm).alias("__digest")
    w = Window.partitionBy("__digest").orderBy(F.col(id_col))
    return (
        df.withColumn("__digest", digest)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__digest", "__rn")
    )


# --- minhash -----------------------------------------------------------------


def seeded_hash(col: Column, seed: int) -> Column:
    """Portable seeded hash: md5('seed:value') folded to a 60-bit long."""
    if not isinstance(seed, int):  # a Column here would silently f-string its repr
        raise TypeError(f"seed must be a Python int, got {type(seed).__name__}")
    return md5_long(F.concat(F.lit(f"{seed}:"), col))


def minhash_from_shingles(shingle_col: Column, num_hashes: int = 16) -> Column:
    """array<long> minhash signature over a (materialized) shingle array.

    PySpark HOF pitfall: the lambda's PARAMETER COUNT selects the lambda
    form — ``lambda s, i=i:`` is treated as the binary (element, index)
    variant, silently binding the captured value to the array index
    column. Always close over loop variables with a factory instead.
    """

    def hasher(seed: int):
        return lambda s: seeded_hash(s, seed)

    return F.array(
        *[
            F.array_min(F.transform(shingle_col, hasher(i)))
            for i in range(num_hashes)
        ]
    )


def with_minhash(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    k: int = 3,
    out_col: str = "minhash",
) -> DataFrame:
    """(id_col, out_col) minhash signatures via explode + groupBy min.

    Why not compute array-side with minhash_from_shingles? Projection
    collapse inlines a withColumn'd shingle array back into every one of
    the num_hashes transforms, recomputing shingling num_hashes times
    (interpreted lambdas — measured 13s for 5k docs vs ~2s exploded).
    Exploding computes shingles once; map-side partial aggregation
    reduces the shuffle to (id, num_hashes longs) per document.
    """
    exploded = _spread(df).select(
        F.col(id_col), F.explode(shingles(F.col(text_col), k)).alias("__sh")
    )
    return exploded.groupBy(id_col).agg(
        F.array(
            *[F.min(seeded_hash(F.col("__sh"), i)) for i in range(num_hashes)]
        ).alias(out_col)
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    sig_col: str = "minhash",
    bands: int = 4,
    max_bucket: int = 64,
) -> DataFrame:
    """(id_a, id_b) candidate pairs sharing at least one LSH band bucket.

    Signature of length n split into ``bands`` contiguous bands of
    n/bands rows; band key = md5 of the band's joined values. Pairs are
    emitted once (id_a < id_b). Buckets wider than ``max_bucket`` are
    dropped (skew guard — see module docstring).
    """
    sig = F.col(sig_col)
    n = bands  # band index domain
    banded = df.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                F.slice(
                                    sig,
                                    F.lit(b) * (F.size(sig) / n).cast("int") + 1,
                                    (F.size(sig) / n).cast("int"),
                                ).cast("array<string>"),
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("__id", "bb.band", "bb.bucket")

    bucket_sizes = banded.groupBy("band", "bucket").count()
    small = banded.join(
        bucket_sizes.where(F.col("count") <= max_bucket).select("band", "bucket"),
        ["band", "bucket"],
    )
    a = small.select(F.col("band"), F.col("bucket"), F.col("__id").alias("id_a"))
    b_ = small.select(F.col("band"), F.col("bucket"), F.col("__id").alias("id_b"))
    return (
        a.join(b_, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates()
    )


def jaccard_of_pairs(
    pairs: DataFrame, docs: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Exact word-k-shingle Jaccard for each (id_a, id_b) pair.

    |A∪B| is derived as |A|+|B|-|A∩B| so the shingle arrays are each
    referenced once (array_union would re-evaluate both inputs)."""
    sh = docs.select(
        F.col(id_col), shingles(F.col(text_col), k).alias("__sh")
    )
    a = sh.select(
        F.col(id_col).alias("id_a"),
        F.col("__sh").alias("sh_a"),
        F.size("__sh").alias("na"),
    )
    b = sh.select(
        F.col(id_col).alias("id_b"),
        F.col("__sh").alias("sh_b"),
        F.size("__sh").alias("nb"),
    )
    joined = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = (F.col("na") + F.col("nb") - inter).cast("double")
    return joined.select(
        "id_a",
        "id_b",
        F.when(union > 0, inter.cast("double") / union)
        .otherwise(F.lit(0.0))
        .alias("jaccard"),
    )


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_hashes: int = 16,
    k: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup removal: LSH candidates -> exact Jaccard >= threshold ->
    drop the higher id of each duplicate pair (greedy by id order)."""
    sigs = with_minhash(df, text_col, id_col, num_hashes, k)
    cand = lsh_candidate_pairs(sigs, id_col)
    dups = jaccard_of_pairs(cand, df, id_col, text_col, k).where(
        F.col("jaccard") >= threshold
    )
    losers = dups.select(F.col("id_b").alias(id_col)).dropDuplicates()
    return df.join(losers, id_col, "left_anti")


# --- transitive closure ------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    stats: dict | None = None,
    unique_pairs: bool = False,
) -> DataFrame:
    """(node, cluster_id) for every node in ``pairs``, where cluster_id
    is the minimum node id of its connected component.

    Greedy per-pair keeper selection (minhash_dedup, embedding_neardup)
    is not transitive: A~B and B~C with A≁C leaves C's fate dependent
    on pair orientation. Clustering first makes dedup decisions
    component-wide — keep cluster_id, drop the rest — which is how
    production near-dup dedup actually resolves duplicate sets.

    Algorithm: min-label propagation with pointer jumping. Each round
    every node takes the min over (its label, its neighbors' labels,
    ITS LABEL'S label) — the last term is the path-doubling step
    (label(label(v))), which collapses a length-d chain in O(log d)
    rounds instead of the O(d) of plain neighbor propagation (same
    doubling idea as large-star/small-star, Kiveris et al., "Connected
    Components in MapReduce and Beyond"). Near-dup components are
    dense and tiny, so both converge fast there; the doubling is what
    keeps adversarially long chains cheap. Pass a dict as ``stats`` to
    get {"rounds": n} back (tests assert the logarithmic round count).

    Scale notes: each round is one shuffle of (edge ⨝ label) sized by
    the edge list, one labels self-join for the pointer jump, and ONE
    groupBy min over their union (the self stream carries the old
    label out, so the convergence probe needs no re-join) — all
    key-partitioned, no driver-side data. The convergence probe collects a single count.
    Lineage is truncated each round: with a checkpoint dir configured
    (``spark.sparkContext.setCheckpointDir`` — HDFS/S3 on a cluster)
    the cut is a fault-tolerant ``checkpoint``; otherwise
    ``localCheckpoint`` (executor-storage, fine for local mode, lost on
    executor failure).
    """

    from geosparql_etl_spark.util import cut_lineage as _cut
    edges = pairs.select(
        F.col(id_a).cast("long").alias("src"), F.col(id_b).cast("long").alias("dst")
    )
    # undirected: propagate both ways along every edge. Materialized
    # ONCE — without the checkpoint the (possibly expensive) upstream
    # pair computation would re-execute inside every round's join.
    # unique_pairs: when the caller guarantees distinct ORDERED pairs
    # with one consistent orientation (id_a < id_b — what every
    # groupBy-produced pair set here emits: d04's inverted-index
    # output, LSH candidate dedup), mirroring cannot create duplicates
    # and the dedup shuffle of the full edge list is skipped. Distinct
    # rows alone are NOT enough: (a,b) and (b,a) are distinct rows but
    # mirror into duplicate edges (harmless for correctness, pure
    # wasted shuffle).
    und = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    if not unique_pairs:
        und = und.dropDuplicates()
    und = _cut(und)

    # Size the iteration to the GRAPH, not the corpus: the pair graph
    # is usually orders of magnitude smaller than the documents that
    # produced it (only near-dups edge), yet it inherits the corpus
    # read's shuffle width — every round then pays
    # (#partitions x #stages) task overhead to move a handful of rows.
    # und is checkpointed, so the count is a cheap scan; ~2M edges per
    # partition keeps round state in executor memory at any scale. The
    # current width is capped by the shuffle width the union inherited
    # (no .rdd probe — that forces an RDD-conversion plan and bypasses
    # AQE statistics).
    n_edges = und.count()
    spark = und.sparkSession
    cap = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    width = max(1, min(cap, n_edges // 2_000_000 + 1))
    if width < cap:
        und = _cut(und.repartition(width, "dst"))

    labels = _cut(
        und.select(F.col("src").alias("node"))
        .dropDuplicates()
        .withColumn("label", F.col("node"))
    )
    rounds = 0
    for _ in range(max_iter):
        # Round 15 (guide §2.4 — fewer shuffles AND a shorter critical
        # path per round): the round min over {neighbor labels,
        # label(label(v)), label(v)} is ONE aggregate over a union of
        # three contribution streams instead of the former
        # aggregate-then-two-assembly-joins chain:
        #   - neighbor labels: the edge ⨝ labels join (und's
        #     checkpointed hash(dst) partitioning still reused);
        #   - pointer jump label(label(v)): a labels self-join keyed by
        #     label (its node-side exchange is shared with the edge
        #     join's). Inner join: labels are always existing node ids,
        #     and even if one were not, the self stream below already
        #     contributes label(v) — exactly what the old LEFT-join
        #     coalesce fell back to;
        #   - the self stream (v, label(v)), marker __m = 1, which both
        #     covers isolated coverage (every node aggregates) and
        #     carries the OLD label out of the aggregate for the
        #     convergence probe — no post-aggregate re-join.
        # The two joins are independent, so the per-round critical path
        # is join -> aggregate -> checkpoint (was join -> aggregate ->
        # join -> join -> checkpoint). Per-round values are unchanged:
        # the same multiset reaches the same min.
        nbr = und.join(labels, und["dst"] == labels["node"]).select(
            "src", "label", F.lit(0).alias("__m")
        )
        jump = (
            labels.select(
                F.col("node").alias("__jsrc"), F.col("label").alias("__jdst")
            )
            .join(
                labels.select(
                    F.col("node").alias("__jn"), F.col("label").alias("__jl")
                ),
                F.col("__jdst") == F.col("__jn"),
            )
            .select(
                F.col("__jsrc").alias("src"),
                F.col("__jl").alias("label"),
                F.lit(0).alias("__m"),
            )
        )
        own = labels.select(
            F.col("node").alias("src"), "label", F.lit(1).alias("__m")
        )
        proposed = (
            nbr.unionByName(jump)
            .unionByName(own)
            .groupBy("src")
            .agg(
                F.min("label").alias("__new"),
                F.min(F.when(F.col("__m") == 1, F.col("label"))).alias(
                    "label"
                ),
            )
            .select(F.col("src").alias("node"), "label", "__new")
        )
        proposed = _cut(proposed)  # one evaluation feeds probe + next round
        rounds += 1
        changed = (
            proposed.where(F.col("__new") < F.col("label")).limit(1).count()
        )
        labels = proposed.select("node", F.col("__new").alias("label"))
        if changed == 0:
            break
    if stats is not None:
        stats["rounds"] = rounds
    return labels.select("node", F.col("label").alias("cluster_id"))


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    unique_pairs: bool = False,
) -> DataFrame:
    """(doc_id, cluster_id, cluster_size) for every node in a near-dup
    pair — connected components plus component sizes. Rows with
    doc_id == cluster_id are the keepers; the rest are transitive
    duplicates of that keeper."""
    cc = connected_components(pairs, id_a, id_b, unique_pairs=unique_pairs)
    sizes = cc.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return cc.select(F.col("node").alias("doc_id"), "cluster_id").join(
        sizes, "cluster_id"
    ).select("doc_id", "cluster_id", "cluster_size")


# --- simhash -----------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(df: DataFrame, id_col: str, text_col: str, out_col: str = "simhash") -> DataFrame:
    """32-bit SimHash over whitespace tokens (md5-derived bit votes).

    Explode tokens -> per-bit +/-1 votes -> majority per bit -> pack.
    Shuffles (id, token-hash) longs only; the pack is a single agg row
    per document. Hamming-close simhashes ~ near-dup documents.
    """
    toks = _spread(df).select(
        F.col(id_col),
        F.explode(
            F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " ")
        ).alias("__tok"),
    ).withColumn("__h", md5_long(F.col("__tok")))
    votes = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("__h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"__b{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    packed = votes.select(
        F.col(id_col),
        sum(
            [
                F.when(F.col(f"__b{b}") > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
                for b in range(SIMHASH_BITS)
            ],
            start=F.lit(0).cast("long"),
        ).alias(out_col),
    )
    return df.join(packed, id_col, "left")


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


# --- n-gram jaccard (direct, no LSH) ------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    min_jaccard: float = 0.5,
    max_df: int | None = 10_000,
    observation=None,
) -> DataFrame:
    """All pairs with word-k-shingle Jaccard >= min_jaccard, found by
    joining on shared shingles (inverted-index join) — exact, no LSH
    approximation; the shared-shingle join prunes non-overlapping pairs.

    Skew guard (``max_df``): a boilerplate shingle appearing in f
    documents makes its posting list self-join emit f^2/2 pairs — one
    stop-shingle in 1M docs is 5x10^11 candidates. Shingles with
    document frequency > max_df are removed before the join via a
    broadcast join against the (tiny, by construction) hot-shingle
    set — the same bounded-work dial as lsh_candidate_pairs'
    max_bucket. Capped shingles don't count toward the intersection, so
    a pair sharing them scores conservatively lower (dedup misses some
    boilerplate-only dups rather than exploding); with max_df above the
    corpus's top document frequency the result is exactly the uncapped
    join. Pass an ``Observation`` to record how many posting rows the
    cap dropped (metric ``capped_postings``) when the query runs.
    """
    inter = _shingle_pair_intersections(
        df, id_col, text_col, k, max_df, observation
    )
    return (
        inter.select(
            "id_a",
            "id_b",
            (
                F.col("__inter")
                / (F.col("__na") + F.col("__nb") - F.col("__inter")).cast("double")
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= min_jaccard)
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    min_containment: float = 0.8,
    max_df: int | None = 10_000,
    observation=None,
) -> DataFrame:
    """Directed near-dup: shingle containment C(A⊆B) = |A ∩ B| / |A|
    (Broder, "On the resemblance and containment of documents",
    SEQUENCES'97). Catches SUBSET duplication — a short document quoted
    or embedded inside a much larger one — which symmetric Jaccard
    misses (|A∩B|/|A∪B| stays low when |B| >> |A|): exactly the
    boilerplate-quote/partial-copy pattern training corpora need pruned.

    Emits (id_a, id_b, containment_a, containment_b) for id_a < id_b
    where EITHER direction clears ``min_containment`` — both directed
    scores from one inverted-index join (same shuffle, same ``max_df``
    skew cap as ngram_jaccard_pairs; a capped boilerplate shingle
    lowers both scores conservatively rather than exploding the join).
    """
    inter = _shingle_pair_intersections(
        df, id_col, text_col, k, max_df, observation
    )
    ca = F.col("__inter") / F.col("__na").cast("double")
    cb = F.col("__inter") / F.col("__nb").cast("double")
    return (
        inter.select(
            "id_a",
            "id_b",
            ca.alias("containment_a"),
            cb.alias("containment_b"),
        )
        .where(
            (F.col("containment_a") >= min_containment)
            | (F.col("containment_b") >= min_containment)
        )
    )


def _shingle_pair_intersections(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    max_df: int | None,
    observation=None,
) -> DataFrame:
    """Shared inverted-index core of the exact n-gram pair measures:
    (id_a, id_b, __na, __nb, __inter) for every pair sharing at least
    one (non-capped) k-shingle, id_a < id_b. ``__na``/``__nb`` are the
    DISTINCT shingle-set sizes, carried through the explode so no extra
    join recovers them."""
    # one shingling pass: set size rides along with each exploded shingle,
    # so no extra joins to recover |A| and |B| after the intersect count
    sh = _spread(df).select(F.col(id_col), shingles(F.col(text_col), k).alias("__sh"))
    ex = sh.select(
        F.col(id_col), F.size("__sh").alias("__n"), F.explode("__sh").alias("__s")
    )
    hot = None
    if max_df is not None:
        hot = (
            ex.groupBy("__s")
            .agg(F.count(F.lit(1)).alias("__df"))
            .where(F.col("__df") > max_df)
            .select("__s", F.lit(1).alias("__hot"))
        )

    def _kept(branch: DataFrame, observe_here: bool) -> DataFrame:
        """Drop hot-shingle postings from one self-join branch.

        Left join + filter rather than left_anti: an Observation node
        is only allowed ONCE in a plan, but anything below the
        self-join branch point appears twice — so the metric rides
        branch a between its join and filter, where it sees every
        posting row with its hot flag. (Inside a BroadcastExchange
        subtree it would never report at all — broadcast builds run as
        separate jobs.)
        """
        if hot is None:
            return branch
        joined = branch.join(F.broadcast(hot), "__s", "left")
        if observe_here and observation is not None:
            joined = joined.observe(
                observation,
                F.sum(F.coalesce(F.col("__hot"), F.lit(0))).alias(
                    "capped_postings"
                ),
                F.count(F.lit(1)).alias("total_postings"),
            )
        return joined.where(F.col("__hot").isNull()).drop("__hot")

    # Filtering ONE branch kills hot keys for the whole equi-join
    # (join output for shingle s is a_postings(s) x b_postings(s): an
    # empty a side zeroes the product) and leaves the intersection
    # counts untouched — |A ∩ B ∩ kept| either way. Branch b therefore
    # skips the hot filter entirely, halving the cap overhead.

    # Inverted-index SELF-JOIN on the shared shingle. The two branches
    # each evaluate the shingle subtree (exchange reuse does not fire
    # across re-aliased self-join branches), which is acceptable now
    # that shingling is a cheap single fold; the measured alternative —
    # posting lists + native combination expansion (no join, one pass)
    # — is exact too but ~2x slower at sf0.1: nested-transform pair
    # expansion runs interpreted, while the join's probe side is
    # codegen'd. Revisit only if the shingle pass itself becomes the
    # bottleneck again.
    a = _kept(ex, True).select(
        F.col(id_col).alias("id_a"), F.col("__n").alias("__na"), "__s"
    )
    b = ex.select(
        F.col(id_col).alias("id_b"), F.col("__n").alias("__nb"), "__s"
    )
    return (
        a.join(b, "__s")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b", "__na", "__nb")
        .agg(F.count("*").alias("__inter"))
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs of documents whose SimHashes differ
    in <= max_hamming bits — the pigeonhole-banded near-dup join
    (Manku, Jain & Das Sarma, "Detecting Near-Duplicates for Web
    Crawling", WWW'07): split the hash into ``bands`` contiguous bit
    bands; any pair within hamming distance d < bands must agree
    EXACTLY on at least one band, so candidates come from ``bands``
    equi-joins on (band_idx, band_bits) — shuffle is (id, band key)
    pairs, never the cross product — and the exact popcount predicate
    decides. Requires max_hamming < bands for the guarantee.
    """
    hashed = simhash(df, id_col, text_col).select(id_col, "simhash")
    return hamming_pairs(
        hashed, id_col, "simhash", SIMHASH_BITS, max_hamming, bands
    )


def hamming_pairs(
    hashed: DataFrame,
    id_col: str,
    hash_col: str,
    hash_bits: int,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Pigeonhole-banded near-dup join over ANY precomputed bit-hash
    column (SimHash, image dHash/pHash, audio chromaprints): pairs
    within hamming distance ``max_hamming`` must agree exactly on at
    least one of ``bands`` contiguous bit bands (max_hamming < bands),
    so candidates come from band equi-joins — shuffle carries (id,
    band key) pairs, never the cross product — and the exact popcount
    decides. The modality-agnostic core simhash_pairs (d09) and the
    image near-dup (mm05) both ride."""
    if max_hamming >= bands:
        raise ValueError(
            f"pigeonhole guarantee needs max_hamming < bands "
            f"(got {max_hamming} >= {bands})"
        )
    width = hash_bits // bands
    banded = hashed.select(
        F.col(id_col).alias("__id"),
        F.col(hash_col).alias("__h"),
        F.explode(
            F.array(
                *[
                    # band key packs (band index, band bits) into one long
                    (
                        F.lit(b << (width + 1)).cast("long")
                        + F.shiftright(F.col(hash_col), b * width).bitwiseAND(
                            F.lit((1 << width) - 1)
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("__band"),
    )
    a = banded.select(
        F.col("__band"), F.col("__id").alias("id_a"), F.col("__h").alias("__ha")
    )
    b_ = banded.select(
        F.col("__band"), F.col("__id").alias("id_b"), F.col("__h").alias("__hb")
    )
    return (
        a.join(b_, "__band")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            hamming64(F.col("__ha"), F.col("__hb")).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


# --- cross-doc line dedup (C4 / RefinedWeb) ----------------------------------


def line_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    line_words: int = 10,
) -> DataFrame:
    """Exact cross-document line deduplication (the C4 rule: a line
    that occurs more than once in the corpus survives only at its
    first occurrence; Raffel et al. 2020 §2.2, RefinedWeb keeps the
    same semantics at CommonCrawl scale).

    "Lines" are consecutive ``line_words``-word windows of the
    normalized text — the synthetic corpus has no newlines, and the
    fixed window is the deterministic analog (a real corpus would
    split on '\\n' instead; the plan is identical).

    Returns one row per line: (id, line_idx, line_text, kept) where
    ``kept`` marks the corpus-wide first occurrence — the caller
    reassembles documents from kept lines (see txt15) or computes
    per-doc drop ratios.

    100 TB shape: first occurrence per line is computed with
    groupBy(line_md5).agg(min(struct(id, idx))) and a join back — NOT
    a row_number window. The groupBy partially aggregates map-side, so
    a boilerplate line repeated a billion times arrives at its reducer
    as one row per upstream partition; the same window would funnel
    every copy through a single reducer (the classic hot-line skew).
    The join-back is (line_md5 -> 1 winner row), so AQE's skew-join
    split handles residual hot keys on the probe side.
    """
    from geosparql_etl_spark.functions.textstats import oracle_words

    lines = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("__id"),
            oracle_words(F.col(text_col)).alias("__w"),
        )
        .withColumn(
            "__start", F.explode(F.sequence(F.lit(1), F.size("__w"), F.lit(line_words)))
        )
        .select(
            F.col("__id"),
            ((F.col("__start") - 1) / line_words).cast("bigint").alias("line_idx"),
            F.concat_ws(
                " ", F.slice(F.col("__w"), F.col("__start"), line_words)
            ).alias("line_text"),
        )
        .withColumn("__md5", F.md5(F.col("line_text")))
    )
    winners = lines.groupBy("__md5").agg(
        F.min(F.struct(F.col("__id"), F.col("line_idx"))).alias("__first")
    )
    return (
        lines.join(winners, "__md5")
        .select(
            F.col("__id").alias(id_col),
            "line_idx",
            "line_text",
            (
                (F.col("__first.__id") == F.col("__id"))
                & (F.col("__first.line_idx") == F.col("line_idx"))
            ).alias("kept"),
        )
    )
