"""Deduplication operators for training-data pipelines.

Every operator is built to the web-scale pattern: never O(n²) — blocking
(hash / LSH band / hyperplane bucket) first, exact verification only
inside blocks. All blocking keys are native expressions; joins shuffle on
the block key, so skew is bounded by block size, not corpus size.

* exact          — hash-groupBy on a normalized fingerprint
* MinHash + LSH  — shingle → minhash signature → banded bucket join
* SimHash        — 64-bit near-dup signature (token-hash bit voting)
* n-gram Jaccard — set-similarity join via shingle inverted index
* embedding      — cosine near-dup via hyperplane-LSH blocking + verify
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint, word_ngrams
from ..functions.vectors import cosine_similarity, hyperplane_bucket


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per normalized-text fingerprint.
    Map-side combining groupBy on a 64-bit key — the cheapest dedup and
    the first stage of any 100 TB pipeline."""
    fp = doc_fingerprint(text_col).alias("fingerprint")
    keep = (df.select(fp, F.col(id_col))
              .groupBy("fingerprint")
              .agg(F.min(id_col).alias(id_col),
                   F.count(F.lit(1)).alias("dup_count")))
    return (df.join(keep, on=id_col, how="inner")
              .select(*df.columns, "fingerprint", "dup_count"))


def minhash_signature(df: DataFrame, text_col: str = "text",
                      num_hashes: int = 16, shingle_n: int = 3,
                      seed: int = 42) -> DataFrame:
    """Append ``minhash`` (array<long>): per-hash-function min over word
    shingles. One native expression per hash function — no UDF.

    The shingle array is materialized in its OWN projection first:
    referencing the (expensive) shingle expression from ``num_hashes``
    sibling expressions would otherwise inline it num_hashes times —
    measured 9× slower (CollapseProject keeps multi-referenced non-cheap
    expressions in a separate stage, so the split evaluates shingles
    exactly once per row)."""
    def _hash_fn(salt):
        return lambda s: F.xxhash64(s, F.lit(salt))

    sig = F.array(*[
        F.array_min(F.transform(F.col("_shingles"), _hash_fn(seed + i)))
        for i in range(num_hashes)
    ])
    return (df.withColumn("_shingles", word_ngrams(text_col, shingle_n))
              .withColumn("minhash", sig)
              .drop("_shingles"))


def minhash_lsh_candidates(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", num_hashes: int = 16,
                           bands: int = 4, shingle_n: int = 3,
                           seed: int = 42) -> DataFrame:
    """Candidate near-duplicate pairs via banded MinHash LSH.

    signature → ``bands`` band keys (hash of the band's slice) → explode →
    self-join per (band, key) bucket. Returns distinct (a, b) id pairs
    with a < b. At scale the shuffle is on band keys; band buckets are
    the only thing ever joined."""
    rows = num_hashes // bands
    with_sig = minhash_signature(df, text_col, num_hashes, shingle_n, seed)
    band_cols = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(F.concat_ws(
                ",", *[F.element_at("minhash", b * rows + r + 1)
                       .cast("string") for r in range(rows)]))
            .alias("key"))
        for b in range(bands)
    ])
    exploded = (with_sig
                .select(F.col(id_col), F.explode(band_cols).alias("bk"))
                .select(id_col, "bk.band", "bk.key"))
    # self-join: without a cache both sides re-tokenize, re-shingle and
    # re-hash the corpus — cache the (id, band, key) index, not the text
    exploded = exploded.persist()
    left = exploded.alias("l")
    right = exploded.alias("r")
    pairs = (left.join(
                right,
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.key") == F.col("r.key"))
                & (F.col("l." + id_col) < F.col("r." + id_col)))
             .select(F.col("l." + id_col).alias("a"),
                     F.col("r." + id_col).alias("b"))
             .distinct())
    return pairs


def simhash(df: DataFrame, text_col: str = "text",
            bits: int = 64, seed: int = 42) -> DataFrame:
    """Append a 64-bit SimHash column: per-token 64-bit hashes vote ±1 on
    each bit; the sign pattern is the signature. Hamming-close signatures
    = near-duplicate texts.

    Token hashing stays native (xxhash64 inside a HOF); the bit-voting
    fold is a native aggregate over bit positions. The token-hash array
    is materialized in its own projection so the ``bits`` per-bit folds
    each scan a precomputed array instead of re-tokenizing + re-hashing
    the text (same multi-reference inlining hazard as minhash)."""
    tok_hashes = F.transform(
        F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""),
        lambda t: F.xxhash64(t, F.lit(seed)))

    def _vote(bit):
        # NOTE: pyspark HOF lambdas must take exactly the lambda-variable
        # arity — close over `bit` via factory, not a default arg
        return lambda acc, h: acc + F.when(
            F.shiftright(h, bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)

    sig = F.lit(0).cast("long")
    for bit in range(bits):
        votes = F.aggregate(F.col("_tok_hashes"), F.lit(0), _vote(bit))
        weight = (-2 ** 63) if bit == 63 else 2 ** bit  # two's complement
        sig = sig + F.when(votes > 0, F.lit(int(weight)).cast("long")) \
                     .otherwise(F.lit(0).cast("long"))
    return (df.withColumn("_tok_hashes", tok_hashes)
              .withColumn("simhash", sig)
              .drop("_tok_hashes"))


def simhash_near_dup_pairs(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", max_hamming: int = 3,
                           seed: int = 42) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Blocking via the pigeonhole principle: split the 64-bit signature
    into ``max_hamming + 1`` bands — any pair within the Hamming budget
    agrees exactly on at least one band, so candidates are pairs sharing
    (band_index, band_bits); verification is one native
    ``bit_count(a XOR b)``. Shuffle key = band value: no cross product,
    skew bounded by band-bucket size."""
    n_bands = max_hamming + 1
    width = 64 // n_bands
    sigs = simhash(df, text_col, seed=seed).select(id_col, "simhash")

    def _band(b):
        # unsigned slice of the signature: bits [b*width, (b+1)*width)
        shifted = F.shiftrightunsigned(F.col("simhash"), b * width)
        return shifted.bitwiseAND(F.lit((1 << width) - 1))

    bands = F.array(*[
        F.struct(F.lit(b).alias("band"), _band(b).alias("bits"))
        for b in range(n_bands)])
    exploded = (sigs.select(id_col, "simhash",
                            F.explode(bands).alias("bk"))
                .select(id_col, "simhash", "bk.band", "bk.bits"))
    l, r = exploded.alias("l"), exploded.alias("r")
    cand = (l.join(r, (F.col("l.band") == F.col("r.band"))
                   & (F.col("l.bits") == F.col("r.bits"))
                   & (F.col("l." + id_col) < F.col("r." + id_col)))
            .select(F.col("l." + id_col).alias("a"),
                    F.col("r." + id_col).alias("b"),
                    F.bit_count(F.col("l.simhash")
                                .bitwiseXOR(F.col("r.simhash")))
                     .alias("hamming"))
            .distinct())
    return cand.where(F.col("hamming") <= max_hamming)


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", shingle_n: int = 3,
                        threshold: float = 0.8) -> DataFrame:
    """EXACT n-gram Jaccard similarity join with prefix filtering
    (AllPairs/PPJoin-style): under any global total order on shingles
    (lexicographic here), two sets with Jaccard ≥ t must share at least
    one of their first ``n - ceil(t·n) + 1`` shingles — so only that
    prefix is exploded into the inverted index. At t=0.8 the index is
    ~5× smaller and candidate buckets shrink quadratically versus
    indexing every shingle. Verification is one native
    ``array_intersect`` over the candidates' full sorted shingle arrays
    — no co-occurrence re-join. Output is the exact Jaccard join."""
    shingled = (df.select(F.col(id_col),
                          word_ngrams(text_col, shingle_n).alias("_raw"))
                  .select(id_col, F.array_sort("_raw").alias("sh"))
                  .withColumn("n", F.size("sh")))
    # prefix length: n - ceil(t*n) + 1 (≥1 when n ≥ 1)
    prefix_len = (F.col("n")
                  - F.ceil(F.col("n") * F.lit(float(threshold))).cast("int")
                  + 1)
    shingled = shingled.persist()
    inv = (shingled
           .select(id_col, F.explode(F.slice("sh", 1, prefix_len))
                            .alias("shingle")))
    l, r = inv.alias("l"), inv.alias("r")
    # candidate ids first — the pair-dedup shuffle moves only (a, b)
    # ints; the shingle arrays join in once per UNIQUE candidate pair
    cand = (l.join(r, (F.col("l.shingle") == F.col("r.shingle"))
                   & (F.col("l." + id_col) < F.col("r." + id_col)))
            .select(F.col("l." + id_col).alias("a"),
                    F.col("r." + id_col).alias("b"))
            .distinct())
    sa = shingled.select(F.col(id_col).alias("a"),
                         F.col("sh").alias("sa"), F.col("n").alias("na"))
    sb = shingled.select(F.col(id_col).alias("b"),
                         F.col("sh").alias("sb"), F.col("n").alias("nb"))
    inter = F.size(F.array_intersect("sa", "sb"))
    jac = inter / (F.col("na") + F.col("nb") - inter)
    return (cand.join(sa, "a").join(sb, "b")
            .withColumn("jaccard", jac)
            .where(F.col("jaccard") >= threshold)
            .select("a", "b", F.round("jaccard", 6).alias("jaccard")))


def embedding_near_dup_pairs(df: DataFrame, vec_col: str = "embedding",
                             id_col: str = "vec_id", dim: int = 64,
                             threshold: float = 0.9, n_planes: int = 12,
                             seed: int = 42) -> DataFrame:
    """Cosine near-duplicates over an embedding column: hyperplane-LSH
    bucket as the blocking key, exact cosine verification inside buckets."""
    with_bucket = df.select(
        F.col(id_col), F.col(vec_col),
        hyperplane_bucket(vec_col, dim, n_planes, seed).alias("bucket"))
    l, r = with_bucket.alias("l"), with_bucket.alias("r")
    return (l.join(r, (F.col("l.bucket") == F.col("r.bucket"))
                   & (F.col("l." + id_col) < F.col("r." + id_col)))
            .withColumn("cosine",
                        cosine_similarity(F.col("l." + vec_col),
                                          F.col("r." + vec_col)))
            .where(F.col("cosine") >= threshold)
            .select(F.col("l." + id_col).alias("a"),
                    F.col("r." + id_col).alias("b"),
                    F.round("cosine", 6).alias("cosine")))
