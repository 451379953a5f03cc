"""Train/test decontamination — the standard pre-training hygiene
pass: flag training documents whose n-gram shingles overlap an
evaluation set, so benchmark answers don't leak into the corpus
(GPT-3/PaLM-style n-gram decontamination; VERDICT r3 item 3).

Semantics: for a training doc T and an eval doc E, the default
``normalize="eval"`` scores ``overlap(T, E) = |shingles(T) ∩
shingles(E)| / |shingles(E)|`` — the fraction of the EVAL doc's
distinct word n-grams that appear in the training doc. Normalizing by
the eval item is what PaLM-style decontamination does, and it is the
direction that matters: a 10,000-token page embedding a 50-token
benchmark question verbatim leaks the entire question, yet scores
~0.004 under train-side normalization — the contamination hides
exactly where the document is long. ``normalize="train"`` (|∩|/|T|)
is available for the converse question — "is this training doc
mostly made of eval material?" — useful for near-dup pruning of eval
copies. Shingling is the same normalized ``word_ngrams`` the whole
dedup family uses, so case/punctuation jitter can't hide
contamination. A doc is contaminated when its best-matching eval doc
reaches ``threshold``; the output reports that eval doc (ties broken
by min eval id) and the overlap fraction.

Scale design (10^10 train docs × 10^3..10^5 eval docs):

* the EVAL side is the small side by definition — its exploded
  (shingle, eval_id) inverted index is broadcast, so the training
  corpus streams through a broadcast-hash join with no train-side
  shuffle on the raw shingles;
* the per-(train, eval) intersection count is an ordinary map-side-
  combining aggregation — the only shuffle carries matched (train_id,
  eval_id) pairs, never the corpus;
* the default ``shingle_n=13`` is the published decontamination
  setting and keeps cross-doc shingle collisions (the fan-out of the
  join) near zero on real text: a 13-gram shared by chance is
  vanishingly rare, so the join output is ~|true contamination|. Short
  synthetic corpora should pass a smaller n explicitly.

Short eval items (ADVICE r4): an eval doc with fewer than ``shingle_n``
tokens shingles — via ``word_ngrams``' fallback — to ONE whole-text
shingle of its own token count, which no ``shingle_n``-gram of a longer
training doc can ever equal: a 10-token benchmark question would be
invisible to the pass at n=13. With ``cover_short_eval=True`` (default)
the operator collects the distinct short sizes actually present in the
eval set (a tiny eval-side aggregation — at most ``shingle_n - 1``
values) and ADDITIONALLY indexes every training doc's shingles at those
sizes, in the same single train-side scan. Shingle-string equality
implies equal token counts, so the mixed-size inverted index never
cross-matches sizes; an eval doc of s < n tokens then flags exactly the
training docs containing its s tokens verbatim (overlap 1.0 — its one
shingle is its whole text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens, word_ngram_hashes_sized
from .dedup import _shingle_docs, _widen


def decontaminate(train: DataFrame, eval_df: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  eval_text_col: str | None = None,
                  eval_id_col: str | None = None,
                  shingle_n: int = 13,
                  threshold: float = 0.8,
                  max_eval_shingle_df: int | None = None,
                  normalize: str = "eval",
                  broadcast_eval: bool = True,
                  cover_short_eval: bool = True) -> DataFrame:
    """Returns ``(doc_id, eval_id, overlap)`` — one row per CONTAMINATED
    training doc (best-matching eval doc's overlap ≥ ``threshold``;
    ties on overlap resolve to the smallest eval id). Training docs
    with no qualifying eval match are absent — the clean set is the
    anti-join of the input against this result.

    ``max_eval_shingle_df`` is the fan-out guard-rail for SHORT
    shingle settings: an eval-side shingle appearing in more than that
    many eval docs (a stop-phrase at n=3) multiplies every matching
    train doc by its eval document frequency in the join output. Such
    shingles carry no contamination signal — GPT-3-style pipelines
    drop high-DF n-grams for the same reason — so the cap excludes
    them from the index: hot shingles come from a map-side-combining
    groupBy over the eval index and are broadcast-anti-joined out
    (the same lazy bound as the dedup blockers — no window, so the
    cap stays combiner-friendly even for ``broadcast_eval=False``
    eval sets; VERDICT r4 item 5). Default ``None`` keeps the exact
    semantics; at the 13-gram default the fan-out is ~1 and no cap is
    needed.

    ``cover_short_eval`` indexes training docs at the shingle sizes of
    eval items shorter than ``shingle_n`` (see module docstring); the
    extra sizes ride the same train-side scan (one extra tokenization
    per row, only when short eval items exist). ``n`` — the
    ``normalize="train"`` denominator — stays the ``shingle_n``-size
    shingle count.

    ``broadcast_eval=False`` switches the shingle join to an ordinary
    shuffle join for eval sets too large to broadcast (the forced
    broadcast ignores autoBroadcastJoinThreshold, so a 10^5-doc eval
    set's exploded index — gigabytes — would otherwise be collected to
    the driver and shipped to every executor)."""
    eval_text_col = eval_text_col or text_col
    eval_id_col = eval_id_col or id_col
    if not 0 < threshold <= 1:
        raise ValueError("threshold must be in (0, 1]")
    if max_eval_shingle_df is not None and max_eval_shingle_df < 1:
        raise ValueError("max_eval_shingle_df must be >= 1")
    if normalize not in ("eval", "train"):
        raise ValueError("normalize must be 'eval' or 'train'")
    short_sizes: list = []
    if cover_short_eval and shingle_n > 1:
        # the distinct sub-shingle_n token counts present in the eval
        # set — an eval-side-only aggregation (small by definition)
        # yielding at most shingle_n - 1 values
        tok_n = F.size(tokens(F.regexp_replace(
            F.lower(F.col(eval_text_col)), r"[^a-z0-9\s]+", " ")))
        short_sizes = sorted(
            r["s"] for r in eval_df.select(tok_n.alias("s"))
            .where((F.col("s") > 0) & (F.col("s") < shingle_n))
            .distinct().collect())
    if short_sizes:
        # ONE train-side tokenization: main-size shingles (the
        # normalize="train" denominator) plus the short eval sizes'
        # shingles, per-doc distinct across sizes, built together by
        # word_ngram_hashes_sized (the two-expression form tokenized
        # the corpus twice). Shingles ride as 64-bit hashes (the same
        # representation _shingle_docs uses): equal-length shingle
        # strings can't cross-match sizes, and hashes inherit that up
        # to a ~10⁻¹⁹ 64-bit collision (word_ngram_hashes docstring) —
        # while the exploded inverted-index join below ships 8-byte
        # keys instead of shingle text
        base = _widen(train.select(F.col(id_col), F.col(text_col)))
        tr = (base
              .withColumn("_s", word_ngram_hashes_sized(
                  text_col, shingle_n, short_sizes))
              .select(F.col(id_col),
                      F.col("_s.sh").alias("sh"),
                      F.col("_s.n").alias("n")))
    else:
        tr = _shingle_docs(train, text_col, id_col, shingle_n)
    ev = _shingle_docs(eval_df, eval_text_col, eval_id_col, shingle_n)
    ev_sizes = (ev.select(F.col(eval_id_col).alias("eval_id"),
                          F.col("n").alias("_en")))
    ev_inv = (ev.select(F.col(eval_id_col).alias("eval_id"),
                        F.explode("sh").alias("shingle")))
    if max_eval_shingle_df is not None:
        # lazy hot-shingle bound, mirroring the dedup blockers: DF comes
        # from a map-side-combining count, the (few) hot shingles are
        # broadcast and anti-joined out in place — no window sort, no
        # concentration, combiner-friendly at any eval-set size
        hot = (ev_inv.groupBy("shingle")
               .agg(F.count(F.lit(1)).alias("_df"))
               .where(F.col("_df") > max_eval_shingle_df)
               .select("shingle"))
        ev_inv = ev_inv.join(F.broadcast(hot), "shingle", "left_anti")
    if broadcast_eval:
        ev_inv = F.broadcast(ev_inv)
    tr_inv = (tr.select(F.col(id_col), F.col("n"),
                        F.explode("sh").alias("shingle")))
    hits = (tr_inv.join(ev_inv, "shingle")
            .groupBy(id_col, "eval_id")
            .agg(F.count(F.lit(1)).alias("_i"),
                 F.min("n").alias("_tn")))
    if normalize == "eval":
        # eval sizes are one row per eval doc — always broadcastable
        hits = hits.join(F.broadcast(ev_sizes), "eval_id")
        denom = F.col("_en")
    else:
        denom = F.col("_tn")
    scored = hits.withColumn("overlap", F.col("_i") / denom)
    w = (Window.partitionBy(id_col)
         .orderBy(F.desc("overlap"), F.asc("eval_id")))
    return (scored
            .withColumn("_rn", F.row_number().over(w))
            .where((F.col("_rn") == 1)
                   & (F.col("overlap") >= threshold))
            .select(id_col, "eval_id",
                    F.round("overlap", 6).alias("overlap")))
