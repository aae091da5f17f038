"""Distributed BPE (byte-pair-encoding) tokenizer training — a
training-data-pipeline extension (the reference has no tokenizer; its
closest surface is the BPE-ish token ESTIMATE in operators/text.py).

The scale insight (same as every production BPE trainer): the corpus is
never iterated during training — only the WORD-COUNT table is, and the
distinct-word vocabulary of even a 100 TB corpus is ~10^7 rows (Heaps'
law), which fits on the driver — and because Heaps' law fails on
adversarial corpora (hash/UUID/base64 spam), the collect is bounded by
a coded ``max_vocab`` top-k guard, not the assumption.  So:

- ``bpe_word_counts``  — ONE distributed pass: tokenize, groupBy(word).
  This is the only corpus-scale job in training.
- ``bpe_pair_counts``  — symbol-pair frequencies for a segmentation,
  expressed as DataFrame ops over the (small) word-count table — used for
  the oracle-checked first iteration and for distributed re-counts.
- ``bpe_train``        — the Sennrich merge loop over the collected
  word-count dict with INCREMENTAL pair-count updates (each merge only
  touches words containing the pair, via an inverted index).  Tie-break:
  (count desc, pair lexicographically asc) — fully deterministic.
- ``bpe_encode``       — apply trained merges corpus-wide in Arrow
  batches with a per-executor word→tokens memo (Zipf makes the memo hit
  rate ~99%: a few 10^5 distinct words cover almost all tokens).

Word tokenization is the engine's portable lowercase ``[^a-z0-9]+`` split
(see operators/retrieval.py) so oracles can replicate it; each word gets a
terminal ``</w>`` symbol (word-boundary-aware merges, per the original BPE
formulation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from niamoto_spark.registry import PluginType, register

END = "</w>"
_TOKEN_SPLIT = "[^a-z0-9]+"


def _words(text_col) -> "F.Column":
    return F.filter(F.split(F.lower(text_col), _TOKEN_SPLIT),
                    lambda t: t != "")


def bpe_word_counts(df: DataFrame, text_col: str,
                    min_word_count: int = 1,
                    max_vocab: int | None = None) -> DataFrame:
    """(word, n) — the one corpus-scale aggregation of BPE training.

    The two guards bound the frame BEFORE any driver collect:

    - ``min_word_count`` prunes words rarer than the threshold inside
      the aggregation job (a filter on the combined counts, executor
      side).  NOTE this is a word-level prune, not the merge-loop's
      pair-level ``min_count`` stop: pair counts aggregate across
      words, so dropping n=1 words can change pair totals — it is the
      standard trainer approximation (SentencePiece/HF min_frequency),
      exact only when rare words are noise.
    - ``max_vocab`` keeps the top-k words by (n desc, word asc) — a
      deterministic TakeOrderedAndProject, no global sort.  This is
      the unconditional driver-memory bound: Heaps' law says natural
      text tops out ~10^7 distinct words, but adversarial web corpora
      full of hashes/UUIDs/base64 grow distinct "words" with corpus
      size, and the cap holds regardless.
    """
    wc = (df.select(F.explode(_words(F.col(text_col))).alias("word"))
          .groupBy("word").agg(F.count(F.lit(1)).alias("n")))
    if min_word_count > 1:
        wc = wc.where(F.col("n") >= min_word_count)
    if max_vocab is not None:
        wc = wc.orderBy(F.desc("n"), "word").limit(max_vocab)
    return wc


def initial_segmentation(word_counts: DataFrame) -> DataFrame:
    """(word, n, syms array<string>): characters + terminal </w>."""
    return word_counts.withColumn(
        "syms", F.concat(F.split(F.col("word"), ""), F.array(F.lit(END))))


def bpe_pair_counts(segmented: DataFrame) -> DataFrame:
    """(sym_a, sym_b, pair_n) — adjacent-symbol pair frequencies weighted
    by word count.  Pure codegen: sequence + element_at explode, one
    hash aggregation; input is the word-count table, not the corpus."""
    idx = F.explode(F.sequence(F.lit(1), F.size("syms") - 1)).alias("i")
    pairs = (segmented.select("n", idx, "syms")
             .select("n",
                     F.element_at("syms", F.col("i")).alias("sym_a"),
                     F.element_at("syms", F.col("i") + 1).alias("sym_b")))
    return (pairs.groupBy("sym_a", "sym_b")
            .agg(F.sum("n").alias("pair_n")))


def bpe_train(df: DataFrame, text_col: str, num_merges: int = 1000,
              min_count: int = 2, min_word_count: int = 1,
              max_vocab: int = 10_000_000) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merges from the corpus.  Returns the ordered
    merge list [(sym_a, sym_b), ...].  Driver cost is O(vocab) per merge
    touched-word set, never O(corpus).

    Driver memory is bounded by construction: the collect below pulls
    at most ``max_vocab`` rows (top words by count, deterministic
    tie-break) — the Heaps'-law assumption is a default, not a load-
    bearing invariant, so a hash-spam corpus with corpus-proportional
    distinct "words" cannot OOM the driver.  ``min_word_count`` (off by
    default) additionally prunes rare words executor-side; see
    ``bpe_word_counts`` for why that is an approximation knob distinct
    from the pair-level ``min_count`` merge stop."""
    rows = bpe_word_counts(df, text_col, min_word_count=min_word_count,
                           max_vocab=max_vocab).collect()
    segs: dict[str, list[str]] = {}
    counts: dict[str, int] = {}
    for r in rows:
        w = r["word"]
        counts[w] = r["n"]
        segs[w] = list(w) + [END]

    # pair -> total count, and inverted index pair -> words containing it
    pair_n: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[str]] = {}
    for w, syms in segs.items():
        n = counts[w]
        for a, b in zip(syms, syms[1:]):
            pair_n[a, b] = pair_n.get((a, b), 0) + n
            where.setdefault((a, b), set()).add(w)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_n:
            break
        best = min(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_n[best] < min_count:
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        for w in list(where.get(best, ())):
            syms = segs[w]
            n = counts[w]
            # remove old pair contributions of this word
            for a, b in zip(syms, syms[1:]):
                pair_n[a, b] -= n
                if pair_n[a, b] <= 0:
                    del pair_n[a, b]
                ws = where.get((a, b))
                if ws is not None:
                    ws.discard(w)
                    if not ws:
                        del where[a, b]
            # apply the merge left-to-right
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms)
                        and (syms[i], syms[i + 1]) == best):
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out
            # add new pair contributions
            for a, b in zip(out, out[1:]):
                pair_n[a, b] = pair_n.get((a, b), 0) + n
                where.setdefault((a, b), set()).add(w)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


@register("bpe_encode", PluginType.TRANSFORMER)
def bpe_encode(df: DataFrame, id_col: str, text_col: str,
               merges: list[tuple[str, str]]) -> DataFrame:
    """(id, n_words, n_bpe_tokens, tokens array<string>) — tokenize each
    document with the trained merges (lowest-rank pair first, the standard
    BPE application order).  Arrow-batched with a word-level memo."""
    import pandas as pd
    from pyspark.sql import types as T

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    sc = df.sparkSession.sparkContext
    br = sc.broadcast(ranks)
    import re
    splitter = re.compile(_TOKEN_SPLIT)

    out_schema = T.StructType([
        T.StructField("__bpe_id", df.schema[id_col].dataType, False),
        T.StructField("n_words", T.IntegerType(), False),
        T.StructField("n_bpe_tokens", T.IntegerType(), False),
        T.StructField("tokens", T.ArrayType(T.StringType()), False),
    ])

    def encode(batches):
        rk = br.value
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            ids, nw, nt, toks = [], [], [], []
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in splitter.split((txt or "").lower()) if w]
                doc_tokens: list[str] = []
                for w in words:
                    got = memo.get(w)
                    if got is None:
                        got = memo[w] = _encode_word(w, rk)
                    doc_tokens.extend(got)
                ids.append(i)
                nw.append(len(words))
                nt.append(len(doc_tokens))
                toks.append(doc_tokens)
            yield pd.DataFrame({"__bpe_id": ids, "n_words": nw,
                                "n_bpe_tokens": nt, "tokens": toks})

    return (df.select(id_col, text_col).mapInPandas(encode, out_schema)
            .withColumnRenamed("__bpe_id", id_col))
