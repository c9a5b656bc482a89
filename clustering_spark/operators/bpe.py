"""Byte-pair-encoding tokenizer: distributed training statistics,
driver-side merge learning, broadcast apply — the learn-tiny /
apply-wide shape (beyond-reference scope; the reference has no
tokenizer, and textops' token counts use a fixed regex).

Why this decomposition is the right 100 TB shape: classic BPE training
(Sennrich et al. 2016, public) needs only the WORD FREQUENCY HISTOGRAM
of the corpus, not the corpus — the merge loop's pair counts are sums
over distinct words weighted by their frequencies. So Spark does ONE
word-count shuffle over the corpus (bounded output: distinct words,
capped at ``max_words`` by frequency like every practical trainer) and
the merge loop runs driver-side on that small table. Application
broadcasts the learned merge ranks and tokenizes in an Arrow-batched
kernel with a per-batch word memo — corpora repeat words massively, so
the memo collapses the per-row cost to a dict lookup for all but the
first occurrence.

Determinism: pair-count ties break lexicographically (not dict order),
so the same histogram always learns the same merges on any cluster
layout; the histogram itself is exact, so training is end-to-end
deterministic. Tokenization is exactly invertible: joining a word's
tokens and stripping the end-of-word marker reproduces the word
(property-tested).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# GPT-2-style pre-tokenization boundary (public pattern family):
# contractions, letter runs, digit runs, other-symbol runs, each with
# an optional leading space kept ON the token — spaces therefore
# survive the roundtrip. Java regex (Spark-side split) and Python re
# agree on this subset.
PRETOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+|[ ]+"

END = "</w>"  # end-of-word marker: makes token sequences uniquely parseable


def _word_symbols(word: str, end: str = END) -> tuple[str, ...]:
    return tuple(word[:-1]) + (word[-1] + end,) if word else ()


def _bytes_to_unicode() -> dict[int, str]:
    """GPT-2's byte↔printable-unicode table (public algorithm,
    openai/gpt-2 encoder.py): the 188 printable latin bytes map to
    themselves, the rest to codepoints 256+ in order — a bijection,
    so BYTE-level BPE can ride the same string-symbol machinery as
    the char-level mode with zero escaping."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


_BYTE_CHAR = _bytes_to_unicode()
_CHAR_BYTE = {c: b for b, c in _BYTE_CHAR.items()}

# Byte-mode end-of-word marker: the first codepoint PAST the byte
# table (table spans the 188 self-mapped bytes + codepoints 256..323),
# so it can never collide with data — unlike "</w>", whose four chars
# are all in the byte alphabet, making a data-vs-marker suffix
# genuinely ambiguous after merges.
END_BYTE = chr(324)


def _strip_end(joined: str, end: str) -> str:
    """Remove end-of-word markers from a concatenated token string.
    END only ever rides as a SUFFIX of word-final symbols (merges
    concatenate within a word, and the word-final symbol has no right
    neighbor), so plain str.replace is exact for byte mode (END_BYTE
    is outside the data alphabet) and correct for char mode except
    the one residual in-band ambiguity: data that itself spells the
    marker (documented char-mode caveat; byte mode is the production
    path precisely because it has none)."""
    return joined.replace(end, "")


def _to_byte_form(word: str) -> str:
    """UTF-8 encode then map every byte to its table char — the
    byte-level symbol string BPE operates on. Injective (UTF-8 is,
    and the table is a bijection), so histograms never collide."""
    return "".join(_BYTE_CHAR[b] for b in word.encode("utf-8"))


def _from_byte_form(s: str) -> str:
    """Inverse of _to_byte_form. 'replace' keeps a token sequence
    cut mid-codepoint decodable (U+FFFD), matching every production
    byte-level tokenizer's decode posture; full sequences from
    encode round-trip exactly. Chars OUTSIDE the byte table (e.g. a
    stray end-of-word marker from a mismatched ``end`` argument)
    become U+FFFD instead of raising — decode never throws on
    malformed symbol streams, same posture as the UTF-8 layer."""
    out: list[str] = []
    buf = bytearray()
    for c in s:
        b = _CHAR_BYTE.get(c)
        if b is None:
            if buf:
                out.append(buf.decode("utf-8", "replace"))
                buf.clear()
            out.append("�")
        else:
            buf.append(b)
    if buf:
        out.append(buf.decode("utf-8", "replace"))
    return "".join(out)


def learn_merges(
    word_counts: dict[str, int],
    n_merges: int,
    _stats: dict | None = None,
    end: str = END,
) -> list[tuple[str, str]]:
    """Classic BPE merge loop over a word-frequency histogram (pure
    Python, driver-side — the histogram IS the sufficient statistic).
    Ties on pair count break lexicographically for determinism.
    ``_stats`` (tests only) receives ``{"word_walks": total words
    visited by the merge loop}`` — the complexity regression pin.

    INCREMENTAL pair maintenance, not per-merge recount: global pair
    counts and a pair→words-containing-it index are built once; each
    merge touches only the words that contain the merged pair and
    applies their before/after pair-count delta. Per-merge cost is
    O(symbols in affected words) — measured: a 1,000,000-word random
    histogram learns 1,000 merges in ~102 s / 3.33M word walks
    (PERFORMANCE.md round-12 entry), where the naive
    O(histogram × merges) recount (the first cut of this function)
    is ~1e9 walks — the same reason every practical BPE trainer is
    written this way."""
    words: list[list[str]] = []
    counts: list[int] = []
    for w, c in word_counts.items():
        sym = list(_word_symbols(w, end))
        if sym:
            words.append(sym)
            counts.append(int(c))

    pair_counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for wi, (sym, c) in enumerate(zip(words, counts)):
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + c
            where.setdefault(p, set()).add(wi)

    def _account(wi: int, sym: list[str], c: int, sign: int) -> None:
        for i in range(len(sym) - 1):
            p = (sym[i], sym[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + sign * c
            if sign > 0:
                where.setdefault(p, set()).add(wi)
            elif pair_counts[p] <= 0:
                pair_counts.pop(p, None)
                where.pop(p, None)
            else:
                # drop wi from the index NOW (it is re-added by the +1
                # pass for pairs the rewritten word still contains):
                # leaving it made later merges of p re-walk words that
                # no longer contain p — net-zero accounting kept that
                # CORRECT but wasted a full scan per stale entry, a
                # real tail on Zipf histograms where hot symbols join
                # thousands of pairs. Merge output is byte-identical
                # (pair_counts never depended on the index).
                s = where.get(p)
                if s is not None:
                    s.discard(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best_pair, best_n = max(
            pair_counts.items(), key=lambda kv: (kv[1], kv[0])
        )
        if best_n < 2:
            break  # nothing repeats: further merges are memorization
        a, b = best_pair
        merges.append((a, b))
        ab = a + b
        for wi in sorted(where.get((a, b), ())):
            if _stats is not None:
                _stats["word_walks"] = _stats.get("word_walks", 0) + 1
            sym, c = words[wi], counts[wi]
            _account(wi, sym, c, -1)
            i = 0
            while i < len(sym) - 1:
                if sym[i] == a and sym[i + 1] == b:
                    sym[i : i + 2] = [ab]
                else:
                    i += 1
            _account(wi, sym, c, +1)
    return merges


def train_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int = 1000,
    max_words: int = 1_000_000,
    byte_level: bool = False,
) -> dict:
    """Train a BPE model over a corpus: ONE distributed
    pretokenize+count shuffle, then the driver-side merge loop on the
    top-``max_words`` histogram (the standard frequency cap — rare-word
    tails contribute ~nothing to pair counts but dominate histogram
    size). Returns ``{"merges": [...], "pretoken_re": ...}`` — plain
    data, broadcastable, picklable, JSON-able.

    ``byte_level=True`` (round 14) is the GPT-2-style production
    mode: pretokens are UTF-8-encoded and merges learned over BYTE
    sequences (via the byte↔unicode table), with the full 256-byte
    alphabet (plus word-final variants) in the base vocabulary — so
    NO input can ever tokenize to ``<unk>``. The distributed word
    count is unchanged (the byte mapping is applied to the
    driver-side histogram, ≤ ``max_words`` rows); char-level stays
    the default for parity with existing pins."""
    # F.lit pattern, not an F.expr SQL string: the pattern contains a
    # single quote (the contraction branch) that would break quoting
    counts = (
        df.select(
            F.explode(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(PRETOKEN_RE), F.lit(0)
                )
            ).alias("w")
        )
        .groupBy("w")
        .count()
        .orderBy(F.col("count").desc(), "w")
        .limit(max_words)
        .collect()
    )
    hist = {r["w"]: r["count"] for r in counts}
    if byte_level:
        # injective mapping, so counts never collide; the alphabet
        # is the COMPLETE byte space (every byte char and its
        # word-final form), independent of what the histogram
        # happened to contain — the zero-unk guarantee
        hist = {_to_byte_form(w): c for w, c in hist.items()}
        alphabet = sorted(_BYTE_CHAR.values()) + sorted(
            c + END_BYTE for c in _BYTE_CHAR.values()
        )
        return {
            "merges": learn_merges(hist, n_merges, end=END_BYTE),
            "alphabet": alphabet,
            "pretoken_re": PRETOKEN_RE,
            "end": END_BYTE,
            "mode": "byte",
        }
    # the initial symbol alphabet (chars + char</w> forms) rides the
    # model so build_vocab can assign COMPLETE, deterministic ids —
    # merges alone only name the learned units, not the base symbols
    alphabet: set[str] = set()
    for w in hist:
        alphabet.update(_word_symbols(w))
    return {
        "merges": learn_merges(hist, n_merges),
        "alphabet": sorted(alphabet),
        "pretoken_re": PRETOKEN_RE,
        "end": END,
        "mode": "char",
    }


def _encode_word(
    word: str, ranks: dict[tuple[str, str], int], end: str = END
) -> list[str]:
    sym = list(_word_symbols(word, end))
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def _word_kernel(
    df: DataFrame,
    text_col: str,
    model: dict,
    out_col: str,
    out_type: str,
    map_word,
):
    """Shared fused Arrow kernel for the per-word BPE apply family
    (round-15 review: bpe_tokenize and bpe_encode_ids duplicated
    this scaffold): ONE mapInPandas doing pretokenize -> merge walk
    -> ``map_word``, with the bounded per-word memo storing
    map_word's OUTPUT so memo hits skip the mapping too. NULL text
    degrades to an empty array (the text-stack contract).

    The memo is bounded, not unbounded: an adversarially diverse
    corpus (random strings, unique ids) would otherwise grow it
    without limit inside a long-lived Python worker. Zipfian text
    keeps its hot words resident long before the cap; on overflow
    the memo drops wholesale (cheap, and the hot set re-fills
    within one batch)."""
    import re

    ranks = {pair: i for i, pair in enumerate(map(tuple, model["merges"]))}
    pat = re.compile(model.get("pretoken_re", PRETOKEN_RE))
    # byte mode: words pass through the byte<->unicode table before
    # the merge walk and symbols end with END_BYTE; absent keys =
    # char (models trained before round 14)
    end = model.get("end", END)
    to_form = (
        _to_byte_form
        if model.get("mode", "char") == "byte"
        else (lambda w: w)
    )
    memo: dict = {}
    memo_cap = 1_000_000

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def enc(text):
            if text is None:
                return []
            out: list = []
            for w in pat.findall(text):
                v = memo.get(w)
                if v is None:
                    if len(memo) >= memo_cap:
                        memo.clear()
                    v = map_word(_encode_word(to_form(w), ranks, end))
                    memo[w] = v
                out.extend(v)
            return out

        for pdf in it:
            pdf = pdf.copy()
            pdf[out_col] = [enc(t) for t in pdf[text_col]]
            yield pdf

    schema = ", ".join(
        f"`{c}` {t}" for c, t in df.dtypes
    ) + f", `{out_col}` {out_type}"
    return df.mapInPandas(batches, schema)


def bpe_tokenize(
    df: DataFrame,
    text_col: str,
    model: dict,
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append ``out_col`` (array<string> of BPE tokens) to every row.
    Arrow-batched kernel over the broadcast merge ranks with a
    bounded per-word memo: real corpora re-use words constantly, so
    amortized per-word cost is one dict hit. NULL text tokenizes to
    an empty array (the NULL-degrade contract of the text stack)."""
    return _word_kernel(
        df, text_col, model, out_col, "array<string>", lambda toks: toks
    )


UNK = "<unk>"  # chars never seen in the training histogram
PAD = "<pad>"  # reserved filler for fixed-length id rows
EOS = "<eos>"  # reserved end-of-document marker for packed id rows


def build_vocab(
    model: dict, specials: tuple[str, ...] = (UNK,)
) -> dict[str, int]:
    """Deterministic token→id table from a trained model: the
    ``specials`` get the first ids in order (``<unk>`` MUST be among
    them — in CHAR-level models a codepoint outside the training
    alphabet maps there at apply time; BYTE-level models carry the
    complete 256-byte alphabet so ``<unk>`` is unreachable, but the
    reserved id keeps the id-space layout identical across modes),
    the sorted initial alphabet follows, then
    one id per merge in learned order (the classic BPE vocabulary
    shape). Reserve ``PAD``/``EOS`` here when emitting packed id rows:
    an eos/pad id chosen from the REAL vocabulary range silently
    collides with a legitimate token (a decoder then cannot tell a
    document boundary from that token — found the hard way in the
    crawl capstone). Merged tokens that equal an alphabet entry cannot
    occur (a merge always concatenates two symbols), so ids are
    collision-free."""
    if "alphabet" not in model:
        raise ValueError(
            "model has no 'alphabet' (trained before round 12?) — "
            "re-train with train_bpe, or inject model['alphabet']"
        )
    if UNK not in specials:
        raise ValueError(f"specials must include {UNK!r}")
    vocab: dict[str, int] = {}
    for sp in specials:
        if sp in vocab:
            raise ValueError(f"duplicate special token {sp!r}")
        vocab[sp] = len(vocab)
    for sym in model["alphabet"]:
        vocab[sym] = len(vocab)
    for a, b in map(tuple, model["merges"]):
        tok = a + b
        # a merge CAN reproduce an existing token when two different
        # pairs concatenate to the same string (e.g. ('a','bc') after
        # ('ab','c') both spell 'abc') — first id wins, the duplicate
        # merge maps to it
        vocab.setdefault(tok, len(vocab))
    return vocab


def bpe_encode_ids(
    df: DataFrame,
    text_col: str,
    model: dict,
    out_col: str = "bpe_ids",
    specials: tuple[str, ...] = (UNK,),
) -> DataFrame:
    """Append ``out_col`` (array<int> of vocabulary ids) — what a
    training pipeline actually feeds the model; the string-token form
    (bpe_tokenize) is the debugging view. Same fused Arrow kernel
    (one crossing — round 15; the earlier tokenize-then-map
    composition crossed Arrow twice and measured 1.75x slower at
    sf0.1), with the memo storing the ID LIST directly; tokens
    outside the vocabulary (unseen chars, char mode only) map to
    ``<unk>``. Pass the same ``specials`` you plan to pack with
    (e.g. ``(UNK, PAD, EOS)``) so the reserved ids are carved out of
    the id space. Roundtrips exactly through decode for in-alphabet
    text (property-tested)."""
    vocab = build_vocab(model, specials)
    unk = vocab[UNK]
    return _word_kernel(
        df,
        text_col,
        model,
        out_col,
        "array<int>",
        lambda toks: [vocab.get(t, unk) for t in toks],
    )


def bpe_decode_ids(
    ids: list[int],
    model: dict,
    end: str | None = None,
    specials: tuple[str, ...] = (UNK,),
) -> str:
    """Inverse of bpe_encode_ids for in-vocabulary sequences (driver-
    side helper for tests/inspection). Every special — ``<unk>``,
    ``<pad>``, ``<eos>``, … — decodes to the empty string: none of
    them carries recoverable source text. Byte-level models map the
    joined symbol string back through the byte table before UTF-8
    decoding; ``end`` defaults to the model's own marker."""
    vocab = build_vocab(model, specials)
    drop = {vocab[sp] for sp in specials}
    inv = {i: t for t, i in vocab.items()}
    joined = _strip_end(
        "".join("" if i in drop else inv.get(i, "") for i in ids),
        model.get("end", END) if end is None else end,
    )
    if model.get("mode", "char") == "byte":
        return _from_byte_form(joined)
    return joined


def bpe_decode_tokens(
    tokens: list[str], end: str | None = None, mode: str = "char"
) -> str:
    """Inverse of the per-row tokenization: concatenate and strip the
    end-of-word markers (then undo the byte table for byte-level
    models). ``end`` defaults FROM ``mode`` — END_BYTE for byte
    mode, "</w>" for char mode — so the correct pairing is not left
    to the caller (round-14 advisor: mode="byte" with the char
    default left chr(324) in the joined string). An explicit ``end``
    still overrides (e.g. a model trained with a custom marker)."""
    if end is None:
        end = END_BYTE if mode == "byte" else END
    joined = _strip_end("".join(tokens), end)
    return _from_byte_form(joined) if mode == "byte" else joined


def bpe_token_count(
    df: DataFrame,
    text_col: str,
    model: dict,
    out_col: str = "n_bpe_tokens",
) -> DataFrame:
    """Per-row learned-vocabulary token count — the budget signal
    sequence packing / mixture planning should use once a real
    tokenizer exists (textops' regex count is the model-free stand-in).
    Counts via the TOKENIZE kernel, not the id kernel (round-15
    second review): both are the same one-Arrow-crossing fused
    kernel, but the id path needs ``build_vocab`` and therefore a
    model with an ``alphabet`` — a count does not, and merge-only
    model dicts (externally produced / pre-round-12) must keep
    counting."""
    toks = bpe_tokenize(df, text_col, model, out_col="__bpe")
    return toks.withColumn(out_col, F.size("__bpe")).drop("__bpe")


__all__ = [
    "PRETOKEN_RE",
    "END",
    "END_BYTE",
    "UNK",
    "PAD",
    "EOS",
    "train_bpe",
    "learn_merges",
    "build_vocab",
    "bpe_tokenize",
    "bpe_encode_ids",
    "bpe_decode_ids",
    "bpe_token_count",
    "bpe_decode_tokens",
]
