"""Text-analysis kernels for the documents pipeline (driver prompt:
language-ID, quality scoring, token counting, document fingerprinting,
shingling / MinHash / SimHash for dedup).

All kernels are batch-level (list[str] in → numpy/list out) so they run
vectorized inside ``map_batches``; per-string work uses compiled regexes
and C-level str methods only.  Hash-based kernels build on the engine's
pinned 64-bit fingerprint (functions/hashing.py) — deterministic across
processes, PYTHONHASHSEED-independent.
"""

from __future__ import annotations

import re

import numpy as np

from .hashing import fingerprint64

_WS_SPLIT = re.compile(r"\s+")
_PUNCT = re.compile(r"[.!?,;:]")
_WORD = re.compile(r"[\w']+", re.UNICODE)

# tiny per-language stopword profiles for the n-gram/stopword heuristic
# language-ID (public-knowledge wordlists; this is a heuristic, not a model)
_LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to a in is that it for was on are as with at be this".split()),
    "de": frozenset("der die und das in den von zu mit sich des auf ist im nicht ein".split()),
    "es": frozenset("de la que el en y a los del se las por un para con una su es".split()),
    "fr": frozenset("de la le et les des en un du une est que dans qui pour sur pas".split()),
}


def count_tokens(texts: list[str]) -> np.ndarray:
    """Whitespace token count: len of \\s+ split with empties dropped.
    (Semantics chosen to be expressible in the DuckDB oracle.)"""
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        out[i] = len([w for w in _WS_SPLIT.split(t) if w]) if t else 0
    return out


def quality_metrics(texts: list[str]) -> dict[str, np.ndarray]:
    """Length / punctuation / stopword-ratio quality signals.

    punct_ratio   = count of .!?,;: characters / n_chars
    stop_ratio    = english-stopword tokens / tokens
    mean_word_len = n_chars_in_word_tokens / n_word_tokens
    """
    n = len(texts)
    n_chars = np.empty(n, dtype=np.int64)
    punct_ratio = np.empty(n, dtype=np.float64)
    stop_ratio = np.empty(n, dtype=np.float64)
    mean_word_len = np.empty(n, dtype=np.float64)
    en = _LANG_PROFILES["en"]
    for i, t in enumerate(texts):
        t = t or ""
        n_chars[i] = len(t)
        punct_ratio[i] = len(_PUNCT.findall(t)) / len(t) if t else 0.0
        words = _WORD.findall(t.lower())
        if words:
            stop_ratio[i] = sum(1 for w in words if w in en) / len(words)
            mean_word_len[i] = sum(len(w) for w in words) / len(words)
        else:
            stop_ratio[i] = 0.0
            mean_word_len[i] = 0.0
    return {
        "n_chars": n_chars,
        "punct_ratio": punct_ratio,
        "stop_ratio": stop_ratio,
        "mean_word_len": mean_word_len,
    }


def detect_lang(texts: list[str]) -> list[str]:
    """Heuristic language-ID: CJK codepoint share → 'zh'; else the
    stopword profile with the highest hit rate; tie/none → 'unknown'."""
    out = []
    for t in texts:
        t = (t or "")[:2000]
        if not t:
            out.append("unknown")
            continue
        cjk = sum(1 for ch in t if "一" <= ch <= "鿿")
        if cjk / max(1, len(t)) > 0.05:
            out.append("zh")
            continue
        words = _WORD.findall(t.lower())
        if not words:
            out.append("unknown")
            continue
        best_lang, best_hits = "unknown", 0
        for lang, prof in _LANG_PROFILES.items():
            hits = sum(1 for w in words if w in prof)
            if hits > best_hits:
                best_lang, best_hits = lang, hits
        out.append(best_lang if best_hits >= max(1, len(words) // 50) else "unknown")
    return out


def split_bucket(ids) -> np.ndarray:
    """Deterministic dataset-split bucket (0–9) per doc id: first byte of
    md5(str(id)) mod 10.  The SINGLE definition behind
    ``doc_split_assign`` (train 0–7 / val 8 / test 9), decontamination's
    held-out set, and the composed trainprep pipeline; the DuckDB oracle
    mirrors it as ``CAST('0x' || substr(md5(id::VARCHAR), 1, 2) AS INT)
    % 10``."""
    import hashlib

    return np.fromiter(
        (hashlib.md5(str(i).encode()).digest()[0] % 10 for i in ids),
        dtype=np.int64,
        count=len(ids),
    )


def greedy_pack(n_tokens: np.ndarray, budget: int) -> np.ndarray:
    """Greedy token-budget chunk assignment over an ordered doc sequence:
    sequential fill, open a new chunk when adding the next doc would
    exceed ``budget`` (a doc above the budget gets a chunk of its own).
    Shared by the standalone packing operator and the trainprep
    pipeline so the semantics cannot drift."""
    chunk = np.empty(len(n_tokens), dtype=np.int64)
    cid, acc = 0, 0
    for i, t in enumerate(n_tokens):
        t = int(t)
        if acc and acc + t > budget:
            cid += 1
            acc = 0
        acc += t
        chunk[i] = cid
    return chunk


def doc_fingerprint(texts: list[str]) -> np.ndarray:
    """Whole-document 64-bit content fingerprint over normalized tokens
    (rolling-hash-free exact identity: whitespace-insensitive)."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        out[i] = fingerprint64(" ".join(_WS_SPLIT.split(t or "")).strip())
    return out


def shingles(text: str, k: int = 5) -> set[int]:
    """Set of 64-bit hashes of word k-shingles."""
    words = _WORD.findall((text or "").lower())
    if len(words) < k:
        return {fingerprint64(" ".join(words))} if words else set()
    return {fingerprint64(" ".join(words[i : i + k])) for i in range(len(words) - k + 1)}


# --- MinHash -----------------------------------------------------------
# 128 permutations via the standard (a*x + b) mod p universal-hash family,
# coefficients fixed by the pinned fingerprint of the permutation index.
_MERSENNE = np.uint64((1 << 61) - 1)
_N_PERM = 128
_A = np.array(
    [fingerprint64(f"minhash-a-{i}") % ((1 << 61) - 2) + 1 for i in range(_N_PERM)],
    dtype=np.uint64,
)
_B = np.array(
    [fingerprint64(f"minhash-b-{i}") % ((1 << 61) - 1) for i in range(_N_PERM)],
    dtype=np.uint64,
)


def minhash_signature(shingle_hashes: set[int]) -> np.ndarray:
    """128-dim MinHash signature (uint64) of a shingle-hash set."""
    if not shingle_hashes:
        return np.full(_N_PERM, np.iinfo(np.uint64).max, dtype=np.uint64)
    x = np.fromiter(shingle_hashes, dtype=np.uint64, count=len(shingle_hashes))
    x = x & np.uint64((1 << 61) - 1)
    # (a*x + b) mod p per permutation; the uint64 product wraps mod 2^64
    # BEFORE the Mersenne reduction — deterministic and uniform enough for
    # LSH banding (this is a pinned spec choice, not true modular math).
    prod = (x[None, :] * _A[:, None] + _B[:, None]) % _MERSENNE
    return prod.min(axis=1)


def lsh_band_keys(sig: np.ndarray, n_bands: int = 16) -> list[int]:
    """LSH band hashes: signature split into n_bands rows-per-band chunks,
    each chunk fingerprinted → one 64-bit bucket key per band."""
    rows = len(sig) // n_bands
    return [
        fingerprint64(sig[b * rows : (b + 1) * rows].tobytes()) for b in range(n_bands)
    ]


def jaccard(a: set[int], b: set[int]) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


# --- SimHash -----------------------------------------------------------
_SIMHASH_BITS: dict[str, np.ndarray] = {}  # word → ±1 bit vector memo


def simhash(text: str) -> int:
    """64-bit SimHash over word features (Charikar 2002, public).
    Output-identical to the naive per-occurrence loop: the ±1 vectors of
    repeated words are weighted by their counts, and per-word bit vectors
    are memoized per process (words repeat massively across a corpus)."""
    words = _WORD.findall((text or "").lower())
    if not words:
        return 0
    counts: dict[str, int] = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    v = np.zeros(64, dtype=np.int64)
    cache = _SIMHASH_BITS
    for w, c in counts.items():
        bits = cache.get(w)
        if bits is None:
            h = fingerprint64(w)
            bits = np.unpackbits(
                np.frombuffer(h.to_bytes(8, "little"), dtype=np.uint8)
            ).astype(np.int64) * 2 - 1
            if len(cache) >= (1 << 16):
                cache.clear()
            cache[w] = bits
        v += bits * c
    out = 0
    for i, x in enumerate(v):
        if x > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# ---------------------------------------------------------------- PII scrub
# Classic training-data PII redaction patterns (RE2-safe — the same
# engine behind both pyarrow.compute and DuckDB regexp functions, so an
# oracle can replay the transform exactly).  Applied in a FIXED order
# (email → phone → ipv4); replacement placeholders are angle-tagged.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\(?\d{3}\)?[ -]\d{3}-\d{4}", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii(texts):
    """Vectorized PII scrub over an Arrow string array: returns
    (clean_array, {kind: count_array}) — counts are measured on the
    INPUT text (pre-redaction), replacement is global per pattern."""
    import pyarrow.compute as _pc

    counts = {}
    clean = texts
    for kind, pat, tag in PII_PATTERNS:
        counts[kind] = _pc.cast(_pc.count_substring_regex(texts, pattern=pat), "int64")
        clean = _pc.replace_substring_regex(clean, pattern=pat, replacement=tag)
    return clean, counts


def levenshtein(a: str, b: str, cap: int | None = None) -> int:
    """Classic two-row DP edit distance; ``cap`` short-circuits once the
    best possible distance exceeds it (banded early exit — the usual
    similarity-join optimization, since blocking keys make most pairs
    near misses)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if cap is not None and abs(la - lb) > cap:
        return cap + 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    prev = list(range(la + 1))
    for j in range(1, lb + 1):
        cur = [j] + [0] * la
        cj = b[j - 1]
        for i in range(1, la + 1):
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + (a[i - 1] != cj))
        if cap is not None and min(cur) > cap:
            return cap + 1
        prev = cur
    return prev[la]


def bpe_learn(word_counts: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Learn BPE merges from a word → count table (Sennrich, Haddow &
    Birch 2016, "Neural Machine Translation of Rare Words with Subword
    Units").  Words start as character sequences; each step merges the
    most frequent adjacent symbol pair (ties broken lexicographically so
    training is deterministic and cluster-size-independent) and rewrites
    the affected words.  Pure driver-side kernel: callers reduce the
    corpus to the vocabulary-bounded word-count table first — the same
    domain-not-data-bounded shape as the histogram aggregates."""
    words = {w: tuple(w) for w in word_counts}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        # deterministic: max count, then lexicographically smallest pair
        top = max(pair_counts.values())
        best = min(p for p, c in pair_counts.items() if c == top)
        merges.append(best)
        merged = best[0] + best[1]
        new_words = {}
        for w, syms in words.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[w] = tuple(out)
        words = new_words
    return merges


def bpe_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply learned merges to a word in training order — the standard
    greedy BPE segmenter (merge ranks define priority)."""
    syms = list(word)
    for a, b in merges:
        i = 0
        out = []
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


_MOJIBAKE_MARKS = ("â€", "Ã©", "Ã¨", "Ã¤", "Ã¶", "Ã¼", "Ã±", "Â°", "ï¿½")


def encoding_flags(texts: list[str]) -> dict[str, np.ndarray]:
    """TEXT-ENCODING HYGIENE flags per document — the web-corpus audit
    for the three classic ingestion wounds: (a) non-NFC normalization
    (the same grapheme spelled two byte-ways splits dedup/token
    identity), (b) stray control characters (Cc minus tab/newline/CR —
    binary bleed-through), (c) mojibake (UTF-8 read as Latin-1:
    'â€™'-style digraphs, or the U+FFFD replacement char a lossy decode
    leaves behind).  Returns three 0/1 int64 arrays."""
    import unicodedata

    n = len(texts)
    non_nfc = np.zeros(n, dtype=np.int64)
    control = np.zeros(n, dtype=np.int64)
    mojibake = np.zeros(n, dtype=np.int64)
    for i, t in enumerate(texts):
        t = t or ""
        if unicodedata.normalize("NFC", t) != t:
            non_nfc[i] = 1
        if any(ord(c) < 32 and c not in "\t\n\r" or ord(c) == 127 for c in t):
            control[i] = 1
        if "�" in t or any(m in t for m in _MOJIBAKE_MARKS):
            mojibake[i] = 1
    return {"non_nfc": non_nfc, "control": control, "mojibake": mojibake}


def unigram_learn(
    word_counts: dict[str, int],
    vocab_size: int = 64,
    max_piece_len: int = 6,
    seed_size: int = 512,
    n_iters: int = 4,
) -> list[tuple[str, float]]:
    """Unigram-LM subword vocabulary (Kudo 2018, the SentencePiece
    algorithm; complement of :func:`bpe_learn` — probabilistic pieces
    instead of greedy merges), simplified deterministically:

    1. seed = the ``seed_size`` most frequent substrings (≤
       ``max_piece_len`` chars) of the weighted word table, plus ALL
       single characters (never prunable — every word stays coverable);
    2. EM over the (word, count) table: E-step forward–backward over
       each word's segmentation lattice accumulates expected piece
       counts; M-step renormalizes;
    3. prune to ``vocab_size`` by expected count (single chars exempt),
       then one final EM pass over the kept vocabulary.

    Kudo prunes by held-out loss; count-based pruning is the documented
    simplification.  All arithmetic derives from exact integer counts
    with a FIXED iteration order (words and pieces sorted), so output
    is identical under any upstream batch/cluster layout.  Returns
    [(piece, logprob)] sorted by (-prob, piece).
    """
    import math

    words = sorted((w, int(c)) for w, c in word_counts.items() if w)
    if not words:
        return []
    # --- seed: substring counts weighted by word frequency
    sub_counts: dict[str, int] = {}
    chars: set[str] = set()
    for w, c in words:
        chars.update(w)
        L = len(w)
        for i in range(L):
            for j in range(i + 1, min(i + max_piece_len, L) + 1):
                p = w[i:j]
                sub_counts[p] = sub_counts.get(p, 0) + c
    multi = sorted(
        ((p, c) for p, c in sub_counts.items() if len(p) > 1),
        key=lambda pc_: (-pc_[1], pc_[0]),
    )[: max(0, seed_size - len(chars))]
    vocab = {p: float(c) for p, c in multi}
    for ch in chars:
        vocab[ch] = float(sub_counts[ch])

    def em_pass(vocab: dict[str, float]) -> dict[str, float]:
        total = sum(vocab.values())
        logp = {p: math.log(v / total) for p, v in sorted(vocab.items())}
        expected = {p: 0.0 for p in vocab}
        for w, c in words:
            L = len(w)
            # forward alphas over positions (prob mass, log-sum-exp-free:
            # short words + floored probs keep floats in range)
            alpha = [0.0] * (L + 1)
            alpha[0] = 1.0
            hits = [[] for _ in range(L + 1)]  # (start, piece, prob) per end
            for i in range(L):
                if alpha[i] == 0.0:
                    continue
                for j in range(i + 1, min(i + max_piece_len, L) + 1):
                    p = w[i:j]
                    lp = logp.get(p)
                    if lp is None:
                        continue
                    pr = math.exp(lp)
                    alpha[j] += alpha[i] * pr
                    hits[j].append((i, p, pr))
            if alpha[L] == 0.0:
                continue  # uncoverable (cannot happen: single chars kept)
            beta = [0.0] * (L + 1)
            beta[L] = 1.0
            for j in range(L, 0, -1):
                if beta[j] == 0.0:
                    continue
                for i, p, pr in hits[j]:
                    beta[i] += pr * beta[j]
                    # expected count of piece p in word w
                    expected[p] += c * (alpha[i] * pr * beta[j]) / alpha[L]
        return expected

    for _ in range(n_iters):
        vocab = {p: v for p, v in em_pass(vocab).items() if v > 0.0 or len(p) == 1}
    # --- prune to vocab_size (single chars exempt), final EM pass
    singles = {p: v for p, v in vocab.items() if len(p) == 1}
    multis = sorted(
        ((p, v) for p, v in vocab.items() if len(p) > 1),
        key=lambda pv: (-pv[1], pv[0]),
    )[: max(0, vocab_size - len(singles))]
    vocab = {**dict(multis), **singles}
    # degenerate expected counts (all-zero) floor at 1 so logs exist
    vocab = {p: (v if v > 0.0 else 1.0) for p, v in vocab.items()}
    vocab = em_pass(vocab)
    vocab = {p: (v if v > 0.0 else 1e-9) for p, v in vocab.items()
             if v > 0.0 or len(p) == 1}
    total = sum(vocab.values())
    out = [(p, math.log(v / total)) for p, v in vocab.items()]
    out.sort(key=lambda pl: (-pl[1], pl[0]))
    return out


def unigram_segment(word: str, logp: dict[str, float],
                    max_piece_len: int = 6) -> list[str]:
    """Viterbi (max-probability) segmentation of ``word`` under a
    unigram-LM piece table — deterministic tie-break: the LONGEST piece
    ending the best path wins, then lexicographic."""
    L = len(word)
    best = [float("-inf")] * (L + 1)
    back: list[tuple[int, str] | None] = [None] * (L + 1)
    best[0] = 0.0
    for i in range(L):
        if best[i] == float("-inf"):
            continue
        for j in range(i + 1, min(i + max_piece_len, L) + 1):
            p = word[i:j]
            lp = logp.get(p)
            if lp is None:
                continue
            score = best[i] + lp
            cur = back[j]
            if score > best[j] or (
                score == best[j] and cur is not None
                and (j - i, p) > (j - cur[0], cur[1])
            ):
                best[j] = score
                back[j] = (i, p)
    if back[L] is None:
        return [word]  # uncoverable word falls back to itself
    pieces: list[str] = []
    j = L
    while j > 0:
        i, p = back[j]
        pieces.append(p)
        j = i
    return pieces[::-1]


def wordpiece_learn(word_counts: dict[str, int], n_merges: int) -> list[tuple]:
    """Learn a WordPiece vocabulary from a word → count table (Schuster
    & Nakajima 2012; the BERT tokenizer's trainer as documented by the
    HuggingFace tokenizers reference): like BPE, but each step merges
    the adjacent symbol pair maximizing score = count(pair) /
    (count(left)·count(right)) — frequent pairs of RARE symbols win, the
    likelihood-gain heuristic.  Scores compare as exact integer cross
    products (no float ties); remaining ties break lexicographically.
    Word-interior symbols carry the ``##`` continuation prefix.  Pure
    driver-side kernel over the vocabulary-bounded table (the same
    domain-not-data-bounded shape as ``bpe_learn``).

    Returns [(left, right, merged, score_e9), ...] in merge order."""
    words = {
        w: tuple([w[0]] + ["##" + c for c in w[1:]]) for w in word_counts if w
    }
    merges: list[tuple] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        sym_counts: dict[str, int] = {}
        for w, syms in words.items():
            c = word_counts[w]
            for s in syms:
                sym_counts[s] = sym_counts.get(s, 0) + c
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        # argmax of cp/(ca·cb) by integer cross-multiplication
        best, bn, bd = None, 0, 1
        for p in sorted(pair_counts):  # lexicographic ⇒ ties keep first
            cp = pair_counts[p]
            d = sym_counts[p[0]] * sym_counts[p[1]]
            if cp * bd > bn * d:
                best, bn, bd = p, cp, d
        merged = best[0] + best[1][2:]  # strip the continuation prefix
        merges.append((best[0], best[1], merged, bn * 1_000_000_000 // bd))
        new_words = {}
        for w, syms in words.items():
            out = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words[w] = tuple(out)
        words = new_words
    return merges


def wordpiece_encode(word: str, vocab: set) -> list[str]:
    """Greedy longest-match-first WordPiece segmentation (the BERT
    runtime algorithm): at each position take the LONGEST vocab piece
    (interior positions look up with the ``##`` prefix); if none
    matches, the whole word is ``[UNK]``."""
    if not word:
        return []
    pieces = []
    i = 0
    while i < len(word):
        end = len(word)
        cur = None
        while end > i:
            cand = word[i:end] if i == 0 else "##" + word[i:end]
            if cand in vocab:
                cur = cand
                break
            end -= 1
        if cur is None:
            return ["[UNK]"]
        pieces.append(cur)
        i = end
    return pieces
