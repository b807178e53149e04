"""Pairwise string-similarity kernels (reference: /root/reference/src/features/feautre_extraction.py).

The container ships neither rapidfuzz, jellyfish nor scipy, so every kernel is
implemented from scratch (numpy + bit-parallel tricks) with semantics pinned to
the reference:

  * ``jaccard``             — token-set Jaccard; both-empty ⇒ 1.0 (feautre_extraction.py:16-22)
  * ``lcs_len``             — longest common *subsequence*, bit-parallel
                              Allison–Dix/Hyyrö (DP at feautre_extraction.py:26-38)
  * ``lcs_ratio``           — lcs / max(len); both-empty ⇒ 1.0 (:41-43)
  * ``edit_ratio``          — rapidfuzz ``fuzz.ratio``/100 == normalized indel
                              similarity == 2·LCS/(|a|+|b|); both-empty ⇒ 1.0 (:47-48)
  * ``jaro_winkler``        — standard Jaro-Winkler (prefix≤4, p=0.1, boost>0.7),
                              matching jellyfish/DuckDB (:51-52)
  * ``metaphone``           — classic Lawrence Philips Metaphone (published
                              algorithm; used for dmetaphone_match, :56-59)
  * ``rowwise_cosine_csr``  — paired-row cosine over CSR matrices, zero-norm
                              denominator forced to 1.0 (:63-75)
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Set, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Jaccard
# ---------------------------------------------------------------------------
def jaccard(a: Set[str], b: Set[str]) -> float:
    """Token-set Jaccard; both-empty ⇒ 1.0, one-empty ⇒ 0.0."""
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    u = len(a | b)
    return (len(a & b) / u) if u else 0.0


def jaccard_batch(a_sets: Sequence[Set[str]], b_sets: Sequence[Set[str]]) -> np.ndarray:
    return np.fromiter((jaccard(a, b) for a, b in zip(a_sets, b_sets)), dtype=np.float64, count=len(a_sets))


# ---------------------------------------------------------------------------
# LCS (bit-parallel) + the two ratios that derive from it
# ---------------------------------------------------------------------------
def lcs_len(a: str, b: str) -> int:
    """Longest common subsequence length, O(|a| · |b|/64) bit-parallel."""
    n = len(b)
    if n == 0 or len(a) == 0:
        return 0
    match: Dict[str, int] = {}
    for j, ch in enumerate(b):
        match[ch] = match.get(ch, 0) | (1 << j)
    full = (1 << n) - 1
    s = full
    for ch in a:
        m = match.get(ch, 0)
        u = s & m
        s = ((s + u) | (s - u)) & full
    return n - bin(s).count("1")


def lcs_ratio(a: str, b: str) -> float:
    """lcs / max(len); both-empty ⇒ 1.0."""
    den = max(len(a), len(b))
    return (lcs_len(a, b) / den) if den else 1.0


def edit_ratio(a: str, b: str) -> float:
    """Normalized indel similarity (== rapidfuzz fuzz.ratio / 100):
    1 − indel_dist/(|a|+|b|) with indel_dist = |a|+|b|−2·LCS."""
    tot = len(a) + len(b)
    return (2.0 * lcs_len(a, b) / tot) if tot else 1.0


_POPCNT8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1).astype(np.int64)


def _lcs_lens_matrix(a_sub: Sequence[str], b_sub: Sequence[str]) -> np.ndarray:
    """Bit-parallel LCS lengths for a batch of pairs, vectorized ACROSS pairs.

    The classic Hyyrö/Allison-Dix bitset recurrence — s = ((s+u) | (s-u)) &
    full with u = s & match-mask — runs with every pair's state held in a
    (n, W) uint64 matrix (W = words per row). Per a-position the match mask
    comes from one (n, Lb) codepoint compare + packbits; the + carries
    propagate word-to-word, the - never borrows because u ⊆ s word-wise."""
    n = len(a_sub)
    la = np.fromiter((len(s) for s in a_sub), dtype=np.int64, count=n)
    lb = np.fromiter((len(s) for s in b_sub), dtype=np.int64, count=n)
    La = int(la.max(initial=1))
    Lb = int(lb.max(initial=1))
    A = np.zeros((n, max(La, 1)), dtype=np.uint32)
    B = np.zeros((n, max(Lb, 1)), dtype=np.uint32)
    A[:] = np.array(list(a_sub), dtype=f"U{max(La,1)}").view(np.uint32).reshape(n, -1)
    B[:] = np.array(list(b_sub), dtype=f"U{max(Lb,1)}").view(np.uint32).reshape(n, -1)
    W = (Lb + 63) // 64
    # full = (1 << lb) - 1 laid out little-endian across W words
    bitpos = np.arange(W * 64, dtype=np.int64)
    full = np.packbits(
        bitpos[None, :] < lb[:, None], axis=1, bitorder="little"
    ).reshape(n, W, 8).copy().view(np.uint64).reshape(n, W)
    s = full.copy()
    pad = W * 8 - ((Lb + 7) // 8)
    bvalid = B != 0  # 0 is the pad codepoint; NUL can't occur in input text
    for i in range(La):
        active = i < la
        if not active.any():
            break
        eq = (B == A[:, i: i + 1]) & bvalid
        mb = np.packbits(eq, axis=1, bitorder="little")
        if pad:
            mb = np.concatenate([mb, np.zeros((n, pad), dtype=np.uint8)], axis=1)
        m = mb.reshape(n, W, 8).copy().view(np.uint64).reshape(n, W)
        u = s & m
        add = np.empty_like(s)
        carry = np.zeros(n, dtype=np.uint64)
        for w in range(W):
            t = s[:, w] + u[:, w]
            c1 = t < s[:, w]
            t2 = t + carry
            c2 = t2 < t
            add[:, w] = t2
            carry = (c1 | c2).astype(np.uint64)
        new_s = (add | (s - u)) & full
        s = np.where(active[:, None], new_s, s)
    ones = _POPCNT8[s.view(np.uint8).reshape(n, -1)].sum(axis=1)
    return lb - ones


def lcs_and_edit_batch(a_list: Sequence[str], b_list: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
    """Compute lcs_ratio and edit_ratio together, sharing one LCS pass per pair.

    Pairs of bounded length run through the across-pairs vectorized bitset
    kernel (:func:`_lcs_lens_matrix`); oversized strings fall back to the
    per-pair Python bitset loop. Equal pairs short-circuit to 1.0."""
    n = len(a_list)
    lcs_out = np.ones(n, dtype=np.float64)
    edit_out = np.ones(n, dtype=np.float64)
    vec_idx: list = []
    loop_idx: list = []
    for i in range(n):
        a, b = a_list[i], b_list[i]
        if a == b:
            continue
        if not a or not b:
            la_, lb_ = len(a), len(b)
            mx = max(la_, lb_)
            lcs_out[i] = 0.0 if mx else 1.0
            edit_out[i] = 0.0 if (la_ + lb_) else 1.0
            continue
        if len(a) <= 256 and len(b) <= 256:
            vec_idx.append(i)
        else:
            loop_idx.append(i)
    if vec_idx:
        ls = _lcs_lens_matrix([a_list[i] for i in vec_idx], [b_list[i] for i in vec_idx])
        for k, i in enumerate(vec_idx):
            a, b = a_list[i], b_list[i]
            lcs_out[i] = ls[k] / max(len(a), len(b))
            edit_out[i] = 2.0 * ls[k] / (len(a) + len(b))
    for i in loop_idx:
        a, b = a_list[i], b_list[i]
        l = lcs_len(a, b)
        lcs_out[i] = l / max(len(a), len(b))
        edit_out[i] = 2.0 * l / (len(a) + len(b))
    return lcs_out, edit_out


# ---------------------------------------------------------------------------
# Jaro / Jaro-Winkler
# ---------------------------------------------------------------------------
def jaro(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    a_flags = [False] * la
    b_flags = [False] * lb
    matches = 0
    for i in range(la):
        lo = i - window if i > window else 0
        hi = i + window + 1
        if hi > lb:
            hi = lb
        ai = a[i]
        for j in range(lo, hi):
            if not b_flags[j] and b[j] == ai:
                a_flags[i] = b_flags[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions
    t = 0
    j = 0
    for i in range(la):
        if a_flags[i]:
            while not b_flags[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    t //= 2
    m = float(matches)
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str, prefix_weight: float = 0.1, boost_threshold: float = 0.7) -> float:
    """Standard Jaro-Winkler: prefix bonus (≤4 chars) applied when jaro > 0.7 —
    matches jellyfish.jaro_winkler_similarity and DuckDB jaro_winkler_similarity."""
    j = jaro(a, b)
    if j > boost_threshold:
        prefix = 0
        for ca, cb in zip(a[:4], b[:4]):
            if ca != cb:
                break
            prefix += 1
        j += prefix * prefix_weight * (1.0 - j)
    return j


def _jaro_matrix(a_sub: Sequence[str], b_sub: Sequence[str]) -> np.ndarray:
    """Vectorized Jaro over a batch of string pairs: strings become padded
    UTF-32 codepoint matrices; the greedy window-match loop runs once per
    CHARACTER POSITION with all pairs advanced simultaneously (boolean
    matrix ops), instead of a Python loop per pair."""
    n = len(a_sub)
    la = np.fromiter((len(s) for s in a_sub), dtype=np.int64, count=n)
    lb = np.fromiter((len(s) for s in b_sub), dtype=np.int64, count=n)
    L = int(max(la.max(initial=1), lb.max(initial=1), 1))
    A = np.zeros((n, L), dtype=np.uint32)
    B = np.zeros((n, L), dtype=np.uint32)
    Araw = np.array(list(a_sub), dtype=f"U{L}").view(np.uint32).reshape(n, L)
    Braw = np.array(list(b_sub), dtype=f"U{L}").view(np.uint32).reshape(n, L)
    A[:], B[:] = Araw, Braw
    if A.max(initial=0) < 255 and B.max(initial=0) < 255:
        # ASCII fast path: 4× less memory traffic (the kernel is DRAM-bound
        # under full-cluster parallelism); 0 stays the pad sentinel
        A = A.astype(np.uint8)
        B = B.astype(np.uint8)
    window = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    wmax = int(window.max(initial=0))
    cols = np.arange(L, dtype=np.int64)
    used = np.zeros((n, L), dtype=bool)
    amatch = np.zeros((n, L), dtype=bool)
    rowsel = np.arange(n)
    for i in range(L):
        active = i < la
        if not active.any():
            break
        lo = np.maximum(i - window, 0)
        hi = np.minimum(i + window + 1, lb)
        # only columns inside the widest window can match — slice to cut
        # the per-iteration traffic roughly in half
        c0 = max(0, i - wmax)
        c1 = min(L, i + wmax + 1)
        sl = slice(c0, c1)
        cand = (B[:, sl] == A[:, i : i + 1]) & ~used[:, sl]
        cand &= (cols[None, sl] >= lo[:, None]) & (cols[None, sl] < hi[:, None])
        cand &= active[:, None]
        first = cand.argmax(axis=1) + c0
        has = cand[rowsel, first - c0]
        used[has, first[has]] = True
        amatch[has, i] = True
    m = amatch.sum(axis=1).astype(np.float64)
    # transpositions: compact matched chars of a (i-order) and b (j-order)
    rank_a = np.cumsum(amatch, axis=1) - 1
    rank_b = np.cumsum(used, axis=1) - 1
    bufA = np.zeros((n, L), dtype=np.uint32)
    bufB = np.zeros((n, L), dtype=np.uint32)
    r, c = np.nonzero(amatch)
    bufA[r, rank_a[r, c]] = A[r, c]
    r, c = np.nonzero(used)
    bufB[r, rank_b[r, c]] = B[r, c]
    t = (((bufA != bufB) & (bufA != 0)).sum(axis=1) // 2).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        j = (m / la + m / lb + (m - t) / np.maximum(m, 1.0)) / 3.0
    j = np.where(m == 0, 0.0, j)
    j = np.where((la == 0) & (lb == 0), 1.0, np.where((la == 0) | (lb == 0), 0.0, j))
    # Winkler prefix boost (≤4 common leading chars, only when jaro > 0.7)
    P = min(4, L)
    eq = (A[:, :P] == B[:, :P]) & (A[:, :P] != 0)
    prefix = np.cumprod(eq, axis=1).sum(axis=1).astype(np.float64)
    return np.where(j > 0.7, j + prefix * 0.1 * (1.0 - j), j)


def jaro_winkler_batch(a_list: Sequence[str], b_list: Sequence[str]) -> np.ndarray:
    # equal strings short-circuit to 1.0 — near-dup pipelines score many
    # identical pairs and JW is the costliest kernel
    n = len(a_list)
    out = np.ones(n, dtype=np.float64)
    neq = [i for i in range(n) if a_list[i] != b_list[i]]
    if neq:
        out[neq] = _jaro_matrix([a_list[i] for i in neq], [b_list[i] for i in neq])
    return out


# ---------------------------------------------------------------------------
# Metaphone (classic Lawrence Philips 1990 algorithm, published rules)
# ---------------------------------------------------------------------------
_VOWELS = "aeiou"


def metaphone(word: str) -> str:
    """Classic Metaphone phonetic code. Implemented from the published rule set;
    used only for equality comparison (dmetaphone_match, feautre_extraction.py:56-59)."""
    s = "".join(ch for ch in word.lower() if ch.isalpha())
    if not s:
        return ""
    # initial-letter exceptions
    if s[:2] in ("ae", "gn", "kn", "pn", "wr"):
        s = s[1:]
    elif s[0] == "x":
        s = "s" + s[1:]
    elif s[:2] == "wh":
        s = "w" + s[2:]

    out: List[str] = []
    n = len(s)
    i = 0
    while i < n:
        c = s[i]
        # drop duplicate adjacent letters except c
        if i > 0 and c == s[i - 1] and c != "c":
            i += 1
            continue
        nxt = s[i + 1] if i + 1 < n else ""
        nxt2 = s[i + 2] if i + 2 < n else ""
        if c in _VOWELS:
            if i == 0:
                out.append(c.upper())
        elif c == "b":
            if not (i == n - 1 and i > 0 and s[i - 1] == "m"):
                out.append("B")
        elif c == "c":
            if nxt == "i" and nxt2 == "a":
                out.append("X")
            elif nxt == "h":
                # -SCH- → K, else -CH- → X
                out.append("K" if (i > 0 and s[i - 1] == "s") else "X")
                i += 1  # consume the h
            elif nxt in "iey":
                if not (i > 0 and s[i - 1] == "s"):
                    out.append("S")
            else:
                out.append("K")
        elif c == "d":
            if nxt == "g" and nxt2 in "eiy":
                out.append("J")
                i += 1
            else:
                out.append("T")
        elif c in "fjlmnr":
            out.append(c.upper())
        elif c == "g":
            if nxt == "h":
                if not (i + 2 == n or nxt2 in _VOWELS):
                    pass  # silent gh
                else:
                    out.append("K")
                    i += 1
            elif nxt == "n":
                pass  # silent in gn / gned
            elif nxt in "eiy":
                out.append("J")
            else:
                out.append("K")
        elif c == "h":
            prev = s[i - 1] if i > 0 else ""
            if prev in _VOWELS and nxt not in _VOWELS:
                pass  # silent after vowel with no vowel following
            elif prev in "csptg":
                pass  # handled by the consonant rule
            else:
                out.append("H")
        elif c == "k":
            if not (i > 0 and s[i - 1] == "c"):
                out.append("K")
        elif c == "p":
            if nxt == "h":
                out.append("F")
                i += 1
            else:
                out.append("P")
        elif c == "q":
            out.append("K")
        elif c == "s":
            if nxt == "h":
                out.append("X")
                i += 1
            elif nxt == "i" and nxt2 in "oa":
                out.append("X")
            else:
                out.append("S")
        elif c == "t":
            if nxt == "i" and nxt2 in "oa":
                out.append("X")
            elif nxt == "h":
                out.append("0")
                i += 1
            elif nxt == "c" and nxt2 == "h":
                pass  # silent in -tch-
            else:
                out.append("T")
        elif c == "v":
            out.append("F")
        elif c == "w":
            if nxt in _VOWELS:
                out.append("W")
        elif c == "x":
            out.append("KS")
        elif c == "y":
            if nxt in _VOWELS:
                out.append("Y")
        elif c == "z":
            out.append("S")
        i += 1
    return "".join(out)


def dmetaphone_match_first_token(a_tokens: Sequence[str], b_tokens: Sequence[str]) -> int:
    """metaphone(first token) equality → 0/1; empty token list ⇒ 0
    (feautre_extraction.py:56-59)."""
    if not a_tokens or not b_tokens:
        return 0
    return int(metaphone(a_tokens[0]) == metaphone(b_tokens[0]))


def dmetaphone_match_batch(a_tok: Sequence[Sequence[str]], b_tok: Sequence[Sequence[str]]) -> np.ndarray:
    return np.fromiter(
        (dmetaphone_match_first_token(a, b) for a, b in zip(a_tok, b_tok)),
        dtype=np.float64,
        count=len(a_tok),
    )


# ---------------------------------------------------------------------------
# Paired-row cosine over CSR matrices (no scipy — plain numpy CSR triples)
# ---------------------------------------------------------------------------
def rowwise_cosine_csr(
    indptr_a: np.ndarray,
    indices_a: np.ndarray,
    data_a: np.ndarray,
    indptr_b: np.ndarray,
    indices_b: np.ndarray,
    data_b: np.ndarray,
    n_rows: int,
    n_cols: int,
) -> np.ndarray:
    """cos(A[i], B[i]) for each paired row i; zero-norm denominators forced to
    1.0 so all-zero rows score 0.0 (feautre_extraction.py:73-74).

    Fully vectorized: encode (row, col) into one int64 key, intersect the two
    key sets once for the whole batch, scatter-add products back to rows.
    """
    rows_a = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(indptr_a))
    rows_b = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(indptr_b))
    key_a = rows_a * np.int64(n_cols) + indices_a.astype(np.int64, copy=False)
    key_b = rows_b * np.int64(n_cols) + indices_b.astype(np.int64, copy=False)
    # CSR rows are index-sorted (Vectorizer.transform sorts per row; gathers
    # preserve it), so both key streams are globally sorted — intersect via
    # binary search instead of intersect1d's two full sorts
    num = np.zeros(n_rows, dtype=np.float64)
    if len(key_a) and len(key_b):
        pos = np.searchsorted(key_b, key_a)
        pos_c = np.minimum(pos, len(key_b) - 1)
        hit = key_b[pos_c] == key_a
        num = np.bincount(
            rows_a[hit], weights=data_a[hit] * data_b[pos_c[hit]], minlength=n_rows
        ).astype(np.float64)
    norm_a = np.sqrt(np.bincount(rows_a, weights=data_a * data_a, minlength=n_rows))
    norm_b = np.sqrt(np.bincount(rows_b, weights=data_b * data_b, minlength=n_rows))
    den = norm_a * norm_b
    den[den == 0.0] = 1.0
    return num / den


def _crossside_matches(rows_a, keys_a, rows_b, keys_b):
    """Positions where a (row, key) appears on BOTH sides. Each side's
    (row, key) pairs must be unique. Returns (ia, ib) index arrays."""
    rows_all = np.concatenate([rows_a, rows_b])
    keys_all = np.concatenate([keys_a, keys_b])
    order = np.lexsort((keys_all, rows_all))
    r_s, k_s = rows_all[order], keys_all[order]
    dup = np.zeros(len(order), dtype=bool)
    dup[1:] = (r_s[1:] == r_s[:-1]) & (k_s[1:] == k_s[:-1])
    second = order[dup]
    first = order[np.roll(dup, -1)]
    # one of (first, second) is from side a, the other from side b
    na = len(rows_a)
    a_pos = np.where(first < na, first, second)
    b_pos = np.where(first < na, second, first) - na
    return a_pos, b_pos


def rowwise_cosine_hashed(
    indptr_a: np.ndarray, keys_a: np.ndarray, data_a: np.ndarray,
    indptr_b: np.ndarray, keys_b: np.ndarray, data_b: np.ndarray,
    n_rows: int,
) -> np.ndarray:
    """cos(A[i], B[i]) where column ids are 64-bit HASHES (unbounded key
    space — the (row·n_cols+col) packing of rowwise_cosine_csr would
    overflow). Per-row keys must be unique; zero-norm denominators → 1.0."""
    rows_a = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(indptr_a))
    rows_b = np.repeat(np.arange(n_rows, dtype=np.int64), np.diff(indptr_b))
    ia, ib = _crossside_matches(rows_a, keys_a, rows_b, keys_b)
    num = np.bincount(rows_a[ia], weights=data_a[ia] * data_b[ib], minlength=n_rows).astype(np.float64)
    norm_a = np.sqrt(np.bincount(rows_a, weights=data_a * data_a, minlength=n_rows))
    norm_b = np.sqrt(np.bincount(rows_b, weights=data_b * data_b, minlength=n_rows))
    den = norm_a * norm_b
    den[den == 0.0] = 1.0
    return num / den


def rowwise_jaccard_hashed(
    indptr_a: np.ndarray, keys_a: np.ndarray,
    indptr_b: np.ndarray, keys_b: np.ndarray,
    n_rows: int,
) -> np.ndarray:
    """Set Jaccard per paired row over hashed element sets (per-row keys
    unique); both-empty → 1.0, one-empty → 0.0 (strsim.jaccard semantics)."""
    ca = np.diff(indptr_a)
    cb = np.diff(indptr_b)
    rows_a = np.repeat(np.arange(n_rows, dtype=np.int64), ca)
    rows_b = np.repeat(np.arange(n_rows, dtype=np.int64), cb)
    ia, _ = _crossside_matches(rows_a, keys_a, rows_b, keys_b)
    inter = np.bincount(rows_a[ia], minlength=n_rows).astype(np.float64)
    union = ca + cb - inter
    return np.where(
        (ca == 0) & (cb == 0), 1.0,
        np.where((ca == 0) | (cb == 0), 0.0, inter / np.maximum(union, 1.0)),
    )
