"""Pinned NumPy reimplementation of the reference's LSH semantics — the
parity oracle (FIXTURES.md F4, SURVEY.md §5 item 2).

Implements, from the documented semantics (SURVEY.md §2.3-2.6), NOT by
copying code:
 * windowed piece extraction with floor(len/shift) windows whose tails may
   overrun and come out short (quirk Q7; reference ``lsh.py:52-60``), with
   downsampling stride applied per window (PLSH stride 2, ``lsh.py:46-48``);
 * insertion-ordered vocabulary ids (reference ``lsh.py:135-142``);
 * binary term-document matrix (reference ``lsh.py:196-202``);
 * seeded true-permutation family: ``np.random.seed(i)`` + shuffle of
   [1..V], i = 0..P-1 (reference ``lsh.py:213-219,241``);
 * min AND max selection per permutation → 2·P signature rows (reference
   ``constants.py:6-10``, ``lsh.py:245-255``);
 * r=1 banding: docs sharing any (row, value) bucket are candidates, with
   per-band-once agreement counting (quirk Q5; reference ``lsh.py:252-266,
   307-308``).
"""

from __future__ import annotations

import numpy as np


def reference_windows(tokens: list[str], length: int, shift: int,
                      stride: int = 1) -> list[tuple[str, ...]]:
    """floor(len/shift) sliding windows; tail windows are clipped short
    (Q7). ``stride`` downsamples within each window (PLSH
    EXTRACTING_INTERVAL)."""
    n = len(tokens)
    out = []
    for w in range(n // shift):
        piece = tokens[w * shift: w * shift + length: stride]
        if piece:
            out.append(tuple(piece))
    return out


def build_vocabulary(doc_pieces: dict[str, list[tuple[str, ...]]]) -> dict[tuple[str, ...], int]:
    """Insertion-ordered 1-based ids, docs visited in sorted doc_id order."""
    vocab: dict[tuple[str, ...], int] = {}
    for doc_id in sorted(doc_pieces):
        for piece in doc_pieces[doc_id]:
            if piece not in vocab:
                vocab[piece] = len(vocab) + 1
    return vocab


def permutations(num_perms: int, vocab_size: int) -> np.ndarray:
    """(P, V) matrix; row i = np.random.seed(i)-shuffled [1..V]."""
    perms = np.empty((num_perms, vocab_size), dtype=np.int64)
    base = np.arange(1, vocab_size + 1, dtype=np.int64)
    for i in range(num_perms):
        np.random.seed(i)
        p = base.copy()
        np.random.shuffle(p)
        perms[i] = p
    return perms


def signatures(doc_pieces: dict[str, list[tuple[str, ...]]],
               vocab: dict[tuple[str, ...], int],
               perms: np.ndarray) -> dict[str, np.ndarray]:
    """doc → signature vector of length 2·P (even rows min, odd rows max)."""
    num_perms = perms.shape[0]
    sigs = {}
    for doc_id, pieces in doc_pieces.items():
        ids = sorted({vocab[p] for p in pieces if p in vocab})
        if not ids:
            continue
        idx = np.array(ids, dtype=np.int64) - 1
        vals = perms[:, idx]                      # (P, n_present)
        sig = np.empty(2 * num_perms, dtype=np.int64)
        sig[0::2] = vals.min(axis=1)
        sig[1::2] = vals.max(axis=1)
        sigs[doc_id] = sig
    return sigs


def candidate_pairs(sigs: dict[str, np.ndarray]) -> dict[tuple[str, str], int]:
    """(doc_a, doc_b) → number of agreeing signature rows (bands, r=1)."""
    buckets: dict[tuple[int, int], list[str]] = {}
    for doc_id, sig in sigs.items():
        for row, val in enumerate(sig):
            buckets.setdefault((row, int(val)), []).append(doc_id)
    pairs: dict[tuple[str, str], int] = {}
    for members in buckets.values():
        if len(members) < 2:
            continue
        ms = sorted(set(members))
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                key = (ms[i], ms[j])
                pairs[key] = pairs.get(key, 0) + 1
    return pairs


def reference_lsh(docs: dict[str, str], length: int = 10, shift: int = 1,
                  stride: int = 1, num_perms: int = 12):
    """Full oracle: {doc_id: text} → (pairs dict, vocab, sigs)."""
    doc_pieces = {d: reference_windows(t.split(), length, shift, stride)
                  for d, t in docs.items()}
    vocab = build_vocabulary(doc_pieces)
    perms = permutations(num_perms, len(vocab))
    sigs = signatures(doc_pieces, vocab, perms)
    return candidate_pairs(sigs), vocab, sigs


def lcs_bytes(a: str, b: str) -> int:
    """Independent longest-common-substring oracle: O(n*m) dynamic
    programming over UTF-8 bytes with a NumPy rolling row — transcribed
    from the textbook recurrence, NOT from the engine's suffix-array
    kernel, so the two can disagree if either is wrong."""
    import numpy as np
    xa = np.frombuffer(a.encode("utf-8"), dtype=np.uint8)
    xb = np.frombuffer(b.encode("utf-8"), dtype=np.uint8)
    if len(xa) == 0 or len(xb) == 0:
        return 0
    best = 0
    prev = np.zeros(len(xb) + 1, dtype=np.int32)
    for i in range(len(xa)):
        cur = np.zeros(len(xb) + 1, dtype=np.int32)
        eq = xb == xa[i]
        cur[1:][eq] = prev[:-1][eq] + 1
        m = int(cur.max())
        if m > best:
            best = m
        prev = cur
    return best
