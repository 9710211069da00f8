"""Text-analysis stages for training-data pipelines (vectorized map_batches).

Operators: token counting, quality scoring (length/punct/stopword ratios),
n-gram-heuristic language ID, and rolling-hash document fingerprints.
All pure pyarrow.compute / numpy over string columns; quality metrics are
SQL-mirrorable so they get DuckDB oracles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import xxh64_flat
from .tokenize import _string_array_np, tokenize_hashes

# Trim exactly this ASCII whitespace set on both sides of every SQL-oracled
# text operator. DuckDB's trim() strips only spaces and Arrow's
# utf8_trim_whitespace strips all Unicode whitespace — using an explicit
# shared character set (mirrored in the oracles as
# trim(text, ' ' || chr(9) || ...)) makes the match exact by construction.
_ASCII_WS = " \t\n\r\v\f"

# per-language stopword profiles (public common-word lists). Declaration
# order is the tie-break order (first max wins); the DuckDB oracle is
# generated from this dict, so the two sides can never drift.
_LANG_PROFILES: dict[str, set[str]] = {
    "en": {
        "the", "and", "of", "to", "a", "in", "is", "it", "that", "for",
        "was", "with", "as", "his", "on", "be", "at", "by", "not", "this",
    },
    "de": {
        "der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "nicht",
        "ein", "eine", "auf", "für", "im", "dem", "sich", "des", "auch", "es",
    },
    "fr": {
        "le", "la", "les", "de", "et", "est", "un", "une", "que", "pour",
        "dans", "qui", "au", "pas", "sur", "plus", "par", "il", "ne", "se",
    },
    "es": {
        "el", "la", "los", "de", "y", "es", "un", "una", "que", "por",
        "en", "no", "se", "del", "las", "con", "para", "su", "al", "lo",
    },
    "it": {
        "il", "la", "di", "e", "che", "un", "una", "per", "non", "sono",
        "in", "del", "si", "con", "le", "della", "dei", "più", "al", "anche",
    },
    "pt": {
        "o", "a", "de", "e", "que", "do", "da", "em", "um", "uma",
        "para", "com", "não", "os", "as", "dos", "se", "mais", "por", "como",
    },
    "nl": {
        "de", "het", "een", "en", "van", "in", "is", "dat", "op", "te",
        "zijn", "met", "voor", "niet", "aan", "er", "maar", "om", "ook", "als",
    },
}


def text_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-row stats: n_chars, n_tokens, punct_ratio, upper_ratio,
    digit_ratio. Mirrors straightforward SQL."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.fill_null(text, "")
    n_chars = pc.utf8_length(text)
    trimmed = pc.utf8_trim(text, _ASCII_WS)
    toks = pc.split_pattern_regex(trimmed, r"\s+")
    # split('') yields [''] — empty/whitespace-only rows have zero tokens
    n_tokens = pc.if_else(
        pc.equal(trimmed, ""), pa.scalar(0, pa.int32()), pc.list_value_length(toks)
    )
    # counts via regex extraction
    punct = pc.count_substring_regex(text, r"[^\w\s]")
    upper = pc.count_substring_regex(text, r"[A-Z]")
    digit = pc.count_substring_regex(text, r"[0-9]")
    nc = np.maximum(n_chars.to_numpy(zero_copy_only=False), 1).astype(np.float64)
    cols = {name: batch.column(name) for name in batch.column_names if name != text_col}
    cols["n_chars"] = n_chars
    cols["n_tokens"] = pc.cast(n_tokens, pa.int64())
    cols["punct_ratio"] = pa.array(punct.to_numpy(zero_copy_only=False) / nc)
    cols["upper_ratio"] = pa.array(upper.to_numpy(zero_copy_only=False) / nc)
    cols["digit_ratio"] = pa.array(digit.to_numpy(zero_copy_only=False) / nc)
    return pa.table(cols)


def quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Composite quality heuristic in [0,1]: favors mid-length docs with low
    punctuation/digit noise. Every arithmetic step is a fixed IEEE-double op
    sequence mirrored verbatim by the DuckDB oracle (floor-quantized to 1e-6
    so the value-hash compare is bit-exact)."""
    stats = text_stats(batch, text_col)
    nt = stats.column("n_tokens").to_numpy().astype(np.float64)
    length_score = np.clip(nt / 50.0, 0.0, 1.0) * np.clip(2.0 - nt / 5000.0, 0.0, 1.0)
    punct = stats.column("punct_ratio").to_numpy()
    digit = stats.column("digit_ratio").to_numpy()
    noise_score = np.clip(1.0 - 3.0 * (punct + digit), 0.0, 1.0)
    score = 0.6 * length_score + 0.4 * noise_score
    return stats.append_column("quality", pa.array(np.floor(score * 1e6) / 1e6))


def lang_id(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stopword-profile language ID with 'und' fallback.

    Vectorized: one regex tokenize pass, then one ``pc.is_in`` membership
    pass per language profile over the flattened token array with per-row
    hit counts recovered from the list offsets — no per-row Python.
    First-max-wins across profiles in declaration order, 2% minimum hit
    ratio; mirrored exactly by the DuckDB oracle."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    lowered = pc.utf8_lower(pc.utf8_trim(pc.fill_null(text, ""), _ASCII_WS))
    toks = pc.split_pattern_regex(lowered, r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n_rows = len(toks)
    n_tok = (offsets[1:] - offsets[:-1]).astype(np.float64)
    # empty/whitespace rows split to [''] — treat as zero real tokens
    empty = pc.equal(lowered, "").to_numpy(zero_copy_only=False)
    hits = np.zeros((len(_LANG_PROFILES), n_rows), dtype=np.int64)
    for li, words in enumerate(_LANG_PROFILES.values()):
        mask = pc.is_in(flat, value_set=pa.array(sorted(words))).to_numpy(
            zero_copy_only=False
        )
        csum = np.concatenate([[0], np.cumsum(mask, dtype=np.int64)])
        hits[li] = csum[offsets[1:]] - csum[offsets[:-1]]
    best_idx = np.argmax(hits, axis=0)  # first max wins = profile order
    best_hits = hits[best_idx, np.arange(n_rows)].astype(np.float64)
    ratio = np.where(n_tok > 0, best_hits / np.maximum(n_tok, 1.0), 0.0)
    names = np.array(list(_LANG_PROFILES.keys()))
    langs = np.where((best_hits > 0) & (ratio >= 0.02) & ~empty, names[best_idx], "und")
    scores = np.where(empty, 0.0, np.floor(ratio * 1e6) / 1e6)
    cols = {name: batch.column(name) for name in batch.column_names if name != text_col}
    cols["lang_pred"] = pa.array(langs.tolist(), type=pa.string())
    cols["lang_score"] = pa.array(scores, type=pa.float64())
    return pa.table(cols)


def fingerprint(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """64-bit whole-document fingerprint: xxh64 over the normalized
    (whitespace-collapsed) token stream — stable under reformatting."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    norm = pc.replace_substring_regex(
        pc.utf8_trim_whitespace(pc.fill_null(text, "")), r"\s+", " "
    )
    flat, off = _string_array_np(norm)
    fp = xxh64_flat(flat, off, seed=0)
    return pa.table(
        {
            id_col: batch.column(id_col),
            "fingerprint": pa.array(fp, type=pa.uint64()),
        }
    )


# BPE-ish pre-tokenizer pattern (GPT-2-style word/number/punct splits,
# lookaheads removed so the pattern stays inside RE2 — the engine both
# pyarrow's count_substring_regex and DuckDB's regexp_extract_all use,
# which is what makes this operator exactly SQL-oracle-able)
BPE_TOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"


def token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Token counting, both conventions: whitespace tokens (ws_tokens) and
    BPE-ish subword-boundary tokens (bpe_tokens) — the pre-tokenization pass
    of byte-pair encoders, a cheap proxy for LLM token budgets."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    text = pc.fill_null(text, "")
    trimmed = pc.utf8_trim(text, _ASCII_WS)
    ws = pc.if_else(
        pc.equal(trimmed, ""),
        pa.scalar(0, pa.int32()),
        pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+")),
    )
    bpe = pc.count_substring_regex(text, BPE_TOKEN_PATTERN)
    cols = {name: batch.column(name) for name in batch.column_names if name != text_col}
    cols["ws_tokens"] = pc.cast(ws, pa.int64())
    cols["bpe_tokens"] = pc.cast(bpe, pa.int64())
    return pa.table(cols)


# PII patterns (RE2 on both sides: pyarrow replace_substring_regex and
# DuckDB regexp_replace(..., 'g') — same engine, so redaction is exactly
# SQL-oracle-able). Applied in declaration order; order matters (an email
# must be redacted before the phone pattern could eat its digit runs).
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    (r"\+\d{9,15}\b", "<PHONE>"),
]


def redact_pii(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """PII scrubbing for training corpora: replace emails, IPv4 addresses
    and phone-shaped digit runs with typed placeholder tokens, entirely in
    Arrow's RE2 kernels (one replace_substring_regex pass per pattern, no
    per-row Python). Emits the redacted text plus ``has_pii`` (anything
    changed) — the pre-training hygiene pass every large text pipeline
    runs before tokenization."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    original = pc.fill_null(text, "")
    redacted = original
    for pattern, token in PII_PATTERNS:
        redacted = pc.replace_substring_regex(redacted, pattern, token)
    cols = {name: batch.column(name) for name in batch.column_names if name != text_col}
    cols["redacted"] = redacted
    cols["has_pii"] = pc.invert(pc.equal(redacted, original))
    return pa.table(cols)
