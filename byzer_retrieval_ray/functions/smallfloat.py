"""Lucene SmallFloat byte4 length-normalization, re-implemented from the published
algorithm (Apache Lucene ``org.apache.lucene.util.SmallFloat``; Lucene 9 stores the
per-document analyzed-field length as a lossy one-byte "norm" via ``intToByte4`` and
decodes it with a 256-entry ``LENGTH_TABLE`` inside ``BM25Similarity``).

The reference engine (/root/reference) never overrides Lucene's similarity, so its BM25
scores depend on exactly this quantization (SURVEY.md §7.3). Rank-identical parity
therefore requires a bit-exact port.

Encoding: values 0..23 are exact; larger values keep only the top 4 significant bits
(a 3-bit mantissa with an implicit leading 1 plus a 5-bit exponent), offset by 24
(``NUM_FREE_VALUES = 255 - longToInt4(Integer.MAX_VALUE) = 24``).
"""

from __future__ import annotations

import numpy as np

NUM_FREE_VALUES = 24  # 255 - long_to_int4(2**31 - 1) == 255 - 231


def long_to_int4(v: int) -> int:
    """4-bit-mantissa float encoding of a non-negative int (Lucene longToInt4)."""
    if v < 0:
        raise ValueError("only non-negative values accepted")
    num_bits = v.bit_length()
    if num_bits < 4:
        return v
    shift = num_bits - 4
    encoded = (v >> shift) & 0x07
    encoded |= (shift + 1) << 3
    return encoded


def int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


def int_to_byte4(i: int) -> int:
    """Encode a non-negative int to an unsigned byte 0..255 (Lucene intToByte4)."""
    if i < 0:
        raise ValueError("only non-negative values accepted")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + long_to_int4(i - NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Decode an unsigned byte 0..255 back to the (lossy) int (Lucene byte4ToInt)."""
    if b < NUM_FREE_VALUES:
        return b
    return NUM_FREE_VALUES + int4_to_long(b - NUM_FREE_VALUES)


# Lucene BM25Similarity precomputes LENGTH_TABLE[b] = byte4ToInt(b) for all 256 bytes.
LENGTH_TABLE = np.array([byte4_to_int(b) for b in range(256)], dtype=np.int64)

# Inverse lookup for vectorized encoding: quantized(dl) = LENGTH_TABLE[int_to_byte4(dl)].
# int_to_byte4 is monotonic non-decreasing, so np.searchsorted on the decoded table
# gives the byte for any length (the table is strictly increasing from index 0..255).
_DECODED = LENGTH_TABLE  # strictly increasing


def int_to_byte4_np(values: np.ndarray) -> np.ndarray:
    """Vectorized intToByte4 over an int array (returns uint8).

    For each v, the encoded byte is the largest b with LENGTH_TABLE[b] <= v
    (encode truncates the mantissa, so decode(encode(v)) <= v and the mapping is
    monotone). Verified exhaustively against the scalar port in tests.
    """
    v = np.asarray(values, dtype=np.int64)
    if (v < 0).any():
        raise ValueError("only non-negative values accepted")
    idx = np.searchsorted(_DECODED, v, side="right") - 1
    return idx.astype(np.uint8)


def quantize_length_np(values: np.ndarray) -> np.ndarray:
    """decode(encode(dl)) — the document length as BM25 actually sees it (int64)."""
    return LENGTH_TABLE[int_to_byte4_np(values)]
