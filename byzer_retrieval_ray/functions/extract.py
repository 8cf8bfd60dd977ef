"""HTML → text extraction (deterministic, vectorized).

The reference has no extraction stage (documents arrive with text already extracted);
the input_hint adds it: per-url byte-identical ``text`` from ``html``. The extractor is
a pure function over Arrow string arrays:

  1. drop the <head>…</head> section,
  2. take the inner text of every <p>…</p> in document order, joined by a single space,
  3. unescape the five standard HTML entities (&amp; &lt; &gt; &quot; &#39;).

Implemented with pyarrow.compute regex kernels so a batch is processed without per-row
Python. Determinism (same bytes in → same bytes out, independent of batch boundaries
and parallelism) is asserted in tests at two parallelism levels.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

_P_RE = re.compile(rb"<p[^>]*>(.*?)</p>", re.DOTALL)
_HEAD_RE = re.compile(rb"<head>.*?</head>", re.DOTALL)

_ENTITIES = [(b"&lt;", b"<"), (b"&gt;", b">"), (b"&quot;", b'"'), (b"&#39;", b"'"), (b"&amp;", b"&")]


def extract_text_one(html: bytes) -> str:
    """Scalar reference implementation (used by tests as the oracle)."""
    body = _HEAD_RE.sub(b"", html)
    parts = _P_RE.findall(body)
    joined = b" ".join(parts)
    for ent, ch in _ENTITIES:
        joined = joined.replace(ent, ch)
    return joined.decode("utf-8")


def extract_text(htmls: pa.Array) -> pa.Array:
    """Vectorized extraction over an Arrow binary array → string array."""
    s = pc.cast(htmls, pa.string())
    # strip <head> FIRST so has_p agrees with the scalar oracle when a document's
    # only <p> lives inside <head> (batch/scalar byte-identity invariant)
    s = pc.replace_substring_regex(s, pattern="(?s)<head>.*?</head>", replacement="")
    has_p = pc.match_substring_regex(s, "(?s)<p[^>]*>.*?</p>")
    # capture all <p> bodies: replace the whole doc by its p-contents joined by space.
    # Arrow lacks findall, so: kill everything outside <p>…</p> by (a) splitting on
    # closing tags is fragile — instead mark p-content, strip the rest.
    # Strategy: replace "</p>" with a rare sentinel, strip all other tags and
    # inter-tag text, then join.
    s = pc.replace_substring_regex(s, pattern="(?s)</p>", replacement="\x00")
    # drop everything from a sentinel (exclusive) up to and including the next <p>,
    # i.e. inter-paragraph junk; also drop leading junk up to first <p> and trailing junk
    s = pc.replace_substring_regex(s, pattern="(?s)^.*?<p[^>]*>", replacement="")
    s = pc.replace_substring_regex(s, pattern="(?s)\x00[^\x00]*?<p[^>]*>", replacement="\x00")
    s = pc.replace_substring_regex(s, pattern="(?s)\x00[^\x00]*$", replacement="")
    s = pc.replace_substring_regex(s, pattern="\x00", replacement=" ")
    for ent, ch in _ENTITIES:
        s = pc.replace_substring(s, pattern=ent.decode(), replacement=ch.decode())
    return pc.if_else(has_p, s, pa.scalar("", pa.string()))
