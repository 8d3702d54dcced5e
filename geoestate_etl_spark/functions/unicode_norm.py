"""Unicode normalization for corpus text — the encoding-hygiene pass
that runs BEFORE tokenization/dedup so that byte-level variants of the
same text (composed vs decomposed accents, smart quotes, zero-width
junk, double-encoded UTF-8) hash identically downstream.

This is the engine's sanctioned Python escape hatch in action: Unicode
normalization needs the character database (``unicodedata``), which no
built-in Column function exposes, so it runs as an Arrow-batched
``pandas_udf`` — one Python call per ~10k-row batch, not per row.
Everything that CAN be a built-in stays one (whitespace collapse is
``regexp_replace`` in callers).

Rules (fixed, deterministic):
- NFC normalization (composed forms; e-acute as one codepoint)
- strip control chars except tab/newline (C0/C1, zero-width chars,
  BOM, soft hyphen)
- canonicalize exotic whitespace (NBSP and friends -> plain space)
- smart quotes/dashes -> ASCII equivalents (the high-frequency
  subset: curly quotes, en/em dash, ellipsis)
- repair the classic UTF-8-as-cp1252 double-encoding mojibake
  (e.g. "\xc3\xa9" shown as two chars -> e-acute) when the repair
  round-trips losslessly
"""

from __future__ import annotations

import re
import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# Stripped BEFORE mojibake repair: C0 (minus \t\n) + DEL + zero-width/
# format chars + BOM. None of these are cp1252 renderings of UTF-8
# continuation bytes, but they DO break the repair's strict cp1252
# round-trip, so removing them first lets the repair fire.
_CTRL_PRE = re.compile("[\x00-\x08\x0b-\x1f\x7f\u200b-\u200f\u2060\ufeff]")
# Stripped AFTER repair: the C1 range and U+00AD (soft hyphen) ARE how
# cp1252/latin-1 render UTF-8 continuation bytes 0x80-0x9F and 0xAD \u2014
# e.g. '\u00ed' (0xC3 0xAD) mis-decodes to '\u00c3' + SHY. Stripping them first
# would destroy the continuation char and leave a stray lead byte.
_CTRL_POST = re.compile("[\x80-\x9f\xad]")
# exotic horizontal whitespace -> plain space
_WS = re.compile("[\xa0\u1680\u2000-\u200a\u202f\u205f\u3000]")
_PUNCT = {
    "\u2018": "'", "\u2019": "'", "\u201c": '"', "\u201d": '"',
    "\u2013": "-", "\u2014": "-", "\u2026": "...",
}
# a cp1252-visible UTF-8 lead byte (A-tilde etc.) followed by a
# continuation-range char is the classic mojibake signature
_MOJIBAKE_HINT = re.compile("[\xc2-\xc5][\x80-\xbf\u0152-\u02dc\u2010-\u2122]")


def _fix_mojibake(s: str) -> str:
    """Undo UTF-8 bytes mis-decoded as cp1252 when the repair is
    lossless; otherwise return the input unchanged."""
    if not _MOJIBAKE_HINT.search(s):
        return s
    try:
        repaired = s.encode("cp1252", errors="strict").decode("utf-8", errors="strict")
    except (UnicodeEncodeError, UnicodeDecodeError):
        return s
    return repaired


def _norm_one(s: str | None) -> str | None:
    if s is None:
        return None
    s = _CTRL_PRE.sub("", s)
    s = _fix_mojibake(s)
    s = _CTRL_POST.sub("", s)
    s = unicodedata.normalize("NFC", s)
    s = _WS.sub(" ", s)
    for k, v in _PUNCT.items():
        s = s.replace(k, v)
    return s


@pandas_udf(T.StringType())
def _normalize_batch(texts: pd.Series) -> pd.Series:
    return texts.map(_norm_one)


def normalize_unicode(c: Column | str) -> Column:
    """NFC + control-strip + whitespace/punctuation canonicalization +
    mojibake repair, as an Arrow-batched column expression."""
    return _normalize_batch(F.col(c) if isinstance(c, str) else c)
