"""Unicode normalization for webtext — the first transform every
crawl-derived corpus needs (crawls mix composed/decomposed forms,
fullwidth compatibility characters, zero-width junk and exotic spaces;
dedup hashes and tokenizers must see one canonical byte form).

Spark has no built-in normalizer, so the normalization step itself is
the one legitimate Python hop: an Arrow-batched ``pandas_udf`` over
``unicodedata.normalize`` (C-implemented, vectorized per Arrow batch —
never row-at-a-time). Everything around it (zero-width strip,
whitespace collapse) stays codegen ``regexp_replace``.

Determinism: NFC output is byte-identical to any conforming
implementation (DuckDB ``nfc_normalize`` oracles it); NFKC adds the
compatibility foldings (fullwidth→ASCII, ligatures) the cleanup path
wants.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.functions import pandas_udf

# zero-width + BOM + soft hyphen: invisible characters that split
# tokens and defeat exact dedup
_ZERO_WIDTH = "[\u200b\u200c\u200d\u2060\ufeff\u00ad]"
# every Unicode space separator variant -> ASCII space
_SPACES = "[\u00a0\u1680\u2000-\u200a\u202f\u205f\u3000]"


_UDFS: dict = {}


def _norm_udf(form: str):
    # built lazily: pandas_udf registration needs an active session, so
    # module import must stay side-effect free
    if form not in _UDFS:

        @pandas_udf("string")
        def norm(s: pd.Series) -> pd.Series:
            return s.map(
                lambda v: unicodedata.normalize(form, v) if v is not None else None
            )

        _UDFS[form] = norm
    return _UDFS[form]


def nfc(col) -> Column:
    """Canonical composition (NFC) — the lossless normal form."""
    return _norm_udf("NFC")(F.col(col) if isinstance(col, str) else col)


def nfkc(col) -> Column:
    """Compatibility composition (NFKC) — also folds fullwidth forms,
    ligatures, superscripts; the form training corpora standardize on."""
    return _norm_udf("NFKC")(F.col(col) if isinstance(col, str) else col)


def clean_unicode(col, form: str = "NFKC", casefold: bool = False) -> Column:
    """The full webtext normalizer: normalize, strip zero-width
    characters, map exotic spaces to ASCII space, collapse runs, trim.
    Only the normalize step leaves codegen."""
    c = F.col(col) if isinstance(col, str) else col
    c = _norm_udf(form)(c)
    c = F.regexp_replace(c, _ZERO_WIDTH, "")
    c = F.regexp_replace(c, _SPACES, " ")
    c = F.regexp_replace(c, " {2,}", " ")
    c = F.trim(c)
    if casefold:
        c = F.lower(c)
    return c
