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
    """Decode UTF-8 and pull the first <p>...</p> body; NULL if absent.
    Vectorized end to end: Series.str.decode + Series.str.extract (no
    per-row Python lambda)."""
    decoded = html.str.decode("utf-8", errors="replace")
    return decoded.str.extract(_EXTRACT_RE, expand=False)


def with_extracted_text(df: DataFrame, html_col: str = "html", out_col: str = "extracted_text") -> DataFrame:
    return df.withColumn(out_col, extract_text(F.col(html_col)))


def typed_value_extract(
    df: DataFrame,
    kind_col: str = "kind",
    raw_col: str = "raw",
    out_col: str = "value",
) -> DataFrame:
    """Typed value extraction — the bacnet/dexma/ixon extractor family
    (reference harmonizers/sources/bacnet.py:26-55, dexma.py:46-53,
    ixon.py:21-23): analog -> float, binary 'active'/'inactive' -> 1/0,
    multiState -> int, anything unparseable -> NULL (the ValueError -> NaN
    convention). Pure when/otherwise + try_cast, no UDF."""
    raw = F.col(raw_col)
    kind = F.col(kind_col)
    value = (
        F.when(kind == "analog", raw.try_cast("double"))
        .when(
            kind == "binary",
            F.when(F.lower(raw) == "active", 1.0)
            .when(F.lower(raw) == "inactive", 0.0)
            .otherwise(F.lit(None)),
        )
        .when(kind == "multiState", raw.try_cast("int").cast("double"))
        .otherwise(raw.try_cast("double"))
    )
    return df.withColumn(out_col, value)


def strip_property_namespace(c) -> F.Column:
    """P8 — reduce a property URI to its ontology local name: the text
    after the last '#' or '/' (the RDF local-name convention). The
    reference strips its three ontology URL prefixes one by one
    (reference harmonizers/__init__.py:228-231; also :342-345, :449-452,
    pv_postprocess.py:95-96); taking the fragment/local name is the general
    form and yields identical results for any such prefix. Idempotent:
    already-bare names contain no '#'/'/' and pass through unchanged."""
    return F.element_at(F.split(c, r"[#/]"), -1)


def month_floor_shift(
    df: DataFrame, ts_col: str = "warc_ts", tz: str = "Europe/Madrid"
) -> DataFrame:
    """S4: floor to month start in a local tz, shifted back one month
    (reference harmonizers/sources/manttest.py:65-73 — monthly meter
    readings stamped to the month they measure, not the month they arrive)."""
    local = F.from_utc_timestamp(F.col(ts_col), tz)
    floored = F.date_trunc("month", local) - F.expr("INTERVAL 1 MONTH")
    return df.withColumn(ts_col, F.to_utc_timestamp(floored, tz))
