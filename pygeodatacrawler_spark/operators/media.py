"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video travel as BinaryType columns; decode/feature-extract
runs as Arrow-batched mapInPandas. The decode libraries are absent in
this environment, so the decode body is the deterministic fake from
functions/text.py (clearly marked; swap ``fake_decode_media`` for a
PIL/ffmpeg implementation in production) — the Spark-side plumbing
(schema, batch shape, partitioning) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from pygeodatacrawler_spark.functions.text import fake_decode_media

MEDIA_META_SCHEMA = (
    "media_type string, n_bytes long, width int, height int"
)


def decode_media(
    df: DataFrame, payload_col: str, media_type_col: str, id_col: str
) -> DataFrame:
    """(id, payload binary, media_type) -> id + decoded metadata struct.

    One Arrow pass; output partitioning inherits the input (map-only).
    """

    def _decode(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            metas = [
                fake_decode_media(p, m)
                for p, m in zip(pdf[payload_col], pdf[media_type_col])
            ]
            out = pd.DataFrame(metas)
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, payload_col, media_type_col).mapInPandas(
        _decode, schema=f"{id_col} long, {MEDIA_META_SCHEMA}"
    )
