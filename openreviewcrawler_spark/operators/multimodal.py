"""Multimodal (image/audio/video) column plumbing.

Not in the reference (its only binary payload is the fetched PDF blob,
/root/reference/crawler.py:174,194 and database_model.py:62 ``pdf_binary
LargeBinary``); required for the training-data-pipeline surface.

Design: media are opaque ``binary`` columns + typed metadata, processed in
Arrow-batched ``mapInPandas`` (bytes never round-trip through Python row
objects). The actual codec step is STUBBED — image/audio libraries are not
in this container — behind ``_decode_stub``, which derives deterministic
fake dimensions from the payload bytes. The Spark-side plumbing (schema,
batching, partitioning, UDF signature) is real and tested; swapping the stub
for PIL/ffmpeg changes one function.

Scale notes: payload columns dominate I/O, so every plan prunes them until
the mapInPandas that needs bytes; metadata-only queries never read payloads
(verified by ``.explain`` ReadSchema in tests). Frame sampling emits rows,
not arrays, so downstream repartitioning can spread frames of one video
across executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = "asset_id long, kind string, payload binary, src_len long"
META_SCHEMA = "asset_id long, kind string, n_bytes long, width long, height long"
FRAME_SCHEMA = "asset_id long, frame_idx long, frame_bytes binary, frame_len long"


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media-asset table from ``documents``: payload =
    utf-8 bytes of the text (a stand-in blob), kind cycles image/audio/video."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.length(F.col("text")).cast("long").alias("src_len"),
    )


def _decode_stub(payload: bytes) -> tuple[int, int]:
    """STUB codec: derive (width, height) deterministically from the bytes.

    A real deployment decodes with PIL/libav here; raising
    NotImplementedError instead would make the plumbing untestable, so the
    stub is a documented deterministic fake: width = n % 640 + 1,
    height = first_byte + 1.
    """
    n = len(payload)
    return n % 640 + 1, (payload[0] if n else 0) + 1


def decode_metadata(assets: DataFrame) -> DataFrame:
    """Arrow-batched 'decode': (asset_id, kind, n_bytes, width, height).

    mapInPandas so each task handles whole Arrow record batches of binary —
    the same shape a real decoder wants (vectorized, no per-row Python UDF
    dispatch)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            dims = [_decode_stub(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "width": pd.Series([d[0] for d in dims], dtype="int64"),
                    "height": pd.Series([d[1] for d in dims], dtype="int64"),
                }
            )

    return assets.select("asset_id", "kind", "payload").mapInPandas(
        _decode, META_SCHEMA
    )


def sample_frames(assets: DataFrame, n_frames: int = 3) -> DataFrame:
    """Frame sampling: split each payload into ``n_frames`` equal slices
    (rows, not arrays). Real frame extraction swaps the slicer for a codec;
    the row-explosion plumbing is what matters at scale."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs, lens = [], [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(payload)
                step = len(b) // n_frames
                for i in range(n_frames):
                    ids.append(aid)
                    idxs.append(i)
                    chunk = b[i * step : (i + 1) * step] if step else b""
                    blobs.append(chunk)
                    lens.append(len(chunk))
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_bytes": pd.Series(blobs, dtype=object),
                    "frame_len": pd.Series(lens, dtype="int64"),
                }
            )

    return assets.filter(F.col("kind") == "video").select(
        "asset_id", "payload"
    ).mapInPandas(_frames, FRAME_SCHEMA)
