"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: binary column + metadata struct,
processed by Arrow-batched ``mapInPandas`` so each task streams record
batches (bounded memory) instead of materializing whole partitions.  The
actual media codecs are NOT available in this environment, so the decode
kernels are stubbed behind ``NotImplementedError`` / deterministic fakes —
the Spark-side contract (schema, batch shape, partitioning) is real and
tested.

The one real decoder: HTML → text extraction (the input_hint's html column),
a deterministic tag-strip that reproduces the corpus generator's byte-exact
text contract.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

_TAG_RE = re.compile(rb"<[^>]+>")


def extract_text_from_html(html: bytes) -> str:
    """Strip tags; byte-identical inverse of the FIXTURES.md html wrapper."""
    return _TAG_RE.sub(b"", html or b"").decode("utf-8", errors="replace")


def html_to_text(pages: DataFrame, html_col: str = "html", out_col: str = "extracted_text") -> DataFrame:
    """mapInPandas HTML→text: streams Arrow batches, appends one string col."""
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in pages.schema.fields)
    schema = f"{fields}, {out_col} string"

    def run(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [extract_text_from_html(h) for h in pdf[html_col]]
            yield pdf

    return pages.mapInPandas(run, schema=schema)


def decode_image_stub(payload: bytes) -> np.ndarray:
    """Image decode — STUB: no image codec (PIL/opencv) in this container.

    At deploy time this becomes a real decode inside the same mapInPandas
    kernel; the deterministic fake keeps the downstream plumbing testable:
    an 8x8 uint8 'thumbnail' derived from the payload bytes.
    """
    if payload is None:
        raise NotImplementedError("real image decode requires an image codec library")
    if len(payload) == 0:
        return None  # undecodable payload — callers skip the row
    arr = np.frombuffer((payload * ((64 // len(payload)) + 1))[:64], dtype=np.uint8)
    return arr.reshape(8, 8)


def image_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Binary → fixed-size feature vector via the (stubbed) decoder.

    Output schema: (id, width, height, mean_intensity, feature array<double>)
    — the exact shape a real embedding/resize kernel would produce.
    """
    schema = f"{id_col} long, width int, height int, mean_intensity double, feature array<double>"

    def run(batches):
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                img = decode_image_stub(bytes(payload)) if payload is not None else None
                if img is None:
                    continue
                rows.append(
                    {
                        id_col: int(i),
                        "width": img.shape[1],
                        "height": img.shape[0],
                        "mean_intensity": float(img.mean()),
                        "feature": (img.astype(np.float64).ravel() / 255.0).tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=[id_col, "width", "height", "mean_intensity", "feature"])

    return df.mapInPandas(run, schema=schema)


def frame_sample_stub(payload: bytes, every_n: int = 10) -> list[bytes]:
    """Video frame sampling — STUB (no video codec).  Deterministic fake:
    chops the payload into pseudo-frames so batch-shape tests are real."""
    if not payload:
        return []
    size = max(len(payload) // 16, 1)
    frames = [payload[i : i + size] for i in range(0, len(payload), size)]
    return frames[::every_n] if len(frames) >= every_n else frames[:1]
