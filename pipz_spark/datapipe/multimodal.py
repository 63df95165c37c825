"""Multimodal column plumbing — binary payloads + typed metadata.

Design: image/audio/video are opaque ``binary`` columns paired with a
typed metadata struct (mime, byte size, content hash, declared
dims/duration). All Spark-side plumbing — schema, partition-friendly
batching, Arrow-batched ``mapInPandas`` UDF shape — is real and
tested. Codec calls are OPTIONAL-dependency gated: ``pil_available``
probes for Pillow at call time, ``decode_image_features(mode="pil")``
runs a real decode→grayscale→resize→stats path when it imports, and
the deterministic byte-stats fallback (``mode="bytes"``, the default
and the declared-query pin, so the oracle never depends on the
environment) covers containers without media libraries — like this
one. ``sample_frames`` stays a byte-window stub for the same reason.

At 100 TB the rules encoded here: keep payloads OUT of shuffle keys,
compute metadata in-scan (expressions), run decoders in mapInPandas
with bounded Arrow batch sizes so executor memory stays flat.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..core.step import Step
from ..operators.processors import transform

BLOB_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha", T.StringType()),
    ]
)


def attach_blob(
    name: str = "attach-blob",
    from_text_col: str = "text",
    mime: str = "application/octet-stream",
) -> Step:
    """Materialize an opaque binary column (here: utf-8 payload of an
    existing column — the deterministic stand-in for reading real
    media bytes) plus its typed metadata struct. In production the
    payload column comes straight from the source (parquet/webdataset
    binary column); everything downstream only sees ``blob`` +
    ``blob_meta`` and never re-derives it."""
    payload = F.encode(F.col(from_text_col), "utf-8")
    return transform(
        name,
        {
            "blob": payload,
            "blob_meta": F.struct(
                F.lit(mime).alias("mime"),
                F.length(payload).cast("long").alias("n_bytes"),
                F.sha2(payload, 256).alias("sha"),
            ),
        },
    )


def blob_metadata(name: str = "blob-meta", blob_col: str = "blob") -> Step:
    """Metadata over an existing binary column — pure expressions, no
    decode: byte length + sha256. Runs inside the scan projection."""
    b = F.col(blob_col)
    return transform(
        name,
        {
            "n_bytes": F.length(b).cast("long"),
            "sha": F.sha2(b, 256),
        },
    )


_IMG_FEATURES_COLS = "n_bytes long, mean_byte double, byte_entropy_bucket int"


def pil_available() -> bool:
    """Optional-dependency probe: True when Pillow imports. Probed,
    never assumed — this container ships without media libraries, so
    the decode path is selected at call time (same pattern as the
    protobuf gate on the state-v2 streaming twin)."""
    try:
        from PIL import Image  # noqa: F401

        return True
    except Exception:
        return False


def decode_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "blob",
    batch_size_hint: int = 256,
    mode: str = "bytes",
) -> DataFrame:
    """Decode-and-featurize over Arrow batches (mapInPandas).

    ``mode`` selects the featurizer behind ONE stable schema:

    - ``"bytes"`` (default): deterministic byte-level statistics —
      no media library needed, environment-independent, and what the
      declared query / DuckDB oracle pin (the oracle must not depend
      on whether Pillow is installed).
    - ``"pil"``: real decode → grayscale → 32×32 resize → pixel
      statistics via Pillow; raises ImportError when Pillow is
      absent. The availability probe runs on the DRIVER — on a
      cluster, executors need Pillow in their own image too (a
      mismatch fails the scan with an error naming exactly that).
      Rows whose payload does not decode as an image fall
      back to the byte statistics (total function — one corrupt blob
      never fails the scan; the dead-letter policy for media lives
      with the caller's Either wrapper, not here).
    - ``"auto"``: ``"pil"`` when Pillow imports, else ``"bytes"``.

    The Spark plumbing is identical in every mode and is the part
    the engine owns: schema-stable output, bounded pandas batches,
    payload never leaves the executor (ref: apply.go:55-57's
    closure-wrapping analog for the optional-dependency probe).
    """
    if mode == "auto":
        mode = "pil" if pil_available() else "bytes"
    if mode not in ("bytes", "pil"):
        raise ValueError("mode must be 'bytes', 'pil' or 'auto'")
    if mode == "pil" and not pil_available():
        raise ImportError("mode='pil' requires Pillow; install it or use mode='auto'")
    use_pil = mode == "pil"

    def _features(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        if use_pil:
            import io

            try:
                from PIL import Image
            except ImportError as e:
                # the call-time probe ran on the DRIVER; this closure
                # runs on executors, and on a real cluster the venvs
                # can differ — name the actual problem instead of
                # failing every task with a bare ImportError
                raise ImportError(
                    "mode='pil' resolved on the driver but Pillow is not "
                    "importable on this executor — install Pillow in the "
                    "executor image or use mode='bytes'"
                ) from e

        def stats(b):
            if not b:
                return 0, 0.0
            if use_pil:
                try:
                    img = Image.open(io.BytesIO(bytes(b))).convert("L").resize((32, 32))
                    px = img.getdata()
                    return len(b), sum(px) / len(px)
                except Exception:
                    pass  # non-image payload → byte-stat fallback
            return len(b), sum(b) / len(b)

        for pdf in batches:
            pairs = pdf[blob_col].map(stats)
            n_bytes = pairs.map(lambda p: p[0])
            mean_byte = pairs.map(lambda p: p[1])
            bucket = mean_byte.map(lambda m: int(m) // 32)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": n_bytes.astype("int64"),
                    "mean_byte": mean_byte.round(4),
                    "byte_entropy_bucket": bucket.astype("int32"),
                }
            )

    # id name AND type derived from the input (r7 review finding: a
    # hardcoded "doc_id long" renamed custom id columns and failed
    # Arrow conversion for string ids — same contract as the
    # similarity module's _id_type preservation)
    id_ddl = f"{id_col} {df.schema[id_col].dataType.simpleString()}"
    return df.select(id_col, blob_col).mapInPandas(
        _features, f"{id_ddl}, {_IMG_FEATURES_COLS}"
    )


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 64,
    id_col: str = "doc_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Frame-sampling plumbing: explode one blob row into N "frame"
    rows (offset + fixed-width byte window). STUB for video frame
    extraction — the row-explosion shape, offsets, and schema are what
    a real decoder plugs into; the "frame" here is the raw byte slice.
    Pure expressions: sequence + transform + explode (no Python)."""
    b = F.col(blob_col)
    offsets = F.sequence(F.lit(0), F.greatest(F.length(b) - 1, F.lit(0)), F.lit(every_n_bytes))
    frames = F.transform(
        offsets,
        lambda off: F.struct(
            off.alias("offset"),
            F.substring(b, off + 1, every_n_bytes).alias("frame_bytes"),
        ),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(frames).alias("frame_no", "frame"),
    ).select(
        id_col,
        "frame_no",
        F.col("frame.offset").alias("offset"),
        F.length(F.col("frame.frame_bytes")).cast("long").alias("frame_len"),
    )


__all__ = [
    "BLOB_META_SCHEMA",
    "attach_blob",
    "blob_metadata",
    "decode_image_features",
    "pil_available",
    "sample_frames",
]
