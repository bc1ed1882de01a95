"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The Spark-side architecture is real and tested: binary columns, a
metadata struct, Arrow-batched ``mapInPandas`` decode with an explicit
output schema, and batch-shape control via
``spark.sql.execution.arrow.maxRecordsPerBatch``.

Three decoders plug into the one ``mapInPandas`` seam:

* ``fake``    — deterministic dimensions from payload size (CI default;
                the registered query's oracle recomputes it in SQL).
* ``headers`` — REAL byte parsing, stdlib-only: PNG IHDR, JPEG SOFn,
                GIF, BMP, and WAV RIFF headers → (fmt, width, height).
* ``pil``     — full image decode via Pillow, import-guarded: raises a
                clear error when the library is absent.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id bigint, fmt string, byte_len bigint, width int, height int"
)


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: utf-8 payload bytes + typed metadata."""
    fmt = F.element_at(
        F.array(F.lit("png"), F.lit("jpg"), F.lit("wav")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    meta = F.struct(
        fmt.alias("fmt"),
        F.length(F.col(text_col)).alias("declared_len"),
    )
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        meta.alias("meta"),
    )


def _fake_decode(batch: pd.DataFrame) -> pd.DataFrame:
    byte_len = batch["payload"].map(len)
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "fmt": batch["fmt"],
            "byte_len": byte_len,
            # deterministic fake dimensions derived from payload size —
            # stands in for a real header parse
            "width": (64 + byte_len % 512).astype("int32"),
            "height": (64 + byte_len % 256).astype("int32"),
        }
    )


def parse_media_header(payload: bytes) -> tuple[str, int, int] | None:
    """Stdlib-only header probe: (fmt, width, height) or None.

    Reads only the fixed-offset header fields — O(1) per payload except
    the JPEG segment walk (bounded by header size), so it's safe to run
    over billions of binaries without decoding pixel data."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return "png", w, h
    if payload[:3] == b"\xff\xd8\xff":  # JPEG: walk segments to SOFn
        i = 2
        while i + 9 < len(payload):
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return "jpg", w, h
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            i += 2 + seg_len
        return None
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return "gif", w, h
    if payload[:2] == b"BM" and len(payload) >= 26:
        w, h = struct.unpack("<ii", payload[18:26])
        return "bmp", w, abs(h)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        # width := sample rate, height := channel count (audio "shape")
        channels = struct.unpack("<H", payload[22:24])[0]
        rate = struct.unpack("<I", payload[24:28])[0]
        return "wav", rate, channels
    return None


def _header_decode(batch: pd.DataFrame) -> pd.DataFrame:
    fmts, widths, heights = [], [], []
    for payload in batch["payload"]:
        parsed = parse_media_header(bytes(payload))
        fmt, w, h = parsed if parsed else (None, None, None)
        fmts.append(fmt)
        widths.append(w)
        heights.append(h)
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "fmt": fmts,
            "byte_len": batch["payload"].map(len),
            "width": pd.array(widths, dtype="Int32"),
            "height": pd.array(heights, dtype="Int32"),
        }
    )


def _pil_decode(batch: pd.DataFrame) -> pd.DataFrame:
    """Full decode via Pillow (import-guarded at dispatch)."""
    from io import BytesIO

    from PIL import Image

    fmts, widths, heights = [], [], []
    for payload in batch["payload"]:
        try:
            with Image.open(BytesIO(bytes(payload))) as im:
                fmts.append((im.format or "").lower())
                widths.append(im.size[0])
                heights.append(im.size[1])
        except Exception:
            fmts.append(None)
            widths.append(None)
            heights.append(None)
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "fmt": fmts,
            "byte_len": batch["payload"].map(len),
            "width": pd.array(widths, dtype="Int32"),
            "height": pd.array(heights, dtype="Int32"),
        }
    )


def decode_media(
    payloads: DataFrame,
    real_decoder: bool = False,
    decoder: str | None = None,
) -> DataFrame:
    """Arrow-batched decode over (doc_id, payload, meta) rows.

    decoder: 'fake' (default) | 'headers' (stdlib byte parsing) |
    'pil' (Pillow full decode, gated on the library being installed).
    ``real_decoder=True`` is the backwards-compatible alias for 'pil'.
    """
    decoder = decoder or ("pil" if real_decoder else "fake")
    if decoder == "pil":
        try:
            import PIL  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "decoder='pil' needs Pillow installed on the executors "
                "(pip install pillow); use decoder='headers' for the "
                "dependency-free header probe"
            ) from e
        body = _pil_decode
    elif decoder == "headers":
        body = _header_decode
    elif decoder == "fake":
        body = _fake_decode
    else:
        raise ValueError(f"unknown decoder {decoder!r}: fake/headers/pil")

    flat = payloads.select("doc_id", "payload", F.col("meta.fmt").alias("fmt"))

    def _decode_iter(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield body(batch)

    return flat.mapInPandas(_decode_iter, schema=DECODE_SCHEMA)


def frame_sample(
    payloads: DataFrame, every_nth: int = 10, max_frames: int = 4
) -> DataFrame:
    """Video-style frame sampling stub: emits (doc_id, frame_no) rows for
    deterministic fake frame indices; a real implementation would demux
    the container inside the same mapInPandas body."""
    n_frames = F.least(
        F.lit(max_frames), (F.length("payload") / every_nth).cast("int") + 1
    )
    return payloads.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no"),
    )


# --------------------------- perceptual hashing ----------------------------
#
# pHash (DCT perceptual hash): resize to 32x32 grayscale, 2-D DCT-II,
# keep the top-left 8x8 low-frequency block minus the DC term, set one
# bit per coefficient above the block median. Robust to re-encoding,
# resizing and brightness shifts (DC removal), which byte-level hashes
# cannot see. numpy-only (the DCT is two small matrix products); runs
# inside the same Arrow-batched seam as the decoders above.

import numpy as np


def _dct_matrix(n: int) -> "np.ndarray":
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    m = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    m[0] *= 1 / np.sqrt(2)
    return m * np.sqrt(2 / n)


_DCT32 = _dct_matrix(32)


def phash64(pixels: "np.ndarray") -> int:
    """64-bit DCT perceptual hash of a 32x32 grayscale array."""
    p = np.asarray(pixels, dtype=np.float64).reshape(32, 32)
    d = _DCT32 @ p @ _DCT32.T
    block = d[:8, :8].flatten()
    coeffs = block[1:]  # drop the DC term (overall brightness)
    med = np.median(coeffs)
    bits = coeffs > med
    out = 0
    for idx, b in enumerate(bits):
        if b:
            out |= 1 << idx
    return out


def phash_col(pixels_col: str):
    """Arrow-batched pHash over an array<double> column holding 1024
    row-major grayscale pixels. Returns bigint (63 significant bits —
    the DC term is dropped, leaving 63 coefficients)."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # no type annotations: postponed evaluation (future annotations)
    # would leave them as unresolvable strings for pyspark's inspector
    @pandas_udf("long", PandasUDFType.SCALAR)
    def ph(s):
        return s.map(lambda v: phash64(np.asarray(v, dtype=np.float64)))

    return ph(F.col(pixels_col))


def hamming64(a, b):
    """Column expression: hamming distance between two 64-bit hashes."""
    from pyspark.sql import functions as _F

    ca = _F.col(a) if isinstance(a, str) else a
    cb = _F.col(b) if isinstance(b, str) else b
    return _F.bit_count(ca.bitwiseXOR(cb))


# --------------------------- audio plumbing --------------------------------
#
# The audio path mirrors the image one: payloads are REAL RIFF/WAVE
# containers (44-byte canonical header + int16 LE PCM), the decode
# seam is one Arrow-batched pandas UDF that parses the container and
# extracts per-frame features (a real pipeline fuses decode + feature
# extraction in exactly this spot), and everything downstream —
# thresholding, segmentation, per-doc aggregation — is engine-side
# DataFrame algebra, so Catalyst owns the distributed plan.


def wav_payload(samples: "np.ndarray", rate: int = 8000) -> bytes:
    """Serialize int16 mono PCM into a canonical 44-byte-header WAV."""
    data = samples.astype("<i2").tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def wav_pcm(payload: bytes) -> "np.ndarray":
    """Parse a WAV container back to int16 samples: walk the RIFF
    chunks to the ``data`` chunk (no fixed-offset assumption — real
    files carry LIST/fact chunks before it)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        clen = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        if cid == b"data":
            raw = payload[i + 8 : i + 8 + clen]
            return np.frombuffer(raw, dtype="<i2")
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    raise ValueError("WAV container has no data chunk")


def wav_frame_energies_col(payload_col: str, frame_len: int):
    """Arrow-batched decode + feature extraction: WAV binary column ->
    array<bigint> of per-frame energies (sum of squared samples over
    consecutive ``frame_len``-sample frames; the trailing partial
    frame is dropped). Energies are exact int64 — int16 squares summed
    over bounded frames can't overflow — so downstream thresholding is
    hash-stable cross-engine."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # no type annotations: postponed evaluation (future annotations)
    # would leave them as unresolvable strings for pyspark's inspector
    @pandas_udf("array<long>", PandasUDFType.SCALAR)
    def energies(payloads):
        out = []
        for p in payloads:
            s = wav_pcm(bytes(p)).astype(np.int64)
            n = (len(s) // frame_len) * frame_len
            frames = s[:n].reshape(-1, frame_len)
            out.append((frames * frames).sum(axis=1))
        return pd.Series(out)

    return energies(F.col(payload_col))


def vad_segments(
    frames: DataFrame,
    id_col: str = "doc_id",
    frame_col: str = "f",
    energy_col: str = "energy",
    threshold: int = 50_000,
) -> DataFrame:
    """Energy-threshold voice-activity segmentation: consecutive
    above-threshold frames merge into segments (islands-and-gaps via
    the f - row_number() group key). Returns one row per (doc,
    segment) with start frame and length. One shuffle on the doc key;
    window partitions are bounded by frames-per-doc, never corpus
    size."""
    from pyspark.sql import Window

    act = frames.where(F.col(energy_col) > threshold)
    w = Window.partitionBy(id_col).orderBy(frame_col)
    grp = (F.col(frame_col) - F.row_number().over(w)).alias("__grp")
    return (
        act.select(id_col, frame_col, grp)
        .groupBy(id_col, "__grp")
        .agg(
            F.min(frame_col).alias("seg_start"),
            F.count("*").cast("long").alias("seg_len"),
        )
        .drop("__grp")
    )


def wht_sign_matrix(n: int) -> "np.ndarray":
    """Walsh-Hadamard sign matrix S[k, j] = (-1)^popcount(k & j) —
    the integer 'spectral' basis used by the audio fingerprint. WHT
    coefficients are plain signed integer sums, so fingerprints stay
    hash-exact cross-engine (a float DFT would not)."""
    ks = np.arange(n)
    pc = np.bitwise_and(ks[:, None], ks[None, :])
    # vectorized popcount parity for values < 2**16
    pc = (pc & 0x5555) + ((pc >> 1) & 0x5555)
    pc = (pc & 0x3333) + ((pc >> 2) & 0x3333)
    pc = (pc & 0x0F0F) + ((pc >> 4) & 0x0F0F)
    pc = (pc & 0x00FF) + ((pc >> 8) & 0x00FF)
    return (1 - 2 * (pc & 1)).astype(np.int64)


def wav_spectral_peaks_col(payload_col: str, frame_len: int = 32):
    """Fused decode + spectral fingerprint: WAV binary column ->
    array<int> of per-frame SPECTRAL PEAK bands — for each consecutive
    ``frame_len``-sample frame, the Walsh-Hadamard coefficient index
    (DC band 0 excluded) with the largest |coefficient|, ties to the
    smallest index. One Arrow pass in the scan stage (the
    wav_frame_energies_col seam); integer-exact end-to-end, so a
    DuckDB oracle can replay the transform via bit_count arithmetic."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    S = wht_sign_matrix(frame_len)

    # no type annotations: postponed evaluation (future annotations)
    # would leave them as unresolvable strings for pyspark's inspector
    @pandas_udf("array<int>", PandasUDFType.SCALAR)
    def peaks(payloads):
        out = []
        for p in payloads:
            s = wav_pcm(bytes(p)).astype(np.int64)
            n = (len(s) // frame_len) * frame_len
            frames = s[:n].reshape(-1, frame_len)
            coeff = frames @ S.T  # [n_frames, frame_len] int64
            mag = np.abs(coeff)
            mag[:, 0] = -1  # exclude DC; peaks are bands 1..frame_len-1
            out.append(np.argmax(mag, axis=1).astype(np.int32))
        return pd.Series(out)

    return peaks(F.col(payload_col))


def build_exif_jpeg(
    width: int,
    height: int,
    orientation: int,
    taken_at: str,
    has_gps: bool,
    little_endian: bool = True,
) -> bytes:
    """Construct a REAL JPEG header stream: SOI + APP1/Exif (TIFF IFD0
    with Orientation 0x0112, DateTime 0x0132, optional GPS-IFD pointer
    0x8825; either byte order) + SOF0 carrying the pixel shape. Enough
    structure for any spec-conforming EXIF walker; no pixel data."""
    e = "<" if little_endian else ">"
    n = 3 if has_gps else 2
    # TIFF origin: header(8) + ifd count(2) + n*12 entries + next(4)
    dt_off = 8 + 2 + n * 12 + 4
    dt = taken_at.encode("ascii") + b"\x00"
    assert len(dt) == 20
    entries = struct.pack(e + "HHIHH", 0x0112, 3, 1, orientation, 0)
    entries += struct.pack(e + "HHII", 0x0132, 2, 20, dt_off)
    if has_gps:
        entries += struct.pack(e + "HHII", 0x8825, 4, 1, dt_off + 20)
    tiff = (
        (b"II" if little_endian else b"MM")
        + struct.pack(e + "HI", 42, 8)
        + struct.pack(e + "H", n)
        + entries
        + struct.pack(e + "I", 0)
        + dt
    )
    app1_body = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(app1_body) + 2) + app1_body
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, height, width, 1)
    return b"\xff\xd8" + app1 + sof0


def parse_exif(payload: bytes) -> tuple[int | None, str | None, bool]:
    """Walk a JPEG's APP1/Exif TIFF structure (both byte orders):
    (orientation, taken_at, has_gps). Orientation tag 0x0112,
    DateTime tag 0x0132 (offset-pointed ASCII), GPS presence = IFD
    pointer tag 0x8825. O(header) like parse_media_header — never
    touches pixel data, safe over billions of binaries."""
    if payload[:3] != b"\xff\xd8\xff":
        return None, None, False
    i = 2
    while i + 4 <= len(payload) and payload[i] == 0xFF:
        marker = payload[i + 1]
        seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        if marker == 0xE1 and payload[i + 4 : i + 10] == b"Exif\x00\x00":
            t = i + 10  # TIFF origin
            order = payload[t : t + 2]
            if order not in (b"II", b"MM"):
                return None, None, False
            e = "<" if order == b"II" else ">"
            ifd = t + struct.unpack(e + "I", payload[t + 4 : t + 8])[0]
            cnt = struct.unpack(e + "H", payload[ifd : ifd + 2])[0]
            orientation: int | None = None
            taken: str | None = None
            gps = False
            for k in range(cnt):
                ent = ifd + 2 + k * 12
                tag, typ, _n = struct.unpack(
                    e + "HHI", payload[ent : ent + 8]
                )
                if tag == 0x0112 and typ == 3:
                    orientation = struct.unpack(
                        e + "H", payload[ent + 8 : ent + 10]
                    )[0]
                elif tag == 0x0132 and typ == 2:
                    off = t + struct.unpack(
                        e + "I", payload[ent + 8 : ent + 12]
                    )[0]
                    raw = payload[off : off + 19]
                    taken = raw.decode("ascii", errors="replace")
                elif tag == 0x8825:
                    gps = True
            return orientation, taken, gps
        i += 2 + seg_len
    return None, None, False
