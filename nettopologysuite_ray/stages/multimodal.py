"""Multimodal column stages: image/audio/video as opaque binary + metadata.

Decode support is split honestly:

* REAL decoders, pure numpy/stdlib, no external libs: PPM (P6) and
  uncompressed 24/32-bit BMP images, PCM WAV audio (stdlib `wave`), and
  — since r5 — PNG (full non-interlaced 8-bit decode, all filters and
  color types) and baseline-sequential JPEG (Huffman + IDCT + 4:2:0
  upsample), both in `functions/imagecodec.py` with matching encoders
  exercised by exact (PNG) and PSNR/analytic (JPEG) round-trip tests.
  Decode, nearest-neighbor resize, and grayscale-grid / energy-envelope
  feature extraction over these run on actual pixel/sample data.
* STUBS for the remaining compressed formats (mp3/video — the codecs
  aren't in this container): clearly marked, swap in librosa/pyav at
  deploy time.  The Ray-side plumbing is identical either way and is
  what the tests pin down: schema contracts, actor-pool signatures,
  small batch sizes for large binary payloads (size
  batch_size*avg_bytes*concurrency against the worker heap).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

import numpy as np
import pyarrow as pa

IMAGE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("image", pa.binary()),       # opaque encoded bytes (ppm/bmp/jpeg/...)
        ("mime", pa.string()),
        ("width", pa.int32()),        # typed metadata travels beside payload
        ("height", pa.int32()),
    ]
)

AUDIO_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("audio", pa.binary()),       # opaque encoded bytes (wav/mp3/...)
        ("mime", pa.string()),
        ("sample_rate", pa.int32()),
    ]
)


# ---------------------------------------------------------------------------
# Real decoders (uncompressed formats only — pure numpy / stdlib)


def decode_ppm(data: bytes) -> np.ndarray:
    """Decode a binary PPM (P6) image to a (h, w, 3) uint8 array."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header: magic, width, height, maxval — whitespace/comment separated
    pos = 2
    vals = []
    while len(vals) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    need = w * h * 3
    pix = np.frombuffer(data, dtype=np.uint8, count=need, offset=pos)
    return pix.reshape(h, w, 3)


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32-bit BMP to a (h, w, 3) uint8 array."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if comp != 0 or bpp not in (24, 32):
        raise ValueError("only uncompressed 24/32-bit BMP supported")
    flip = h > 0
    h = abs(h)
    bypp = bpp // 8
    stride = (w * bypp + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    rows = rows.reshape(h, stride)[:, : w * bypp].reshape(h, w, bypp)
    rgb = rows[:, :, 2::-1]  # BGR(A) -> RGB
    return rgb[::-1] if flip else rgb


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM WAV bytes to ((n_frames, n_channels) float64 in [-1, 1],
    sample_rate) via the stdlib wave module."""
    with wave.open(io.BytesIO(data), "rb") as f:
        nch = f.getnchannels()
        width = f.getsampwidth()
        rate = f.getframerate()
        raw = f.readframes(f.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    return x.reshape(-1, nch), rate


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, c) array — vectorized index map."""
    h, w = img.shape[:2]
    yi = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xi = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[yi[:, None], xi[None, :]]


def grayscale_grid_features(img: np.ndarray, grid: int = 4) -> np.ndarray:
    """Unit-norm grid-of-mean-luminance feature vector (grid*grid dims)."""
    lum = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    small = resize_nearest(lum[..., None], grid, grid)[..., 0]
    v = small.ravel()
    n = np.linalg.norm(v)
    return v / n if n else v


# ---------------------------------------------------------------------------
# Stages


class ImageDecodeStage:
    """Actor stage: decode + feature-extract image bytes.

    PPM (P6) and uncompressed BMP decode for real; compressed formats
    raise unless `fake_fallback` (deterministic hash features) is on.
    __init__ work happens once per actor; __call__ maps a batch.
    """

    def __init__(self, feature_dim: int = 16, fake_fallback: bool = True):
        grid = int(round(feature_dim**0.5))
        if grid * grid != feature_dim:
            raise ValueError("feature_dim must be a square (grid features)")
        self.grid = grid
        self.feature_dim = feature_dim
        self.fake_fallback = fake_fallback

    def _fake_decode(self, data: bytes) -> np.ndarray:
        # deterministic fake: hash bytes into a unit feature vector so
        # downstream dedup/ANN stages exercise real dataflow
        h = hashlib.sha256(data).digest()
        raw = np.frombuffer(
            (h * ((self.feature_dim * 4) // len(h) + 1))[: self.feature_dim * 4], dtype=np.uint32
        )
        v = raw.astype(np.float64)
        n = np.linalg.norm(v)
        return v / n if n else v

    def _features(self, data: bytes, mime: str) -> np.ndarray:
        if mime in ("image/x-portable-pixmap", "image/ppm"):
            return grayscale_grid_features(decode_ppm(data), self.grid)
        if mime == "image/bmp":
            return grayscale_grid_features(decode_bmp(data), self.grid)
        if mime == "image/png":
            from ..functions.imagecodec import decode_png

            return grayscale_grid_features(decode_png(data), self.grid)
        if mime in ("image/jpeg", "image/jpg"):
            from ..functions.imagecodec import decode_jpeg

            return grayscale_grid_features(decode_jpeg(data), self.grid)
        if self.fake_fallback:
            return self._fake_decode(data)
        raise NotImplementedError(
            f"decoding {mime} requires a codec library not present in this "
            "container (mp3/video); deploy-time implementations plug in here"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        mimes = batch["mime"].to_pylist()
        feats = [self._features(b, m) for b, m in zip(batch["image"].to_pylist(), mimes)]
        out = batch.drop_columns(["image"])  # drop the wide payload ASAP
        return out.append_column(
            "image_embedding", pa.array([f.tolist() for f in feats], type=pa.list_(pa.float64()))
        )


class AudioDecodeStage:
    """Actor stage: decode PCM WAV audio and emit an energy-envelope
    feature vector (n_bins RMS bins over the waveform) plus duration.
    Compressed audio (mp3/ogg) raises unless fake_fallback."""

    def __init__(self, n_bins: int = 16, fake_fallback: bool = True):
        self.n_bins = n_bins
        self.fake_fallback = fake_fallback

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        blobs = batch["audio"].to_pylist()
        mimes = batch["mime"].to_pylist()
        env, dur = [], []
        for blob, mime in zip(blobs, mimes):
            if mime in ("audio/wav", "audio/x-wav"):
                x, rate = decode_wav(blob)
                mono = x.mean(axis=1)
                dur.append(len(mono) / rate if rate else 0.0)
                edges = np.linspace(0, len(mono), self.n_bins + 1).astype(np.int64)
                bins = np.array(
                    [
                        np.sqrt(np.mean(mono[edges[k] : max(edges[k + 1], edges[k] + 1)] ** 2))
                        for k in range(self.n_bins)
                    ]
                )
                env.append(bins)
            elif self.fake_fallback:
                h = hashlib.sha256(blob).digest()
                env.append(np.frombuffer((h * 3)[: self.n_bins * 4], dtype=np.uint32) / 2**32)
                dur.append(0.0)
            else:
                raise NotImplementedError(
                    f"decoding {mime} requires an audio codec library, not "
                    "present in this container"
                )
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "duration_s": pa.array(dur, type=pa.float64()),
                "energy_envelope": pa.array([e.tolist() for e in env], type=pa.list_(pa.float64())),
            }
        )


class FrameSampleStage:
    """Actor stage: sample frames from video bytes (stub decode — video
    codecs are a deploy-time plug).

    Output: one row per sampled frame with frame_idx + frame feature.
    """

    def __init__(self, every_n: int = 10):
        self.every_n = every_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        blobs = batch["video"].to_pylist()
        out_id, out_frame, out_feat = [], [], []
        for i, blob in zip(ids, blobs):
            # stub: pretend the video has len(blob) // 1000 frames
            n_frames = max(1, len(blob) // 1000)
            for f in range(0, n_frames, self.every_n):
                out_id.append(i)
                out_frame.append(f)
                out_feat.append(float(int.from_bytes(hashlib.md5(blob + f.to_bytes(4, "little")).digest()[:4], "little")) / 2**32)
        return pa.table(
            {
                "doc_id": pa.array(out_id, type=pa.int64()),
                "frame_idx": pa.array(out_frame, type=pa.int64()),
                "frame_feature": pa.array(out_feat, type=pa.float64()),
            }
        )


# ---------------------------------------------------------------------------
# Deterministic fixtures


def encode_ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def encode_bmp(img: np.ndarray) -> bytes:
    """Minimal bottom-up 24-bit uncompressed BMP writer."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR, flip
    pix = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return header + info + pix


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """16-bit PCM WAV writer (stdlib wave); samples in [-1, 1], (n,) or (n, ch)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(samples * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


def synthesize_image_table(n: int = 64, seed: int = 42, real_formats: bool = False) -> pa.Table:
    """Deterministic image rows for plumbing tests; with real_formats,
    alternating PPM/BMP payloads that the real decoders parse."""
    rng = np.random.default_rng(seed)
    blobs, mimes, ws, hs = [], [], [], []
    for i in range(n):
        if real_formats:
            w = int(rng.integers(8, 40))
            h = int(rng.integers(8, 40))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            if i % 2 == 0:
                blobs.append(encode_ppm(img))
                mimes.append("image/x-portable-pixmap")
            else:
                blobs.append(encode_bmp(img))
                mimes.append("image/bmp")
            ws.append(w)
            hs.append(h)
        else:
            blobs.append(
                rng.integers(0, 256, size=int(rng.integers(500, 4000)), dtype=np.uint8).tobytes()
            )
            mimes.append("image/fake")
            ws.append(64)
            hs.append(64)
    return pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "image": pa.array(blobs, type=pa.binary()),
            "mime": pa.array(mimes),
            "width": pa.array(ws, type=pa.int32()),
            "height": pa.array(hs, type=pa.int32()),
        }
    )


def synthesize_audio_table(n: int = 32, seed: int = 42) -> pa.Table:
    """Deterministic PCM WAV rows (sine bursts with varying frequency)."""
    rng = np.random.default_rng(seed)
    blobs, rates = [], []
    for i in range(n):
        rate = 8000
        dur = float(rng.uniform(0.05, 0.3))
        t = np.arange(int(rate * dur)) / rate
        freq = 100.0 + 50.0 * i
        blobs.append(encode_wav(0.5 * np.sin(2 * np.pi * freq * t), rate))
        rates.append(rate)
    return pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "audio": pa.array(blobs, type=pa.binary()),
            "mime": pa.array(["audio/wav"] * n),
            "sample_rate": pa.array(rates, type=pa.int32()),
        }
    )
