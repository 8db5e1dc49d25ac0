"""PNG + baseline JPEG codecs (functions/imagecodec.py) and their
multimodal-stage wiring.

PNG is lossless → exact round-trip gates, plus hand-filtered bitstreams
covering every scanline filter and color type (the encoder only emits
filter 0, so decode of 1-4 must be pinned independently).  JPEG is
lossy → analytic DC-only check on solid colors (exact), PSNR floors on
gradients, and a 4:2:0 round trip exercising the multi-block-MCU +
chroma-upsample decode path."""

import struct
import zlib

import numpy as np
import pytest

from nettopologysuite_ray.functions.imagecodec import (
    _PNG_SIG,
    _png_chunk,
    decode_jpeg,
    decode_png,
    encode_jpeg,
    encode_png,
)


def test_png_roundtrip_exact():
    rng = np.random.default_rng(5)
    for img in (
        rng.integers(0, 256, (37, 53, 3), dtype=np.uint8),
        np.full((16, 16, 3), 200, np.uint8),
        (np.mgrid[0:40, 0:60][0] * 6 % 256).astype(np.uint8)[..., None].repeat(3, 2),
    ):
        assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_all_filters_and_color_types():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (10, 7, 3), dtype=np.uint8)
    h, w, _ = img.shape
    bpp = 3
    flat = img.reshape(h, w * 3).astype(np.int32)
    rows = []
    for y in range(h):
        f = y % 5  # cycle every filter type
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(w * 3, dtype=np.int32)
        filt = np.empty(w * 3, dtype=np.int32)
        for x in range(w * 3):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa_, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc) else (b if pb <= pc else c)
            filt[x] = (cur[x] - pred) & 0xFF
        rows.append(bytes([f]) + bytes(filt.astype(np.uint8)))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), img)

    # gray / RGBA / palette color types
    gray = rng.integers(0, 256, (6, 5), dtype=np.uint8)
    raw = b"".join(bytes([0]) + bytes(gray[y]) for y in range(6))
    d = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 6, 8, 0, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(d), np.repeat(gray[..., None], 3, 2))
    rgba = rng.integers(0, 256, (4, 4, 4), dtype=np.uint8)
    raw = b"".join(bytes([0]) + bytes(rgba[y].ravel()) for y in range(4))
    d = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 6, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(d), rgba[..., :3])
    plte = rng.integers(0, 256, (8, 3), dtype=np.uint8)
    pix = rng.integers(0, 8, (5, 6), dtype=np.uint8)
    raw = b"".join(bytes([0]) + bytes(pix[y]) for y in range(5))
    d = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 5, 8, 3, 0, 0, 0))
        + _png_chunk(b"PLTE", bytes(plte.ravel()))
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(d), plte[pix])


def test_png_rejects_unsupported():
    with pytest.raises(ValueError):
        decode_png(b"nope")
    # 16-bit depth
    d = (
        _PNG_SIG
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(d)


def test_jpeg_solid_color_analytic():
    """A solid image has DC-only blocks; quantized DC reproduces the
    level exactly at any reasonable quality — an encoder-independent
    correctness pin on the Huffman/DCT/YCbCr path."""
    for level in (0, 1, 120, 200, 255):
        img = np.full((24, 24, 3), level, np.uint8)
        out = decode_jpeg(encode_jpeg(img, 85))
        assert int(np.abs(out.astype(int) - level).max()) <= 1, level


def test_jpeg_gradient_psnr():
    x = np.linspace(0, 255, 64)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)[..., None].repeat(
        3, 2
    )
    out = decode_jpeg(encode_jpeg(img, 90))
    mse = np.mean((out.astype(float) - img.astype(float)) ** 2)
    assert 10 * np.log10(255**2 / mse) > 40.0


def test_jpeg_420_subsampled_roundtrip():
    for shape in ((48, 48), (21, 37)):
        x = np.linspace(0, 255, shape[0])
        y = np.linspace(0, 255, shape[1])
        img = np.clip(np.add.outer(x, y) / 2, 0, 255).astype(np.uint8)[
            ..., None
        ].repeat(3, 2)
        out = decode_jpeg(encode_jpeg(img, 92, subsample=True))
        assert out.shape == img.shape
        mse = np.mean((out.astype(float) - img.astype(float)) ** 2)
        assert 10 * np.log10(255**2 / mse) > 38.0


def test_jpeg_rejects_progressive():
    img = np.full((8, 8, 3), 99, np.uint8)
    data = bytearray(encode_jpeg(img))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # flip SOF0 → SOF2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))


def test_image_stage_decodes_png_and_jpeg(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from nettopologysuite_ray.stages.multimodal import (
        ImageDecodeStage,
        encode_ppm,
        grayscale_grid_features,
    )

    rng = np.random.default_rng(31)
    imgs = [rng.integers(0, 256, (24, 24, 3), dtype=np.uint8) for _ in range(6)]
    rows = {
        "doc_id": pa.array(np.arange(6)),
        "image": pa.array(
            [
                encode_png(imgs[0]),
                encode_jpeg(imgs[1], 95),
                encode_ppm(imgs[2]),
                encode_png(imgs[3]),
                encode_jpeg(imgs[4], 95, subsample=True),
                encode_ppm(imgs[5]),
            ],
            type=pa.binary(),
        ),
        "mime": pa.array(
            [
                "image/png",
                "image/jpeg",
                "image/ppm",
                "image/png",
                "image/jpeg",
                "image/ppm",
            ]
        ),
    }
    ds = rd.from_arrow(pa.table(rows)).map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs={"feature_dim": 16, "fake_fallback": False},
        concurrency=1,
        batch_format="pyarrow",
    )
    df = ds.to_pandas().sort_values("doc_id")
    assert len(df) == 6
    # PNG is lossless: stage features == direct features, exactly
    want = grayscale_grid_features(imgs[0], 4)
    got = np.array(df.iloc[0]["image_embedding"])
    assert np.allclose(got, want)
    # JPEG is lossy: features close but present and unit-norm
    for i in (1, 4):
        v = np.array(df.iloc[i]["image_embedding"])
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9
        direct = grayscale_grid_features(imgs[i], 4)
        assert np.dot(v, direct) > 0.99  # cosine ~1 vs the true pixels
