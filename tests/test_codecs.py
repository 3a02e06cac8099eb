"""The pluggable media codec seam: the SAME pixel assertions run under
every codec available in the environment (FakeCodec always; PillowCodec
when PIL is importable — those cases auto-skip otherwise, and run
unchanged the day Pillow is installed). This is the contract from the
codec-seam design: the fake is a stand-in only at the byte<->pixel
boundary, so swapping in a real library must not change a single
downstream assertion."""

from __future__ import annotations

import numpy as np
import pytest

from geospatial_etl_pipeline_spark.operators.multimodal import (
    CODECS,
    FakeCodec,
    PillowCodec,
    ahash64,
    available_codecs,
    decode_features,
    resize,
    resolve_codec,
)

AVAILABLE = available_codecs()


def _param_codecs():
    return [
        pytest.param(name, marks=())
        if CODECS[name].available()
        else pytest.param(
            name, marks=pytest.mark.skip(reason=f"{name} library not importable")
        )
        for name in CODECS
    ]


def test_resolve_codec_contract():
    assert "fake" in AVAILABLE  # fake codec never depends on a library
    with pytest.raises(ValueError, match="unknown codec"):
        resolve_codec("gdal")
    assert resolve_codec("fake") is FakeCodec
    assert resolve_codec(None, allow_fake=True) is FakeCodec
    if PillowCodec.available():
        assert resolve_codec(None) is PillowCodec
        assert resolve_codec("pillow") is PillowCodec
    else:
        # the fake NEVER runs silently by default
        with pytest.raises(NotImplementedError):
            resolve_codec(None)
        with pytest.raises(NotImplementedError):
            resolve_codec("pillow")


@pytest.mark.parametrize("codec", _param_codecs())
def test_image_roundtrip_exact(codec):
    """decode(encode(pixels)) is exact under every codec (FIMG is raw;
    Pillow writes lossless PNG) — the property every downstream pixel
    test builds on."""
    impl = CODECS[codec]
    rng = np.random.default_rng(11)
    arr = rng.integers(0, 256, (13, 17)).astype(np.uint8)
    blob = impl.encode_image(arr)
    back = impl.decode_image(blob, 17, 13)
    assert back.dtype == np.uint8 and back.shape == (13, 17)
    assert np.array_equal(back, arr)


@pytest.mark.parametrize("codec", _param_codecs())
def test_resize_pixels_identical_under_any_codec(spark, codec):
    """resize through each codec produces the SAME nearest-neighbor
    pixels — the math is codec-independent; only the container bytes
    differ."""
    impl = CODECS[codec]
    src = ((np.arange(12)[:, None] * 7 + np.arange(16)[None, :]) % 256).astype(
        np.uint8
    )
    media = spark.createDataFrame(
        [(1, "image", bytearray(impl.encode_image(src)),
          {"mime": impl.image_mime, "width": 16, "height": 12,
           "duration_ms": None})],
        "media_id long, kind string, blob binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:int>",
    )
    out = resize(media, 8, 6, codec=codec).collect()[0]
    got = impl.decode_image(bytes(out["blob"]), 8, 6)
    rowsel = np.minimum(((np.arange(6) + 0.5) * 12 / 6).astype(int), 11)
    colsel = np.minimum(((np.arange(8) + 0.5) * 16 / 8).astype(int), 15)
    assert np.array_equal(got, src[np.ix_(rowsel, colsel)])
    assert out["meta"]["mime"] == impl.image_mime


@pytest.mark.parametrize("codec", _param_codecs())
def test_ahash_is_codec_invariant(spark, codec):
    """The perceptual hash depends on PIXELS, not container bytes: the
    same image encoded through any codec hashes to the same 64 bits as
    the fake-container reference."""
    rng = np.random.default_rng(7)
    px = (rng.integers(0, 2, (32, 32)) * 255).astype(np.uint8)
    impl = CODECS[codec]
    schema = (
        "media_id long, kind string, blob binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:int>"
    )
    meta = {"mime": impl.image_mime, "width": 32, "height": 32,
            "duration_ms": None}
    media = spark.createDataFrame(
        [(1, "image", bytearray(impl.encode_image(px)), meta)], schema
    )
    got = ahash64(media, codec=codec).collect()[0]["ahash"]
    ref_media = spark.createDataFrame(
        [(1, "image", bytearray(FakeCodec.encode_image(px)),
          {"mime": "image/x-fake", "width": 32, "height": 32,
           "duration_ms": None})],
        schema,
    )
    ref = ahash64(ref_media, codec="fake").collect()[0]["ahash"]
    assert got == ref


def test_decode_features_real_kernel_when_pillow_present(spark):
    """Under a real codec the feature vector is pixel moments +
    histogram (not the MD5 byte expansion the fake path pins for its
    SQL oracle)."""
    if not PillowCodec.available():
        pytest.skip("pillow library not importable")
    px = np.full((10, 10), 128, dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, "image", bytearray(PillowCodec.encode_image(px)),
          {"mime": "image/png", "width": 10, "height": 10,
           "duration_ms": None})],
        "media_id long, kind string, blob binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:int>",
    )
    f = decode_features(media, dims=8, codec="pillow").collect()[0]["features"]
    assert f[0] == pytest.approx(128 / 255)  # mean
    assert f[1] == pytest.approx(0.0)  # std of a constant image


def test_pixel_features_empty_image_is_nodata_zeros():
    """A degenerate 0-size pixel array (Pillow will decode a 0xN PNG)
    must yield an all-zero nodata feature vector, not kill the task
    (min/max raise on empty, mean emits NaN)."""
    from geospatial_etl_pipeline_spark.operators.multimodal import (
        _pixel_features,
    )

    for shape in ((0,), (0, 5), (3, 0)):
        f = _pixel_features(np.zeros(shape, dtype=np.uint8), 8)
        assert f.shape == (8,)
        assert np.all(f == 0.0)
        assert np.all(np.isfinite(f))
