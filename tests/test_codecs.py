"""Pure-numpy media codecs (kgray/functions/codecs.py) and the REAL
multimodal decode paths built on them (VERDICT r4 #4)."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from kgray.functions.codecs import (
    decode_bmp,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    resize_nearest,
)


@pytest.mark.parametrize("w,h", [(1, 1), (5, 3), (8, 8), (13, 7)])
def test_bmp_ppm_roundtrip(w, h):
    rng = np.random.default_rng(w * 100 + h)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)


def test_bmp_row_padding_and_size():
    # width 5 -> raw row 15 bytes -> padded stride 16
    px = np.zeros((2, 5, 3), dtype=np.uint8)
    data = encode_bmp(px)
    assert len(data) == 14 + 40 + 16 * 2
    assert np.array_equal(decode_bmp(data), px)


@pytest.mark.parametrize("n", [1, 17, 300])
def test_wav_roundtrip(n):
    rng = np.random.default_rng(n)
    s = rng.integers(-32768, 32768, n).astype(np.int16)
    out, rate = decode_wav(encode_wav(s, 8000))
    assert rate == 8000
    assert np.array_equal(out, s)


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_bmp(b"nope")
    with pytest.raises(ValueError):
        decode_ppm(b"P3\n1 1\n255\n000")
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxJUNK")


def test_resize_nearest_integer_convention():
    # 4x2 -> 2x2: src col for out x is (x*4)//2 = 0, 2; src row (y*2)//2
    px = np.arange(4 * 2 * 3, dtype=np.uint8).reshape(2, 4, 3)
    out = resize_nearest(px, 2, 2)
    assert np.array_equal(out[0, 0], px[0, 0])
    assert np.array_equal(out[0, 1], px[0, 2])
    assert np.array_equal(out[1, 1], px[1, 2])


def test_real_image_resize_stage(ray_session):
    """End-to-end: synthesized BMP bytes decode to the formula pixels and
    the resized channel sums match a direct numpy recomputation."""
    from kgray.ops.multimodal import resize_images

    ids = [0, 3, 11, 42]
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": ids}))
    out = (
        resize_images(ds, id_col="doc_id", width=8, height=8,
                      payload="image", use_real_decoder=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for _, row in out.iterrows():
        d = int(row["doc_id"])
        w, h = 8 + d % 5, 6 + d % 7
        assert (row["src_w"], row["src_h"]) == (w, h)
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        px = np.stack(
            [(3 * x + 5 * y + 7 * d) % 256,
             (11 * x + 2 * y + 13 * d) % 256,
             (7 * x + 17 * y + 3 * d) % 256],
            axis=-1,
        ).astype(np.uint8)
        rs = resize_nearest(px, 8, 8).astype(np.int64)
        assert row["sum_r"] == rs[:, :, 0].sum()
        assert row["sum_g"] == rs[:, :, 1].sum()
        assert row["sum_b"] == rs[:, :, 2].sum()
        # re-encoded 8x8 24-bit BMP: 54 header + 24-byte rows x 8
        assert row["n_bytes"] == 246
        assert np.array_equal(decode_bmp(bytes(row["resized"])), resize_nearest(px, 8, 8))


def test_real_audio_window_stage(ray_session):
    """End-to-end: synthesized WAV bytes decode to the formula samples and
    per-window integer stats match a direct recomputation."""
    from kgray.ops.multimodal import window_audio

    ids = [0, 7, 99]
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": ids}))
    out = (
        window_audio(ds, id_col="doc_id", window=64, hop=32,
                     payload="audio", use_real_decoder=True)
        .to_pandas()
        .sort_values(["doc_id", "win_idx"])
        .reset_index(drop=True)
    )
    for d in ids:
        n = 200 + d % 100
        a = d % 997 + 3
        c = (d * d) % 65536
        s = ((np.arange(n, dtype=np.int64) * a + c) % 65536 - 32768)
        rows = out[out["doc_id"] == d]
        assert len(rows) == -(-n // 32)
        for _, row in rows.iterrows():
            i = int(row["win_idx"])
            win = s[i * 32 : i * 32 + 64]
            assert row["win_n"] == len(win)
            assert row["sum_s"] == win.sum()
            assert row["sum_abs"] == np.abs(win).sum()
            assert row["max_abs"] == np.abs(win).max()
