"""Image quality/filter kernels (functions/imagequality.py) and the Spark
operator over them (operators/multimodal.py image_quality_features)."""

import numpy as np
import pytest

from etlpy_spark.functions import imagequality as iq
from etlpy_spark.functions.imagecodec import image_bytes, decode, render_pixels


def _const(h=24, w=32, val=(120, 80, 40)):
    return np.full((h, w, 3), np.array(val, dtype=np.uint8), dtype=np.uint8)


class TestScalarMetrics:
    def test_constant_image_extremes(self):
        px = _const()
        assert iq.gray_entropy(px) == 0.0
        assert iq.laplacian_var(px) == 0.0
        assert iq.border_uniformity(px) == 1.0
        assert iq.edge_density(px) == 0.0

    def test_gray_image_has_zero_colorfulness(self):
        g = (np.arange(24 * 32, dtype=np.uint8).reshape(24, 32) % 251)
        px = np.stack([g, g, g], axis=-1)
        assert iq.colorfulness(px) == 0.0
        # any saturated image scores well above zero
        red = _const(val=(255, 0, 0))
        assert iq.colorfulness(red) > 50

    def test_uniform_histogram_entropy_is_8_bits(self):
        g = np.arange(256, dtype=np.uint8).reshape(16, 16)
        px = np.stack([g, g, g], axis=-1)
        assert iq.gray_entropy(px) == 8.0

    def test_blur_reduces_laplacian_variance(self):
        px = render_pixels("img-000000000007").astype(np.float64)
        # 3x3 box blur (interior valid region), back to uint8
        k = px
        b = (
            k[:-2, :-2] + k[:-2, 1:-1] + k[:-2, 2:]
            + k[1:-1, :-2] + k[1:-1, 1:-1] + k[1:-1, 2:]
            + k[2:, :-2] + k[2:, 1:-1] + k[2:, 2:]
        ) / 9.0
        sharp = np.clip(np.rint(k[1:-1, 1:-1]), 0, 255).astype(np.uint8)
        blurred = np.clip(np.rint(b), 0, 255).astype(np.uint8)
        assert iq.laplacian_var(blurred) < iq.laplacian_var(sharp)

    def test_border_uniformity_detects_solid_frame(self):
        rng = np.random.default_rng(7)
        noisy = rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8).astype(np.uint8)
        framed = noisy.copy()
        framed[0, :] = framed[-1, :] = framed[:, 0] = framed[:, -1] = (0, 0, 0)
        assert iq.border_uniformity(framed) == 1.0
        assert iq.border_uniformity(noisy) < 0.6

    def test_edge_density_orders_flat_vs_checker(self):
        checker = np.zeros((32, 32, 3), dtype=np.uint8)
        checker[::2, 1::2] = 255
        checker[1::2, ::2] = 255
        assert iq.edge_density(checker) > 0.9
        assert iq.edge_density(_const()) == 0.0

    def test_tiny_image_guards(self):
        one = _const(1, 1)
        assert iq.laplacian_var(one) == 0.0
        assert iq.edge_density(one) == 0.0
        assert iq.border_uniformity(one) == 1.0


class TestHashes:
    def test_hashes_are_signed_int64(self):
        for i in range(8):
            px = render_pixels(f"img-{i:012d}")
            for fn in (iq.ahash64, iq.dhash64, iq.whash64):
                v = fn(px)
                assert -(1 << 63) <= v < (1 << 63)

    def test_brightness_shift_invariance(self):
        # values bounded away from 0/255 so +12 never clips; a global
        # shift preserves every > comparison both hashes make
        px = (render_pixels("img-000000000003") // 2 + 60).astype(np.uint8)
        shifted = (px + 12).astype(np.uint8)
        assert iq.dhash64(px) == iq.dhash64(shifted)
        assert iq.ahash64(px) == iq.ahash64(shifted)

    def test_constant_image_hashes_to_zero(self):
        px = _const()
        assert iq.ahash64(px) == 0
        assert iq.dhash64(px) == 0
        assert iq.whash64(px) == 0

    def test_hashes_are_not_degenerate_copies(self):
        # across the procedural corpus the three hashes must not collapse
        # into one another
        diffs = {"ad": 0, "aw": 0, "dw": 0}
        for i in range(12):
            px = render_pixels(f"img-{i:012d}")
            a, d, w = iq.ahash64(px), iq.dhash64(px), iq.whash64(px)
            diffs["ad"] += a != d
            diffs["aw"] += a != w
            diffs["dw"] += d != w
        assert all(v > 0 for v in diffs.values())

    def test_near_duplicate_small_hamming(self):
        px = render_pixels("img-000000000005")
        tweaked = px.copy()
        tweaked[::7, ::7] = np.clip(tweaked[::7, ::7].astype(int) + 6, 0, 255).astype(np.uint8)
        for fn in (iq.ahash64, iq.dhash64, iq.whash64):
            x = fn(px) ^ fn(tweaked)
            assert bin(x & ((1 << 64) - 1)).count("1") <= 6


class TestSparkOperator:
    def test_matches_serial_replica(self, spark):
        from etlpy_spark.operators import multimodal as mm

        n = 24
        df = mm.synthetic_images_df(spark, n=n, parallelism=4)
        got = {r["image_id"]: r.asDict() for r in mm.image_quality_features(df).collect()}
        assert len(got) == n
        for i in range(n):
            iid = f"img-{i:012d}"
            exp = iq.quality_features(decode(image_bytes(iid)))
            row = got[iid]
            for k, v in exp.items():
                assert row[k] == v, (iid, k, row[k], v)

    def test_quality_gate_filters(self, spark):
        from etlpy_spark.operators import multimodal as mm

        rows = [
            # (id, w, h, entropy, blur_var, border_uniformity) -> keep?
            ("ok", 64, 64, 5.0, 100.0, 0.1, True),
            ("tiny", 8, 64, 5.0, 100.0, 0.1, False),
            ("banner", 640, 32, 5.0, 100.0, 0.1, False),  # aspect 20
            ("flat", 64, 64, 0.2, 100.0, 0.1, False),
            ("blurry", 64, 64, 5.0, 1.0, 0.1, False),
            ("placeholder", 64, 64, 5.0, 100.0, 1.0, False),
        ]
        df = spark.createDataFrame(
            [(r[0], r[1], r[2], r[3], r[4], r[5]) for r in rows],
            "image_id string, w int, h int, entropy double, blur_var double,"
            " border_uniformity double",
        )
        kept = {r["image_id"] for r in mm.quality_gate(df).collect()}
        assert kept == {r[0] for r in rows if r[6]}
