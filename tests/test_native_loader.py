"""Native C++ loader: decode parity + prefetch ordering."""

import os

import numpy as np
import pytest

from edge_based_visual_odometry_tpu.io import native_loader as NL


@pytest.fixture(scope="module")
def png_pairs(tmp_path_factory):
    from PIL import Image
    d = tmp_path_factory.mktemp("frames")
    rng = np.random.default_rng(3)
    pairs = []
    truths = []
    for k in range(6):
        l = rng.integers(0, 255, (48, 64), dtype=np.uint8)
        r = rng.integers(0, 255, (48, 64), dtype=np.uint8)
        lp = str(d / f"l{k}.png")
        rp = str(d / f"r{k}.png")
        Image.fromarray(l).save(lp)
        Image.fromarray(r).save(rp)
        pairs.append((lp, rp))
        truths.append((l, r))
    return pairs, truths


def test_native_available():
    assert NL.native_available(), "native loader failed to build"


def test_decode_matches_pil(png_pairs):
    pairs, truths = png_pairs
    out = NL.decode_gray(pairs[0][0], 48, 64)
    assert out is not None
    np.testing.assert_array_equal(out, truths[0][0].astype(np.float32))


def test_prefetch_loader_order_and_content(png_pairs):
    pairs, truths = png_pairs
    loader = NL.PrefetchLoader(pairs, 48, 64, prefetch_depth=3, n_threads=3)
    seen = []
    for idx, left, right in loader:
        np.testing.assert_array_equal(left, truths[idx][0].astype(np.float32))
        np.testing.assert_array_equal(right, truths[idx][1].astype(np.float32))
        seen.append(idx)
    assert seen == list(range(6))
    loader.close()


def test_decode_pgm_with_comments(tmp_path):
    """PGM headers may carry '#' comment lines between tokens."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, (10, 12), dtype=np.uint8)
    p = str(tmp_path / "c.pgm")
    with open(p, "wb") as f:
        f.write(b"P5\n# a comment line\n12 10\n# another\n255\n")
        f.write(img.tobytes())
    out = NL.decode_gray(p, 10, 12)
    assert out is not None
    np.testing.assert_array_equal(out, img.astype(np.float32))


def test_prefetch_loader_skips_bad_files(png_pairs, tmp_path):
    pairs, truths = png_pairs
    bad = str(tmp_path / "missing.png")
    mixed = [pairs[0], (bad, bad), pairs[1]]
    loader = NL.PrefetchLoader(mixed, 48, 64)
    seen = [idx for idx, _, _ in loader]
    assert seen == [0, 2]
    loader.close()


def test_make_iterator_prefetch_matches_sync(tmp_path):
    """KITTI iterator through the native prefetcher yields the same frames
    (and GT) as the synchronous decode path."""
    from PIL import Image

    from edge_based_visual_odometry_tpu.io import datasets

    seq = tmp_path / "seq" / "00"
    (seq / "image_0").mkdir(parents=True)
    (seq / "image_1").mkdir(parents=True)
    rng = np.random.default_rng(11)
    for k in range(4):
        for cam in ("image_0", "image_1"):
            img = rng.integers(0, 255, (32, 40), dtype=np.uint8)
            Image.fromarray(img).save(str(seq / cam / f"{k:06d}.png"))
    kw = dict(dataset_type="KITTI", dataset_dir=str(tmp_path),
              sequence_name="seq/00")
    sync = list(datasets.make_iterator(**kw, image_hw=(32, 40),
                                       prefetch=False))
    pre = list(datasets.make_iterator(**kw, image_hw=(32, 40),
                                      prefetch=True))
    assert len(sync) == len(pre) == 4
    for a, b in zip(sync, pre):
        np.testing.assert_array_equal(a.left, b.left)
        np.testing.assert_array_equal(a.right, b.right)
        assert a.timestamp == b.timestamp
