import os

import numpy as np
import pytest

from lightly_ocr_tpu.data import (
    DataLoader,
    RecordDataset,
    RecordWriter,
    align_collate,
    open_dataset,
)
from lightly_ocr_tpu.data.generator import (
    anno2list,
    build_records,
    render_word,
    synthesize_words,
)


@pytest.fixture
def record_file(tmp_path):
    path = str(tmp_path / "data.lor")
    labels = synthesize_words(path, n=24, max_len=6, seed=1)
    return path, labels


class TestRecords:
    def test_roundtrip(self, tmp_path):
        path = str(tmp_path / "r.lor")
        with RecordWriter(path) as w:
            w.add("hello", b"\x89PNGfake1")
            w.add("world", b"\x89PNGfake22")
        ds = RecordDataset(path, filtering=False)
        assert len(ds) == 2
        assert ds.raw(0) == ("hello", b"\x89PNGfake1")
        assert ds.raw(1) == ("world", b"\x89PNGfake22")
        ds.close()

    def test_filtering(self, tmp_path):
        path = str(tmp_path / "r.lor")
        with RecordWriter(path) as w:
            w.add("ok", b"x")
            w.add("toolongword", b"x")
            w.add("bad!", b"x")
        ds = RecordDataset(
            path, character="abcdefghijklmnopqrstuvwxyz", batch_max_len=5
        )
        assert len(ds) == 1
        assert ds.raw(0)[0] == "ok"
        ds.close()

    def test_getitem_decodes(self, record_file):
        path, labels = record_file
        ds = RecordDataset(path, filtering=False)
        img, label = ds[0]
        assert label == labels[0]
        assert img.mode == "L"
        ds.close()

    def test_bad_magic(self, tmp_path):
        p = tmp_path / "bad.lor"
        p.write_bytes(b"NOPE" + b"\x00" * 32)
        with pytest.raises(ValueError):
            RecordDataset(str(p))

    def test_open_dataset_dir(self, record_file):
        path, _ = record_file
        ds = open_dataset(os.path.dirname(path), filtering=False)
        assert len(ds) == 24
        ds.close()

    def test_open_dataset_missing(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            open_dataset(str(tmp_path / "nope"))


class TestGenerator:
    def test_anno2list(self, tmp_path):
        (tmp_path / "imgs").mkdir()
        anno = tmp_path / "annotation_train.txt"
        anno.write_text(
            "./imgs/1_hello_42.jpg 1\n./imgs/2_world_43.jpg 2\nbadline\n"
        )
        out = anno2list(str(tmp_path))
        assert [l for _, l in out] == ["hello", "world"]

    def test_build_records_skips_bad(self, tmp_path, rng):
        good = tmp_path / "good.png"
        good.write_bytes(render_word("abc", rng))
        bad = tmp_path / "bad.png"
        bad.write_bytes(b"not an image")
        out = str(tmp_path / "out.lor")
        n = build_records(
            [(str(good), "abc"), (str(bad), "bad"), ("/missing.png", "x")],
            out,
            log_dir=str(tmp_path / "logs"),
        )
        assert n == 1
        assert (tmp_path / "logs" / "error_image.txt").exists()

    def test_synthesize_charset(self, tmp_path):
        path = str(tmp_path / "s.lor")
        labels = synthesize_words(path, n=10, charset="ab", max_len=3, seed=2)
        assert all(set(l) <= {"a", "b"} for l in labels)

    def test_synthesize_receipt(self, tmp_path):
        """Receipt composition: in-bounds annotated word boxes with dark
        glyph ink, equal channels, and the LOR1 detection-record shape
        (train_demo.py's CRAFT training data)."""
        from lightly_ocr_tpu.data.generator import synthesize_receipt

        rng = np.random.default_rng(3)
        img, words = synthesize_receipt(rng, 256, 192)
        assert img.shape == (256, 192, 3) and img.dtype == np.uint8
        assert np.array_equal(img[..., 0], img[..., 1])
        assert len(words) >= 4
        for w in words:
            r0, c0, r1, c1 = w["rect"]
            assert 0 <= r0 < r1 <= 256 and 0 <= c0 < c1 <= 192
            assert w["text"]
            # glyph ink is darker than paper inside the box
            assert img[r0:r1, c0:c1, 0].min() < 120

        # roundtrips through the detection-record container
        from lightly_ocr_tpu.train.pseudo_labels import (
            write_detection_records,
        )

        path = str(tmp_path / "det.lor")
        n = write_detection_records(path, [(img, words)])
        assert n == 1


class TestAlignCollate:
    def _samples(self, rng, sizes):
        from PIL import Image

        out = []
        for w, h in sizes:
            arr = rng.integers(0, 255, (h, w)).astype(np.uint8)
            out.append((Image.fromarray(arr), "x"))
        return out

    def test_fixed_resize(self, rng):
        imgs, labels = align_collate(
            self._samples(rng, [(80, 30), (20, 40)]), 32, 100, keep_ratio=False
        )
        assert imgs.shape == (2, 32, 100, 1)
        assert imgs.min() >= -1.0 and imgs.max() <= 1.0

    def test_keep_ratio_pads_with_edge(self, rng):
        imgs, _ = align_collate(
            self._samples(rng, [(32, 32)]), 32, 100, keep_ratio=True
        )
        # 32x32 -> resized to 32 wide, padding 68 col replicating col 31
        pad = imgs[0, :, 32:, 0]
        edge = imgs[0, :, 31, 0]
        assert np.allclose(pad, edge[:, None])

    def test_keep_ratio_wide_caps_at_width(self, rng):
        imgs, _ = align_collate(
            self._samples(rng, [(500, 20)]), 32, 100, keep_ratio=True
        )
        assert imgs.shape == (1, 32, 100, 1)


class TestDataLoader:
    def test_iterates_all(self, record_file):
        path, _ = record_file
        ds = RecordDataset(path, filtering=False)
        loader = DataLoader(ds, batch_size=8, workers=2, seed=0)
        batches = list(loader)
        assert len(batches) == 3
        for imgs, labels in batches:
            assert imgs.shape == (8, 32, 100, 1)
            assert len(labels) == 8
        ds.close()

    def test_deterministic_with_seed(self, record_file):
        path, _ = record_file
        ds = RecordDataset(path, filtering=False)
        l1 = [lbls for _, lbls in DataLoader(ds, batch_size=8, seed=7)]
        l2 = [lbls for _, lbls in DataLoader(ds, batch_size=8, seed=7)]
        assert l1 == l2
        ds.close()

    def test_random_sequential_sampler(self):
        from lightly_ocr_tpu.data import RandomSequentialSampler

        s = RandomSequentialSampler(20, 5, seed=1)
        for idx in s:
            assert len(idx) == 5
            assert (np.diff(idx) == 1).all()


class TestConcatDataset:
    """Comma-separated roots -> concatenation (the reference's
    multi-corpus ``select_data`` training, minus batch ratios)."""

    def test_concat_roundtrip(self, tmp_path):
        a = str(tmp_path / "a.lor")
        b = str(tmp_path / "b.lor")
        la = synthesize_words(a, n=5, max_len=4, seed=2)
        lb = synthesize_words(b, n=7, max_len=4, seed=3)
        ds = open_dataset(f"{a},{b}", filtering=False)
        assert len(ds) == 12
        got = [ds[i][1] for i in range(12)]
        assert got == la + lb
        # negative indexing routes to the right part
        assert ds[-1][1] == lb[-1]
        ds.close()

    def test_concat_filtering_applies_per_part(self, tmp_path):
        a = str(tmp_path / "a.lor")
        b = str(tmp_path / "b.lor")
        synthesize_words(a, n=6, charset="ab", max_len=3, seed=4)
        synthesize_words(b, n=6, charset="cd", max_len=3, seed=5)
        ds = open_dataset(f"{a},{b}", character="ab", batch_max_len=8)
        assert 0 < len(ds) <= 6  # the cd-part filters out entirely
        ds.close()


class TestReceiptCrops:
    def test_crops_match_serving_distribution(self, tmp_path):
        from lightly_ocr_tpu.data.generator import synthesize_receipt_crops

        path = str(tmp_path / "crops.lor")
        labels = synthesize_receipt_crops(
            path, n=40, height=160, width=192, seed=6
        )
        assert len(labels) == 40
        ds = open_dataset(path, filtering=False)
        assert len(ds) == 40
        hs = []
        for i in range(40):
            img, lab = ds[i]
            a = np.asarray(img)
            assert lab == labels[i]
            # paper-noise background (not pure white), glyphs present
            assert a.min() < 120 and a.max() > 200
            hs.append(a.shape[0])
        # jittered margins -> varying crop heights (line_h 20-34 + up to
        # ~2*wh/3 total vertical margin)
        assert len(set(hs)) > 3
        ds.close()
