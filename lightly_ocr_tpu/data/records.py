"""Packed record dataset: the LMDB replacement.

The reference stores MJSynth as LMDB key-value pairs (``image-{i}`` /
``label-{i}`` + ``num-samples``, ``ocr/tools/dataset.py:128-193``,
``ocr/tools/generator.py:43-87``).  The lmdb C library is not available
in this image, so the native store here is a single flat file with an
offset index — mmap-friendly, trivially shardable across data-parallel
hosts, and readable by the C++ loader in ``native/``.

Layout (little-endian):
    magic  b"LOR1"
    u64    num_records
    u64    index_offset
    records: [u32 label_len][label utf8][u32 image_len][image bytes] ...
    index  : num_records x u64 record offsets

``LMDBDataset``-equivalent behaviors kept: at-init filtering of labels
longer than ``batch_max_len`` or containing out-of-charset characters
(``dataset.py:139-156``), lowercase label normalization via re-strip
(``dataset.py:190-191``).
"""
from __future__ import annotations

import io
import mmap
import os
import re
import struct
from typing import Iterator, Sequence

import numpy as np

MAGIC = b"LOR1"
_HDR = struct.Struct("<4sQQ")
_U32 = struct.Struct("<I")
_U64 = struct.Struct("<Q")


class RecordWriter:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        self._f = open(path, "wb")
        self._f.write(_HDR.pack(MAGIC, 0, 0))
        self._offsets: list[int] = []

    def add(self, label: str, image_bytes: bytes) -> None:
        self._offsets.append(self._f.tell())
        lb = label.encode("utf-8")
        self._f.write(_U32.pack(len(lb)))
        self._f.write(lb)
        self._f.write(_U32.pack(len(image_bytes)))
        self._f.write(image_bytes)

    def close(self) -> None:
        index_offset = self._f.tell()
        for off in self._offsets:
            self._f.write(_U64.pack(off))
        self._f.seek(0)
        self._f.write(_HDR.pack(MAGIC, len(self._offsets), index_offset))
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class RecordDataset:
    """Random-access reader with reference-compatible label filtering."""

    def __init__(
        self,
        path: str,
        character: str | None = None,
        batch_max_len: int | None = None,
        filtering: bool = True,
        rgb: bool = False,
    ):
        self.path = path
        self.rgb = rgb
        self._file = open(path, "rb")
        self._mm = mmap.mmap(self._file.fileno(), 0, access=mmap.ACCESS_READ)
        magic, count, index_offset = _HDR.unpack_from(self._mm, 0)
        if magic != MAGIC:
            raise ValueError(f"{path}: not a LOR1 record file")
        self._offsets = np.frombuffer(
            self._mm, dtype="<u8", count=count, offset=index_offset
        ).copy()  # copy: a live view would pin the mmap open
        self.character = character
        self._out_of_char = (
            re.compile(f"[^{re.escape(character)}]") if character else None
        )

        if filtering and character is not None:
            keep = []
            for i in range(count):
                label = self._label_at(int(self._offsets[i]))
                if batch_max_len is not None and len(label) > batch_max_len:
                    continue
                if self._out_of_char.search(label.lower()):
                    continue
                keep.append(i)
            self._index = np.asarray(keep, dtype=np.int64)
        else:
            self._index = np.arange(count, dtype=np.int64)

    def _label_at(self, off: int) -> str:
        (n,) = _U32.unpack_from(self._mm, off)
        return self._mm[off + 4 : off + 4 + n].decode("utf-8")

    def __len__(self) -> int:
        return len(self._index)

    def raw(self, i: int) -> tuple[str, bytes]:
        off = int(self._offsets[self._index[i]])
        (n,) = _U32.unpack_from(self._mm, off)
        label = self._mm[off + 4 : off + 4 + n].decode("utf-8")
        off2 = off + 4 + n
        (m,) = _U32.unpack_from(self._mm, off2)
        return label, self._mm[off2 + 4 : off2 + 4 + m]

    def __getitem__(self, i: int):
        """-> (PIL image grayscale|RGB, cleaned label)."""
        from PIL import Image

        label, blob = self.raw(i)
        img = Image.open(io.BytesIO(blob))
        img = img.convert("RGB" if self.rgb else "L")
        if self._out_of_char is not None:
            label = self._out_of_char.sub("", label)
        return img, label

    def close(self) -> None:
        self._mm.close()
        self._file.close()


class ConcatDataset:
    """Concatenation of record datasets — the multi-corpus training the
    reference does with ``select_data``/``Batch_Balanced_Dataset``
    (``ocr/recog/dataset.py``), minus the per-corpus batch ratios (the
    shuffler samples uniformly over the concatenation)."""

    def __init__(self, parts):
        if not parts:
            raise ValueError("ConcatDataset needs at least one part")
        self.parts = list(parts)
        sizes = [len(p) for p in self.parts]
        self._cum = np.cumsum(sizes)

    def __len__(self) -> int:
        return int(self._cum[-1])

    def __getitem__(self, i: int):
        i = int(i)
        if i < 0:
            i += len(self)
        part = int(np.searchsorted(self._cum, i, side="right"))
        prev = 0 if part == 0 else int(self._cum[part - 1])
        return self.parts[part][i - prev]

    def close(self) -> None:
        for p in self.parts:
            p.close()


def open_dataset(root: str, **kwargs):
    """Open a dataset root: a ``.lor`` record file, a directory containing
    ``data.lor``, a comma-separated list of roots (concatenated), or — if
    the lmdb package happens to be installed — a reference LMDB
    directory."""
    if "," in root:
        return ConcatDataset(
            [open_dataset(r.strip(), **kwargs) for r in root.split(",")]
        )
    if os.path.isfile(root):
        return RecordDataset(root, **kwargs)
    lor = os.path.join(root, "data.lor")
    if os.path.isfile(lor):
        return RecordDataset(lor, **kwargs)
    if os.path.isfile(os.path.join(root, "data.mdb")):
        try:
            import lmdb  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                f"{root} looks like an LMDB dataset but the lmdb package is "
                "not installed; convert it with "
                "lightly_ocr_tpu.data.generator.convert_lmdb"
            ) from e
        from lightly_ocr_tpu.data.lmdb_compat import LMDBDataset

        return LMDBDataset(root, **kwargs)
    raise FileNotFoundError(f"no dataset found under {root}")
