import numpy as np
import pytest

from lightly_ocr_tpu.config import DEFAULT_CHARSET
from lightly_ocr_tpu.text import (
    AttnLabelConverter,
    CTCLabelConverter,
    build_converter,
)


class TestCTCLabelConverter:
    def setup_method(self):
        self.conv = CTCLabelConverter(DEFAULT_CHARSET)

    def test_num_classes(self):
        assert self.conv.num_classes == 37  # 36 chars + blank

    def test_blank_is_zero(self):
        assert self.conv.character[0] == "[blank]"
        assert self.conv.dict["0"] == 1
        assert self.conv.dict["z"] == 36

    def test_encode_roundtrip(self):
        flat, lengths = self.conv.encode(["abc", "07"])
        assert flat.tolist() == [11, 12, 13, 1, 8]
        assert lengths.tolist() == [3, 2]

    def test_decode_collapses_repeats_and_blanks(self):
        # "aab" with blanks: a a [b] b b -> "ab"
        a, b = self.conv.dict["a"], self.conv.dict["b"]
        seq = np.array([a, a, 0, b, b])
        assert self.conv.decode(seq, [5]) == ["ab"]

    def test_decode_repeat_after_blank_kept(self):
        a = self.conv.dict["a"]
        seq = np.array([a, 0, a])
        assert self.conv.decode(seq, [3]) == ["aa"]

    def test_batch_decode_correct(self):
        # The reference's batch decode is broken after the first sample
        # (recog_utils.py:43); ours must be correct.
        texts = ["hello", "world", "42"]
        flat, lengths = self.conv.encode(texts)
        # No repeats/blanks in these encodings -> decode is identity
        assert self.conv.decode(flat, lengths) == ["helo", "world", "42"]
        # note: "hello" -> "helo" because CTC collapses the repeated 'l'
        # when there is no intervening blank. Insert an explicit blank:
        l = self.conv.dict["l"]
        seq = np.array(
            [self.conv.dict[c] for c in "hel"] + [l] + [self.conv.dict["o"]]
        )
        seq = np.insert(seq, 3, 0)  # blank between the two l's
        assert self.conv.decode(seq, [6]) == ["hello"]

    def test_encode_padded(self):
        batch, lengths = self.conv.encode_padded(["ab", "a"], batch_max_len=4)
        assert batch.shape == (2, 4)
        assert batch[0].tolist() == [11, 12, 0, 0]
        assert batch[1].tolist() == [11, 0, 0, 0]
        assert lengths.tolist() == [2, 1]

    def test_decode_padded(self):
        batch, _ = self.conv.encode_padded(["ab", "cd"], batch_max_len=4)
        assert self.conv.decode_padded(batch) == ["ab", "cd"]


class TestAttnLabelConverter:
    def setup_method(self):
        self.conv = AttnLabelConverter(DEFAULT_CHARSET)

    def test_num_classes(self):
        assert self.conv.num_classes == 38  # 36 chars + [GO] + [s]

    def test_token_layout(self):
        assert self.conv.character[0] == "[GO]"
        assert self.conv.character[1] == "[s]"
        assert self.conv.dict["0"] == 2

    def test_encode_layout(self):
        batch, lengths = self.conv.encode(["ab"], batch_max_len=25)
        assert batch.shape == (1, 27)
        assert batch[0, 0] == 0  # [GO]
        assert batch[0, 1] == self.conv.dict["a"]
        assert batch[0, 2] == self.conv.dict["b"]
        assert batch[0, 3] == 1  # [s]
        assert batch[0, 4:].tolist() == [0] * 23
        assert lengths.tolist() == [3]

    def test_encode_all_samples(self):
        # Reference only encodes the first sample (recog_utils.py:93 bug).
        batch, lengths = self.conv.encode(["ab", "xyz"], batch_max_len=25)
        assert batch[1, 1] == self.conv.dict["x"]
        assert batch[1, 4] == 1
        assert lengths.tolist() == [3, 4]

    def test_decode_trimmed(self):
        batch, _ = self.conv.encode(["cafe", "42"], batch_max_len=25)
        # decode the text part (drop leading [GO])
        assert self.conv.decode_trimmed(batch[:, 1:]) == ["cafe", "42"]

    def test_decode_joins_rows(self):
        batch, _ = self.conv.encode(["ab"], batch_max_len=3)
        decoded = self.conv.decode(batch[:, 1:])
        assert decoded[0].startswith("ab[s]")


def test_build_converter():
    assert isinstance(build_converter("CTC", "ab"), CTCLabelConverter)
    assert isinstance(build_converter("Attention", "ab"), AttnLabelConverter)
    with pytest.raises(ValueError):
        build_converter("MORAN", "ab")
