from lightly_ocr_tpu.utils import (
    Averager,
    edit_distance,
    exact_match_accuracy,
    normalized_edit_distance,
)


def test_averager():
    a = Averager()
    assert a.val() == 0.0
    a.add(2.0)
    a.add(4.0)
    assert a.val() == 3.0
    a.reset()
    assert a.val() == 0.0


def test_averager_arrays():
    import numpy as np

    a = Averager()
    a.add(np.array([1.0, 2.0, 3.0]))
    assert a.val() == 2.0


def test_edit_distance_basic():
    assert edit_distance("", "") == 0
    assert edit_distance("abc", "") == 3
    assert edit_distance("", "abc") == 3
    assert edit_distance("abc", "abc") == 0
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance("flaw", "lawn") == 2


def test_edit_distance_vs_bruteforce():
    import itertools
    import random

    def ref_ed(s1, s2):
        l1, l2 = len(s1) + 1, len(s2) + 1
        lev = [[0] * l2 for _ in range(l1)]
        for i in range(l1):
            lev[i][0] = i
        for j in range(l2):
            lev[0][j] = j
        for i, j in itertools.product(range(1, l1), range(1, l2)):
            lev[i][j] = min(
                lev[i - 1][j] + 1,
                lev[i][j - 1] + 1,
                lev[i - 1][j - 1] + (0 if s1[i - 1] == s2[j - 1] else 1),
            )
        return lev[-1][-1]

    rnd = random.Random(4420)
    for _ in range(50):
        s1 = "".join(rnd.choice("abcd") for _ in range(rnd.randint(0, 8)))
        s2 = "".join(rnd.choice("abcd") for _ in range(rnd.randint(0, 8)))
        assert edit_distance(s1, s2) == ref_ed(s1, s2), (s1, s2)


def test_exact_match_accuracy():
    assert exact_match_accuracy(["a", "b"], ["a", "c"]) == 50.0
    assert exact_match_accuracy([], []) == 0.0


def test_normalized_edit_distance():
    assert normalized_edit_distance(["abc"], ["abc"]) == 1.0
    assert normalized_edit_distance(["abc"], ["abd"]) == 1.0 - 1.0 / 3.0
