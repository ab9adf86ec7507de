"""Host-side utilities: amortize (reference `utils.py:452-455`) and the
one-deep dispatch/consume overlap idiom."""
import numpy as np

from panopticdiffusionmodels_tpu.utils import amortize, one_deep


def test_amortize():
    assert amortize(10, 4) == [4, 4, 2]
    assert amortize(8, 4) == [4, 4]
    assert amortize(3, 4) == [3]


def test_one_deep_order_and_interleaving():
    """Consumption is exactly one dispatch behind, order-preserving, with the
    tail flushed."""
    log = []

    def dispatch(i):
        log.append(("d", i))
        return i * 10

    out = []
    for item, res in one_deep(range(4), dispatch):
        log.append(("c", item))
        out.append((item, res))
    assert out == [(0, 0), (1, 10), (2, 20), (3, 30)]
    assert log == [("d", 0), ("d", 1), ("c", 0), ("d", 2), ("c", 1),
                   ("d", 3), ("c", 2), ("c", 3)]


def test_one_deep_empty_and_single():
    assert list(one_deep([], lambda x: x)) == []
    assert list(one_deep([7], lambda x: -x)) == [(7, -7)]
