import numpy as np
import pytest

from gemmul8_tpu import tables


def test_moduli_coprime_and_count():
    assert len(tables.MODULI) == 20
    assert tables.MODULI[0] == 256
    import math
    for i in range(20):
        for j in range(i + 1, 20):
            assert math.gcd(tables.MODULI[i], tables.MODULI[j]) == 1


@pytest.mark.parametrize("L", [2, 6, 8, 14, 20])
def test_crt_roundtrip(L):
    tables.validate_crt(L, trials=100, seed=L)


@pytest.mark.parametrize("L", [2, 8, 14, 20])
def test_weight_limbs_reconstruct(L):
    w = tables.crt_weights(L)
    wl = tables.crt_weight_limbs(L)
    nl = tables.num_limbs(L)
    for j in range(L):
        v = sum(int(wl[j, l]) << (16 * l) for l in range(nl))
        assert v == w[j]


def test_limb_count_covers_accumulation():
    for L in range(2, 21):
        maxval = 255 * L * tables.big_m(L)
        assert maxval < 1 << (16 * tables.num_limbs(L))


def test_thresholds_guarantee_crt_range():
    # 2^(2*T_fast + 2) <= (M-1)/2 and 2^(2*T_accu + 1)... the invariant the
    # encode shift selection relies on: products bounded by 2^(2T+2) (fast)
    # resp. 2^(2T+1) (accurate) must stay below M/2.
    for L in range(2, 21):
        mm = tables.big_m(L)
        assert 2 ** (2 * tables.threshold_fast(L) + 2) <= (mm - 1) // 2
        assert 2 ** (2 * tables.threshold_accurate(L)) <= (mm - 1) // 2
