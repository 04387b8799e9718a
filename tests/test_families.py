"""Tag family table tests."""

import numpy as np
import pytest

from ccrs_tpu.detect.families import get_family


def test_t36h11_table():
    fam = get_family("t36h11")
    assert fam.n_codes == 587
    assert fam.size == 6
    assert fam.border == 2
    rc = fam.rotated_codes
    assert rc.shape == (587 * 4, 36)
    assert set(np.unique(rc)) == {-1, 1}
    # all rotations of all codes distinct (family property)
    assert len({tuple(r) for r in rc}) == 587 * 4


def test_t36h11b1_shares_codes():
    a = get_family("t36h11")
    b = get_family("t36h11b1")
    assert np.array_equal(a.codes, b.codes)
    assert b.border == 1


def test_small_families():
    assert get_family("t16h5").n_codes == 30
    assert get_family("t25h9").n_codes == 35


def test_t25h7_unavailable():
    # t25h7 is intentionally NOT advertised (its canonical table cannot be
    # regenerated offline; see detect/families.py) and must fail loudly
    # with a pointer to the custom-TagFamily escape hatch.
    from ccrs_tpu.detect.families import FAMILY_NAMES

    assert "t25h7" not in FAMILY_NAMES
    with pytest.raises(ValueError, match="t25h7"):
        get_family("t25h7")
