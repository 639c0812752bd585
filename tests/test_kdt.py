"""stars.kdt reader/writer: round-trip under every candidate cereal/kdt
layout, malformed-input rejection, and k-d invariants of written trees."""

import struct

import numpy as np
import pytest

from blackstar_tpu.stars.kdt import (
    KdtFormatError,
    _FIELD_ORDERS,
    read_kdt,
    write_kdt,
)
from tests.test_stars import _random_catalog


@pytest.mark.parametrize("order", _FIELD_ORDERS)
@pytest.mark.parametrize("empty_tag", [0, 1], ids=["empty0", "empty1"])
def test_roundtrip_all_layouts(tmp_path, order, empty_tag):
    cat = _random_catalog(257, seed=5)
    path = str(tmp_path / "stars.kdt")
    write_kdt(cat, path, empty_tag=empty_tag, order=order)
    got = read_kdt(path)
    assert got.n_stars == cat.n_stars
    # The tree reorders stars; compare as sorted sets of rows.
    def key(c):
        rows = np.concatenate(
            [c.pos, c.mag[:, None], c.hue[:, None], c.sat[:, None]], axis=1
        )
        return rows[np.lexsort(rows.T)]
    np.testing.assert_allclose(key(got), key(cat), atol=0)


def test_roundtrip_tiny(tmp_path):
    cat = _random_catalog(1, seed=9)
    path = str(tmp_path / "one.kdt")
    write_kdt(cat, path)
    got = read_kdt(path)
    assert got.n_stars == 1
    np.testing.assert_allclose(got.pos, cat.pos, atol=0)


def test_unknown_spectral_class_survives(tmp_path):
    """Stars whose (hue, sat) is not an MK class serialize as '?' and come
    back with the reference's fallback colour (0, 0) — StarMap.hs:72."""
    cat = _random_catalog(64, seed=3)
    cat = cat._replace(hue=np.zeros(64), sat=np.zeros(64))
    path = str(tmp_path / "q.kdt")
    write_kdt(cat, path)
    got = read_kdt(path)
    assert (got.hue == 0.0).all() and (got.sat == 0.0).all()


def test_rejects_garbage(tmp_path):
    path = str(tmp_path / "bad.kdt")
    with open(path, "wb") as f:
        f.write(b"\x00\x00" + b"\x07" * 64)
    with pytest.raises(KdtFormatError, match="generate-grid"):
        read_kdt(path)


def test_rejects_non_unit_positions(tmp_path):
    """A file that parses structurally but whose 'positions' are not unit
    directions is not a star tree — the norm gate must reject it."""
    cat = _random_catalog(32, seed=4)
    cat = cat._replace(pos=cat.pos * 3.0)
    path = str(tmp_path / "scaled.kdt")
    write_kdt(cat, path)
    with pytest.raises(KdtFormatError):
        read_kdt(path)


def test_written_tree_is_a_valid_kd_tree(tmp_path):
    """Nodes split on axis depth%3: left subtree <= axisValue <= right (the
    invariant Data.KdMap.Static queries rely on)."""
    cat = _random_catalog(129, seed=8)
    path = str(tmp_path / "t.kdt")
    write_kdt(cat, path, empty_tag=0, order="LPAR")
    buf = open(path, "rb").read()
    off = [2]

    def f64():
        v = struct.unpack(">d", buf[off[0]:off[0] + 8])[0]
        off[0] += 8
        return v

    def node(depth):
        tag = buf[off[0]]
        off[0] += 1
        if tag == 0:
            return None
        left = node(depth + 1)
        pos = (f64(), f64(), f64())
        off[0] += 9  # mag i64 + ascii char
        axv = f64()
        right = node(depth + 1)
        assert axv == pos[depth % 3]
        for sub, side in ((left, -1), (right, 1)):
            if sub is not None:
                lo, hi = sub[1][depth % 3], sub[2][depth % 3]
                if side < 0:
                    assert hi <= axv
                else:
                    assert lo >= axv
        lo = np.minimum.reduce([s[1] for s in (left, right) if s] + [np.array(pos)])
        hi = np.maximum.reduce([s[2] for s in (left, right) if s] + [np.array(pos)])
        return pos, lo, hi

    import sys
    sys.setrecursionlimit(10000)
    node(0)
    assert struct.unpack(">q", buf[off[0]:off[0] + 8])[0] == 129
